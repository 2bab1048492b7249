"""Benchmark: Nature-DQN Atari-class training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the reference's headline workload shape — Nature DQN
(LargeAtariCNN over 84x84x4 uint8 frames, batch 32, one gradient step per 4
env transitions, target sync every 10k) — run as the fused on-device
actor-learner loop over 64 env lanes with a 100k-frame uint8 device replay.
The env is the synthetic AtariSim (pfrl_tpu/envs/atari_sim.py): ALE
emulation is a host-CPU workload in every framework, so the bench measures
what the chip does — act forward, replay, CNN fwd+bwd, target sync — at the
real shapes.

Baseline: PFRL DQN sustains ~160 env-steps/s on one GPU at this exact
configuration (50M steps / 3.613 days, examples/atari/reproduction/dqn/
README.md:132; BASELINE.md). vs_baseline = value / 160.

A watchdog guards against the TPU tunnel's known hang mode: if the bench
cannot finish in time it emits value 0 and exits nonzero instead of hanging
the driver.
"""

import json
import os
import threading
import time

# Persistent compile cache: the axon remote-compile path takes minutes for
# the conv training program; cache the returned executable locally. Must be
# set before jax import.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_STEPS_PER_SEC = 160.0
WATCHDOG_SECS = 480.0


def _emit(value, vs_baseline, extra=None, fail=False):
    line = {
        "metric": "dqn_atari_env_steps_per_sec_per_chip",
        "value": round(float(value), 1),
        "unit": "env-steps/s",
        "vs_baseline": round(float(vs_baseline), 2),
    }
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)
    if fail:
        os._exit(1)


def _watchdog():
    _emit(0.0, 0.0, extra={"note": "watchdog: TPU dispatch hung"}, fail=True)


def main():
    timer = threading.Timer(WATCHDOG_SECS, _watchdog)
    timer.daemon = True
    timer.start()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.replay import ReplayBuffer

    import flax.linen as nn

    n_actions = 6
    num_envs = 64

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            q = nn.Dense(n_actions)(h)
            return DiscreteActionValueHead()(q)

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1_000_000, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=lambda x: x.astype(jnp.float32) / 255.0,
    )
    # Nature-DQN cadence: 1 update (batch 32) per 4 env transitions.
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=2_000,
        update_interval=4,
        target_update_interval=10_000,
        minibatch_size=32,
    )
    runner = OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        ReplayBuffer(
            100_000, gamma=0.99, num_lanes=num_envs, store_next_obs=False
        ),
        cfg,
    )
    state = runner.init(jax.random.PRNGKey(0))

    chunk_steps = 200  # x 64 lanes = 12.8k transitions (+ 3.2k updates) per chunk
    # Warmup: compile + fill replay past replay_start_size.
    state, metrics = runner.run_chunk(state, chunk_steps)
    float(np.asarray(metrics["loss"][-1]))

    n_chunks = 5
    t0 = time.time()
    for _ in range(n_chunks):
        state, metrics = runner.run_chunk(state, chunk_steps)
    # Force a real device->host fetch; block_until_ready alone has been
    # observed to return early through the axon tunnel.
    final_loss = float(np.asarray(metrics["loss"][-1]))
    elapsed = time.time() - t0
    assert np.isfinite(final_loss)

    transitions = n_chunks * chunk_steps * num_envs
    steps_per_sec = transitions / elapsed
    timer.cancel()
    _emit(
        steps_per_sec,
        steps_per_sec / BASELINE_STEPS_PER_SEC,
        extra={
            "workload": "NatureCNN 84x84x4 uint8, batch32 per 4 steps, "
            "64 lanes, 100k uint8 device replay (AtariSim)",
            "updates_per_sec": round(steps_per_sec / 4, 1),
        },
    )


if __name__ == "__main__":
    main()
