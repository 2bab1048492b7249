"""Dev profiling loop: DQN/AtariSim runner throughput, with vs without updates.

A developer-facing microbench (the CI-facing bench is ``bench.py`` at the
repo root). Run directly: ``python tools/prof_loop.py [num_envs]``.
"""

import argparse
import time


def build_runner(n_actions, num_envs, replay_start):
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.replay import ReplayBuffer

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            return DiscreteActionValueHead()(nn.Dense(n_actions)(LargeAtariCNN()(x)))

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1_000_000, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=lambda x: x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x,
    )
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=replay_start,
        update_interval=4,
        target_update_interval=10_000,
        minibatch_size=32,
    )
    return OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        ReplayBuffer(100_000, gamma=0.99, num_lanes=num_envs, store_next_obs=False),
        cfg,
    )


def run(num_envs, replay_start):
    import jax
    import numpy as np

    runner = build_runner(6, num_envs, replay_start)
    state = runner.init(jax.random.PRNGKey(0))
    state, m = runner.run_chunk(state, 200)  # warmup + compile
    float(np.asarray(m["loss"][-1]))
    t0 = time.time()
    for _ in range(5):
        state, m = runner.run_chunk(state, 200)
    float(np.asarray(m["loss"][-1]))
    return 5 * 200 * num_envs / (time.time() - t0)


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("num_envs", nargs="?", type=int, default=64)
    args = p.parse_args()
    print("with updates:    %.0f steps/s" % run(args.num_envs, 2_000))
    print("updates disabled:%.0f steps/s" % run(args.num_envs, 10**9))


if __name__ == "__main__":
    main()
