#!/usr/bin/env python
"""DQN lanes x batch scaling table on one chip (VERDICT r1 item 2).

Sweeps the on-device DQN/AtariSim workload (same shape as bench.py's dqn
anchor) over env-lane counts at the Nature cadence, and over update batch
sizes at fixed lanes, to show where the framework's throughput ceiling is
(it should scale with lanes until the update pipeline saturates the chip,
not plateau from framework overhead).

Writes SCALING_r02.json at the repo root:
  {"lanes_sweep": [{lanes, batch, env_steps_per_sec}, ...],
   "batch_sweep":  [...],
   "backend": "tpu"}

Usage: python tools/bench_scaling.py [--seconds 8]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def measure(num_envs, minibatch, seconds):
    import flax.linen as nn
    import jax
    import numpy as np
    import optax

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.replay import ReplayBuffer
    from pfrl_tpu.utils import atari_phi

    n_actions = 6

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(n_actions)(h))

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1_000_000, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=atari_phi,
    )
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=2_000,
        update_interval=4,   # Nature cadence: 1 update per 4 transitions
        target_update_interval=10_000,
        minibatch_size=minibatch,
    )
    runner = OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        ReplayBuffer(
            100_000,
            gamma=0.99,
            num_lanes=num_envs,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        ),
        cfg,
    )
    state = runner.init(jax.random.PRNGKey(0))
    chunk = max(64, 4096 // num_envs)
    state, metrics = runner.run_chunk(state, chunk)  # compile + fill
    jax.block_until_ready(metrics["loss"])
    n, t0 = 0, time.time()
    while time.time() - t0 < seconds:
        state, metrics = runner.run_chunk(state, chunk)
        jax.block_until_ready(metrics["loss"])
        n += 1
    elapsed = time.time() - t0
    loss = float(np.asarray(metrics["loss"][-1]))
    assert np.isfinite(loss)
    return n * chunk * num_envs / elapsed


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seconds", type=float, default=8.0)
    parser.add_argument(
        "--config",
        default=None,
        help="run ONE config 'lanes,batch' and merge it into the json "
        "(resumable sweeps across flaky-tunnel windows)",
    )
    args = parser.parse_args()

    import jax

    path = os.path.join(REPO, "SCALING_r02.json")
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    else:
        out = {
            "lanes_sweep": [],
            "batch_sweep": [],
            "backend": jax.default_backend(),
        }

    def flush():
        # Write after every config: the TPU tunnel can wedge mid-sweep and
        # partial results are still a scaling table.
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    def record(lanes, batch):
        sweep = out["lanes_sweep"] if batch == 32 else out["batch_sweep"]
        if any(r["lanes"] == lanes and r["batch"] == batch for r in sweep):
            print(f"skip lanes={lanes} batch={batch} (already recorded)")
            return
        sps = measure(lanes, batch, args.seconds)
        row = {"lanes": lanes, "batch": batch, "env_steps_per_sec": round(sps, 1)}
        sweep.append(row)
        print(json.dumps(row), flush=True)
        flush()

    if args.config:
        lanes, batch = (int(v) for v in args.config.split(","))
        record(lanes, batch)
        return

    for lanes in [32, 64, 128, 256]:
        record(lanes, 32)
    for batch in [64, 256, 1024]:
        record(64, batch)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
