#!/usr/bin/env python
"""DQN lanes x batch scaling table on one chip (VERDICT r2 #3).

Sweeps the on-device DQN/AtariSim workload (same shape as bench.py's dqn
anchor, Nature cadence: one batch-B update per 4 env transitions) over
the lanes x batch grid, reporting env-steps/s plus an analytic
achieved-FLOP/s / MFU estimate per config — answering "is the framework
or the workload the limit": throughput should rise with lanes until the
chip saturates, and MFU should rise with batch (bigger matmuls).

Writes SCALING_r04.json at the repo root (rows carry a "dtype"
field: fp32 vs bf16-compute-over-fp32-masters):
  {"rows": [{lanes, batch, dtype, steps_per_sec, updates_per_sec,
             achieved_tflops, mfu_pct}, ...],
   "mfu_note": "...", "backend": "tpu"}

Resumable: rerun after a tunnel wedge and completed configs are skipped;
--config "lanes,batch" measures one cell.

Usage: python tools/bench_scaling.py [--seconds 8] [--config 64,32]
                                     [--dtype fp32|bf16]
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

# r04 grid: the r03 full-lane sweep (SCALING_r03.json) already mapped the
# lane axis; r04 keeps three lane points and adds the fp32/bf16 axis.
LANES = [64, 256, 512]
BATCHES = [32, 128, 512]
PEAK_BF16 = 197e12  # TPU v5 lite public spec

# NatureCNN forward FLOPs/sample (same analytic count as bench.py).
N_ACTIONS = 6
FWD_FLOPS = 2 * (
    20 * 20 * 32 * 8 * 8 * 4
    + 9 * 9 * 64 * 4 * 4 * 32
    + 7 * 7 * 64 * 3 * 3 * 64
    + 3136 * 512
    + 512 * N_ACTIONS
)


def measure(num_envs, minibatch, seconds, dtype="fp32"):
    import flax.linen as nn
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
    from pfrl_tpu.utils import atari_phi

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(N_ACTIONS)(h))

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1_000_000, N_ACTIONS),
        gamma=0.99,
        batch_accumulator="sum",
        phi=atari_phi,
        compute_dtype=jnp.bfloat16 if dtype == "bf16" else None,
    )
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=2_000,
        update_interval=4,   # Nature cadence: 1 update per 4 transitions
        target_update_interval=10_000,
        minibatch_size=minibatch,
    )
    runner = OffPolicyRunner(
        AtariSim(n_actions=N_ACTIONS),
        core,
        # 20k-row ring (vs the anchor's 100k): identical math and
        # throughput — sampling cost does not depend on capacity — but the
        # 2.8GB allocation of a 100k uint8 ring reliably wedges the
        # tunneled chip when the link is degraded.
        ReplayBuffer(
            20_000,
            gamma=0.99,
            num_lanes=num_envs,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        ),
        cfg,
    )
    state = runner.init(jax.random.PRNGKey(0))
    chunk = max(32, 4096 // num_envs)

    def sync(metrics):
        # A REAL value readback, not block_until_ready: over the tunnel,
        # block_until_ready can acknowledge before execution completes,
        # silently inflating throughput ~500x (measured).
        return float(np.asarray(metrics["loss"][-1]))

    state, metrics = runner.run_chunk(state, chunk)  # compile + fill
    sync(metrics)
    state, metrics = runner.run_chunk(state, chunk)  # warm, same shape
    sync(metrics)
    n, t0 = 0, time.time()
    while time.time() - t0 < seconds:
        state, metrics = runner.run_chunk(state, chunk)
        loss = sync(metrics)
        n += 1
    elapsed = time.time() - t0
    assert np.isfinite(loss)
    return n * chunk * num_envs / elapsed


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seconds", type=float, default=8.0)
    parser.add_argument("--dtype", choices=["fp32", "bf16"], default=None,
                        help="measure one precision only (default: both)")
    parser.add_argument(
        "--config",
        default=None,
        help="run ONE config 'lanes,batch' and merge it into the json",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Record this run's tunnel window: a degraded (~1 ms+) dispatch floor
    # deflates every row ~2x and completely masks the fp32/bf16 delta.
    _f = jax.jit(lambda x: x + 1)
    _x = jnp.zeros(())
    float(np.asarray(_f(_x)))
    _floor = float("inf")
    for _ in range(20):
        _t0 = time.time()
        float(np.asarray(_f(_x)))
        _floor = min(_floor, time.time() - _t0)

    # Round-stamped output: write the CURRENT round's file (override with
    # SCALING_OUT). Earlier rounds' files are kept as committed history.
    path = os.environ.get(
        "SCALING_OUT", os.path.join(REPO, "SCALING_r05.json")
    )
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    else:
        out = {
            "rows": [],
            "backend": jax.default_backend(),
            "mfu_note": (
                "MFU = analytic NatureCNN FLOPs (act fwd over all lanes + "
                "4x-fwd-equivalent per batch-B update at one update per 4 "
                "transitions) / measured wall time / 197 TFLOP/s bf16 peak "
                "(TPU v5e)."
            ),
        }

    def flush():
        # Write after every config: the TPU tunnel can wedge mid-sweep and
        # partial results are still a scaling table.
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    out.setdefault("dispatch_floor_us_per_run", []).append(round(_floor * 1e6, 1))
    flush()

    def record(lanes, batch, dtype):
        if any(
            r["lanes"] == lanes and r["batch"] == batch
            and r.get("dtype", "fp32") == dtype
            for r in out["rows"]
        ):
            print(f"skip lanes={lanes} batch={batch} {dtype} (already recorded)")
            return
        sps = measure(lanes, batch, args.seconds, dtype)
        # Per env transition: one act forward + (1/4 update) x batch x
        # 4-fwd-equivalents = fwd x (1 + batch).
        achieved = sps * FWD_FLOPS * (1 + batch)
        row = {
            "lanes": lanes,
            "batch": batch,
            "dtype": dtype,
            "steps_per_sec": round(sps, 1),
            "updates_per_sec": round(sps / 4, 1),
            "achieved_tflops": round(achieved / 1e12, 3),
            "mfu_pct": round(100 * achieved / PEAK_BF16, 2),
        }
        out["rows"].append(row)
        print(json.dumps(row), flush=True)
        flush()

    dtypes = [args.dtype] if args.dtype else ["fp32", "bf16"]
    if args.config:
        lanes, batch = (int(v) for v in args.config.split(","))
        for dt in dtypes:
            record(lanes, batch, dt)
        return

    for batch in BATCHES:
        for lanes in LANES:
            for dt in dtypes:  # interleave precisions inside one window
                record(lanes, batch, dt)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
