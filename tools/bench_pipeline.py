#!/usr/bin/env python
"""End-to-end host-env actor-learner pipeline throughput + topology sweep.

Measures the full ALE-shaped host loop on the device-resident pipeline
(pfrl_tpu/parallel/atari_pipeline.py): spawned actor processes step
synthetic 210x160x3 raw-frame envs through the REAL preprocessing stack
(MaxAndSkip + WarpFrame on the C++ runtime), publish 84x84 uint8 planes
over shared memory; the server act-stages them on device (device-side
frame stacking + replay staging inside the act dispatch); the committer
commits reward/flag rows; the learner runs burst updates paced at one
batch-32 update per 4 acted transitions (Nature-DQN cadence).

Gates (BASELINE.md / VERDICT r2): env_steps_per_sec >= 1,600 AND
updates_per_sec >= env_steps_per_sec / 4 (>= 400 at the gate rate).

Modes:
  python tools/bench_pipeline.py                      # single config
  python tools/bench_pipeline.py --sweep              # actors x lanes grid
                                                      #  (VERDICT r3 weak #4)

The sweep merges into PIPELINE_r04.json incrementally (resumable: done
configs are skipped on rerun — the TPU tunnel can wedge mid-sweep) and
records the best config under "best".
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Round-stamped output (override with PIPELINE_OUT); earlier rounds'
# files are committed history.
OUT_PATH = os.environ.get(
    "PIPELINE_OUT", os.path.join(REPO, "PIPELINE_r05.json")
)


def bench_frame_pipeline(seconds=3.0):
    """Preprocessing-only throughput (C++ WarpFrame/MaxAndSkip path)."""
    from pfrl_tpu.envs.synthetic_ale import make_warped

    env = make_warped(0)
    env.reset()
    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        _, _, done, _ = env.step(n % 6)
        if done:
            env.reset()
        n += 1
    return n / (time.time() - t0)


def _make_core():
    import optax
    import flax.linen as nn

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.utils import atari_phi

    n_actions = 6

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(n_actions)(h))

    return DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 10**6, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=atari_phi,
    )


def run_config(workers, lanes, seconds, burst=64):
    from pfrl_tpu.envs.synthetic_ale import make_warped
    from pfrl_tpu.parallel.atari_pipeline import AtariActorLearnerPipeline

    pipe = AtariActorLearnerPipeline(
        core=_make_core(),
        env_factory=make_warped,
        n_workers=workers,
        lanes_per_worker=lanes,
        capacity=50_000,  # small ring: identical throughput math, and
        #                   multi-GB allocations wedge a degraded tunnel
        minibatch_size=32,
        update_interval=4,
        target_update_interval=10_000,
        replay_start_size=2_000,
        burst=burst,
    )
    pipe.start()
    try:
        deadline = time.time() + 420
        last = time.time()
        while pipe.optim_t < burst and time.time() < deadline:
            if pipe.exception_event.is_set():
                raise RuntimeError("pipeline failed during warmup")
            if time.time() - last > 15:
                print(f"  warmup: {pipe.acted_steps} steps,"
                      f" {pipe.optim_t} updates", flush=True)
                last = time.time()
            time.sleep(0.5)
        if pipe.optim_t < burst:
            raise RuntimeError("warmup timed out")
        s0, u0, t0 = pipe.acted_steps, pipe.optim_t, time.time()
        time.sleep(seconds)
        steps = pipe.acted_steps - s0
        updates = pipe.optim_t - u0
        elapsed = time.time() - t0
    finally:
        pipe.stop()
    sps, ups = steps / elapsed, updates / elapsed
    return {
        "actors": workers,
        "lanes_per_actor": lanes,
        "total_lanes": workers * lanes,
        "env_steps_per_sec": round(sps, 1),
        "updates_per_sec": round(ups, 1),
        "seconds": round(elapsed, 1),
        "meets_device_act_rate": sps >= 1600.0,
        "meets_learner_rate": ups >= min(sps, 1600.0) / 4.0,
    }


def _load():
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            return json.load(f)
    return {"grid": []}


def _save(out):
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=1)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workers", type=int, default=3)
    parser.add_argument("--lanes", type=int, default=96)
    parser.add_argument("--seconds", type=float, default=30.0)
    parser.add_argument("--burst", type=int, default=64)
    parser.add_argument("--sweep", action="store_true",
                        help="actors in {2,3,4,6} x lanes in {32,64,96,128}")
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax

    out = _load()
    out["backend"] = jax.default_backend()
    out["topology"] = (
        "SyntheticALE(210x160x3) -> MaxAndSkip+WarpFrame(C++) -> spawned "
        "actor processes (K lanes each, shm planes) -> device act-stage "
        "(on-device FrameStack + replay staging) -> committer -> burst "
        "learner(batch 32, per-4-transitions)"
    )
    if "frame_pipeline_fps_single_thread" not in out:
        out["frame_pipeline_fps_single_thread"] = round(bench_frame_pipeline(), 1)
        _save(out)

    # Annotate the capture's tunnel window: degraded windows (~1 ms+
    # dispatch floor vs ~30 µs good) deflate every row ~2-3x.
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    float(np.asarray(f(x)))
    floor = float("inf")
    for _ in range(20):
        t0 = time.time()
        float(np.asarray(f(x)))
        floor = min(floor, time.time() - t0)
    out.setdefault("dispatch_floor_us_per_run", []).append(round(floor * 1e6, 1))
    _save(out)

    if args.sweep:
        grid = [(w, l) for w in (2, 3, 4, 6) for l in (32, 64, 96, 128)]
        done = {(g["actors"], g["lanes_per_actor"]) for g in out["grid"]}
        for w, l in grid:
            if (w, l) in done:
                print(f"skip done: {w} actors x {l} lanes", flush=True)
                continue
            print(f"config: {w} actors x {l} lanes", flush=True)
            try:
                row = run_config(w, l, args.seconds)
            except Exception as e:  # keep the sweep going past one wedge
                row = {"actors": w, "lanes_per_actor": l, "error": str(e)}
            out["grid"].append(row)
            ok_rows = [g for g in out["grid"] if "error" not in g]
            if ok_rows:
                out["best"] = max(ok_rows, key=lambda g: g["env_steps_per_sec"])
            _save(out)
            print(json.dumps(row), flush=True)
    else:
        row = run_config(args.workers, args.lanes, args.seconds, args.burst)
        # Merge into the grid (replacing any stale row for the same
        # config) so successive single-config runs accumulate instead of
        # clobbering one "single" slot.
        out["grid"] = [
            g for g in out["grid"]
            if (g["actors"], g["lanes_per_actor"])
            != (row["actors"], row["lanes_per_actor"])
        ] + [row]
        ok_rows = [g for g in out["grid"] if "error" not in g]
        if ok_rows:
            out["best"] = max(ok_rows, key=lambda g: g["env_steps_per_sec"])
        out.pop("single", None)
        _save(out)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
