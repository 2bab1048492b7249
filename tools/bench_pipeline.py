#!/usr/bin/env python
"""End-to-end host-env actor-learner pipeline throughput (VERDICT r2 #1).

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

Writes PIPELINE_r03.json at the repo root.

Usage: python tools/bench_pipeline.py [--workers 3] [--lanes 96]
                                      [--seconds 30]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workers", type=int, default=3,
                        help="actor processes (container has 2 cores)")
    parser.add_argument("--lanes", type=int, default=96,
                        help="env lanes per actor process")
    parser.add_argument("--seconds", type=float, default=30.0)
    parser.add_argument("--burst", type=int, default=64,
                        help="learner updates fused per dispatch")
    args = parser.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import optax
    import flax.linen as nn

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs.synthetic_ale import make_warped
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.parallel.atari_pipeline import AtariActorLearnerPipeline
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.utils import atari_phi

    fps = bench_frame_pipeline()
    n_actions = 6

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(n_actions)(h))

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 10**6, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=atari_phi,
    )
    pipe = AtariActorLearnerPipeline(
        core=core,
        env_factory=make_warped,
        n_workers=args.workers,
        lanes_per_worker=args.lanes,
        capacity=200_000,          # single planes: 4x cheaper per row
        minibatch_size=32,
        update_interval=4,
        target_update_interval=10_000,
        replay_start_size=2_000,
        burst=args.burst,
    )
    pipe.start()
    try:
        # Warm up until the learner is actually running (first burst done).
        deadline = time.time() + 600
        last = time.time()
        while pipe.optim_t < args.burst and time.time() < deadline:
            if pipe.exception_event.is_set():
                raise RuntimeError("pipeline failed during warmup")
            if time.time() - last > 15:
                print(f"warmup: {pipe.acted_steps} steps,"
                      f" {pipe.optim_t} updates", flush=True)
                last = time.time()
            time.sleep(0.5)
        s0, u0, t0 = pipe.acted_steps, pipe.optim_t, time.time()
        time.sleep(args.seconds)
        steps = pipe.acted_steps - s0
        updates = pipe.optim_t - u0
        elapsed = time.time() - t0
    finally:
        pipe.stop()

    sps = steps / elapsed
    ups = updates / elapsed
    out = {
        "env_steps_per_sec": round(sps, 1),
        "updates_per_sec": round(ups, 1),
        "frame_pipeline_fps_single_thread": round(fps, 1),
        "actors": args.workers,
        "lanes_per_actor": args.lanes,
        "seconds": round(elapsed, 1),
        "updates_done": int(updates),
        "meets_device_act_rate": sps >= 1600.0,
        "meets_learner_rate": ups >= min(sps, 1600.0) / 4.0,
        "topology": "SyntheticALE(210x160x3) -> MaxAndSkip+WarpFrame(C++)"
        " -> spawned actor processes (K lanes each, shm planes)"
        " -> device act-stage (on-device FrameStack + replay staging)"
        " -> committer -> burst learner(batch 32, per-4-transitions)",
        "backend": jax.default_backend(),
        "note": "Per-transition H2D is one 7KB uint8 plane: frame stacking"
        " and replay staging run inside the act dispatch on device"
        " (atari_pipeline.py); the learner fuses "
        f"{args.burst} updates per dispatch.",
    }
    with open(os.path.join(REPO, "PIPELINE_r03.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    if pipe.exception_event.is_set():
        sys.exit(1)


if __name__ == "__main__":
    main()
