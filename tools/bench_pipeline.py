#!/usr/bin/env python
"""End-to-end host-env pipeline throughput (VERDICT r1 item 3).

Measures the full ALE-shaped host loop: actor threads stepping synthetic
210x160x3 raw-frame envs through the REAL preprocessing stack
(MaxAndSkip + WarpFrame on the C++ runtime + FrameStack) -> the batched
inference server (one jitted NatureCNN forward per act batch on the
device) -> the poller draining transitions into the device replay ring ->
the learner thread running batch-32 updates flat-out. This is the
reference's actor-learner topology (pfrl/agents/dqn.py:604-788) with
queues/zero-copy snapshot swaps instead of pipes/state_dict copies.

Writes PIPELINE_r02.json at the repo root:
  env_steps_per_sec          end-to-end acted transitions/s
  frame_pipeline_fps         raw preprocessing throughput (no device)
  updates_done               learner updates completed in the window
  meets_device_act_rate      env_steps_per_sec >= the 1,600 steps/s/chip
                             north-star actor rate (BASELINE.md)

Usage: python tools/bench_pipeline.py [--actors 6] [--seconds 20]
"""

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class SyntheticALE:
    """Raw-Atari-shaped host env: 210x160x3 uint8 frames from a cheap
    numpy pattern, geometric episode lengths, gym-call API. Stands in for
    ALE (a host-CPU workload in every framework) so the measurement
    isolates the framework's pipeline, not the emulator."""

    class _Space:
        def __init__(self, n=6):
            self.n = n
            self.shape = (210, 160, 3)
            self.low = None
            self.high = None

    def __init__(self, seed=0):
        import numpy as np

        self._np = np
        self._rng = np.random.RandomState(seed)
        self._base = self._rng.randint(0, 256, (210, 160, 3), dtype=np.uint8)
        self.observation_space = self._Space()
        self.action_space = self._Space()
        self._t = 0
        self._ep_len = 0

    def _frame(self):
        # Roll + offset: cheap, content changes every step.
        return self._base + self._np.uint8(self._t & 0xFF)

    def reset(self, **kwargs):
        self._t = 0
        self._ep_len = int(self._rng.geometric(1.0 / 1000))
        return self._frame()

    def step(self, action):
        self._t += 1
        reward = 1.0 if (self._t % 37) == 0 else 0.0
        done = self._t >= self._ep_len
        return self._frame(), reward, done, {}

    def close(self):
        pass


def make_env(seed):
    from pfrl_tpu.wrappers import atari_wrappers

    env = atari_wrappers.MaxAndSkipEnv(SyntheticALE(seed), skip=4)
    return atari_wrappers.wrap_deepmind(
        env, episode_life=False, channel_order="hwc"
    )


def bench_frame_pipeline(seconds=3.0):
    """Preprocessing-only throughput (C++ WarpFrame/MaxAndSkip path)."""
    env = make_env(0)
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
    # Topology chosen from measured bottlenecks on this 2-core host:
    # (1) single-lane actor threads cap at ~330 steps/s from per-transition
    #     queue/event/GIL overhead -> vector actors amortize it K-fold;
    # (2) the device link's per-synced-call latency is the next wall ->
    #     --slots at HALF the lanes double-buffers: one actor pair's
    #     forward overlaps the other pair's env stepping.
    parser.add_argument("--actors", type=int, default=4)
    parser.add_argument("--lanes", type=int, default=32,
                        help="env lanes per actor thread")
    parser.add_argument("--slots", type=int, default=None,
                        help="inference batch width (default lanes*actors/2)")
    parser.add_argument("--seconds", type=float, default=20.0)
    args = parser.parse_args()
    if args.slots is None:
        args.slots = max(args.lanes, args.actors * args.lanes // 2)

    import sys as _sys

    # Faster GIL handoff: with compute-heavy actor threads on few cores the
    # default 5 ms switch interval convoys the server/poller threads.
    _sys.setswitchinterval(0.001)

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from pfrl_tpu import explorers, replay_buffers
    from pfrl_tpu.agents import DQN
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.utils import atari_phi
    from pfrl_tpu.utils.stoppable_thread import Counter

    fps = bench_frame_pipeline()

    n_actions = 6

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(n_actions)(h))

    agent = DQN(
        q_function=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        replay_buffer=replay_buffers.ReplayBuffer(
            50_000,
            gamma=0.99,
            num_lanes=args.actors * args.lanes,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        ),
        gamma=0.99,
        explorer=explorers.LinearDecayEpsilonGreedy(1.0, 0.1, 10**6, n_actions),
        replay_start_size=2_000,
        minibatch_size=32,
        update_interval=4,
        target_update_interval=10_000,
        phi=atari_phi,
    )

    make_actor, learner, poller, exc = agent.setup_actor_learner_training(
        n_actors=args.actors,
        lanes_per_actor=args.lanes,
        inference_slots=args.slots,
    )
    poller.start()
    learner.start()

    counter = Counter()
    stop = threading.Event()

    def actor_loop(i):
        k = args.lanes
        envs = [make_env(i * k + j) for j in range(k)]
        actor = make_actor(i)
        obs = [e.reset() for e in envs]
        while not stop.is_set():
            actions = actor.batch_act(obs)
            next_obs, rs, dones, resets = [], [], [], []
            for e, a in zip(envs, actions):
                o2, r, d, info = e.step(int(a))
                next_obs.append(o2)
                rs.append(r)
                dones.append(d)
                resets.append(info.get("needs_reset", False))
            actor.batch_observe(next_obs, rs, dones, resets)
            counter.increment(k)
            obs = [
                envs[j].reset() if dones[j] else next_obs[j] for j in range(k)
            ]

    threads = [
        threading.Thread(target=actor_loop, args=(i,), daemon=True)
        for i in range(args.actors)
    ]
    for t in threads:
        t.start()

    # Warmup: first device compile over the tunnel can take minutes cold
    # (persistent cache makes reruns fast), so wait for actual progress —
    # enough acted steps to fill replay past replay_start_size — rather
    # than a fixed sleep, then measure.
    warmup_target = 4_000
    warmup_deadline = time.time() + 600.0
    last_report = time.time()
    while counter.value < warmup_target and time.time() < warmup_deadline:
        time.sleep(0.5)
        if time.time() - last_report > 15.0:
            print(f"warmup: {counter.value} steps", flush=True)
            last_report = time.time()
    start_steps = counter.value
    start_updates = agent.optim_t
    t0 = time.time()
    time.sleep(args.seconds)
    steps = counter.value - start_steps
    updates = agent.optim_t - start_updates
    elapsed = time.time() - t0
    stop.set()
    learner.stop()
    poller.stop()
    learner.join(5)
    poller.join(5)

    sps = steps / elapsed
    out = {
        "env_steps_per_sec": round(sps, 1),
        "frame_pipeline_fps_single_thread": round(fps, 1),
        "actors": args.actors,
        "lanes_per_actor": args.lanes,
        "inference_slots": args.slots,
        "seconds": args.seconds,
        "updates_done": int(updates),
        "updates_per_sec": round(updates / elapsed, 1),
        "meets_device_act_rate": sps >= 1600.0,
        "topology": "SyntheticALE(210x160x3) -> MaxAndSkip+WarpFrame(C++)"
        " -> FrameStack -> vector actor threads (K lanes each)"
        " -> BatchedInferenceServer(TPU) -> poller -> device replay"
        " -> learner(batch 32)",
        "backend": jax.default_backend(),
    }
    with open(os.path.join(REPO, "PIPELINE_r02.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    assert not exc.is_set()


if __name__ == "__main__":
    main()
