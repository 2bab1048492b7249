"""DQN on Atari via the device-resident actor-learner pipeline.

The highest-throughput host-env path (pfrl_tpu/parallel/atari_pipeline.py):
spawned actor processes step ALE + C++ MaxAndSkip/WarpFrame and publish
84x84 uint8 planes over shared memory; frame stacking, replay staging and
action selection run inside the act dispatch on device; the learner fuses
updates in bursts. Reference counterpart: the actor-learner mode of
examples/atari/train_dqn_batch_ale.py (pfrl/agents/dqn.py:604-788), which
ships full observations over pipes instead.

    python train_dqn_pipeline_ale.py --env BreakoutNoFrameskip-v4
    python train_dqn_pipeline_ale.py --sim        # SyntheticALE, no ROMs
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)
import functools
import time


def make_ale_plane_env(env_id, seed=0):
    """ALE -> MaxAndSkip -> ClipReward -> WarpFrame: [84,84,1] uint8 planes.

    No FrameStack — stacking runs on device. Module-level (spawn-picklable).
    """
    from pfrl_tpu.wrappers.atari_wrappers import (
        ClipRewardEnv,
        MaxAndSkipEnv,
        WarpFrame,
        make_atari,
    )

    env = make_atari(env_id)
    env.seed(seed)
    env = MaxAndSkipEnv(env, skip=4)
    env = ClipRewardEnv(env)
    return WarpFrame(env, channel_order="hwc")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="BreakoutNoFrameskip-v4")
    parser.add_argument("--sim", action="store_true",
                        help="SyntheticALE frames instead of ALE (no ROMs)")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--workers", type=int, default=3)
    parser.add_argument("--lanes", type=int, default=96)
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--replay-capacity", type=int, default=10**6,
                        help="single planes: 4x cheaper per row than stacks")
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument("--update-interval", type=int, default=4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--burst", type=int, default=64)
    parser.add_argument("--log-interval", type=float, default=30.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser)
    args = parser.parse_args()

    import flax.linen as nn
    import optax

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.parallel.atari_pipeline import AtariActorLearnerPipeline
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.utils import atari_phi

    if args.sim:
        from pfrl_tpu.envs.synthetic_ale import make_warped as factory

        n_actions = 6
    else:
        factory = functools.partial(make_ale_plane_env, args.env)
        probe = factory(0)
        n_actions = probe.action_space.n
        probe.close()

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(n_actions)(h))

    import jax.numpy as jnp

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(args.lr, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 10**6, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=atari_phi,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.demo or args.load:
        import jax
        import jax.numpy as jnp

        from pfrl_tpu.envs import AtariSim
        from pfrl_tpu.experiments import JaxEvalLoop
        from pfrl_tpu.experiments.demo_cli import resolve_train_state_path
        from pfrl_tpu.replay.persistent import load_state

        ts = core.init(jax.random.PRNGKey(0), jnp.zeros((1, 84, 84, 4), jnp.uint8))
        if args.load:
            ts = jax.device_put(
                load_state(jax.device_get(ts), resolve_train_state_path(args.load))
            )
        evaluator = JaxEvalLoop(
            AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500
        )
        if run_demo_if_requested(args, evaluator, ts, seed=args.seed):
            return

    pipe = AtariActorLearnerPipeline(
        core=core,
        env_factory=factory,
        n_workers=args.workers,
        lanes_per_worker=args.lanes,
        capacity=args.replay_capacity,
        minibatch_size=args.batch_size,
        update_interval=args.update_interval,
        target_update_interval=args.target_update_interval,
        replay_start_size=args.replay_start_size,
        burst=args.burst,
        seed=args.seed,
    )
    pipe.start()
    try:
        last_t, last_steps = time.time(), 0
        while pipe.acted_steps < args.steps:
            if pipe.exception_event.is_set():
                raise RuntimeError("pipeline failed (see logs)")
            time.sleep(args.log_interval)
            now, steps = time.time(), pipe.acted_steps
            sps = (steps - last_steps) / (now - last_t)
            stats = dict(pipe.get_statistics())
            print(
                f"step {steps} | {sps:,.0f} env-steps/s | "
                f"{stats['n_updates']} updates | "
                f"loss {stats['average_loss']:.4f} | "
                f"avg Q {stats['average_q']:.2f}",
                flush=True,
            )
            last_t, last_steps = now, steps
    finally:
        pipe.stop()
    save_train_state_if_requested(pipe.train_state, args.save_to)


if __name__ == "__main__":
    main()
