"""Nature DQN Atari reproduction (reference parity:
examples/atari/reproduction/dqn/train_dqn.py:17-79).

With gym[atari] on the host, drives the real ALE through the wrapper stack
and the reference-protocol DQN shell. Without it (this container), runs the
same agent configuration against the device-side AtariSim at full speed via
the on-device runner — the training-loop computation is identical.

Usage:
    python train_dqn.py --env BreakoutNoFrameskip-v4 --steps 50000000
    python train_dqn.py --sim --steps 1000000     # AtariSim on-device
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import experiments, explorers, replay_buffers
from pfrl_tpu.models import LargeAtariCNN
from pfrl_tpu.q_functions import DiscreteActionValueHead


# Dtype-aware: uint8 frames scale to [0,1]; float input (already
# dequantized by the replay buffer's fused Pallas gather) passes through.
from pfrl_tpu.utils import atari_phi as phi  # noqa: E402


class NatureQ(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, x):
        h = LargeAtariCNN()(x)
        return DiscreteActionValueHead()(nn.Dense(self.n_actions)(h))


def make_agent_config(n_actions, args):
    # Reference hyperparameters (train_dqn.py:120-160).
    return dict(
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, momentum=0.0, eps=1e-2),
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, args.final_epsilon, args.final_exploration_frames, n_actions
        ),
        gamma=0.99,
        batch_accumulator="sum",
        phi=phi,
        compute_dtype=jnp.bfloat16 if getattr(args, "bf16", False) else None,
    )


def run_sim(args):
    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig

    n_actions = 6
    core = DQNCore(model=NatureQ(n_actions=n_actions), **make_agent_config(n_actions, args))
    cfg = RunnerConfig(
        num_envs=args.num_envs,
        replay_start_size=args.replay_start_size,
        update_interval=4,
        target_update_interval=args.target_update_interval,
        minibatch_size=32,
    )
    buffer = replay_buffers.ReplayBuffer(
        args.replay_capacity, gamma=0.99, num_lanes=args.num_envs,
        store_next_obs=False, fused_dequant_scale=1.0 / 255.0,
    )
    runner = OffPolicyRunner(AtariSim(n_actions=n_actions), core, buffer, cfg)
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(
        AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500
    )
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    import time

    chunk = 500
    t0 = time.time()
    while int(state.t) < args.steps:
        state, metrics = runner.run_chunk(state, chunk)
        loss = float(jax.numpy.asarray(metrics["loss"][-1]))
        t = int(state.t)
        print(
            f"step {t:>10d} | {t/(time.time()-t0):>8.0f} steps/s | "
            f"loss {loss:.4f} | recent R {runner.recent_return_mean(state):.1f}",
            flush=True,
        )
    save_train_state_if_requested(state.train_state, args.save_to)


def run_ale(args):
    import numpy as np

    from pfrl_tpu.agents import DQN
    from pfrl_tpu.wrappers import RandomizeAction, atari_wrappers

    env = atari_wrappers.wrap_deepmind(
        atari_wrappers.make_atari(args.env, max_frames=args.max_frames),
        episode_life=True,
        clip_rewards=True,
        channel_order="hwc",
    )
    eval_env = RandomizeAction(
        atari_wrappers.wrap_deepmind(
            atari_wrappers.make_atari(args.env, max_frames=args.max_frames),
            episode_life=False,
            clip_rewards=False,
            channel_order="hwc",
        ),
        random_fraction=0.05,  # Atari eval protocol (reference :104-107)
    )
    n_actions = env.action_space.n
    cfgd = make_agent_config(n_actions, args)
    agent = DQN(
        NatureQ(n_actions=n_actions),
        cfgd["optimizer"],
        replay_buffers.ReplayBuffer(args.replay_capacity, gamma=0.99),
        0.99,
        cfgd["explorer"],
        replay_start_size=args.replay_start_size,
        minibatch_size=32,
        update_interval=4,
        target_update_interval=args.target_update_interval,
        batch_accumulator="sum",
        phi=lambda x: jnp.asarray(np.asarray(x), jnp.float32) / 255.0,
        seed=args.seed,
    )
    if args.load:
        agent.load(args.load)
    if args.demo:
        stats = experiments.eval_performance(
            env=eval_env, agent=agent, n_steps=None, n_episodes=10
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    experiments.train_agent_with_evaluation(
        agent,
        env,
        steps=args.steps,
        eval_n_steps=125_000,
        eval_n_episodes=None,
        eval_interval=250_000,
        outdir=args.outdir,
        eval_env=eval_env,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="BreakoutNoFrameskip-v4")
    parser.add_argument("--sim", action="store_true",
                        help="use the device-side AtariSim instead of ALE")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--replay-capacity", type=int, default=10**5)
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--final-epsilon", type=float, default=0.1)
    parser.add_argument("--final-exploration-frames", type=int, default=10**6)
    parser.add_argument("--max-frames", type=int, default=30 * 60 * 60)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--outdir", default="results/dqn")
    add_demo_args(parser)
    args = parser.parse_args()

    if args.sim:
        run_sim(args)
    else:
        run_ale(args)


if __name__ == "__main__":
    main()
