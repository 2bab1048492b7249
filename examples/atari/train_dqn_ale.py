"""General DQN-family training on Atari with the reference's knobs.

Reference parity: examples/atari/train_dqn_ale.py — selectable
architecture (nature / nips / dueling), DoubleDQN, prioritized replay, and
NoisyNet exploration, on the DeepMind ALE wrapper stack.

Host path (requires gym[atari]+cv2): the reference-protocol DQN shell over
the real ALE. Sim path (--sim, runs anywhere): the same agent config
against the on-device AtariSim through the fused runner — identical
training computation at the real shapes.

    python train_dqn_ale.py --env BreakoutNoFrameskip-v4 --prioritized
    python train_dqn_ale.py --sim --arch dueling --double --prioritized
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import explorers, replay_buffers
from pfrl_tpu.agents import DoubleDQNCore, DQNCore
from pfrl_tpu.models import LargeAtariCNN, SmallAtariCNN, to_factorized_noisy
from pfrl_tpu.q_functions import DiscreteActionValueHead, DuelingDQN


# Dtype-aware: uint8 frames scale to [0,1]; float input (already
# dequantized by the replay buffer's fused Pallas gather) passes through.
from pfrl_tpu.utils import atari_phi as phi  # noqa: E402


class ConvQ(nn.Module):
    n_actions: int
    torso: str = "nature"
    dense_cls: any = None

    @nn.compact
    def __call__(self, x):
        dense = self.dense_cls or nn.Dense
        torso = LargeAtariCNN() if self.torso == "nature" else SmallAtariCNN()
        h = torso(x)
        return DiscreteActionValueHead()(dense(self.n_actions)(h))


def build_model(n_actions, args):
    dense_cls = (
        to_factorized_noisy(nn.Dense, sigma_scale=args.noisy_net_sigma)
        if args.noisy_net_sigma is not None
        else None
    )
    if args.arch == "dueling":
        return DuelingDQN(n_actions=n_actions, dense_cls=dense_cls)
    return ConvQ(
        n_actions=n_actions,
        torso="nature" if args.arch == "nature" else "nips",
        dense_cls=dense_cls,
    )


def build_core_and_buffer(n_actions, args):
    core_cls = DoubleDQNCore if args.double else DQNCore
    if args.noisy_net_sigma is not None:
        explorer = explorers.Greedy()  # NoisyNet replaces eps-greedy
    else:
        explorer = explorers.LinearDecayEpsilonGreedy(
            1.0, args.final_epsilon, args.final_exploration_frames, n_actions
        )
    core = core_cls(
        model=build_model(n_actions, args),
        optimizer=optax.adam(args.lr, eps=1.5e-4),
        explorer=explorer,
        gamma=0.99,
        phi=phi,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.prioritized:
        buffer = replay_buffers.PrioritizedReplayBuffer(
            args.replay_capacity,
            alpha=0.6,
            beta0=0.4,
            betasteps=args.steps / args.update_interval,
            num_steps=args.num_step_return,
            gamma=0.99,
            num_lanes=args.num_envs,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        )
    else:
        buffer = replay_buffers.ReplayBuffer(
            args.replay_capacity,
            num_steps=args.num_step_return,
            gamma=0.99,
            num_lanes=args.num_envs,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        )
    return core, buffer


def run_sim(args):
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig

    n_actions = 6
    core, buffer = build_core_and_buffer(n_actions, args)
    runner = OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        buffer,
        RunnerConfig(
            num_envs=args.num_envs,
            replay_start_size=args.replay_start_size,
            update_interval=args.update_interval,
            target_update_interval=args.target_update_interval,
            minibatch_size=args.batch_size,
        ),
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(
        AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500
    )
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    t0 = time.time()
    while int(state.t) < args.steps:
        state, metrics = runner.run_chunk(state, args.chunk)
        t = int(state.t)
        print(
            f"step {t:>9} | {t / (time.time() - t0):>8.0f} env-steps/s"
            f" | loss {float(jnp.asarray(metrics['loss'][-1])):.4f}"
        )
    print(f"done: {int(state.t)} transitions in {time.time() - t0:.1f}s")
    save_train_state_if_requested(state.train_state, args.save_to)


def run_ale(args):
    from pfrl_tpu.agents import DQN
    from pfrl_tpu.experiments import train_agent_with_evaluation
    from pfrl_tpu.wrappers import RandomizeAction
    from pfrl_tpu.wrappers.atari_wrappers import make_atari, wrap_deepmind

    def make_env(test):
        env = wrap_deepmind(
            make_atari(args.env, max_frames=args.max_frames),
            episode_life=not test,
            clip_rewards=not test,
            channel_order="hwc",
        )
        if test:
            env = RandomizeAction(env, 0.05)
        return env

    env = make_env(False)
    n_actions = env.action_space.n
    core, buffer = build_core_and_buffer(n_actions, args)
    agent = DQN(
        q_function=core.model,
        optimizer=optax.adam(args.lr, eps=1.5e-4),
        replay_buffer=buffer.configure_lanes(1),
        gamma=0.99,
        explorer=core.explorer,
        replay_start_size=args.replay_start_size,
        minibatch_size=args.batch_size,
        update_interval=args.update_interval,
        target_update_interval=args.target_update_interval,
        phi=phi,
        seed=args.seed,
        core_cls=DoubleDQNCore if args.double else DQNCore,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.load:
        agent.load(args.load)
    if args.demo:
        from pfrl_tpu.experiments import eval_performance

        stats = eval_performance(
            env=make_env(True), agent=agent, n_steps=None, n_episodes=10
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    train_agent_with_evaluation(
        agent=agent,
        env=env,
        eval_env=make_env(True),
        steps=args.steps,
        eval_n_steps=125_000,
        eval_n_episodes=None,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="BreakoutNoFrameskip-v4")
    parser.add_argument("--sim", action="store_true",
                        help="run against the on-device AtariSim")
    parser.add_argument("--arch", choices=("nature", "nips", "dueling"),
                        default="nature")
    parser.add_argument("--double", action="store_true")
    parser.add_argument("--prioritized", action="store_true")
    parser.add_argument("--noisy-net-sigma", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--num-step-return", type=int, default=1)
    parser.add_argument("--replay-capacity", type=int, default=10**6)
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument("--update-interval", type=int, default=4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--final-epsilon", type=float, default=0.01)
    parser.add_argument("--final-exploration-frames", type=int, default=10**6)
    parser.add_argument("--eval-interval", type=int, default=10**5)
    parser.add_argument("--chunk", type=int, default=500,
                        help="scan steps per device dispatch (sim mode)")
    parser.add_argument("--max-frames", type=int, default=30 * 60 * 60)
    parser.add_argument("--outdir", default="results/dqn_ale")
    add_demo_args(parser)
    args = parser.parse_args()
    if args.sim:
        run_sim(args)
    else:
        run_ale(args)


if __name__ == "__main__":
    main()
