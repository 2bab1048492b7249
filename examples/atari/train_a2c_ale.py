"""A2C on Atari.

Reference parity: examples/atari/train_a2c_ale.py — synchronous
advantage actor-critic over a vector of ALE envs, NIPS-DQN CNN torso with
shared policy/value heads, RMSprop.

Sim path (--sim): the same model/update through the fully-jitted
OnPolicyRunner over the on-device AtariSim.

    python train_a2c_ale.py --env BreakoutNoFrameskip-v4
    python train_a2c_ale.py --sim
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

from pfrl_tpu.agents import A2C, A2CCore
from pfrl_tpu.models import SmallAtariCNN
from pfrl_tpu.policies import SoftmaxCategoricalHead


def phi(x):
    return x.astype(jnp.float32) / 255.0


class PiV(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, x):
        h = SmallAtariCNN()(x)
        return (
            SoftmaxCategoricalHead()(nn.Dense(self.n_actions)(h)),
            nn.Dense(1)(h),
        )


def build_core(n_actions, args):
    return A2CCore(
        model=PiV(n_actions=n_actions),
        optimizer=optax.rmsprop(args.lr, decay=0.99, eps=1e-5),
        gamma=0.99,
        use_gae=args.use_gae,
        tau=args.tau,
        entropy_coeff=0.01,
        v_loss_coef=0.5,
        max_grad_norm=40.0,
        phi=phi,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )


def run_sim(args):
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import JaxEvalLoop, OnPolicyRunner

    n_actions = 6
    core = build_core(n_actions, args)
    runner = OnPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        num_envs=args.num_envs,
        rollout_len=args.update_steps,
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500)
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    t0 = time.time()
    per_iter = args.num_envs * args.update_steps
    while int(state.t) < args.steps:
        state, _ = runner.run_iterations(state, max(1, 10000 // per_iter))
        t = int(state.t)
        print(f"step {t:>9} | {t / (time.time() - t0):>8.0f} env-steps/s")
    print(f"done: {int(state.t)} transitions in {time.time() - t0:.1f}s")
    save_train_state_if_requested(state.train_state, args.save_to)


def run_ale(args):
    from pfrl_tpu.envs import MultiprocessVectorEnv
    from pfrl_tpu.experiments import train_agent_batch_with_evaluation
    from pfrl_tpu.wrappers.atari_wrappers import make_atari, wrap_deepmind

    def make_env(idx, test):
        env = wrap_deepmind(
            make_atari(args.env),
            episode_life=not test,
            clip_rewards=not test,
            channel_order="hwc",
        )
        env.seed(args.seed + idx + (10**6 if test else 0))
        return env

    env = MultiprocessVectorEnv(
        [lambda i=i: make_env(i, False) for i in range(args.num_envs)]
    )
    eval_env = MultiprocessVectorEnv(
        [lambda i=i: make_env(i, True) for i in range(args.num_envs)]
    )
    n_actions = env.action_space.n
    agent = A2C(
        PiV(n_actions=n_actions),
        optax.rmsprop(args.lr, decay=0.99, eps=1e-5),
        gamma=0.99,
        num_processes=args.num_envs,
        update_steps=args.update_steps,
        use_gae=args.use_gae,
        tau=args.tau,
        max_grad_norm=40.0,
        phi=phi,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )
    if args.load:
        agent.load(args.load)
    if args.demo:
        from pfrl_tpu.experiments import eval_performance

        stats = eval_performance(
            env=eval_env, agent=agent, n_steps=None, n_episodes=10
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    train_agent_batch_with_evaluation(
        agent=agent,
        env=env,
        eval_env=eval_env,
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=10,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="BreakoutNoFrameskip-v4")
    parser.add_argument("--sim", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--num-envs", type=int, default=16)
    parser.add_argument("--update-steps", type=int, default=5)
    parser.add_argument("--lr", type=float, default=7e-4)
    parser.add_argument("--use-gae", action="store_true")
    parser.add_argument("--tau", type=float, default=0.95)
    parser.add_argument("--eval-interval", type=int, default=10**6)
    parser.add_argument("--outdir", default="results/a2c_ale")
    add_demo_args(parser)
    args = parser.parse_args()
    if args.sim:
        run_sim(args)
    else:
        run_ale(args)


if __name__ == "__main__":
    main()
