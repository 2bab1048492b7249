"""REINFORCE on CartPole through the reference-style host loop.

Reference parity: examples/gym/train_reinforce_gym.py — episodic
Monte-Carlo policy gradient with a softmax policy, driven by
``train_agent_with_evaluation`` (the serial act/observe protocol).

    python train_reinforce_gym.py --steps 100000
    python train_reinforce_gym.py --env CartPole-v1   # real gymnasium env
"""

import argparse

from pfrl_tpu.experiments.demo_cli import add_demo_args

import flax.linen as nn
import jax.numpy as jnp
import optax

from pfrl_tpu import experiments
from pfrl_tpu.agents import REINFORCE
from pfrl_tpu.envs import CartPole, HostJaxEnv, TimeLimit
from pfrl_tpu.policies import SoftmaxCategoricalHead


class Policy(nn.Module):
    n_actions: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(128)(x))
        return SoftmaxCategoricalHead()(nn.Dense(self.n_actions)(h))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--env", default="cartpole",
        help="'cartpole' for the in-repo device sim stepped on the host, "
        "or any real gymnasium env id with a discrete action space "
        "(hard-fails if unavailable)",
    )
    parser.add_argument("--steps", type=int, default=100_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--batchsize", type=int, default=10,
                        help="episodes per policy update (reinforce.py)")
    parser.add_argument("--beta", type=float, default=1e-4)
    parser.add_argument("--eval-interval", type=int, default=10_000)
    parser.add_argument("--eval-n-runs", type=int, default=10)
    parser.add_argument("--outdir", type=str, default="results/reinforce_cartpole")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser, save=False)
    args = parser.parse_args()

    if args.env == "cartpole":
        def make_env(seed):
            return HostJaxEnv(TimeLimit(CartPole(), 500), seed=seed)

        n_actions = 2
    else:
        # Real gymnasium env (reference train_reinforce_gym.py trains real
        # gym envs unconditionally).
        from pfrl_tpu.envs import make_gymnasium_env
        from pfrl_tpu.wrappers import CastObservationToFloat32

        def make_env(seed):
            return CastObservationToFloat32(
                make_gymnasium_env(args.env, seed=seed)
            )

        n_actions = make_env(args.seed).action_space.n

    outdir = experiments.prepare_output_dir(args, args.outdir)
    agent = REINFORCE(
        Policy(n_actions=n_actions),
        optax.adam(args.lr),
        gamma=0.99,
        beta=args.beta,
        batchsize=args.batchsize,
        max_episode_len=500,
        baseline=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )
    env = make_env(args.seed)
    eval_env = make_env(args.seed + 10**6)
    if args.load:
        agent.load(args.load)
    if args.demo:
        stats = experiments.eval_performance(
            env=eval_env, agent=agent, n_steps=None, n_episodes=args.eval_n_runs
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    experiments.train_agent_with_evaluation(
        agent=agent,
        env=env,
        eval_env=eval_env,
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=args.eval_n_runs,
        eval_interval=args.eval_interval,
        outdir=outdir,
        train_max_episode_len=500,
    )


if __name__ == "__main__":
    main()
