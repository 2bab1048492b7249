"""TRPO MuJoCo reproduction (reference parity:
examples/mujoco/reproduction/trpo/train_trpo.py). Pendulum fallback when
gym/mujoco are absent."""

import argparse

from pfrl_tpu.experiments.demo_cli import add_demo_args
from pfrl_tpu.experiments.env_cli import add_env_backend_args

import flax.linen as nn
import optax

from pfrl_tpu import experiments
from pfrl_tpu.agents.trpo import TRPO
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import GaussianHeadWithStateIndependentCovariance


class Policy(nn.Module):
    action_size: int

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(64)(x))
        h = nn.tanh(nn.Dense(64)(h))
        mean = nn.Dense(
            self.action_size,
            kernel_init=nn.initializers.variance_scaling(1e-2, "fan_in", "normal"),
        )(h)
        return GaussianHeadWithStateIndependentCovariance(
            action_size=self.action_size
        )(mean)


def make_env(args, seed):
    """Real gymnasium env by default (hard-fail if unavailable); the pure-JAX
    Pendulum simulator only on explicit --jax-env (reference env factory:
    examples/mujoco/reproduction/soft_actor_critic/train_soft_actor_critic.py:66-79)."""
    from pfrl_tpu.experiments.env_cli import make_backend_env

    def jax_pendulum(s):
        from pfrl_tpu.envs import HostJaxEnv, Pendulum, TimeLimit

        return HostJaxEnv(TimeLimit(Pendulum()), seed=s)

    return make_backend_env(args, seed, jax_pendulum)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="Hopper-v5")
    add_env_backend_args(parser)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="unsupported for TRPO: the CG/FVP/line-search "
                        "second-order math is fp32 by design "
                        "(pfrl_tpu/agents/trpo.py docstring)")
    parser.add_argument("--steps", type=int, default=2 * 10**6)
    parser.add_argument("--eval-interval", type=int, default=100_000)
    parser.add_argument("--outdir", default="results/trpo")
    add_demo_args(parser, save=False)
    args = parser.parse_args()
    if args.bf16:
        parser.error(
            "TRPO is fp32 by design: Fisher-vector products and the KL "
            "line search are numerically delicate second-order quantities "
            "(see pfrl_tpu/agents/trpo.py). Remove --bf16."
        )

    env = make_env(args, args.seed)
    eval_env = make_env(args, args.seed + 100)
    action_size = env.action_space.shape[0]

    # Reference hyperparameters (train_trpo.py:90-120).
    agent = TRPO(
        Policy(action_size=action_size),
        MLP(out_size=1, hidden_sizes=(64, 64)),
        optax.adam(1e-3),
        gamma=0.995,
        lambd=0.97,
        update_interval=5000,
        max_kl=0.01,
        conjugate_gradient_max_iter=20,
        conjugate_gradient_damping=1e-1,
        vf_epochs=5,
        entropy_coef=0.0,
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
        eval_n_steps=None,
        eval_n_episodes=10,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
        eval_env=eval_env,
    )


if __name__ == "__main__":
    main()
