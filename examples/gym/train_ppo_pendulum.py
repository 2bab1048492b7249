"""Train PPO on Pendulum-v1 via the reference-style host batch driver.

Counterpart of the reference's examples/mujoco/reproduction/ppo/train_ppo.py
wired to the in-repo pure-JAX Pendulum. Exercises the pfrl-protocol path:
PPO shell agent + SerialVectorEnv + train_agent_batch_with_evaluation.

Usage: python examples/gym/train_ppo_pendulum.py --steps 100000
       python examples/gym/train_ppo_pendulum.py --env Pendulum-v1  # real env
"""

import argparse

from pfrl_tpu.experiments.demo_cli import add_demo_args

import flax.linen as nn
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.ppo import PPO
from pfrl_tpu.envs import HostJaxEnv, Pendulum, SerialVectorEnv, TimeLimit
from pfrl_tpu.experiments import (
    eval_performance,
    train_agent_batch_with_evaluation,
)
from pfrl_tpu.policies import GaussianHeadWithStateIndependentCovariance


class PiV(nn.Module):
    """Independent pi/V towers — matching the reference reproduction's
    Branched(policy, vf) (no shared torso: the value loss's scale would
    swamp the policy gradient through shared layers)."""

    action_size: int = 1

    @nn.compact
    def __call__(self, x):
        hp = nn.tanh(nn.Dense(64)(x))
        hp = nn.tanh(nn.Dense(64)(hp))
        mean = nn.Dense(
            self.action_size, kernel_init=nn.initializers.variance_scaling(
                1e-4, "fan_in", "normal")
        )(hp)
        dist = GaussianHeadWithStateIndependentCovariance(
            action_size=self.action_size
        )(mean)
        hv = nn.tanh(nn.Dense(64)(x))
        hv = nn.tanh(nn.Dense(64)(hv))
        value = nn.Dense(1)(hv)
        return dist, value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--env", default="pendulum",
        help="'pendulum' for the in-repo device sim stepped on the host, "
        "or any real gymnasium env id with a 1-D continuous action space "
        "(hard-fails if unavailable)",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=100_000)
    parser.add_argument("--num-envs", type=int, default=8)
    parser.add_argument("--eval-interval", type=int, default=20_000)
    parser.add_argument("--outdir", type=str, default="results/ppo_pendulum")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser, save=False)
    args = parser.parse_args()

    if args.env == "pendulum":
        def make_one(seed):
            return HostJaxEnv(TimeLimit(Pendulum()), seed=seed)

        action_size = 1
    else:
        # Real gymnasium env (the reference reproduction builds real gym
        # envs unconditionally).
        from pfrl_tpu.envs import make_gymnasium_env
        from pfrl_tpu.wrappers import CastObservationToFloat32, NormalizeActionSpace

        def make_one(seed):
            return NormalizeActionSpace(
                CastObservationToFloat32(make_gymnasium_env(args.env, seed=seed))
            )

        action_size = make_one(args.seed).action_space.shape[0]

    def make_vec(seed0):
        return SerialVectorEnv(
            [make_one(seed0 + i) for i in range(args.num_envs)]
        )

    agent = PPO(
        PiV(action_size=action_size),
        optax.adam(3e-4),
        gamma=0.99,
        lambd=0.95,
        update_interval=2048,
        minibatch_size=64,
        epochs=10,
        clip_eps=0.2,
        entropy_coef=0.0,
        standardize_advantages=True,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )
    if args.load:
        agent.load(args.load)
    if args.demo:
        stats = eval_performance(
            env=make_vec(args.seed * 100 + 50), agent=agent, n_steps=None, n_episodes=10
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    agent, history = train_agent_batch_with_evaluation(
        agent,
        make_vec(args.seed * 100),
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=10,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
        eval_env=make_vec(args.seed * 100 + 50),
        log_interval=10_000,
    )
    print("eval history:", [(h["step"], round(h["eval_score"], 1)) for h in history])


if __name__ == "__main__":
    main()
