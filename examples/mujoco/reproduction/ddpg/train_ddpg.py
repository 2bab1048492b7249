"""DDPG MuJoCo reproduction (reference parity:
examples/mujoco/reproduction/ddpg/train_ddpg.py). Pendulum fallback when
gym/mujoco are absent."""

import argparse

from pfrl_tpu.experiments.demo_cli import add_demo_args
from pfrl_tpu.experiments.env_cli import add_env_backend_args
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import experiments, explorers, spaces
from pfrl_tpu.agents.ddpg import DDPG
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import DeterministicHead
from pfrl_tpu.q_functions import FCSAQFunction
from pfrl_tpu.replay import ReplayBuffer


class Policy(nn.Module):
    action_size: int

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=self.action_size, hidden_sizes=(400, 300))(x)
        return DeterministicHead()(jnp.tanh(h))


def burnin(action_size, rng, batch):
    return jax.random.uniform(rng, (batch, action_size), minval=-1.0, maxval=1.0)


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
    parser.add_argument("--env", default="HalfCheetah-v5")
    add_env_backend_args(parser)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=10**6)
    parser.add_argument("--eval-interval", type=int, default=5000)
    parser.add_argument("--eval-n-envs", type=int, default=1,
                        help="evaluate over this many parallel envs "
                        "(>1 batches eval acts into vector dispatches)")
    parser.add_argument("--num-envs", type=int, default=1,
                        help="parallel train envs; 1 = reference-exact "
                        "serial protocol, >1 = batched collection with the "
                        "1-update-per-env-step ratio preserved")
    parser.add_argument("--update-burst", action="store_true",
                        help="run the updates due at each step as one "
                        "jitted scan dispatch (TPU dispatch amortization)")
    parser.add_argument("--replay-start-size", type=int, default=10_000)
    parser.add_argument("--checkpoint-freq", type=int, default=None,
                        help="save a checkpoint every N steps")
    parser.add_argument("--outdir", default="results/ddpg")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser, save=False)
    args = parser.parse_args()

    from pfrl_tpu.envs import SerialVectorEnv

    if args.num_envs > 1:
        env = SerialVectorEnv(
            [make_env(args, args.seed * args.num_envs + i)
             for i in range(args.num_envs)]
        )
    else:
        env = make_env(args, args.seed)
    if args.eval_n_envs > 1:
        eval_env = SerialVectorEnv(
            [make_env(args, args.seed + 100 + i)
             for i in range(args.eval_n_envs)]
        )
    else:
        eval_env = make_env(args, args.seed + 100)
    action_size = env.action_space.shape[0]

    # Reference hyperparameters (train_ddpg.py:70-120).
    agent = DDPG(
        Policy(action_size=action_size),
        FCSAQFunction(n_hidden_channels=400, n_hidden_layers=2),
        optax.adam(1e-3),
        optax.adam(1e-3),
        ReplayBuffer(10**6, gamma=0.99),
        0.99,
        explorers.AdditiveGaussian(0.1, low=-1.0, high=1.0),
        action_space=spaces.box(-1.0, 1.0, (action_size,)),
        replay_start_size=args.replay_start_size,
        minibatch_size=100,
        target_update_method="soft",
        soft_update_tau=5e-3,
        burnin_action_func=functools.partial(burnin, action_size),
        burnin_steps=args.replay_start_size,
        update_burst=args.update_burst,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
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
    driver = (
        experiments.train_agent_batch_with_evaluation
        if args.num_envs > 1
        else experiments.train_agent_with_evaluation
    )
    driver(
        agent,
        env,
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=10,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
        eval_env=eval_env,
        checkpoint_freq=args.checkpoint_freq,
    )


if __name__ == "__main__":
    main()
