"""SAC on the Roboschool/PyBullet Atlas walker (reference parity:
examples/atlas/train_soft_actor_critic_atlas.py).

With ``roboschool`` or ``pybullet_envs`` on the host, trains
``RoboschoolAtlasForwardWalk-v1`` with N parallel env processes through the
batch driver. Without them (this container), the same agent + batch-driver
code path runs on in-repo pure-JAX Pendulum lanes.

Recipe (reference :126-240): SAC, gamma 0.98, batch 256, Adam 3e-4 with
eps 1e-1, replay 1e6 with warmup 1e4, temperature learned against target
entropy -dim(A), squashed-Gaussian policy over (256, 256) MLPs.
"""

import argparse

from pfrl_tpu.experiments.demo_cli import add_demo_args
from pfrl_tpu.experiments.env_cli import add_env_backend_args
import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import experiments, spaces
from pfrl_tpu.agents.soft_actor_critic import SoftActorCritic
from pfrl_tpu.models import MLP
from pfrl_tpu.policies import SquashedGaussianHead
from pfrl_tpu.q_functions import FCSAQFunction
from pfrl_tpu.replay import ReplayBuffer


class Policy(nn.Module):
    action_size: int

    @nn.compact
    def __call__(self, x):
        h = MLP(out_size=2 * self.action_size, hidden_sizes=(256, 256))(x)
        return SquashedGaussianHead(action_size=self.action_size)(h)


def burnin(action_size, rng, batch):
    return jax.random.uniform(rng, (batch, action_size), minval=-1.0, maxval=1.0)


def make_env(args, seed, test):
    if args.jax_env:
        from pfrl_tpu.envs import HostJaxEnv, Pendulum, TimeLimit

        return HostJaxEnv(TimeLimit(Pendulum()), seed=int(seed))
    try:
        import gym

        try:
            import roboschool  # noqa: F401  (registers Roboschool envs)
        except ImportError:
            import pybullet_envs  # noqa: F401

        from pfrl_tpu.wrappers import (
            CastObservationToFloat32,
            Monitor,
            NormalizeActionSpace,
        )

        env = gym.make(args.env)
        env.seed(int(seed))
        env = NormalizeActionSpace(CastObservationToFloat32(env))
        if test and args.monitor:
            env = Monitor(env, args.outdir)
        return env
    except ImportError as e:
        raise RuntimeError(
            f"env backend for {args.env!r} unavailable ({e}); pass --jax-env "
            "to train the in-repo simulator explicitly"
        ) from e


def make_batch_env(args, test):
    from pfrl_tpu.envs import MultiprocessVectorEnv, SerialVectorEnv

    seeds = [args.seed * args.num_envs + i + (10_000 if test else 0)
             for i in range(args.num_envs)]
    fns = [functools.partial(make_env, args, s, test) for s in seeds]
    if args.serial_envs:
        return SerialVectorEnv([fn() for fn in fns])
    return MultiprocessVectorEnv(fns)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="RoboschoolAtlasForwardWalk-v1")
    add_env_backend_args(parser)
    parser.add_argument("--num-envs", type=int, default=4)
    parser.add_argument("--serial-envs", action="store_true",
                        help="Run the vector env in-process (debug).")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=10**7)
    parser.add_argument("--eval-n-runs", type=int, default=20)
    parser.add_argument("--eval-interval", type=int, default=100_000)
    parser.add_argument("--update-interval", type=int, default=1)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--replay-start-size", type=int, default=10**4)
    parser.add_argument("--discount", type=float, default=0.98)
    parser.add_argument("--n-step-return", type=int, default=3)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--adam-eps", type=float, default=1e-1)
    parser.add_argument("--monitor", action="store_true")
    parser.add_argument("--outdir", default="results/sac_atlas")
    add_demo_args(parser, save=False)
    args = parser.parse_args()

    sample_env = make_env(args, args.seed, test=False)
    action_size = sample_env.action_space.shape[0]
    sample_env.close()

    agent = SoftActorCritic(
        Policy(action_size=action_size),
        FCSAQFunction(n_hidden_channels=256, n_hidden_layers=2),
        FCSAQFunction(n_hidden_channels=256, n_hidden_layers=2),
        optax.adam(args.lr, eps=args.adam_eps),
        optax.adam(args.lr, eps=args.adam_eps),
        optax.adam(args.lr, eps=args.adam_eps),
        ReplayBuffer(10**6, gamma=args.discount, num_steps=args.n_step_return),
        args.discount,
        action_space=spaces.box(-1.0, 1.0, (action_size,)),
        replay_start_size=args.replay_start_size,
        minibatch_size=args.batch_size,
        update_interval=args.update_interval,
        soft_update_tau=5e-3,
        entropy_target=-float(action_size),
        temperature_optimizer_lr=args.lr,
        burnin_action_func=functools.partial(burnin, action_size),
        burnin_steps=args.replay_start_size,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )
    if args.load:
        agent.load(args.load)
    if args.demo:
        stats = experiments.eval_performance(
            env=make_batch_env(args, test=True), agent=agent, n_steps=None, n_episodes=args.eval_n_runs
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    experiments.train_agent_batch_with_evaluation(
        agent,
        make_batch_env(args, test=False),
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=args.eval_n_runs,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
        eval_env=make_batch_env(args, test=True),
        log_interval=1000,
    )


if __name__ == "__main__":
    main()
