"""PPO MuJoCo reproduction (reference parity:
examples/mujoco/reproduction/ppo/train_ppo.py). Falls back to the in-repo
Pendulum when gym/mujoco are absent; ``--jax-env pendulum`` forces the
fully on-device runner at device speed.
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
import optax

import jax.numpy as jnp

from pfrl_tpu import experiments
from pfrl_tpu.agents.ppo import PPO, PPOCore
from pfrl_tpu.policies import GaussianHeadWithStateIndependentCovariance


class PiV(nn.Module):
    """Independent pi/V towers (reference: Branched(policy, vf),
    train_ppo.py:80-110)."""

    action_size: int

    @nn.compact
    def __call__(self, x):
        hp = nn.tanh(nn.Dense(64)(x))
        hp = nn.tanh(nn.Dense(64)(hp))
        mean = nn.Dense(
            self.action_size,
            kernel_init=nn.initializers.variance_scaling(1e-4, "fan_in", "normal"),
        )(hp)
        dist = GaussianHeadWithStateIndependentCovariance(
            action_size=self.action_size
        )(mean)
        hv = nn.tanh(nn.Dense(64)(x))
        hv = nn.tanh(nn.Dense(64)(hv))
        return dist, nn.Dense(1)(hv)


def make_env(args, seed):
    """Real gymnasium env by default (hard-fail if unavailable); the pure-JAX
    backend only on explicit --jax-env (reference env factory:
    examples/mujoco/reproduction/soft_actor_critic/train_soft_actor_critic.py:66-79)."""
    from pfrl_tpu.experiments.env_cli import make_backend_env

    def jax_pendulum(s):
        from pfrl_tpu.envs import HostJaxEnv, Pendulum, TimeLimit

        return HostJaxEnv(TimeLimit(Pendulum()), seed=s)

    return make_backend_env(args, seed, jax_pendulum)


def run_device(args):
    """Fully on-device PPO on the pure-JAX Pendulum."""
    from pfrl_tpu.envs import Pendulum, TimeLimit
    from pfrl_tpu.experiments import OnPolicyRunner

    core = PPOCore(
        model=PiV(action_size=1),
        optimizer=optax.adam(3e-4),
        gamma=0.99,
        lambd=0.95,
        epochs=10,
        minibatch_size=64,
        clip_eps=0.2,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    runner = OnPolicyRunner(
        TimeLimit(Pendulum()), core, num_envs=args.num_envs, rollout_len=128
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    from pfrl_tpu.experiments import JaxEvalLoop

    evaluator = JaxEvalLoop(
        TimeLimit(Pendulum()), core, num_episodes=10, max_steps=200
    )
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    import time

    t0 = time.time()
    iters_per_print = 10
    while int(state.t) < args.steps:
        state, aux = runner.run_iterations(state, iters_per_print)
        t = int(state.t)
        print(
            f"step {t:>9d} | {t/(time.time()-t0):>8.0f} steps/s | "
            f"recent R {runner.recent_return_mean(state):8.1f}",
            flush=True,
        )
    save_train_state_if_requested(state.train_state, args.save_to)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="Hopper-v5")
    parser.add_argument("--jax-env", choices=["pendulum"], default=None,
                        help="run fully on device against a pure-JAX env")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=2 * 10**6)
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--eval-interval", type=int, default=100_000)
    parser.add_argument("--outdir", default="results/ppo")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser)
    args = parser.parse_args()

    if args.jax_env:
        run_device(args)
        return

    env = make_env(args, args.seed)
    eval_env = make_env(args, args.seed + 100)
    action_size = env.action_space.shape[0]
    # Reference hyperparameters (train_ppo.py:115-135).
    agent = PPO(
        PiV(action_size=action_size),
        optax.adam(3e-4),
        gamma=0.995,
        lambd=0.97,
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
