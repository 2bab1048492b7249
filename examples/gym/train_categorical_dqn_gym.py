"""Categorical DQN (C51) on classic-control tasks.

Reference parity: examples/gym/train_categorical_dqn_gym.py — C51 with a
distributional FC Q-function (51 atoms) on a gym task; v_min/v_max bound
the return support. ``--env cartpole`` runs fully on device; any other
value is a real gymnasium env id trained through the host shell
(hard-fails if unavailable), with ``--v-min``/``--v-max`` bounding the
support.

    python train_categorical_dqn_gym.py --env cartpole
    python train_categorical_dqn_gym.py --env CartPole-v1  # real env
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)
import time

import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import explorers, replay_buffers
from pfrl_tpu.agents import CategoricalDQNCore
from pfrl_tpu.envs import CartPole, TimeLimit
from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
from pfrl_tpu.q_functions import DistributionalFCStateQFunctionWithDiscreteAction

ENVS = {
    "cartpole": (lambda: TimeLimit(CartPole(), 500), 0.0, 500.0),
}


def run_gymnasium(args):
    """Host-shell C51 on a real gymnasium env (the reference script trains
    real gym envs unconditionally)."""
    from pfrl_tpu import experiments
    from pfrl_tpu.agents.categorical_dqn import CategoricalDQN
    from pfrl_tpu.envs import make_gymnasium_env
    from pfrl_tpu.wrappers import CastObservationToFloat32

    def make_env(seed):
        return CastObservationToFloat32(make_gymnasium_env(args.env, seed=seed))

    env = make_env(args.seed)
    n_actions = env.action_space.n
    agent = CategoricalDQN(
        q_function=DistributionalFCStateQFunctionWithDiscreteAction(
            n_actions=n_actions,
            n_atoms=args.n_atoms,
            v_min=args.v_min,
            v_max=args.v_max,
            n_hidden_channels=100,
            n_hidden_layers=2,
        ),
        optimizer=optax.adam(args.lr),
        replay_buffer=replay_buffers.ReplayBuffer(10**5, gamma=0.99),
        gamma=0.99,
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, 0.05, args.steps // 2, n_actions
        ),
        replay_start_size=args.replay_start_size,
        minibatch_size=args.minibatch_size,
        update_interval=1,
        target_update_interval=args.target_update_interval,
        seed=args.seed,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    if args.load:
        agent.load(args.load)
    if args.demo:
        stats = experiments.eval_performance(
            env=make_env(args.seed + 100), agent=agent, n_steps=None,
            n_episodes=10,
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
        eval_env=make_env(args.seed + 100),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--env", default="cartpole",
        help="'cartpole' for the fully on-device runner, or any real "
        "gymnasium env id with a discrete action space",
    )
    parser.add_argument("--steps", type=int, default=200_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--n-atoms", type=int, default=51)
    parser.add_argument("--v-min", type=float, default=0.0,
                        help="return-support lower bound (gymnasium backend)")
    parser.add_argument("--v-max", type=float, default=500.0,
                        help="return-support upper bound (gymnasium backend)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--replay-start-size", type=int, default=1024)
    parser.add_argument("--update-per", type=int, default=32)
    parser.add_argument("--target-update-interval", type=int, default=2048)
    parser.add_argument("--minibatch-size", type=int, default=64)
    parser.add_argument("--eval-interval", type=int, default=50_000)
    parser.add_argument("--outdir", default="results/c51_gym")
    add_demo_args(parser)
    args = parser.parse_args()

    if args.env not in ENVS:
        run_gymnasium(args)
        return

    make_env, v_min, v_max = ENVS[args.env]
    env = make_env()
    n_actions = env.action_space.n
    core = CategoricalDQNCore(
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        model=DistributionalFCStateQFunctionWithDiscreteAction(
            n_actions=n_actions,
            n_atoms=args.n_atoms,
            v_min=v_min,
            v_max=v_max,
            n_hidden_channels=100,
            n_hidden_layers=2,
        ),
        optimizer=optax.adam(args.lr),
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, 0.05, args.steps // 2, n_actions
        ),
        gamma=0.99,
    )
    runner = OffPolicyRunner(
        env,
        core,
        replay_buffers.ReplayBuffer(10**5, gamma=0.99, num_lanes=args.num_envs),
        RunnerConfig(
            num_envs=args.num_envs,
            replay_start_size=args.replay_start_size,
            update_interval=args.update_per,
            target_update_interval=args.target_update_interval,
            minibatch_size=args.minibatch_size,
        ),
    )
    evaluator = JaxEvalLoop(env, core, num_episodes=10, max_steps=500)
    state = runner.init(jax.random.PRNGKey(args.seed))
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    chunk = max(1, args.eval_interval // args.num_envs)
    t0, next_eval = time.time(), args.eval_interval
    while int(state.t) < args.steps:
        state, _ = runner.run_chunk(state, chunk)
        t = int(state.t)
        if t >= next_eval:
            next_eval += args.eval_interval
            returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(t))
            print(
                f"step {t:>8} | {t / (time.time() - t0):>10.0f} env-steps/s"
                f" | eval mean R {returns.mean():7.1f}"
            )
    print(f"done: {int(state.t)} transitions in {time.time() - t0:.1f}s")
    save_train_state_if_requested(state.train_state, args.save_to)


if __name__ == "__main__":
    main()
