"""Categorical DQN (C51) on classic-control tasks.

Reference parity: examples/gym/train_categorical_dqn_gym.py — C51 with a
distributional FC Q-function (51 atoms) on a gym task; v_min/v_max bound
the return support.

    python train_categorical_dqn_gym.py --env cartpole
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", choices=sorted(ENVS), default="cartpole")
    parser.add_argument("--steps", type=int, default=200_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--n-atoms", type=int, default=51)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--replay-start-size", type=int, default=1024)
    parser.add_argument("--update-per", type=int, default=32)
    parser.add_argument("--target-update-interval", type=int, default=2048)
    parser.add_argument("--minibatch-size", type=int, default=64)
    parser.add_argument("--eval-interval", type=int, default=50_000)
    add_demo_args(parser)
    args = parser.parse_args()

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
