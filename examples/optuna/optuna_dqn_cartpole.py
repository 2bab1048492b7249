"""Hyperparameter search with Optuna over DQN on CartPole.

Reference parity: examples/optuna/optuna_dqn_obs1d.py — an Optuna study
over DQN hyperparameters with median pruning via OptunaPrunerHook
(pfrl/experiments/evaluation_hooks.py:53). The search space mirrors the
reference's (lr, hidden sizes, update cadence, epsilon schedule).

Requires ``optuna`` (optional dependency; the container may not ship it).

    python optuna_dqn_cartpole.py --n-trials 30
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)

import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import explorers, replay_buffers
from pfrl_tpu.agents import DQNCore
from pfrl_tpu.envs import CartPole, TimeLimit
from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction


def objective(trial, args):
    lr = trial.suggest_float("lr", 1e-4, 1e-2, log=True)
    hidden = trial.suggest_categorical("n_hidden_channels", [32, 64, 128])
    layers = trial.suggest_int("n_hidden_layers", 1, 3)
    update_per = trial.suggest_categorical("update_per", [8, 16, 32, 64])
    final_eps = trial.suggest_float("final_epsilon", 0.01, 0.2)
    gamma = trial.suggest_float("gamma", 0.9, 0.999)

    env = TimeLimit(CartPole(), 500)
    num_envs = 32
    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=hidden, n_hidden_layers=layers
        ),
        optimizer=optax.adam(lr),
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, final_eps, args.steps // 2, 2
        ),
        gamma=gamma,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    runner = OffPolicyRunner(
        env,
        core,
        replay_buffers.ReplayBuffer(10**5, gamma=gamma, num_lanes=num_envs),
        RunnerConfig(
            num_envs=num_envs,
            replay_start_size=1024,
            update_interval=update_per,
            target_update_interval=2048,
            minibatch_size=64,
        ),
    )
    evaluator = JaxEvalLoop(env, core, num_episodes=10, max_steps=500)
    state = runner.init(jax.random.PRNGKey(trial.number))
    n_reports = 5
    for i in range(n_reports):
        state, _ = runner.run_chunk(state, args.steps // n_reports // num_envs)
        score = float(
            evaluator.evaluate(state.train_state, jax.random.PRNGKey(i)).mean()
        )
        # Median pruning (the hook form of this lives in
        # pfrl_tpu.experiments.OptunaPrunerHook for the host drivers).
        trial.report(score, int(state.t))
        if trial.should_prune():
            import optuna

            raise optuna.TrialPruned()
    return score


def main():
    try:
        import optuna
    except ImportError:
        raise SystemExit("this example requires `pip install optuna`")

    parser = argparse.ArgumentParser()
    parser.add_argument("--n-trials", type=int, default=30)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=60_000)
    add_demo_args(parser)
    args = parser.parse_args()

    if args.demo or args.load:
        # Demo/reload path: evaluate a saved train_state with the DEFAULT
        # architecture (hidden 64 x 2 layers) — the checkpoint must match.
        env = TimeLimit(CartPole(), 500)
        core = DQNCore(
            model=FCStateQFunctionWithDiscreteAction(
                n_actions=2, n_hidden_channels=64, n_hidden_layers=2
            ),
            optimizer=optax.adam(1e-3),
            explorer=explorers.ConstantEpsilonGreedy(0.0, 2),
            gamma=0.99,
            compute_dtype=jnp.bfloat16 if args.bf16 else None,
        )
        runner = OffPolicyRunner(
            env,
            core,
            replay_buffers.ReplayBuffer(10**4, gamma=0.99, num_lanes=32),
            RunnerConfig(
                num_envs=32,
                replay_start_size=1024,
                update_interval=32,
                target_update_interval=2048,
                minibatch_size=64,
            ),
        )
        state = runner.init(jax.random.PRNGKey(0))
        state = maybe_load_train_state(state, args.load)
        evaluator = JaxEvalLoop(env, core, num_episodes=10, max_steps=500)
        if run_demo_if_requested(args, evaluator, state.train_state):
            return

    study = optuna.create_study(
        direction="maximize",
        pruner=optuna.pruners.MedianPruner(n_warmup_steps=2),
    )
    study.optimize(lambda t: objective(t, args), n_trials=args.n_trials)
    print("best value:", study.best_value)
    print("best params:", study.best_params)


if __name__ == "__main__":
    main()
