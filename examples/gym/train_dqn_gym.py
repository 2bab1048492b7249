"""General DQN on classic-control tasks, discrete or continuous actions.

Reference parity: examples/gym/train_dqn_gym.py — DQN with an FC
Q-function for discrete action spaces and NAF
(FCQuadraticStateQFunction, Gu et al. 2016) for continuous ones, selected
from the env's action space exactly as the reference does.

    python train_dqn_gym.py --env cartpole   # discrete DQN
    python train_dqn_gym.py --env pendulum   # continuous NAF
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
from pfrl_tpu.agents import DQNCore
from pfrl_tpu.envs import CartPole, MountainCarContinuous, Pendulum, TimeLimit
from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
from pfrl_tpu.q_functions import (
    FCQuadraticStateQFunction,
    FCStateQFunctionWithDiscreteAction,
)

ENVS = {
    "cartpole": lambda: TimeLimit(CartPole(), 500),
    "mountaincar": lambda: TimeLimit(MountainCarContinuous(), 200),
    "pendulum": lambda: TimeLimit(Pendulum(), 200),
}


def make_core(env, args):
    space = env.action_space
    if hasattr(space, "n"):
        # Discrete: FC Q-function + epsilon-greedy (train_dqn_gym.py).
        model = FCStateQFunctionWithDiscreteAction(
            n_actions=space.n,
            n_hidden_channels=args.n_hidden_channels,
            n_hidden_layers=args.n_hidden_layers,
        )
        explorer = explorers.LinearDecayEpsilonGreedy(
            1.0, args.final_epsilon, args.steps // 2, space.n
        )
    else:
        # Continuous: NAF quadratic Q + additive Gaussian noise.
        model = FCQuadraticStateQFunction(
            n_input_channels=env.observation_space.shape[0],
            n_dim_action=space.shape[0],
            n_hidden_channels=args.n_hidden_channels,
            n_hidden_layers=args.n_hidden_layers,
            action_space_low=tuple(map(float, space.low)),
            action_space_high=tuple(map(float, space.high)),
        )
        explorer = explorers.AdditiveGaussian(
            0.3, low=float(space.low[0]), high=float(space.high[0])
        )
    return DQNCore(
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        model=model,
        optimizer=optax.adam(args.lr),
        explorer=explorer,
        gamma=args.gamma,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", choices=sorted(ENVS), default="cartpole")
    parser.add_argument("--steps", type=int, default=200_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--final-epsilon", type=float, default=0.05)
    parser.add_argument("--n-hidden-channels", type=int, default=100)
    parser.add_argument("--n-hidden-layers", type=int, default=2)
    parser.add_argument("--replay-start-size", type=int, default=1024)
    parser.add_argument("--update-per", type=int, default=32,
                        help="env transitions per gradient step")
    parser.add_argument("--target-update-interval", type=int, default=2048)
    parser.add_argument("--minibatch-size", type=int, default=64)
    parser.add_argument("--eval-interval", type=int, default=50_000)
    add_demo_args(parser)
    args = parser.parse_args()

    env = ENVS[args.env]()
    core = make_core(env, args)
    runner = OffPolicyRunner(
        env,
        core,
        replay_buffers.ReplayBuffer(
            10**5, gamma=args.gamma, num_lanes=args.num_envs
        ),
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
        state, metrics = runner.run_chunk(state, chunk)
        t = int(state.t)
        if t >= next_eval:
            next_eval += args.eval_interval
            returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(t))
            print(
                f"step {t:>8} | {t / (time.time() - t0):>10.0f} env-steps/s"
                f" | eval mean R {returns.mean():7.1f}"
                f" | recent train R {runner.recent_return_mean(state):7.1f}"
            )
    print(f"done: {int(state.t)} transitions in {time.time() - t0:.1f}s")
    save_train_state_if_requested(state.train_state, args.save_to)


if __name__ == "__main__":
    main()
