"""Train DQN on CartPole-v1 — the pfrl_tpu "hello world".

Counterpart of the reference's examples/gym/train_dqn_gym.py:17-79, but
TPU-native: the env is a pure-JAX CartPole vectorized on device, and the
whole act/step/replay/update loop runs as one jitted scan
(pfrl_tpu.experiments.OffPolicyRunner). Prints eval scores and throughput.

Usage:
    python examples/gym/train_dqn_cartpole.py --steps 200000 --num-envs 128
"""

import argparse
import time

import jax
import optax

from pfrl_tpu.agents import DQNCore
from pfrl_tpu.envs import CartPole, TimeLimit
from pfrl_tpu.experiments import (
    JaxEvalLoop,
    OffPolicyRunner,
    RunnerConfig,
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)
from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
from pfrl_tpu.replay import ReplayBuffer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=200_000,
                        help="total env transitions")
    parser.add_argument("--num-envs", type=int, default=128)
    parser.add_argument("--eval-interval", type=int, default=50_000)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--replay-capacity", type=int, default=100_000)
    parser.add_argument("--replay-start-size", type=int, default=1_000)
    parser.add_argument("--minibatch-size", type=int, default=128)
    parser.add_argument("--update-per", type=int, default=32,
                        help="one gradient step per this many env transitions")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser)
    args = parser.parse_args()

    env = TimeLimit(CartPole())
    n_actions = env.action_space.n

    import jax.numpy as jnp

    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=n_actions, n_hidden_channels=128, n_hidden_layers=2
        ),
        optimizer=optax.adam(args.lr),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.05, args.steps // 2, n_actions),
        gamma=args.gamma,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    cfg = RunnerConfig(
        num_envs=args.num_envs,
        replay_start_size=args.replay_start_size,
        update_interval=args.update_per,
        target_update_interval=2_000,
        minibatch_size=args.minibatch_size,
    )
    buffer = ReplayBuffer(
        args.replay_capacity, gamma=args.gamma, num_lanes=args.num_envs
    )
    runner = OffPolicyRunner(env, core, buffer, cfg)
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(env, core, num_episodes=16, max_steps=500)
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return

    # One scan chunk per eval interval, capped at --steps (a request below
    # the eval interval runs one right-sized chunk instead of a full one).
    steps_per_chunk = max(1, min(args.eval_interval, args.steps) // args.num_envs)
    total_chunks = max(1, args.steps // (steps_per_chunk * args.num_envs))
    t0 = time.time()
    for chunk in range(total_chunks):
        state, metrics = runner.run_chunk(state, steps_per_chunk)
        jax.block_until_ready(metrics["loss"])
        t = int(state.t)
        returns = evaluator.evaluate(
            state.train_state, jax.random.PRNGKey(args.seed + 1 + chunk)
        )
        elapsed = time.time() - t0
        print(
            f"step {t:>8d} | {t/elapsed:>10.0f} env-steps/s | "
            f"eval mean R {returns.mean():7.1f} | "
            f"recent train R {runner.recent_return_mean(state):7.1f} | "
            f"loss {float(metrics['loss'][-1]):.4f}"
        )
    print(f"done: {int(state.t)} transitions in {time.time()-t0:.1f}s")
    save_train_state_if_requested(state.train_state, args.save_to)


if __name__ == "__main__":
    main()
