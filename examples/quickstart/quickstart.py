"""Quickstart: train DQN on CartPole in ~30 lines.

Reference parity: examples/quickstart/quickstart.ipynb (the pfrl intro
notebook), re-expressed as a script over the TPU-native API. Two styles are
shown — the fused on-device runner (the fast path: env + agent compiled
into one XLA program) and the reference-style object protocol
(``agent.act`` / ``agent.observe``), which works with any host env.

Run:
    python quickstart.py              # on-device fast path
    python quickstart.py --hostloop   # reference-protocol host loop
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
from pfrl_tpu.agents import DQN, DQNCore
from pfrl_tpu.envs import CartPole, HostJaxEnv, TimeLimit
from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction


def q_function():
    # 1. A Q-function is a flax module returning an ActionValue.
    return FCStateQFunctionWithDiscreteAction(
        n_actions=2, n_hidden_channels=64, n_hidden_layers=2
    )


def run_device(steps: int, seed: int, args=None):
    # 2. The algorithm is a pure functional core...
    core = DQNCore(
        model=q_function(),
        optimizer=optax.adam(1e-3),
        explorer=explorers.LinearDecayEpsilonGreedy(1.0, 0.05, steps // 2, 2),
        gamma=0.99,
        compute_dtype=jnp.bfloat16 if args is not None and args.bf16 else None,
    )
    # 3. ...driven entirely on device by the runner: act, env step, replay
    # insert, and gradient update are ONE compiled program.
    num_envs = 32
    runner = OffPolicyRunner(
        TimeLimit(CartPole(), 500),
        core,
        replay_buffers.ReplayBuffer(10**5, gamma=0.99, num_lanes=num_envs),
        RunnerConfig(
            num_envs=num_envs,
            replay_start_size=1024,
            update_interval=32,
            target_update_interval=2048,
            minibatch_size=64,
        ),
    )
    state = runner.init(jax.random.PRNGKey(seed))
    evaluator = JaxEvalLoop(
        TimeLimit(CartPole(), 500), core, num_episodes=10, max_steps=500
    )
    if args is not None:
        state = maybe_load_train_state(state, args.load)
        if run_demo_if_requested(args, evaluator, state.train_state, seed=seed):
            return
    while int(state.t) < steps:
        state, _ = runner.run_chunk(state, 200)
        print(f"t={int(state.t):>7}  recent return {runner.recent_return_mean(state):6.1f}")
    returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(1))
    print("final eval returns:", returns)
    if args is not None:
        save_train_state_if_requested(state.train_state, args.save_to)


def run_hostloop(steps: int, seed: int, args=None):
    # The same agent behind the reference's act/observe object protocol —
    # plug in any host env (gym-style) here.
    env = HostJaxEnv(TimeLimit(CartPole(), 500), seed=seed)
    agent = DQN(
        q_function=q_function(),
        optimizer=optax.adam(1e-3),
        replay_buffer=replay_buffers.ReplayBuffer(10**4),
        gamma=0.99,
        explorer=explorers.ConstantEpsilonGreedy(0.1, 2),
        replay_start_size=500,
        update_interval=1,
        target_update_interval=100,
        compute_dtype=jnp.bfloat16 if args is not None and args.bf16 else None,
        seed=seed,
    )
    if args is not None and args.load:
        agent.load(args.load)
    if args is not None and args.demo:
        from pfrl_tpu.experiments import eval_performance

        stats = eval_performance(
            env=HostJaxEnv(TimeLimit(CartPole(), 500), seed=seed + 10**6),
            agent=agent,
            n_steps=None,
            n_episodes=10,
        )
        print(f"n_episodes: {stats['episodes']} mean: {stats['mean']}")
        return
    obs = env.reset()
    episode_return, t = 0.0, 0
    while t < steps:
        action = agent.act(obs)
        obs, reward, done, info = env.step(action)
        episode_return += reward
        t += 1
        reset = info.get("needs_reset", False)
        agent.observe(obs, reward, done, reset)
        if done or reset:
            print(f"t={t:>6}  R={episode_return:6.1f}")
            episode_return = 0.0
            obs = env.reset()
    print("statistics:", agent.get_statistics())


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--hostloop", action="store_true")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_demo_args(parser)
    args = parser.parse_args()
    if args.hostloop:
        run_hostloop(args.steps, args.seed, args=args)
    else:
        run_device(args.steps, args.seed, args=args)
