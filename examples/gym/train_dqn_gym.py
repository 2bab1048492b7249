"""General DQN on classic-control tasks, discrete or continuous actions.

Reference parity: examples/gym/train_dqn_gym.py — DQN with an FC
Q-function for discrete action spaces and NAF
(FCQuadraticStateQFunction, Gu et al. 2016) for continuous ones, selected
from the env's action space exactly as the reference does
(reference train_dqn_gym.py:45 takes any real gym env id; :95-130 switches
DQN/NAF on the action space).

Two backends, mirroring the mujoco reproduction scripts:

* ``--env <name>`` where name is one of the in-repo simulators
  (``cartpole``/``mountaincar``/``pendulum``) runs fully on device through
  ``OffPolicyRunner`` at device speed.
* ``--env <gymnasium-id>`` (anything else, e.g. ``LunarLander-v3``) trains
  the host-shell agent on the real environment; an unavailable id is a
  hard error, never a silent fallback.

    python train_dqn_gym.py --env cartpole         # on-device discrete DQN
    python train_dqn_gym.py --env pendulum         # on-device continuous NAF
    python train_dqn_gym.py --env LunarLander-v3   # real gymnasium env
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


def run_gymnasium(args):
    """Host-shell DQN/DoubleDQN on a real gymnasium env (reference
    train_dqn_gym.py trains real gym envs unconditionally)."""
    from pfrl_tpu import experiments
    from pfrl_tpu.agents import DQN, DoubleDQNCore
    from pfrl_tpu.envs import SerialVectorEnv, make_gymnasium_env
    from pfrl_tpu.wrappers import CastObservationToFloat32, NormalizeActionSpace

    def make_env(seed):
        env = CastObservationToFloat32(make_gymnasium_env(args.env, seed=seed))
        if not hasattr(env.action_space, "n"):
            env = NormalizeActionSpace(env)
        return env

    probe = make_env(args.seed)
    core = make_core(probe, args)
    decay = args.eps_decay_steps or args.steps // 2
    if hasattr(probe.action_space, "n"):
        explorer = explorers.LinearDecayEpsilonGreedy(
            1.0, args.final_epsilon, decay, probe.action_space.n
        )
    else:
        explorer = core.explorer
    agent = DQN(
        q_function=core.model,
        optimizer=optax.adam(args.lr),
        replay_buffer=replay_buffers.ReplayBuffer(
            args.buffer_size, gamma=args.gamma, num_lanes=max(1, args.num_envs)
        ),
        gamma=args.gamma,
        explorer=explorer,
        replay_start_size=args.replay_start_size,
        minibatch_size=args.minibatch_size,
        update_interval=args.update_interval,
        target_update_interval=args.target_update_interval,
        seed=args.seed,
        core_cls=DoubleDQNCore if args.double else DQNCore,
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
    if args.num_envs > 1:
        env = SerialVectorEnv(
            [make_env(args.seed * args.num_envs + i)
             for i in range(args.num_envs)]
        )
        eval_env = SerialVectorEnv(
            [make_env(args.seed + 100 + i) for i in range(10)]
        )
        experiments.train_agent_batch_with_evaluation(
            agent,
            env,
            steps=args.steps,
            eval_n_steps=None,
            eval_n_episodes=10,
            eval_interval=args.eval_interval,
            outdir=args.outdir,
            eval_env=eval_env,
        )
    else:
        experiments.train_agent_with_evaluation(
            agent,
            probe,
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
        help="an in-repo simulator name (%s) for the fully on-device "
        "runner, or any real gymnasium env id (e.g. LunarLander-v3)"
        % "/".join(sorted(ENVS)),
    )
    parser.add_argument("--steps", type=int, default=200_000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--final-epsilon", type=float, default=0.05)
    parser.add_argument("--eps-decay-steps", type=int, default=None,
                        help="epsilon decay horizon (default: steps/2)")
    parser.add_argument("--n-hidden-channels", type=int, default=100)
    parser.add_argument("--n-hidden-layers", type=int, default=2)
    parser.add_argument("--replay-start-size", type=int, default=1024)
    parser.add_argument("--buffer-size", type=int, default=10**5)
    parser.add_argument("--double", action="store_true",
                        help="Double DQN target (gymnasium backend)")
    parser.add_argument("--update-per", type=int, default=32,
                        help="env transitions per gradient step "
                        "(on-device backend)")
    parser.add_argument("--update-interval", type=int, default=1,
                        help="env transitions per gradient step "
                        "(gymnasium backend; reference default 1)")
    parser.add_argument("--target-update-interval", type=int, default=2048)
    parser.add_argument("--minibatch-size", type=int, default=64)
    parser.add_argument("--eval-interval", type=int, default=50_000)
    parser.add_argument("--outdir", default="results/dqn_gym")
    add_demo_args(parser)
    args = parser.parse_args()

    if args.env not in ENVS:
        run_gymnasium(args)
        return

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
