#!/usr/bin/env python
"""Record reference-comparable learning curves on the in-repo device envs.

Trains three reference-anchored workloads end-to-end on the device runners,
writing ``scores.txt`` artifacts in the evaluator's TSV format plus
best-checkpoint zoo entries:

  - dqn_cartpole:  DQN, FC(100,100) Q — CartPole-500; reference solves at
                   mean R 500 (examples/gym/train_dqn_gym.py).
  - sac_pendulum:  SAC (256,256) — Pendulum-200; solved around mean
                   R >= -300 (classic-control convention).
  - ppo_pendulum:  PPO twin (64,64) towers — Pendulum-200.

Artifacts:
  benchmarks/curves/<name>/scores.txt   (steps/episodes/elapsed/mean/...)
  zoo/<algo>/<env>/best/train_state.msgpack   (loadable via
      pfrl_tpu.utils.pretrained_models with PFRL_TPU_MODEL_ZOO=zoo)

Usage: python tools/record_curves.py [name ...]   (default: all three)
"""

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_BASIC_COLUMNS = (
    "steps", "episodes", "elapsed", "mean", "median", "stdev", "max", "min",
)


class ScoreWriter:
    def __init__(self, outdir):
        os.makedirs(outdir, exist_ok=True)
        self.path = os.path.join(outdir, "scores.txt")
        with open(self.path, "w") as f:
            f.write("\t".join(_BASIC_COLUMNS) + "\n")
        self.t0 = time.time()

    def record(self, steps, episodes, returns):
        rs = [float(r) for r in returns]
        stdev = statistics.stdev(rs) if len(rs) > 1 else 0.0
        row = (
            steps, episodes, time.time() - self.t0,
            statistics.mean(rs), statistics.median(rs), stdev, max(rs), min(rs),
        )
        with open(self.path, "a") as f:
            f.write("\t".join(str(v) for v in row) + "\n")
        return statistics.mean(rs)


def save_zoo(train_state, alg, env_name):
    from pfrl_tpu.replay.persistent import save_state

    d = os.path.join(REPO, "zoo", alg, env_name, "best")
    os.makedirs(d, exist_ok=True)
    save_state(train_state, os.path.join(d, "train_state.msgpack"))
    return d


def run_dqn_cartpole():
    import jax
    import optax

    from pfrl_tpu import explorers
    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import CartPole, TimeLimit
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
    from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
    from pfrl_tpu.replay import ReplayBuffer

    steps, num_envs, eval_every = 200_000, 32, 10_000
    env = TimeLimit(CartPole(), 500)
    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=100, n_hidden_layers=2
        ),
        optimizer=optax.adam(1e-3),
        explorer=explorers.LinearDecayEpsilonGreedy(1.0, 0.05, steps // 4, 2),
        gamma=0.99,
    )
    # Dense update schedule: 8 gradient steps per 32-lane vector step
    # (replay ratio 2 at batch 64) — the sparse 1-update/32-transitions
    # schedule plateaued near R=130.
    runner = OffPolicyRunner(
        env,
        core,
        ReplayBuffer(10**5, gamma=0.99, num_lanes=num_envs),
        RunnerConfig(
            num_envs=num_envs,
            replay_start_size=1024,
            update_interval=4,
            target_update_interval=1024,
            minibatch_size=64,
        ),
    )
    evaluator = JaxEvalLoop(env, core, num_episodes=10, max_steps=501)
    writer = ScoreWriter(os.path.join(REPO, "benchmarks/curves/dqn_cartpole"))
    state = runner.init(jax.random.PRNGKey(0))
    best, best_state = float("-inf"), None
    chunk = eval_every // num_envs
    while int(state.t) < steps:
        state, _ = runner.run_chunk(state, chunk)
        t = int(state.t)
        returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(t))
        mean = writer.record(t, int(state.recent_count), returns)
        print(f"dqn_cartpole step {t} mean R {mean:.1f}", flush=True)
        if mean > best:
            best, best_state = mean, jax.device_get(state.train_state)
    save_zoo(best_state, "dqn", "cartpole")
    return best


def run_sac_pendulum():
    import flax.linen as nn
    import jax
    import optax

    from pfrl_tpu.agents.soft_actor_critic import SACCore
    from pfrl_tpu.envs import NormalizeActionSpace, Pendulum, TimeLimit
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
    from pfrl_tpu.models import MLP
    from pfrl_tpu.policies import SquashedGaussianHead
    from pfrl_tpu.q_functions import FCSAQFunction
    from pfrl_tpu.replay import ReplayBuffer

    steps, num_envs, eval_every = 100_000, 16, 5_000
    env = NormalizeActionSpace(TimeLimit(Pendulum(), 200))

    class Policy(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = MLP(out_size=2, hidden_sizes=(256, 256))(x)
            return SquashedGaussianHead(action_size=1)(h)

    def burnin(rng, batch):
        return jax.random.uniform(rng, (batch, 1), minval=-1.0, maxval=1.0)

    core = SACCore(
        policy=Policy(),
        q_func1=FCSAQFunction(n_hidden_layers=2, n_hidden_channels=256),
        q_func2=FCSAQFunction(n_hidden_layers=2, n_hidden_channels=256),
        policy_optimizer=optax.adam(3e-4),
        q_func1_optimizer=optax.adam(3e-4),
        q_func2_optimizer=optax.adam(3e-4),
        gamma=0.99,
        entropy_target=-1.0,
        burnin_action_func=burnin,
        burnin_steps=1000,
    )
    runner = OffPolicyRunner(
        env,
        core,
        ReplayBuffer(10**5, gamma=0.99, num_lanes=num_envs),
        RunnerConfig(
            num_envs=num_envs,
            replay_start_size=1000,
            update_interval=4,
            minibatch_size=128,
        ),
    )
    evaluator = JaxEvalLoop(env, core, num_episodes=10, max_steps=201)
    writer = ScoreWriter(os.path.join(REPO, "benchmarks/curves/sac_pendulum"))
    state = runner.init(jax.random.PRNGKey(0))
    best, best_state = float("-inf"), None
    chunk = eval_every // num_envs
    while int(state.t) < steps:
        state, _ = runner.run_chunk(state, chunk)
        t = int(state.t)
        returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(t))
        mean = writer.record(t, int(state.recent_count), returns)
        print(f"sac_pendulum step {t} mean R {mean:.1f}", flush=True)
        if mean > best:
            best, best_state = mean, jax.device_get(state.train_state)
    save_zoo(best_state, "sac", "pendulum")
    return best


def run_ppo_pendulum():
    import flax.linen as nn
    import jax
    import optax

    from pfrl_tpu.agents.ppo import PPOCore
    from pfrl_tpu.envs import Pendulum, TimeLimit
    from pfrl_tpu.experiments import JaxEvalLoop
    from pfrl_tpu.experiments.onpolicy_runner import OnPolicyRunner
    from pfrl_tpu.policies import GaussianHeadWithStateIndependentCovariance

    steps, num_envs, rollout = 500_000, 16, 128
    env = TimeLimit(Pendulum(), 200)

    class PiV(nn.Module):
        @nn.compact
        def __call__(self, x):
            hp = nn.tanh(nn.Dense(64)(x))
            hp = nn.tanh(nn.Dense(64)(hp))
            mean = nn.Dense(
                1,
                kernel_init=nn.initializers.variance_scaling(
                    1e-4, "fan_in", "normal"
                ),
            )(hp)
            dist = GaussianHeadWithStateIndependentCovariance(action_size=1)(mean)
            hv = nn.tanh(nn.Dense(64)(x))
            hv = nn.tanh(nn.Dense(64)(hv))
            return dist, nn.Dense(1)(hv)

    core = PPOCore(
        PiV(),
        optax.adam(3e-4),
        epochs=10,
        minibatch_size=64,
        entropy_coef=0.0,
        standardize_advantages=True,
    )
    runner = OnPolicyRunner(env, core, num_envs, rollout)
    evaluator = JaxEvalLoop(env, core, num_episodes=10, max_steps=201)
    writer = ScoreWriter(os.path.join(REPO, "benchmarks/curves/ppo_pendulum"))
    state = runner.init(jax.random.PRNGKey(0))
    best, best_state = float("-inf"), None
    iters_per_eval = max(1, 10_000 // (num_envs * rollout))
    while int(state.t) < steps:
        state, _ = runner.run_iterations(state, iters_per_eval)
        t = int(state.t)
        returns = evaluator.evaluate(state.train_state, jax.random.PRNGKey(t))
        mean = writer.record(t, int(state.recent_count), returns)
        print(f"ppo_pendulum step {t} mean R {mean:.1f}", flush=True)
        if mean > best:
            best, best_state = mean, jax.device_get(state.train_state)
    save_zoo(best_state, "ppo", "pendulum")
    return best


RUNS = {
    "dqn_cartpole": run_dqn_cartpole,
    "sac_pendulum": run_sac_pendulum,
    "ppo_pendulum": run_ppo_pendulum,
}


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("names", nargs="*", default=list(RUNS))
    args = parser.parse_args()
    for name in args.names:
        t0 = time.time()
        best = RUNS[name]()
        print(
            f"== {name}: best eval mean {best:.1f} "
            f"({time.time() - t0:.0f}s wall)",
            flush=True,
        )


if __name__ == "__main__":
    main()
