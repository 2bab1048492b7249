"""IQN Atari reproduction (reference parity:
examples/atari/reproduction/iqn/train_iqn.py). ``--sim`` path runs the
identical computation against the device-side AtariSim.
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

from pfrl_tpu.agents.iqn import IQNCore
from pfrl_tpu.envs import AtariSim
from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
from pfrl_tpu.models import LargeAtariCNN
from pfrl_tpu.q_functions.quantile_q_functions import ImplicitQuantileQFunction
from pfrl_tpu.replay import ReplayBuffer


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sim", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--replay-capacity", type=int, default=10**5)
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--outdir", default="results/iqn")
    add_demo_args(parser)
    args = parser.parse_args()

    n_actions = 6
    # Reference hyperparameters (train_iqn.py:60-100): N=N'=64, K=32,
    # Adam 5e-5 eps 1e-2/32.
    core = IQNCore(
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        model=ImplicitQuantileQFunction(
            psi=LargeAtariCNN(), n_actions=n_actions
        ),
        optimizer=optax.adam(5e-5, eps=1e-2 / 32),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.01, 10**6, n_actions),
        gamma=0.99,
        quantile_thresholds_N=64,
        quantile_thresholds_N_prime=64,
        quantile_thresholds_K=32,
        phi=lambda x: x.astype(jnp.float32) / 255.0,
    )
    cfg = RunnerConfig(
        num_envs=args.num_envs,
        replay_start_size=args.replay_start_size,
        update_interval=4,
        target_update_interval=args.target_update_interval,
        minibatch_size=32,
    )
    buffer = ReplayBuffer(
        args.replay_capacity, gamma=0.99, num_lanes=args.num_envs, store_next_obs=False
    )
    runner = OffPolicyRunner(AtariSim(n_actions=n_actions), core, buffer, cfg)
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500)
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    import time

    t0 = time.time()
    while int(state.t) < args.steps:
        state, metrics = runner.run_chunk(state, 500)
        t = int(state.t)
        print(
            f"step {t:>10d} | {t/(time.time()-t0):>8.0f} steps/s | "
            f"loss {float(jnp.asarray(metrics['loss'][-1])):.4f} | "
            f"recent R {runner.recent_return_mean(state):.1f}",
            flush=True,
        )
    save_train_state_if_requested(state.train_state, args.save_to)


if __name__ == "__main__":
    main()
