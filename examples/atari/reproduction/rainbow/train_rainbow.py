"""Rainbow Atari reproduction (reference parity:
examples/atari/reproduction/rainbow/train_rainbow.py).

Double + distributional (C51) + dueling + noisy + PER + 3-step, the
reference recipe. ``--sim`` runs the identical training computation on the
device-side AtariSim via the on-device runner.
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
import jax.numpy as jnp
import optax

from pfrl_tpu.agents.categorical_dqn import CategoricalDoubleDQNCore
from pfrl_tpu.envs import AtariSim
from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
from pfrl_tpu.explorers import Greedy
from pfrl_tpu.models import LargeAtariCNN
from pfrl_tpu.models.noisy_linear import FactorizedNoisyDense
from pfrl_tpu.q_functions.dueling_dqn import DistributionalDuelingDQN
from pfrl_tpu.replay import PrioritizedReplayBuffer


def phi(x):
    return x.astype(jnp.float32) / 255.0


def make_core(n_actions, args):
    # Reference recipe: noisy dense heads, 51 atoms on [-10, 10],
    # Adam 6.25e-5 eps 1.5e-4 (train_rainbow.py:60-90).
    model = DistributionalDuelingDQN(
        n_actions=n_actions,
        n_atoms=51,
        v_min=-10.0,
        v_max=10.0,
        dense_cls=lambda features, **kw: FactorizedNoisyDense(
            features=features, sigma_scale=0.5
        ),
    )
    return CategoricalDoubleDQNCore(
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        model=model,
        optimizer=optax.adam(6.25e-5, eps=1.5e-4),
        explorer=Greedy(),  # NoisyNet provides exploration
        gamma=0.99,
        phi=phi,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sim", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--replay-capacity", type=int, default=10**5)
    parser.add_argument("--replay-start-size", type=int, default=2 * 10**4)
    parser.add_argument("--target-update-interval", type=int, default=32_000)
    parser.add_argument("--outdir", default="results/rainbow")
    add_demo_args(parser)
    args = parser.parse_args()

    n_actions = 6
    core = make_core(n_actions, args)
    cfg = RunnerConfig(
        num_envs=args.num_envs,
        replay_start_size=args.replay_start_size,
        update_interval=4,
        target_update_interval=args.target_update_interval,
        minibatch_size=32,
    )
    buffer = PrioritizedReplayBuffer(
        args.replay_capacity,
        alpha=0.5,
        beta0=0.4,
        betasteps=args.steps / 4,
        num_steps=3,
        gamma=0.99,
        num_lanes=args.num_envs,
        store_next_obs=False,
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
