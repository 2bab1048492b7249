"""Categorical DQN (C51) on Atari.

Reference parity: examples/atari/train_categorical_dqn_ale.py — C51 with
the Nature CNN torso, 51 atoms on [-10, 10], Adam(eps=1e-2/batch_size).

    python train_categorical_dqn_ale.py --env BreakoutNoFrameskip-v4
    python train_categorical_dqn_ale.py --sim
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)
import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pfrl_tpu import explorers, replay_buffers
from pfrl_tpu.action_value import DistributionalDiscreteActionValue
from pfrl_tpu.agents import CategoricalDQNCore
from pfrl_tpu.models import LargeAtariCNN


def phi(x):
    return x.astype(jnp.float32) / 255.0


class C51Q(nn.Module):
    n_actions: int
    n_atoms: int = 51
    v_min: float = -10.0
    v_max: float = 10.0

    @nn.compact
    def __call__(self, x):
        h = LargeAtariCNN()(x)
        logits = nn.Dense(self.n_actions * self.n_atoms)(h).reshape(
            x.shape[0], self.n_actions, self.n_atoms
        )
        z = jnp.linspace(self.v_min, self.v_max, self.n_atoms, jnp.float32)
        return DistributionalDiscreteActionValue(
            q_dist=jax.nn.softmax(logits, axis=-1), z_values=z
        )


def run_sim(args):
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig

    n_actions = 6
    core = CategoricalDQNCore(
        model=C51Q(n_actions=n_actions, n_atoms=args.n_atoms),
        optimizer=optax.adam(args.lr, eps=1e-2 / args.batch_size),
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, 0.01, 10**6, n_actions
        ),
        gamma=0.99,
        phi=phi,
    )
    runner = OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        replay_buffers.ReplayBuffer(
            args.replay_capacity, gamma=0.99, num_lanes=args.num_envs,
            store_next_obs=False,
        ),
        RunnerConfig(
            num_envs=args.num_envs,
            replay_start_size=args.replay_start_size,
            update_interval=4,
            target_update_interval=args.target_update_interval,
            minibatch_size=args.batch_size,
        ),
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(AtariSim(n_actions=n_actions), core, num_episodes=5, max_steps=500)
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state, seed=args.seed):
        return
    t0 = time.time()
    while int(state.t) < args.steps:
        state, _ = runner.run_chunk(state, args.chunk)
        t = int(state.t)
        print(f"step {t:>9} | {t / (time.time() - t0):>8.0f} env-steps/s")
    print(f"done: {int(state.t)} transitions in {time.time() - t0:.1f}s")
    save_train_state_if_requested(state.train_state, args.save_to)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="BreakoutNoFrameskip-v4")
    parser.add_argument("--sim", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--chunk", type=int, default=200,
                        help="scan steps per device dispatch")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--n-atoms", type=int, default=51)
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-envs", type=int, default=64)
    parser.add_argument("--replay-capacity", type=int, default=10**6)
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    add_demo_args(parser)
    args = parser.parse_args()
    if not args.sim:
        raise SystemExit(
            "host ALE requires gym[atari]+cv2 (not in this container); "
            "use --sim, or see train_dqn_ale.py:run_ale for the host path"
        )
    run_sim(args)


if __name__ == "__main__":
    main()
