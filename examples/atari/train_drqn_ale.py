"""DRQN on Atari — recurrent Q-learning with single (flickering) frames.

Reference parity: examples/atari/train_drqn_ale.py — DQN with an LSTM
head over single frames (no frame stack), optionally with the flicker
wrapper (obs blanked with p=0.5, Hausknecht & Stone 2015), trained from
episodic replay with truncated-BPTT.

    python train_drqn_ale.py --env BreakoutNoFrameskip-v4 --flicker
    python train_drqn_ale.py --sim
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

from pfrl_tpu import explorers
from pfrl_tpu.action_value import DiscreteActionValue
from pfrl_tpu.agents import RecurrentDQNCore
from pfrl_tpu.models import LargeAtariCNN
from pfrl_tpu.models.recurrent import LSTMCellModule
from pfrl_tpu.replay import EpisodicReplayBuffer


def phi(x):
    return x.astype(jnp.float32) / 255.0


class RecurrentQ(nn.Module):
    """CNN torso -> LSTM -> Q head with the one-step carry protocol
    (pfrl_tpu/models/recurrent.py; replaces the reference's
    RecurrentSequential over PackedSequence)."""

    n_actions: int
    lstm_size: int = 512

    @nn.compact
    def __call__(self, x, carry):
        h = LargeAtariCNN(n_output_channels=self.lstm_size)(x)
        h, new_carry = LSTMCellModule(self.lstm_size)(h, carry[0])
        return DiscreteActionValue(q_values=nn.Dense(self.n_actions)(h)), (
            new_carry,
        )

    def initial_carry(self, batch_size):
        z = jnp.zeros((batch_size, self.lstm_size), jnp.float32)
        return ((z, z),)


def build_core(n_actions, args):
    return RecurrentDQNCore(
        model=RecurrentQ(n_actions=n_actions),
        optimizer=optax.adam(args.lr, eps=1e-2),
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, 0.01, args.final_exploration_frames, n_actions
        ),
        gamma=0.99,
        phi=phi,
        burn_in=args.burn_in,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )


def run_sim(args):
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig

    n_actions = 6
    # Single frame (channel=1): recurrence must carry the temporal context.
    env = AtariSim(n_actions=n_actions, frame_shape=(84, 84, 1))
    core = build_core(n_actions, args)
    # Chunked episode storage (rows of --max-episode-chunk steps; long
    # episodes span rows) with random-offset windows of
    # --episodic-update-len steps warm-started from stored carries —
    # reference semantics (pfrl/replay_buffer.py:149-154 random_subseq +
    # pfrl/agents/dqn.py:533-543 recurrent_state snapshots).
    buffer = EpisodicReplayBuffer(
        max_episodes=args.max_episodes,
        max_episode_len=args.max_episode_chunk,
        num_lanes=args.num_envs,
        subseq_len=args.episodic_update_len,
    )
    runner = OffPolicyRunner(
        env,
        core,
        buffer,
        RunnerConfig(
            num_envs=args.num_envs,
            replay_start_size=args.replay_start_size,
            update_interval=args.update_interval,
            target_update_interval=args.target_update_interval,
            minibatch_size=args.batch_size,
        ),
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(env, core, num_episodes=5, max_steps=500)
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
    parser.add_argument("--flicker", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--chunk", type=int, default=200,
                        help="scan steps per device dispatch")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-envs", type=int, default=32)
    parser.add_argument("--max-episodes", type=int, default=2048)
    parser.add_argument("--episodic-update-len", type=int, default=32,
                        help="truncated-BPTT window (ppo.py:145-154 analog)")
    parser.add_argument("--burn-in", type=int, default=0,
                        help="R2D2 burn-in steps per replayed window "
                        "(stop-gradient carry refresh; size "
                        "--episodic-update-len as burn_in + train_len)")
    parser.add_argument("--max-episode-chunk", type=int, default=128,
                        help="storage row length; longer episodes chunk "
                        "into fresh rows (nothing is truncated)")
    parser.add_argument("--replay-start-size", type=int, default=10**4)
    parser.add_argument("--update-interval", type=int, default=4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--final-exploration-frames", type=int, default=10**6)
    add_demo_args(parser)
    args = parser.parse_args()
    if not args.sim:
        raise SystemExit(
            "host ALE requires gym[atari]+cv2 (not in this container); "
            "use --sim, or see train_dqn_ale.py:run_ale for the host "
            "wrapper stack incl. FlickerFrame"
        )
    run_sim(args)


if __name__ == "__main__":
    main()
