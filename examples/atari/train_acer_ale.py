"""ACER on Atari.

Reference parity: examples/atari/train_acer_ale.py — discrete ACER with
shared pi/Q torso, episodic replay storing the behavior distribution,
truncated importance sampling with bias correction and efficient-TRPO
projection (acer.py:30-248).

The reference runs this with async CPU workers; the TPU form is the fused
on-device runner over batched env lanes with the same off-policy math
(SURVEY.md §2.6).

    python train_acer_ale.py --sim
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

from pfrl_tpu.action_value import DiscreteActionValue
from pfrl_tpu.agents import ACERCore
from pfrl_tpu.distributions import Categorical
from pfrl_tpu.models import SmallAtariCNN
from pfrl_tpu.replay import EpisodicReplayBuffer


def phi(x):
    return x.astype(jnp.float32) / 255.0


class PiQ(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, x):
        h = SmallAtariCNN()(x)
        return (
            Categorical(logits=nn.Dense(self.n_actions)(h)),
            DiscreteActionValue(q_values=nn.Dense(self.n_actions)(h)),
        )


def run_sim(args):
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig

    n_actions = 6
    core = ACERCore(
        model=PiQ(n_actions=n_actions),
        optimizer=optax.rmsprop(args.lr, decay=0.99, eps=1e-2),
        gamma=0.99,
        beta=args.beta,
        truncation_threshold=10.0,
        use_trust_region=True,
        trust_region_delta=0.1,
        phi=phi,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    buffer = EpisodicReplayBuffer(
        max_episodes=args.max_episodes,
        max_episode_len=args.t_max,
        num_lanes=args.num_envs,
    )
    runner = OffPolicyRunner(
        AtariSim(n_actions=n_actions, mean_episode_len=args.t_max),
        core,
        buffer,
        RunnerConfig(
            num_envs=args.num_envs,
            replay_start_size=args.replay_start_size,
            update_interval=args.num_envs,
            target_update_interval=10**9,  # ACER has no target net
            minibatch_size=args.batch_size,
        ),
    )
    state = runner.init(jax.random.PRNGKey(args.seed))
    evaluator = JaxEvalLoop(AtariSim(n_actions=n_actions, mean_episode_len=args.t_max), core, num_episodes=5, max_steps=500)
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
    parser.add_argument("--steps", type=int, default=10**7)
    parser.add_argument("--lr", type=float, default=7e-4)
    parser.add_argument("--beta", type=float, default=1e-2)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--num-envs", type=int, default=16)
    parser.add_argument("--t-max", type=int, default=50,
                        help="episode chunk length for episodic replay")
    parser.add_argument("--max-episodes", type=int, default=2048)
    parser.add_argument("--replay-start-size", type=int, default=10**4)
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
