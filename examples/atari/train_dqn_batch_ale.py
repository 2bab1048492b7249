"""Batched / actor-learner DQN on Atari.

Reference parity: examples/atari/train_dqn_batch_ale.py — DQN over a
vector of ALE envs via the batch driver (train_agent_batch.py), i.e. the
same agent as train_dqn_ale.py fed with batched acting.

Two host modes:
- default: ``train_agent_batch_with_evaluation`` over MultiprocessVectorEnv
  (the reference's exact shape);
- ``--actor-learner``: the decoupled mode — actor threads act through one
  batched inference server while a learner thread updates flat-out
  (DQN.setup_actor_learner_training; reference dqn.py:604-788).

Sim mode (--sim): the fused on-device runner (train_dqn_ale.py does the
same; kept here so every reference entry point exists).

    python train_dqn_batch_ale.py --env BreakoutNoFrameskip-v4
    python train_dqn_batch_ale.py --actor-learner
"""

import argparse

from pfrl_tpu.experiments.demo_cli import (
    add_demo_args,
    maybe_load_train_state,
    run_demo_if_requested,
    save_train_state_if_requested,
)

import flax.linen as nn
import jax.numpy as jnp
import optax

from pfrl_tpu import experiments, explorers, replay_buffers
from pfrl_tpu.agents import DQN
from pfrl_tpu.models import LargeAtariCNN
from pfrl_tpu.q_functions import DiscreteActionValueHead


# Dtype-aware: uint8 frames scale to [0,1]; float input (already
# dequantized by the replay buffer's fused Pallas gather) passes through.
from pfrl_tpu.utils import atari_phi as phi  # noqa: E402


class NatureQ(nn.Module):
    n_actions: int

    @nn.compact
    def __call__(self, x):
        h = LargeAtariCNN()(x)
        return DiscreteActionValueHead()(nn.Dense(self.n_actions)(h))


def build_agent(n_actions, num_lanes, args):
    return DQN(
        q_function=NatureQ(n_actions=n_actions),
        optimizer=optax.adam(args.lr, eps=1.5e-4),
        replay_buffer=replay_buffers.ReplayBuffer(
            args.replay_capacity, gamma=0.99, num_lanes=num_lanes,
            store_next_obs=False, fused_dequant_scale=1.0 / 255.0,
        ),
        gamma=0.99,
        explorer=explorers.LinearDecayEpsilonGreedy(
            1.0, 0.01, 10**6, n_actions
        ),
        replay_start_size=args.replay_start_size,
        minibatch_size=args.batch_size,
        update_interval=args.update_interval,
        target_update_interval=args.target_update_interval,
        phi=phi,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )


def make_ale_env(args, idx, test):
    from pfrl_tpu.wrappers import RandomizeAction
    from pfrl_tpu.wrappers.atari_wrappers import make_atari, wrap_deepmind

    env = wrap_deepmind(
        make_atari(args.env),
        episode_life=not test,
        clip_rewards=not test,
        channel_order="hwc",
    )
    env.seed(args.seed + idx + (10**6 if test else 0))
    if test:
        env = RandomizeAction(env, 0.05)
    return env


def run_batch(args):
    from pfrl_tpu.envs import MultiprocessVectorEnv

    env = MultiprocessVectorEnv(
        [lambda i=i: make_ale_env(args, i, False) for i in range(args.num_envs)]
    )
    eval_env = MultiprocessVectorEnv(
        [lambda i=i: make_ale_env(args, i, True) for i in range(args.num_envs)]
    )
    agent = build_agent(env.action_space.n, args.num_envs, args)
    if args.load:
        agent.load(args.load)
    if args.demo:
        stats = experiments.eval_performance(
            env=eval_env, agent=agent, n_steps=None, n_episodes=10
        )
        print(
            f"n_episodes: {stats['episodes']} mean: {stats['mean']} "
            f"median: {stats['median']} stdev: {stats['stdev']}"
        )
        return
    experiments.train_agent_batch_with_evaluation(
        agent=agent,
        env=env,
        eval_env=eval_env,
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=10,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
    )


def run_actor_learner(args):
    probe = make_ale_env(args, 0, False)
    n_actions = probe.action_space.n
    probe.close()
    agent = build_agent(n_actions, args.num_envs, args)
    make_actor, learner, poller, exception_event = (
        agent.setup_actor_learner_training(n_actors=args.num_envs)
    )
    poller.start()
    learner.start()
    experiments.train_agent_async(
        outdir=args.outdir,
        processes=args.num_envs,
        make_env=lambda i, test: make_ale_env(args, i, test),
        steps=args.steps,
        eval_interval=args.eval_interval,
        eval_n_steps=None,
        eval_n_episodes=10,
        make_agent=make_actor,
        stop_event=learner.stop_event,
        exception_event=exception_event,
    )
    learner.stop()
    learner.join()
    poller.stop()
    poller.join()


def run_multihost(args):
    """SPMD scale-out of the on-device workload (BASELINE.md >=8-host
    stance): ``jax.distributed`` joins ``--num-processes`` host processes
    into one global device mesh; env lanes and the replay ring shard over
    the cross-host 'dp' axis while parameters replicate — XLA inserts the
    gradient all-reduce (ICI/DCN collectives), no pipes or parameter
    servers. Launch the SAME command on every host with a distinct
    ``--process-id``:

        python train_dqn_batch_ale.py --multihost HOST0:PORT \\
            --num-processes 4 --process-id $i
    """
    import time

    import jax
    import numpy as np

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.parallel import global_mesh, initialize_multihost, is_primary

    initialize_multihost(
        args.multihost,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    mesh = global_mesh(("dp",))
    n_actions = 6
    core = DQNCore(
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        model=NatureQ(n_actions=n_actions),
        optimizer=optax.adam(args.lr, eps=1.5e-4),
        explorer=explorers.LinearDecayEpsilonGreedy(1.0, 0.01, 10**6, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=phi,
    )
    cfg = RunnerConfig(
        num_envs=args.num_envs,
        replay_start_size=args.replay_start_size,
        update_interval=args.update_interval,
        target_update_interval=args.target_update_interval,
        minibatch_size=args.batch_size,
    )
    runner = OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        replay_buffers.ReplayBuffer(
            args.replay_capacity,
            gamma=0.99,
            num_lanes=args.num_envs,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        ),
        cfg,
        mesh=mesh,
    )
    import jax.random as jrandom

    state = runner.init(jrandom.PRNGKey(args.seed))
    chunk = 500
    done_steps = 0
    while done_steps < args.steps:
        t0 = time.time()
        state, metrics = runner.run_chunk(state, chunk)
        loss = float(np.asarray(jax.device_get(metrics["loss"]))[-1])
        done_steps = int(state.t)
        if is_primary():
            sps = chunk * args.num_envs / (time.time() - t0)
            print(
                f"step {done_steps} | {sps:,.0f} env-steps/s global"
                f" | loss {loss:.4f}",
                flush=True,
            )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="BreakoutNoFrameskip-v4")
    parser.add_argument("--actor-learner", action="store_true")
    parser.add_argument(
        "--multihost",
        default=None,
        metavar="HOST:PORT",
        help="jax.distributed coordinator; shards the on-device workload "
        "over all joined hosts (see run_multihost)",
    )
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--steps", type=int, default=5 * 10**7)
    parser.add_argument("--lr", type=float, default=2.5e-4)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-envs", type=int, default=8)
    parser.add_argument("--replay-capacity", type=int, default=10**6)
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument("--update-interval", type=int, default=4)
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--eval-interval", type=int, default=10**5)
    parser.add_argument("--outdir", default="results/dqn_batch_ale")
    add_demo_args(parser)
    args = parser.parse_args()
    if args.multihost:
        run_multihost(args)
    elif args.actor_learner:
        run_actor_learner(args)
    else:
        run_batch(args)


if __name__ == "__main__":
    main()
