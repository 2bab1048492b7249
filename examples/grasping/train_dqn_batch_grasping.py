"""Batch DQN on the Kuka diverse-object grasping env (reference parity:
examples/grasping/train_dqn_batch_grasping.py).

With ``pybullet`` on the host, trains the KukaDiverseObjectEnv through the
batch driver with N env processes. Without it (this container), the same
agent + Q-function + driver code path runs on a synthetic grasping env
with the identical observation structure.

Observations are structured pytrees — ``(84x84x3 image, elapsed_steps)``
tuples — exercising the framework's pytree observation path end to end
(batch collation, device replay storage, jitted update).
"""

import argparse

from pfrl_tpu.experiments.env_cli import add_env_backend_args

import functools

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax

from pfrl_tpu import experiments
from pfrl_tpu.agents import DoubleDQN
from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
from pfrl_tpu.q_functions import DiscreteActionValueHead
from pfrl_tpu.replay import PrioritizedReplayBuffer


class GraspingQFunction(nn.Module):
    """Nature-CNN image torso gated by a sigmoid embedding of elapsed steps
    (reference :93-121). Input: ``(image[B,84,84,3] float, steps[B] int)``.
    """

    n_actions: int
    max_episode_steps: int

    @nn.compact
    def __call__(self, x):
        image, steps = x
        h = nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID")(image)
        h = nn.relu(h)
        h = nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID")(h)
        h = nn.relu(h)
        h = nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID")(h)
        h = h.reshape(h.shape[0], -1)
        gate = nn.Embed(self.max_episode_steps + 1, h.shape[-1])(steps)
        h = h * nn.sigmoid(gate)
        h = nn.relu(nn.Dense(512)(h))
        q = nn.Dense(self.n_actions)(h)
        return DiscreteActionValueHead()(q)


class SyntheticGraspingEnv:
    """Fallback env with the grasping observation/action structure.

    A graspable object occupies one of ``n_actions`` bins; picking its bin
    within the episode yields +1 and ends the episode. The bin is visible
    as a bright column in the image, so the optimal policy is learnable
    from pixels.
    """

    class _Discrete:
        def __init__(self, n):
            self.n = n

        def sample(self):
            return np.random.randint(self.n)

    def __init__(self, n_actions=10, max_episode_steps=8, seed=0):
        self.action_space = self._Discrete(n_actions)
        self.observation_space = None  # structured (image, steps) tuple
        self.max_episode_steps = max_episode_steps
        self._rng = np.random.RandomState(seed)
        self._target = 0
        self._t = 0

    def _obs(self):
        img = np.zeros((84, 84, 3), np.float32)
        w = 84 // self.action_space.n
        img[:, self._target * w : (self._target + 1) * w, :] = 1.0
        img += self._rng.uniform(0, 0.1, img.shape).astype(np.float32)
        return (img, self._t)

    def reset(self):
        self._target = int(self._rng.randint(self.action_space.n))
        self._t = 0
        return self._obs()

    def step(self, action):
        self._t += 1
        success = int(action) == self._target
        done = success or self._t >= self.max_episode_steps
        return self._obs(), float(success), done, {}

    def seed(self, seed=None):
        self._rng = np.random.RandomState(seed)

    def close(self):
        pass


def make_env(args, seed, test):
    if args.jax_env:
        return SyntheticGraspingEnv(
            max_episode_steps=args.max_episode_steps, seed=int(seed)
        )
    try:
        import gym
        from pybullet_envs.bullet.kuka_diverse_object_gym_env import (  # noqa
            KukaDiverseObjectEnv,
        )

        env = KukaDiverseObjectEnv(
            isDiscrete=True,
            renders=args.render and (args.demo or not test),
            height=84,
            width=84,
            maxSteps=args.max_episode_steps,
            isTest=test,
        )
        # Disable file caching to avoid a pybullet multiprocessing bug.
        env.cid = env._p.connect(env._p.DIRECT if not env.cid else env.cid)
        env.seed(int(seed))

        class _Wrapped:
            """Cast actions, transpose to HWC float, append elapsed steps
            (reference wrappers :15-71)."""

            def __init__(self, env, max_steps):
                self.env = env
                self.action_space = env.action_space
                self._max_steps = max_steps
                self._t = 0

            def reset(self):
                self._t = 0
                return (np.asarray(self.env.reset(), np.float32), self._t)

            def step(self, action):
                obs, r, done, info = self.env.step(int(action))
                self._t += 1
                return (np.asarray(obs, np.float32), self._t), r, done, info

            def close(self):
                self.env.close()

            def seed(self, seed=None):
                return self.env.seed(seed)

        return _Wrapped(env, args.max_episode_steps)
    except ImportError as e:
        raise RuntimeError(
            f"pybullet grasping env unavailable ({e}); pass --jax-env to "
            "train the in-repo synthetic grasping simulator explicitly"
        ) from e


def make_batch_env(args, test):
    from pfrl_tpu.envs import MultiprocessVectorEnv, SerialVectorEnv

    seeds = [args.seed * args.num_envs + i + (10_000 if test else 0)
             for i in range(args.num_envs)]
    fns = [functools.partial(make_env, args, s, test) for s in seeds]
    if args.serial_envs:
        return SerialVectorEnv([fn() for fn in fns])
    return MultiprocessVectorEnv(fns)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="results/grasping")
    add_env_backend_args(parser)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    parser.add_argument("--demo", action="store_true")
    parser.add_argument("--load", default=None)
    parser.add_argument("--final-exploration-steps", type=int, default=5 * 10**5)
    parser.add_argument("--final-epsilon", type=float, default=0.2)
    parser.add_argument("--steps", type=int, default=2 * 10**6)
    parser.add_argument("--max-episode-steps", type=int, default=8)
    parser.add_argument("--replay-start-size", type=int, default=5 * 10**4)
    parser.add_argument(
        "--replay-capacity",
        type=int,
        default=10**6,
        help=(
            "Replay ring size. The device replay preallocates "
            "capacity x obs storage, so shrink this for quick runs."
        ),
    )
    parser.add_argument("--target-update-interval", type=int, default=10**4)
    parser.add_argument("--eval-interval", type=int, default=10**5)
    parser.add_argument("--update-interval", type=int, default=1)
    parser.add_argument("--eval-n-runs", type=int, default=100)
    parser.add_argument("--render", action="store_true")
    parser.add_argument("--lr", type=float, default=6.25e-5)
    parser.add_argument("--num-envs", type=int, default=1)
    parser.add_argument("--serial-envs", action="store_true")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--gamma", type=float, default=0.99)
    args = parser.parse_args()

    sample_env = make_env(args, args.seed, test=False)
    n_actions = sample_env.action_space.n
    sample_env.close()

    q_func = GraspingQFunction(
        n_actions=n_actions, max_episode_steps=args.max_episode_steps
    )
    # Reference: PER + LinearDecayEpsilonGreedy down to 0.2, Adam 6.25e-5
    # (train_dqn_batch_grasping.py:290-330).
    agent = DoubleDQN(
        q_func,
        optax.adam(args.lr),
        PrioritizedReplayBuffer(
            args.replay_capacity,
            alpha=0.6,
            beta0=0.4,
            betasteps=args.steps,
            gamma=args.gamma,
        ),
        args.gamma,
        LinearDecayEpsilonGreedy(
            1.0, args.final_epsilon, args.final_exploration_steps, n_actions
        ),
        replay_start_size=args.replay_start_size,
        minibatch_size=args.batch_size,
        update_interval=args.update_interval,
        target_update_interval=args.target_update_interval,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )
    if args.load:
        agent.load(args.load)

    if args.demo:
        env = make_batch_env(args, test=True)
        stats = experiments.eval_performance(
            env=env, agent=agent, n_steps=None, n_episodes=args.eval_n_runs
        )
        print(f"n_episodes: {stats['episodes']} mean: {stats['mean']}")
        return

    experiments.train_agent_batch_with_evaluation(
        agent,
        make_batch_env(args, test=False),
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=args.eval_n_runs,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
        eval_env=make_batch_env(args, test=True),
        log_interval=1000,
    )


if __name__ == "__main__":
    main()
