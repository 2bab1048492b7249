"""Data-efficient Rainbow on Slime Volleyball (reference parity:
examples/slimevolley/train_rainbow.py).

With ``slimevolleygym`` installed on the host, trains on ``SlimeVolley-v0``
(MultiBinary actions exposed as Discrete(2**3)). Without it (this
container), the same agent/shell code path trains on the in-repo pure-JAX
CartPole so the script stays runnable end to end.

Recipe (reference :96-170): double + distributional (C51) + dueling +
noisy-net + proportional PER + 3-step returns, MLP torso instead of a CNN
because observations are not pixels, gamma 0.98, Adam 1e-4.
"""

import argparse

from pfrl_tpu.experiments.demo_cli import add_demo_args
from pfrl_tpu.experiments.env_cli import add_env_backend_args

import flax.linen as nn
import jax.numpy as jnp
import optax

from pfrl_tpu import experiments
from pfrl_tpu.action_value import DistributionalDiscreteActionValue
from pfrl_tpu.agents import CategoricalDoubleDQN
from pfrl_tpu.explorers import ConstantEpsilonGreedy
from pfrl_tpu.models import MLP
from pfrl_tpu.models.noisy_linear import FactorizedNoisyDense
from pfrl_tpu.replay import PrioritizedReplayBuffer


class MultiBinaryAsDiscreteAction:
    """Expose a MultiBinary(n) action space as Discrete(2**n).

    Gym ActionWrapper equivalent of the reference's
    train_rainbow.py:15-33 — action index bits become the binary vector.
    """

    def __init__(self, env):
        import gym.spaces

        assert isinstance(env.action_space, gym.spaces.MultiBinary)
        self.env = env
        self.n_bits = env.action_space.n
        self.action_space = gym.spaces.Discrete(2**self.n_bits)
        self.observation_space = env.observation_space

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, action):
        bits = [(int(action) >> i) % 2 for i in range(self.n_bits)]
        return self.env.step(bits)

    def close(self):
        self.env.close()

    def seed(self, seed=None):
        return self.env.seed(seed)


class DistributionalDuelingMLPHead(nn.Module):
    """MLP torso + split dueling C51 head (reference :36-68)."""

    n_actions: int
    n_atoms: int = 51
    v_min: float = -1.0
    v_max: float = 1.0
    hidden: int = 512

    @nn.compact
    def __call__(self, x):
        noisy = lambda features: FactorizedNoisyDense(
            features=features, sigma_scale=0.5
        )
        h = MLP(out_size=self.hidden, hidden_sizes=(self.hidden,))(x)
        h = nn.relu(h)
        h_a, h_v = jnp.split(h, 2, axis=-1)
        a = noisy(self.n_actions * self.n_atoms)(h_a)
        a = a.reshape(-1, self.n_actions, self.n_atoms)
        a = a - jnp.mean(a, axis=1, keepdims=True)
        v = noisy(self.n_atoms)(h_v)[:, None, :]
        q_dist = nn.softmax(a + v, axis=-1)
        z = jnp.linspace(self.v_min, self.v_max, self.n_atoms, dtype=jnp.float32)
        return DistributionalDiscreteActionValue(q_dist=q_dist, z_values=z)


def make_env(args, seed):
    if args.jax_env:
        from pfrl_tpu.envs import CartPole, HostJaxEnv, TimeLimit

        return HostJaxEnv(TimeLimit(CartPole()), seed=seed)
    try:
        import gym
        import slimevolleygym  # noqa: F401  (registers SlimeVolley-v0)

        from pfrl_tpu.wrappers import CastObservationToFloat32

        env = gym.make("SlimeVolley-v0")
        env.seed(seed)
        return MultiBinaryAsDiscreteAction(CastObservationToFloat32(env))
    except ImportError as e:
        raise RuntimeError(
            f"slimevolleygym unavailable ({e}); pass --jax-env to train the "
            "in-repo CartPole simulator explicitly"
        ) from e


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 network compute over fp32 master params")
    add_env_backend_args(parser)
    parser.add_argument("--steps", type=int, default=2 * 10**6)
    parser.add_argument("--gamma", type=float, default=0.98)
    parser.add_argument("--replay-start-size", type=int, default=1600)
    parser.add_argument("--eval-interval", type=int, default=100_000)
    parser.add_argument("--outdir", default="results/slimevolley_rainbow")
    add_demo_args(parser, save=False)
    args = parser.parse_args()

    env = make_env(args, args.seed)
    eval_env = make_env(args, args.seed + 100)
    n_actions = env.action_space.n

    # Data-efficient Rainbow hyperparameters (reference :96-170):
    # update every step after a short warmup, 3-step returns, PER
    # alpha 0.5 / beta 0.4 annealed over training.
    agent = CategoricalDoubleDQN(
        DistributionalDuelingMLPHead(n_actions=n_actions),
        optax.adam(1e-4, eps=1.5e-4),
        PrioritizedReplayBuffer(
            10**6,
            alpha=0.5,
            beta0=0.4,
            betasteps=args.steps,
            num_steps=3,
            gamma=args.gamma,
        ),
        args.gamma,
        ConstantEpsilonGreedy(0.0, n_actions),  # NoisyNet explores
        replay_start_size=args.replay_start_size,
        minibatch_size=32,
        update_interval=1,
        target_update_interval=2000,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        seed=args.seed,
    )
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
    experiments.train_agent_with_evaluation(
        agent,
        env,
        steps=args.steps,
        eval_n_steps=None,
        eval_n_episodes=10,
        eval_interval=args.eval_interval,
        outdir=args.outdir,
        eval_env=eval_env,
    )


if __name__ == "__main__":
    main()
