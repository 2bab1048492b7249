"""On-device on-policy runner: PPO learns ABC fully jitted."""

import flax.linen as nn
import numpy as np
import optax

import jax
import jax.numpy as jnp

from pfrl_tpu.agents.ppo import PPOCore
from pfrl_tpu.envs import ABC
from pfrl_tpu.experiments import JaxEvalLoop, OnPolicyRunner
from pfrl_tpu.policies import SoftmaxCategoricalHead


class PiV(nn.Module):
    n_actions: int = 2

    @nn.compact
    def __call__(self, x):
        hp = nn.tanh(nn.Dense(32)(x))
        logits = nn.Dense(self.n_actions)(hp)
        hv = nn.tanh(nn.Dense(32)(x))
        value = nn.Dense(1)(hv)
        return SoftmaxCategoricalHead()(logits), value


def test_ppo_runner_learns_abc():
    env = ABC(size=2, episodic=True, deterministic=True)
    core = PPOCore(
        model=PiV(),
        optimizer=optax.adam(5e-3),
        gamma=0.9,
        epochs=4,
        minibatch_size=64,
        entropy_coef=0.01,
    )
    runner = OnPolicyRunner(env, core, num_envs=16, rollout_len=16)
    state = runner.init(jax.random.PRNGKey(0))
    state, aux = runner.run_iterations(state, 60)
    ev = JaxEvalLoop(env, core, num_episodes=5, max_steps=4)
    returns = ev.evaluate(state.train_state, jax.random.PRNGKey(1))
    assert np.all(returns >= 1.0), returns
    assert float(state.t) == 60 * 16 * 16
