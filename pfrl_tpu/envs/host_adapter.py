"""Host-protocol adapter over a pure-JAX env.

Lets the reference-compatible host drivers (train_agent*,
Evaluator) run against the in-repo device envs — the test strategy's
stand-in for gym envs. Steps one env at a time on host; use only for tests
and small-scale compatibility runs (the real path is the on-device runner).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pfrl_tpu.env import Env, JaxEnv


class HostJaxEnv(Env):
    def __init__(self, env: JaxEnv, seed: int = 0):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self._rng = jax.random.PRNGKey(seed)
        self._state = None
        self._step = jax.jit(env.step)
        self._reset = jax.jit(env.reset)

    def _next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    def seed(self, seed: Optional[int] = None):
        if seed is not None:
            self._rng = jax.random.PRNGKey(seed)

    def reset(self):
        self._state, obs = self._reset(self._next_rng())
        return np.asarray(obs)

    def step(self, action):
        if np.isscalar(action) or np.ndim(action) == 0:
            action = jnp.asarray(action)
        else:
            action = jnp.asarray(np.asarray(action))
        self._state, ts = self._step(self._next_rng(), self._state, action)
        info = {}
        if bool(ts.truncated):
            info["needs_reset"] = True
        return np.asarray(ts.obs), float(ts.reward), bool(ts.terminated), info

    def close(self):
        pass
