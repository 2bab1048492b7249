"""In-place env patching helpers (reference parity: pfrl/utils/env_modifiers.py).

The reference mutates ``env.step``/``env.reset`` in place; these helpers keep
that convenience API for quick host-side experiments. For anything serious
prefer the wrapper classes in pfrl_tpu/wrappers (composable, picklable) or,
for pure-JAX envs, the functional wrappers in pfrl_tpu/envs/wrappers.py.
"""

import numpy as np


def make_rendered(env, *render_args, **render_kwargs):
    """Render after every step (reference: env_modifiers.py:4-18)."""
    base_step = env.step
    base_close = env.close

    def step(action):
        ret = base_step(action)
        env.render(*render_args, **render_kwargs)
        return ret

    def close():
        try:
            env.render(*render_args, close=True, **render_kwargs)
        except TypeError:
            pass  # newer gym renderers take no close kwarg
        base_close()

    env.step = step
    env.close = close


def make_timestep_limited(env, timestep_limit):
    """Force done=True after ``timestep_limit`` steps (reference: :21-41)."""
    t = [1]
    base_step = env.step
    base_reset = env.reset

    def step(action):
        observation, reward, done, info = base_step(action)
        if t[0] >= timestep_limit:
            done = True
        t[0] += 1
        return observation, reward, done, info

    def reset(*args, **kwargs):
        t[0] = 1
        return base_reset(*args, **kwargs)

    env.step = step
    env.reset = reset


def make_action_filtered(env, action_filter):
    """Apply ``action_filter`` to every action before stepping."""
    base_step = env.step

    def step(action):
        return base_step(action_filter(action))

    env.step = step


def make_reward_filtered(env, reward_filter):
    """Apply ``reward_filter`` (see pfrl_tpu.utils.reward_filter) to rewards."""
    base_step = env.step

    def step(action):
        observation, reward, done, info = base_step(action)
        return observation, reward_filter(reward), done, info

    env.step = step


def make_reward_clipped(env, low, high):
    """Clip rewards to [low, high]."""
    base_step = env.step

    def step(action):
        observation, reward, done, info = base_step(action)
        return observation, float(np.clip(reward, low, high)), done, info

    env.step = step
