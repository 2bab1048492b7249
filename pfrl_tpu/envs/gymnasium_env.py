"""Gymnasium (and legacy Gym) adapter onto the host Env protocol.

The reference builds real MuJoCo/Atari envs directly with ``gym.make``
(examples/mujoco/reproduction/soft_actor_critic/train_soft_actor_critic.py:66-79)
and threads truncation through ``info["needs_reset"]``
(pfrl/wrappers/continuing_time_limit.py:4-41). This framework keeps the same
host contract — ``step() -> (obs, reward, done, info)`` with
``info["needs_reset"]`` for truncation — so the modern gymnasium API maps
onto it exactly:

* ``reset() -> (obs, info)``            →  ``reset() -> obs``
* ``terminated``                        →  ``done`` (no bootstrap through it)
* ``truncated``                         →  ``info["needs_reset"] = True``
  (bootstrapping continues through it, which is precisely the framework's
  done-vs-reset distinction)
* seeding via ``reset(seed=...)``       →  ``seed(s)`` stores the seed; the
  next ``reset()`` consumes it.

Legacy ``gym`` (0.2x, 4-tuple ``step``) envs are adapted by the same class:
the API flavour is detected from the return arity, and legacy
``info["TimeLimit.truncated"]`` becomes ``needs_reset``.
"""

from typing import Any, Optional

from pfrl_tpu.env import Env


class GymnasiumEnv(Env):
    """Wrap an instantiated gymnasium (or legacy gym) env as a host Env.

    Exposes the inner env's ``observation_space``/``action_space`` untouched
    (both libraries' Box/Discrete carry the ``shape``/``n``/``low``/``high``
    attributes the framework reads). Unknown attributes delegate to the
    inner env, so wrappers like ``Monitor`` / ``RandomizeAction`` compose.
    """

    def __init__(self, env: Any, seed: Optional[int] = None):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self._pending_seed = seed

    def seed(self, seed: Optional[int] = None):
        self._pending_seed = seed

    def reset(self):
        kwargs = {}
        if self._pending_seed is not None:
            kwargs["seed"] = self._pending_seed
            self._pending_seed = None
        try:
            out = self.env.reset(**kwargs)
        except TypeError:
            # Legacy gym: reset() takes no seed kwarg; seed via .seed().
            if "seed" in kwargs:
                self.env.seed(kwargs["seed"])
            out = self.env.reset()
        if isinstance(out, tuple) and len(out) == 2 and isinstance(out[1], dict):
            obs, _info = out
            return obs
        return out

    def step(self, action):
        out = self.env.step(action)
        if len(out) == 5:
            obs, reward, terminated, truncated, info = out
            info = dict(info)
            if truncated:
                info["needs_reset"] = True
            return obs, float(reward), bool(terminated), info
        # Legacy 4-tuple API: done conflates termination and truncation;
        # gym's TimeLimit marks the latter in info["TimeLimit.truncated"].
        obs, reward, done, info = out
        info = dict(info)
        if info.get("TimeLimit.truncated", False):
            info["needs_reset"] = True
            done = False
        return obs, float(reward), bool(done), info

    def render(self, *args, **kwargs):
        return self.env.render(*args, **kwargs)

    def close(self):
        self.env.close()

    def __getattr__(self, name):
        return getattr(self.env, name)


def make_gymnasium_env(
    env_id: str, seed: Optional[int] = None, **make_kwargs
) -> GymnasiumEnv:
    """``gym.make``-equivalent factory, preferring gymnasium.

    Tries ``gymnasium.make`` first, then legacy ``gym.make``. Raises a
    RuntimeError naming the missing backend if neither can build ``env_id``
    — real-env scripts must hard-fail rather than silently substitute a
    simulator (use an explicit ``--jax-env`` flag for that).
    """
    errors = []
    try:
        import gymnasium

        return GymnasiumEnv(gymnasium.make(env_id, **make_kwargs), seed=seed)
    except ImportError as e:
        errors.append(f"gymnasium: {e}")
    except Exception as e:  # unknown id, missing extras (e.g. ale-py)
        errors.append(f"gymnasium.make({env_id!r}): {type(e).__name__}: {e}")
    try:
        import gym

        return GymnasiumEnv(gym.make(env_id, **make_kwargs), seed=seed)
    except ImportError as e:
        errors.append(f"gym: {e}")
    except Exception as e:
        errors.append(f"gym.make({env_id!r}): {type(e).__name__}: {e}")
    raise RuntimeError(
        f"Could not build real environment {env_id!r}. Tried: "
        + "; ".join(errors)
        + ". Install gymnasium (plus any env extras), or pass --jax-env to "
        "use the in-repo device simulator explicitly."
    )
