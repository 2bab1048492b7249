"""Env-backend selection for the real-env example scripts.

The reference's reproduction scripts build real MuJoCo/Atari envs
unconditionally (examples/mujoco/reproduction/soft_actor_critic/
train_soft_actor_critic.py:66-79). This framework additionally ships pure-JAX
device simulators, so each real-env script has two backends:

* **default** — a real gymnasium env via
  :func:`pfrl_tpu.envs.make_gymnasium_env`. If the backend or the env id is
  unavailable, the script **hard-fails** with the underlying error; it never
  silently substitutes a simulator (a reproduction script that trains the
  wrong env is worse than one that crashes).
* ``--jax-env`` — explicit opt-in to the in-repo device simulator, for
  containers without gymnasium/mujoco and for the example smoke tests.
"""

from typing import Callable, Optional

__all__ = ["add_env_backend_args", "make_backend_env"]


def add_env_backend_args(parser):
    parser.add_argument(
        "--jax-env",
        action="store_true",
        help="train on the in-repo pure-JAX simulator instead of the real "
        "gymnasium env (--env is ignored); without this flag an "
        "unavailable --env is a hard error, never a silent fallback",
    )
    return parser


def make_backend_env(
    args,
    seed: int,
    jax_env_factory: Callable[[int], object],
    normalize_action: bool = True,
    env_id: Optional[str] = None,
):
    """Build the env for a real-env example script.

    ``jax_env_factory(seed)`` supplies the explicit ``--jax-env`` backend.
    The default backend is ``make_gymnasium_env(args.env)`` wrapped in
    ``CastObservationToFloat32`` (and ``NormalizeActionSpace`` for
    continuous control), mirroring the reference wrapper order
    (train_soft_actor_critic.py:66-79).
    """
    if getattr(args, "jax_env", False):
        return jax_env_factory(seed)
    from pfrl_tpu.envs import make_gymnasium_env
    from pfrl_tpu.wrappers import CastObservationToFloat32, NormalizeActionSpace

    env = make_gymnasium_env(env_id or args.env, seed=seed)
    env = CastObservationToFloat32(env)
    if normalize_action:
        env = NormalizeActionSpace(env)
    return env
