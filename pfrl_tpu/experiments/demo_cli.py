"""``--load`` / ``--demo`` CLI support for the device-runner examples.

Reference parity: every pfrl example can reload a checkpoint and run
eval-only (``--demo``/``--load``,
examples/atari/reproduction/dqn/train_dqn.py:83-88,200-214), and
examples_tests/*.sh assert the train→demo round trip. Host-shell examples
use ``agent.load()`` + ``eval_performance`` directly (the grasping example
pattern); device-runner examples use these helpers on the functional
``train_state`` instead:

    add_demo_args(parser)
    ...
    state = runner.init(key)
    state = maybe_load_train_state(state, args.load)
    if run_demo_if_requested(args, evaluator, state.train_state):
        return
    ... training loop ...
    save_train_state_if_requested(state.train_state, args.save_to)
"""

import os
from typing import Optional

__all__ = [
    "add_demo_args",
    "resolve_train_state_path",
    "maybe_load_train_state",
    "run_demo_if_requested",
    "save_train_state_if_requested",
]

_STATE_FILE = "train_state.msgpack"


def add_demo_args(parser, save: bool = True):
    parser.add_argument(
        "--load",
        metavar="PATH",
        default=None,
        help="load a saved train_state (a train_state.msgpack file, a "
        "directory containing one, or a zoo 'best' directory) before "
        "training or demoing",
    )
    parser.add_argument(
        "--demo",
        action="store_true",
        help="evaluate the (loaded) agent and exit without training",
    )
    if save:
        parser.add_argument(
            "--save-to",
            metavar="PATH",
            default=None,
            help="directory to save the final train_state.msgpack into",
        )
    return parser


def resolve_train_state_path(path: str) -> str:
    """Accepts a train_state.msgpack file, a directory containing one, or
    a zoo entry with a best/ subdirectory."""
    if os.path.isdir(path):
        for cand in (
            os.path.join(path, _STATE_FILE),
            os.path.join(path, "best", _STATE_FILE),
        ):
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"no {_STATE_FILE} under {path}")
    return path


def maybe_load_train_state(runner_state, load_path: Optional[str]):
    """Replace ``runner_state.train_state`` with one loaded from disk.

    The freshly-initialized state serves as the shape/dtype template
    (msgpack stores raw leaves; see pfrl_tpu/replay/persistent.py).
    """
    if not load_path:
        return runner_state
    import jax

    from pfrl_tpu.replay.persistent import load_state

    template = jax.device_get(runner_state.train_state)
    loaded = load_state(template, resolve_train_state_path(load_path))
    return runner_state.replace(train_state=jax.device_put(loaded))


def run_demo_if_requested(args, evaluator, train_state, seed: int = 0) -> bool:
    """Eval-only path: prints reference-style stats and returns True when
    ``--demo`` was given (caller should exit)."""
    if not getattr(args, "demo", False):
        return False
    import jax
    import numpy as np

    returns = np.asarray(
        evaluator.evaluate(train_state, jax.random.PRNGKey(seed))
    )
    print(
        f"n_episodes: {len(returns)} mean: {returns.mean():.1f} "
        f"median: {float(np.median(returns)):.1f} stdev: {returns.std():.1f}"
    )
    return True


def save_train_state_if_requested(train_state, save_dir: Optional[str]) -> Optional[str]:
    if not save_dir:
        return None
    import jax

    from pfrl_tpu.replay.persistent import save_state

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, _STATE_FILE)
    save_state(jax.device_get(train_state), path)
    print(f"saved train_state to {path}")
    return path
