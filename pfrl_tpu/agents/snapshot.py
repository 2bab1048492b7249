"""Full training-state snapshots for resumable runs.

Reference parity: pfrl/agents/dqn.py:794-810 (save_snapshot/load_snapshot:
model+optimizer state_dicts plus ``t``, cumulative steps, and the pickled
replay buffer). Here a snapshot is two msgpack files (train/replay pytrees)
plus a small json of host counters — everything needed to resume schedules
(the reference's ``step_offset`` machinery, train_agent.py:46-48).
"""

import json
import os
from typing import Any

from pfrl_tpu.replay.persistent import load_state, save_state


def save_snapshot(agent: Any, dirname: str) -> None:
    """Snapshot a shell agent (DQN/actor-critic family)."""
    os.makedirs(dirname, exist_ok=True)
    save_state(agent.train_state, os.path.join(dirname, "train_state.msgpack"))
    if getattr(agent, "replay_state", None) is not None:
        save_state(
            agent.replay_state, os.path.join(dirname, "replay_state.msgpack")
        )
    meta = {"t": agent.t}
    with open(os.path.join(dirname, "snapshot_meta.json"), "w") as f:
        json.dump(meta, f)


def load_snapshot(agent: Any, dirname: str) -> None:
    """Restore a snapshot saved by :func:`save_snapshot`.

    The agent must already be initialized (first act/observe done) so the
    pytree templates exist — matching the reference's requirement that the
    model be constructed before load.
    """
    agent.train_state = load_state(
        agent.train_state, os.path.join(dirname, "train_state.msgpack")
    )
    replay_path = os.path.join(dirname, "replay_state.msgpack")
    if os.path.exists(replay_path) and agent.replay_state is not None:
        agent.replay_state = load_state(agent.replay_state, replay_path)
    with open(os.path.join(dirname, "snapshot_meta.json")) as f:
        meta = json.load(f)
    agent.t = int(meta["t"])


def save_runner_snapshot(runner_state: Any, dirname: str) -> None:
    """Snapshot a full on-device RunnerState (env + agent + replay + rng)."""
    os.makedirs(dirname, exist_ok=True)
    save_state(runner_state, os.path.join(dirname, "runner_state.msgpack"))


def load_runner_snapshot(template: Any, dirname: str) -> Any:
    return load_state(
        template, os.path.join(dirname, "runner_state.msgpack")
    )
