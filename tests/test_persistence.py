"""Persistence: collections round-trips, buffer snapshots, crash recovery."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax.core import FrozenDict

from pfrl_tpu.collections_ import PersistentRandomAccessQueue, RandomAccessQueue
from pfrl_tpu.replay import (
    PersistentReplayBuffer,
    ReplayBuffer,
    Transition,
    load_state,
    save_state,
)


class TestRandomAccessQueue:
    def test_fifo_and_indexing(self):
        q = RandomAccessQueue(maxlen=5)
        for i in range(8):
            q.append(i)
        assert len(q) == 5
        assert list(q) == [3, 4, 5, 6, 7]
        assert q[0] == 3 and q[-1] == 7
        assert q.popleft() == 3
        assert list(q) == [4, 5, 6, 7]

    def test_sample(self):
        q = RandomAccessQueue(range(100))
        s = q.sample(10)
        assert len(set(s)) == 10

    def test_setitem(self):
        q = RandomAccessQueue([1, 2, 3])
        q.popleft()
        q.append(4)
        q[0] = 99
        assert list(q) == [99, 3, 4]


class TestPersistentQueue:
    def test_resume(self, tmp_path):
        d = str(tmp_path / "q")
        q = PersistentRandomAccessQueue(d)
        for i in range(20):
            q.append({"x": i})
        q.close()
        q2 = PersistentRandomAccessQueue(d)
        assert len(q2) == 20
        assert q2[7] == {"x": 7}

    def test_resume_with_maxlen(self, tmp_path):
        d = str(tmp_path / "q")
        q = PersistentRandomAccessQueue(d)
        for i in range(30):
            q.append(i)
        q.close()
        q2 = PersistentRandomAccessQueue(d, maxlen=10)
        assert list(q2._memory) == list(range(20, 30))

    def test_torn_write_recovery(self, tmp_path):
        d = str(tmp_path / "q")
        q = PersistentRandomAccessQueue(d)
        for i in range(5):
            q.append(i)
        q.flush()
        # Corrupt the tail of the data file (simulated crash mid-write).
        with open(q._writer.data_path, "r+b") as f:
            f.seek(-2, os.SEEK_END)
            f.write(b"XX")
        q.close()
        q2 = PersistentRandomAccessQueue(d)
        assert list(q2._memory) == [0, 1, 2, 3]  # last record dropped


def _tr(i):
    return Transition(
        obs=jnp.full((3,), float(i)),
        action=jnp.asarray(i, jnp.int32),
        reward=jnp.asarray(float(i)),
        next_obs=jnp.full((3,), float(i + 1)),
        terminated=jnp.asarray(False),
        done=jnp.asarray(False),
        extras=FrozenDict(),
    )


class TestBufferSnapshots:
    def test_save_load_roundtrip(self, tmp_path):
        buf = ReplayBuffer(16, num_lanes=1)
        state = buf.init(_tr(0))
        for i in range(5):
            state = buf.add(state, jax.tree.map(lambda x: x[None], _tr(i)))
        path = str(tmp_path / "snap.msgpack")
        save_state(state, path)
        restored = load_state(buf.init(_tr(0)), path)
        assert int(restored.cursor) == 5
        np.testing.assert_allclose(
            np.asarray(restored.storage.reward)[:5], np.arange(5)
        )

    def test_persistent_buffer_restore(self, tmp_path):
        d = str(tmp_path / "buf")
        buf = PersistentReplayBuffer(d, 16, snapshot_interval=2, num_lanes=1)
        state = buf.init(_tr(0))
        for i in range(6):
            state = buf.add(state, jax.tree.map(lambda x: x[None], _tr(i)))
        # A new buffer object resumes from the snapshot.
        buf2 = PersistentReplayBuffer(d, 16, snapshot_interval=2, num_lanes=1)
        restored = buf2.restore(_tr(0))
        assert restored is not None
        assert int(restored.cursor) == 6
