"""Tests for small host-side utils (reference: pfrl/utils/ misc modules)."""

import numpy as np

from pfrl_tpu.utils import (
    AverageRewardFilter,
    NormalizedRewardFilter,
    is_return_code_zero,
    set_temporarily,
)
from pfrl_tpu.utils.env_modifiers import (
    make_action_repeated,
    make_reward_clipped,
    make_reward_filtered,
    make_timestep_limited,
)


class _FakeEnv:
    def __init__(self):
        self.t = 0

    def reset(self):
        self.t = 0
        return 0

    def step(self, action):
        self.t += 1
        return self.t, 10.0, False, {}

    def close(self):
        pass


def test_average_reward_filter_centers():
    f = AverageRewardFilter(tau=0.5)
    outs = [f(1.0) for _ in range(50)]
    # EMA converges toward 1.0, so the filtered reward decays toward 0.
    assert abs(outs[-1]) < 1e-3 < abs(outs[0])


def test_normalized_reward_filter_finite_and_scaled():
    rng = np.random.RandomState(0)
    f = NormalizedRewardFilter(tau=0.1, scale=2.0)
    outs = [f(float(r)) for r in rng.randn(200)]
    assert np.isfinite(outs).all()


def test_set_temporarily_restores():
    class Obj:
        x = 1

    o = Obj()
    with set_temporarily(o, "x", 5):
        assert o.x == 5
    assert o.x == 1
    try:
        with set_temporarily(o, "x", 7):
            raise RuntimeError
    except RuntimeError:
        pass
    assert o.x == 1


def test_is_return_code_zero():
    assert is_return_code_zero(["true"])
    assert not is_return_code_zero(["false"])
    assert not is_return_code_zero(["definitely-not-a-command-xyz"])


def test_make_timestep_limited():
    env = _FakeEnv()
    make_timestep_limited(env, 3)
    env.reset()
    dones = [env.step(0)[2] for _ in range(4)]
    assert dones == [False, False, True, True]
    env.reset()
    assert env.step(0)[2] is False


def test_make_reward_filtered_and_clipped():
    env = _FakeEnv()
    make_reward_filtered(env, lambda r: r * 0.1)
    assert env.step(0)[1] == 1.0
    env2 = _FakeEnv()
    make_reward_clipped(env2, -1.0, 1.0)
    assert env2.step(0)[1] == 1.0


def test_make_action_repeated():
    """Rewards accumulate across the repeats; latest obs is returned
    (reference env_modifiers.py make_action_repeated)."""
    env = _FakeEnv()
    make_action_repeated(env, 4)
    obs, reward, done, _ = env.step(0)
    assert obs == 4 and reward == 40.0 and not done


class TestMonitorVideo:
    """Monitor video recording parity (pfrl/wrappers/monitor.py:22-30) via
    the dependency-free MJPEG AVI writer."""

    class FakeRenderEnv:
        observation_space = None
        action_space = None

        def __init__(self):
            import numpy as np

            self._rng = np.random.RandomState(0)
            self.t = 0

        def reset(self):
            self.t = 0
            return 0.0

        def step(self, action):
            self.t += 1
            return 0.0, 1.0, self.t >= 5, {}

        def render(self, mode="rgb_array"):
            import numpy as np

            frame = np.zeros((32, 48, 3), np.uint8)
            frame[:, : 8 * (self.t + 1)] = (255, 0, 0)
            return frame

        def close(self):
            pass

    def test_records_video_and_stats(self, tmp_path):
        import numpy as np

        from pfrl_tpu.wrappers import Monitor
        from pfrl_tpu.wrappers.video import read_mjpeg_frames

        env = Monitor(
            self.FakeRenderEnv(), str(tmp_path), video_callable=lambda ep: True
        )
        for _ in range(2):
            env.reset()
            done = False
            while not done:
                _, _, done, _ = env.step(0)
        env.close()

        videos = sorted(p for p in tmp_path.iterdir() if p.suffix == ".avi")
        assert len(videos) == 2
        frames = read_mjpeg_frames(str(videos[0]))
        assert len(frames) == 6  # initial frame + 5 steps
        assert frames[0].shape == (32, 48, 3)
        # JPEG is lossy; the red bar must still dominate the first columns.
        assert frames[-1][:, :30, 0].mean() > 200
        stats = (tmp_path / "monitor.csv").read_text().splitlines()
        assert stats[0] == "r,l,t" and len(stats) == 3

    def test_schedule_and_disable(self, tmp_path):
        from pfrl_tpu.wrappers import Monitor
        from pfrl_tpu.wrappers.monitor import capped_cubic_video_schedule

        assert [e for e in range(30) if capped_cubic_video_schedule(e)] == [
            0, 1, 8, 27,
        ]
        env = Monitor(self.FakeRenderEnv(), str(tmp_path), video_callable=False)
        env.reset()
        for _ in range(5):
            env.step(0)
        env.close()
        assert not [p for p in tmp_path.iterdir() if p.suffix == ".avi"]


class TestDemoCli:
    def test_resolve_train_state_path(self, tmp_path):
        from pfrl_tpu.experiments.demo_cli import resolve_train_state_path

        direct = tmp_path / "train_state.msgpack"
        direct.write_bytes(b"x")
        # A file path passes through; a directory resolves its file; a zoo
        # entry resolves best/train_state.msgpack.
        assert resolve_train_state_path(str(direct)) == str(direct)
        assert resolve_train_state_path(str(tmp_path)) == str(direct)
        zoo = tmp_path / "zooentry"
        (zoo / "best").mkdir(parents=True)
        f = zoo / "best" / "train_state.msgpack"
        f.write_bytes(b"x")
        assert resolve_train_state_path(str(zoo)) == str(f)
        import pytest as _pytest

        empty = tmp_path / "empty_dir"
        empty.mkdir()
        with _pytest.raises(FileNotFoundError):
            resolve_train_state_path(str(empty))
        # A non-directory path passes through untouched (existence is the
        # loader's problem, matching open() semantics).
        assert resolve_train_state_path("nope.msgpack") == "nope.msgpack"

    def test_save_and_load_round_trip(self, tmp_path):
        import numpy as np

        import jax

        from pfrl_tpu.experiments.demo_cli import (
            maybe_load_train_state,
            save_train_state_if_requested,
        )

        class Box:
            def __init__(self, train_state):
                self.train_state = train_state

            def replace(self, train_state):
                return Box(train_state)

        ts = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
        path = save_train_state_if_requested(ts, str(tmp_path / "ck"))
        assert path and path.endswith("train_state.msgpack")
        template = Box({"w": np.zeros((2, 3), np.float32)})
        loaded = maybe_load_train_state(template, str(tmp_path / "ck"))
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(loaded.train_state["w"])), ts["w"]
        )
        # No-op without a path.
        assert maybe_load_train_state(template, None) is template


def test_testing_helpers_accept_jax_and_trees():
    """pfrl/testing.py parity: allclose over arrays, nested lists, and
    flax-style param trees."""
    import numpy as np
    import pytest

    import jax.numpy as jnp

    from pfrl_tpu.testing import jax_assert_allclose, tree_assert_allclose

    jax_assert_allclose(jnp.ones(3), np.ones(3))
    jax_assert_allclose([jnp.zeros(2), jnp.ones(2)], [np.zeros(2), np.ones(2)])
    tree_assert_allclose(
        {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)},
        {"w": np.ones((2, 2)), "b": np.zeros(2)},
    )
    with pytest.raises(AssertionError):
        jax_assert_allclose(jnp.ones(3), np.zeros(3))


def test_bound_by_tanh():
    """Reference parity (pfrl/functions/bound_by_tanh.py): range hits
    [low, high] exactly in the tails, stays differentiable, broadcasts
    per-dimension bounds."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pfrl_tpu.functions import bound_by_tanh

    x = jnp.linspace(-10.0, 10.0, 7)
    y = bound_by_tanh(x, -2.0, 4.0)
    assert float(y.min()) >= -2.0 and float(y.max()) <= 4.0
    np.testing.assert_allclose(float(y[0]), -2.0, atol=1e-3)
    np.testing.assert_allclose(float(y[-1]), 4.0, atol=1e-3)
    np.testing.assert_allclose(float(bound_by_tanh(jnp.zeros(()), -2.0, 4.0)), 1.0)
    # Per-dim bounds broadcast.
    y2 = bound_by_tanh(jnp.zeros((2, 2)), np.array([-1.0, 0.0]), np.array([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(y2), [[0.0, 1.0], [0.0, 1.0]])
    g = jax.grad(lambda v: bound_by_tanh(v, -1.0, 1.0))(0.0)
    np.testing.assert_allclose(float(g), 1.0)


def test_evaluating_flips_training_flag():
    from pfrl_tpu.utils import evaluating

    class Agent:
        training = True

    a = Agent()
    with evaluating(a) as inner:
        assert inner is a
        assert a.training is False
    assert a.training is True
