"""Tests for small host-side utils (reference: pfrl/utils/ misc modules)."""

import numpy as np

from pfrl_tpu.utils import (
    AverageRewardFilter,
    NormalizedRewardFilter,
    is_return_code_zero,
    set_temporarily,
)
from pfrl_tpu.utils.env_modifiers import (
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
