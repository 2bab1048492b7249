"""Space-spec tests (pfrl_tpu/spaces.py — the gym-free space metadata)."""

import numpy as np
import pytest

from pfrl_tpu.spaces import Box, Discrete, box, from_gym_space


def test_discrete_contains_and_sample(np_random):
    d = Discrete(4)
    assert d.shape == ()
    assert d.contains(0) and d.contains(3)
    assert not d.contains(4) and not d.contains(-1)
    for _ in range(20):
        assert d.contains(d.sample(np_random))


def test_box_builder_and_contains(np_random):
    b = box(-1.0, 1.0, shape=(3,))
    assert b.shape == (3,)
    assert b.contains(np.zeros(3))
    assert not b.contains(np.full(3, 2.0))
    assert not b.contains(np.zeros(2))  # wrong shape
    for _ in range(20):
        s = b.sample(np_random)
        assert b.contains(s) and s.dtype == np.float32


def test_box_infinite_bounds_sample_finite(np_random):
    b = Box(low=np.full(2, -np.inf), high=np.full(2, np.inf))
    s = b.sample(np_random)
    assert np.all(np.isfinite(s))


def test_from_gym_space_duck_typed():
    class GymDiscrete:
        n = 5

    class GymBox:
        low = np.zeros(2)
        high = np.ones(2)

    GymDiscrete.__name__ = "Discrete"
    GymBox.__name__ = "Box"
    d = from_gym_space(GymDiscrete())
    assert isinstance(d, Discrete) and d.n == 5
    b = from_gym_space(GymBox())
    assert isinstance(b, Box) and b.shape == (2,)
    with pytest.raises(NotImplementedError):
        from_gym_space(object())
