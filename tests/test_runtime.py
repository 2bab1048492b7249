"""Native runtime (C++ frame ops) tests.

The C++ library and the numpy fallback implement the same semantics
(gray = round(luma), out = round(fractional box average)); the numpy path
is the oracle. Also covers the WarpFrame wrapper end-to-end without cv2
(the reference requires cv2, pfrl/wrappers/atari_wrappers.py:159-183).
"""

import numpy as np
import pytest

from pfrl_tpu import runtime


def _rand_frames(n, h, w, c=None, seed=0):
    rng = np.random.RandomState(seed)
    shape = (n, h, w) if c is None else (n, h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


def test_native_builds_and_loads():
    assert runtime.native_available(), "g++ is in this image; build must work"


def test_warp_rgb_matches_numpy_oracle():
    frames = _rand_frames(4, 210, 160, 3)
    out_native = runtime.warp_frames(frames)
    out_numpy = runtime.warp_frames(frames, _force_numpy=True)
    assert out_native.shape == (4, 84, 84)
    assert out_native.dtype == np.uint8
    # Rounding of float32 accumulations may differ by 1 ulp at .5 boundaries.
    diff = np.abs(out_native.astype(int) - out_numpy.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.01


def test_warp_gray_matches_numpy_oracle():
    frames = _rand_frames(3, 210, 160)
    out_native = runtime.warp_frames(frames)
    out_numpy = runtime.warp_frames(frames, _force_numpy=True)
    diff = np.abs(out_native.astype(int) - out_numpy.astype(int))
    assert diff.max() <= 1


def test_warp_constant_frame_is_constant():
    for v in (0, 17, 255):
        frames = np.full((1, 210, 160, 3), v, np.uint8)
        out = runtime.warp_frames(frames)
        assert (out == v).all()


def test_warp_preserves_mean_area_average():
    """Area averaging preserves the global mean (up to rounding)."""
    frames = _rand_frames(2, 210, 160)
    out = runtime.warp_frames(frames)
    for i in range(2):
        assert abs(float(out[i].mean()) - float(frames[i].mean())) < 1.0


def test_warp_integer_downscale_is_box_mean():
    """For integer scale factors the area average is the plain box mean."""
    frames = _rand_frames(1, 168, 168)
    out = runtime.warp_frames(frames, 84, 84)
    boxes = frames[0].reshape(84, 2, 84, 2).astype(np.float32).mean(axis=(1, 3))
    expected = np.floor(boxes + 0.5).astype(np.uint8)
    assert np.abs(out[0].astype(int) - expected.astype(int)).max() <= 1


def test_frame_max():
    a = _rand_frames(1, 16, 16)[0]
    b = _rand_frames(1, 16, 16, seed=1)[0]
    assert (runtime.frame_max(a, b) == np.maximum(a, b)).all()


def test_warp_rejects_single_rgb_frame():
    with pytest.raises(ValueError):
        runtime.warp_frames(np.zeros((210, 160, 3), np.uint8))


def test_warpframe_wrapper_without_cv2():
    from pfrl_tpu.wrappers.atari_wrappers import WarpFrame

    class FakeAtari:
        class observation_space:
            shape = (210, 160, 3)

        class action_space:
            n = 4

        def reset(self, **kw):
            return np.zeros((210, 160, 3), np.uint8)

        def step(self, action):
            return np.full((210, 160, 3), 128, np.uint8), 1.0, False, {}

        def close(self):
            pass

    env = WarpFrame(FakeAtari(), channel_order="hwc")
    obs = env.reset()
    assert obs.shape == (84, 84, 1)
    obs, r, done, info = env.step(0)
    assert obs.shape == (84, 84, 1)
    assert (obs == 128).all()


def test_warp_throughput_smoke():
    """Native path should chew a 64-env batch quickly (smoke, not a bench)."""
    frames = _rand_frames(64, 210, 160, 3)
    out = runtime.warp_frames(frames)
    assert out.shape == (64, 84, 84)
