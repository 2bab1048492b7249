"""Atari wrapper behavior tests with a scripted fake ALE (reference:
tests/wrappers_tests/test_atari_wrappers.py). No emulator needed — a fake
env exposes the minimal `.unwrapped.ale` / action-meanings surface."""

import numpy as np
import pytest

from pfrl_tpu.wrappers.atari_wrappers import (
    ClipRewardEnv,
    EpisodicLifeEnv,
    FlickerFrame,
    FrameStack,
    LazyFrames,
    MaxAndSkipEnv,
    NoopResetEnv,
    ScaledFloatFrame,
)


class _FakeALE:
    def __init__(self, parent):
        self.parent = parent

    def lives(self):
        return self.parent.lives


class _NPRandom:
    def __init__(self, value):
        self.value = value

    def integers(self, lo, hi):
        return self.value


class FakeAtari:
    """Frames carry the step index; rewards follow a script."""

    class _Space:
        shape = (8, 8, 3)

    observation_space = _Space()
    action_space = None

    def __init__(self, rewards=None, lives_script=None):
        self.t = 0
        self.rewards = rewards or {}
        self.lives_script = lives_script or {}
        self.lives = 3
        self.reset_count = 0
        self.actions = []
        self.unwrapped = self
        self.ale = _FakeALE(self)
        self.np_random = _NPRandom(3)

    def get_action_meanings(self):
        return ["NOOP", "FIRE", "RIGHT", "LEFT"]

    def _frame(self):
        return np.full((8, 8, 3), self.t % 256, np.uint8)

    def reset(self, **kwargs):
        self.reset_count += 1
        self.t = 0
        self.lives = 3
        return self._frame()

    def step(self, action):
        self.t += 1
        self.actions.append(action)
        if self.t in self.lives_script:
            self.lives = self.lives_script[self.t]
        r = self.rewards.get(self.t, 0.0)
        return self._frame(), r, False, {}

    def close(self):
        pass


def test_noop_reset_applies_noops():
    env = FakeAtari()
    w = NoopResetEnv(env, noop_max=30)
    obs = w.reset()
    # np_random.integers returns 3 -> 3 NOOP steps after reset.
    assert env.actions == [0, 0, 0]
    assert obs[0, 0, 0] == 3


def test_episodic_life_marks_done_on_life_loss_without_reset():
    env = FakeAtari(lives_script={2: 2})
    w = EpisodicLifeEnv(env)
    w.reset()
    _, _, done, _ = w.step(1)
    assert not done
    _, _, done, _ = w.step(1)
    assert done  # life lost
    resets_before = env.reset_count
    w.reset()
    # No true game over -> no real ALE reset, just a NOOP step.
    assert env.reset_count == resets_before
    assert env.actions[-1] == 0


def test_max_and_skip_repeats_and_maxes():
    env = FakeAtari(rewards={1: 1.0, 2: 1.0, 3: 1.0, 4: 1.0})
    w = MaxAndSkipEnv(env, skip=4)
    w.reset()
    obs, r, done, _ = w.step(5)
    assert env.actions == [5, 5, 5, 5]
    assert r == 4.0  # rewards summed over the skip
    # Max over the LAST TWO raw frames: t=3 and t=4 -> 4.
    assert obs[0, 0, 0] == 4


def test_clip_reward_sign():
    env = FakeAtari(rewards={1: 7.5, 2: -3.0, 3: 0.0})
    w = ClipRewardEnv(env)
    w.reset()
    assert w.step(0)[1] == 1.0
    assert w.step(0)[1] == -1.0
    assert w.step(0)[1] == 0.0


def test_frame_stack_lazy_and_shapes():
    env = FakeAtari()
    w = FrameStack(env, 4, channel_order="hwc")
    obs = w.reset()
    assert isinstance(obs, LazyFrames)
    arr = np.asarray(obs)
    assert arr.shape == (8, 8, 12)  # 4 frames stacked along channels
    obs, _, _, _ = w.step(0)
    arr = np.asarray(obs)
    # Newest frame (t=1) occupies the last channel block.
    assert arr[0, 0, -1] == 1
    assert arr[0, 0, 0] == 0


def test_scaled_float_frame():
    env = FakeAtari()
    w = ScaledFloatFrame(env)
    w.reset()
    obs, _, _, _ = w.step(0)
    assert obs.dtype == np.float32
    np.testing.assert_allclose(obs[0, 0, 0], 1 / 255.0)


def test_flicker_frame_blanks_about_half():
    env = FakeAtari()
    w = FlickerFrame(env)
    w._rng = np.random.RandomState(0)
    w.reset()
    blanks = 0
    for i in range(200):
        obs, _, _, _ = w.step(0)
        if obs.max() == 0 and (i + 1) % 256 != 0:
            blanks += 1
    assert 60 < blanks < 140  # ~Binomial(200, 0.5), 5-sigma bounds
