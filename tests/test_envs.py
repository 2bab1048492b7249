"""Pure-JAX env tests (mirrors tests/envs_tests strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pfrl_tpu.envs import (
    ABC,
    CartPole,
    MountainCarContinuous,
    Pendulum,
    TimeLimit,
    VectorJaxEnv,
)


class TestABC:
    def test_optimal_policy_reaches_goal(self, rng):
        env = ABC(size=3, episodic=True)
        state, obs = env.reset(rng)
        total_r = 0.0
        for a in range(3):
            np.testing.assert_allclose(np.argmax(np.asarray(obs)), a)
            state, ts = env.step(rng, state, jnp.asarray(a))
            obs = ts.obs
            total_r += float(ts.reward)
        assert total_r == 1.0
        assert bool(ts.terminated)

    def test_wrong_action_terminates(self, rng):
        env = ABC(size=3, episodic=True)
        state, obs = env.reset(rng)
        state, ts = env.step(rng, state, jnp.asarray(2))
        assert bool(ts.terminated)
        assert float(ts.reward) == 0.0

    def test_non_episodic_loops(self, rng):
        env = ABC(size=2, episodic=False)
        state, obs = env.reset(rng)
        for a in [0, 1, 0, 1]:
            state, ts = env.step(rng, state, jnp.asarray(a))
            assert not bool(ts.terminated)
        # Two full traversals -> reward on actions 1 (twice).

    def test_continuous_deterministic(self, rng):
        env = ABC(size=2, discrete=False, deterministic=True)
        state, obs = env.reset(rng)
        a = jnp.asarray([1.0, -1.0])  # argmax -> inner action 0
        state, ts = env.step(rng, state, a)
        assert not bool(ts.terminated)
        assert int(state.s) == 1

    def test_partially_observable_offset(self):
        env = ABC(size=2, partially_observable=True, deterministic=True)
        rng = jax.random.PRNGKey(0)
        state, obs = env.reset(rng)
        # Deterministic PO: first episode offset = 1 -> shifted one-hot.
        assert int(np.argmax(np.asarray(obs))) == int(state.offset)


class TestCartPole:
    def test_episode_runs_and_terminates(self, rng):
        env = TimeLimit(CartPole())
        state, obs = env.reset(rng)
        assert obs.shape == (4,)
        done = False
        steps = 0
        while not done and steps < 600:
            state, ts = env.step(rng, state, jnp.asarray(steps % 2))
            done = bool(ts.terminated | ts.truncated)
            steps += 1
        assert done
        assert steps < 600

    def test_truncation_at_limit(self, rng):
        env = TimeLimit(CartPole(), max_steps=5)
        state, obs = env.reset(rng)
        for i in range(5):
            # Alternate actions to stay alive 5 steps.
            state, ts = env.step(rng, state, jnp.asarray(i % 2))
        assert bool(ts.truncated)
        assert not bool(ts.terminated)


class TestPendulum:
    def test_reward_range(self, rng):
        env = Pendulum()
        state, obs = env.reset(rng)
        state, ts = env.step(rng, state, jnp.asarray([0.0]))
        assert obs.shape == (3,)
        assert float(ts.reward) <= 0.0


class TestVectorJaxEnv:
    def test_autoreset_keeps_lanes_running(self, rng):
        env = VectorJaxEnv(TimeLimit(CartPole(), max_steps=3), 4)
        states, obs = env.reset(rng)
        assert obs.shape == (4, 4)
        step = jax.jit(env.step)
        for i in range(3):
            rng, sub = jax.random.split(rng)
            states, vec = step(sub, states, jnp.zeros((4,), jnp.int32))
        # All four lanes hit the 3-step limit -> auto-reset happened;
        # post-reset obs differ from the pre-reset terminal obs.
        assert bool(jnp.all(vec.ts.done))
        assert not np.allclose(np.asarray(vec.obs), np.asarray(vec.ts.obs))
        # TimeLimit counter restarted: stepping again does not truncate.
        rng, sub = jax.random.split(rng)
        states, vec = step(sub, states, jnp.zeros((4,), jnp.int32))
        assert not bool(jnp.any(vec.ts.truncated))

    def test_terminal_obs_is_pre_reset(self, rng):
        env = VectorJaxEnv(ABC(size=2), 2)
        states, obs = env.reset(rng)
        # Wrong action everywhere -> terminate; ts.obs should be terminal
        # one-hot (index = size), while vec.obs is the reset obs (index 0).
        states, vec = env.step(rng, states, jnp.asarray([1, 1]))
        assert bool(jnp.all(vec.ts.terminated))
        np.testing.assert_allclose(np.argmax(np.asarray(vec.ts.obs), axis=1), 2)
        np.testing.assert_allclose(np.argmax(np.asarray(vec.obs), axis=1), 0)


def test_atari_frame_stack_shapes():
    """wrap_deepmind output shape parity: (84,84,4) hwc / (4,84,84) chw
    (LazyFrames must concatenate along the singleton channel axis,
    reference atari_wrappers.py:251-272)."""
    import numpy as np

    from pfrl_tpu.envs.synthetic_ale import make_warped_stacked

    env = make_warped_stacked(0)
    obs = np.asarray(env.reset())
    assert obs.shape == (84, 84, 4) and obs.dtype == np.uint8
    o2, _, _, _ = env.step(0)
    assert np.asarray(o2).shape == (84, 84, 4)


class TestDelayedCue:
    def test_cue_reveal_and_reward_timing(self):
        """The cue channel is nonzero ONLY at reveal_step and the +/-1
        reward arrives ONLY on the final step (the properties the
        subsequence-replay A/B proof depends on)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pfrl_tpu.envs import DelayedCue

        env = DelayedCue(episode_len=6, reveal_step=3)
        for key in (0, 1, 2, 7):
            state, obs = env.reset(jax.random.PRNGKey(key))
            cue = int(state.cue)
            for t in range(6):
                # Phase one-hot + cue channel shape.
                assert obs.shape == (7,)
                np.testing.assert_allclose(np.asarray(obs[:6]).argmax(), t)
                if t == 3:
                    assert float(obs[6]) == 2.0 * cue - 1.0
                else:
                    assert float(obs[6]) == 0.0
                action = jnp.asarray(cue if t == 5 else 1 - cue, jnp.int32)
                state, ts = env.step(jax.random.PRNGKey(0), state, action)
                obs = ts.obs
                if t < 5:
                    assert float(ts.reward) == 0.0 and not bool(ts.terminated)
                else:
                    assert float(ts.reward) == 1.0 and bool(ts.terminated)
        # Wrong final action is penalized.
        state, obs = env.reset(jax.random.PRNGKey(3))
        cue = int(state.cue)
        for t in range(5):
            state, ts = env.step(jax.random.PRNGKey(0), state, jnp.asarray(0))
        state, ts = env.step(jax.random.PRNGKey(0), state, jnp.asarray(1 - cue))
        assert float(ts.reward) == -1.0 and bool(ts.terminated)
