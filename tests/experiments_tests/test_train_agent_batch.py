"""Batch training-driver tests with mocked agents and scripted vector envs.

Mirror of the reference's tests/experiments_tests/test_train_agent_batch.py:
verifies the vector hot loop's bookkeeping — batch_act/batch_observe
cadence, masked resets (only finished lanes reset), per-lane episode
accounting, step counting in transitions — with no learning.
"""

import os
from unittest import mock

import numpy as np
import pytest

from pfrl_tpu.env import VectorEnv
from pfrl_tpu.experiments import train_agent_batch


class ScriptedVectorEnv(VectorEnv):
    """Lane i finishes its episodes every ``ep_lens[i]`` steps."""

    def __init__(self, ep_lens):
        self.ep_lens = list(ep_lens)
        self._num_envs = len(self.ep_lens)
        self.lane_t = np.zeros(self._num_envs, int)
        self.reset_masks = []  # record of mask arguments
        self.closed = False

    @property
    def num_envs(self):
        return self._num_envs

    def reset(self, mask=None):
        if mask is None:
            self.reset_masks.append(None)
            self.lane_t[:] = 0
        else:
            mask = np.asarray(mask)
            self.reset_masks.append(mask.copy())
            # mask semantics: 1/True = still running (do NOT reset)
            self.lane_t[~mask] = 0
        return np.zeros(self._num_envs)

    def step(self, actions):
        assert len(actions) == self._num_envs
        self.lane_t += 1
        dones = self.lane_t >= np.asarray(self.ep_lens)
        self.lane_t[dones] = 0
        obs = np.zeros(self._num_envs)
        rewards = np.ones(self._num_envs)
        infos = [{} for _ in range(self._num_envs)]
        return obs, rewards, dones.copy(), infos

    def seed(self, seeds=None):
        pass

    def close(self):
        self.closed = True


def make_mock_batch_agent():
    agent = mock.Mock()
    agent.batch_act.side_effect = lambda obss: np.zeros(len(obss), int)
    agent.get_statistics.return_value = []
    return agent


def test_batch_cadence_and_step_counting(tmp_path):
    agent = make_mock_batch_agent()
    env = ScriptedVectorEnv([3, 5])
    train_agent_batch(agent, env, steps=20, outdir=str(tmp_path))
    # t advances num_envs per vector step: 10 vector steps for 20.
    assert agent.batch_act.call_count == 10
    assert agent.batch_observe.call_count == 10
    agent.save.assert_called_with(os.path.join(str(tmp_path), "20_finish"))


def test_masked_reset_only_finished_lanes(tmp_path):
    agent = make_mock_batch_agent()
    env = ScriptedVectorEnv([2, 3])
    train_agent_batch(agent, env, steps=12, outdir=str(tmp_path))
    # First reset() is unmasked (loop start), then one mask per vector step.
    assert env.reset_masks[0] is None
    masks = env.reset_masks[1:]
    assert len(masks) == 6
    # Lane 0 ends on steps 2,4,6 (mask False = reset); lane 1 on 3,6.
    expected_lane0 = [True, False, True, False, True, False]
    expected_lane1 = [True, True, False, True, True, False]
    assert [bool(m[0]) for m in masks] == expected_lane0
    assert [bool(m[1]) for m in masks] == expected_lane1


def test_max_episode_len_resets_lanes(tmp_path):
    agent = make_mock_batch_agent()
    env = ScriptedVectorEnv([1000, 1000])
    train_agent_batch(
        agent, env, steps=12, outdir=str(tmp_path), max_episode_len=2
    )
    # Every lane truncates every 2 vector steps: resets arg to batch_observe.
    resets = [c.args[3] for c in agent.batch_observe.call_args_list]
    assert [bool(r[0]) for r in resets] == [False, True] * 3


def test_crash_saves_and_closes_env(tmp_path):
    agent = make_mock_batch_agent()
    agent.batch_observe.side_effect = [None, RuntimeError("boom")]
    env = ScriptedVectorEnv([3, 3])
    with pytest.raises(RuntimeError, match="boom"):
        train_agent_batch(agent, env, steps=100, outdir=str(tmp_path))
    # t increments AFTER batch_observe, so the crash in vector step 2 saves
    # at t=2 (reference order, train_agent_batch.py:67-100).
    agent.save.assert_called_once_with(os.path.join(str(tmp_path), "2_except"))
    assert env.closed


def test_step_hooks_and_checkpoint_freq(tmp_path):
    agent = make_mock_batch_agent()
    env = ScriptedVectorEnv([3, 3])
    hook = mock.Mock()
    train_agent_batch(
        agent,
        env,
        steps=12,
        outdir=str(tmp_path),
        step_hooks=[hook],
        checkpoint_freq=6,
    )
    assert hook.call_count == 6
    assert [c.args[2] for c in hook.call_args_list] == [2, 4, 6, 8, 10, 12]
    saved = [c.args[0] for c in agent.save.call_args_list]
    assert os.path.join(str(tmp_path), "6_checkpoint") in saved
    assert os.path.join(str(tmp_path), "12_checkpoint") in saved
