"""Serial training-driver tests with mocked agents and scripted envs.

Mirror of the reference's driver test strategy (SURVEY.md §4.3;
tests/experiments_tests/test_train_agent.py:15-50): the multi-step driver
bookkeeping — act/observe cadence, done-vs-reset semantics, episode
accounting, checkpointing, crash-save, hooks — is verified without any
real learning.
"""

import os
from unittest import mock

import pytest

from pfrl_tpu.experiments import train_agent, train_agent_with_evaluation


class ScriptedEnv:
    """Episodes end (done=True) every ``ep_len`` steps; obs is the global
    step count so call ordering is checkable."""

    def __init__(self, ep_len=3, needs_reset_at=None):
        self.ep_len = ep_len
        self.needs_reset_at = needs_reset_at or set()
        self.t = 0
        self.episode_t = 0
        self.reset_calls = 0

    def reset(self):
        self.reset_calls += 1
        self.episode_t = 0
        return self.t

    def step(self, action):
        self.t += 1
        self.episode_t += 1
        done = self.episode_t >= self.ep_len
        info = {"needs_reset": self.t in self.needs_reset_at}
        if done:
            self.episode_t = 0
        return self.t, 1.0, done, info


def make_mock_agent():
    agent = mock.Mock()
    agent.act.return_value = 0
    agent.get_statistics.return_value = []
    return agent


def test_act_observe_cadence_and_finish_save(tmp_path):
    agent = make_mock_agent()
    env = ScriptedEnv(ep_len=3)
    train_agent(agent, env, steps=10, outdir=str(tmp_path))
    assert agent.act.call_count == 10
    assert agent.observe.call_count == 10
    # done=True on steps 3, 6, 9 (scripted episode ends).
    dones = [c.args[2] for c in agent.observe.call_args_list]
    assert dones == [False, False, True] * 3 + [False]
    # Final save: <t>_finish.
    agent.save.assert_called_with(os.path.join(str(tmp_path), "10_finish"))
    # env.reset on start + after each completed episode.
    assert env.reset_calls == 4


def test_max_episode_len_sets_reset_not_done(tmp_path):
    """Timeout truncation surfaces as reset=True with done=False — the
    agent must bootstrap through it (ContinuingTimeLimit semantics,
    pfrl/wrappers/continuing_time_limit.py:4-41)."""
    agent = make_mock_agent()
    env = ScriptedEnv(ep_len=1000)
    train_agent(agent, env, steps=6, outdir=str(tmp_path), max_episode_len=2)
    resets = [c.args[3] for c in agent.observe.call_args_list]
    dones = [c.args[2] for c in agent.observe.call_args_list]
    assert resets == [False, True] * 3
    assert dones == [False] * 6


def test_needs_reset_info_triggers_reset(tmp_path):
    agent = make_mock_agent()
    env = ScriptedEnv(ep_len=1000, needs_reset_at={2, 4})
    train_agent(agent, env, steps=5, outdir=str(tmp_path))
    resets = [c.args[3] for c in agent.observe.call_args_list]
    assert resets == [False, True, False, True, False]


def test_checkpoint_freq_saves(tmp_path):
    agent = make_mock_agent()
    env = ScriptedEnv(ep_len=3)
    train_agent(agent, env, steps=9, outdir=str(tmp_path), checkpoint_freq=4)
    saved = [c.args[0] for c in agent.save.call_args_list]
    assert os.path.join(str(tmp_path), "4_checkpoint") in saved
    assert os.path.join(str(tmp_path), "8_checkpoint") in saved


def test_crash_saves_except_checkpoint(tmp_path):
    """Any exception saves a <t>_except checkpoint then re-raises
    (reference train_agent.py:103-106)."""
    agent = make_mock_agent()
    agent.observe.side_effect = [None, None, RuntimeError("boom")]
    env = ScriptedEnv(ep_len=100)
    with pytest.raises(RuntimeError, match="boom"):
        train_agent(agent, env, steps=10, outdir=str(tmp_path))
    agent.save.assert_called_once_with(os.path.join(str(tmp_path), "3_except"))


def test_step_hooks_called_with_env_agent_t(tmp_path):
    agent = make_mock_agent()
    env = ScriptedEnv(ep_len=3)
    hook = mock.Mock()
    train_agent(agent, env, steps=5, outdir=str(tmp_path), step_hooks=[hook])
    assert hook.call_count == 5
    for i, c in enumerate(hook.call_args_list):
        assert c.args == (env, agent, i + 1)


def test_step_offset_resumes_schedule(tmp_path):
    agent = make_mock_agent()
    env = ScriptedEnv(ep_len=3)
    train_agent(agent, env, steps=10, outdir=str(tmp_path), step_offset=7)
    # Only steps 8, 9, 10 run.
    assert agent.act.call_count == 3
    agent.save.assert_called_with(os.path.join(str(tmp_path), "10_finish"))


def test_with_evaluation_writes_scores_and_stops_on_success(tmp_path):
    agent = make_mock_agent()
    agent.eval_mode = mock.MagicMock()
    env = ScriptedEnv(ep_len=2)
    eval_env = ScriptedEnv(ep_len=2)
    agent_out, history = train_agent_with_evaluation(
        agent,
        env,
        steps=20,
        eval_n_steps=None,
        eval_n_episodes=2,
        eval_interval=4,
        outdir=str(tmp_path),
        eval_env=eval_env,
        successful_score=1.0,  # scripted reward 1/step => reached at once
    )
    assert agent_out is agent
    # Evaluation ran at the first boundary >= interval and then stopped.
    assert history and history[0]["step"] >= 4
    assert os.path.exists(os.path.join(str(tmp_path), "scores.txt"))
    with open(os.path.join(str(tmp_path), "scores.txt")) as f:
        header = f.readline().split("\t")
    assert header[:4] == ["steps", "episodes", "elapsed", "mean"]


def test_eval_during_episode_checks_schedule_every_step(tmp_path):
    """eval_during_episode=True evaluates at interval boundaries even
    mid-episode (reference train_agent.py:81-90)."""
    agent = make_mock_agent()
    agent.eval_mode = mock.MagicMock()
    evaluator = mock.Mock()
    evaluator.evaluate_if_necessary.return_value = None
    env = ScriptedEnv(ep_len=1000)  # no episode end within 6 steps
    train_agent(
        agent, env, steps=6, outdir=str(tmp_path), evaluator=evaluator,
        eval_during_episode=True,
    )
    assert evaluator.evaluate_if_necessary.call_count == 6
    # Without the flag, mid-episode steps never consult the evaluator.
    evaluator2 = mock.Mock()
    evaluator2.evaluate_if_necessary.return_value = None
    env2 = ScriptedEnv(ep_len=1000)
    train_agent(
        agent, env2, steps=6, outdir=str(tmp_path), evaluator=evaluator2
    )
    # Only the final-step episode_end (t == steps) triggers a check.
    assert evaluator2.evaluate_if_necessary.call_count == 1
