"""train_agent_async driver tests with mock agents and scripted envs
(reference: tests/experiments_tests/test_train_agent_async.py:15-50 —
the driver is verified without real learning)."""

import threading
from unittest import mock

import numpy as np
import pytest

from pfrl_tpu.experiments import train_agent_async


class ScriptedEnv:
    observation_space = None
    action_space = None

    def __init__(self, ep_len=4):
        self.ep_len = ep_len
        self.t = 0
        self.episode_t = 0

    def reset(self):
        self.episode_t = 0
        return 0.0

    def step(self, action):
        self.t += 1
        self.episode_t += 1
        done = self.episode_t >= self.ep_len
        if done:
            self.episode_t = 0
        return float(self.t), 1.0, done, {}

    def close(self):
        pass


def make_mock_agent():
    agent = mock.Mock()
    agent.act.return_value = 0
    agent.batch_act.side_effect = lambda obss: np.zeros(len(obss), int)
    agent.get_statistics.return_value = []
    agent.process_idx = 0
    return agent


def test_synchronous_mode_trains_and_returns_agent(tmp_path):
    agent = make_mock_agent()
    agent.eval_mode = mock.MagicMock()
    out = train_agent_async(
        outdir=str(tmp_path),
        processes=2,
        make_env=lambda idx, test: ScriptedEnv(),
        steps=20,
        eval_interval=10**6,  # never fires within 20 steps
        eval_n_steps=None,
        eval_n_episodes=1,
        agent=agent,
    )
    assert out is agent
    # The synchronous mapping drives the batch interface: 2 env lanes per
    # vector step -> >= steps/2 batch_act calls.
    assert agent.batch_act.call_count >= 10
    assert agent.batch_observe.call_count == agent.batch_act.call_count


def test_actor_learner_mode_requires_make_agent(tmp_path):
    with pytest.raises(AssertionError):
        train_agent_async(
            outdir=str(tmp_path),
            processes=1,
            make_env=lambda idx, test: ScriptedEnv(),
            stop_event=threading.Event(),
        )


def test_exception_event_aborts_actor_learner(tmp_path):
    """A set exception_event stops the actor loops promptly (reference
    train_agent_async.py:124-127 kill-all semantics)."""
    stop = threading.Event()
    exc = threading.Event()
    exc.set()  # already failed before actors start

    made = []

    def make_agent(i):
        a = make_mock_agent()
        a.process_idx = i
        made.append(a)
        return a

    train_agent_async(
        outdir=str(tmp_path),
        processes=1,
        make_env=lambda idx, test: ScriptedEnv(),
        steps=10**6,
        eval_interval=None,
        eval_n_steps=None,
        eval_n_episodes=1,
        make_agent=make_agent,
        stop_event=stop,
        exception_event=exc,
    )
    # Driver returned instead of running the full 10**6 steps.
    assert all(a.act.call_count < 10**4 for a in made)
