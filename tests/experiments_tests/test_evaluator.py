"""Evaluator tests with mocked agents (reference: tests/experiments_tests/
test_evaluator.py): eval cadence, first-n-episode bookkeeping, best-save
semantics, scores.txt format — no learning involved."""

import contextlib
import os
from unittest import mock

import numpy as np

from pfrl_tpu.experiments.evaluator import (
    Evaluator,
    eval_performance,
    run_evaluation_episodes,
)


class ScriptedRewardEnv:
    """Each episode is 2 steps; per-episode return follows ``returns``."""

    def __init__(self, returns):
        self.returns = list(returns)
        self.ep = -1
        self.step_i = 0

    def reset(self):
        self.ep += 1
        self.step_i = 0
        return 0.0

    def step(self, action):
        self.step_i += 1
        done = self.step_i >= 2
        r = self.returns[self.ep % len(self.returns)] / 2.0
        return 0.0, r, done, {}


def make_eval_agent():
    agent = mock.Mock()
    agent.act.return_value = 0
    agent.get_statistics.return_value = [("average_q", 1.5)]
    agent.eval_mode = lambda: contextlib.nullcontext()
    return agent


def test_run_evaluation_episodes_counts_episodes():
    agent = make_eval_agent()
    env = ScriptedRewardEnv([1.0, 2.0, 3.0])
    scores, lengths = run_evaluation_episodes(
        env, agent, n_steps=None, n_episodes=3
    )
    assert scores == [1.0, 2.0, 3.0]
    assert lengths == [2, 2, 2]
    # observe called once per episode end with reset=True (evaluator.py:52).
    assert agent.observe.call_count == 3
    assert all(c.args[3] is True for c in agent.observe.call_args_list)


def test_run_evaluation_episodes_n_steps_budget():
    agent = make_eval_agent()
    env = ScriptedRewardEnv([1.0])
    scores, _ = run_evaluation_episodes(env, agent, n_steps=5, n_episodes=None)
    # 2-step episodes: terminates once timestep >= 5 -> 3 episodes.
    assert len(scores) == 3


def test_eval_performance_stats():
    agent = make_eval_agent()
    env = ScriptedRewardEnv([1.0, 3.0])
    stats = eval_performance(env, agent, n_steps=None, n_episodes=4)
    assert stats["episodes"] == 4
    assert stats["mean"] == 2.0
    assert stats["max"] == 3.0
    assert stats["min"] == 1.0


def test_evaluator_cadence_and_best_save(tmp_path):
    agent = make_eval_agent()
    env = ScriptedRewardEnv([1.0])
    ev = Evaluator(
        agent=agent,
        env=env,
        n_steps=None,
        n_episodes=2,
        eval_interval=10,
        outdir=str(tmp_path),
    )
    assert ev.evaluate_if_necessary(t=5, episodes=1) is None
    score = ev.evaluate_if_necessary(t=10, episodes=2)
    assert score == 1.0
    # Not again until the next interval boundary.
    assert ev.evaluate_if_necessary(t=14, episodes=3) is None
    # Best-save on first (and improving) evaluations only.
    agent.save.assert_called_once_with(os.path.join(str(tmp_path), "best"))
    env2 = ScriptedRewardEnv([0.5])
    ev.env = env2
    assert ev.evaluate_if_necessary(t=20, episodes=4) == 0.5
    agent.save.assert_called_once()  # no new best -> no second save


def test_evaluator_scores_txt_includes_agent_columns(tmp_path):
    agent = make_eval_agent()
    env = ScriptedRewardEnv([2.0])
    ev = Evaluator(
        agent=agent,
        env=env,
        n_steps=None,
        n_episodes=2,
        eval_interval=1,
        outdir=str(tmp_path),
    )
    ev.evaluate_if_necessary(t=1, episodes=1)
    ev.evaluate_if_necessary(t=2, episodes=2)
    with open(os.path.join(str(tmp_path), "scores.txt")) as f:
        lines = f.read().strip().split("\n")
    header = lines[0].split("\t")
    assert header == [
        "steps", "episodes", "elapsed", "mean", "median", "stdev",
        "max", "min", "average_q",
    ]
    assert len(lines) == 3
    row = lines[1].split("\t")
    assert int(row[0]) == 1
    assert float(row[3]) == 2.0
    assert float(row[-1]) == 1.5


def test_evaluator_step_offset_skips_early_eval(tmp_path):
    agent = make_eval_agent()
    env = ScriptedRewardEnv([1.0])
    ev = Evaluator(
        agent=agent,
        env=env,
        n_steps=None,
        n_episodes=1,
        eval_interval=10,
        outdir=str(tmp_path),
        step_offset=25,
    )
    # prev_eval_t snaps to the last boundary <= offset (evaluator.py:447-448).
    assert ev.evaluate_if_necessary(t=26, episodes=1) is None
    assert ev.evaluate_if_necessary(t=30, episodes=2) is not None
