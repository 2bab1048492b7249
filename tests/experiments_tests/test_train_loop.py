"""Unit tests for the shared TrainRun services (experiments/train_loop.py).

The serial/batch drivers are integration-tested elsewhere
(test_train_agent*.py); these pin the service semantics both build on.
"""

import logging
import os
from unittest import mock

import pytest

from pfrl_tpu.experiments.train_loop import TrainRun


def make_run(tmp_path, **kw):
    agent = mock.Mock()
    agent.get_statistics.return_value = [("average_q", 1.5)]
    defaults = dict(
        agent=agent,
        outdir=str(tmp_path),
        logger=logging.getLogger("test"),
    )
    defaults.update(kw)
    return TrainRun(**defaults)


def test_eval_point_records_history_row_with_stats(tmp_path):
    evaluator = mock.Mock()
    evaluator.evaluate_if_necessary.return_value = 12.0
    run = make_run(tmp_path, evaluator=evaluator)
    run.t = 40
    run.eval_point(episodes=3)
    evaluator.evaluate_if_necessary.assert_called_once_with(t=40, episodes=3)
    assert run.history == [
        {"average_q": 1.5, "step": 40, "eval_score": 12.0}
    ]
    assert not run.stop_requested


def test_eval_point_sets_stop_on_successful_score(tmp_path):
    evaluator = mock.Mock()
    evaluator.evaluate_if_necessary.side_effect = [5.0, 10.0]
    run = make_run(tmp_path, evaluator=evaluator, successful_score=10.0)
    run.eval_point(episodes=1)
    assert not run.stop_requested
    run.eval_point(episodes=2)
    assert run.stop_requested
    assert len(run.history) == 2


def test_eval_point_none_score_records_nothing(tmp_path):
    evaluator = mock.Mock()
    evaluator.evaluate_if_necessary.return_value = None
    run = make_run(tmp_path, evaluator=evaluator)
    run.eval_point(episodes=1)
    assert run.history == [] and not run.stop_requested


def test_checkpoint_stride_covers_vector_steps(tmp_path):
    """With stride n (vector drivers advance t by n), any multiple of
    checkpoint_freq inside the stride window triggers exactly one save."""
    run = make_run(tmp_path, checkpoint_freq=10)
    saves = []
    run.agent.save.side_effect = lambda d: saves.append(os.path.basename(d))
    for t in (8, 16, 24, 32):
        run.t = t
        run.checkpoint_if_due(stride=8)
    # A save fires whenever a multiple of 10 falls in (t-8, t]: 10 in
    # (8,16], 20 in (16,24], 30 in (24,32]; nothing in (0,8].
    assert saves == ["16_checkpoint", "24_checkpoint", "32_checkpoint"]


def test_crash_save_on_error_saves_and_reraises(tmp_path):
    run = make_run(tmp_path)
    with pytest.raises(ValueError):
        with run.crash_save_on_error():
            run.t = 123
            raise ValueError("boom")
    run.agent.save.assert_called_once()
    assert run.agent.save.call_args.args[0].endswith("123_except")


def test_step_hooks_receive_env_agent_t(tmp_path):
    hook = mock.Mock()
    run = make_run(tmp_path, step_hooks=[hook], env="ENV")
    run.t = 7
    run.fire_step_hooks()
    hook.assert_called_once_with("ENV", run.agent, 7)
