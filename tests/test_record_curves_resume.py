"""Resumable curve recording (tools/record_curves.py _curve_loop).

The TPU tunnel can kill a curve run mid-way; the loop snapshots the full
runner state after every eval and restarts from it, appending to the
same scores.txt.
"""

import os
import sys

import numpy as np
import optax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _tiny_runner():
    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import ABC
    from pfrl_tpu.experiments import JaxEvalLoop, OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import ConstantEpsilonGreedy
    from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
    from pfrl_tpu.replay import ReplayBuffer

    env = ABC(discrete=True, episodic=True)
    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=8, n_hidden_layers=1
        ),
        optimizer=optax.adam(1e-2),
        explorer=ConstantEpsilonGreedy(0.3, 2),
        gamma=0.9,
    )
    runner = OffPolicyRunner(
        env,
        core,
        ReplayBuffer(512, gamma=0.9, num_lanes=8),
        RunnerConfig(
            num_envs=8,
            replay_start_size=32,
            update_interval=8,
            target_update_interval=64,
            minibatch_size=8,
        ),
    )
    evaluator = JaxEvalLoop(env, core, num_episodes=4, max_steps=4)
    return runner, evaluator


def test_curve_loop_resumes_from_snapshot(tmp_path, monkeypatch):
    import record_curves as rc

    monkeypatch.setattr(rc, "REPO", str(tmp_path))
    # Keep the snapshot around after "completion" to simulate a kill.
    monkeypatch.setattr(rc.os, "remove", lambda p: None)

    runner, evaluator = _tiny_runner()
    rc._curve_loop(
        "toy", runner, evaluator, steps=320, eval_every=160
    )
    scores = tmp_path / "benchmarks/curves/toy/scores.txt"
    n_rows_first = len(scores.read_text().splitlines())
    assert n_rows_first >= 2  # header + >=1 eval row
    assert (tmp_path / "benchmarks/curves/toy/.resume.msgpack").exists()

    # Second invocation resumes at t=320 and continues to 640, appending.
    runner2, evaluator2 = _tiny_runner()
    rc._curve_loop(
        "toy", runner2, evaluator2, steps=640, eval_every=160
    )
    lines = scores.read_text().splitlines()
    assert len(lines) > n_rows_first
    steps_col = [int(float(ln.split("\t")[0])) for ln in lines[1:]]
    # Monotone and continuing past the first run's end — not restarted.
    assert steps_col == sorted(steps_col)
    assert steps_col[0] <= 320 and steps_col[-1] >= 640
