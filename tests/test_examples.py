"""Example-script smoke tests (reference parity: examples_tests/*.sh —
every CLI entry point runs a tiny number of steps end-to-end).

Marked slow: each subprocess pays its own jax startup + compile.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(script, args, timeout=500):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, script)] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.mark.slow
def test_dqn_cartpole_example(tmp_path):
    out = run_example(
        "examples/gym/train_dqn_cartpole.py",
        ["--steps", "5000", "--num-envs", "16", "--eval-interval", "5000",
         "--replay-start-size", "256", "--update-per", "16"],
    )
    assert "env-steps/s" in out


@pytest.mark.slow
def test_dqn_atari_sim_example():
    out = run_example(
        "examples/atari/reproduction/dqn/train_dqn.py",
        ["--sim", "--steps", "1000", "--num-envs", "8",
         "--replay-capacity", "2000", "--replay-start-size", "256",
         "--target-update-interval", "512"],
    )
    assert "steps/s" in out


@pytest.mark.slow
def test_ppo_device_example():
    out = run_example(
        "examples/mujoco/reproduction/ppo/train_ppo.py",
        ["--jax-env", "pendulum", "--steps", "20000", "--num-envs", "8"],
    )
    assert "steps/s" in out
