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
def test_dqn_cartpole_example_bf16(tmp_path):
    """--bf16 runs the same flagship flow end-to-end under mixed
    precision (tests/test_precision.py gates the learning parity)."""
    out = run_example(
        "examples/gym/train_dqn_cartpole.py",
        ["--steps", "5000", "--num-envs", "16", "--eval-interval", "5000",
         "--replay-start-size", "256", "--update-per", "16", "--bf16"],
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


@pytest.mark.slow
def test_quickstart_example():
    out = run_example("examples/quickstart/quickstart.py", ["--steps", "3000"])
    assert "final eval returns" in out


@pytest.mark.slow
def test_quickstart_hostloop_example():
    out = run_example(
        "examples/quickstart/quickstart.py", ["--hostloop", "--steps", "300"]
    )
    assert "statistics" in out


@pytest.mark.slow
def test_dqn_gym_naf_example():
    # Continuous action space -> NAF quadratic Q-function path.
    out = run_example(
        "examples/gym/train_dqn_gym.py",
        ["--env", "pendulum", "--steps", "3000", "--num-envs", "8",
         "--eval-interval", "3000", "--replay-start-size", "256",
         "--update-per", "8"],
    )
    assert "env-steps/s" in out


@pytest.mark.slow
def test_categorical_dqn_gym_example():
    out = run_example(
        "examples/gym/train_categorical_dqn_gym.py",
        ["--steps", "3000", "--num-envs", "8", "--eval-interval", "3000",
         "--replay-start-size", "256", "--update-per", "8"],
    )
    assert "env-steps/s" in out


@pytest.mark.slow
def test_reinforce_gym_example(tmp_path):
    run_example(
        "examples/gym/train_reinforce_gym.py",
        ["--steps", "600", "--eval-interval", "300", "--eval-n-runs", "2",
         "--outdir", str(tmp_path)],
    )


@pytest.mark.slow
def test_dqn_ale_sim_dueling_per_example():
    out = run_example(
        "examples/atari/train_dqn_ale.py",
        ["--sim", "--arch", "dueling", "--double", "--prioritized",
         "--steps", "200", "--chunk", "50", "--num-envs", "8",
         "--replay-capacity", "2000", "--replay-start-size", "128",
         "--target-update-interval", "512"],
    )
    assert "env-steps/s" in out


@pytest.mark.slow
def test_drqn_ale_sim_example():
    out = run_example(
        "examples/atari/train_drqn_ale.py",
        ["--sim", "--steps", "200", "--chunk", "50", "--num-envs", "8",
         "--batch-size", "4", "--max-episodes", "128",
         "--episodic-update-len", "8", "--replay-start-size", "128",
         "--target-update-interval", "512"],
    )
    assert "env-steps/s" in out


@pytest.mark.slow
def test_a2c_ale_sim_example():
    out = run_example(
        "examples/atari/train_a2c_ale.py",
        ["--sim", "--steps", "2000", "--num-envs", "8"],
    )
    assert "env-steps/s" in out


@pytest.mark.slow
def test_slimevolley_rainbow_example(tmp_path):
    run_example(
        "examples/slimevolley/train_rainbow.py",
        ["--steps", "300", "--replay-start-size", "64",
         "--eval-interval", "200", "--outdir", str(tmp_path)],
    )
    assert (tmp_path / "scores.txt").exists()


@pytest.mark.slow
def test_atlas_sac_example(tmp_path):
    run_example(
        "examples/atlas/train_soft_actor_critic_atlas.py",
        ["--steps", "200", "--num-envs", "2", "--serial-envs",
         "--replay-start-size", "32", "--eval-interval", "150",
         "--eval-n-runs", "2", "--outdir", str(tmp_path)],
    )
    assert (tmp_path / "scores.txt").exists()


@pytest.mark.slow
def test_grasping_dqn_batch_example(tmp_path):
    """Also covers pytree (tuple image+steps) observations end to end."""
    run_example(
        "examples/grasping/train_dqn_batch_grasping.py",
        ["--steps", "400", "--num-envs", "2", "--serial-envs",
         "--replay-start-size", "64", "--replay-capacity", "2000",
         "--eval-interval", "300", "--eval-n-runs", "3",
         "--outdir", str(tmp_path)],
    )
    assert (tmp_path / "scores.txt").exists()


@pytest.mark.parametrize(
    "script",
    [
        "examples/mujoco/reproduction/ddpg/train_ddpg.py",
        "examples/mujoco/reproduction/ppo/train_ppo.py",
        "examples/mujoco/reproduction/soft_actor_critic/train_soft_actor_critic.py",
        "examples/mujoco/reproduction/td3/train_td3.py",
        "examples/mujoco/reproduction/trpo/train_trpo.py",
    ],
    ids=["ddpg", "ppo", "sac", "td3", "trpo"],
)
def test_mujoco_reproduction_argparse(script):
    """Every reproduction script's CLI must construct (--help exits 0 and
    prints its options). Real-env training paths are covered by
    tests/test_real_env_training.py and the reload matrix below."""
    out = run_example(script, ["--help"], timeout=120)
    assert "--seed" in out


@pytest.mark.slow
def test_dqn_pipeline_sim_example():
    """Device-resident actor-learner pipeline end-to-end (--sim): spawned
    shm actor processes, on-device stacking/staging, burst learner."""
    out = run_example(
        "examples/atari/train_dqn_pipeline_ale.py",
        ["--sim", "--steps", "600", "--workers", "2", "--lanes", "2",
         "--replay-capacity", "4096", "--replay-start-size", "64",
         "--burst", "4", "--target-update-interval", "256",
         "--log-interval", "2"],
        timeout=900,
    )
    assert "env-steps/s" in out


# ----------------------------------------------------------------- reload
# Reference parity: examples_tests/*.sh always run train THEN a --demo
# reload of the saved agent (e.g. examples_tests/atari/test_dqn.sh).

_DEVICE_ROUNDTRIPS = [
    (
        "examples/gym/train_dqn_cartpole.py",
        ["--steps", "2000", "--num-envs", "32", "--eval-interval", "2000",
         "--replay-start-size", "256"],
        ["--num-envs", "32"],
    ),
    (
        "examples/gym/train_categorical_dqn_gym.py",
        ["--steps", "2000", "--num-envs", "32", "--eval-interval", "2000",
         "--replay-start-size", "256"],
        ["--num-envs", "32"],
    ),
    (
        "examples/atari/reproduction/dqn/train_dqn.py",
        ["--sim", "--steps", "600", "--num-envs", "8",
         "--replay-capacity", "2000", "--replay-start-size", "256",
         "--target-update-interval", "512"],
        ["--sim", "--num-envs", "8", "--replay-capacity", "2000",
         "--replay-start-size", "256"],
    ),
    # IQN's quantile-net compile is the heaviest of the set — on a busy
    # 2-core box the train+demo pair can exceed the default 500s.
    (
        "examples/atari/reproduction/iqn/train_iqn.py",
        ["--sim", "--steps", "600", "--num-envs", "8",
         "--replay-capacity", "2000", "--replay-start-size", "256"],
        ["--sim", "--num-envs", "8", "--replay-capacity", "2000",
         "--replay-start-size", "256"],
    ),
    (
        "examples/mujoco/reproduction/ppo/train_ppo.py",
        ["--jax-env", "pendulum", "--steps", "5000", "--num-envs", "8"],
        ["--jax-env", "pendulum", "--num-envs", "8"],
    ),
    # Recurrent device runner (episodic replay + stored carries).
    (
        "examples/atari/train_drqn_ale.py",
        ["--sim", "--steps", "600", "--num-envs", "8", "--chunk", "50",
         "--max-episodes", "64", "--replay-start-size", "128",
         "--update-interval", "8", "--target-update-interval", "256",
         "--max-episode-chunk", "8"],
        ["--sim", "--num-envs", "8"],
    ),
    # Device episodic off-policy (ACER: Retrace + trust region).
    (
        "examples/atari/train_acer_ale.py",
        ["--sim", "--steps", "600", "--num-envs", "8", "--chunk", "50",
         "--t-max", "10", "--max-episodes", "64",
         "--replay-start-size", "128"],
        ["--sim", "--num-envs", "8"],
    ),
    # Device on-policy A3C-by-redesign (synchronous batched A2C mapping).
    (
        "examples/atari/reproduction/a3c/train_a3c.py",
        ["--steps", "800", "--processes", "8", "--t-max", "5"],
        ["--processes", "8"],
    ),
]


@pytest.mark.slow
@pytest.mark.parametrize(
    "script,train_args,demo_args",
    _DEVICE_ROUNDTRIPS,
    ids=[s.split("/")[-1] for s, _, _ in _DEVICE_ROUNDTRIPS],
)
def test_train_then_demo_reload(tmp_path, script, train_args, demo_args):
    ckpt = str(tmp_path / "ckpt")
    run_example(script, train_args + ["--save-to", ckpt], timeout=900)
    assert os.path.exists(os.path.join(ckpt, "train_state.msgpack"))
    out = run_example(script, demo_args + ["--demo", "--load", ckpt], timeout=900)
    assert "n_episodes:" in out and "mean:" in out


_HOST_ROUNDTRIPS = [
    # (script, train_args(outdir is appended), demo_args) — every host
    # driver family: on-policy PPO shell, episodic REINFORCE, off-policy
    # actor-critic shells (SAC/TD3), categorical (rainbow), and the
    # vector-env batch driver (grasping DoubleDQN, atlas SAC).
    (
        "examples/gym/train_ppo_pendulum.py",
        ["--steps", "4200", "--num-envs", "4", "--eval-interval", "4000"],
        ["--num-envs", "4"],
    ),
    (
        "examples/gym/train_reinforce_gym.py",
        ["--steps", "1500", "--eval-interval", "1500"],
        [],
    ),
    (
        "examples/mujoco/reproduction/soft_actor_critic/train_soft_actor_critic.py",
        ["--jax-env", "--steps", "900", "--replay-start-size", "256",
         "--eval-interval", "800"],
        ["--jax-env"],
    ),
    (
        "examples/mujoco/reproduction/td3/train_td3.py",
        ["--jax-env", "--steps", "900", "--replay-start-size", "256",
         "--eval-interval", "800"],
        ["--jax-env"],
    ),
    (
        "examples/slimevolley/train_rainbow.py",
        ["--jax-env", "--steps", "500", "--replay-start-size", "128",
         "--eval-interval", "450"],
        ["--jax-env"],
    ),
    (
        "examples/grasping/train_dqn_batch_grasping.py",
        ["--jax-env", "--steps", "400", "--num-envs", "2", "--serial-envs",
         "--replay-start-size", "128", "--eval-interval", "350"],
        ["--jax-env", "--num-envs", "2", "--serial-envs"],
    ),
]

try:  # real-Box2D discrete roundtrip (train_dqn_gym gymnasium backend)
    import Box2D  # noqa: F401

    _HOST_ROUNDTRIPS.append(
        (
            "examples/gym/train_dqn_gym.py",
            ["--env", "LunarLander-v3", "--steps", "400", "--num-envs", "1",
             "--replay-start-size", "128", "--target-update-interval", "200",
             "--eval-interval", "350"],
            ["--env", "LunarLander-v3"],
        )
    )
except ImportError:
    pass


@pytest.mark.slow
@pytest.mark.parametrize(
    "script,train_args,demo_args",
    _HOST_ROUNDTRIPS,
    ids=[s.split("/")[-1] for s, _, _ in _HOST_ROUNDTRIPS],
)
def test_shell_train_then_demo_reload(tmp_path, script, train_args, demo_args):
    """Host-driver path: the driver saves <t>_finish via agent.save; --demo
    reloads it through agent.load (the reference CLI contract,
    examples_tests/*.sh)."""
    import glob

    outdir = str(tmp_path / "out")
    run_example(script, train_args + ["--outdir", outdir], timeout=900)
    # prepare_output_dir-style scripts nest a timestamped exp dir under
    # --outdir; search recursively so both layouts match.
    finish = glob.glob(os.path.join(outdir, "*_finish")) or glob.glob(
        os.path.join(outdir, "*", "*_finish")
    )
    assert finish, os.listdir(outdir)
    out = run_example(
        script, demo_args + ["--demo", "--load", finish[0]], timeout=900
    )
    assert "n_episodes:" in out and "mean:" in out
