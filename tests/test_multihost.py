"""Two-process multi-host SPMD test (VERDICT r1 item 9).

Forks two real CPU processes that join via jax.distributed (Gloo
collectives), form a 4-device global mesh (2 local devices each), and run
the FULL jitted off-policy training step with env lanes + replay sharded
over the cross-process 'dp' axis — the same path dryrun_multichip
validates single-process. This is the BASELINE.md >=8-host scaling
stance, exercised at 2 hosts in CI.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
pid = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
from pfrl_tpu.parallel import global_mesh, initialize_multihost, is_primary, local_lane_slice
initialize_multihost("localhost:%PORT%", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

import numpy as np
import optax
from pfrl_tpu.agents import DQNCore
from pfrl_tpu.envs import CartPole, TimeLimit
from pfrl_tpu.experiments.runner import OffPolicyRunner, RunnerConfig
from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
from pfrl_tpu.replay import ReplayBuffer

mesh = global_mesh(("dp",))
num_envs = 8
cfg = RunnerConfig(
    num_envs=num_envs,
    replay_start_size=num_envs,
    update_interval=num_envs,
    target_update_interval=2 * num_envs,
    minibatch_size=8,
)
core = DQNCore(
    model=FCStateQFunctionWithDiscreteAction(
        n_actions=2, n_hidden_channels=16, n_hidden_layers=1
    ),
    optimizer=optax.adam(1e-3),
    explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1000, 2),
)
runner = OffPolicyRunner(
    TimeLimit(CartPole()),
    core,
    ReplayBuffer(128, gamma=0.99, num_lanes=num_envs),
    cfg,
    mesh=mesh,
)
state = runner.init(jax.random.PRNGKey(0))
state, metrics = runner.run_chunk(state, 3)
jax.block_until_ready(metrics["loss"])
assert int(state.t) == 3 * num_envs
assert np.isfinite(np.asarray(jax.device_get(metrics["loss"]))).all()
assert local_lane_slice(num_envs) == slice(pid * 4, pid * 4 + 4)
assert is_primary() == (pid == 0)
print(f"MULTIHOST_OK {pid} t={int(state.t)}", flush=True)
"""


@pytest.mark.slow
def test_two_process_training_step(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("%PORT%", str(port)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            cwd=str(tmp_path),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out, out[-2000:]
