"""Step-time breakdown of the DQN bench anchor from a real device trace.

Captures a ``jax.profiler`` trace of the fused runner chunk (the bench.py
``dqn`` anchor: NatureCNN 84x84x4, 64 lanes, batch 32 per 4 env steps; plus
a batch-512 variant) and reduces the XLA-op timeline to a category table:

    conv %, matmul %, replay gather/scatter %, rng %, reduce/elementwise %,
    copy %, other %, and device-busy vs wall (dispatch/idle share).

This replaces the round-4 Amdahl *assertion* ("convs are under half of
step time") with measured numbers (VERDICT r4 weak #2/#3). Output:
``benchmarks/profile_dqn_step.json`` + a markdown table on stdout.

Usage: python tools/profile_step.py [--batch 32] [--out PATH]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import tempfile
import time


def build_runner(minibatch: int):
    import flax.linen as nn
    import optax

    from pfrl_tpu.agents import DQNCore
    from pfrl_tpu.envs import AtariSim
    from pfrl_tpu.experiments import OffPolicyRunner, RunnerConfig
    from pfrl_tpu.explorers import LinearDecayEpsilonGreedy
    from pfrl_tpu.models import LargeAtariCNN
    from pfrl_tpu.q_functions import DiscreteActionValueHead
    from pfrl_tpu.replay import ReplayBuffer
    from pfrl_tpu.utils import atari_phi

    n_actions, num_envs = 6, 64

    class NatureQ(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LargeAtariCNN()(x)
            return DiscreteActionValueHead()(nn.Dense(n_actions)(h))

    core = DQNCore(
        model=NatureQ(),
        optimizer=optax.rmsprop(2.5e-4, decay=0.95, eps=1e-2),
        explorer=LinearDecayEpsilonGreedy(1.0, 0.1, 1_000_000, n_actions),
        gamma=0.99,
        batch_accumulator="sum",
        phi=atari_phi,
    )
    cfg = RunnerConfig(
        num_envs=num_envs,
        replay_start_size=2_000,
        update_interval=4,
        target_update_interval=10_000,
        minibatch_size=minibatch,
    )
    return OffPolicyRunner(
        AtariSim(n_actions=n_actions),
        core,
        ReplayBuffer(
            100_000,
            gamma=0.99,
            num_lanes=num_envs,
            store_next_obs=False,
            fused_dequant_scale=1.0 / 255.0,
        ),
        cfg,
    )


_CATEGORIES = [
    # (category, substrings matched against the lowercased op name)
    ("conv", ("conv",)),
    ("matmul", ("dot", "gemm", "matmul")),
    ("replay gather/scatter", ("gather", "scatter", "dynamic-slice",
                               "dynamic_slice", "dynamic-update",
                               "dynamic_update", "select-and-scatter")),
    ("rng", ("rng", "threefry", "random", "iota_fusion")),
    ("sort/argmax", ("sort", "arg", "reduce-window")),
    ("reduce/elementwise", ("reduce", "loop_fusion", "fused", "fusion",
                            "add", "mult", "broadcast", "compare",
                            "select", "tanh", "exp", "divide")),
    ("copy/layout", ("copy", "transpose", "bitcast", "reshape", "pad",
                     "slice", "concatenate", "convert")),
]


def classify(name: str) -> str:
    n = name.lower()
    for cat, subs in _CATEGORIES:
        if any(s in n for s in subs):
            return cat
    return "other"


def parse_trace(tracedir):
    paths = glob.glob(
        os.path.join(tracedir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace under {tracedir}"
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # Map (pid, tid) -> names to find the device "XLA Ops" thread.
    proc = {}
    threads = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e["tid"])] = e["args"]["name"]
    device_pids = {p for p, n in proc.items() if "TPU" in n or "device" in n}
    op_tids = {
        (p, t)
        for (p, t), n in threads.items()
        if p in device_pids and n == "XLA Ops"
    }
    # Events nest (while/conditional spans contain their body ops), so
    # attribute SELF time: an event's duration minus its same-thread
    # children. Sweep each thread's events sorted by (start, -dur) with a
    # stack of enclosing spans.
    per_tid = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key not in op_tids:
            continue
        per_tid[key].append(
            (float(e["ts"]), float(e.get("dur", 0.0)), e["name"])
        )
    by_cat = collections.Counter()
    by_op = collections.Counter()
    containers = collections.Counter()  # while/cond self time = loop overhead
    t_min, t_max = float("inf"), 0.0

    def credit(name, dur, child_time):
        self_t = max(0.0, dur - child_time)
        if name.lower().startswith(("while", "conditional", "call")):
            containers[name] += self_t
        else:
            by_cat[classify(name)] += self_t
            by_op[name] += self_t

    for events in per_tid.values():
        events.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # frames: [end_ts, name, dur, child_time]
        for ts, dur, name in events:
            t_min = min(t_min, ts)
            t_max = max(t_max, ts + dur)
            while stack and ts >= stack[-1][0] - 1e-9:
                end, nm, d, child = stack.pop()
                credit(nm, d, child)
            if stack:
                stack[-1][3] += dur
            stack.append([ts + dur, name, dur, 0.0])
        while stack:
            end, nm, d, child = stack.pop()
            credit(nm, d, child)
    return by_cat, by_op, containers, (
        t_max - t_min if t_max > t_min else 0.0
    )


def profile_variant(minibatch, chunk_steps=200, traced_chunks=3):
    import numpy as np

    import jax

    runner = build_runner(minibatch)
    state = runner.init(jax.random.PRNGKey(0))
    sync = lambda m: float(np.asarray(m["loss"][-1]))  # noqa: E731
    # Warm up: compile + fill replay past start size.
    for _ in range(2):
        state, metrics = runner.run_chunk(state, chunk_steps)
        sync(metrics)
    tracedir = tempfile.mkdtemp(prefix=f"dqnprof_b{minibatch}_")
    t0 = time.time()
    with jax.profiler.trace(tracedir):
        for _ in range(traced_chunks):
            state, metrics = runner.run_chunk(state, chunk_steps)
        sync(metrics)
    wall_s = time.time() - t0
    by_cat, by_op, containers, busy_span_us = parse_trace(tracedir)
    busy_us = sum(by_cat.values()) + sum(containers.values())
    steps = traced_chunks * chunk_steps * runner.config.num_envs
    return {
        "minibatch": minibatch,
        "env_steps_traced": steps,
        "wall_s": round(wall_s, 3),
        "env_steps_per_s": round(steps / wall_s, 1),
        "device_busy_ms": round(busy_us / 1e3, 2),
        "device_busy_pct_of_wall": round(100 * busy_us / 1e6 / wall_s, 1),
        "by_category_pct_of_busy": {
            k: round(100 * v / busy_us, 1)
            for k, v in by_cat.most_common()
        },
        "by_category_ms": {
            k: round(v / 1e3, 2) for k, v in by_cat.most_common()
        },
        # Self time of while/conditional shells: sequencing overhead of
        # the scan/update control flow that no leaf op accounts for.
        "control_flow_self_ms": round(sum(containers.values()) / 1e3, 2),
        "control_flow_self_pct_of_busy": round(
            100 * sum(containers.values()) / busy_us, 1
        ),
        "top_ops_ms": {
            k: round(v / 1e3, 2) for k, v in by_op.most_common(12)
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 512])
    ap.add_argument(
        "--out", default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "profile_dqn_step.json",
        )
    )
    args = ap.parse_args()

    import subprocess
    import sys

    import jax

    floor = None
    probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "probe_floor.py")
    if os.path.exists(probe):
        r = subprocess.run([sys.executable, probe], capture_output=True,
                           text=True)
        floor = r.stdout.strip().splitlines()[-1] if r.stdout else None

    results = {
        "backend": jax.default_backend(),
        "dispatch_floor_probe": floor,
        "variants": [profile_variant(b) for b in args.batches],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    for v in results["variants"]:
        print(f"\n## batch {v['minibatch']} — {v['env_steps_per_s']} env-steps/s, "
              f"device busy {v['device_busy_pct_of_wall']}% of wall")
        print("| category | ms | % of device busy |")
        print("|---|---|---|")
        for k, pct in v["by_category_pct_of_busy"].items():
            print(f"| {k} | {v['by_category_ms'][k]} | {pct} |")
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
