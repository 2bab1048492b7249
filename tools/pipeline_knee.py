#!/usr/bin/env python
"""Pin the actor-learner pipeline knee with evidence (VERDICT r4 weak #6).

Round 4 measured throughput peaking at 4 actors x 96 lanes and FALLING at
4 x 128, and conjectured "actors starve the server" without evidence.
This experiment distinguishes the candidate mechanisms:

  H-learner:  learner bursts steal device/CPU from the act path
              -> test: no-learner ablation (replay_start_size=inf).
  H-cpu:      actor preprocessing oversubscribes the 2-core host
              -> test: per-process CPU%% sampling (workers vs main).
  H-server:   the main process's server/IO threads get starved
              -> visible as main-process CPU%% dropping as lanes grow
                 while workers saturate.

Runs {4x96, 4x128} x {learner, no-learner}, samples /proc/<pid>/stat for
every worker process and the main process during the measurement window,
and writes benchmarks/pipeline_knee.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HZ = os.sysconf("SC_CLK_TCK")


def proc_cpu_seconds(pid):
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / HZ  # utime+stime
    except (FileNotFoundError, ProcessLookupError, IndexError):
        return None


def run_case(workers, lanes, learner_on, seconds=25.0, burst=64):
    from tools.bench_pipeline import _make_core

    from pfrl_tpu.envs.synthetic_ale import make_warped
    from pfrl_tpu.parallel.atari_pipeline import AtariActorLearnerPipeline

    pipe = AtariActorLearnerPipeline(
        core=_make_core(),
        env_factory=make_warped,
        n_workers=workers,
        lanes_per_worker=lanes,
        capacity=50_000,
        minibatch_size=32,
        update_interval=4,
        target_update_interval=10_000,
        replay_start_size=2_000 if learner_on else 10**9,
        burst=burst,
    )
    pipe.start()
    try:
        deadline = time.time() + 420
        # Warm up until the act path flows (and, with the learner on,
        # until it has burst at least once).
        target_updates = burst if learner_on else 0
        while (
            pipe.acted_steps < 4_000 or pipe.optim_t < target_updates
        ) and time.time() < deadline:
            if pipe.exception_event.is_set():
                raise RuntimeError("pipeline failed during warmup")
            time.sleep(0.5)
        pids = {f"worker{i}": p.pid for i, p in enumerate(pipe._workers)}
        pids["main"] = os.getpid()
        cpu0 = {k: proc_cpu_seconds(v) for k, v in pids.items()}
        s0, u0, t0 = pipe.acted_steps, pipe.optim_t, time.time()
        time.sleep(seconds)
        elapsed = time.time() - t0
        cpu1 = {k: proc_cpu_seconds(v) for k, v in pids.items()}
        steps = pipe.acted_steps - s0
        updates = pipe.optim_t - u0
    finally:
        pipe.stop()
    cpu_pct = {
        k: round(100 * (cpu1[k] - cpu0[k]) / elapsed, 1)
        for k in pids
        if cpu0.get(k) is not None and cpu1.get(k) is not None
    }
    workers_pct = sum(v for k, v in cpu_pct.items() if k.startswith("worker"))
    return {
        "actors": workers,
        "lanes_per_actor": lanes,
        "learner": learner_on,
        "env_steps_per_sec": round(steps / elapsed, 1),
        "updates_per_sec": round(updates / elapsed, 1),
        "cpu_pct_per_process": cpu_pct,
        "workers_cpu_pct_total": round(workers_pct, 1),
        "main_cpu_pct": cpu_pct.get("main"),
        "host_cores": os.cpu_count(),
    }


def main():
    import jax

    results = {"backend": jax.default_backend(), "cases": []}
    for lanes in (96, 128):
        for learner_on in (True, False):
            print(f"== 4 x {lanes}, learner={'on' if learner_on else 'OFF'}",
                  flush=True)
            case = run_case(4, lanes, learner_on)
            print("  ", json.dumps(case), flush=True)
            results["cases"].append(case)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "pipeline_knee.json",
    )
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
