#!/usr/bin/env python
"""Retry bench capture until the TPU tunnel gives a good window.

VERDICT r4 weak #1: every round-4 perf artifact was captured in a degraded
tunnel window and nothing retried. This watcher loops:

    probe floor -> good (<150us)? run bench.py (+ optional scaling bench)
                -> degraded? log the attempt, sleep, retry

and always writes an attempts log, so the round either ships a good-window
BENCH or a record proving no good window occurred (N attempts, floors).

Usage:
    python tools/capture_good_window.py [--deadline-min 240]
        [--interval-s 420] [--out BENCH_GOOD.json] [--with-scaling]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_floor_us():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "probe_floor.py")],
        capture_output=True, text=True, timeout=300,
    )
    out = (r.stdout or "") + (r.stderr or "")
    for line in out.splitlines():
        if "dispatch floor:" in line:
            return float(line.split("dispatch floor:")[1].split("us")[0])
    # Probe crashed (e.g. the tunnel refused a second client); treat as a
    # failed attempt, not a float — inf would serialize as invalid JSON.
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-min", type=float, default=240)
    ap.add_argument("--interval-s", type=float, default=420)
    ap.add_argument("--threshold-us", type=float, default=150.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_GOOD.json"))
    ap.add_argument("--log", default=os.path.join(
        REPO, "benchmarks", "good_window_attempts.json"))
    ap.add_argument("--with-scaling", action="store_true")
    ap.add_argument("--pause-pgid-file", default=None,
                    help="file holding a process-group id (one integer) to "
                    "SIGSTOP while probing/capturing and SIGCONT after, so "
                    "a concurrent training run does not pollute the "
                    "measurement (and vice versa)")
    args = ap.parse_args()

    def paused_pgid():
        if not args.pause_pgid_file:
            return None
        try:
            with open(args.pause_pgid_file) as f:
                return int(f.read().strip().split("=")[-1])
        except (OSError, ValueError):
            return None

    attempts = []
    deadline = time.time() + args.deadline_min * 60
    captured = False

    def flush_log():
        # Written after EVERY attempt so the artifact exists even if the
        # session is killed before the deadline.
        os.makedirs(os.path.dirname(args.log), exist_ok=True)
        with open(args.log, "w") as f:
            json.dump(
                {"captured_good_window": captured, "attempts": attempts}, f,
                indent=1,
            )

    while time.time() < deadline:
        pgid = paused_pgid()
        if pgid:
            try:
                os.killpg(pgid, 19)  # SIGSTOP
            except ProcessLookupError:
                pgid = None
        try:
            floor = probe_floor_us()
            good = floor is not None and floor < args.threshold_us
            attempts.append({
                "t": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "floor_us": None if floor is None else round(floor, 1),
                "good": good,
            })
            print(
                "[capture] floor="
                + ("probe-failed" if floor is None else f"{floor:.1f}us")
                + f" ({'GOOD' if good else 'degraded'})",
                flush=True,
            )
            if good:
                r = subprocess.run(
                    [sys.executable, os.path.join(REPO, "bench.py")],
                    capture_output=True, text=True, timeout=900,
                    cwd=REPO,
                )
                line = next(
                    (ln for ln in (r.stdout or "").splitlines()
                     if ln.startswith("{")), None,
                )
                if line:
                    bench = json.loads(line)
                    # Only keep it if the window HELD through the bench.
                    if not bench.get("link_degraded", True):
                        with open(args.out, "w") as f:
                            json.dump(bench, f, indent=1)
                        print(f"[capture] good-window bench -> {args.out}",
                              flush=True)
                        captured = True
                        if args.with_scaling:
                            subprocess.run(
                                [sys.executable,
                                 os.path.join(REPO, "tools", "bench_scaling.py")],
                                timeout=1800, cwd=REPO,
                            )
                        break
                    attempts[-1]["bench_link_degraded_midrun"] = True
                    print("[capture] window degraded mid-bench; retrying",
                          flush=True)
                else:
                    attempts[-1]["bench_failed"] = (r.stderr or "")[-300:]
        finally:
            if pgid:
                try:
                    os.killpg(pgid, 18)  # SIGCONT
                except ProcessLookupError:
                    pass
        flush_log()
        if captured:
            break
        time.sleep(args.interval_s)
    flush_log()
    print(f"[capture] done: captured={captured}, "
          f"{len(attempts)} attempts logged -> {args.log}", flush=True)


if __name__ == "__main__":
    main()
