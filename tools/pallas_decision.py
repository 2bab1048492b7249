#!/usr/bin/env python
"""Floor-gated Pallas prefix-sample A/B (the round-4 win-or-cut record).

Gates on a good tunnel window (synced-dispatch floor < 150 µs — degraded
windows invalidate kernel-level comparisons), then runs >= 5 interleaved
rounds of the surviving replay-kernel A/B (streaming prefix-sample vs the
XLA tree descent) at the Atari configuration. The row-gather and fused
kernels were already cut on the accumulated round-1..3 evidence
(pfrl_tpu/ops/pallas_kernels.py docstring); this tool re-validates the
keep decision whenever a good window is available.

Usage: python tools/pallas_decision.py [--rounds 5] [--force]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def probe_floor():
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    float(np.asarray(f(x)))
    best = float("inf")
    for _ in range(30):
        t0 = time.time()
        float(np.asarray(f(x)))
        best = min(best, time.time() - t0)
    return best * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--force", action="store_true",
                    help="run even in a degraded window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        sys.exit("needs a TPU backend")

    floor = probe_floor()
    print(f"dispatch floor: {floor:.1f} us", flush=True)
    if floor > 150 and not args.force:
        print(json.dumps({"skipped": "degraded_window", "floor_us": round(floor, 1)}))
        sys.exit(3)

    from pfrl_tpu.ops import pallas_kernels as pk
    from pfrl_tpu.replay import sum_tree

    batch = 32
    cap_t = 131_072
    prio = jax.random.uniform(jax.random.PRNGKey(0), (cap_t,)) + 0.01
    tree = sum_tree.update(sum_tree.init_tree(cap_t), jnp.arange(cap_t), prio)
    leaves = tree[cap_t:]
    targets = jax.random.uniform(
        jax.random.PRNGKey(1), (batch,), maxval=float(sum_tree.total(tree)) * 0.999
    )
    jit_descent = jax.jit(sum_tree.sample_from_prefix)

    def _force(out):
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf)

    fns = {
        "prefix_pallas": lambda: pk.prefix_sample_pallas(leaves, targets),
        "prefix_descent": lambda: jit_descent(tree, targets),
    }
    for f in fns.values():
        _force(f())

    res = {k: [] for k in fns}
    for r in range(args.rounds):
        for k, fn in fns.items():
            _force(fn())
            t0 = time.time()
            out = None
            for _ in range(args.reps):
                out = fn()
            _force(out)
            res[k].append((time.time() - t0) / args.reps * 1e6)
        print(f"round {r}: " + " ".join(
            f"{k}={res[k][-1]:.0f}us" for k in fns), flush=True)

    best = {k: min(v) for k, v in res.items()}
    out = {
        "floor_us": round(floor, 1),
        "rounds": args.rounds,
        "best_us": {k: round(v, 1) for k, v in best.items()},
        "prefix_speedup_pallas_vs_descent": round(
            best["prefix_descent"] / best["prefix_pallas"], 3
        ),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "PALLAS_DECISION.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
