#!/usr/bin/env python
"""Decisive Pallas win-or-cut A/B (VERDICT r3 item 4).

Gates on a good tunnel window (synced-dispatch floor < 150 µs — degraded
windows invalidate kernel-level comparisons), then runs >= 5 interleaved
rounds of each replay-kernel A/B at the 1M-slot Atari configuration and
prints min-of-rounds per side plus the win ratios. The decision rule from
the verdict: the fused kernel must beat the XLA composite by >= 1.3x
min-of-rounds or be deleted; prefix_sample stays only if it wins.

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
    cap, rows = 100_000, 221
    storage = jnp.ones((cap, rows, 128), jnp.uint8)
    flat = storage.reshape(cap, rows * 128)
    ids = jnp.arange(batch, dtype=jnp.int32) * 771
    cap_t = 131_072
    prio = jax.random.uniform(jax.random.PRNGKey(0), (cap_t,)) + 0.01
    tree = sum_tree.update(sum_tree.init_tree(cap_t), jnp.arange(cap_t), prio)
    leaves = tree[cap_t:]
    targets = jax.random.uniform(
        jax.random.PRNGKey(1), (batch,), maxval=float(sum_tree.total(tree)) * 0.999
    )
    storage_t = jnp.ones((cap_t, 224, 128), jnp.uint8)
    flat_t = storage_t.reshape(cap_t, 224 * 128)

    def composite(tree, targets, flat):
        ids = sum_tree.sample_from_prefix(tree, targets)
        return ids, flat[ids].astype(jnp.float32) * (1 / 255.0)

    jit_descent = jax.jit(sum_tree.sample_from_prefix)
    jit_comp = jax.jit(composite)
    jit_xgather = jax.jit(lambda s, i: s[i].astype(jnp.float32) * (1 / 255.0))

    def _force(out):
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf)

    fns = {
        "gather_pallas": lambda: pk.gather_rows_dequantize_pallas(
            storage, ids, scale=1 / 255.0, out_dtype=jnp.float32
        ),
        "gather_xla": lambda: jit_xgather(flat, ids),
        "prefix_pallas": lambda: pk.prefix_sample_pallas(leaves, targets),
        "prefix_descent": lambda: jit_descent(tree, targets),
        "fused_pallas": lambda: pk.per_sample_gather_dequantize_pallas(
            leaves, targets, storage_t, scale=1 / 255.0
        ),
        "fused_xla_composite": lambda: jit_comp(tree, targets, flat_t),
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
        "gather_speedup_pallas_vs_xla": round(best["gather_xla"] / best["gather_pallas"], 3),
        "prefix_speedup_pallas_vs_descent": round(best["prefix_descent"] / best["prefix_pallas"], 3),
        "fused_speedup_pallas_vs_composite": round(
            best["fused_xla_composite"] / best["fused_pallas"], 3
        ),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "PALLAS_DECISION.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
