#!/usr/bin/env python
"""One-command TPU tunnel link-state probe.

Prints the synced-dispatch floor in µs (trivial jitted op, value-readback
synced — block_until_ready can acknowledge early over this tunnel).
Good windows: ~30-40 µs. Degraded windows (minutes-to-HOURS long):
~0.6-35 ms, deflating every throughput measurement 2-3x. All bench
artifacts in this repo annotate the floor they were captured under
(BENCH_LATEST.json dispatch_floor_us, SCALING/PIPELINE
dispatch_floor_us_per_run); run this before trusting a fresh number.

Exit code: 0 good (< 150 µs), 3 degraded.
"""

import sys
import time


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros(())
    float(np.asarray(f(x)))  # compile
    best = float("inf")
    for _ in range(30):
        t0 = time.time()
        float(np.asarray(f(x)))
        best = min(best, time.time() - t0)
    us = best * 1e6
    state = "good" if us < 150.0 else "DEGRADED"
    print(f"dispatch floor: {us:.1f} us ({state}; backend={jax.default_backend()})")
    sys.exit(0 if us < 150.0 else 3)


if __name__ == "__main__":
    main()
