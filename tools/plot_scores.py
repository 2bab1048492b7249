#!/usr/bin/env python
"""Plot scores.txt learning curves (reference parity: tools/plot_scores.py).

Usage: python tools/plot_scores.py <scores.txt> [more ...] [--out curves.png]
Falls back to an ASCII sparkline when matplotlib is unavailable.
"""

import argparse
import csv


def read_scores(path):
    with open(path) as f:
        reader = csv.DictReader(f, delimiter="\t")
        rows = list(reader)
    steps = [int(float(r["steps"])) for r in rows]
    means = [float(r["mean"]) for r in rows]
    return steps, means


def ascii_plot(steps, means, width=70):
    lo, hi = min(means), max(means)
    span = hi - lo or 1.0
    blocks = "▁▂▃▄▅▆▇█"
    line = "".join(
        blocks[int((m - lo) / span * (len(blocks) - 1))] for m in means[:width]
    )
    print(f"[{lo:.1f} .. {hi:.1f}] {line}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    series = [(f, *read_scores(f)) for f in args.files]
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for name, steps, means in series:
            plt.plot(steps, means, label=name)
        plt.xlabel("steps")
        plt.ylabel("mean eval return")
        plt.legend()
        out = args.out or "scores.png"
        plt.savefig(out, dpi=120, bbox_inches="tight")
        print(f"wrote {out}")
    except ImportError:
        for name, steps, means in series:
            print(name)
            ascii_plot(steps, means)


if __name__ == "__main__":
    main()
