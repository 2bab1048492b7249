"""Deterministic action extraction (reference parity: pfrl/utils/mode_of_distribution.py:5-19)."""

from typing import Any


def mode_of_distribution(distrib: Any):
    """Return the mode of a pfrl_tpu distribution.

    Every distribution in :mod:`pfrl_tpu.distributions` exposes ``.mode()``;
    the reference needed isinstance-dispatch over torch.distributions, which
    had no mode accessor before torch 1.12.
    """
    return distrib.mode()
