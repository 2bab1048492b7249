"""Pallas TPU kernel for the PER sampling hot path.

One op survives here: **prefix-sum sampling** over the dense PER
priorities (:mod:`pfrl_tpu.replay.sum_tree`). The pure-XLA descent is
``log2(capacity)`` *dependent* [B]-gathers, each a round trip to the HBM
tree; the Pallas kernel streams the flat priority array through VMEM in
one launch, fusing the cumsum and the per-target counting (MXU triangular
matmuls — Mosaic has no cumsum primitive).

It has a pure-jax reference implementation (the one the PER buffer uses by
default); ``prefix_sample_pallas`` runs compiled on TPU and in interpreter
mode elsewhere, so CPU tests exercise the same kernel code the TPU runs.
Reference behavior being replaced: the pointer sum-tree descent
(pfrl/collections/prioritized.py:126-232).

Measured verdict (TPU v5e via tunnel; bench.py's pallas_ab interleaves the
alternatives and takes min-of-rounds because the tunnel's per-dispatch
latency is bimodal): the streaming kernel beats the 17-level tree descent
by a small, reproducible margin in good-window captures — 1,372 vs
1,430 µs (BENCH_r03) and 1,422 vs 1,497 µs (BENCH_LATEST r03), ~4-5%,
ties inside degraded windows. It stays **off by default**
(``use_pallas="auto"`` = XLA) and is explicit opt-in.

Two further kernels were built in rounds 1-3 and CUT in round 4 on the
accumulated evidence (VERDICT r3 item 4: "win >= 1.3x or delete"):

* a row gather + dequantize (``gather_rows_dequantize_pallas``) — lost to
  the XLA gather ~3x in every capture (5.6k vs 15-18k µs at the 100k-row
  Atari ring); XLA's gather kernel is already bandwidth-optimal here and
  the Pallas per-row DMA pipeline was not.
* a fused PER sample + gather + dequantize — measured a wash against the
  XLA composite across three rounds (1,529/1,547, 1,483/1,602, 1,453/1,532
  µs), never the >=1.3x the fusion story promised: the descent dominates
  both sides, and the gather the fusion saves is cheap. Inside the fused
  training scan the custom call also defeated XLA's aliasing of the
  multi-GB replay ring (67x end-to-end regression, r1).

The replay buffers default to XLA everywhere; the surviving kernel is
taken only on explicit ``use_pallas=True``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# --------------------------------------------------------------------------
# Streaming prefix-sum sampling over flat priorities
# --------------------------------------------------------------------------
#
# TPU-native PER sampling does not want a tree at all. The pointer tree's
# O(log n) descent/update is optimal for a *serial* machine; on TPU each of
# the log2(C) levels is a *dependent* HBM gather (sampling) or scatter+gather
# (update), i.e. ~17 serialized round trips at C=1e5. The streaming design
# keeps priorities as one flat [C] array: updates are a single scatter, and
# sampling one linear scan — `index(t) = #{i : cumsum(p)[i] <= t}` — which
# reads each priority exactly once at full HBM bandwidth. The kernel below
# fuses the cumsum and the per-target counting into one pass, carrying the
# running total in scratch across a sequential chunk grid.

_ROWS = 64      # sublane rows per chunk (8192 priorities per grid step) —
                # sized so PrioritizedReplayBuffer's smallest power-of-two
                # tree capacity (8192) is still one whole chunk; two-level
                # counting keeps per-chunk VPU work tiny at any ROWS
_CHUNK = _ROWS * 128   # priorities per grid step
_MAX_PALLAS_BATCH = 128  # [B, ROWS] compare + one-hot tensors must fit VMEM


def _prefix_count_chunk(x, t, carry):
    """Count prefix entries <= each target within one [ROWS, 128] chunk.

    Two-level counting instead of a naive [B, ROWS, 128] compare (32x less
    VPU work at B=32): (1) rows whose cumulative total is <= t contribute
    128 elements via a [B, ROWS] compare; (2) the single crossing row per
    target is fetched with a one-hot MXU matmul and refined with a [B, 128]
    compare. All cumsums come from MXU triangular matmuls (Mosaic has no
    cumsum primitive).

    Returns (count[B, 1] f32, chunk_total scalar f32).
    """
    rows = x.shape[0]
    a = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    upper = (a <= b).astype(jnp.float32)
    within = jax.lax.dot_general(
        x, upper, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                        # [ROWS, 128] within-row incl.
    row_sum = within[:, 127:128]             # [ROWS, 1] (last prefix col)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    s = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    strict_lower = (s < r).astype(jnp.float32)
    offsets = jax.lax.dot_general(
        strict_lower, row_sum, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [ROWS, 1] exclusive row prefix
    rcs = (offsets + row_sum)[:, 0][None, :] + carry   # [1, ROWS] inclusive

    full_rows = jnp.sum(
        (rcs <= t).astype(jnp.float32), axis=1, keepdims=True
    )                                        # [B, 1] rows entirely <= t
    # Crossing row (first with rcs > t), fetched by one-hot matmul.
    B = t.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (B, rows), 1)
    onehot = (row_ids == full_rows.astype(jnp.int32)).astype(jnp.float32)
    rowvals = jax.lax.dot_general(
        onehot, within + offsets, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [B, 128] crossing-row prefix
    partial = jnp.sum(
        (rowvals + carry <= t).astype(jnp.float32), axis=1, keepdims=True
    )
    # No crossing row inside this chunk (t beyond it): refine contributes 0.
    partial = jnp.where(full_rows < rows, partial, 0.0)
    chunk_total = offsets[rows - 1, 0] + row_sum[rows - 1, 0]
    return 128.0 * full_rows + partial, chunk_total


def _prefix_sample_kernel(prio_ref, targets_ref, out_ref, carry_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0, 0] = jnp.float32(0.0)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    count, chunk_total = _prefix_count_chunk(
        prio_ref[:], targets_ref[:], carry_ref[0, 0]
    )
    acc_ref[:] = acc_ref[:] + count
    carry_ref[0, 0] = carry_ref[0, 0] + chunk_total

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def prefix_sample_pallas(
    priorities: jax.Array, targets: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """``out[b] = #{i : cumsum(priorities)[i] <= targets[b]}``.

    One streaming pass over ``priorities`` (length padded to a multiple of
    8192 by the caller contract: trailing pad must be zero, which cannot
    change counts for in-range targets). Equivalent to the root-to-leaf
    descent of :func:`pfrl_tpu.replay.sum_tree.sample_from_prefix` on a tree
    whose leaves are ``priorities``. Counts accumulate in f32 — exact for
    counts below 2**24, far above any replay capacity's count per target.
    """
    (c,) = priorities.shape
    assert c % _CHUNK == 0, f"pad priorities to a multiple of {_CHUNK}"
    batch = targets.shape[0]
    assert batch <= _MAX_PALLAS_BATCH, "use prefix_sample_reference for big B"
    num_chunks = c // _CHUNK
    out = pl.pallas_call(
        _prefix_sample_kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0)),
            pl.BlockSpec((batch, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((batch, 1), lambda i: (0, 0)),
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.VMEM((batch, 1), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        interpret=interpret,
    )(priorities.reshape(c // 128, 128), targets[:, None].astype(jnp.float32))
    return out[:, 0]


def prefix_sample_reference(priorities: jax.Array, targets: jax.Array) -> jax.Array:
    """Pure-XLA equivalent (two passes: cumsum, then compare-count)."""
    cs = jnp.cumsum(priorities)
    return jnp.sum(cs[None, :] <= targets[:, None], axis=1).astype(jnp.int32)


def prefix_sample(priorities, targets):
    """Fused single-pass Pallas kernel on TPU, XLA elsewhere.

    Explicit-opt-in helper: the PER buffer defaults to the tree descent
    (see module docstring's measured verdict).
    """
    if (
        _on_tpu()
        and priorities.shape[0] % _CHUNK == 0
        and targets.shape[0] <= _MAX_PALLAS_BATCH
    ):
        return prefix_sample_pallas(priorities, targets)
    return prefix_sample_reference(priorities, targets)
