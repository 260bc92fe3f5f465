"""Pallas fused MIPS scoring kernel.

The XLA path (ops.mips.topk_single) runs matmul and segment-max as separate
HLOs per chunk: the (Q, C) f32 scores are written to HBM by the matmul and
re-read by the reduction, and selection runs per chunk with a merge chain.
This kernel fuses them: one pass over the KB computes each score tile on
the MXU in VMEM and emits BOTH the scores and the per-128-lane segment
maxima, so

- the KB is streamed exactly once,
- segment maxima cost no extra HBM read,
- selection happens ONCE globally (two-level segmented top-k over the
  (Q, N/128) maxima, then a single candidate gather + final sort) instead
  of per-chunk select + merge.

Exactness contract matches ops.mips mode="fast" (ties at the k-th segment/
candidate boundary may swap equal-scored duplicates; impossible for
distinct scores).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from viquae_tpu.ops import mips

_SEG = 128


def _score_segmax_kernel(q_ref, kb_ref, scores_t_ref, segmax_t_ref):
    """One grid step: scores tile (kb-major) + per-128-row segment maxima.

    EVERYTHING is computed transposed — scores as (tile, q_block), segment
    maxima as (tile/128, q_block) — so the segment reduction runs over axis
    0 with NO in-kernel transpose. (An earlier layout emitting (Q, tile)
    scores needed a per-step (q, 8)->(8, q) transpose for the maxima, which
    Mosaic executed at ~0.4 ms/step — 8.6x slower than XLA overall. The
    kb-major layout also satisfies Mosaic's (8, 128)-aligned store rule
    for both outputs.)"""
    scores_t = jax.lax.dot_general(
        kb_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tile, q_block)
    scores_t_ref[:] = scores_t.astype(scores_t_ref.dtype)
    tile, q_block = scores_t.shape
    seg = scores_t.reshape(tile // _SEG, _SEG, q_block)
    segmax_t_ref[:] = seg.max(axis=1)


@functools.partial(jax.jit, static_argnames=("tile", "q_block"))
def fused_score_segmax(queries: jnp.ndarray, kb: jnp.ndarray,
                       tile: int = 1024, q_block: int = 640
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, d) x (N, d) -> scores_t (N, Q) + segmax_t (N/128, Q), kb-major.

    Scores inherit bf16 when inputs are bf16 (halves the HBM write) and are
    f32 for f32 inputs. N must be a multiple of `tile` (>= 1024). A query
    block stays resident while its KB pass streams (kb innermost grid dim).
    """
    q_count, dim = queries.shape
    n = kb.shape[0]
    segs_per_step = tile // _SEG
    assert tile % _SEG == 0 and segs_per_step % 8 == 0, (
        f"tile={tile} must give >= 8 segments per step (tile >= 1024)"
    )
    assert n % tile == 0, (n, tile)
    q_block = min(q_block, q_count)
    assert q_count % q_block == 0, (q_count, q_block)
    # grid (q_tiles, kb_tiles): kb streams innermost so a query block stays
    # resident while its KB pass runs; VMEM budget (v5e: 16MB scoped) caps
    # q_block x tile (f32 matmul intermediate + bf16 scores out + kb tiles)
    grid = (q_count // q_block, n // tile)
    interpret = jax.default_backend() == "cpu"  # tests on the virtual mesh
    scores_dtype = (
        jnp.float32 if queries.dtype == jnp.float32 else jnp.bfloat16
    )
    return pl.pallas_call(
        _score_segmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_block, dim), lambda qi, ki: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dim), lambda qi, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, q_block), lambda qi, ki: (ki, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((segs_per_step, q_block), lambda qi, ki: (ki, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, q_count), scores_dtype),
            jax.ShapeDtypeStruct((n // _SEG, q_count), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_count * n * dim,
            bytes_accessed=(
                queries.size * queries.dtype.itemsize
                + kb.size * kb.dtype.itemsize
                + q_count * n * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, kb)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def topk_pallas(
    queries: jnp.ndarray,
    kb: jnp.ndarray,
    k: int,
    valid_rows: Optional[jnp.ndarray] = None,
    tile: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full MIPS top-k via the fused kernel + one global selection.

    Same contract as ops.mips.topk_single(mode="fast"); kb rows beyond
    `valid_rows` are masked out.
    """
    q_count, dim = queries.shape
    n = kb.shape[0]
    pad = (-n) % tile
    if pad:
        kb = jnp.concatenate([kb, jnp.zeros((pad, dim), kb.dtype)])
        n += pad
    nv = jnp.int32(kb.shape[0] if valid_rows is None else valid_rows)

    scores_t, segmax_t = fused_score_segmax(queries, kb, tile=tile)
    segmax = segmax_t.T

    # mask padded/invalid segments out of the maxima (scores of invalid rows
    # can only win via the segment gate, so masking segmax suffices unless a
    # partially-valid segment's invalid rows dominate — handle those by
    # masking the candidate gather below as well)
    n_seg = n // _SEG
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (q_count, n_seg), 1)
    segmax = jnp.where(seg_ids * _SEG < nv, segmax, mips.NEG_INF)

    # top-k segments via the two-level scheme (exact modulo equal-score ties)
    _, seg_idx = mips._select_topk(segmax, min(k, n_seg), "fast")

    # gather the selected segments' scores + global ids from the kb-major
    # scores: out[i, q] = scores_t[rows[i, q], q]
    gather_cols = (
        seg_idx[:, :, None] * _SEG
        + jax.lax.broadcasted_iota(jnp.int32, (q_count, seg_idx.shape[1], _SEG), 2)
    ).reshape(q_count, -1)
    cand = jnp.take_along_axis(scores_t, gather_cols.T, axis=0).T
    cand = jnp.where(gather_cols < nv, cand, mips.NEG_INF)
    top_scores, pos = jax.lax.top_k(cand, k)
    top_idx = jnp.take_along_axis(gather_cols, pos, axis=1)
    neg, top_idx = jax.lax.sort(
        (-top_scores, top_idx), dimension=-1, num_keys=2
    )
    return -neg[:, :k], top_idx[:, :k]
