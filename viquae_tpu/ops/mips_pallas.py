"""Pallas fused MIPS scoring kernels.

The XLA path (ops.mips.topk_global) runs matmul and segment-max as
separate HLOs: the (Q, N) scores are written to HBM by the matmul and
re-read by the reduction (measured 43.6 ms vs 20.9 ms for a fused
matmul+rowmax that writes nothing, 1280 x 1.5M bf16 on v5e). The kernels
here fuse them: one pass over the KB computes each score tile on the MXU
in VMEM and emits BOTH the scores and the per-128-lane segment maxima, so

- the KB is streamed exactly once,
- segment maxima cost no extra HBM read of the 3.8GB score matrix,
- selection happens ONCE globally (two-level segmented top-k over the
  (Q, N/128) maxima, then a single candidate gather + final sort) instead
  of per-chunk select + merge.

Exactness contract matches ops.mips mode="fast" (ties at the k-th segment/
candidate boundary may swap equal-scored duplicates; impossible for
distinct scores).

TWO layouts live here:

- `topk_fused` / `fused_score_segmax_qmajor` (the production path): the KB
  is passed PRE-TRANSPOSED (d, N) so the matmul emits scores Q-MAJOR with
  no in-kernel transpose AND a cheap axis-1 candidate gather. Segment
  maxima are emitted as a 3D (n_tiles, Q, segs_per_tile) output written
  full-block per grid step (Mosaic crashes on sub-lane `pl.ds` stores into
  a grid-resident block, and rejects a (Q, segs<128) 2D block layout).
  Measured 54.1 ms end-to-end exact vs 69.8 ms for XLA topk_global
  (1280 x 1.5M bf16, k=100, v5e), kernel alone 29.3 ms.

- `topk_pallas` / `fused_score_segmax` (kept as the documented tied
  experiment): scores kb-major, which makes the in-kernel reduction free
  but the downstream gather walk axis 0 (~200 ms) — rejected.
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


# --------------------------------------------------------------------------
# q-major fused kernel (the production exact path)
# --------------------------------------------------------------------------
def _make_qmajor_kernel(tile: int):
    segs = tile // _SEG

    def kernel(q_ref, kbt_ref, nv_ref, scores_ref, segmax_ref):
        i = pl.program_id(0)
        s = jax.lax.dot_general(
            q_ref[:], kbt_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Q, tile) q-major: no transpose, MXU-native
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * tile
        s = jnp.where(col < nv_ref[0, 0], s, -jnp.inf)
        s = s.astype(scores_ref.dtype)
        scores_ref[:] = s
        # lane-group max: (Q, segs, 128) -> (Q, segs), emitted (1, Q, segs)
        segmax_ref[:] = s.reshape(s.shape[0], segs, _SEG).max(axis=2)[None]

    return kernel, segs


@functools.partial(jax.jit, static_argnames=("tile",))
def to_kernel_layout(kb: jnp.ndarray, tile: int = 512) -> jnp.ndarray:
    """(N, d) row-major KB -> the kernel's (d, N_pad) layout, columns
    zero-padded to a multiple of `tile` (mask padding with valid_rows=N).
    The single owner of the layout contract — bench/serving/scripts build
    their transposed matrices here."""
    n, dim = kb.shape
    pad = (-n) % tile
    kb_t = kb.T
    if pad:
        kb_t = jnp.concatenate(
            [kb_t, jnp.zeros((dim, pad), kb.dtype)], axis=1)
    return kb_t


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_score_segmax_qmajor(
    queries: jnp.ndarray,
    kb_t: jnp.ndarray,
    valid_rows: jnp.ndarray,
    tile: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q, d) x (d, N) -> scores (Q, N) bf16 + segmax (n_tiles, Q, tile/128).

    `kb_t` is the TRANSPOSED KB, (d, N) with N % tile == 0; `valid_rows` a
    scalar int — columns >= it score -inf (mask fused into the kernel
    epilogue, not a second 3.8GB pass). tile=512 is the validated config:
    1024+ currently crashes the Mosaic remote compiler on v5e, and VMEM
    (f32 accumulator Q x tile) caps tile anyway.

    One KB stream on the MXU emits both outputs — the segment maxima cost
    no extra HBM traffic (29.3 ms vs 43.6 ms for XLA's matmul + re-read
    segmax at 1280 x 1.5M bf16).
    """
    q_count, dim = queries.shape
    n = kb_t.shape[1]
    assert n % tile == 0, (
        f"kb_t columns ({n}) must be padded to a multiple of tile={tile}"
    )
    kernel, segs = _make_qmajor_kernel(tile)
    nv = valid_rows.astype(jnp.int32).reshape(1, 1)
    interpret = jax.default_backend() == "cpu"  # tests on the virtual mesh
    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((q_count, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_count, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q_count, segs), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q_count, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((n // tile, q_count, segs), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_count * n * dim,
            bytes_accessed=(queries.size * 2 + kb_t.size * 2
                            + q_count * n * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries.astype(jnp.bfloat16), kb_t.astype(jnp.bfloat16), nv)


def _topk_fused_single(queries, kb_t, k: int, nv, tile: int):
    """One fused-kernel pass + selection tail over the full (d, N) slab."""
    q_count = queries.shape[0]
    n = kb_t.shape[1]
    scores, segmax3 = fused_score_segmax_qmajor(queries, kb_t, nv, tile=tile)
    n_seg = n // _SEG
    segmax = jnp.moveaxis(segmax3, 0, 1).reshape(q_count, n_seg)
    p = min(n_seg, k)
    # plain lax.top_k for the segment select: at n_seg ~ 11.7k with k=100
    # the two-level _select_topk "fast" scheme DEGENERATES (sqrt-segments
    # ~ 92 < k, candidate pool = full width) into gathers + the same full
    # sort — measured 2 ms slower than the direct sort at 1280 x 1.5M
    # (scripts/exp_fused_decomp.py C vs V1)
    _, seg_idx = jax.lax.top_k(segmax, p)
    seg = scores.reshape(q_count, n_seg, _SEG)
    # candidates stay in the score dtype (bf16 on the serving path): the
    # finalize sort moves half the bytes, and f32<-bf16 is lossless so the
    # selection order is identical (exp_fused_decomp V5)
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
    cand = cand.reshape(q_count, p * _SEG)
    cand_idx = (
        seg_idx[:, :, None] * _SEG
        + jax.lax.broadcasted_iota(jnp.int32, (q_count, p, _SEG), 2)
    ).reshape(q_count, p * _SEG)
    # shared tail: top-k + -inf-lane blanking + tie-order restore + pad
    # to k (topk_sharded's all-gather merge needs uniform (Q, k) shards
    # even when k exceeds one shard's row count)
    out_s, out_i = mips.finalize_topk(cand, cand_idx, k)
    return out_s.astype(jnp.float32), out_i


@functools.partial(jax.jit, static_argnames=("k", "tile", "chunks"))
def topk_fused(
    queries: jnp.ndarray,
    kb_t: jnp.ndarray,
    k: int,
    valid_rows: Optional[jnp.ndarray] = None,
    tile: int = 512,
    chunks: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact bf16 MIPS top-k over a pre-transposed (d, N) KB.

    The fastest exact path on one chip (54.1 ms vs 69.8 ms for XLA
    topk_global at 1280 x 1.5M, k=100): fused kernel -> two-level select
    over the maxima -> axis-1 candidate gather -> top-k + FAISS tie-order
    sort. Same selection contract as ops.mips mode="fast"/topk_global
    (reference: FAISS IndexFlatIP, meerqat/ir/search.py:207-249).

    chunks > 1 processes the KB in that many column slabs (each a tile
    multiple), merging per-slab top-k by (-score, global id): the
    materialized score buffer shrinks from (Q, N) to (Q, N/chunks) —
    e.g. 3.8GB -> 1.9GB at 1280 x 1.5M with chunks=2 — for HBM-squeezed
    windows (the shared-chip round-4 finding). Result identical to
    chunks=1 incl. tie order (the merge sort key matches finalize_topk's).
    """
    n = kb_t.shape[1]
    # valid_rows=None means EVERY column is a real KB row. If kb_t came
    # from to_kernel_layout on a non-tile-aligned KB, the padded zero
    # columns would be eligible hits (score 0.0 beats negative scores) —
    # pass valid_rows=N whenever the layout may be padded. All production
    # entry points (DenseIndex mode="fused", topk_sharded, serving) do.
    nv = jnp.asarray(n if valid_rows is None else valid_rows)
    if chunks <= 1:
        return _topk_fused_single(queries, kb_t, k, nv, tile)
    n_tiles = n // tile
    per = -(-n_tiles // chunks) * tile  # slab width, a tile multiple
    parts_s, parts_i = [], []
    int_max = jnp.iinfo(jnp.int32).max
    for c in range(chunks):
        lo = c * per
        if lo >= n:
            break
        width = min(per, n - lo)
        local_valid = jnp.clip(nv - lo, 0, width)
        s, i = _topk_fused_single(
            queries, jax.lax.slice_in_dim(kb_t, lo, lo + width, axis=1),
            k, local_valid, tile)
        # shift local ids to global; keep the pad sentinel unshifted
        i = jnp.where(i == int_max, i, i + lo)
        parts_s.append(s)
        parts_i.append(i)
    all_s = jnp.concatenate(parts_s, axis=1)
    all_i = jnp.concatenate(parts_i, axis=1)
    neg, idx = jax.lax.sort((-all_s, all_i), dimension=-1, num_keys=2)
    return -neg[:, :k], idx[:, :k]


# --------------------------------------------------------------------------
# kb-major fused kernel (kept: the documented tied/rejected experiment)
# --------------------------------------------------------------------------
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

    Same contract as ops.mips.topk_single(mode="fast"): kb rows beyond
    `valid_rows` are masked out, results pad to k with NEG_INF/int32-max
    when k exceeds the valid pool, and any query count is accepted
    (queries pad internally to the kernel's q_block granularity).
    """
    q_real, dim = queries.shape
    n_real = kb.shape[0]
    pad = (-n_real) % tile
    if pad:
        kb = jnp.concatenate([kb, jnp.zeros((pad, dim), kb.dtype)])
    n = n_real + pad
    # the default masks the INTERNAL padding added above: it must count
    # the ORIGINAL rows, not the padded shape (zero pad rows score 0.0
    # and would out-rank real negative scores)
    nv = jnp.int32(n_real if valid_rows is None else valid_rows)

    # the kb-major kernel requires q_count % q_block == 0: pad queries
    # with zero rows (their outputs are sliced off below)
    q_block = min(640, q_real)
    q_pad = (-q_real) % q_block
    if q_pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((q_pad, dim), queries.dtype)])
    q_count = q_real + q_pad

    scores_t, segmax_t = fused_score_segmax(queries, kb, tile=tile)
    segmax = segmax_t.T

    # mask padded/invalid segments out of the maxima. Fully-invalid
    # segments drop to NEG_INF; the PARTIALLY-valid boundary segment
    # (nv cuts mid-segment) needs its max RECOMPUTED over valid rows only
    # — the kernel's unmasked max would let a high-scoring invalid row
    # inflate the segment, displacing a fully-valid segment that holds a
    # true top-k element (the candidate-gather mask below then silently
    # loses that element, returning WRONG results, not tie swaps). One
    # 128-row dynamic slice of the materialized kb-major scores fixes it
    # without an (N, Q) row-id mask.
    n_seg = n // _SEG
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (q_count, n_seg), 1)
    segmax = jnp.where(seg_ids * _SEG < nv, segmax, mips.NEG_INF)
    boundary = nv // _SEG  # dynamic; == n_seg (a no-op below) when nv == n
    bstart = jnp.minimum(boundary * _SEG, n - _SEG)
    bslice = jax.lax.dynamic_slice(
        scores_t, (bstart, 0), (_SEG, q_count)).astype(jnp.float32)
    brows = bstart + jnp.arange(_SEG, dtype=jnp.int32)[:, None]
    bmax = jnp.max(jnp.where(brows < nv, bslice, mips.NEG_INF), axis=0)
    segmax = jnp.where(seg_ids == boundary, bmax[:, None], segmax)

    # top-k segments via the two-level scheme (exact modulo equal-score ties)
    _, seg_idx = mips._select_topk(segmax, min(k, n_seg), "fast")

    # gather the selected segments' scores + global ids from the kb-major
    # scores: out[i, q] = scores_t[rows[i, q], q]
    gather_cols = (
        seg_idx[:, :, None] * _SEG
        + jax.lax.broadcasted_iota(jnp.int32, (q_count, seg_idx.shape[1], _SEG), 2)
    ).reshape(q_count, -1)
    cand = jnp.take_along_axis(scores_t, gather_cols.T, axis=0).T
    cand = jnp.where(gather_cols < nv, cand.astype(jnp.float32),
                     mips.NEG_INF)
    scores_out, idx_out = mips.finalize_topk(cand, gather_cols, k)
    return scores_out[:q_real], idx_out[:q_real]
