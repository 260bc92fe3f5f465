"""Sharded maximum-inner-product search (the FAISS replacement).

The reference delegates KNN to FAISS flat IP indexes built over dataset
columns (meerqat/ir/search.py:207-249, string_factory "Flat"/"L2norm,Flat",
metric_type=0) and searches them in query batches of 256
(ir/search.py:135-146). Here the KB embedding matrix lives ON DEVICE:

- single chip: `lax.scan` over KB chunks; each step is a (Q, d) x (d, C)
  MXU matmul + running top-k merge, so HBM traffic is one streaming read of
  the KB and the working set stays in VMEM-sized tiles chosen by XLA.
- multi chip: the KB is row-sharded over the mesh's `kb` axis
  (`shard_map`); each device computes local top-k over its shard with
  global ids, then a `jax.lax.all_gather` over ICI merges candidates.

Tie-breaking contract (FAISS-flat parity, SURVEY.md §7 "hard parts"):
equal scores rank by ascending KB index. Chunk-local `lax.top_k` already
breaks ties by lowest index; cross-chunk/cross-shard merges re-sort with a
two-key lexicographic `lax.sort` on (-score, index), so the merged ranking
is deterministic and identical to a full argsort.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from viquae_tpu.core import mesh as meshlib

NEG_INF = jnp.float32(-jnp.inf)


# --------------------------------------------------------------------------
# reference implementation (host, exact) — used by parity tests
# --------------------------------------------------------------------------
def exact_topk_numpy(queries: np.ndarray, kb: np.ndarray, k: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k by full argsort; ties broken by ascending index
    (FAISS IndexFlatIP contract)."""
    scores = queries.astype(np.float32) @ kb.astype(np.float32).T
    # stable sort on -scores => ties keep ascending index order
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


# --------------------------------------------------------------------------
# device-side building blocks
# --------------------------------------------------------------------------
def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-L2 norm (reference `L2norm`, ir/search.py:43-46)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _merge_topk(scores_a, idx_a, scores_b, idx_b, k: int):
    """Merge two candidate sets into top-k, ties by ascending global index."""
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    neg, idx_sorted = jax.lax.sort((-scores, idx), dimension=-1, num_keys=2)
    return -neg[..., :k], idx_sorted[..., :k]


_SEG = 128  # VPU lane width; segment size for two-level selection

INT32_MAX = jnp.iinfo(jnp.int32).max


def finalize_topk(cand: jnp.ndarray, cand_idx: jnp.ndarray, k: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate pool -> final (Q, k) under the repo-wide topk contract.

    One place for the tail every selection path shares (topk_global,
    mips_pallas.topk_fused/topk_pallas grew three drifting copies — two of
    which forgot the pad sentinel): top_k over the pool, -inf lanes
    blanked to the int32-max pad id BEFORE the FAISS tie-order restore
    (so they sort last), then NEG_INF/int32-max padding out to k when the
    pool is narrower than k (k > n or k > one shard's rows —
    jax.lax.top_k CRASHES on k > pool otherwise)."""
    q_count, pool = cand.shape
    kk = min(k, pool)
    top_scores, pos = jax.lax.top_k(cand, kk)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    top_idx = jnp.where(top_scores <= NEG_INF, INT32_MAX, top_idx)
    neg, top_idx = jax.lax.sort((-top_scores, top_idx), dimension=-1,
                                num_keys=2)
    scores_out, idx_out = -neg, top_idx
    if kk < k:
        scores_out = jnp.concatenate([
            scores_out, jnp.full((q_count, k - kk), NEG_INF,
                                 scores_out.dtype)], axis=1)
        idx_out = jnp.concatenate([
            idx_out, jnp.full((q_count, k - kk), INT32_MAX, jnp.int32)],
            axis=1)
    return scores_out, idx_out


def _select_topk(scores: jnp.ndarray, k: int, mode: str):
    """Top-k over the last axis of (Q, C) scores.

    mode="exact": `lax.top_k` — XLA lowers this to a full sort, ~O(C log^2 C)
        VPU passes; guaranteed FAISS-flat tie order, slow for wide C.
    mode="fast" (default): two-level segmented selection. Split the row into
        C/128 lane-width segments, take each segment's max (cheap VPU
        reduce), keep the top-k segments, then top-k over the k*128 gathered
        candidates. Any global top-k element lives in a segment whose max is
        >= the k-th score, and at most k segments can hold such elements, so
        the candidate set provably contains the true top-k. The selected k
        are then re-sorted by (-score, index) to restore global tie order.
        Only failure vs "exact": exact score TIES straddling the k-th
        segment/candidate boundary may swap which tied duplicate is kept —
        impossible for distinct scores.
    mode="approx": `lax.approx_max_k` (TPU PartialReduce), recall ~0.95.
    """
    q_count, width = scores.shape
    # "global" is the topk_global ENGINE name, not a selection mode: its
    # selection IS the fast two-level scheme (accepting it here then
    # raising below was an accept-then-reject trap)
    if mode == "global":
        mode = "fast"
    if mode not in ("exact", "fast", "approx"):
        raise ValueError(f"unknown top-k mode {mode!r}; "
                         "expected exact|fast|global|approx")
    if mode == "exact" or width < 2 * _SEG:
        return jax.lax.top_k(scores, k)
    if mode == "approx":
        return jax.lax.approx_max_k(scores, k, aggregate_to_topk=True)
    pad = (-width) % _SEG
    if pad:
        # pad to lane width with NEG_INF rather than falling back to the
        # full-sort top_k (topk_global's segment-max row has width
        # n/128, rarely lane-aligned — the fallback silently cost ~15 ms
        # per 1280x1.5M batch in round 1)
        scores = jnp.concatenate([
            scores,
            jnp.full((q_count, pad), NEG_INF, scores.dtype),
        ], axis=1)
        width += pad
    n_seg = width // _SEG
    seg = scores.reshape(q_count, n_seg, _SEG)
    seg_max = seg.max(axis=2)
    p = min(n_seg, k)
    _, seg_idx = jax.lax.top_k(seg_max, p)  # (Q, p)
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
    cand = cand.reshape(q_count, p * _SEG)
    cand_idx = (
        seg_idx[:, :, None] * _SEG
        + jax.lax.broadcasted_iota(jnp.int32, (q_count, p, _SEG), 2)
    ).reshape(q_count, p * _SEG)
    # NOTE: a third selection level over 8-wide sub-segments was tried and
    # REJECTED: the extra take_along_axis gathers cost more than the smaller
    # final sort saves (409 ms vs 167 ms per 1.28k x 1.5M batch on v5e).
    top_scores, pos = jax.lax.top_k(cand, k)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    # candidates were ordered by segment rank, not index: restore tie order
    neg, top_idx = jax.lax.sort((-top_scores, top_idx), dimension=-1, num_keys=2)
    return -neg, top_idx


def _chunk_topk(q, chunk, base_index: jnp.ndarray, k: int, valid_rows: int,
                compute_dtype, mode: str):
    """Top-k of q @ chunk.T with global indices; padded rows masked out."""
    # fp32 inputs must use HIGHEST precision: the TPU default lowers f32
    # matmuls to one-pass bf16, which breaks FAISS-flat score parity
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    scores = jnp.dot(
        q.astype(compute_dtype),
        chunk.astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    row_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(row_ids < valid_rows, scores, NEG_INF)
    top_scores, top_idx = _select_topk(scores, k, mode)
    return top_scores, top_idx + base_index


@functools.partial(
    jax.jit, static_argnames=("k", "chunk_size", "compute_dtype", "mode")
)
def topk_single(
    queries: jnp.ndarray,
    kb: jnp.ndarray,
    k: int,
    chunk_size: int = 262144,
    valid_rows: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    mode: str = "fast",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device streaming MIPS.

    Parameters
    ----------
    queries: (Q, d); kb: (N, d) — N may include padding rows.
    valid_rows: scalar count of real KB rows (defaults to N).
    compute_dtype: jnp.float32 for bit-parity tests, jnp.bfloat16 for speed
        (accumulation is always fp32 via preferred_element_type).
    """
    n = kb.shape[0]
    nv = jnp.int32(n if valid_rows is None else valid_rows)
    chunk_size = min(chunk_size, n)
    n_chunks = -(-n // chunk_size)
    pad = n_chunks * chunk_size - n
    if pad:
        kb = jnp.concatenate([kb, jnp.zeros((pad, kb.shape[1]), kb.dtype)])
    kb_chunks = kb.reshape(n_chunks, chunk_size, kb.shape[1])

    q_count = queries.shape[0]
    init = (
        jnp.full((q_count, k), NEG_INF, jnp.float32),
        jnp.full((q_count, k), jnp.iinfo(jnp.int32).max, jnp.int32),
    )

    def step(carry, args):
        chunk_i, chunk = args
        base = chunk_i * chunk_size
        c_scores, c_idx = _chunk_topk(
            queries, chunk, base, min(k, chunk_size), nv - base,
            compute_dtype, mode,
        )
        return _merge_topk(*carry, c_scores, c_idx, k), None

    (scores, idx), _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), kb_chunks)
    )
    # lanes masked to -inf (beyond valid_rows, when valid < k) carry real-
    # but-INVALID chunk-local ids: blank them to the int32-max pad
    # convention fuse_topk / qa_serving key on
    idx = jnp.where(scores <= NEG_INF, INT32_MAX, idx)
    return scores, idx


@functools.partial(
    jax.jit,
    static_argnames=("k", "compute_dtype", "mode", "transposed",
                     "recall_target"),
)
def topk_global(
    queries: jnp.ndarray,
    kb: jnp.ndarray,
    k: int,
    valid_rows: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    mode: str = "exact",
    transposed: bool = False,
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-pass MIPS: materialize ALL scores once (bf16 for bf16 inputs,
    halving the HBM write vs chunked f32), then ONE global two-level
    segmented selection — no per-chunk select/merge chain. Fastest exact
    path when the (Q, N) score matrix fits HBM (1280 x 1.5M bf16 = 3.8GB);
    fall back to `topk_single` beyond that.

    Outcome of the Pallas fused-kernel experiment (ops/mips_pallas.py): the
    matmul itself was already at parity with XLA; the whole win is score
    dtype + single global selection, which plain XLA expresses fine.
    """
    if mode not in ("exact", "approx"):
        raise ValueError(f"unknown topk_global mode {mode!r}; "
                         "expected exact|approx")
    # transposed=True: kb is (d, N) — the mips_pallas.topk_fused layout —
    # so one device copy can serve both the fused exact and approx paths
    # (holding BOTH layouts at 1.5M x 768 costs 4.6GB and OOMs the chip
    # next to the 3.8GB score matrix)
    n = kb.shape[1] if transposed else kb.shape[0]
    nv = jnp.int32(n if valid_rows is None else valid_rows)
    pad = (-n) % _SEG
    if pad:
        if transposed:
            kb = jnp.concatenate(
                [kb, jnp.zeros((kb.shape[0], pad), kb.dtype)], axis=1)
        else:
            kb = jnp.concatenate(
                [kb, jnp.zeros((pad, kb.shape[1]), kb.dtype)])
        n += pad
    precision = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    kb_t = kb.astype(compute_dtype) if transposed else kb.astype(compute_dtype).T
    scores = jnp.dot(
        queries.astype(compute_dtype), kb_t,
        preferred_element_type=jnp.float32, precision=precision,
    )
    if compute_dtype != jnp.float32:
        scores = scores.astype(jnp.bfloat16)
    q_count = queries.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (q_count, n), 1)
    scores = jnp.where(col_ids < nv, scores, jnp.asarray(NEG_INF, scores.dtype))
    if mode == "approx":
        # TPU PartialReduce fuses the selection into the matmul consumer —
        # no (Q, N) score materialization; measured 29ms vs 73ms exact at
        # 1280 x 1.5M on v5e with R@20-vs-exact ~ 0.97
        # recall_target trades selection speed for per-call recall (the TPU
        # PartialReduce picks its reduction shape from it); 0.99 measures
        # R@20-vs-exact ~0.999 on real DPR embeddings
        kk = min(k, n)  # approx_max_k crashes on k > n (per-shard calls)
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, kk, recall_target=recall_target, aggregate_to_topk=True
        )
        return finalize_topk(top_scores.astype(jnp.float32), top_idx, k)
    n_seg = n // _SEG
    seg = scores.reshape(q_count, n_seg, _SEG)
    seg_max = seg.max(axis=2)
    p = min(n_seg, k)
    # segments selected with the two-level scheme (n_seg itself is wide)
    _, seg_idx = _select_topk(seg_max.astype(jnp.float32), p, "fast")
    cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
    cand = cand.reshape(q_count, p * _SEG).astype(jnp.float32)
    cand_idx = (
        seg_idx[:, :, None] * _SEG
        + jax.lax.broadcasted_iota(jnp.int32, (q_count, p, _SEG), 2)
    ).reshape(q_count, p * _SEG)
    return finalize_topk(cand, cand_idx, k)


def topk_sharded(
    queries: jnp.ndarray,
    kb_shards: jnp.ndarray,
    k: int,
    mesh_ctx: Optional[meshlib.MeshContext] = None,
    chunk_size: int = 262144,
    valid_rows: Optional[int] = None,
    compute_dtype=jnp.float32,
    mode: str = "fast",
    recall_target: float = 0.99,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-chip MIPS: per-shard streaming top-k + all-gather merge over ICI.

    `kb_shards` is (N_padded, d) row-sharded over the `kb` mesh axis
    (N_padded a multiple of the axis size). Queries are replicated. Returns
    replicated (Q, k) scores/global indices identical to `topk_single` on the
    unsharded matrix.
    """
    ctx = mesh_ctx or meshlib.current()
    # mode="fused" takes the KB pre-transposed (d, N_pad), column-sharded
    # over `kb` (the Pallas q-major kernel layout, ops/mips_pallas.py)
    n_pad = kb_shards.shape[1] if mode == "fused" else kb_shards.shape[0]
    n_dev = ctx.kb_size
    assert n_pad % n_dev == 0, (n_pad, n_dev)
    rows_per_shard = n_pad // n_dev
    nv = n_pad if valid_rows is None else valid_rows

    def shard_fn(q, kb_local):
        shard_i = jax.lax.axis_index(meshlib.KB_AXIS)
        base = shard_i * rows_per_shard
        local_valid = jnp.clip(jnp.int32(nv) - base, 0, rows_per_shard)
        if mode == "fused":
            from viquae_tpu.ops import mips_pallas  # avoid import cycle

            s, i = mips_pallas.topk_fused(
                q, kb_local, k, valid_rows=local_valid,
            )
        elif mode == "global":
            s, i = topk_global(
                q, kb_local, k, valid_rows=local_valid,
                compute_dtype=compute_dtype,
            )
        elif mode == "approx":
            # per-shard approx selection must honor the index's tuned
            # recall target (the bare topk_single route used the library
            # default 0.95 and silently degraded sharded recall)
            s, i = topk_global(
                q, kb_local, k, valid_rows=local_valid,
                compute_dtype=compute_dtype, mode="approx",
                recall_target=recall_target,
            )
        else:
            s, i = topk_single(
                q, kb_local, k, chunk_size=chunk_size,
                valid_rows=local_valid, compute_dtype=compute_dtype, mode=mode,
            )
        # shift local->global ids, but keep the int32-max pad sentinel
        # (emitted by topk_fused when k exceeds a shard's valid columns)
        # unshifted: base + INT_MAX wraps to negative garbage otherwise
        pad_id = jnp.iinfo(jnp.int32).max
        i = jnp.where(i == pad_id, i, i + base)
        # gather candidates from every shard: (n_dev, Q, k) -> merge
        all_s = jax.lax.all_gather(s, meshlib.KB_AXIS)
        all_i = jax.lax.all_gather(i, meshlib.KB_AXIS)
        all_s = jnp.moveaxis(all_s, 0, -1).reshape(q.shape[0], n_dev * k)
        all_i = jnp.moveaxis(all_i, 0, -1).reshape(q.shape[0], n_dev * k)
        neg, idx = jax.lax.sort((-all_s, all_i), dimension=-1, num_keys=2)
        return -neg[:, :k], idx[:, :k]

    fn = jax.shard_map(
        shard_fn,
        mesh=ctx.mesh,
        in_specs=(
            P(),
            P(None, meshlib.KB_AXIS) if mode == "fused" else P(meshlib.KB_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, kb_shards)


# --------------------------------------------------------------------------
# index object — the on-device "FAISS index"
# --------------------------------------------------------------------------
class DenseIndex:
    """A device-resident flat MIPS index over one embedding column.

    Mirrors the role of `datasets.Dataset.add_faiss_index` +
    `search_batch` (meerqat/ir/search.py:135-146, 207-249): built from an
    (N, d) array, optionally L2-normalizing both sides (the reference's
    "L2norm,Flat" factory), searched in batches, save/load-able.
    """

    def __init__(
        self,
        vectors: np.ndarray,
        do_l2norm: bool = False,
        mesh_ctx: Optional[meshlib.MeshContext] = None,
        dtype=jnp.float32,
        chunk_size: int = 262144,
        mode: str = "fast",
        approx_recall_target: float = 0.99,
    ):
        self.mesh_ctx = mesh_ctx or meshlib.current()
        self.do_l2norm = do_l2norm
        self.chunk_size = chunk_size
        if mode not in ("exact", "fast", "global", "approx", "fused"):
            raise ValueError(f"unknown top-k mode {mode!r}; "
                             "expected exact|fast|global|approx|fused")
        self.mode = mode
        self.approx_recall_target = approx_recall_target
        self.n, self.d = vectors.shape
        if mode == "fused":
            # the Pallas q-major kernel is bf16-only (scores are written
            # bf16; the fp32 FAISS contract lives on the XLA modes)
            dtype = jnp.bfloat16
        self.dtype = dtype

        n_dev = self.mesh_ctx.kb_size
        # pad rows so the matrix shards evenly; search masks the padding.
        # fused mode additionally needs each shard tile-aligned for the
        # Pallas grid. Non-fused modes align to _SEG (128): topk_global
        # pads unaligned KBs to a 128-multiple INSIDE the jit — a full-KB
        # device copy (~2.3GB at 1.5Mx768 bf16) on every dispatch if the
        # stored matrix isn't already aligned
        block = n_dev * (512 if mode == "fused" else _SEG)
        n_pad = meshlib.pad_to_multiple(self.n, block)
        mat = np.zeros((n_pad, self.d), dtype=np.float32)
        mat[: self.n] = vectors
        if do_l2norm:
            norms = np.linalg.norm(mat[: self.n], axis=1, keepdims=True)
            mat[: self.n] /= np.maximum(norms, 1e-12)
        if mode == "fused":
            # store TRANSPOSED (d, N): the kernel streams (d, tile) column
            # blocks so the matmul emits q-major scores with no transpose
            device_mat = jnp.asarray(mat.T, dtype=dtype)
            if n_dev > 1:
                device_mat = jax.device_put(
                    device_mat, self.mesh_ctx.sharding(None, meshlib.KB_AXIS)
                )
        else:
            device_mat = jnp.asarray(mat, dtype=dtype)
            if n_dev > 1:
                device_mat = jax.device_put(
                    device_mat, self.mesh_ctx.kb_sharded)
        self.matrix = device_mat

    def search_batch(self, queries, k: int = 100, sync: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores, indices) of the top-k KB rows per query.

        Accepts a device array (kept on device — the serving path) or any
        array-like (uploaded once). With sync=False the results stay device
        arrays and the call returns as soon as XLA dispatches — the serving
        loop uses this to overlap host result-formatting of batch i with
        device compute of batch i+1 (a per-batch np.asarray sync was the
        dominant serving tax over the tunneled link)."""
        if isinstance(queries, jax.Array):
            q = queries.astype(jnp.float32)
        else:
            q = jnp.asarray(np.asarray(queries), dtype=jnp.float32)
        if self.do_l2norm:
            q = l2_normalize(q)
        # snapshot the COUNT before the MATRIX (the documented live-add
        # ordering: add() binds the matrix first and the count last, so
        # count-then-matrix can only lag — matrix-then-count could mask
        # old-matrix alignment padding as valid rows that score 0.0)
        n = self.n
        matrix = self.matrix
        k = min(k, n)
        if self.mode == "fused":
            # the Pallas kernel is bf16-only: cast queries like the
            # serving entry point (ir/serving._device_search) does, so
            # both entry points score identically
            q = q.astype(self.dtype)
            if self.mesh_ctx.kb_size > 1:
                scores, idx = topk_sharded(
                    q, matrix, k, mesh_ctx=self.mesh_ctx,
                    valid_rows=n, compute_dtype=self.dtype,
                    mode="fused",
                )
            else:
                from viquae_tpu.ops import mips_pallas

                scores, idx = mips_pallas.topk_fused(
                    q, matrix, k, valid_rows=jnp.int32(n)
                )
        elif self.mesh_ctx.kb_size > 1:
            scores, idx = topk_sharded(
                q, matrix, k, mesh_ctx=self.mesh_ctx,
                chunk_size=self.chunk_size, valid_rows=n,
                compute_dtype=self.dtype, mode=self.mode,
                recall_target=self.approx_recall_target,
            )
        elif self.mode in ("global", "approx") or (
            self.mode == "fast"
            and q.shape[0] * matrix.shape[0]
            * (4 if self.dtype == jnp.float32 else 2) <= 4 * 2 ** 30
        ):
            # single-pass global selection: 2x the chunked path when the
            # (Q, N) bf16 score matrix fits comfortably in HBM; "approx"
            # additionally swaps exact selection for lax.approx_max_k
            scores, idx = topk_global(
                q, matrix, k, valid_rows=jnp.int32(n),
                compute_dtype=self.dtype,
                mode="approx" if self.mode == "approx" else "exact",
                recall_target=self.approx_recall_target,
            )
        else:
            scores, idx = topk_single(
                q, matrix, k, chunk_size=self.chunk_size,
                valid_rows=jnp.int32(n), compute_dtype=self.dtype,
                mode=self.mode,
            )
        if not sync:
            return scores, idx
        return np.asarray(scores), np.asarray(idx)

    # ---- incremental updates (parity with faiss IndexFlat.add: new rows
    #      get sequential ids after the existing ones) ---------------------
    def add(self, vectors) -> None:
        """Append rows to the index without a host-side rebuild.

        FAISS flat indexes support incremental `add()` (the reference
        rebuilds via `dataset.add_faiss_index`, but serving KBs grow);
        here the device matrix's alignment padding absorbs small adds
        in place (one `dynamic_update_slice`), and larger adds extend
        the matrix on device (transiently ~2x the matrix in HBM, like a
        realloc). New rows take ids [n, n+m); searches see them
        immediately (`valid_rows` masks only the remaining padding).
        """
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.d:
            raise ValueError(
                f"expected (m, {self.d}) vectors, got {vectors.shape}")
        m = len(vectors)
        if m == 0:
            return
        if self.do_l2norm:
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        fused = self.mode == "fused"
        n_pad_cur = (self.matrix.shape[1] if fused
                     else self.matrix.shape[0])
        new_n = self.n + m
        if new_n > n_pad_cur:
            # extend with zero padding to the next aligned size first
            n_dev = self.mesh_ctx.kb_size
            block = n_dev * (512 if fused else _SEG)
            n_pad_new = meshlib.pad_to_multiple(new_n, block)
            if fused:
                pad = jnp.zeros((self.d, n_pad_new - n_pad_cur), self.dtype)
                mat = jnp.concatenate([self.matrix, pad], axis=1)
            else:
                pad = jnp.zeros((n_pad_new - n_pad_cur, self.d), self.dtype)
                mat = jnp.concatenate([self.matrix, pad], axis=0)
        else:
            mat = self.matrix
        upd = jnp.asarray(vectors.T if fused else vectors, self.dtype)
        start = (0, self.n) if fused else (self.n, 0)
        mat = jax.lax.dynamic_update_slice(mat, upd, start)
        if self.mesh_ctx.kb_size > 1:
            sharding = (self.mesh_ctx.sharding(None, meshlib.KB_AXIS)
                        if fused else self.mesh_ctx.kb_sharded)
            mat = jax.device_put(mat, sharding)
        self.matrix = mat
        self.n = new_n

    def reconstruct_batch(self, ids) -> np.ndarray:
        """Return the STORED vectors for `ids` (float32) — FAISS
        `reconstruct` semantics: an L2norm index returns the normalized
        rows it searches, a bf16 index the bf16-quantized values."""
        ids = np.asarray(ids)
        if ids.size and (ids.min() < 0 or ids.max() >= self.n):
            raise IndexError(f"ids outside [0, {self.n})")
        if self.mode == "fused":
            out = np.asarray(self.matrix[:, ids].T if ids.size
                             else np.zeros((0, self.d)))
        else:
            out = np.asarray(self.matrix[ids])
        return out.astype(np.float32)

    # ---- persistence (parity with faiss index save/load,
    #      ir/search.py:246-248) -------------------------------------------
    def save(self, path):
        """Persist the vectors THIS index searches. NOTE: a bf16 index
        (mode='fused', or dtype=bfloat16) persists bf16-quantized values
        (upcast to f32 for the file) — reloading them into an fp32 mode
        gives the fp32 FAISS contract over the QUANTIZED data, not the
        original vectors. The source dtype is recorded in the file."""
        mat = np.asarray(self.matrix)
        if self.mode == "fused":
            mat = mat.T  # stored (d, N); persist the (N, d) contract
        np.savez(
            path,
            vectors=mat[: self.n].astype(np.float32),
            do_l2norm=self.do_l2norm,
            source_dtype=np.str_(jnp.dtype(self.dtype).name),
        )

    @classmethod
    def load(cls, path, **kwargs):
        data = np.load(path if str(path).endswith(".npz") else f"{path}.npz")
        # saved vectors are already normalized if do_l2norm was set
        idx = cls(data["vectors"], do_l2norm=False, **kwargs)
        idx.do_l2norm = bool(data["do_l2norm"])
        return idx


class StreamingDenseIndex:
    """Host-resident flat MIPS index streamed through the chip — for KBs
    BEYOND HBM.

    One v5e holds ~3M bf16 768-d rows device-resident next to the serving
    score buffer (docs/SCALING.md); past that the device matrix can't
    exist. This index keeps the vectors in host RAM and searches by
    streaming fixed-size row chunks: upload chunk c+1 (async device_put)
    BEFORE dispatching chunk c's score+select step, so on hardware with a
    real DMA path the upload of the next chunk overlaps the current
    matmul. Per-chunk top-k merges ride a jitted running-carry step with
    ONE compiled shape (the tail chunk zero-pads + masks).

    Same `search_batch` contract and FAISS tie order as DenseIndex.
    Role parity: FAISS serves RAM-resident indexes on CPU the same way
    (the reference's `datasets.add_faiss_index` KB lives in host RAM —
    /root/reference/meerqat/ir/search.py:207-249).

    NOTE on the attached rig: the tunneled link moves ~13 MB/s, so
    streaming 1.5M x 768 bf16 (2.3 GB) costs minutes per batch — this
    class is for deployment topologies (PCIe/DCN hosts), correctness-
    tested here on the virtual mesh.
    """

    def __init__(self, vectors: np.ndarray, chunk_rows: int = 262144,
                 do_l2norm: bool = False, dtype=jnp.bfloat16):
        vectors = np.asarray(vectors, np.float32)
        self.n, self.d = vectors.shape
        self.do_l2norm = do_l2norm
        self.dtype = dtype
        self.mode = "streaming"  # chunked engine: FusedRetrievalPipeline's
        # single-pass check rejects it with a real message, not an
        # AttributeError; the base RetrievalPipeline serves it fine
        self.chunk_rows = int(chunk_rows)
        if do_l2norm:
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        # pre-chunked host arrays in the COMPUTE dtype (halves link bytes
        # for bf16) — the tail chunk zero-pads to the common shape
        self._chunks = []
        np_dtype = np.dtype(jnp.dtype(dtype).name) if dtype != jnp.bfloat16 \
            else None
        for start in range(0, self.n, self.chunk_rows):
            chunk = vectors[start: start + self.chunk_rows]
            if len(chunk) < self.chunk_rows:
                chunk = np.concatenate([
                    chunk, np.zeros((self.chunk_rows - len(chunk), self.d),
                                    np.float32)])
            if np_dtype is not None:
                chunk = chunk.astype(np_dtype)
            else:
                import ml_dtypes

                chunk = chunk.astype(ml_dtypes.bfloat16)
            self._chunks.append(np.ascontiguousarray(chunk))

    def add(self, vectors) -> None:
        """Append rows (host-side; FAISS IndexFlat.add contract, same id
        semantics as DenseIndex.add). The tail chunk's padding absorbs
        rows in place; overflow starts new chunks."""
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim != 2 or vectors.shape[1] != self.d:
            raise ValueError(
                f"expected (m, {self.d}) vectors, got {vectors.shape}")
        if len(vectors) == 0:
            return
        if self.do_l2norm:
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        np_dtype = (np.dtype(jnp.dtype(self.dtype).name)
                    if self.dtype != jnp.bfloat16 else None)
        if np_dtype is None:
            import ml_dtypes

            vectors = vectors.astype(ml_dtypes.bfloat16)
        else:
            vectors = vectors.astype(np_dtype)
        pos = self.n
        for row in range(0, len(vectors)):
            ci, off = divmod(pos + row, self.chunk_rows)
            if ci == len(self._chunks):
                self._chunks.append(np.zeros(
                    (self.chunk_rows, self.d), vectors.dtype))
            self._chunks[ci][off] = vectors[row]
        self.n = pos + len(vectors)

    def _get_step(self):
        """ONE jitted merge step per index instance: jit caches key on the
        function object, so building a fresh closure per search_batch call
        (the old shape) retraced — and cold-recompiled — every batch."""
        if getattr(self, "_step", None) is None:
            self._step = self._build_step()
        return self._step

    def _build_step(self):
        import functools

        @functools.partial(jax.jit, static_argnames=("k",))
        def step(q, chunk, carry_s, carry_i, base, valid, k):
            precision = (jax.lax.Precision.HIGHEST
                         if chunk.dtype == jnp.float32
                         else jax.lax.Precision.DEFAULT)
            scores = jnp.dot(q, chunk.T, precision=precision,
                             preferred_element_type=jnp.float32)
            if chunk.dtype != jnp.float32:
                scores = scores.astype(jnp.bfloat16)
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < valid, scores,
                               jnp.asarray(NEG_INF, scores.dtype))
            kk = min(k, self.chunk_rows)
            s, i = _select_topk(scores.astype(jnp.float32), kk, "fast")
            i = jnp.where(s <= NEG_INF, INT32_MAX, i + base)
            if kk < k:
                pad_s = jnp.full((s.shape[0], k - kk), NEG_INF, s.dtype)
                pad_i = jnp.full((s.shape[0], k - kk), INT32_MAX, jnp.int32)
                s = jnp.concatenate([s, pad_s], axis=1)
                i = jnp.concatenate([i, pad_i], axis=1)
            return _merge_topk(carry_s, carry_i, s, i, k)

        return step

    def search_batch(self, queries, k: int = 100, sync: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        if isinstance(queries, jax.Array):
            q = queries.astype(jnp.float32)
        else:
            q = jnp.asarray(np.asarray(queries), jnp.float32)
        if self.do_l2norm:
            q = l2_normalize(q)
        q = q.astype(self.dtype)
        q_count = q.shape[0]
        # snapshot the count ONCE: each chunk's valid width derives from
        # the same n as the chunk list length, so a concurrent add() can
        # only lag a batch — per-iteration self.n reads could count rows
        # appended AFTER a chunk's upload as valid zeros in the old copy
        n = self.n
        if n == 0:
            empty_s = np.full((q_count, k), NEG_INF, np.float32)
            empty_i = np.full((q_count, k), INT32_MAX, np.int32)
            if not sync:
                return jnp.asarray(empty_s), jnp.asarray(empty_i)
            return empty_s, empty_i
        k_eff = min(k, n)
        step = self._get_step()
        n_chunks = (n + self.chunk_rows - 1) // self.chunk_rows
        carry_s = jnp.full((q_count, k_eff), NEG_INF, jnp.float32)
        carry_i = jnp.full((q_count, k_eff), INT32_MAX, jnp.int32)
        # double-buffered streaming: the NEXT chunk's device_put is issued
        # before the CURRENT chunk's compute dispatch
        dev = jax.device_put(self._chunks[0])
        for ci in range(n_chunks):
            nxt = (jax.device_put(self._chunks[ci + 1])
                   if ci + 1 < n_chunks else None)
            base = jnp.int32(ci * self.chunk_rows)
            valid = jnp.int32(
                min(self.chunk_rows, n - ci * self.chunk_rows))
            carry_s, carry_i = step(q, dev, carry_s, carry_i, base, valid,
                                    k=k_eff)
            dev = nxt
        if k_eff < k:
            carry_s = jnp.concatenate([
                carry_s, jnp.full((q_count, k - k_eff), NEG_INF,
                                  carry_s.dtype)], axis=1)
            carry_i = jnp.concatenate([
                carry_i, jnp.full((q_count, k - k_eff), INT32_MAX,
                                  jnp.int32)], axis=1)
        if not sync:
            return carry_s, carry_i
        return np.asarray(carry_s), np.asarray(carry_i)
