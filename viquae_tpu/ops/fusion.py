"""On-device late fusion: impute + normalize + weighted-sum + top-k in XLA.

The reference's best retrieval configs are LATE FUSIONS of several indexes
(DPR + ArcFace + CLIP + ImageNet, weights [0.3, 0.2, 0.2, 0.2], gzmuv norm,
default-minimum imputation — experiments/ir/viquae/dpr+arcface+clip+
imagenet/config_test.json; fusion math in meerqat/ir/fuse.py:86-149). The
host path for offline eval lives in `rankeval.fusion` / `ir.fuse`; this
module is the SERVING path: given each index's top-k' (scores, ids) already
on device, it fuses them into one ranking without a host round-trip, so a
multi-index query costs one XLA dispatch end-to-end
(`ir.serving.MultiIndexRetrievalPipeline`).

Semantics match the host pipeline `default_minimum -> normalize_run ->
fuse(wsum)` exactly (parity-tested vs rankeval in
tests/test_fusion_device.py), including the subtle ORDER: imputation runs
FIRST (ir/fuse.py Fusion(defmin=True)), so gzmuv/zmuv statistics are taken
over the IMPUTED multiset — each query contributes U_q entries per index
(U_q = |union of doc ids across indexes|), of which U_q - p_iq duplicate
index i's per-query minimum. Rather than materializing imputed runs, the
statistics use closed forms with U_q, and each doc's fused score decomposes
as

    fused(d) = sum_i w_i * norm_i(m_iq)                      [baseline_q]
             + sum_{i : d in run_i} w_i * (s_i(d) - m_iq) / sigma_i

(for affine norms; min-max analogous), so the union-merge only ever sums
per-retrieval CONTRIBUTIONS: concatenate all (doc_id, contribution) pairs,
sort by id, segmented-sum runs of equal ids via
`jax.lax.associative_scan`, keep each run's last element, one top-k. All
shapes static: T = sum_i k_i candidate lanes per query (4 x 100 = 400 —
trivial next to the MIPS scan). The batch plays the role of the run for
gzmuv's global statistics (the reference normalizes over its full query
set; a serving batch is its full query set).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_NEG = jnp.float32(-jnp.inf)
_INT_MAX = jnp.iinfo(jnp.int32).max


@functools.partial(jax.jit, static_argnames=("k", "norm", "weights"))
def fuse_topk(
    scores_list: Sequence[jnp.ndarray],
    idx_list: Sequence[jnp.ndarray],
    weights: Tuple[float, ...],
    k: int,
    norm: Optional[str] = "gzmuv",
    valid_queries: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted-sum late fusion of per-index top-k' results, on device.

    scores_list[i]: (Q, k_i) scores from index i (any float dtype);
    idx_list[i]: (Q, k_i) int32 doc ids (GLOBAL id space shared by all
    indexes — the KB row, as in the reference where every index is built
    over the same KB). Padded entries must carry id int32-max with score
    -inf (the topk_* convention); they are ignored everywhere.

    norm: "gzmuv" | "zmuv" | "min-max" | None, matching
    `rankeval.fusion.normalize_run` applied AFTER default-minimum
    imputation (ir.fuse.Fusion(defmin=True) order). "raw" skips BOTH
    normalization and imputation: a doc absent from an index contributes
    0 — the legacy ES interpolation semantics of the reference's committed
    search configs (experiments/ir/viquae/bm25/config.json
    `interpolation_weight`, whose mean/std pre-normalization callers apply
    to the scores beforehand).

    valid_queries: optional scalar — rows >= it are PADDING (a serving
    batch smaller than the compiled shape); they are excluded from gzmuv's
    global statistics so garbage rows cannot skew real queries'
    normalization (per-row norms are unaffected by other rows).

    Returns (fused_scores, doc_ids) of shape (Q, k), ranked descending,
    ties by ascending doc id; absolute scores match the host fusion.
    """
    if not (len(scores_list) == len(idx_list) == len(weights)):
        raise ValueError("scores_list, idx_list and weights lengths differ")
    if norm not in ("gzmuv", "zmuv", "min-max", "raw", None):
        raise ValueError(f"unknown device-fusion norm {norm!r}; "
                         "expected gzmuv|zmuv|min-max|raw|None")

    # ---- pass 1: per-query union size U_q across all indexes -------------
    # (the ids are sorted ONCE here; the contribution payload is permuted
    # by the same order later via argsort-free two-array sort reuse)
    all_idx = jnp.concatenate(
        [i.astype(jnp.int32) for i in idx_list], axis=1)
    order = jnp.argsort(all_idx, axis=-1)
    idx_sorted_early = jnp.take_along_axis(all_idx, order, axis=1)
    # run-boundary flags over the sorted ids, computed ONCE: 'starts'
    # seeds the segmented scan below; 'distinct' additionally drops the
    # int32-max pad lanes for the union count
    starts = jnp.concatenate([
        jnp.ones_like(idx_sorted_early[:, :1], dtype=bool),
        idx_sorted_early[:, 1:] != idx_sorted_early[:, :-1],
    ], axis=1)
    distinct = starts & (idx_sorted_early != _INT_MAX)
    u_q = distinct.sum(axis=1).astype(jnp.float32)[:, None]  # (Q, 1)
    q_count_total = all_idx.shape[0]
    if valid_queries is None:
        row_mask = jnp.ones((q_count_total, 1), jnp.float32)
    else:
        row_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (q_count_total, 1), 0)
            < valid_queries
        ).astype(jnp.float32)

    # ---- per-index: imputed-run statistics (closed form) + contributions -
    contribs, baseline = [], 0.0
    for s_raw, ids, w in zip(scores_list, idx_list, weights):
        valid = ids != _INT_MAX
        s = jnp.where(valid, s_raw.astype(jnp.float32), 0.0)
        p = valid.sum(axis=1).astype(jnp.float32)[:, None]  # present count
        # a query with NO results in this run contributes nothing at all
        # (host default_minimum: "queries with empty results stay empty") —
        # e.g. a faceless query against the face index
        row_has = valid.any(axis=1, keepdims=True)
        m = jnp.where(
            valid, s_raw.astype(jnp.float32), jnp.inf
        ).min(axis=1, keepdims=True)                        # per-query min
        m = jnp.where(row_has, m, 0.0)                      # empty query
        n_imp = jnp.where(row_has, jnp.maximum(u_q - p, 0.0), 0.0)
        if norm in ("gzmuv", "zmuv"):
            s1 = s.sum(axis=1, keepdims=True) + n_imp * m
            s2 = (s * s).sum(axis=1, keepdims=True) + n_imp * m * m
            stat_mask = row_mask * row_has  # this run's real, in-batch rows
            if norm == "gzmuv":
                count = jnp.maximum((u_q * stat_mask).sum(), 1.0)
                mean = (s1 * stat_mask).sum() / count
                var = (s2 * stat_mask).sum() / count - mean * mean
            else:
                count = jnp.maximum(u_q, 1.0)
                mean = s1 / count
                var = s2 / count - mean * mean
            sigma = jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), 1e-9)
            contrib = w * (s_raw.astype(jnp.float32) - m) / sigma
            baseline = baseline + jnp.where(
                row_has, w * (m - mean) / sigma, 0.0)
        elif norm == "raw":
            contrib = w * s_raw.astype(jnp.float32)
            baseline = baseline + 0.0 * m
        elif norm == "min-max":
            # duplicated minima change neither per-query min nor max
            hi = jnp.where(
                valid, s_raw.astype(jnp.float32), -jnp.inf
            ).max(axis=1, keepdims=True)
            hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
            span = jnp.maximum(hi - m, 1e-9)
            contrib = w * (s_raw.astype(jnp.float32) - m) / span
            baseline = baseline + 0.0 * m  # normalized minimum is 0
        else:  # norm is None
            contrib = w * (s_raw.astype(jnp.float32) - m)
            baseline = baseline + w * m
        contribs.append(jnp.where(valid, contrib, 0.0))

    # ---- union-merge: reuse pass 1's id order for the contributions ------
    all_c = jnp.concatenate(contribs, axis=1)
    idx_sorted = idx_sorted_early
    c_sorted = jnp.take_along_axis(all_c, order, axis=1)

    def seg_combine(a, b):
        # (value, start_flag): segmented inclusive sum, associative
        v_a, g_a = a
        v_b, g_b = b
        return jnp.where(g_b, v_b, v_a + v_b), g_a | g_b

    totals, _ = jax.lax.associative_scan(
        seg_combine, (c_sorted, starts), axis=1
    )
    ends = jnp.concatenate([
        idx_sorted[:, :-1] != idx_sorted[:, 1:],
        jnp.ones_like(idx_sorted[:, :1], dtype=bool),
    ], axis=1)
    keep = ends & (idx_sorted != _INT_MAX)
    fused = jnp.where(keep, totals, _NEG)
    # duplicate (non-end) lanes carry real ids with -inf scores: blank them
    # so -inf output slots never leak a doc id
    idx_sorted = jnp.where(keep, idx_sorted, _INT_MAX)

    kk = min(k, fused.shape[1])
    top, pos = jax.lax.top_k(fused, kk)
    top_idx = jnp.take_along_axis(idx_sorted, pos, axis=1)
    neg, top_idx = jax.lax.sort((-top, top_idx), dimension=-1, num_keys=2)
    top = -neg
    # add the per-query baseline back so ABSOLUTE scores match the host
    # fusion, not just the ranking; padded slots stay -inf
    top = jnp.where(jnp.isfinite(top), top + baseline, top)
    if kk < k:
        q_count = top.shape[0]
        top = jnp.concatenate(
            [top, jnp.full((q_count, k - kk), _NEG, top.dtype)], axis=1)
        top_idx = jnp.concatenate(
            [top_idx, jnp.full((q_count, k - kk), _INT_MAX, jnp.int32)],
            axis=1)
    return top, top_idx
