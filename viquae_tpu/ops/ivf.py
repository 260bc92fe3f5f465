"""TPU-native IVF-Flat MIPS index (FAISS ``IVF{nlist},Flat`` parity).

The reference passes ``string_factory`` straight through to
``Dataset.add_faiss_index`` (meerqat/ir/search.py:207-249), so IVF-class
factories are part of its config surface; this module supplies the
inverted-file index the flat `ops/mips.DenseIndex` doesn't cover.

TPU-first design (vs FAISS's per-list CPU scans / GPU warp kernels):

- **k-means trains on device**: Lloyd iterations where assignment is one
  ``(sample, nlist)`` matmul (MXU) + argmax and the centroid update is a
  ``segment_sum`` — all static shapes inside one jitted ``lax.scan``, on
  a FAISS-style training subsample (``train_points_per_list`` per list).
- **Storage is cluster-sorted**: ONE contiguous ``(N, d)`` device matrix
  whose rows are grouped by list, plus per-list ``(starts, sizes)``.
  Probing a list is therefore a *contiguous block read* at full HBM
  bandwidth, not a scattered gather — the layout does the work a CPU
  implementation does with per-list arrays.
- **Search is one static-shape program**: ``(Q, nlist)`` centroid matmul
  → ``top_k`` probes → a ``lax.scan`` over probes slicing ``(q, P, d)``
  row blocks → masked scores → the repo-wide ``finalize_topk`` tail
  (FAISS tie order: score desc, id asc; int32-max pad lanes). ``P`` is
  the max list size (compile-time constant per index).

When to use which index (measured, scripts/exp_ivf.py + PARITY.md): IVF
reads ``nprobe x list_cap`` rows *per query*, the flat scan reads the KB
ONCE for the whole batch. At 1.5M x 768 bf16 the full scan is ~3 ms of
HBM traffic and every small-batch latency sits at this link's ~30 ms
dispatch floor, so IVF never wins there (batch-1: 32.4 vs 31.7 ms;
batch-128: 203 vs 32 ms at nprobe=8). IVF's regime is KBs ~10x larger —
where the flat scan is many times the dispatch floor or no longer fits
HBM beside the serving programs — and it exists here primarily as FAISS
``IVF{nlist},Flat`` factory parity. Keep the exact/fused `DenseIndex`
for serving 1.5M-class KBs at any batch size.

Divergences from FAISS (documented, loud):
- ``add()`` after build is not supported (the cluster-sorted layout
  would need a rebuild); use `DenseIndex` for live-add serving KBs.
- k-means empty lists keep their previous centroid (FAISS splits the
  largest cluster); probing an empty list contributes nothing.
- Lists larger than ``max_list_factor x N/nlist`` are split into capped
  sublists sharing the parent centroid (the static probe window pays the
  MAX list size, so one skewed list would tax every probe); ``nlist``
  and ``nprobe`` therefore count sublists after a skewed build.
"""
from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.ops.mips import NEG_INF, INT32_MAX, finalize_topk, l2_normalize

_HIGH = jax.lax.Precision.HIGHEST


# --------------------------------------------------------------------------
# k-means (device Lloyd iterations on a training subsample)
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("nlist",))
def _kmeanspp_init(key, sample: jnp.ndarray, nlist: int) -> jnp.ndarray:
    """k-means++ seeding on device: each next centroid is drawn with
    probability proportional to its squared distance from the chosen set.
    One (S,) distance update per step inside a lax.scan — random-row init
    left 8x mean/max list-size skew at KB scale (padded probe windows pay
    for the max), ++ seeding cuts the spread.
    """
    s, d = sample.shape
    norms2 = jnp.sum(sample * sample, axis=1)
    first = jax.random.randint(key, (), 0, s)
    c0 = sample[first]
    mind0 = norms2 - 2.0 * jnp.dot(sample, c0, precision=_HIGH) \
        + jnp.dot(c0, c0, precision=_HIGH)

    def step(carry, k_i):
        mind, cs = carry
        p = jnp.maximum(mind, 0.0)
        idx = jax.random.categorical(
            jax.random.fold_in(key, k_i), jnp.log(p + 1e-30))
        c = sample[idx]
        dist = norms2 - 2.0 * jnp.dot(sample, c, precision=_HIGH) \
            + jnp.dot(c, c, precision=_HIGH)
        mind = jnp.minimum(mind, dist)
        cs = jax.lax.dynamic_update_index_in_dim(cs, c, k_i, 0)
        return (mind, cs), None

    cs = jnp.zeros((nlist, d), sample.dtype)
    cs = cs.at[0].set(c0)
    (_, cs), _ = jax.lax.scan(
        step, (mind0, cs), jnp.arange(1, nlist))
    return cs


@functools.partial(jax.jit, static_argnames=("iters",))
def _kmeans_fit(sample: jnp.ndarray, init: jnp.ndarray, iters: int):
    """Lloyd's algorithm: (S, d) f32 sample, (nlist, d) init centroids.

    L2 assignment via the expanded form argmin ||x-c||^2 =
    argmax (x.c - ||c||^2/2); the update is a segment mean. Empty
    clusters keep their previous centroid.
    """
    nlist = init.shape[0]

    def step(c, _):
        scores = jnp.dot(sample, c.T, precision=_HIGH,
                         preferred_element_type=jnp.float32)
        scores = scores - 0.5 * jnp.sum(c * c, axis=1)[None, :]
        assign = jnp.argmax(scores, axis=1)
        sums = jax.ops.segment_sum(sample, assign, num_segments=nlist)
        counts = jax.ops.segment_sum(
            jnp.ones((sample.shape[0],), jnp.float32), assign,
            num_segments=nlist,
        )
        new_c = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c
        )
        return new_c, None

    centroids, _ = jax.lax.scan(step, init, None, length=iters)
    return centroids


@jax.jit
def _assign_chunk(chunk: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.dot(chunk, centroids.T, precision=_HIGH,
                     preferred_element_type=jnp.float32)
    scores = scores - 0.5 * jnp.sum(centroids * centroids, axis=1)[None, :]
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


# --------------------------------------------------------------------------
# search program
# --------------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "list_cap", "qchunk")
)
def _ivf_search(
    q: jnp.ndarray,          # (Q, d) float32, Q a multiple of qchunk
    matrix: jnp.ndarray,     # (n_sorted + list_cap, d) cluster-sorted rows
    centroids: jnp.ndarray,  # (nlist, d) f32
    starts: jnp.ndarray,     # (nlist,) int32 row offsets into `matrix`
    sizes: jnp.ndarray,      # (nlist,) int32 list sizes
    ids: jnp.ndarray,        # (n_sorted + list_cap,) int32 original ids
    *,
    k: int,
    nprobe: int,
    list_cap: int,
    qchunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cd = matrix.dtype
    prec = _HIGH if cd == jnp.float32 else jax.lax.Precision.DEFAULT
    # probe selection: inner product to centroids (FAISS IP-metric IVF)
    cq = jnp.dot(q, centroids.T, precision=_HIGH,
                 preferred_element_type=jnp.float32)
    _, probed = jax.lax.top_k(cq, nprobe)            # (Q, nprobe)

    offs = jnp.arange(list_cap, dtype=jnp.int32)
    n_chunks = q.shape[0] // qchunk
    qs = q.reshape(n_chunks, qchunk, -1)
    probed = probed.reshape(n_chunks, qchunk, nprobe)

    def chunk_fn(carry, inp):
        qc, pc = inp                                 # (qchunk, d), (qchunk, nprobe)
        qc_c = qc.astype(cd)

        def probe_step(_, cl):
            # cl: (qchunk,) list id probed by each query this step
            base = starts[cl]                        # (qchunk,)
            size = sizes[cl]
            pos = base[:, None] + offs[None, :]      # (qchunk, P) contiguous
            rows = matrix[pos]                       # block read per query
            s = jnp.einsum(
                "qpd,qd->qp", rows, qc_c,
                precision=prec, preferred_element_type=jnp.float32,
            )
            s = jnp.where(offs[None, :] < size[:, None], s, NEG_INF)
            return None, (s, pos)

        _, (s_all, pos_all) = jax.lax.scan(
            probe_step, None, jnp.swapaxes(pc, 0, 1)
        )                                            # (nprobe, qchunk, P)
        cand = jnp.swapaxes(s_all, 0, 1).reshape(qchunk, nprobe * list_cap)
        pos = jnp.swapaxes(pos_all, 0, 1).reshape(qchunk, nprobe * list_cap)
        cand_ids = ids[pos]                          # masked lanes blanked by
        return carry, finalize_topk(cand, cand_ids, k)  # the -inf score

    _, (scores, idx) = jax.lax.scan(chunk_fn, None, (qs, probed))
    return scores.reshape(-1, k), idx.reshape(-1, k)


# --------------------------------------------------------------------------
# the index
# --------------------------------------------------------------------------
@dataclasses.dataclass
class _IVFState:
    matrix: jnp.ndarray
    centroids: jnp.ndarray
    starts: jnp.ndarray
    sizes: jnp.ndarray
    ids: jnp.ndarray


class IVFFlatIndex:
    """Inverted-file flat index over one embedding column.

    Mirrors ``add_faiss_index(..., string_factory="IVF{nlist},Flat")`` +
    ``search_batch`` (meerqat/ir/search.py:207-249) with inner-product
    metric; optionally L2-normalizes both sides ("L2norm,IVF…,Flat").

    `search_batch` returns exact-over-probed-lists (scores, ids) under
    the repo-wide FAISS contract: score desc, id asc tie order, int32-max
    pad ids when fewer than k candidates were probed.
    """

    mode = "ivf"

    def __init__(
        self,
        vectors: Optional[np.ndarray],
        nlist: Optional[int] = None,
        nprobe: int = 8,
        do_l2norm: bool = False,
        mesh_ctx: Optional[meshlib.MeshContext] = None,
        dtype=jnp.float32,
        train_points_per_list: int = 64,
        train_iters: int = 10,
        seed: int = 0,
        qchunk: int = 32,
        max_list_factor: float = 4.0,
        _state: Optional[_IVFState] = None,
        _meta: Optional[dict] = None,
    ):
        self.mesh_ctx = mesh_ctx or meshlib.current()
        self.do_l2norm = do_l2norm
        self.dtype = dtype
        self.qchunk = qchunk
        if _state is not None:  # load() path
            meta = dict(_meta or {})
            self.n = int(meta["n"])
            self.d = int(meta["d"])
            self.nlist = int(meta["nlist"])
            self.nprobe = int(meta.get("nprobe", nprobe))
            self.list_cap = int(meta["list_cap"])
            self._st = _state
            return

        # device arrays build ON DEVICE end-to-end — round-tripping a
        # multi-GB KB through host numpy takes 20+ min over the tunneled
        # link (the DenseIndex lesson; serve_bench.py pattern)
        on_device = isinstance(vectors, jax.Array)
        if not on_device:
            vectors = np.asarray(vectors, np.float32)
        self.n, self.d = vectors.shape
        if self.n == 0:
            raise ValueError("IVFFlatIndex needs a non-empty matrix")
        if do_l2norm:
            if on_device:
                vectors = l2_normalize(vectors.astype(jnp.float32))
            else:
                norms = np.linalg.norm(vectors, axis=1, keepdims=True)
                vectors = vectors / np.maximum(norms, 1e-12)
        if nlist is None:
            # ~sqrt(N), power of two (FAISS guideline class)
            nlist = max(16, 1 << int(round(np.log2(max(np.sqrt(self.n), 16)))))
        nlist = min(nlist, self.n)
        self.nlist = int(nlist)
        self.nprobe = int(min(nprobe, nlist))

        rng = np.random.default_rng(seed)
        # ---- train k-means on a subsample (FAISS-style) ----------------
        s = min(self.n, train_points_per_list * self.nlist)
        sample_idx = np.sort(rng.choice(self.n, size=s, replace=False))
        if on_device:
            sample = jnp.take(vectors, jnp.asarray(sample_idx), axis=0
                              ).astype(jnp.float32)
        else:
            sample = jnp.asarray(vectors[sample_idx])
        init = _kmeanspp_init(jax.random.key(seed), sample, self.nlist)
        centroids = _kmeans_fit(sample, init, int(train_iters))

        # ---- full assignment pass (chunked) -----------------------------
        chunk = 1 << 18
        parts = []
        for i0 in range(0, self.n, chunk):
            sl = vectors[i0: min(i0 + chunk, self.n)]
            parts.append(_assign_chunk(
                sl.astype(jnp.float32) if on_device else jnp.asarray(sl),
                centroids))
        assign = jnp.concatenate(parts) if len(parts) > 1 else parts[0]

        # ---- cluster-sorted layout --------------------------------------
        # stable sort keeps FAISS add order within each list
        order = jnp.argsort(assign, stable=True).astype(jnp.int32)
        sizes = jnp.bincount(assign, length=self.nlist).astype(jnp.int32)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(sizes)[:-1]]
        ).astype(jnp.int32)

        # ---- balance: split oversized lists into capped sublists --------
        # k-means on real (clustered) data can leave one giant list, and
        # the static probe window pays the MAX list size for every probe:
        # measured at 1.5M x 768 / nlist=1024 on clustered embeddings, one
        # list held 62,323 rows vs mean 1,465 (42x skew) — every query then
        # reads ~4% of the KB per probe and a wide-nprobe program allocates
        # tens of GB. Oversized lists are split into sublists of at most
        # ceil(max_list_factor * N / nlist) rows sharing the parent
        # centroid: duplicated centroids tie in the probe top-k and
        # tie-break by index, so a big cluster's sublists are probed
        # consecutively — it legitimately consumes several probe slots
        # instead of inflating every window. (FAISS has no analogue: its
        # per-list CPU scans pay actual sizes, not the max.)
        sizes_np = np.asarray(sizes)
        starts_np = np.asarray(starts)
        cap = max(1, int(np.ceil(max_list_factor * self.n / self.nlist)))
        if sizes_np.size and int(sizes_np.max()) > cap:
            new_starts, new_sizes, parent = [], [], []
            for li in range(self.nlist):
                s0, sz = int(starts_np[li]), int(sizes_np[li])
                off = 0
                while True:
                    new_starts.append(s0 + off)
                    new_sizes.append(max(0, min(cap, sz - off)))
                    parent.append(li)
                    off += cap
                    if off >= sz:
                        break
            starts = jnp.asarray(np.asarray(new_starts, np.int32))
            sizes = jnp.asarray(np.asarray(new_sizes, np.int32))
            centroids = jnp.take(
                centroids, jnp.asarray(np.asarray(parent, np.int32)), axis=0
            )
            self.nlist = len(new_starts)

        list_cap = int(jnp.max(sizes)) if self.nlist else 0
        # probe windows read [start, start + list_cap): pad the tail so the
        # last list's window stays in bounds (masked lanes score NEG_INF)
        self.list_cap = max(1, list_cap)
        src = vectors if on_device else jnp.asarray(vectors)
        sorted_mat = jnp.concatenate([
            jnp.take(src, order, axis=0).astype(dtype),
            jnp.zeros((self.list_cap, self.d), dtype),
        ])
        ids = jnp.concatenate([
            order, jnp.full((self.list_cap,), INT32_MAX, jnp.int32)
        ])
        self._st = _IVFState(
            matrix=sorted_mat,
            centroids=centroids.astype(jnp.float32),
            starts=starts,
            sizes=sizes,
            ids=ids,
        )

    # ------------------------------------------------------------------
    def search_batch(
        self, queries, k: int = 100, nprobe: Optional[int] = None,
        sync: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores, ids) of the top-k rows among the probed lists.

        Same contract as `DenseIndex.search_batch` (device arrays stay on
        device with sync=False); `nprobe` overrides the build-time default
        per call (a new value compiles a new program)."""
        if isinstance(queries, jax.Array):
            q = queries.astype(jnp.float32)
        else:
            q = jnp.asarray(np.asarray(queries), dtype=jnp.float32)
        if q.ndim != 2 or q.shape[1] != self.d:
            raise ValueError(f"expected (Q, {self.d}) queries, got {q.shape}")
        if self.do_l2norm:
            q = l2_normalize(q)
        nprobe = int(min(nprobe if nprobe is not None else self.nprobe,
                         self.nlist))
        k_eff = min(k, self.n)
        nq = q.shape[0]
        qc = min(self.qchunk, max(1, nq))
        pad = (-nq) % qc
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, self.d), q.dtype)])
        scores, idx = _ivf_search(
            q, self._st.matrix, self._st.centroids, self._st.starts,
            self._st.sizes, self._st.ids,
            k=k_eff, nprobe=nprobe, list_cap=self.list_cap, qchunk=qc,
        )
        scores, idx = scores[:nq], idx[:nq]
        if k_eff < k:  # FAISS pad convention out to the requested k
            scores = jnp.concatenate(
                [scores, jnp.full((nq, k - k_eff), NEG_INF, scores.dtype)],
                axis=1)
            idx = jnp.concatenate(
                [idx, jnp.full((nq, k - k_eff), INT32_MAX, jnp.int32)],
                axis=1)
        if not sync:
            return scores, idx
        return np.asarray(scores), np.asarray(idx)

    # ------------------------------------------------------------------
    def add(self, vectors) -> None:
        raise NotImplementedError(
            "IVFFlatIndex is built once (the cluster-sorted device layout "
            "has no cheap append) — rebuild the index, or use "
            "ops.mips.DenseIndex / StreamingDenseIndex for live-add KBs"
        )

    def reconstruct_batch(self, row_ids) -> np.ndarray:
        """Original-order rows (FAISS `reconstruct_batch` contract)."""
        row_ids = np.asarray(row_ids, np.int64)
        ids = np.asarray(self._st.ids[: self.n])
        inv = np.empty((self.n,), np.int64)
        inv[ids] = np.arange(self.n)
        return np.asarray(self._st.matrix[inv[row_ids]], np.float32)

    # ------------------------------------------------------------------
    def save(self, path) -> None:
        path = Path(str(path))
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path.with_suffix(".npz") if path.suffix != ".npz" else path,
            matrix=np.asarray(self._st.matrix, np.float32),
            centroids=np.asarray(self._st.centroids, np.float32),
            starts=np.asarray(self._st.starts),
            sizes=np.asarray(self._st.sizes),
            ids=np.asarray(self._st.ids),
            meta=np.array([self.n, self.d, self.nlist, self.nprobe,
                           self.list_cap, int(self.do_l2norm)]),
        )

    @classmethod
    def load(cls, path, mesh_ctx=None, dtype=jnp.float32, **kwargs):
        path = Path(str(path))
        if path.suffix != ".npz" and Path(str(path) + ".npz").exists():
            path = Path(str(path) + ".npz")
        z = np.load(path)
        n, d, nlist, nprobe, list_cap, do_l2 = (int(v) for v in z["meta"])
        state = _IVFState(
            matrix=jnp.asarray(z["matrix"], dtype=dtype),
            centroids=jnp.asarray(z["centroids"]),
            starts=jnp.asarray(z["starts"]),
            sizes=jnp.asarray(z["sizes"]),
            ids=jnp.asarray(z["ids"]),
        )
        return cls(
            None, do_l2norm=bool(do_l2), mesh_ctx=mesh_ctx, dtype=dtype,
            _state=state,
            _meta={"n": n, "d": d, "nlist": nlist, "nprobe": nprobe,
                   "list_cap": list_cap},
            **kwargs,
        )
