"""Streaming retrieval service (the production-serving entry).

The reference's online path handles one query at a time
(meerqat/interact/system.py); batch retrieval re-runs dataset.map. This
module is the deployment-shaped loop, built so the DEVICE is the only
critical path:

- host tokenization + packing runs in a prefetch thread (batch i+1
  tokenizes while batch i computes — JAX dispatch is async),
- embeddings stay on device between embed and search (no host roundtrip),
- search results are drained LAGGED: the np.asarray sync + ranx-run dict
  building for batch i happens while the device computes batch i+1
  (`DenseIndex.search_batch(sync=False)`),
- per-stage timings come from core.profiling.StageTimer.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from viquae_tpu.core.profiling import StageTimer
from viquae_tpu.rankeval import Run
from viquae_tpu.train.prefetch import PrefetchIterable


def _build_run(scores, indices, query_ids, name):
    results: Dict[str, Dict[str, float]] = {}
    score_rows = scores.tolist()   # bulk-convert: much faster than
    idx_rows = indices.tolist()    # per-element float()/str()
    for row, q_id in enumerate(query_ids):
        results[q_id] = dict(zip(map(str, idx_rows[row]), score_rows[row]))
    return Run(results, name=name)


def drain_lagged(stream, drain_one):
    """Consume a prefetched stream keeping one batch pending: the host
    sync of batch i runs while the device computes batch i+1."""
    pending: deque = deque()
    for item in PrefetchIterable(stream, buffer_size=2):
        pending.append(item)
        if len(pending) > 1:
            drain_one(pending.popleft())
    while pending:
        drain_one(pending.popleft())


class RetrievalPipeline:
    """embed -> MIPS search, pipelined over a query stream.

    Parameters
    ----------
    embed_fn: callable(list[str]) -> device array (B, d) — typically an
        ir.embedding.PackedTextEmbedder (tokenize + pack on host, dispatch
        the jitted packed forward WITHOUT syncing).
    index: ops.mips.DenseIndex (or anything with search_batch).
    batch_size: fixed serving batch (XLA static shapes).
    """

    def __init__(self, embed_fn: Callable, index, batch_size: int = 1280,
                 k: int = 100, timer: Optional[StageTimer] = None):
        self.embed_fn = embed_fn
        self.index = index
        self.batch_size = batch_size
        # search_batch clamps k to the index size; clamp here too so the
        # preallocated output arrays match what the index can return
        self.k = min(k, index.n) if hasattr(index, "n") else k
        self.timer = timer or StageTimer("retrieval")

    def _batches(self, queries: List[str]):
        for start in range(0, len(queries), self.batch_size):
            yield start, queries[start: start + self.batch_size]

    def _drain_lagged(self, stream, drain_one):
        drain_lagged(stream, drain_one)

    def run_arrays(self, queries: List[str]
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Retrieve for all queries; returns (scores, indices) numpy arrays
        of shape (len(queries), k) in input order — the raw deployment
        contract (no per-query dict materialization)."""
        n = len(queries)
        scores_out = np.empty((n, self.k), np.float32)
        idx_out = np.empty((n, self.k), np.int64)

        def stream():
            for start, chunk in self._batches(queries):
                with self.timer.stage("tokenize+embed_dispatch"):
                    embeddings = self.embed_fn(list(chunk))
                with self.timer.stage("search_dispatch"):
                    # device arrays pass straight through; sync=False keeps
                    # the results on device so this returns at dispatch time
                    scores, indices = self.index.search_batch(
                        embeddings, k=self.k, sync=False
                    )
                    # start the device->host copies NOW so they overlap the
                    # next batch's compute (a blocking np.asarray of ~1MB
                    # over the tunneled link costs ~as much as the search)
                    for arr in (scores, indices):
                        if hasattr(arr, "copy_to_host_async"):
                            arr.copy_to_host_async()
                yield start, len(chunk), scores, indices

        def drain_one(item):
            start, n_real, scores, indices = item
            with self.timer.stage("drain_to_host"):
                scores_out[start: start + n_real] = np.asarray(
                    scores
                )[:n_real]
                idx_out[start: start + n_real] = np.asarray(indices)[:n_real]

        self._drain_lagged(stream(), drain_one)
        return scores_out, idx_out

    def run(self, query_ids: List[str], queries: List[str]) -> Run:
        """Retrieve for all queries; returns a rankeval Run."""
        assert len(query_ids) == len(queries)
        scores, indices = self.run_arrays(queries)
        with self.timer.stage("build_run"):
            return _build_run(scores, indices, query_ids, "serving")

    def report(self) -> dict:
        return self.timer.report()


def _device_search(index, q, matrix, k, n_valid=None):
    """Single-dispatch MIPS routing by index mode — called INSIDE jit.

    'fused' uses the Pallas q-major kernel (ops/mips_pallas.topk_fused); a
    kb-sharded fused matrix MUST go through topk_sharded (per-shard kernels
    + all-gather merge) because pallas_call cannot be partitioned — jitting
    topk_fused over a sharded matrix makes GSPMD silently all-gather the
    whole KB onto every device. 'global'/'approx' are the XLA single-pass
    selections.

    n_valid: pass the CURRENT index.n as a traced jit argument from the
    serving call site. Reading index.n here bakes it as an HLO constant —
    after DenseIndex.add() lands inside the alignment padding (same matrix
    shape -> jit cache HIT), a baked count would leave the new rows
    silently invisible to serving."""
    import jax.numpy as jnp

    from viquae_tpu.ops import mips

    if index.do_l2norm:
        # normalize in f32 BEFORE the dtype cast — DenseIndex.search_batch
        # does the same; an all-bf16 norm perturbs scores near ties
        q = mips.l2_normalize(q.astype(jnp.float32))
    q = q.astype(index.dtype)
    nv = jnp.int32(index.n) if n_valid is None else n_valid.astype(jnp.int32)
    k = min(k, index.n)
    if index.mode == "fused":
        if index.mesh_ctx.kb_size > 1:
            return mips.topk_sharded(
                q, matrix, k, mesh_ctx=index.mesh_ctx,
                valid_rows=nv, compute_dtype=index.dtype, mode="fused",
            )
        from viquae_tpu.ops import mips_pallas

        return mips_pallas.topk_fused(q, matrix, k, valid_rows=nv)
    return mips.topk_global(
        q, matrix, k, valid_rows=nv,
        compute_dtype=index.dtype,
        mode="approx" if index.mode == "approx" else "exact",
        recall_target=getattr(index, "approx_recall_target", 0.99),
    )


class FusedRetrievalPipeline(RetrievalPipeline):
    """Single-dispatch serving: tokenize+pack on host, then ONE jitted
    program does packed embed -> (optional L2norm) -> single-pass MIPS ->
    compact outputs (scores bitcast to int16 bf16, int32 indices), so each
    batch costs exactly one host->device upload, one XLA dispatch and one
    device->host download over the tunneled link. This is the bench
    protocol (bench.py) plus real result delivery.

    embedder: ir.embedding.PackedTextEmbedder; index: ops.mips.DenseIndex
    with mode 'global', 'approx' or 'fused' (single-pass selections — chunked
    'fast'/'exact' indexes must use the base RetrievalPipeline, which
    routes through search_batch's HBM-size guard).
    """

    def __init__(self, embedder, index, batch_size: int = 1280,
                 k: int = 100, timer: Optional[StageTimer] = None,
                 compact_transfer: bool = True):
        super().__init__(embedder, index, batch_size=batch_size, k=k,
                         timer=timer)
        from viquae_tpu.ops import mips
        import jax
        import jax.numpy as jnp

        if index.mode not in ("global", "approx", "fused"):
            raise ValueError(
                f"FusedRetrievalPipeline requires a single-pass index mode "
                f"('global'/'approx'/'fused'), got {index.mode!r} — use "
                "RetrievalPipeline for chunked modes"
            )
        packed_apply = embedder._forward  # jitted packed forward
        k_clamped = self.k

        # the tunneled link serializes transfers with compute, so bytes on
        # the wire are throughput. Wire dtypes are chosen ONCE from static
        # bounds (one compiled shape, no silent overflow): canvas positions/
        # columns/segment ids are bounded by row_len, cls rows by the
        # canvas height, token ids by the tokenizer vocab.
        self.compact = compact_transfer
        row_len = getattr(embedder, "row_len", 1 << 14)
        small_row = row_len <= 127
        self._pos_dtype = np.int8 if small_row else np.int16
        max_rows = max(batch_size, getattr(embedder, "fixed_rows", 0) or 0)
        self._row_dtype = np.int16 if max_rows <= 32767 else np.int32
        vocab = None
        tok = getattr(embedder, "tokenizer", None)
        if tok is not None:
            try:
                vocab = len(tok)
            except TypeError:
                vocab = getattr(tok, "vocab_size", None)
        self._ids_dtype = (
            np.int16 if vocab is not None and vocab <= 32767 else np.int32
        )

        @jax.jit
        def _retrieve(params, ids, seg, pos, cr, cc, matrix, n_rows):
            q = packed_apply(
                params, ids.astype(jnp.int32), seg.astype(jnp.int32),
                pos.astype(jnp.int32), cr.astype(jnp.int32),
                cc.astype(jnp.int32),
            )
            scores, idx = _device_search(index, q, matrix, k_clamped,
                                         n_valid=n_rows)
            scores16 = jax.lax.bitcast_convert_type(
                scores.astype(jnp.bfloat16), jnp.int16
            )
            return scores16, idx.astype(jnp.int32)

        self._retrieve = _retrieve

    def _upload(self, p):
        import jax.numpy as jnp

        if not self.compact:
            return (
                jnp.asarray(p.input_ids), jnp.asarray(p.segment_ids),
                jnp.asarray(p.position_ids),
                jnp.asarray(p.cls_rows), jnp.asarray(p.cls_cols),
            )
        if (self._ids_dtype == np.int16
                and p.input_ids.max(initial=0) >= 2 ** 15):
            raise ValueError("compact_transfer saw a token id >= 32768 from "
                             "a tokenizer that reported a smaller vocab")
        return (
            jnp.asarray(p.input_ids.astype(self._ids_dtype)),
            jnp.asarray(p.segment_ids.astype(self._pos_dtype)),
            jnp.asarray(p.position_ids.astype(self._pos_dtype)),
            jnp.asarray(p.cls_rows.astype(self._row_dtype)),
            jnp.asarray(p.cls_cols.astype(self._pos_dtype)),
        )

    def _canvas_stream(self, queries):
        import jax.numpy as jnp

        emb = self.embed_fn
        for start, chunk in self._batches(queries):
            with self.timer.stage("tokenize+pack+dispatch"):
                # n before matrix: a concurrent add() binds the matrix
                # first, so this order can only lag (old n + new matrix),
                # never score alignment padding (new n + old matrix)
                n_rows = jnp.asarray(self.index.n, jnp.int32)
                scores16, idx = self._retrieve(
                    emb.params, *self._upload(emb.pack(list(chunk))),
                    self.index.matrix, n_rows,
                )
            yield start, len(chunk), scores16, idx

    def run_device(self, queries: List[str]) -> List[Tuple[int, object, object]]:
        """Device-handoff retrieval: returns [(start, scores16_dev,
        idx_dev)] per batch WITHOUT pulling results to host — the
        deployment-shaped path when retrieval feeds the on-device reader
        (interact/system.py); only the final consumer pays a transfer.
        Host tokenize+pack runs in a prefetch thread so device compute is
        the critical path."""
        return [
            (start, scores16, idx)
            for start, _, scores16, idx in PrefetchIterable(
                self._canvas_stream(queries), buffer_size=2
            )
        ]

    def run_arrays(self, queries: List[str]
                   ) -> Tuple[np.ndarray, np.ndarray]:
        return self._drain_arrays(self._canvas_stream(queries),
                                  len(queries))

    def _drain_arrays(self, canvas_stream, n
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Shared drain of a (start, n_real, scores16, idx) stream into
        host arrays: async copies start at dispatch, the lagged drain
        overlaps batch i's host formatting with batch i+1's compute. One
        implementation for all pipelines (the fused/multi-index copies of
        this loop had already started to drift)."""
        import ml_dtypes

        scores_out = np.empty((n, self.k), np.float32)
        idx_out = np.empty((n, self.k), np.int64)

        def stream():
            for start, n_real, scores16, idx in canvas_stream:
                for arr in (scores16, idx):
                    if hasattr(arr, "copy_to_host_async"):
                        arr.copy_to_host_async()
                yield start, n_real, scores16, idx

        def drain_one(item):
            start, n_real, scores16, idx = item
            with self.timer.stage("drain_to_host"):
                scores_out[start: start + n_real] = (
                    np.asarray(scores16)[:n_real]
                    .view(ml_dtypes.bfloat16).astype(np.float32)
                )
                idx_out[start: start + n_real] = np.asarray(idx)[:n_real]

        self._drain_lagged(stream(), drain_one)
        return scores_out, idx_out


class MultiIndexRetrievalPipeline(FusedRetrievalPipeline):
    """Late-fusion serving: the reference's best retrieval configs (e.g.
    DPR + ArcFace + CLIP + ImageNet, wsum [0.3, 0.2, 0.2, 0.2], gzmuv norm,
    default-minimum — experiments/ir/viquae/dpr+arcface+clip+imagenet/
    config_test.json) as ONE jitted program per batch:

        packed text embed -> per-index MIPS -> ops.fusion.fuse_topk

    The text index is searched with the packed DPR tower; a non-text index
    is searched either with PRECOMPUTED per-query embeddings passed to
    run_arrays (the reference embeds query images in an offline stage,
    meerqat/ir/embedding.py) or — when an `image_encoders[name]`
    (image.embedding.ImageEmbedder) is given — with an embedding computed
    INSIDE the same program from the raw query-image canvas (host decode +
    device preprocess + encoder forward; queries without an image are
    masked out of that index's run, the search_batch_if_not_None
    semantics). Face features stay precomputed: the reference's face run
    needs the MTCNN->align->ArcFace cascade, which is its own offline
    stage. All indexes must share one doc-id space — the reference fuses
    runs after `map_passage_to_kb`; this pipeline is the online
    counterpart, while `ir.fuse.Fusion` remains the offline fit/eval path.
    Imputation follows Fusion(defmin=True). NOTE on gzmuv: its global
    statistics are computed per SERVING BATCH (the batch plays the role of
    the run); rankings can differ from a whole-run offline fusion when the
    stream spans several batches — zmuv/min-max are per-query and
    batching-invariant.

    indexes: {name: DenseIndex} (insertion order = fusion order);
    weights: {name: float}; text_index: the name searched with the query
    TEXT; query_features: arrays for the remaining names, shape
    (n_queries, d_name), passed per call; query_images: {name:
    [PIL.Image | None] * n_queries} for names with an image encoder.
    """

    def __init__(self, embedder, indexes, weights, text_index: str,
                 batch_size: int = 1280, k: int = 100,
                 norm: str = "gzmuv",
                 timer: Optional[StageTimer] = None,
                 compact_transfer: bool = True,
                 image_encoders=None, face_encoders=None):
        if text_index not in indexes:
            raise ValueError(f"text_index {text_index!r} not in indexes "
                             f"{list(indexes)}")
        face_encoders = dict(face_encoders or {})
        bad_face = ((set(face_encoders) - set(indexes))
                    | (set(face_encoders) & set(image_encoders or {}))
                    | ({text_index} & set(face_encoders)))
        if bad_face:
            raise ValueError(
                f"face_encoders must name non-text indexes distinct from "
                f"image_encoders; offending: {sorted(bad_face)}")
        bad = [n for n, ix in indexes.items()
               if ix.mode not in ("global", "approx", "fused")]
        if bad:
            raise ValueError(
                f"MultiIndexRetrievalPipeline requires single-pass index "
                f"modes ('global'/'approx'/'fused'); got chunked modes for "
                f"{bad}"
            )
        if set(weights) != set(indexes):
            raise ValueError("weights keys must match indexes keys")
        image_encoders = dict(image_encoders or {})
        unknown = set(image_encoders) - set(indexes)
        if unknown or text_index in image_encoders:
            raise ValueError(
                f"image_encoders must name non-text indexes; got "
                f"{sorted(image_encoders)} vs indexes {list(indexes)} "
                f"(text: {text_index!r})")
        # base init wires the compact-transfer dtypes + k clamp off the
        # text index; k is clamped to the SMALLEST index so every per-index
        # search can return k candidates
        super().__init__(embedder, indexes[text_index],
                         batch_size=batch_size,
                         k=min([k] + [ix.n for ix in indexes.values()]),
                         timer=timer, compact_transfer=compact_transfer)
        import jax
        import jax.numpy as jnp

        from viquae_tpu.ops import fusion as fusion_ops

        self.indexes = dict(indexes)
        self.names = list(indexes)
        self.text_index = text_index
        self.norm = norm
        self.weights = tuple(float(weights[n]) for n in self.names)
        self.image_encoders = image_encoders
        # ONLINE face leg (pixels -> MTCNN -> align -> ArcFace): computed
        # per batch on host+device, fed through the same feats path as
        # precomputed features (NaN rows = absent from the face run)
        self.face_encoders = face_encoders
        packed_apply = embedder._forward
        k_clamped = self.k
        names, text_name = self.names, text_index
        idx_objs = self.indexes
        wts = self.weights
        img_fwds = {n: e._forward for n, e in image_encoders.items()}
        int_max = np.iinfo(np.int32).max

        @jax.jit
        def _retrieve(params, ids, seg, pos, cr, cc, feats, img_inputs,
                      img_params, matrices, kb_rows, n_valid):
            q_text = packed_apply(
                params, ids.astype(jnp.int32), seg.astype(jnp.int32),
                pos.astype(jnp.int32), cr.astype(jnp.int32),
                cc.astype(jnp.int32),
            )
            scores_list, idx_list = [], []
            for name in names:
                ok = None
                if name == text_name:
                    q = q_text
                elif name in img_fwds:
                    # raw uint8 canvas -> preprocess + encoder forward, all
                    # inside this dispatch (ImageEmbedder._forward)
                    q = img_fwds[name](img_params[name],
                                       img_inputs[name][0])
                    ok = img_inputs[name][1][:, None]
                else:
                    q = feats[name]
                    # NaN rows are ImageEmbedder's 'query has no image'
                    # contract (embed_images): treat them as absent from
                    # this run — ONE NaN row would otherwise poison the
                    # batch-global gzmuv statistics
                    ok = jnp.all(jnp.isfinite(q), axis=1, keepdims=True)
                    q = jnp.where(ok, q, 0.0)
                s, i = _device_search(
                    idx_objs[name], q, matrices[name], k_clamped,
                    n_valid=kb_rows[name])
                if ok is not None:
                    # queries WITHOUT an image are absent from this run
                    # (search_batch_if_not_None): empty rows are min-imputed
                    # away by fuse_topk
                    s = jnp.where(ok, s, -jnp.inf)
                    i = jnp.where(ok, i, int_max)
                scores_list.append(s)
                idx_list.append(i.astype(jnp.int32))
            fused, fused_idx = fusion_ops.fuse_topk(
                tuple(scores_list), tuple(idx_list), wts, k_clamped,
                norm=norm, valid_queries=n_valid,
            )
            scores16 = jax.lax.bitcast_convert_type(
                fused.astype(jnp.bfloat16), jnp.int16
            )
            return scores16, fused_idx

        self._retrieve_multi = _retrieve

    def _canvas_stream(self, queries, query_features, query_images):
        import jax.numpy as jnp

        from viquae_tpu.image.embedding import decode_image_batch

        emb = self.embed_fn
        img_params = {n: e.params for n, e in self.image_encoders.items()}
        # compact transfer of modal features is only LOSSLESS when that
        # index scores in bf16 anyway (the cast happens on device either
        # way); an fp32 exact-parity index must receive fp32 queries —
        # unlike the integer compactions, a blanket bf16 cast would be
        # silently lossy near score ties
        feat_dtype = {
            n: (jnp.bfloat16
                if self.compact and ix.dtype == jnp.bfloat16
                else jnp.float32)
            for n, ix in self.indexes.items()
        }
        for start, chunk in self._batches(queries):
            with self.timer.stage("tokenize+pack+dispatch"):
                # the packed canvas always carries batch_size CLS slots
                # (garbage past len(chunk)); pad the modal features to the
                # same height — fuse_topk's valid_queries keeps the pad
                # rows out of the gzmuv statistics
                feats = {}
                face_slices = {
                    n: enc(query_images[n][start: start + len(chunk)])
                    for n, enc in self.face_encoders.items()
                }
                for n, f in {**query_features, **face_slices}.items():
                    f = np.asarray(f)
                    sl = (f if n in face_slices
                          else f[start: start + len(chunk)])
                    if len(sl) < self.batch_size:
                        sl = np.concatenate([
                            sl,
                            np.zeros((self.batch_size - len(sl),)
                                     + sl.shape[1:], sl.dtype),
                        ])
                    feats[n] = jnp.asarray(sl, dtype=feat_dtype[n])
                img_inputs = {}
                for n, enc in self.image_encoders.items():
                    canvas, ok = decode_image_batch(
                        query_images[n][start: start + len(chunk)],
                        enc.raw_size, self.batch_size,
                    )
                    img_inputs[n] = (jnp.asarray(canvas), jnp.asarray(ok))
                # row counts read BEFORE matrices: add() binds the new
                # matrix first, so this order can at worst pair an old
                # count with a new matrix (new rows lag one batch) — the
                # reverse pairing would score alignment padding as valid
                kb_rows = {n: jnp.asarray(ix.n, jnp.int32)
                           for n, ix in self.indexes.items()}
                matrices = {n: ix.matrix for n, ix in self.indexes.items()}
                scores16, idx = self._retrieve_multi(
                    emb.params, *self._upload(emb.pack(list(chunk))),
                    feats, img_inputs, img_params, matrices, kb_rows,
                    jnp.int32(len(chunk)),
                )
            yield start, len(chunk), scores16, idx

    def _validate_inputs(self, queries, query_features, query_images):
        online = set(self.image_encoders) | set(self.face_encoders)
        if set(query_images) != online:
            raise ValueError(
                f"query_images keys {sorted(query_images)} must match "
                f"image_encoders + face_encoders {sorted(online)}")
        missing = (set(self.names) - {self.text_index}
                   - set(query_features) - online)
        if missing:
            raise ValueError(f"missing query_features for indexes "
                             f"{sorted(missing)}")
        unknown = set(query_features) - set(self.names)
        if unknown:
            # caught here as a clear input error — a stray key otherwise
            # surfaces as a bare KeyError from inside the prefetch
            # thread's canvas generator
            raise ValueError(
                f"query_features keys {sorted(unknown)} are not index "
                f"names {sorted(self.names)}")
        n = len(queries)
        for name, f in query_features.items():
            if len(f) != n:
                raise ValueError(
                    f"query_features[{name!r}] has {len(f)} rows for "
                    f"{n} queries")
        for name, imgs in query_images.items():
            if len(imgs) != n:
                raise ValueError(
                    f"query_images[{name!r}] has {len(imgs)} entries for "
                    f"{n} queries")

    def run_arrays(self, queries, query_features=None, query_images=None):
        query_features = query_features or {}
        query_images = query_images or {}
        self._validate_inputs(queries, query_features, query_images)
        return self._drain_arrays(
            self._canvas_stream(queries, query_features, query_images),
            len(queries),
        )

    def run(self, query_ids, queries, query_features=None,
            query_images=None):
        assert len(query_ids) == len(queries)
        scores, indices = self.run_arrays(queries, query_features,
                                          query_images)
        with self.timer.stage("build_run"):
            return _build_run(scores, indices, query_ids, "serving-fusion")

    def run_device(self, queries, query_features=None, query_images=None):
        query_features = query_features or {}
        query_images = query_images or {}
        self._validate_inputs(queries, query_features, query_images)
        return [
            (start, scores16, idx)
            for start, _, scores16, idx in PrefetchIterable(
                self._canvas_stream(queries, query_features, query_images),
                buffer_size=2,
            )
        ]


class HybridRetrievalPipeline(FusedRetrievalPipeline):
    """Hybrid sparse+dense serving: BM25 (host C++ scorer over the CSR
    inverted index — the Elasticsearch replacement, ops/bm25.py +
    native/bm25_scorer.cpp) interpolated with dense MIPS (device), fused
    into one ranking per batch.

    Matches the reference's hybrid retrieval mode where BM25 is a
    first-class index next to the dense ones
    (meerqat/ir/search.py:268-293, tuned b=0.3/k1=0.5): both legs retrieve
    top-k' candidates over the SAME passage id space and are combined by
    weighted sum. Two interpolation semantics are supported:

    - norm="gzmuv" (default) — the CURRENT reference Fusion semantics
      (gzmuv normalization + default-minimum imputation, ir/fuse.py),
      computed on device by ops.fusion.fuse_topk;
    - norm="raw" + stats — the committed legacy config semantics
      (`normalization` {mean, std} + `interpolation_weight`,
      experiments/ir/viquae/bm25/config.json): each leg's scores are
      pre-normalized (s - mean)/std with CORPUS-level statistics and
      summed with the weights; absent docs contribute 0.

    The schedule overlaps the two legs: the dense retrieve is dispatched
    (async) BEFORE the host runs the C++ BM25 scorer, so sparse scoring
    hides behind device compute; the fuse program is a second tiny
    dispatch (splitting programs costs nothing on this link —
    scripts/exp_exact_gap.py).

    weights: (dense_weight, bm25_weight) — the reference's tuned BM25
    interpolation weight is 0.3 (bm25 leg), i.e. weights=(0.7, 0.3).
    """

    def __init__(self, embedder, index, bm25_index, weights=(0.7, 0.3),
                 batch_size: int = 1280, k: int = 100,
                 k_bm25: Optional[int] = None, norm: str = "gzmuv",
                 stats=None, timer: Optional[StageTimer] = None,
                 compact_transfer: bool = True):
        super().__init__(embedder, index, batch_size=batch_size, k=k,
                         timer=timer, compact_transfer=compact_transfer)
        import jax
        import jax.numpy as jnp

        from viquae_tpu.ops import fusion as fusion_ops

        if stats is not None and norm != "raw":
            raise ValueError(
                "fixed (mean, std) stats are the legacy interpolation "
                "semantics; use norm='raw' with them")
        if norm == "raw" and stats is None:
            raise ValueError(
                "norm='raw' interpolates unnormalized scores; pass "
                "stats=((dense_mean, dense_std), (bm25_mean, bm25_std)) "
                "(the committed configs' `normalization` block), or use "
                "norm='gzmuv'")
        self.bm25 = bm25_index
        self.k_bm25 = min(k_bm25 or self.k, bm25_index.n_docs)
        self.weights = (float(weights[0]), float(weights[1]))
        self.norm = norm
        self.stats = stats
        packed_apply = embedder._forward
        k_final = self.k
        wts = self.weights
        if stats is not None:
            (d_mean, d_std), (b_mean, b_std) = stats
        int_max = np.iinfo(np.int32).max

        @jax.jit
        def _retrieve_dense(params, ids, seg, pos, cr, cc, matrix, n_rows):
            q = packed_apply(
                params, ids.astype(jnp.int32), seg.astype(jnp.int32),
                pos.astype(jnp.int32), cr.astype(jnp.int32),
                cc.astype(jnp.int32),
            )
            return _device_search(index, q, matrix, k_final, n_valid=n_rows)

        @jax.jit
        def _fuse(d_scores, d_idx, b_scores, b_idx, n_valid):
            d_s = d_scores.astype(jnp.float32)
            b_s = b_scores.astype(jnp.float32)
            if stats is not None:
                d_valid = d_idx != int_max
                b_valid = b_idx != int_max
                d_s = jnp.where(d_valid, (d_s - d_mean) / d_std, 0.0)
                b_s = jnp.where(b_valid, (b_s - b_mean) / b_std, 0.0)
            fused, fused_idx = fusion_ops.fuse_topk(
                (d_s, b_s), (d_idx.astype(jnp.int32), b_idx), wts, k_final,
                norm=norm, valid_queries=n_valid,
            )
            scores16 = jax.lax.bitcast_convert_type(
                fused.astype(jnp.bfloat16), jnp.int16
            )
            return scores16, fused_idx

        self._retrieve_dense_fn = _retrieve_dense
        self._fuse_fn = _fuse

    def _bm25_arrays(self, chunk):
        """Host C++ scoring -> fixed-shape (batch_size, k_bm25) arrays in
        the framework pad convention (id int32-max, score -inf)."""
        scores_b, idx_b = self.bm25.search_batch(list(chunk), k=self.k_bm25)
        s = np.full((self.batch_size, self.k_bm25), -np.inf, np.float32)
        i = np.full((self.batch_size, self.k_bm25),
                    np.iinfo(np.int32).max, np.int32)
        for row, (ss, ii) in enumerate(zip(scores_b, idx_b)):
            s[row, : len(ss)] = ss
            i[row, : len(ii)] = ii
        return s, i

    def _canvas_stream(self, queries):
        import jax.numpy as jnp

        emb = self.embed_fn
        for start, chunk in self._batches(queries):
            with self.timer.stage("tokenize+pack+dense_dispatch"):
                n_rows = jnp.asarray(self.index.n, jnp.int32)  # n before matrix
                d_scores, d_idx = self._retrieve_dense_fn(
                    emb.params, *self._upload(emb.pack(list(chunk))),
                    self.index.matrix, n_rows,
                )
            # the dense program is now in flight. Sparse leg: a DeviceBM25
            # backend keeps its results ON DEVICE (no pull-pad-reupload);
            # the host C++ scorer overlaps device compute instead
            if hasattr(self.bm25, "search_batch_device"):
                with self.timer.stage("bm25_device"):
                    b_s, b_i = self.bm25.search_batch_device(
                        list(chunk), k=self.k_bm25)
                    b_s, b_i = b_s[: self.batch_size], b_i[: self.batch_size]
                    if b_s.shape[0] < self.batch_size:  # q_block < batch
                        pad = self.batch_size - b_s.shape[0]
                        b_s = jnp.concatenate(
                            [b_s, jnp.full((pad, b_s.shape[1]), -jnp.inf)])
                        b_i = jnp.concatenate(
                            [b_i, jnp.full((pad, b_i.shape[1]),
                                           np.iinfo(np.int32).max,
                                           jnp.int32)])
            else:
                with self.timer.stage("bm25_host"):
                    b_s_np, b_i_np = self._bm25_arrays(chunk)
                    b_s, b_i = jnp.asarray(b_s_np), jnp.asarray(b_i_np)
            with self.timer.stage("fuse_dispatch"):
                scores16, idx = self._fuse_fn(
                    d_scores, d_idx, b_s, b_i, jnp.int32(len(chunk)),
                )
            yield start, len(chunk), scores16, idx
