"""Serving pipelines: packed embedder + (fused) retrieval loops, parity vs
plain padded forward + numpy argsort."""
import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.models import bert, dpr
from viquae_tpu.ir.embedding import PackedTextEmbedder
from viquae_tpu.ir.serving import FusedRetrievalPipeline, RetrievalPipeline
from viquae_tpu.ops import mips


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from transformers import BertTokenizerFast

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [f"w{i}" for i in range(2000)])
    d = tmp_path_factory.mktemp("servetok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

    cfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=3000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, add_pooler=False,
    ))
    params = dpr.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    queries = [
        " ".join(f"w{j}" for j in rng.integers(0, 2000, rng.integers(4, 15)))
        for _ in range(150)
    ]
    kb = rng.normal(size=(5000, 32)).astype(np.float32)
    return tok, cfg, params, queries, kb


def reference_topk(tok, cfg, params, queries, kb, k):
    enc = tok(queries, padding="max_length", truncation=True, max_length=32,
              return_tensors="np")
    q = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        deterministic=True,
    )["pooler_output"])
    scores = q @ kb.T
    return np.argsort(-scores, axis=1, kind="stable")[:, :k]


def test_pipeline_parity(setup):
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb, mode="global")
    pipe = RetrievalPipeline(emb, index, batch_size=64, k=10)
    scores, idx = pipe.run_arrays(queries)
    run = pipe.run([str(i) for i in range(len(queries))], queries)
    assert len(run) == len(queries)
    ref_idx = reference_topk(tok, cfg, params, queries, kb, 10)
    assert np.mean(idx == ref_idx) > 0.999


def test_fused_pipeline_parity_and_device_handoff(setup):
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb, mode="global")
    pipe = FusedRetrievalPipeline(emb, index, batch_size=64, k=10)
    scores, idx = pipe.run_arrays(queries)
    ref_idx = reference_topk(tok, cfg, params, queries, kb, 10)
    assert np.mean(idx == ref_idx) > 0.999
    # bf16 wire format: scores within bf16 quantization of the fp32 oracle
    assert np.all(np.isfinite(scores))

    batches = pipe.run_device(queries)
    got = np.concatenate(
        [np.asarray(i)[: min(64, len(queries) - s)] for s, _, i in batches]
    )
    assert np.mean(got == ref_idx) > 0.999

    # compact transfer guard: oversized token ids are rejected
    class FakePack:
        input_ids = np.full((4, 32), 40000, np.int64)
        segment_ids = np.zeros((4, 32), np.int64)
        position_ids = np.zeros((4, 32), np.int64)
        cls_rows = np.zeros((4,), np.int64)
        cls_cols = np.zeros((4,), np.int64)

    with pytest.raises(ValueError):
        pipe._upload(FakePack())


def test_fused_pipeline_rejects_chunked_modes(setup):
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb, mode="fast")
    with pytest.raises(ValueError, match="single-pass"):
        FusedRetrievalPipeline(emb, index, batch_size=64, k=10)


def test_fused_pipeline_l2norm_scores_match_search_batch(setup):
    """do_l2norm indexes must score COSINE in the fused path too (the
    fused program normalizes the query like search_batch does)."""
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb, do_l2norm=True, mode="global")
    pipe = FusedRetrievalPipeline(emb, index, batch_size=64, k=5)
    scores, idx = pipe.run_arrays(queries[:64])
    ref_s, ref_i = index.search_batch(emb(queries[:64]), k=5)
    np.testing.assert_array_equal(idx, ref_i[: len(idx)])
    # scores agree up to the bf16 wire format
    np.testing.assert_allclose(scores, ref_s[: len(scores)],
                               rtol=1e-2, atol=1e-2)


def test_pipeline_k_clamped_to_index_size(setup):
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    small = mips.DenseIndex(kb[:7], mode="global")
    pipe = RetrievalPipeline(emb, small, batch_size=64, k=100)
    scores, idx = pipe.run_arrays(queries[:10])
    assert scores.shape == (10, 7)
    fused = FusedRetrievalPipeline(emb, small, batch_size=64, k=100)
    s2, i2 = fused.run_arrays(queries[:10])
    assert s2.shape == (10, 7)
    np.testing.assert_array_equal(idx, i2)


def test_compact_transfer_wide_rows_use_int16():
    """row_len > 127 must widen position/column wire dtypes (silent int8
    wraparound would corrupt position embeddings)."""
    import tempfile, os
    from transformers import BertTokenizerFast

    td = tempfile.mkdtemp()
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(300)
    ]
    open(os.path.join(td, "vocab.txt"), "w").write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(td, "vocab.txt"))

    cfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=400, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=256, add_pooler=False,
    ))
    params = dpr.init(jax.random.key(0), cfg)
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=200, batch_size=8,
                             compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    kb = rng.normal(size=(500, 32)).astype(np.float32)
    index = mips.DenseIndex(kb, mode="global")
    pipe = FusedRetrievalPipeline(emb, index, batch_size=8, k=5)
    assert pipe._pos_dtype == np.int16
    # one long query (> 127 tokens) round-trips correctly
    queries = [" ".join(f"w{j % 300}" for j in range(180)) for _ in range(8)]
    scores, idx = pipe.run_arrays(queries)
    enc = tok(queries, padding="max_length", truncation=True, max_length=200,
              return_tensors="np")
    ref_q = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        deterministic=True)["pooler_output"])
    ref_idx = np.argsort(-(ref_q @ kb.T), axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, ref_idx)


def test_fused_pipeline_pallas_fused_index_mode(setup):
    """index mode='fused' routes the single-dispatch serving program
    through ops.mips_pallas.topk_fused (the Pallas q-major kernel) and
    matches the fp32 oracle ranking."""
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb, mode="fused")
    pipe = FusedRetrievalPipeline(emb, index, batch_size=64, k=10)
    scores, idx = pipe.run_arrays(queries)
    ref_idx = reference_topk(tok, cfg, params, queries, kb, 10)
    # bf16 scores may swap near-ties vs the fp32 oracle: compare sets
    overlap = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 10 for i in range(len(idx))
    ])
    assert overlap > 0.95, overlap
    assert np.all(np.isfinite(scores))


def test_fused_pipeline_sharded_fused_index(setup):
    """A kb-sharded fused index must route through topk_sharded inside the
    single-dispatch program (per-shard Pallas kernels; a direct topk_fused
    over the sharded matrix would make GSPMD all-gather the whole KB)."""
    from viquae_tpu.core import mesh as meshlib

    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        index = mips.DenseIndex(kb, mesh_ctx=ctx, mode="fused")
        pipe = FusedRetrievalPipeline(emb, index, batch_size=64, k=10)
        scores, idx = pipe.run_arrays(queries)
    ref_idx = reference_topk(tok, cfg, params, queries, kb, 10)
    overlap = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 10 for i in range(len(idx))
    ])
    assert overlap > 0.95, overlap


def test_multi_index_fusion_pipeline(setup):
    """The reference's late-fusion config shape (text + 2 modal indexes,
    wsum + gzmuv + default-minimum) as ONE device program: parity vs the
    host path search -> default_minimum -> normalize_run -> fuse."""
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.rankeval import Run, default_minimum, fuse, normalize_run

    tok, cfg, params, queries, kb = setup
    queries = queries[:96]
    rng = np.random.default_rng(42)
    n_docs = kb.shape[0]
    kb_clip = rng.normal(size=(n_docs, 24)).astype(np.float32)
    kb_face = rng.normal(size=(n_docs, 16)).astype(np.float32)
    feats = {
        "clip": rng.normal(size=(len(queries), 24)).astype(np.float32),
        "face": rng.normal(size=(len(queries), 16)).astype(np.float32),
    }
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=48,
                             compute_dtype=jnp.float32)
    indexes = {
        "dpr": mips.DenseIndex(kb, mode="global", dtype=jnp.float32),
        "clip": mips.DenseIndex(kb_clip, do_l2norm=True, mode="global",
                                dtype=jnp.float32),
        "face": mips.DenseIndex(kb_face, mode="global", dtype=jnp.float32),
    }
    weights = {"dpr": 0.5, "clip": 0.3, "face": 0.2}
    pipe = MultiIndexRetrievalPipeline(
        emb, indexes, weights, text_index="dpr", batch_size=48, k=10,
        norm="gzmuv", compact_transfer=False,
    )
    scores, idx = pipe.run_arrays(queries, feats)
    run = pipe.run([str(i) for i in range(len(queries))], queries, feats)
    assert len(run) == len(queries)

    # ---- host reference: per-index search_batch -> rankeval fusion -------
    q_text = np.zeros((len(queries), kb.shape[1]), np.float32)
    enc = tok(queries, padding="max_length", truncation=True, max_length=32,
              return_tensors="np")
    q_text = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        deterministic=True,
    )["pooler_output"])
    host_runs = []
    for name, q in (("dpr", q_text), ("clip", feats["clip"]),
                    ("face", feats["face"])):
        s, i = indexes[name].search_batch(q, k=10)
        host_runs.append(Run({
            str(r): {str(int(d)): float(v) for d, v in zip(i[r], s[r])}
            for r in range(len(queries))
        }, name=name))
    host_runs = default_minimum(host_runs)
    host_runs = [normalize_run(r, "gzmuv") for r in host_runs]
    fused = fuse(host_runs, norm=None, method="wsum",
                 params={"weights": [0.5, 0.3, 0.2]})

    agree = 0
    for q in range(len(queries)):
        items = sorted(fused[str(q)].items(),
                       key=lambda kv: (-kv[1], int(kv[0])))[:10]
        ref_ids = [int(d) for d, _ in items]
        agree += np.mean(idx[q] == ref_ids)
    agree /= len(queries)
    # packed vs padded text embeddings differ at ~1e-6: near-tied fusion
    # scores may swap; demand near-perfect positional agreement
    assert agree > 0.97, agree


def test_multi_index_online_image_tower(setup):
    """image_encoders: the image embedding is computed INSIDE the fused
    program from raw query images; queries without an image are absent
    from that index's run (search_batch_if_not_None semantics)."""
    from PIL import Image

    from viquae_tpu.image.embedding import ImageEmbedder
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.rankeval import Run, default_minimum, fuse, normalize_run

    tok, cfg, params, queries, kb = setup
    queries = queries[:40]
    rng = np.random.default_rng(7)
    n_docs = kb.shape[0]

    # tiny "CLIP tower": mean-pool pixels -> linear proj
    w_img = rng.normal(size=(3, 12)).astype(np.float32)

    def img_apply(p, pixels):
        return pixels.mean(axis=(1, 2)) @ p["w"]

    enc = ImageEmbedder(img_apply, {"w": jnp.asarray(w_img)}, save_as="e",
                        image_size=16, preprocessing="clip", batch_size=20)
    images = [
        None if i % 5 == 4 else Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8), "RGB")
        for i in range(len(queries))
    ]
    kb_img = rng.normal(size=(n_docs, 12)).astype(np.float32)

    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=20,
                             compute_dtype=jnp.float32)
    indexes = {
        "dpr": mips.DenseIndex(kb, mode="global", dtype=jnp.float32),
        "img": mips.DenseIndex(kb_img, mode="global", dtype=jnp.float32),
    }
    # zmuv: per-query statistics are invariant to serving batching, so the
    # host run-level reference matches exactly (gzmuv stats are per BATCH
    # in serving — the batch plays the role of the run — which legitimately
    # diverges from a whole-run host fusion when batch < run)
    pipe = MultiIndexRetrievalPipeline(
        emb, indexes, {"dpr": 0.6, "img": 0.4}, text_index="dpr",
        batch_size=20, k=10, norm="zmuv", compact_transfer=False,
        image_encoders={"img": enc},
    )
    scores, idx = pipe.run_arrays(queries, query_images={"img": images})

    # ---- host reference --------------------------------------------------
    enc_host = tok(queries, padding="max_length", truncation=True,
                   max_length=32, return_tensors="np")
    q_text = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc_host["input_ids"].astype(np.int32)),
        jnp.asarray(enc_host["attention_mask"].astype(np.int32)),
        deterministic=True,
    )["pooler_output"])
    s, i = indexes["dpr"].search_batch(q_text, k=10)
    dpr_run = Run({
        str(r): {str(int(d)): float(v) for d, v in zip(i[r], s[r])}
        for r in range(len(queries))
    }, name="dpr")
    # image embeddings through the SAME ImageEmbedder device path
    q_img = enc.embed_images(images)
    img_results = {}
    present = [r for r in range(len(queries)) if images[r] is not None]
    s, i = indexes["img"].search_batch(
        np.nan_to_num(q_img), k=10)
    for r in range(len(queries)):
        img_results[str(r)] = (
            {str(int(d)): float(v) for d, v in zip(i[r], s[r])}
            if r in set(present) else {}
        )
    img_run = Run(img_results, name="img")
    runs = default_minimum([dpr_run, img_run])
    runs = [normalize_run(r, "zmuv") for r in runs]
    fused = fuse(runs, norm=None, method="wsum",
                 params={"weights": [0.6, 0.4]})

    agree = 0.0
    for q in range(len(queries)):
        items = sorted(fused[str(q)].items(),
                       key=lambda kv: (-kv[1], int(kv[0])))[:10]
        agree += np.mean(idx[q] == [int(d) for d, _ in items])
    agree /= len(queries)
    assert agree > 0.97, agree


def test_multi_index_nan_features_masked(setup):
    """Precomputed features with NaN rows (ImageEmbedder's 'no image'
    contract) are treated as absent from that index's run — a NaN row must
    NOT poison the batch's gzmuv statistics or outputs."""
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline

    tok, cfg, params, queries, kb = setup
    queries = queries[:24]
    rng = np.random.default_rng(3)
    kb_img = rng.normal(size=(kb.shape[0], 12)).astype(np.float32)
    feats = rng.normal(size=(24, 12)).astype(np.float32)
    feats[5] = np.nan
    feats[17] = np.nan
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=24,
                             compute_dtype=jnp.float32)
    indexes = {
        "dpr": mips.DenseIndex(kb, mode="global", dtype=jnp.float32),
        "img": mips.DenseIndex(kb_img, mode="global", dtype=jnp.float32),
    }
    pipe = MultiIndexRetrievalPipeline(
        emb, indexes, {"dpr": 0.6, "img": 0.4}, text_index="dpr",
        batch_size=24, k=8, norm="gzmuv", compact_transfer=False,
    )
    scores, idx = pipe.run_arrays(queries, {"img": feats})
    assert np.isfinite(scores).all()
    assert (idx >= 0).all() and (idx < kb.shape[0]).all()


def _mini_corpus(rng, n_docs=400, n_terms=60):
    return [
        " ".join(f"w{j}"
                 for j in rng.integers(0, n_terms, rng.integers(20, 60)))
        for _ in range(n_docs)
    ]


def test_hybrid_pipeline_matches_host_fusion(setup):
    """HybridRetrievalPipeline (dense on device + BM25 via the C++ scorer,
    fused with gzmuv+defmin on device) must equal the host pipeline:
    per-leg runs -> default_minimum -> normalize gzmuv -> wsum."""
    from viquae_tpu.ir.serving import HybridRetrievalPipeline
    from viquae_tpu.ops import bm25 as bm25_lib
    from viquae_tpu.rankeval import default_minimum, fuse, normalize_run

    tok, cfg, params, queries, kb = setup
    rng = np.random.default_rng(5)
    texts = _mini_corpus(rng, n_docs=kb.shape[0] // 10)
    kb_small = kb[: len(texts)]
    bm25 = bm25_lib.BM25Index.build(texts, k1=0.5, b=0.3)
    queries = queries[:48]

    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_small, mode="global", dtype=jnp.float32)
    # ONE batch so gzmuv's batch-as-run statistics match the host run
    pipe = HybridRetrievalPipeline(emb, index, bm25, weights=(0.7, 0.3),
                                   batch_size=64, k=10, k_bm25=10,
                                   compact_transfer=False)
    scores, idx = pipe.run_arrays(queries)

    # ---- host reference: same candidates, rankeval fusion ---------------
    # (exact f32 dense leg: the serving wire format is bf16, which would
    # shift the host gzmuv statistics)
    enc = tok(queries, padding="max_length", truncation=True, max_length=32,
              return_tensors="np")
    q_emb = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        deterministic=True)["pooler_output"])
    full = q_emb @ kb_small.T
    d_idx = np.argsort(-full, axis=1, kind="stable")[:, :10]
    d_scores = np.take_along_axis(full, d_idx, axis=1)
    q_ids = [str(i) for i in range(len(queries))]
    dense_run = {
        q: {str(d): float(s) for s, d in zip(d_scores[i], d_idx[i])}
        for i, q in enumerate(q_ids)
    }
    b_scores, b_idx = bm25.search_batch(queries, k=10)
    bm25_run = {
        q: {str(d): float(s) for s, d in zip(b_scores[i], b_idx[i])}
        for i, q in enumerate(q_ids)
    }
    from viquae_tpu.rankeval import Run

    runs = default_minimum([Run(dense_run, name="dense"),
                            Run(bm25_run, name="bm25")])
    fused = fuse(runs, norm="gzmuv", method="wsum",
                 params={"weights": [0.7, 0.3]})

    # the wire format is bf16, which can swap near-tied ranks: compare
    # scores BY DOC ID (must match the host fusion) and require the
    # top-k to be score-equivalent to the host's top-k
    for i, q in enumerate(q_ids):
        got = {int(d): float(s) for d, s in zip(idx[i], scores[i])
               if d != np.iinfo(np.int32).max}
        for d, s in got.items():
            np.testing.assert_allclose(s, fused[q][str(d)],
                                       rtol=2e-2, atol=2e-2)
        want = sorted(fused[q].items(), key=lambda kv: (-kv[1], int(kv[0])))
        kth = want[min(len(got), len(want)) - 1][1]
        assert all(fused[q][str(d)] >= kth - 0.05 for d in got), i


def test_hybrid_pipeline_accepts_device_bm25(setup):
    """DeviceBM25 duck-types BM25Index (search_batch + n_docs) and drops
    into HybridRetrievalPipeline as the sparse leg — the all-on-chip
    hybrid mode bench.py stage_hybrid measures."""
    from viquae_tpu.ir.serving import HybridRetrievalPipeline
    from viquae_tpu.ops import bm25 as bm25_lib
    from viquae_tpu.ops.bm25_device import DeviceBM25

    tok, cfg, params, queries, kb = setup
    rng = np.random.default_rng(7)
    texts = _mini_corpus(rng, n_docs=200)
    kb_small = kb[:200]
    host = bm25_lib.BM25Index.build(texts, k1=0.5, b=0.3)
    dev = DeviceBM25(host, n_head=8, l_small=32, pool_mid=8,
                     pool_small=32, q_block=16)
    queries = queries[:16]
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=16,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_small, mode="global", dtype=jnp.float32)
    pipe_d = HybridRetrievalPipeline(emb, index, dev, weights=(0.7, 0.3),
                                     batch_size=16, k=10, k_bm25=10,
                                     compact_transfer=False)
    pipe_h = HybridRetrievalPipeline(emb, index, host, weights=(0.7, 0.3),
                                     batch_size=16, k=10, k_bm25=10,
                                     compact_transfer=False)
    s_d, i_d = pipe_d.run_arrays(queries)
    s_h, i_h = pipe_h.run_arrays(queries)
    pad = np.iinfo(np.int32).max
    for q in range(len(queries)):
        got = {int(d): float(s) for d, s in zip(i_d[q], s_d[q]) if d != pad}
        want = {int(d): float(s) for d, s in zip(i_h[q], s_h[q])
                if d != pad}
        shared = set(got) & set(want)
        assert len(shared) >= max(1, int(0.7 * len(want))), (q, got, want)
        for d in shared:
            np.testing.assert_allclose(got[d], want[d], rtol=5e-2,
                                       atol=5e-2)


def test_hybrid_pipeline_raw_interpolation(setup):
    """norm='raw' + fixed stats = the committed legacy config semantics:
    fused(d) = w_d*(s_d-m_d)/sd_d + w_b*(s_b-m_b)/sd_b, absent legs
    contribute 0 (experiments/ir/viquae/bm25/config.json)."""
    from viquae_tpu.ir.serving import HybridRetrievalPipeline
    from viquae_tpu.ops import bm25 as bm25_lib

    tok, cfg, params, queries, kb = setup
    rng = np.random.default_rng(6)
    texts = _mini_corpus(rng, n_docs=300)
    kb_small = kb[:300]
    bm25 = bm25_lib.BM25Index.build(texts, k1=0.5, b=0.3)
    queries = queries[:32]
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=32,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_small, mode="global", dtype=jnp.float32)
    stats = ((0.5, 2.0), (20.1111, 5.85003))
    pipe = HybridRetrievalPipeline(emb, index, bm25, weights=(0.7, 0.3),
                                   batch_size=32, k=8, k_bm25=8,
                                   norm="raw", stats=stats,
                                   compact_transfer=False)
    scores, idx = pipe.run_arrays(queries)

    d_pipe = FusedRetrievalPipeline(emb, index, batch_size=32, k=8,
                                    compact_transfer=False)
    d_scores, d_idx = d_pipe.run_arrays(queries)
    b_scores, b_idx = bm25.search_batch(queries, k=8)
    for i in range(len(queries)):
        expect = {}
        for s, d in zip(d_scores[i], d_idx[i]):
            expect[int(d)] = expect.get(int(d), 0.0) + 0.7 * (s - 0.5) / 2.0
        for s, d in zip(b_scores[i], b_idx[i]):
            expect[int(d)] = (expect.get(int(d), 0.0)
                              + 0.3 * (s - 20.1111) / 5.85003)
        got = {int(d): float(s) for d, s in zip(idx[i], scores[i])
               if d != np.iinfo(np.int32).max}
        for d, s in got.items():
            np.testing.assert_allclose(s, expect[d], rtol=2e-2, atol=2e-2)
        want = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))
        kth = want[min(len(got), len(want)) - 1][1]
        assert all(expect[d] >= kth - 0.05 for d in got), i

    # constructor guards
    with pytest.raises(ValueError, match="norm='raw'"):
        HybridRetrievalPipeline(emb, index, bm25, norm="raw",
                                batch_size=32, k=8)
    with pytest.raises(ValueError, match="legacy"):
        HybridRetrievalPipeline(emb, index, bm25, norm="gzmuv",
                                stats=stats, batch_size=32, k=8)


def test_multi_index_online_face_leg(setup):
    """face_encoders: the ONLINE pixels->MTCNN->align->ArcFace leg must
    produce results identical to the staged path (the same features
    precomputed offline and passed via query_features) — item 2's
    parity contract, beyond the reference's precomputed-face online path
    (meerqat/interact/system.py:24-42)."""
    from PIL import Image

    from viquae_tpu.image.face_recognition import FaceQueryEncoder
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.models import arcface, mtcnn

    tok, cfg, params, queries, kb = setup
    queries = queries[:24]
    rng = np.random.default_rng(77)
    n_docs = kb.shape[0]
    acfg = arcface.ArcFaceConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                 embedding_size=16)
    encoder = FaceQueryEncoder(
        mtcnn.init(jax.random.key(5)),
        arcface.init(jax.random.key(6), acfg),
        mtcnn_cfg=mtcnn.MTCNNConfig(canvas=64, min_face_size=20,
                                    thresholds=(0.1, 0.1, 0.1)),
        arcface_cfg=acfg, batch_size=8)
    images = [
        None if i % 5 == 0 else Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        for i in range(len(queries))
    ]
    feats_offline = encoder(images)
    # random-weight MTCNN at threshold .1 should detect on SOME images and
    # None rows must stay NaN (the absent contract)
    assert np.isnan(feats_offline[0]).all()
    assert np.isfinite(feats_offline).all(axis=1).any(), (
        "no face detected anywhere: the parity test would be vacuous")

    kb_face = rng.normal(size=(n_docs, 16)).astype(np.float32)
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=24,
                             compute_dtype=jnp.float32)

    def build(face_encoders=None):
        return MultiIndexRetrievalPipeline(
            emb,
            {"dpr": mips.DenseIndex(kb, mode="global", dtype=jnp.float32),
             "face": mips.DenseIndex(kb_face, mode="global",
                                     dtype=jnp.float32)},
            {"dpr": 0.6, "face": 0.4}, text_index="dpr", batch_size=24,
            k=8, compact_transfer=False, face_encoders=face_encoders,
        )

    s_staged, i_staged = build().run_arrays(
        queries, {"face": feats_offline})
    s_online, i_online = build({"face": encoder}).run_arrays(
        queries, query_images={"face": images})
    np.testing.assert_array_equal(i_online, i_staged)
    np.testing.assert_allclose(s_online, s_staged, rtol=1e-5, atol=1e-6)

    # validation: face_encoders keys must be non-text index names
    with pytest.raises(ValueError, match="face_encoders"):
        build({"dpr": encoder})


def test_multi_index_compact_transfer_fp32_feature_parity(setup):
    """Round-3 review: compact_transfer=True used to bf16-truncate
    precomputed modal features even against fp32 exact-parity indexes —
    a silently lossy cast near score ties. Features must now follow the
    index dtype, so the compact and non-compact paths return IDENTICAL
    rankings over fp32 indexes (the integer compactions are lossless)."""
    import jax.numpy as jnp

    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.ops import mips

    tok, cfg, params, queries, kb = setup
    queries = queries[:48]
    rng = np.random.default_rng(3)
    n_docs = kb.shape[0]
    kb_clip = rng.normal(size=(n_docs, 24)).astype(np.float32)
    feats = {"clip": rng.normal(size=(len(queries), 24)).astype(np.float32)}
    results = {}
    for compact in (False, True):
        emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                                 row_len=32, batch_size=48,
                                 compute_dtype=jnp.float32)
        indexes = {
            "dpr": mips.DenseIndex(kb, mode="global", dtype=jnp.float32),
            "clip": mips.DenseIndex(kb_clip, mode="global",
                                    dtype=jnp.float32),
        }
        pipe = MultiIndexRetrievalPipeline(
            emb, indexes, {"dpr": 0.6, "clip": 0.4}, text_index="dpr",
            batch_size=48, k=10, norm="zmuv", compact_transfer=compact,
        )
        results[compact] = pipe.run_arrays(queries, feats)
    np.testing.assert_array_equal(results[False][1], results[True][1])
    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=1e-2, atol=1e-2)


def test_fused_pipeline_sees_rows_added_after_construction(setup):
    """DenseIndex.add() inside the alignment padding keeps the compiled
    shape — the serving program must read the CURRENT row count as a jit
    argument, not a baked trace-time constant, or the new rows stay
    silently invisible (jit cache hit with stale valid_rows)."""
    tok, cfg, params, queries, kb = setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(cfg), params, tok,
                             row_len=32, batch_size=64,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb[:4992], mode="global")  # 4992 % 8 == 0
    pipe = FusedRetrievalPipeline(emb, index, batch_size=64, k=10)
    _ = pipe.run_arrays(queries[:64])  # compile with the original count

    # the added rows are scaled copies of the first queries' embeddings —
    # guaranteed MIPS winners for those queries
    enc = tok(queries[:3], padding="max_length", truncation=True,
              max_length=32, return_tensors="np")
    q_emb = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        deterministic=True,
    )["pooler_output"])
    added = 10.0 * q_emb  # dominant rows (tiny-model embeddings are near-
    # duplicates across queries, so the three rows tie within fp noise —
    # assertions below are tie-tolerant per CLAUDE.md)
    index.add(added)
    scores, idx = pipe.run_arrays(queries)
    # every query's winner is one of the added rows (they dominate), and
    # each source query ranks SOME added row first
    assert np.all(idx[:3, 0] >= 4992)
    full_kb = np.concatenate([kb[:4992], added])
    enc = tok(queries, padding="max_length", truncation=True,
              max_length=32, return_tensors="np")
    q_all = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
        jnp.asarray(enc["attention_mask"].astype(np.int32)),
        deterministic=True,
    )["pooler_output"])
    ref_scores = q_all @ full_kb.T
    ref_idx = np.argsort(-ref_scores, axis=1, kind="stable")[:, :10]
    # tie-tolerant parity: where ids differ, the reference scores of the
    # swapped ids must be equal to fp tolerance (tied-id swaps only)
    np.testing.assert_allclose(
        np.take_along_axis(ref_scores, idx.astype(np.int64), axis=1),
        np.take_along_axis(ref_scores, ref_idx, axis=1),
        rtol=1e-5, atol=1e-4)
