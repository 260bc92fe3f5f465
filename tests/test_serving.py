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
