"""Batch QA serving (ir/qa_serving.AnswerPipeline): retrieval + reader +
span decode, parity vs a direct per-question reference path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.ir.embedding import PackedTextEmbedder
from viquae_tpu.ir.qa_serving import AnswerPipeline
from viquae_tpu.ir.serving import FusedRetrievalPipeline
from viquae_tpu.models import bert, dpr, qa
from viquae_tpu.ops import mips


@pytest.fixture(scope="module")
def qa_setup(tmp_path_factory):
    from transformers import BertTokenizerFast

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [f"w{i}" for i in range(200)])
    d = tmp_path_factory.mktemp("qatok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"))

    bcfg = bert.BertConfig(
        vocab_size=300, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=64, add_pooler=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    dcfg = dpr.DPRConfig(bert=bcfg)
    d_params = dpr.init(jax.random.key(0), dcfg)
    rcfg = qa.ReaderConfig(bert=bcfg)
    r_params = qa.init(jax.random.key(1), rcfg)

    rng = np.random.default_rng(0)
    kb_texts = [
        " ".join(f"w{j}" for j in rng.integers(0, 200, rng.integers(8, 20)))
        for _ in range(60)
    ]
    kb_rows = [{"passage": t} for t in kb_texts]
    kb_mat = rng.normal(size=(60, 24)).astype(np.float32)
    queries = [
        " ".join(f"w{j}" for j in rng.integers(0, 200, rng.integers(4, 9)))
        for _ in range(13)
    ]
    return tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries


def test_answer_pipeline_matches_direct_path(qa_setup):
    tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries = qa_setup
    M, seq = 3, 48
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=24, batch_size=8,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_mat, mode="global", dtype=jnp.float32)
    retrieval = FusedRetrievalPipeline(emb, index, batch_size=8, k=M)
    pipe = AnswerPipeline(retrieval, kb_rows, rcfg, r_params, tok,
                          m_passages=M, reader_seq=seq,
                          questions_per_step=4,
                          compute_dtype=jnp.float32)
    out = pipe.run(queries)
    assert len(out) == len(queries)
    assert all(o["answer"] is not None for o in out)
    assert all(len(o["passage_ids"]) == M for o in out)

    # ---- direct per-question reference over the SAME retrieved ids -------
    for i, o in enumerate(out):
        pairs_p = [kb_rows[int(d)]["passage"] for d in o["passage_ids"]]
        enc = tok([queries[i]] * M, pairs_p, padding="max_length",
                  truncation="only_second", max_length=seq,
                  return_tensors="np")
        r_out = qa.reader_apply(
            r_params, rcfg, jnp.asarray(enc["input_ids"].astype(np.int32)),
            attention_mask=jnp.asarray(
                enc["attention_mask"].astype(np.int32)),
            token_type_ids=jnp.asarray(
                enc["token_type_ids"].astype(np.int32)),
            m_passages=M, deterministic=True,
        )
        neg = jnp.asarray(-1e30, r_out.start_logits.dtype)
        mask = jnp.asarray(enc["attention_mask"].astype(np.int32))
        s = jnp.where(mask > 0, r_out.start_logits, neg)
        e = jnp.where(mask > 0, r_out.end_logits, neg)
        slp = jax.nn.log_softmax(s.reshape(1, -1), -1).reshape(M, seq)
        elp = jax.nn.log_softmax(e.reshape(1, -1), -1).reshape(M, seq)
        ref = qa.log_probs_to_answers(
            np.asarray(slp), np.asarray(elp),
            enc["input_ids"].astype(np.int32), tok, M)
        assert o["answer"] == ref[0], (i, o["answer"], ref[0])


def test_answer_pipeline_packed_reader_matches_padded(qa_setup):
    tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries = qa_setup
    M, seq = 3, 48
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=24, batch_size=8,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_mat, mode="global", dtype=jnp.float32)
    retrieval = FusedRetrievalPipeline(emb, index, batch_size=8, k=M)
    common = dict(m_passages=M, reader_seq=seq, questions_per_step=4,
                  compute_dtype=jnp.float32)
    padded = AnswerPipeline(retrieval, kb_rows, rcfg, r_params, tok,
                            **common)
    packed = AnswerPipeline(retrieval, kb_rows, rcfg, r_params, tok,
                            packed_reader=True, **common)
    out_pad = padded.run(queries)
    out_packed = packed.run(queries)
    for a, b in zip(out_pad, out_packed):
        assert a["answer"] == b["answer"], (a, b)
        assert a["passage_ids"] == b["passage_ids"]


def test_answer_pipeline_pretokenized_matches_text(qa_setup):
    """passage_tokens_key (production path: KB tokenized at index-build
    time, numpy pair assembly at serve time) must produce identical
    answers to on-the-fly text tokenization."""
    tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries = qa_setup
    M, seq = 3, 48
    kb_pretok = [
        {"passage": r["passage"],
         "passage_tokens": tok(r["passage"],
                               add_special_tokens=False)["input_ids"]}
        for r in kb_rows
    ]
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=24, batch_size=8,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_mat, mode="global", dtype=jnp.float32)
    retrieval = FusedRetrievalPipeline(emb, index, batch_size=8, k=M)
    common = dict(m_passages=M, reader_seq=seq, questions_per_step=4,
                  compute_dtype=jnp.float32)
    text_pipe = AnswerPipeline(retrieval, kb_pretok, rcfg, r_params, tok,
                               **common)
    pretok_pipe = AnswerPipeline(retrieval, kb_pretok, rcfg, r_params, tok,
                                 passage_tokens_key="passage_tokens",
                                 **common)
    out_text = text_pipe.run(queries)
    out_pre = pretok_pipe.run(queries)
    for a, b in zip(out_text, out_pre):
        assert a["answer"] == b["answer"], (a, b)


def test_answer_pipeline_long_question_and_ir_score(qa_setup):
    """A question longer than reader_seq must not crash pair tokenization
    (pre-truncation), and a fuse_ir_score reader gets the retrieval scores
    plumbed through the serving path."""
    tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries = qa_setup
    M, seq = 3, 32
    rng = np.random.default_rng(9)
    long_q = " ".join(f"w{j}" for j in rng.integers(0, 200, 120))
    queries = [long_q] + list(queries[:5])

    fused_cfg = qa.ReaderConfig(bert=rcfg.bert, fuse_ir_score=True)
    fused_params = qa.init(jax.random.key(7), fused_cfg)

    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=24, batch_size=8,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_mat, mode="global", dtype=jnp.float32)
    retrieval = FusedRetrievalPipeline(emb, index, batch_size=8, k=M)
    pipe = AnswerPipeline(retrieval, kb_rows, fused_cfg, fused_params, tok,
                          m_passages=M, reader_seq=seq,
                          questions_per_step=3,
                          compute_dtype=jnp.float32)
    out = pipe.run(queries)
    assert len(out) == 6
    assert all(o["answer"] is not None for o in out)


def test_answer_pipeline_rejects_short_retrieval_k(qa_setup):
    tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries = qa_setup
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=24, batch_size=8,
                             compute_dtype=jnp.float32)
    index = mips.DenseIndex(kb_mat, mode="global", dtype=jnp.float32)
    retrieval = FusedRetrievalPipeline(emb, index, batch_size=8, k=2)
    with pytest.raises(ValueError, match="m_passages"):
        AnswerPipeline(retrieval, kb_rows, rcfg, r_params, tok,
                       m_passages=5, reader_seq=32)


def test_packed_column_embedder_empty_batch(qa_setup):
    """dataset.map can hand a 0-row batch; the embedder must return an
    empty (0, d) column instead of crashing in np.concatenate."""
    from viquae_tpu.ir.embedding import PackedColumnEmbedder

    tok, dcfg, d_params, *_ = qa_setup
    emb = PackedColumnEmbedder(
        dpr.make_packed_apply(dcfg), d_params, tok,
        row_len=24, batch_size=8, key="passage", save_as="emb")
    out = emb({"passage": []})
    assert out["emb"].shape == (0, dcfg.bert.hidden_size)
    assert out["emb"].dtype == np.float32
    # and a later real batch still works (dim cache path)
    out2 = emb({"passage": ["w1 w2 w3", "w4"]})
    assert out2["emb"].shape == (2, dcfg.bert.hidden_size)
    out3 = emb({"passage": []})
    assert out3["emb"].shape == (0, dcfg.bert.hidden_size)


def test_pixels_in_answer_out_matches_staged(qa_setup):
    """The full online loop — (question, raw image) -> MTCNN -> align ->
    ArcFace + 3-index device fusion -> packed reader -> answer — must
    equal the staged path with offline-precomputed face features
    (VERDICT r2 item 2; the reference's interact/system.py never ran
    faces online)."""
    from PIL import Image

    from viquae_tpu.image.face_recognition import FaceQueryEncoder
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.models import arcface, mtcnn

    tok, dcfg, d_params, rcfg, r_params, kb_rows, kb_mat, queries = qa_setup
    rng = np.random.default_rng(3)
    acfg = arcface.ArcFaceConfig(stage_sizes=(1, 1, 1, 1), width=8,
                                 embedding_size=16)
    encoder = FaceQueryEncoder(
        mtcnn.init(jax.random.key(8)),
        arcface.init(jax.random.key(9), acfg),
        mtcnn_cfg=mtcnn.MTCNNConfig(canvas=64, min_face_size=20,
                                    thresholds=(0.1, 0.1, 0.1)),
        arcface_cfg=acfg, batch_size=8)
    images = [
        None if i % 4 == 0 else Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        for i in range(len(queries))
    ]
    kb_face = rng.normal(size=(len(kb_rows), 16)).astype(np.float32)
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=24, batch_size=16,
                             compute_dtype=jnp.float32)

    def build_answer(face_encoders=None):
        retrieval = MultiIndexRetrievalPipeline(
            emb,
            {"dpr": mips.DenseIndex(kb_mat, mode="global",
                                    dtype=jnp.float32),
             "face": mips.DenseIndex(kb_face, mode="global",
                                     dtype=jnp.float32)},
            {"dpr": 0.6, "face": 0.4}, text_index="dpr", batch_size=16,
            k=3, compact_transfer=False, face_encoders=face_encoders)
        return AnswerPipeline(retrieval, kb_rows, rcfg, r_params, tok,
                              m_passages=3, reader_seq=48,
                              questions_per_step=4,
                              compute_dtype=jnp.float32)

    feats = encoder(images)
    assert np.isfinite(feats).all(axis=1).any()
    staged = build_answer().run(queries, query_features={"face": feats})
    online = build_answer({"face": encoder}).run(
        queries, query_images={"face": images})
    assert [o["answer"] for o in online] == [s["answer"] for s in staged]
    assert [o["passage_ids"] for o in online] == [
        s["passage_ids"] for s in staged]
