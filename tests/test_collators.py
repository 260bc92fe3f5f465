"""Collator semantics: passage sampling, labels, answer positions, ICT."""
import numpy as np
import pytest

from viquae_tpu.train import data as tdata
from viquae_tpu.train.objectives import IGNORE_INDEX


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    letters = list("abcdefghijklmnopqrstuvwxyz0123456789")
    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"ent{i}" for i in range(30)]
        + [f"fact{i}" for i in range(30)]
        + ["question", "about", "passage", "text", "answer", "is", "the"]
        + letters + [f"##{c}" for c in letters]
    )
    d = tmp_path_factory.mktemp("tok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)


def make_kb(n=20):
    return [
        {"passage": f"passage about ent{i} the answer is fact{i}", "index": i}
        for i in range(n)
    ]


def make_items(n=4):
    return [
        {
            "id": f"q{i}",
            "input": f"question about ent{i}",
            "output": {"original_answer": f"fact{i}", "answer": [f"fact{i}"]},
            "search_provenance_indices": [i],
            "search_provenance_scores": [10.0],
            "search_irrelevant_indices": [(i + 5) % 20, (i + 9) % 20],
            "search_irrelevant_scores": [2.0, 1.0],
            "search_indices": [i, (i + 5) % 20, (i + 9) % 20],
            "search_scores": [9.0, 3.0, 1.0],
        }
        for i in range(n)
    ]


def test_biencoder_collate(tokenizer):
    coll = tdata.BiEncoderCollator(
        tokenizer, kb=make_kb(), M=3, max_length=16, seed=0
    )
    items = make_items(4)
    batch = coll.collate_fn(items)
    assert batch["question_inputs"]["input_ids"].shape == (4, 16)
    assert batch["context_inputs"]["input_ids"].shape == (12, 16)
    np.testing.assert_array_equal(batch["labels"], [0, 1, 2, 3])
    # first N passages are the relevant ones: check passage i mentions ent{i}
    dec = tokenizer.decode(batch["context_inputs"]["input_ids"][1])
    assert "ent1" in dec


def test_biencoder_missing_relevant_gets_ignore_index(tokenizer):
    coll = tdata.BiEncoderCollator(
        tokenizer, kb=make_kb(), M=2, max_length=16, seed=0
    )
    items = make_items(2)
    items[1]["search_provenance_indices"] = []
    batch = coll.collate_fn(items)
    assert batch["labels"][0] == 0
    assert batch["labels"][1] == IGNORE_INDEX


def test_image_features_padding():
    feats = tdata.PreComputedImageFeatures(
        n_faces=3, face_dim=4, bbox_dim=7, image_dims={"clip": 5}
    )
    items = [
        {"face_embedding": [[1.0] * 4, [2.0] * 4, [3.0] * 4, [4.0] * 4],
         "face_box": [[0.1] * 7] * 4, "clip": [9.0] * 5},
        {"face_embedding": None, "clip": None},
        {"clip": [float("nan")] * 5},
    ]
    faces = feats.get_face_inputs(items)
    assert faces["face"].shape == (3, 1, 3, 4)  # trimmed to n_faces=3
    np.testing.assert_array_equal(faces["attention_mask"][0, 0], [1, 1, 1])
    np.testing.assert_array_equal(faces["attention_mask"][1, 0], [0, 0, 0])
    images = feats.get_image_inputs(items)
    assert images["clip"]["input"].shape == (3, 1, 5)
    np.testing.assert_array_equal(
        images["clip"]["attention_mask"][:, 0], [1, 0, 0]
    )  # NaN row masked


def test_reader_collate_answer_positions(tokenizer):
    coll = tdata.ReaderCollator(
        tokenizer, kb=make_kb(), M=2, max_length=24, max_n_answers=3,
        seed=0, train=True,
    )
    items = make_items(2)
    batch = coll.collate_fn(items)
    assert batch["input_ids"].shape == (4, 24)
    assert batch["start_positions"].shape == (2, 2, 3)
    # the relevant passage (row 0 of each question) must contain the answer
    for i in range(2):
        row = batch["input_ids"][i * 2]
        mask = batch["answer_mask"][i, 0]
        assert mask[0] == 1
        s = batch["start_positions"][i, 0, 0]
        e = batch["end_positions"][i, 0, 0]
        answer_ids = tokenizer(
            f"fact{i}", add_special_tokens=False
        )["input_ids"]
        np.testing.assert_array_equal(row[s: e + 1], answer_ids)
    assert batch["answer_strings"][0] == ["fact0"]


def test_reader_eval_passages_from_run(tokenizer):
    from viquae_tpu.rankeval import Run

    run = Run({"q0": {"3": 5.0, "7": 4.0}, "q1": {"2": 9.0}})
    coll = tdata.ReaderCollator(
        tokenizer, kb=make_kb(), M=2, max_length=24, seed=0,
        train=False, run=run,
    )
    batch = coll.collate_fn(make_items(2))
    assert "passage_scores" in batch
    np.testing.assert_allclose(batch["passage_scores"], [5.0, 4.0, 9.0, 0.0])
    dec = tokenizer.decode(batch["input_ids"][0])
    assert "ent3" in dec


def test_reranker_collate(tokenizer):
    coll = tdata.ReRankerCollator(
        tokenizer, kb=make_kb(), M=3, max_length=16, seed=0, train=True
    )
    batch = coll.collate_fn(make_items(2))
    assert batch["input_ids"].shape == (6, 16)
    np.testing.assert_array_equal(batch["labels"], [0, 0])


def test_ict_collate_hard_negatives(tokenizer):
    feats = tdata.PreComputedImageFeatures(
        n_faces=1, face_dim=4, bbox_dim=7, image_dims={"clip": 5}
    )
    coll = tdata.ICTCollator(
        tokenizer, M=3, max_length=16, seed=0, image_features=feats,
        sentences_per_target=2,
    )
    items = [
        {
            "sentences": [
                {"text": f"sentence {j} of doc {i}."} for j in range(5)
            ],
            "title": f"doc{i}",
            "face_embedding": [[float(i)] * 4],
            "face_box": [[0.1] * 7],
            "clip": [float(i)] * 5,
            "context_clip": [float(i) + 100] * 5,
            "context_face_embedding": [[float(i) + 100] * 4],
            "context_face_box": [[0.2] * 7],
        }
        for i in range(4)
    ]
    batch = coll.collate_fn(items)
    # M=3: text tiled 3x, images rolled for hard negatives
    assert batch["context_inputs"]["text_inputs"]["input_ids"].shape == (12, 16)
    clip = batch["context_inputs"]["image_inputs"]["clip"]["input"]
    assert clip.shape == (12, 1, 5)
    # first block unrolled, second block rolled by 1
    np.testing.assert_array_equal(clip[4], np.roll(clip[:4], 1, 0)[0])
    np.testing.assert_array_equal(batch["labels"], [0, 1, 2, 3])


def test_ict_pseudo_question_masking(tokenizer):
    coll = tdata.ICTCollator(
        tokenizer, M=1, max_length=16, seed=0, text_mask_rate=1.0,
        sentences_per_target=2,
    )
    item = {
        "sentences": [{"text": f"s{j}."} for j in range(5)],
        "title": "t",
    }
    for _ in range(10):
        q, t = coll.get_pseudo_question(item)
        # with mask rate 1.0 the query sentence never appears in the target
        assert q["text"] not in t["text"]


def test_map_run():
    from viquae_tpu.rankeval import Run

    run = Run({"q1": {"a0": 3.0, "a1": 2.0}})
    mapping = {"a0": [10, 11], "a1": [20]}
    out = tdata.map_run(run, mapping, k=3)
    assert out["q1"] == {"10": 3.0, "11": 3.0, "20": 2.0}
    out2 = tdata.map_run(run, mapping, k=2)
    assert set(out2["q1"]) == {"10", "11"}


def test_crossmodal_collator(tokenizer):
    coll = tdata.CrossModalCollator(tokenizer, max_length=12)
    items = [
        {"text": "question about ent0",
         "pixel_values": np.zeros((8, 8, 3), np.float32)},
        {"text": "question about ent1",
         "pixel_values": np.ones((8, 8, 3), np.float32)},
    ]
    batch = coll.collate_fn(items)
    assert batch["text_inputs"]["input_ids"].shape == (2, 12)
    assert batch["pixel_values"].shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(batch["labels"], [0, 1])


def test_answer_positions_native_matches_python(tokenizer):
    import os

    coll = tdata.ReaderCollator(
        tokenizer, kb=make_kb(), M=2, max_length=24, max_n_answers=3,
        seed=0, train=True,
    )
    items = make_items(3)
    native_batch = coll.collate_fn(items)
    os.environ["VIQUAE_NO_NATIVE"] = "1"
    try:
        coll2 = tdata.ReaderCollator(
            tokenizer, kb=make_kb(), M=2, max_length=24, max_n_answers=3,
            seed=0, train=True,
        )
        py_batch = coll2.collate_fn(items)
    finally:
        del os.environ["VIQUAE_NO_NATIVE"]
    for key in ("start_positions", "end_positions", "answer_mask"):
        np.testing.assert_array_equal(native_batch[key], py_batch[key])


def test_answer_positions_native_dedupe_rule():
    """Repeated answers + overlapping matches follow the reference rule."""
    from viquae_tpu.native import load_answer_span_matcher

    native = load_answer_span_matcher()
    assert native is not None
    ids = np.array([[7, 8, 7, 8, 7, 8, 0, 0]], np.int32)
    # answers: [7 8] (matches at 0, 2, 4) then [8 7] (matches at 1, 3)
    answer_tokens = np.array([7, 8, 8, 7], np.int32)
    answer_offsets = np.array([0, 2, 4], np.int64)
    row_offsets = np.array([0, 2], np.int64)
    out_s = np.zeros((1, 4), np.int32)
    out_e = np.zeros((1, 4), np.int32)
    out_c = np.zeros(1, np.int32)
    native(ids, np.int64(1), np.int64(8), answer_tokens, answer_offsets,
           row_offsets, np.int32(4), out_s, out_e, out_c)
    assert out_c[0] == 4
    # [7 8] at starts 0, 2, 4; then [8 7] at 1 (start 1/end 2 unused), 3 dup-
    # start? start 3 unused, end 4 unused -> kept
    assert out_s[0, :4].tolist() == [0, 2, 4, 1]
    assert out_e[0, :4].tolist() == [1, 3, 5, 2]


def test_reader_collator_packed_matches_unpacked_loss(tokenizer):
    """packed=True emits canvas fields and the trainee's packed loss path
    produces the same start/end targets; the loss matches the padded path
    to the pad-logit divergence (pads are -inf in packed, real logits in
    padded — both excluded from answer positions)."""
    import jax
    from viquae_tpu.models import bert as bert_lib
    from viquae_tpu.models import qa
    from viquae_tpu.train import trainee as trainee_lib

    coll = tdata.ReaderCollator(
        tokenizer, kb=make_kb(), M=2, max_length=24, max_n_answers=3,
        seed=0, train=True, packed=True,
    )
    items = make_items(2)
    batch = coll.collate_fn(items)
    for key in ("canvas_input_ids", "canvas_segment_ids",
                "canvas_position_ids", "canvas_token_type_ids",
                "gather_idx", "gather_mask"):
        assert key in batch, key
    assert batch["gather_idx"].shape == (4, 24)
    # canvas carries exactly the real tokens
    real = int(batch["attention_mask"].sum())
    assert int((batch["canvas_segment_ids"] > 0).sum()) == real

    cfg = qa.ReaderConfig(bert=bert_lib.BertConfig(
        vocab_size=tokenizer.vocab_size + 10, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    ))
    params = qa.init(jax.random.key(0), cfg)
    rt = trainee_lib.ReaderTrainee(cfg, params, tokenizer, m_passages=2)
    loss_packed, aux_p = rt.loss_fn(params, batch, jax.random.key(1),
                                    deterministic=True)
    unpacked = {k: v for k, v in batch.items()
                if not k.startswith("canvas_") and "gather" not in k}
    loss_padded, aux_u = rt.loss_fn(params, unpacked, jax.random.key(1),
                                    deterministic=True)
    assert np.isfinite(float(loss_packed))
    # packed excludes pad logits from the global softmax denominator, so
    # for the SAME answer logits its NLL is necessarily <= the padded one
    assert float(loss_packed) <= float(loss_padded) + 1e-4, (
        float(loss_packed), float(loss_padded))
    # and both paths expose the same eval contract shapes
    assert aux_p["start_log_probs"].shape == aux_u["start_log_probs"].shape


def test_reranker_collator_packed_matches_unpacked(tokenizer):
    """Packed reranker logits equal the padded ones exactly (CLS pooling;
    block-diagonal attention makes packing invisible)."""
    import jax
    from viquae_tpu.models import bert as bert_lib
    from viquae_tpu.models import rr

    coll = tdata.ReRankerCollator(
        tokenizer, kb=make_kb(), M=2, max_length=24, seed=0, train=True,
        packed=True,
    )
    items = make_items(2)
    batch = coll.collate_fn(items)
    assert "canvas_token_type_ids" in batch

    cfg = rr.BertReRankerConfig(bert=bert_lib.BertConfig(
        vocab_size=tokenizer.vocab_size + 10, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    ))
    params = rr.bert_reranker_init(jax.random.key(0), cfg)
    ref = rr.bert_reranker_apply(
        params, cfg, batch["input_ids"], batch["attention_mask"],
        token_type_ids=batch.get("token_type_ids"), deterministic=True,
    )
    got = rr.bert_reranker_apply_packed(
        params, cfg, batch["canvas_input_ids"], batch["canvas_segment_ids"],
        batch["canvas_position_ids"], batch["canvas_token_type_ids"],
        batch["canvas_cls_rows"], batch["canvas_cls_cols"],
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got.logits),
                               np.asarray(ref.logits), rtol=1e-4, atol=1e-5)


def test_image_formatter_concatenates_question_and_passage_features():
    """Reference parity (train/data.py:252-283): question+passage pairs
    CONCATENATE both sides' visual features along the n_images dim — an
    earlier version substituted passage features and silently dropped the
    question image."""
    from viquae_tpu.train.data import (ImageFormatter,
                                       PreComputedImageFeatures)

    feats = PreComputedImageFeatures(n_faces=2, face_dim=4, bbox_dim=7,
                                     image_dims={"clip": 3})
    fmt = ImageFormatter(feats)
    q_items = [{"face_embedding": [[1.0] * 4], "clip": [9.0, 9.0, 9.0]}] * 2
    p_items = [{"clip": [5.0, 5.0, 5.0]}, {}]
    text = {"input_ids": np.zeros((2, 4), np.int32),
            "attention_mask": np.ones((2, 4), np.int32)}
    out = fmt.format_batch(text, q_items, p_items)
    # n_images dim = 2 (question, passage)
    assert out["face_inputs"]["face"].shape == (2, 2, 2, 4)
    assert out["image_inputs"]["clip"]["input"].shape == (2, 2, 3)
    # the QUESTION image survived (first n_images slot)
    np.testing.assert_array_equal(
        out["image_inputs"]["clip"]["input"][:, 0], [[9, 9, 9]] * 2)
    np.testing.assert_array_equal(
        out["image_inputs"]["clip"]["attention_mask"], [[1, 1], [1, 0]])


def test_reader_collator_precomputed_keeps_positions_top_level(tokenizer):
    """With precomputed image features, start/end positions, answer
    strings and the canvases live TOP-LEVEL next to text_inputs (the
    reference's format-then-update order) — the trainee reads them
    unnested."""
    from viquae_tpu.train.data import (PreComputedImageFeatures,
                                       ReaderCollator)

    tok = tokenizer
    kb_list = make_kb()
    questions = make_items()
    for q in questions:
        q["face_embedding"] = [[0.5] * 8]
    collator = ReaderCollator(
        tok, kb=kb_list, M=2, max_length=24, max_n_answers=2, seed=0,
        train=True,
        image_features=PreComputedImageFeatures(
            n_faces=1, face_dim=8, bbox_dim=7, image_dims={}),
    )
    batch = collator.collate_fn(questions[:4])
    assert "start_positions" in batch and "answer_mask" in batch
    assert "text_inputs" in batch and "face_inputs" in batch
    assert "start_positions" not in batch["text_inputs"]
    # question features occupy slot 0 and passage features slot 1
    assert batch["face_inputs"]["face"].shape[1] == 2

    # packed + precomputed has no packed multimodal reader path: loud error
    import pytest

    with pytest.raises(ValueError, match="packed multimodal reader"):
        ReaderCollator(
            tok, kb=kb_list, M=2, max_length=24, packed=True,
            image_features=PreComputedImageFeatures(
                n_faces=1, face_dim=8, bbox_dim=7, image_dims={}))


def test_training_passages_sample_full_lists(tokenizer):
    """Round-3 review: permuting only the first n entries meant training
    only ever saw the first n_relevant relevant passages and the first
    M-1 negatives — sampling must reach the WHOLE provenance/irrelevant
    lists."""
    kb = make_kb()
    item = {
        "id": "q0",
        "input": "question about ent0",
        "output": {"original_answer": "fact0", "answer": ["fact0"]},
        "search_provenance_indices": [0, 1, 2, 3],
        "search_provenance_scores": [4.0, 3.0, 2.0, 1.0],
        "search_irrelevant_indices": [10, 11, 12, 13, 14, 15],
        "search_irrelevant_scores": [6.0, 5.0, 4.0, 3.0, 2.0, 1.0],
    }
    mod = tdata.QADataModule(tokenizer, kb=kb, M=4, n_relevant_passages=1,
                             seed=0)
    seen_rel, seen_irr = set(), set()
    for _ in range(200):
        rel, irr = mod.get_training_passages(item)
        seen_rel.add(rel[0]["index"])
        seen_irr.update(p["index"] for p in irr)
    assert seen_rel == {0, 1, 2, 3}
    assert seen_irr == {10, 11, 12, 13, 14, 15}
    # with_scores stays aligned with the sampled indices
    rel, irr, rs, irs = mod.get_training_passages(item, with_scores=True)
    score_of = {0: 4.0, 1: 3.0, 2: 2.0, 3: 1.0}
    assert rs[0] == score_of[rel[0]["index"]]


def test_packed_collator_pins_canvas_rows(tokenizer):
    """Row budgets: two batches with different token totals must produce
    the SAME canvas height (each new shape recompiles the train step,
    minutes over the tunneled TPU)."""
    kb = make_kb()
    col = tdata.BiEncoderCollator(tokenizer, kb=kb, M=2,
                                  n_relevant_passages=1, packed=True,
                                  max_length=32, seed=0)
    items = make_items(4)
    b1 = col.collate_fn(items)
    b2 = col.collate_fn(items[:2])  # fewer questions -> fewer tokens
    k = "canvas_input_ids"
    q1 = b1["question_inputs"][k] if "question_inputs" in b1 else b1[k]
    q2 = b2["question_inputs"][k] if "question_inputs" in b2 else b2[k]
    assert q1.shape == q2.shape


def test_select_kb_batched_matches_rowwise(tokenizer):
    """The HF-dataset fast path (one batched Arrow gather) must return the
    same rows as per-index access."""
    import datasets as hfds

    kb_list = make_kb()
    kb = hfds.Dataset.from_list(kb_list)
    mod = tdata.QADataModule(tokenizer, kb=kb, M=4)
    rows = mod._select_kb([3, 7, 1])
    assert [r["index"] for r in rows] == [3, 7, 1]
    assert rows[0]["passage"] == kb_list[3]["passage"]
