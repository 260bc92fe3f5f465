"""models/ner.py — BERT token-classification NER.

Parity oracles: torch `BertForTokenClassification` for logits, and the HF
TokenClassificationPipeline (aggregation_strategy="first") for the full
text -> entity-spans path, both tiny-random and offline.
"""
import numpy as np
import pytest

import jax

from viquae_tpu.models import ner

TINY = dict(
    vocab_size=64,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=2,
)

VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "who", "wrote", "the",
     "opera", "carmen", "in", "paris", "george", "bi", "##zet", "?", "was",
     "a", "of", "painting"]
    + [f"w{i}" for i in range(40)]
)


@pytest.fixture(scope="module")
def hf_ner():
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForTokenClassification

    torch.manual_seed(3)
    id2label = {0: "O", 1: "B-PER", 2: "I-PER", 3: "B-LOC", 4: "I-LOC"}
    hf_cfg = HFBertConfig(
        **TINY, num_labels=5, id2label=id2label,
        label2id={v: k for k, v in id2label.items()},
    )
    model = BertForTokenClassification(hf_cfg).eval()
    return hf_cfg, model


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    from transformers import BertTokenizerFast

    d = tmp_path_factory.mktemp("ner_tok")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"),
                             do_lower_case=True)


def test_logits_match_hf(hf_ner):
    import torch

    hf_cfg, model = hf_ner
    cfg = ner.config_from_hf(hf_cfg)
    assert cfg.id2label == ("O", "B-PER", "I-PER", "B-LOC", "I-LOC")
    params = ner.params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY["vocab_size"], (3, 10)).astype(np.int32)
    mask = np.ones((3, 10), np.int32)
    mask[1, 7:] = 0
    ours = np.asarray(ner.apply(params, cfg, ids, mask))
    with torch.no_grad():
        theirs = model(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_decode_bio_spans():
    id2label = ("O", "B-PER", "I-PER", "B-LOC", "I-LOC")
    text = "who wrote carmen in paris ?"
    #        0123456789...
    # tokens: who(0,3) wrote(4,9) carmen(10,16) in(17,19)
    #         paris(20,25) ?(26,27)
    offsets = [(0, 0), (0, 3), (4, 9), (10, 16), (17, 19), (20, 25),
               (26, 27), (0, 0)]
    word_ids = [None, 0, 1, 2, 3, 4, 5, None]
    labels = [0, 0, 0, 1, 0, 3, 0, 0]  # carmen=B-PER, paris=B-LOC
    spans = ner.decode_bio(labels, offsets, word_ids, id2label, text)
    assert spans == [("carmen", 10, 16, "PER"), ("paris", 20, 25, "LOC")]


def test_decode_bio_wordpiece_continuation():
    """Continuation pieces take the word's first-piece tag (HF 'first'
    aggregation) and extend the span's char range."""
    id2label = ("O", "B-PER", "I-PER")
    text = "bizet wrote"
    # bizet -> bi(0,2) ##zet(2,5); wrote(6,11)
    offsets = [(0, 0), (0, 2), (2, 5), (6, 11), (0, 0)]
    word_ids = [None, 0, 0, 1, None]
    # first piece B-PER, continuation piece tagged O (must not split)
    spans = ner.decode_bio([0, 1, 0, 0, 0], offsets, word_ids, id2label,
                           text)
    assert spans == [("bizet", 0, 5, "PER")]
    # continuation piece tagged I-PER extends too
    spans = ner.decode_bio([0, 1, 2, 0, 0], offsets, word_ids, id2label,
                           text)
    assert spans == [("bizet", 0, 5, "PER")]


def test_decode_bio_edge_tags():
    id2label = ("O", "B-PER", "I-PER", "B-LOC", "I-LOC")
    text = "a b c d"
    offsets = [(0, 1), (2, 3), (4, 5), (6, 7)]
    word_ids = [0, 1, 2, 3]
    # bare I-X opens a span; adjacent B-X B-X are separate entities;
    # I with a DIFFERENT type than the open span starts a new one
    spans = ner.decode_bio([2, 1, 1, 4], offsets, word_ids, id2label, text)
    assert spans == [("a", 0, 1, "PER"), ("b", 2, 3, "PER"),
                     ("c", 4, 5, "PER"), ("d", 6, 7, "LOC")]


def test_neural_ner_matches_hf_pipeline(hf_ner, tok):
    """End-to-end vs transformers TokenClassificationPipeline with
    aggregation_strategy='first' on the SAME random model: identical
    (start, end, label) span sets."""
    from transformers import pipeline as hf_pipeline

    hf_cfg, model = hf_ner
    cfg = ner.config_from_hf(hf_cfg)
    params = ner.params_from_hf(model.state_dict(), cfg)
    ours = ner.NeuralNER(params, cfg, tok, max_length=16, batch_size=4,
                         compute_dtype=np.float32)

    pipe = hf_pipeline(
        "token-classification", model=model, tokenizer=tok,
        aggregation_strategy="first",
    )
    texts = [
        "who wrote the opera carmen ?",
        "bizet was a painting of paris",
        "paris carmen george",
        "who was who",
    ]
    got = ours.predict_batch(texts)
    for text, mine in zip(texts, got):
        ref = [
            (int(e["start"]), int(e["end"]), e["entity_group"])
            for e in pipe(text)
        ]
        assert [(s, e, lb) for (_, s, e, lb) in mine] == ref, (
            text, mine, ref
        )
        for span_text, s, e, _ in mine:
            assert span_text == text[s:e]


def test_neural_ner_is_kilt2vqa_pluggable(hf_ner, tok):
    """NeuralNER satisfies the ner_fn seam: item2placeholder consumes its
    spans and builds {mention} placeholders from them."""
    from viquae_tpu.data import kilt2vqa

    hf_cfg, model = hf_ner
    cfg = ner.config_from_hf(hf_cfg)
    params = ner.params_from_hf(model.state_dict(), cfg)
    fn = ner.NeuralNER(params, cfg, tok, max_length=16, batch_size=2,
                       compute_dtype=np.float32)
    question = "who wrote the opera carmen ?"
    item = kilt2vqa.item2placeholder({"input": question}, ner_fn=fn)
    assert isinstance(item["placeholder"], list)
    for ph in item["placeholder"]:
        assert "{mention}" in ph["input"]
        ent = ph["entity"]
        assert question[ent["start"]:ent["end"]] == ent["text"]
