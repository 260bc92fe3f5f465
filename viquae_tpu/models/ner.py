"""BERT token-classification NER — the neural upgrade of the kilt2vqa
entity-extraction seam.

The reference drives NER with spaCy `en_core_web_lg` plus a dependency
parse (meerqat/data/kilt2vqa.py:157-227: `ent.label_` spans expanded over
`left_edge` children). spaCy is absent by design; the in-repo default is
the title gazetteer (data/kilt2vqa.GazetteerNER). This module adds the
model-based alternative: a BERT encoder with a token-classification head
(HF `BertForTokenClassification` weight-portable, e.g. CoNLL-03 NER
checkpoints like dslim/bert-base-NER), BIO decoding back to character
spans, and a `NeuralNER` callable that satisfies kilt2vqa's
``ner_fn(text) -> [(span, start, end, label)]`` contract.

TPU shape discipline: inference pads to a fixed bucket (one compiled
program per bucket, not per sentence length) and batches sentences; the
encoder runs bf16 with fp32 logits.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.models import bert
from viquae_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class NERConfig:
    bert: bert.BertConfig = dataclasses.field(
        default_factory=lambda: bert.BertConfig(add_pooler=False)
    )
    num_labels: int = 9  # CoNLL-03 BIO: O + B/I x PER/ORG/LOC/MISC
    # id -> label map, HF-config compatible; BIO tags ("B-PER", "I-PER",
    # "O"). Defaults to the dslim/bert-base-NER ordering.
    id2label: Tuple[str, ...] = (
        "O", "B-MISC", "I-MISC", "B-PER", "I-PER", "B-ORG", "I-ORG",
        "B-LOC", "I-LOC",
    )


def init(key, cfg: NERConfig):
    k_bert, k_head = jax.random.split(key)
    return {
        "bert": bert.init(k_bert, cfg.bert),
        "classifier": L.dense_init(
            k_head, cfg.bert.hidden_size, cfg.num_labels
        ),
    }


def param_spec(cfg: NERConfig):
    return {
        "bert": bert.param_spec(cfg.bert),
        "classifier": L.dense_spec(),
    }


def apply(
    params,
    cfg: NERConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """(B, L) ids -> (B, L, num_labels) fp32 logits (HF
    `BertForTokenClassification.forward` semantics: encoder -> dropout ->
    linear; dropout active only in training)."""
    rng_b, rng_d = (
        jax.random.split(rng) if rng is not None else (None, None)
    )
    out = bert.apply(
        params["bert"], cfg.bert, input_ids,
        attention_mask=attention_mask,
        token_type_ids=token_type_ids,
        deterministic=deterministic, rng=rng_b,
        compute_dtype=compute_dtype,
    )
    h = L.dropout(
        out["last_hidden_state"], cfg.bert.hidden_dropout_prob,
        deterministic, rng_d,
    )
    return L.dense(params["classifier"], h).astype(jnp.float32)


def params_from_hf(state_dict, cfg: NERConfig):
    """Port a torch `BertForTokenClassification` state_dict."""
    def get(name):
        t = state_dict[name]
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                       else t)
        )

    return {
        "bert": bert.params_from_hf(state_dict, cfg.bert, prefix="bert."),
        "classifier": {
            "kernel": get("classifier.weight").T,
            "bias": get("classifier.bias"),
        },
    }


def decode_bio(
    label_ids: Sequence[int],
    offsets: Sequence[Tuple[int, int]],
    word_ids: Sequence[Optional[int]],
    id2label: Sequence[str],
    text: str,
) -> List[Tuple[str, int, int, str]]:
    """BIO tag ids over wordpieces -> character-level entity spans.

    `offsets` are the tokenizer's (start_char, end_char) per token;
    `word_ids` the fast-tokenizer word index per token (None for
    [CLS]/[SEP]/pad — excluded). HF "first" aggregation: a word takes the
    tag of its FIRST wordpiece; continuation pieces only extend the
    word's character range. An I-X without a preceding B-X/I-X opens a
    span (common in real model output).
    """
    spans: List[Tuple[str, int, int, str]] = []
    cur: Optional[List] = None  # [start, end, label]
    prev_wid: Optional[int] = None
    for lid, (s, e), wid in zip(label_ids, offsets, word_ids):
        if wid is None or s == e:
            continue
        if wid == prev_wid:
            # continuation wordpiece: if the word opened/extended a span,
            # the span covers the whole word regardless of this tag
            if cur is not None and cur[1] >= s:
                cur[1] = max(cur[1], e)
            continue
        prev_wid = wid
        tag = id2label[int(lid)]
        if tag == "O":
            if cur is not None:
                spans.append(tuple(cur))
                cur = None
            continue
        kind, _, label = tag.partition("-")
        if cur is not None and kind == "I" and cur[2] == label:
            cur[1] = e
        else:
            if cur is not None:
                spans.append(tuple(cur))
            cur = [s, e, label]
    if cur is not None:
        spans.append(tuple(cur))
    return [(text[s:e], s, e, label) for s, e, label in spans]


class NeuralNER:
    """kilt2vqa-compatible ``ner_fn`` driven by the token-classification
    model. Pads to fixed `max_length`, batches `batch_size` sentences per
    jitted call (ONE compiled program), decodes BIO to char spans."""

    def __init__(
        self,
        params,
        cfg: NERConfig,
        tokenizer,
        max_length: int = 64,
        batch_size: int = 32,
        compute_dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size
        self._params = jax.device_put(params)
        self._fn = jax.jit(
            lambda p, ids, mask: jnp.argmax(
                apply(p, cfg, ids, mask, deterministic=True,
                      compute_dtype=compute_dtype),
                axis=-1,
            )
        )

    def predict_batch(
        self, texts: Sequence[str]
    ) -> List[List[Tuple[str, int, int, str]]]:
        if not texts:
            return []
        enc = self.tokenizer(
            list(texts), padding="max_length", truncation=True,
            max_length=self.max_length, return_offsets_mapping=True,
            return_tensors="np",
        )
        out: List[List[Tuple[str, int, int, str]]] = []
        n = len(texts)
        for i0 in range(0, n, self.batch_size):
            sl = slice(i0, min(i0 + self.batch_size, n))
            ids = enc["input_ids"][sl]
            mask = enc["attention_mask"][sl]
            pad = self.batch_size - ids.shape[0]
            if pad:  # fixed dispatch shape
                ids = np.pad(ids, ((0, pad), (0, 0)))
                mask = np.pad(mask, ((0, pad), (0, 0)))
            labels = np.asarray(
                self._fn(self._params, jnp.asarray(ids), jnp.asarray(mask))
            )
            for j, text in enumerate(list(texts)[sl]):
                out.append(
                    decode_bio(
                        labels[j],
                        enc["offset_mapping"][i0 + j],
                        enc.word_ids(i0 + j),
                        self.cfg.id2label,
                        text,
                    )
                )
        return out

    def __call__(self, text: str) -> List[Tuple[str, int, int, str]]:
        return self.predict_batch([text])[0]


def config_from_hf(hf_config) -> NERConfig:
    """Build NERConfig from an HF BertForTokenClassification config."""
    raw = hf_config.id2label  # int keys in-process, str keys from JSON
    id2label = tuple(
        raw[i] if i in raw else raw[str(i)] for i in range(len(raw))
    )
    return NERConfig(
        bert=bert.BertConfig.from_hf(hf_config, add_pooler=False),
        num_labels=hf_config.num_labels,
        id2label=id2label,
    )
