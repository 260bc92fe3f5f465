"""BEM — BERT answer-equivalence scorer (https://arxiv.org/abs/2202.07654).

The reference loads Google's BEM SavedModel through TF-hub
(meerqat/data/evqa.py:295-386): a BERT encoder over
``[CLS] candidate [SEP] reference [SEP] question [SEP]`` (segment ids
0/1/2) with a 2-way classification head; equivalence = softmax[1] >= 0.5.

This is the same scorer on the in-repo JAX BERT — config-constructed so the
EVQA protocol runs fully offline, and weight-portable: load the published
BEM checkpoint (a torch/TF export of bert-base with type_vocab_size>=3 and
a 2-class head) via :func:`params_from_state_dict` when network access
exists. The TF-hub path stays gated in data/evqa.py.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.models import bert
from viquae_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class BEMConfig:
    # BEM's canonical encoder is bert-base-uncased with 3 segment types
    bert: bert.BertConfig = dataclasses.field(
        default_factory=lambda: bert.BertConfig(
            type_vocab_size=3, add_pooler=True
        )
    )
    max_length: int = 512
    num_classes: int = 2


def init(key, cfg: BEMConfig):
    k_bert, k_head = jax.random.split(key)
    return {
        "bert": bert.init(k_bert, cfg.bert),
        "head": L.dense_init(k_head, cfg.bert.hidden_size, cfg.num_classes),
    }


def apply(params, cfg: BEMConfig, input_ids, segment_ids, attention_mask,
          deterministic: bool = True, compute_dtype=jnp.float32):
    """Returns (B, num_classes) logits. `segment_ids` here are BERT
    token_type ids (0=candidate, 1=reference, 2=question), NOT the packing
    segments."""
    out = bert.apply(
        params["bert"], cfg.bert, input_ids,
        attention_mask=attention_mask,
        token_type_ids=segment_ids,
        deterministic=deterministic,
        compute_dtype=compute_dtype,
    )
    pooled = out.get("pooler_output", out["last_hidden_state"][:, 0])
    return L.dense(params["head"], pooled)


def params_from_state_dict(state_dict, cfg: BEMConfig,
                           bert_prefix: str = "bert.",
                           head_prefix: str = "classifier."):
    """Port a BertForSequenceClassification-layout checkpoint (the public
    BEM export shape) into the scorer's pytree."""
    params = {"bert": bert.params_from_hf(state_dict, cfg.bert,
                                          prefix=bert_prefix)}

    def arr(t):
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        )

    params["head"] = {
        "kernel": arr(state_dict[head_prefix + "weight"]).T,
        "bias": arr(state_dict[head_prefix + "bias"]),
    }
    return params


def combine_segments(candidate_ids: List[int], reference_ids: List[int],
                     question_ids: List[int], cls_id: int, sep_id: int,
                     max_length: int = 512
                     ) -> Dict[str, np.ndarray]:
    """tf.text.combine_segments parity (meerqat/data/evqa.py:330-333):
    [CLS] cand [SEP] ref [SEP] question [SEP] with segment ids 0/1/2,
    zero-padded to max_length."""
    ids = [cls_id] + list(candidate_ids) + [sep_id]
    segs = [0] * len(ids)
    ids += list(reference_ids) + [sep_id]
    segs += [1] * (len(reference_ids) + 1)
    ids += list(question_ids) + [sep_id]
    segs += [2] * (len(question_ids) + 1)
    ids, segs = ids[:max_length], segs[:max_length]
    mask = [1] * len(ids)
    pad = max_length - len(ids)
    return {
        "input_ids": np.asarray(ids + [0] * pad, np.int32),
        "segment_ids": np.asarray(segs + [0] * pad, np.int32),
        "attention_mask": np.asarray(mask + [0] * pad, np.int32),
    }


class BEMScorer:
    """Callable scorer: example dict -> equivalence probability.

    tokenizer: an HF BertTokenizerFast (offline vocab works); examples are
    dicts with 'question', 'reference', 'candidate'.
    """

    def __init__(self, cfg: Optional[BEMConfig] = None, params=None,
                 tokenizer=None, seed: int = 0, max_length: int = 128):
        self.cfg = cfg or BEMConfig(max_length=max_length)
        self.params = params if params is not None else init(
            jax.random.key(seed), self.cfg
        )
        if tokenizer is None:
            raise ValueError(
                "BEMScorer requires a tokenizer (BertTokenizerFast with "
                "[CLS]/[SEP] in its vocab)"
            )
        self.tokenizer = tokenizer
        self.max_length = min(max_length, self.cfg.max_length)
        cls_sep = tokenizer.convert_tokens_to_ids(["[CLS]", "[SEP]"])
        self.cls_id, self.sep_id = int(cls_sep[0]), int(cls_sep[1])

        @jax.jit
        def _forward(params, ids, segs, mask):
            return apply(params, self.cfg, ids, segs, mask,
                         deterministic=True)

        self._forward = _forward

    def _encode(self, text: str) -> List[int]:
        return self.tokenizer(text, add_special_tokens=False)["input_ids"]

    def score(self, examples: List[dict]) -> np.ndarray:
        rows = [
            combine_segments(
                self._encode(e["candidate"]), self._encode(e["reference"]),
                self._encode(e["question"]), self.cls_id, self.sep_id,
                self.max_length,
            )
            for e in examples
        ]
        batch = {
            k: jnp.asarray(np.stack([r[k] for r in rows]))
            for k in ("input_ids", "segment_ids", "attention_mask")
        }
        logits = self._forward(self.params, batch["input_ids"],
                               batch["segment_ids"], batch["attention_mask"])
        return np.asarray(jax.nn.softmax(logits, axis=-1))[:, 1]

    def __call__(self, example: dict, threshold_score: bool = True):
        score = float(self.score([example])[0])
        return float(score >= 0.5) if threshold_score else score
