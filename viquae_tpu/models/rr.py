"""Cross-encoder rerankers (parity meerqat/models/rr.py:11-82).

Each scores a (question [SEP] passage) pair with a single logit from the CLS
representation; training reshapes (N*M,) logits to (N, M) for the CE
objective (train.objectives.reranker_loss).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from viquae_tpu.models import bert
from viquae_tpu.models import layers as L
from viquae_tpu.models import mm
from viquae_tpu.models.outputs import ReRankerOutput


@dataclasses.dataclass(frozen=True)
class BertReRankerConfig:
    bert: bert.BertConfig = dataclasses.field(
        default_factory=lambda: bert.BertConfig(add_pooler=False)
    )


def bert_reranker_init(key, cfg: BertReRankerConfig):
    k1, k2 = jax.random.split(key)
    return {
        "bert": bert.init(k1, cfg.bert),
        "classifier": L.dense_init(k2, cfg.bert.hidden_size, 1),
    }


def bert_reranker_apply(params, cfg: BertReRankerConfig, input_ids,
                        attention_mask=None, token_type_ids=None,
                        deterministic=True, rng=None,
                        compute_dtype=jnp.float32) -> ReRankerOutput:
    out = bert.apply(
        params["bert"], cfg.bert, input_ids,
        attention_mask=attention_mask, token_type_ids=token_type_ids,
        deterministic=deterministic, rng=rng, compute_dtype=compute_dtype,
    )
    logits = L.dense(params["classifier"], out["last_hidden_state"][:, 0])
    return ReRankerOutput(logits=logits[..., 0], moe_aux=out.get("moe_aux"))


def bert_reranker_apply_packed(params, cfg: BertReRankerConfig, input_ids,
                               segment_ids, position_ids, token_type_ids,
                               cls_rows, cls_cols, deterministic=True,
                               rng=None,
                               compute_dtype=jnp.float32) -> ReRankerOutput:
    """Packed cross-encoder: (question [SEP] passage) pairs packed
    many-per-row (ops/packing.py, ~125 real tokens vs max_length padded);
    each pair's logit comes from its own [CLS] gathered at
    (cls_rows, cls_cols)."""
    out = bert.apply(
        params["bert"], cfg.bert, input_ids,
        token_type_ids=token_type_ids,
        position_ids=position_ids,
        segment_ids=segment_ids,
        deterministic=deterministic, rng=rng, compute_dtype=compute_dtype,
    )
    cls = out["last_hidden_state"][cls_rows, cls_cols]
    logits = L.dense(params["classifier"], cls)
    return ReRankerOutput(logits=logits[..., 0], moe_aux=out.get("moe_aux"))


def eca_reranker_init(key, cfg: mm.MMConfig):
    params = mm.eca_init(key, cfg)
    params["classifier"] = L.dense_init(
        jax.random.fold_in(key, 77), cfg.bert.hidden_size, 1
    )
    return params


def eca_reranker_apply(params, cfg: mm.MMConfig, text_inputs, face_inputs,
                       image_inputs=None, deterministic=True, rng=None,
                       compute_dtype=jnp.float32) -> ReRankerOutput:
    out = mm.eca_apply(
        params, cfg, text_inputs, face_inputs, image_inputs,
        deterministic=deterministic, rng=rng, compute_dtype=compute_dtype,
    )
    logits = L.dense(params["classifier"], out.pooler_output)
    return ReRankerOutput(logits=logits[..., 0], moe_aux=out.moe_aux)


def flamant_reranker_init(key, cfg: mm.FlamantConfig):
    params = mm.flamant_init(key, cfg)
    params["classifier"] = L.dense_init(
        jax.random.fold_in(key, 77), cfg.bert.hidden_size, 1
    )
    return params


def flamant_reranker_apply(params, cfg: mm.FlamantConfig, text_inputs,
                           face_inputs, image_inputs=None,
                           deterministic=True, rng=None,
                           compute_dtype=jnp.float32) -> ReRankerOutput:
    out = mm.flamant_apply(
        params, cfg, text_inputs, face_inputs, image_inputs,
        deterministic=deterministic, rng=rng, compute_dtype=compute_dtype,
    )
    logits = L.dense(params["classifier"], out.pooler_output)
    return ReRankerOutput(logits=logits[..., 0])
