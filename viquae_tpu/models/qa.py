"""Extractive reader: Multi-passage BERT + span extraction.

Parity with meerqat/models/qa.py:
- :func:`get_best_spans` (:18-77): pairwise start (x) end scores, upper
  triangle, CLS ban, optional IR-score weighting (>1), best passage then
  best span — here a single jitted device kernel instead of torch host code.
- :func:`reader_apply` — **MultiPassageBERT** (:80-181): BERT + span head
  over (N*M, L) passages, global softmax across the M passages of each
  question via train.optim.multi_passage_rc_loss, optional learned IR-score
  fusion (score_proj w/b).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from viquae_tpu.models import bert
from viquae_tpu.models import layers as L
from viquae_tpu.models.outputs import ReaderOutput
from viquae_tpu.train.optim import multi_passage_rc_loss


@dataclasses.dataclass(frozen=True)
class ReaderConfig:
    bert: bert.BertConfig = dataclasses.field(
        default_factory=lambda: bert.BertConfig(add_pooler=False)
    )
    fuse_ir_score: bool = False


def param_spec(cfg: ReaderConfig):
    """PartitionSpec pytree mirroring init(): bert tensor-parallel over the
    `model` axis, span head + IR-score fusion scalars replicated."""
    from jax.sharding import PartitionSpec as P

    spec: Dict[str, Any] = {
        "bert": bert.param_spec(cfg.bert),
        "qa_outputs": L.dense_spec(),
    }
    if cfg.fuse_ir_score:
        spec["score_proj_w"] = P(None, None)
        spec["score_proj_b"] = P(None)
    return spec


def init(key, cfg: ReaderConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    params = {
        "bert": bert.init(k1, cfg.bert),
        "qa_outputs": L.dense_init(k2, cfg.bert.hidden_size, 2),
    }
    if cfg.fuse_ir_score:
        params["score_proj_w"] = jnp.ones((1, 1))
        params["score_proj_b"] = jnp.zeros((1,))
    return params


def params_from_hf(state_dict, cfg: ReaderConfig, prefix: str = ""
                   ) -> Dict[str, Any]:
    """Port a torch ``MultiPassageBERT`` / ``BertForQuestionAnswering``
    state_dict (``bert.*`` encoder + ``qa_outputs`` span head, optional
    ``score_proj_w``/``score_proj_b`` — reference models/qa.py:80-151) into
    reader params. This is the egress-runbook entry point for loading the
    reference's released reader checkpoints
    (``PaulLerner/multi_passage_bert_triviaqa_without_viquae_mean_pool_loss``
    and any locally fine-tuned ViQuAE reader) — docs/RUNBOOK_EGRESS.md."""
    import numpy as np

    def get(name):
        t = state_dict[prefix + name]
        return jnp.asarray(np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t
        ))

    params: Dict[str, Any] = {
        "bert": bert.params_from_hf(state_dict, cfg.bert,
                                    prefix=prefix + "bert."),
        "qa_outputs": {"kernel": get("qa_outputs.weight").T,
                       "bias": get("qa_outputs.bias")},
    }
    if cfg.fuse_ir_score and (prefix + "score_proj_w") in state_dict:
        # absent when fine-tuning the fused variant from a non-fused
        # checkpoint — the caller seeds fresh identity params then
        params["score_proj_w"] = get("score_proj_w")
        params["score_proj_b"] = get("score_proj_b")
    return params


def params_from_pretrained_dir(path, cfg: Optional[ReaderConfig] = None
                               ) -> Tuple[Dict[str, Any], ReaderConfig]:
    """Load an HF ``save_pretrained`` reader dir (config.json +
    pytorch_model.bin / model.safetensors) and port it. Returns
    ``(params, cfg)``; when ``cfg`` is None the BertConfig is derived from
    the dir's config.json so any released checkpoint ports unmodified."""
    import os

    if cfg is None:
        from transformers import AutoConfig

        hf_cfg = AutoConfig.from_pretrained(str(path))
        cfg = ReaderConfig(bert=bert.BertConfig.from_hf(
            hf_cfg, add_pooler=False))
    # raw state-dict load (not BertForQuestionAnswering.from_pretrained):
    # the fused variant's score_proj_w/b are unexpected keys to HF and
    # would be silently dropped by from_pretrained
    bin_path = os.path.join(str(path), "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    else:
        from safetensors.torch import load_file

        sd = load_file(os.path.join(str(path), "model.safetensors"))
    return params_from_hf(sd, cfg), cfg


def reader_apply(
    params,
    cfg: ReaderConfig,
    input_ids: jnp.ndarray,            # (N*M, L)
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    passage_scores: Optional[jnp.ndarray] = None,   # (N*M,)
    start_positions: Optional[jnp.ndarray] = None,  # (N*M, A) or (N, M, A)
    end_positions: Optional[jnp.ndarray] = None,
    answer_mask: Optional[jnp.ndarray] = None,
    m_passages: int = 24,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
) -> ReaderOutput:
    bert_out = bert.apply(
        params["bert"], cfg.bert, input_ids,
        attention_mask=attention_mask,
        token_type_ids=token_type_ids,
        deterministic=deterministic, rng=rng,
        compute_dtype=compute_dtype,
    )
    sequence = bert_out["last_hidden_state"]
    logits = L.dense(params["qa_outputs"], sequence)  # (N*M, L, 2)
    start_logits = logits[..., 0]
    end_logits = logits[..., 1]

    if cfg.fuse_ir_score:
        assert passage_scores is not None
        fused = (
            passage_scores[:, None] @ params["score_proj_w"]
            + params["score_proj_b"]
        )
        start_logits = start_logits + fused
        end_logits = end_logits + fused

    loss = start_lp = end_lp = None
    if start_positions is not None and end_positions is not None:
        nm = start_logits.shape[0]
        loss, start_lp, end_lp = multi_passage_rc_loss(
            start_logits, end_logits,
            start_positions.reshape(nm, -1),
            end_positions.reshape(nm, -1),
            answer_mask.reshape(nm, -1),
            m_passages=m_passages,
        )
    return ReaderOutput(
        loss=loss,
        start_logits=start_logits,
        end_logits=end_logits,
        start_log_probs=start_lp,
        end_log_probs=end_lp,
        moe_aux=bert_out.get("moe_aux"),
    )


def reader_apply_packed(
    params,
    cfg: ReaderConfig,
    input_ids: jnp.ndarray,          # (R, Lc) packed canvas
    segment_ids: jnp.ndarray,        # (R, Lc) packing segments (0 = pad)
    position_ids: jnp.ndarray,       # (R, Lc)
    token_type_ids: jnp.ndarray,     # (R, Lc) BERT A/B types on the canvas
    gather_idx: jnp.ndarray,         # (N*M, L) flat canvas positions
    gather_mask: jnp.ndarray,        # (N*M, L) real-token mask
    passage_scores: Optional[jnp.ndarray] = None,
    start_positions: Optional[jnp.ndarray] = None,
    end_positions: Optional[jnp.ndarray] = None,
    answer_mask: Optional[jnp.ndarray] = None,
    m_passages: int = 24,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
) -> ReaderOutput:
    """Packed Multi-passage BERT: (question, passage) pairs packed many-
    per-row onto one canvas (ops/packing.py — the reference's passages are
    exactly 100 tokenizer tokens, data/loading.py:274-306, so a ~125-token
    pair padded to 256 wastes >2x encoder FLOPs). Canvas logits are
    gathered back to the reference's (N*M, L) layout via
    packing.gather_indices; invalid slots get a large negative logit so
    the global softmax across each question's M passages ignores them
    (the padded path instead includes pad-token logits — a documented,
    strictly-cleaner divergence).
    """
    bert_out = bert.apply(
        params["bert"], cfg.bert, input_ids,
        token_type_ids=token_type_ids,
        position_ids=position_ids,
        segment_ids=segment_ids,
        deterministic=deterministic, rng=rng,
        compute_dtype=compute_dtype,
    )
    sequence = bert_out["last_hidden_state"]     # (R, Lc, D)
    logits = L.dense(params["qa_outputs"], sequence)  # (R, Lc, 2)
    flat = logits.reshape(-1, 2)
    picked = flat[gather_idx]                    # (N*M, L, 2)
    neg = jnp.asarray(-1e30, picked.dtype)
    start_logits = jnp.where(gather_mask, picked[..., 0], neg)
    end_logits = jnp.where(gather_mask, picked[..., 1], neg)

    if cfg.fuse_ir_score:
        assert passage_scores is not None
        fused = (
            passage_scores[:, None] @ params["score_proj_w"]
            + params["score_proj_b"]
        )
        start_logits = jnp.where(gather_mask, start_logits + fused, neg)
        end_logits = jnp.where(gather_mask, end_logits + fused, neg)

    loss = start_lp = end_lp = None
    if start_positions is not None and end_positions is not None:
        nm = start_logits.shape[0]
        loss, start_lp, end_lp = multi_passage_rc_loss(
            start_logits, end_logits,
            start_positions.reshape(nm, -1),
            end_positions.reshape(nm, -1),
            answer_mask.reshape(nm, -1),
            m_passages=m_passages,
        )
    return ReaderOutput(
        loss=loss,
        start_logits=start_logits,
        end_logits=end_logits,
        start_log_probs=start_lp,
        end_log_probs=end_lp,
        moe_aux=bert_out.get("moe_aux"),
    )


def eca_reader_init(key, mm_cfg) -> Dict[str, Any]:
    """MultiPassageECA (parity models/qa.py:184-241): the multi-passage
    reader with an ECA multimodal backbone."""
    from viquae_tpu.models import mm

    assert not mm_cfg.no_text, "no_text is only for IR"
    params = mm.eca_init(key, mm_cfg)
    params["qa_outputs"] = L.dense_init(
        jax.random.fold_in(key, 55), mm_cfg.bert.hidden_size, 2
    )
    return params


def eca_reader_apply(
    params,
    mm_cfg,
    text_inputs,
    face_inputs,
    image_inputs=None,
    start_positions=None,
    end_positions=None,
    answer_mask=None,
    m_passages: int = 24,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
) -> "ReaderOutput":
    """Span extraction over the TEXT portion of the ECA sequence with the
    global multi-passage softmax."""
    from viquae_tpu.models import mm

    out = mm.eca_apply(
        params, mm_cfg, text_inputs, face_inputs, image_inputs,
        deterministic=deterministic, rng=rng, compute_dtype=compute_dtype,
    )
    lt = text_inputs["input_ids"].shape[1]
    sequence = out.last_hidden_state[:, :lt]
    logits = L.dense(params["qa_outputs"], sequence)
    start_logits, end_logits = logits[..., 0], logits[..., 1]
    loss = start_lp = end_lp = None
    if start_positions is not None and end_positions is not None:
        nm = start_logits.shape[0]
        loss, start_lp, end_lp = multi_passage_rc_loss(
            start_logits, end_logits,
            start_positions.reshape(nm, -1),
            end_positions.reshape(nm, -1),
            answer_mask.reshape(nm, -1),
            m_passages=m_passages,
        )
    return ReaderOutput(
        loss=loss, start_logits=start_logits, end_logits=end_logits,
        start_log_probs=start_lp, end_log_probs=end_lp,
        moe_aux=out.moe_aux,
    )


@functools.partial(jax.jit, static_argnames=("cannot_be_first_token",))
def get_best_spans(
    start_probs: jnp.ndarray,   # (N, M, L)
    end_probs: jnp.ndarray,     # (N, M, L)
    weights: Optional[jnp.ndarray] = None,  # (N, M), should be > 1
    cannot_be_first_token: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best (passage, start, end-exclusive) per question — device kernel."""
    n, m, length = start_probs.shape
    pairwise = start_probs[..., :, None] * end_probs[..., None, :]
    pairwise = jnp.triu(pairwise)
    if cannot_be_first_token:
        pairwise = pairwise.at[:, :, 0, :].set(0.0)
    if weights is not None:
        minimum = weights.min()
        weights = jnp.where(minimum < 1, weights + 1 - minimum, weights)
        pairwise = pairwise * weights[:, :, None, None]
    flat = pairwise.reshape(n, m, length * length)
    max_per_passage = flat.max(axis=2)
    passage_indices = max_per_passage.argmax(axis=1)
    best = flat[jnp.arange(n), passage_indices]
    flat_arg = best.argmax(axis=-1)
    start_indices = flat_arg // length
    end_indices = flat_arg % length + 1
    return passage_indices, start_indices, end_indices


def log_probs_to_answers(start_log_probs, end_log_probs, input_ids,
                         tokenizer, m_passages: int, weights=None):
    """Decode best spans back to answer strings
    (parity train/trainee.py Reader.log_probs_to_answers)."""
    import numpy as np

    nm, length = start_log_probs.shape
    n = nm // m_passages
    start_p = jnp.exp(start_log_probs).reshape(n, m_passages, length)
    end_p = jnp.exp(end_log_probs).reshape(n, m_passages, length)
    passage, start, end = get_best_spans(start_p, end_p, weights=weights)
    passage, start, end = (
        np.asarray(passage), np.asarray(start), np.asarray(end)
    )
    ids = np.asarray(input_ids).reshape(n, m_passages, length)
    answers = []
    for i in range(n):
        span = ids[i, passage[i], start[i]: end[i]]
        answers.append(tokenizer.decode(span, skip_special_tokens=True))
    return answers


# --------------------------------------------------------------------------
# config-registry bundle (get_pretrained entry for the serving CLI)
# --------------------------------------------------------------------------
from viquae_tpu.core.config import register as _register  # noqa: E402


@_register("MultiPassageBERTReader")
class MultiPassageBERTReader:
    """cfg + params bundle for the extractive reader, instantiable by
    class_name via core.config.get_pretrained (the `answer` CLI) — the
    counterpart of the reference's get_pretrained(MultiPassageBERT, ...)
    (meerqat/train/trainee.py reader setup)."""

    def __init__(self, cfg: "ReaderConfig" = None, params=None, seed: int = 0,
                 bert_config=None, fuse_ir_score: bool = False):
        from viquae_tpu.models import bert as bert_lib

        if cfg is None:
            bcfg = (
                bert_lib.BertConfig(**{**bert_config, "add_pooler": False})
                if bert_config is not None
                else bert_lib.BertConfig(add_pooler=False)
            )
            cfg = ReaderConfig(bert=bcfg, fuse_ir_score=fuse_ir_score)
        self.cfg = cfg
        self.params = (
            params if params is not None
            else init(jax.random.key(seed), cfg)
        )

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        """Load from an export_params dir (train.checkpoint contract)."""
        from viquae_tpu.train.checkpoint import import_params

        bundle = cls(**kwargs)
        bundle.params = import_params(path, bundle.params)
        return bundle
