"""DPR question/context towers.

The reference's retrieval encoders are HF `DPRQuestionEncoder` /
`DPRContextEncoder` (meerqat/train/trainee.py:376-420, data/loading.py:176).
A DPR tower is a BERT encoder whose embedding is the CLS-token hidden state
(projection_dim=0 in all ViQuAE checkpoints), so here it is a thin wrapper
over :mod:`viquae_tpu.models.bert`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from viquae_tpu.core.config import register
from viquae_tpu.models import bert


@dataclasses.dataclass(frozen=True)
class DPRConfig:
    bert: bert.BertConfig = dataclasses.field(
        default_factory=lambda: bert.BertConfig(add_pooler=False)
    )


def init(key, cfg: DPRConfig):
    return bert.init(key, cfg.bert)


def param_spec(cfg: DPRConfig):
    return bert.param_spec(cfg.bert)


def apply(
    params,
    cfg: DPRConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    remat_layers: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns {"pooler_output": (B, D) CLS embedding, "last_hidden_state"}."""
    out = bert.apply(
        params, cfg.bert, input_ids,
        attention_mask=attention_mask,
        token_type_ids=token_type_ids,
        deterministic=deterministic,
        rng=rng,
        compute_dtype=compute_dtype,
        remat_layers=remat_layers,
    )
    # DPR embedding = CLS hidden state (no tanh pooler)
    out["pooler_output"] = out["last_hidden_state"][:, 0]
    return out


def apply_packed(
    params,
    cfg: DPRConfig,
    input_ids: jnp.ndarray,
    segment_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    cls_rows: jnp.ndarray,
    cls_cols: jnp.ndarray,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    remat_layers: bool = False,
    return_aux: bool = False,
) -> jnp.ndarray:
    """Packed-canvas forward: many questions per row (ops/packing.py).

    Attention is block-diagonal per segment and each question's embedding is
    its own first token's ([CLS]) hidden state, gathered at
    (cls_rows, cls_cols). Returns (n_cls, D); entries past the packer's
    `n_seqs` are garbage from the (0, 0) pad pointer — slice them off.

    This replaces the reference's pad-everything-to-max_length question
    embedding (meerqat experiments/ir/viquae/dpr/questions/config.json pads
    questions to 256 tokens) with a ~95%-dense fixed-shape canvas — the
    TPU-native answer to variable-length batches (one compile, no buckets).
    """
    out = bert.apply(
        params, cfg.bert, input_ids,
        position_ids=position_ids,
        segment_ids=segment_ids,
        deterministic=deterministic,
        rng=rng,
        compute_dtype=compute_dtype,
        remat_layers=remat_layers,
    )
    hidden = out["last_hidden_state"]
    cls = hidden[cls_rows, cls_cols]
    if return_aux:
        # (embeddings, moe_aux) — the MoE load-balance term (None = dense)
        return cls, out.get("moe_aux")
    return cls


def make_packed_apply(cfg: DPRConfig):
    """Bind cfg into an ir.embedding.PackedTextEmbedder-shaped apply:
    fn(params, input_ids, segment_ids, position_ids, cls_rows, cls_cols,
    **kw) -> (n_cls, D)."""
    def fn(params, input_ids, segment_ids, position_ids, cls_rows, cls_cols,
           **kw):
        return apply_packed(
            params, cfg, input_ids, segment_ids, position_ids,
            cls_rows, cls_cols, **kw,
        )
    return fn


def params_from_hf_dpr(state_dict, cfg: DPRConfig) -> Dict[str, Any]:
    """Port HF DPRQuestionEncoder/DPRContextEncoder weights.

    HF layouts: "question_encoder.bert_model.*" / "ctx_encoder.bert_model.*"
    (or bare "bert_model.*"). Detects the prefix automatically.
    """
    for prefix in (
        "question_encoder.bert_model.",
        "ctx_encoder.bert_model.",
        "bert_model.",
        "",
    ):
        if (prefix + "embeddings.word_embeddings.weight") in state_dict:
            return bert.params_from_hf(state_dict, cfg.bert, prefix=prefix)
    raise ValueError("Unrecognized DPR state_dict layout")


@register("DPREncoder")
class DPREncoder:
    """Config-registry entry: a loaded DPR tower bundling (cfg, params).

    Mirrors get_pretrained('DPRQuestionEncoder'/...) usage in the reference
    configs; `from_pretrained` accepts an HF model dir/name.
    """

    def __init__(self, cfg: Optional[DPRConfig] = None, params=None,
                 seed: int = 0, bert_config: Optional[dict] = None):
        if cfg is None:
            # YAML/JSON configs size the tower via a nested bert dict
            cfg = (
                DPRConfig(bert=bert.BertConfig(**bert_config))
                if bert_config is not None else DPRConfig()
            )
        self.cfg = cfg
        self.params = (
            params if params is not None else init(jax.random.key(seed), self.cfg)
        )

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        import os

        if os.path.exists(os.path.join(str(path), "params.npz")):
            # an export_params dir (the trainee `export` / save_ptm
            # contract, train/checkpoint.py) — cfg comes from kwargs
            # (bert_config), symmetric with _MMEncoderBundle loading
            from viquae_tpu.train.checkpoint import import_params

            bundle = cls(**kwargs)
            bundle.params = import_params(path, bundle.params)
            return bundle
        import torch  # cpu-only, host-side weight loading
        from transformers import AutoConfig

        hf_cfg = AutoConfig.from_pretrained(path)
        if not hasattr(hf_cfg, "hidden_size"):
            raise ValueError(
                f"{path}: config type {type(hf_cfg).__name__} has no "
                "hidden_size — expected a BERT-family encoder config"
            )
        bcfg = bert.BertConfig.from_hf(hf_cfg, add_pooler=False)
        cfg = DPRConfig(bert=bcfg)
        from transformers import AutoModel

        model = AutoModel.from_pretrained(path, torch_dtype=torch.float32)
        params = params_from_hf_dpr(model.state_dict(), cfg)
        return cls(cfg=cfg, params=params)

    def __call__(self, input_ids, attention_mask=None, **kw):
        return apply(self.params, self.cfg, input_ids, attention_mask, **kw)

    def apply_fn(self, params, input_ids, attention_mask=None, **kw):
        """Pure apply over externally-managed params (trainee contract)."""
        return apply(params, self.cfg, input_ids, attention_mask, **kw)

    def packed_apply_fn(self, params, input_ids, segment_ids, position_ids,
                        cls_rows, cls_cols, **kw):
        """Packed-canvas apply (trainee packed-training contract):
        returns (n_cls, D) CLS embeddings directly."""
        return apply_packed(params, self.cfg, input_ids, segment_ids,
                            position_ids, cls_rows, cls_cols, **kw)
