"""BERT encoder (post-LN), TPU-functional.

Replaces the reference's vendored HF BERT internals
(meerqat/models/bert.py:12-327, "copied from transformers because not
accessible otherwise"): here the encoder is a from-scratch functional JAX
stack reused by DPR towers, the ECA/ILF multimodal encoders and the
multi-passage reader. Weight-port from HF `BertModel` checkpoints via
:func:`params_from_hf`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viquae_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-12
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    add_pooler: bool = True
    # Mixture-of-Experts FFN (beyond-reference capacity scaling, expert
    # weights shard over `model` — ops/moe.py). 0 = dense HF-portable
    # BERT; >0 swaps the FFN of every `moe_every`-th layer for a MoE
    # block with `moe_experts` experts.
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_every: int = 1
    # GShard token-group size: dispatch memory is cf*k*T*group_size
    # floats instead of quadratic-in-T (ops/moe.py module docstring)
    moe_group_size: int = 1024

    @classmethod
    def from_hf(cls, hf_config, add_pooler: bool = True) -> "BertConfig":
        return cls(
            vocab_size=hf_config.vocab_size,
            hidden_size=hf_config.hidden_size,
            num_hidden_layers=hf_config.num_hidden_layers,
            num_attention_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            max_position_embeddings=hf_config.max_position_embeddings,
            type_vocab_size=hf_config.type_vocab_size,
            hidden_act=hf_config.hidden_act,
            layer_norm_eps=hf_config.layer_norm_eps,
            hidden_dropout_prob=hf_config.hidden_dropout_prob,
            attention_probs_dropout_prob=hf_config.attention_probs_dropout_prob,
            add_pooler=add_pooler,
        )


def init(key, cfg: BertConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    params = {
        "embeddings": {
            "word": L.truncated_normal_init(
                keys[0], (cfg.vocab_size, cfg.hidden_size)
            ),
            "position": L.truncated_normal_init(
                keys[1], (cfg.max_position_embeddings, cfg.hidden_size)
            ),
            "token_type": L.truncated_normal_init(
                keys[2], (cfg.type_vocab_size, cfg.hidden_size)
            ),
            "ln": L.layer_norm_init(cfg.hidden_size),
        },
        "layers": [
            _layer_init(keys[3 + i], cfg, i)
            for i in range(cfg.num_hidden_layers)
        ],
    }
    if cfg.add_pooler:
        params["pooler"] = L.dense_init(
            jax.random.fold_in(key, 999), cfg.hidden_size, cfg.hidden_size
        )
    return params


def _is_moe_layer(cfg: BertConfig, i: int) -> bool:
    return cfg.moe_experts > 0 and (i + 1) % cfg.moe_every == 0


def _layer_init(key, cfg: BertConfig, i: int = 0):
    k_attn, k_mlp = jax.random.split(key)
    layer = {
        "attention": L.mha_init(k_attn, cfg.hidden_size, cfg.num_attention_heads),
        "attention_ln": L.layer_norm_init(cfg.hidden_size),
        "output_ln": L.layer_norm_init(cfg.hidden_size),
    }
    if _is_moe_layer(cfg, i):
        from viquae_tpu.ops import moe

        layer["moe"] = moe.moe_init(
            k_mlp, cfg.hidden_size, cfg.intermediate_size, cfg.moe_experts
        )
    else:
        layer["mlp"] = L.mlp_init(
            k_mlp, cfg.hidden_size, cfg.intermediate_size
        )
    return layer


def param_spec(cfg: BertConfig):
    """PartitionSpec pytree for tensor parallelism over the `model` axis."""
    def layer_spec(i):
        s = {
            "attention": L.mha_spec(),
            "attention_ln": L.layer_norm_spec(),
            "output_ln": L.layer_norm_spec(),
        }
        if _is_moe_layer(cfg, i):
            from viquae_tpu.ops import moe

            s["moe"] = moe.moe_spec()  # ep: expert axis over `model`
        else:
            s["mlp"] = L.mlp_spec()
        return s

    spec = {
        "embeddings": {
            "word": P(None, None),
            "position": P(None, None),
            "token_type": P(None, None),
            "ln": L.layer_norm_spec(),
        },
        "layers": [layer_spec(i) for i in range(cfg.num_hidden_layers)],
    }
    if cfg.add_pooler:
        spec["pooler"] = L.dense_spec()
    return spec


def embed(
    params,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng=None,
) -> jnp.ndarray:
    """Embedding sub-module: word+position+type, LN, dropout -> (B, L, D).

    Exposed separately so the multimodal ECA encoder can embed text and
    concatenate face/image tokens before running :func:`encode` (parity with
    `bert_model.embeddings(...)` usage at meerqat/models/mm.py:736).
    """
    emb = params["embeddings"]
    if inputs_embeds is None:
        inputs_embeds = emb["word"][input_ids]
    b, l = inputs_embeds.shape[:2]
    if position_ids is None:
        position_ids = jnp.arange(l)[None, :]
    x = inputs_embeds + emb["position"][position_ids]
    if token_type_ids is None:
        token_type_ids = jnp.zeros((b, l), jnp.int32)
    x = x + emb["token_type"][token_type_ids]
    x = L.layer_norm(emb["ln"], x, cfg.layer_norm_eps)
    return L.dropout(x, cfg.hidden_dropout_prob, deterministic, rng)


def _layer_forward(
    layer, x, bias, rngs, cfg: BertConfig,
    deterministic: bool = True, compute_dtype=jnp.float32,
    token_mask=None,
):
    """One post-LN transformer block (shared by the sequential and the
    pipelined encoders). rngs = (attn_probs, attn_out, ffw_out) keys.
    Returns (y, moe_aux) — moe_aux is 0.0 for dense-FFN layers.
    `token_mask` (B, L) keeps padding tokens out of MoE routing."""
    rng_a, rng_h, rng_b = rngs
    attn = L.mha(
        layer["attention"], x, bias=bias,
        n_heads=cfg.num_attention_heads,
        deterministic=deterministic,
        dropout_rate=cfg.attention_probs_dropout_prob,
        rng=rng_a,
        compute_dtype=compute_dtype,
    )
    attn = L.dropout(attn, cfg.hidden_dropout_prob, deterministic, rng_h)
    x = L.layer_norm(layer["attention_ln"], x + attn, cfg.layer_norm_eps)
    if "moe" in layer:
        from viquae_tpu.ops import moe

        ff, aux = moe.moe_apply(
            layer["moe"], x, top_k=cfg.moe_top_k,
            capacity_factor=cfg.moe_capacity_factor,
            act=cfg.hidden_act, compute_dtype=compute_dtype,
            group_size=cfg.moe_group_size,
            token_mask=token_mask,
        )
    else:
        ff = L.mlp(layer["mlp"], x, cfg.hidden_act, compute_dtype)
        aux = jnp.float32(0.0)
    ff = L.dropout(ff, cfg.hidden_dropout_prob, deterministic, rng_b)
    return L.layer_norm(layer["output_ln"], x + ff, cfg.layer_norm_eps), aux


def encode(
    params,
    cfg: BertConfig,
    hidden: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    output_hidden_states: bool = False,
    activation_sharding=None,
    segment_ids: Optional[jnp.ndarray] = None,
    remat_layers: bool = False,
    return_moe_aux: bool = False,
) -> jnp.ndarray:
    """Encoder stack over pre-built (B, L, D) hidden states.

    `remat_layers=True` checkpoints each transformer layer (PER-LAYER
    gradient checkpointing — the reference's MICT recipe trains batch 512
    with torch checkpointing, EXPERIMENTS.rst:337-339): the backward pass
    recomputes one layer's attention probabilities at a time instead of
    keeping all L x (B, H, S, S) score tensors live, which is what bounds
    large-batch training memory.

    `segment_ids` (B, L), 0 = padding: packed-batch mode — attention is
    block-diagonal per segment (ops/packing.py), overriding
    `attention_mask`.

    With output_hidden_states, returns (final, [embedding_out, layer1_out,
    ...]) — the per-layer seam the reference's ir/embedding `layers` CLS
    extraction uses (ir/embedding.py:228-244).

    `activation_sharding` (a PartitionSpec/NamedSharding over (B, L, D)) is
    the sequence-parallel seam (SURVEY §5.7): constraining the L axis makes
    XLA keep per-layer activations sequence-sharded and insert the gathers
    attention needs — no model-code changes when scaling context.

    With `return_moe_aux` (MoE configs), the summed Switch load-balance
    loss over MoE layers is appended to the return tuple: (x[, hidden],
    aux). Training a MoE config WITHOUT requesting aux raises — silently
    dropping the balance term collapses experts."""
    if cfg.moe_experts > 0 and not deterministic and not return_moe_aux:
        raise ValueError(
            "moe_experts > 0 in training mode requires return_moe_aux="
            "True — add the load-balance aux to the loss (ops/moe.py)"
        )
    b, l = hidden.shape[:2]
    if segment_ids is not None:
        bias = L.attention_bias_from_segments(segment_ids)
        token_mask = segment_ids > 0  # canvas padding rows (segment 0)
    else:
        if attention_mask is None:
            attention_mask = jnp.ones((b, l), jnp.int32)
        bias = L.attention_bias_from_mask(attention_mask)
        token_mask = attention_mask > 0
    # padding tokens must not claim MoE expert-capacity slots or dilute
    # the load-balance aux; dense-FFN layers ignore the mask
    if cfg.moe_experts == 0:
        token_mask = None
    # three INDEPENDENT dropout sites per layer (attention probs, attention
    # output, FFW output), matching HF's independent nn.Dropout modules —
    # reusing one key across sites gives deterministically correlated masks
    rngs = (
        jax.random.split(rng, 3 * cfg.num_hidden_layers)
        if rng is not None
        else [None] * (3 * cfg.num_hidden_layers)
    )
    def layer_fn(layer, x, bias, tok_mask, rng_a, rng_h, rng_b):
        return _layer_forward(
            layer, x, bias, (rng_a, rng_h, rng_b), cfg,
            deterministic=deterministic, compute_dtype=compute_dtype,
            token_mask=tok_mask,
        )

    if remat_layers:
        layer_fn = jax.checkpoint(layer_fn)

    x = hidden
    all_hidden = [x]
    moe_aux = jnp.float32(0.0)
    for i, layer in enumerate(params["layers"]):
        x, aux = layer_fn(layer, x, bias, token_mask, rngs[3 * i],
                          rngs[3 * i + 1], rngs[3 * i + 2])
        moe_aux = moe_aux + aux
        if activation_sharding is not None:
            x = jax.lax.with_sharding_constraint(x, activation_sharding)
        if output_hidden_states:
            all_hidden.append(x)
    out = (x,)
    if output_hidden_states:
        out = out + (all_hidden,)
    if return_moe_aux:
        out = out + (moe_aux,)
    return out if len(out) > 1 else out[0]


# --------------------------------------------------------------------------
# pipeline parallelism (ops/pipeline.py over the `pipe` mesh axis)
# --------------------------------------------------------------------------
def pipeline_params(params, n_stages: int):
    """Restack `params["layers"]` (per-layer list) into the staged layout
    pipeline_apply shards over `pipe`. Embeddings/pooler stay as-is
    (replicated — they run outside the pipelined region)."""
    from viquae_tpu.ops import pipeline as pl

    out = dict(params)
    out["layers"] = pl.stack_stages(params["layers"], n_stages)
    return out


def pipeline_unstack(params):
    """Inverse of :func:`pipeline_params` — back to the checkpoint/HF-port
    per-layer list layout."""
    from viquae_tpu.ops import pipeline as pl

    out = dict(params)
    out["layers"] = pl.unstack_stages(params["layers"])
    return out


def pipeline_param_spec(cfg: BertConfig, n_stages: int):
    """PartitionSpec tree for staged params: layer stack sharded over
    `pipe`, everything else replicated."""
    from jax.sharding import PartitionSpec as PS

    from viquae_tpu.core.mesh import PIPE_AXIS

    spec = param_spec(cfg)
    one_layer = spec["layers"][0]
    spec["layers"] = jax.tree_util.tree_map(
        lambda _: PS(PIPE_AXIS), one_layer
    )
    return spec


def encode_pipelined(
    params,
    cfg: BertConfig,
    hidden: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    *,
    n_micro: int,
    mesh_ctx=None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    segment_ids: Optional[jnp.ndarray] = None,
    remat_layers: bool = False,
):
    """:func:`encode` over the `pipe` mesh axis (GPipe schedule).

    `params["layers"]` must be in the staged layout
    (:func:`pipeline_params`); the batch is split into `n_micro`
    microbatches that stream through the stage ring (ops/pipeline.py).
    Composes with data parallelism (batch dim on `data`). Packed-batch
    `segment_ids` mode works unchanged — the block-diagonal bias is built
    once and microbatched alongside the hidden states.

    Dropout keys are derived per (microbatch, global layer, site) via
    `fold_in`, so masks are independent but NOT bit-identical to the
    sequential encoder's `split` layout — train under ONE schedule.
    Deterministic forward/backward equals :func:`encode` exactly
    (tests/test_pipeline.py)."""
    from viquae_tpu.ops import pipeline as pl

    if cfg.moe_experts > 0:
        # pp x ep composition is an explicit non-goal for now: the GPipe
        # stage contract is shape-preserving per microbatch and has no
        # channel for the per-stage MoE aux loss — shard experts over
        # `model` next to `pipe` once a config needs both
        raise NotImplementedError(
            "encode_pipelined does not support MoE layers "
            "(moe_experts > 0) — use the sequential encoder with ep"
        )

    b, l = hidden.shape[:2]
    if segment_ids is not None:
        bias = L.attention_bias_from_segments(segment_ids)
    else:
        if attention_mask is None:
            attention_mask = jnp.ones((b, l), jnp.int32)
        bias = L.attention_bias_from_mask(attention_mask)
    bias = jnp.broadcast_to(
        bias, (b,) + bias.shape[1:]
    )  # microbatch the query dim even for broadcast (B,1,1,L) biases
    consts = {"bias": pl.microbatch(bias, n_micro)}
    if rng is not None:
        consts["rng"] = jax.random.split(rng, n_micro)
    has_rng = rng is not None

    def stage_fn(stage_layers, x, c, layer_offset):
        per = jax.tree_util.tree_leaves(stage_layers)[0].shape[0]

        def body(x, scanned):
            layer, li = scanned
            if has_rng:
                gi = (layer_offset + li) * 3
                rngs = tuple(
                    jax.random.fold_in(c["rng"], gi + s) for s in range(3)
                )
            else:
                rngs = (None, None, None)
            y, _ = _layer_forward(
                layer, x, c["bias"], rngs, cfg,
                deterministic=deterministic, compute_dtype=compute_dtype,
            )
            return y, None

        if remat_layers:
            body = jax.checkpoint(body)
        x, _ = jax.lax.scan(body, x, (stage_layers, jnp.arange(per)))
        return x

    out = pl.pipeline_apply(
        stage_fn, params["layers"], pl.microbatch(hidden, n_micro),
        consts=consts, mesh_ctx=mesh_ctx,
    )
    return pl.unmicrobatch(out)


def apply(
    params,
    cfg: BertConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    output_hidden_states: bool = False,
    activation_sharding=None,
    segment_ids: Optional[jnp.ndarray] = None,
    remat_layers: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full forward: embed -> encode -> optional tanh pooler.

    Returns {"last_hidden_state": (B, L, D), "pooler_output": (B, D)?}.
    `inputs_embeds` (B, L, D) bypasses word-embedding lookup.
    `activation_sharding`: see `encode` (sequence-parallel seam).
    `segment_ids`: packed-batch block-diagonal attention (see `encode`);
    pass packer-built `position_ids` alongside so positions restart per
    segment.
    """
    rng_emb, rng_enc = (
        jax.random.split(rng) if rng is not None else (None, None)
    )
    x = embed(
        params, cfg, input_ids,
        token_type_ids=token_type_ids,
        position_ids=position_ids,
        inputs_embeds=inputs_embeds,
        deterministic=deterministic,
        rng=rng_emb,
    )
    x = encode(
        params, cfg, x, attention_mask,
        deterministic=deterministic, rng=rng_enc,
        compute_dtype=compute_dtype,
        output_hidden_states=output_hidden_states,
        activation_sharding=activation_sharding,
        segment_ids=segment_ids,
        remat_layers=remat_layers,
        return_moe_aux=cfg.moe_experts > 0,
    )
    hidden_states = moe_aux = None
    if cfg.moe_experts > 0:
        *x, moe_aux = x if isinstance(x, tuple) else (x,)
        x = x[0] if len(x) == 1 else tuple(x)
    if output_hidden_states:
        x, hidden_states = x
    out = {"last_hidden_state": x}
    if hidden_states is not None:
        out["hidden_states"] = hidden_states
    if moe_aux is not None:
        out["moe_aux"] = moe_aux
    if cfg.add_pooler and "pooler" in params:
        out["pooler_output"] = jnp.tanh(L.dense(params["pooler"], x[:, 0]))
    return out


# --------------------------------------------------------------------------
# HF weight port
# --------------------------------------------------------------------------
def params_from_hf(state_dict, cfg: BertConfig, prefix: str = "") -> Dict[str, Any]:
    """Convert a torch `BertModel` state_dict to our param pytree.

    `prefix` strips a wrapper path (e.g. "question_encoder.bert_model." for
    DPR checkpoints). Verified numerically against torch in tests.
    """
    import numpy as np

    if cfg.moe_experts > 0:
        raise ValueError(
            "HF BertModel checkpoints are dense — port into a "
            "moe_experts=0 config (MoE params have no HF counterpart)"
        )

    def get(name):
        t = state_dict[prefix + name]
        return jnp.asarray(np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t))

    def lin(name):
        return {"kernel": get(f"{name}.weight").T, "bias": get(f"{name}.bias")}

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    params = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layer.{i}"
        params["layers"].append(
            {
                "attention": {
                    "q": lin(f"{base}.attention.self.query"),
                    "k": lin(f"{base}.attention.self.key"),
                    "v": lin(f"{base}.attention.self.value"),
                    "o": lin(f"{base}.attention.output.dense"),
                },
                "attention_ln": ln(f"{base}.attention.output.LayerNorm"),
                "mlp": {
                    "in": lin(f"{base}.intermediate.dense"),
                    "out": lin(f"{base}.output.dense"),
                },
                "output_ln": ln(f"{base}.output.LayerNorm"),
            }
        )
    if cfg.add_pooler and (prefix + "pooler.dense.weight") in state_dict:
        params["pooler"] = lin("pooler.dense")
    return params


def params_to_hf_state_dict(params, cfg: BertConfig, prefix: str = ""):
    """Inverse of :func:`params_from_hf`: export trained params as a torch
    `BertModel` state_dict — the save_ptm inter-stage contract
    (meerqat/train/save_ptm.py exports HF `save_pretrained` dirs consumed
    by downstream embedding stages and external HF users)."""
    import numpy as np
    import torch

    if cfg.moe_experts > 0:
        raise ValueError(
            "MoE configs are not HF-BertModel-exportable — the expert "
            "stack has no state_dict counterpart"
        )

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd = {
        f"{prefix}embeddings.word_embeddings.weight": t(params["embeddings"]["word"]),
        f"{prefix}embeddings.position_embeddings.weight": t(
            params["embeddings"]["position"]
        ),
        f"{prefix}embeddings.token_type_embeddings.weight": t(
            params["embeddings"]["token_type"]
        ),
        f"{prefix}embeddings.LayerNorm.weight": t(params["embeddings"]["ln"]["scale"]),
        f"{prefix}embeddings.LayerNorm.bias": t(params["embeddings"]["ln"]["bias"]),
    }
    for i, layer in enumerate(params["layers"]):
        base = f"{prefix}encoder.layer.{i}"
        for hf_name, ours in (
            ("attention.self.query", layer["attention"]["q"]),
            ("attention.self.key", layer["attention"]["k"]),
            ("attention.self.value", layer["attention"]["v"]),
            ("attention.output.dense", layer["attention"]["o"]),
            ("intermediate.dense", layer["mlp"]["in"]),
            ("output.dense", layer["mlp"]["out"]),
        ):
            sd[f"{base}.{hf_name}.weight"] = t(ours["kernel"]).T.contiguous()
            sd[f"{base}.{hf_name}.bias"] = t(ours["bias"])
        for hf_name, ours in (
            ("attention.output.LayerNorm", layer["attention_ln"]),
            ("output.LayerNorm", layer["output_ln"]),
        ):
            sd[f"{base}.{hf_name}.weight"] = t(ours["scale"])
            sd[f"{base}.{hf_name}.bias"] = t(ours["bias"])
    if cfg.add_pooler and "pooler" in params:
        sd[f"{prefix}pooler.dense.weight"] = t(
            params["pooler"]["kernel"]
        ).T.contiguous()
        sd[f"{prefix}pooler.dense.bias"] = t(params["pooler"]["bias"])
    return sd


def save_pretrained_hf(params, cfg: BertConfig, path):
    """Write an HF-loadable BertModel dir (config.json + pytorch_model.bin)."""
    import json as _json
    from pathlib import Path

    import torch

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    hf_config = {
        "architectures": ["BertModel"],
        "model_type": "bert",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "intermediate_size": cfg.intermediate_size,
        "max_position_embeddings": cfg.max_position_embeddings,
        "type_vocab_size": cfg.type_vocab_size,
        "hidden_act": cfg.hidden_act,
        "layer_norm_eps": cfg.layer_norm_eps,
        "hidden_dropout_prob": cfg.hidden_dropout_prob,
        "attention_probs_dropout_prob": cfg.attention_probs_dropout_prob,
    }
    (path / "config.json").write_text(_json.dumps(hf_config, indent=2))
    torch.save(params_to_hf_state_dict(params, cfg), path / "pytorch_model.bin")
    return path
