"""Multimodal fusion encoders (parity meerqat/models/mm.py).

- :func:`eca_apply` — **ECAEncoder** (:557-754): faces/images are projected
  into token space, concatenated AFTER the text embedding module, and the
  whole sequence runs through the BERT encoder stack; CLS-pooled. Optional
  Flamingo-style tanh gating (init 0) on the visual tokens, optional
  `face_and_image_are_exclusive` masking, optional `no_text` (CLS only).
- :func:`ilf_apply` — **IntermediateLinearFusion** (:773-861): DPR pooled
  text + linear-projected summed face/image features, LN + dropout.
- :func:`flamant_layer_apply` / :func:`flamant_apply` — **Flamant**
  (:90-509): BERT layers with gated cross-attention blocks to visual tokens
  every `multimodal_attention_every` layers.
- :func:`clip_for_ir_apply` — **CLIPForIR** (:532-554): text_embeds +
  image_embeds sum, so dot-product similarity covers every mono/cross-modal
  pair.

Visual projection blocks (FaceEmbedding / ImageEmbedding) follow
meerqat/models/image.py:5-37.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from viquae_tpu.models import bert
from viquae_tpu.models import layers as L
from viquae_tpu.models.outputs import ECAEncoderOutput, EncoderOutput


@dataclasses.dataclass(frozen=True)
class MMConfig:
    bert: bert.BertConfig = dataclasses.field(
        default_factory=lambda: bert.BertConfig(add_pooler=False)
    )
    n_images: int = 1
    n_faces: int = 4
    face_dim: int = 512
    bbox_dim: int = 7
    image_dims: Tuple[Tuple[str, int], ...] = (
        ("clip-RN50", 1024), ("imagenet-RN50", 2048),
    )
    face_and_image_are_exclusive: bool = False
    no_text: bool = False
    gating: bool = False


# ---- visual projection blocks ---------------------------------------------
def face_embedding_init(key, cfg: MMConfig):
    k1, k2 = jax.random.split(key)
    d = cfg.bert.hidden_size
    return {
        "face_proj": L.dense_init(k1, cfg.face_dim, d),
        "bbox_proj": L.dense_init(k2, cfg.bbox_dim, d),
        "ln": L.layer_norm_init(d),
    }


def face_embedding_apply(p, cfg: MMConfig, face, bbox, type_embedding=None,
                         deterministic=True, rng=None):
    x = L.dense(p["face_proj"], face) + L.dense(p["bbox_proj"], bbox)
    if type_embedding is not None:
        x = x + type_embedding
    x = L.layer_norm(p["ln"], x, cfg.bert.layer_norm_eps)
    return L.dropout(x, cfg.bert.hidden_dropout_prob, deterministic, rng)


def image_embedding_init(key, cfg: MMConfig, input_dim: int):
    p = {"linear": L.dense_init(key, input_dim, cfg.bert.hidden_size)}
    if cfg.n_images > 1:
        p["ln"] = L.layer_norm_init(cfg.bert.hidden_size)
    return p


def image_embedding_apply(p, cfg: MMConfig, x, type_embedding=None,
                          deterministic=True, rng=None):
    x = L.dense(p["linear"], x)
    if type_embedding is not None:
        x = x + type_embedding
        x = L.layer_norm(p["ln"], x, cfg.bert.layer_norm_eps)
    return L.dropout(x, cfg.bert.hidden_dropout_prob, deterministic, rng)


def tanh_gate_init():
    return {"gate": jnp.zeros((1,))}


def tanh_gate(p, x):
    return x * jnp.tanh(p["gate"])


# --------------------------------------------------------------------------
# ECA encoder
# --------------------------------------------------------------------------
def eca_init(key, cfg: MMConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 5)
    params: Dict[str, Any] = {"bert": bert.init(keys[0], cfg.bert)}
    if cfg.n_images > 1:
        params["image_type_embeddings"] = 0.02 * jax.random.normal(
            keys[1], (cfg.n_images, cfg.bert.hidden_size)
        )
    if cfg.n_faces > 0:
        params["face_embedding"] = face_embedding_init(keys[2], cfg)
        if cfg.gating:
            params["face_gate"] = tanh_gate_init()
    params["image_embeddings"] = {}
    params["image_gates"] = {}
    for i, (name, dim) in enumerate(cfg.image_dims):
        params["image_embeddings"][name] = image_embedding_init(
            jax.random.fold_in(keys[3], i), cfg, dim
        )
        if cfg.gating:
            params["image_gates"][name] = tanh_gate_init()
    return params


def _visual_tokens(params, cfg: MMConfig, face_inputs, image_inputs,
                   deterministic, rng):
    """Project faces+images to (B, T_vis, D) tokens + (B, T_vis) mask."""

    # one key per projection branch: a shared key on same-shape branches
    # (e.g. two image kinds) would yield bitwise-identical dropout masks
    def branch_rng(i):
        return jax.random.fold_in(rng, i) if rng is not None else None

    faces = face_inputs["face"]  # (B, n_images, n_faces, face_dim)
    b, n_images, n_faces, _ = faces.shape
    tokens, masks = [], []
    if n_faces > 0:
        type_emb = None
        if cfg.n_images > 1:
            type_ids = jnp.broadcast_to(
                jnp.arange(n_images)[None, :, None], (b, n_images, n_faces)
            )
            type_emb = params["image_type_embeddings"][type_ids]
        face_out = face_embedding_apply(
            params["face_embedding"], cfg, faces, face_inputs["bbox"],
            type_embedding=type_emb, deterministic=deterministic,
            rng=branch_rng(0),
        ).reshape(b, n_images * n_faces, -1)
        if cfg.gating:
            face_out = tanh_gate(params["face_gate"], face_out)
        tokens.append(face_out)
    face_mask = face_inputs["attention_mask"].reshape(b, n_images * n_faces)
    if n_faces > 0:
        masks.append(face_mask)

    image_mask_parts = []
    for img_i, (name, image) in enumerate((image_inputs or {}).items()):
        type_emb = None
        if cfg.n_images > 1:
            type_ids = jnp.broadcast_to(jnp.arange(n_images)[None], (b, n_images))
            type_emb = params["image_type_embeddings"][type_ids]
        out = image_embedding_apply(
            params["image_embeddings"][name], cfg,
            image["input"].reshape(b, n_images, -1),
            type_embedding=type_emb, deterministic=deterministic,
            rng=branch_rng(1 + img_i),
        )
        if cfg.gating:
            out = tanh_gate(params["image_gates"][name], out)
        tokens.append(out)
        image_mask_parts.append(image["attention_mask"])
    if image_mask_parts:
        image_mask = jnp.concatenate(image_mask_parts, axis=1)
        if cfg.face_and_image_are_exclusive:
            has_face = face_mask.sum(axis=1, keepdims=True) > 0
            image_mask = jnp.where(has_face, 0, image_mask)
        masks.append(image_mask)
    vis_tokens = (
        jnp.concatenate(tokens, axis=1)
        if tokens else jnp.zeros((b, 0, cfg.bert.hidden_size))
    )
    vis_mask = (
        jnp.concatenate(masks, axis=1) if masks else jnp.zeros((b, 0))
    )
    return vis_tokens, vis_mask


def eca_apply(
    params,
    cfg: MMConfig,
    text_inputs: Dict[str, jnp.ndarray],
    face_inputs: Dict[str, jnp.ndarray],
    image_inputs: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    remat_layers: bool = False,
) -> ECAEncoderOutput:
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    vis_tokens, vis_mask = _visual_tokens(
        params, cfg, face_inputs, image_inputs, deterministic, rngs[0]
    )
    input_ids = text_inputs["input_ids"]
    attention_mask = text_inputs["attention_mask"]
    token_type_ids = text_inputs.get("token_type_ids")
    if cfg.no_text:
        input_ids = input_ids[:, :1]
        attention_mask = attention_mask[:, :1]
        if token_type_ids is not None:
            token_type_ids = token_type_ids[:, :1]
    text_emb = bert.embed(
        params["bert"], cfg.bert, input_ids,
        token_type_ids=token_type_ids,
        deterministic=deterministic, rng=rngs[1],
    )
    hidden = jnp.concatenate([text_emb, vis_tokens], axis=1)
    mask = jnp.concatenate(
        [attention_mask, vis_mask.astype(attention_mask.dtype)], axis=1
    )
    moe = cfg.bert.moe_experts > 0
    sequence = bert.encode(
        params["bert"], cfg.bert, hidden, mask,
        deterministic=deterministic, rng=rngs[2],
        compute_dtype=compute_dtype, remat_layers=remat_layers,
        return_moe_aux=moe,
    )
    moe_aux = None
    if moe:
        sequence, moe_aux = sequence
    return ECAEncoderOutput(
        pooler_output=sequence[:, 0], last_hidden_state=sequence,
        moe_aux=moe_aux,
    )


def eca_apply_packed(
    params,
    cfg: MMConfig,
    input_ids: jnp.ndarray,
    segment_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    cls_rows: jnp.ndarray,
    cls_cols: jnp.ndarray,
    vis_rows: jnp.ndarray,
    vis_cols: jnp.ndarray,
    face_inputs: Dict[str, jnp.ndarray],
    image_inputs: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    remat_layers: bool = False,
    return_aux: bool = False,
) -> jnp.ndarray:
    """Packed-canvas ECA forward: many samples per row (ops/packing.py).

    The canvas comes from `packing.pack_with_reserved(seqs, T_vis, ...)`:
    each sample's segment holds its text tokens followed by T_vis reserved
    slots at (vis_rows, vis_cols) (shape (n_cls, T_vis)). The text canvas
    is embedded normally, then each sample's face/image tokens
    (`_visual_tokens`, identical to `eca_apply`) are SCATTERED into its
    reserved slots — `.set` replaces the whole vector there, so reserved
    slots carry no position/LN treatment, exactly like the unpacked concat
    (meerqat/models/mm.py:736 appends projections to the embedding output).
    Slots whose face/image is absent must be given segment id 0 by the
    collator (attention then ignores them, the mask-concat equivalent).
    Pointers past `n_seqs` are out of bounds and dropped by the scatter.

    Returns (n_cls, D) CLS states; entries past the packer's n_seqs are
    garbage — slice them off. With `return_aux`, returns (cls, moe_aux) —
    the MoE load-balance term (None for dense configs).
    """
    if cfg.no_text:
        raise NotImplementedError(
            "packed ECA assumes text tokens; use eca_apply for no_text")
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    vis_tokens, _ = _visual_tokens(
        params, cfg, face_inputs, image_inputs, deterministic, rngs[0]
    )
    hidden = bert.embed(
        params["bert"], cfg.bert, input_ids,
        position_ids=position_ids,
        deterministic=deterministic, rng=rngs[1],
    )
    d = hidden.shape[-1]
    b, t_vis = vis_tokens.shape[:2]
    # pointer arrays are n_cls-padded; visual inputs carry the true batch
    vis_rows, vis_cols = vis_rows[:b], vis_cols[:b]
    assert vis_rows.shape == (b, t_vis), (vis_rows.shape, (b, t_vis))
    hidden = hidden.at[
        vis_rows.reshape(-1), vis_cols.reshape(-1)
    ].set(vis_tokens.reshape(-1, d).astype(hidden.dtype), mode="drop")
    moe = cfg.bert.moe_experts > 0
    sequence = bert.encode(
        params["bert"], cfg.bert, hidden,
        deterministic=deterministic, rng=rngs[2],
        compute_dtype=compute_dtype,
        segment_ids=segment_ids, remat_layers=remat_layers,
        return_moe_aux=moe,
    )
    moe_aux = None
    if moe:
        sequence, moe_aux = sequence
    cls = sequence[cls_rows, cls_cols]
    if return_aux:
        return cls, moe_aux
    return cls


# --------------------------------------------------------------------------
# Intermediate Linear Fusion
# --------------------------------------------------------------------------
def ilf_init(key, cfg: MMConfig) -> Dict[str, Any]:
    assert cfg.n_images == 1, "ILF supports a single image (parity)"
    keys = jax.random.split(key, 5)
    params: Dict[str, Any] = {"dpr_encoder": bert.init(keys[0], cfg.bert)}
    if cfg.n_faces > 0:
        params["face_embedding"] = face_embedding_init(keys[1], cfg)
    params["image_embeddings"] = {
        name: image_embedding_init(jax.random.fold_in(keys[2], i), cfg, dim)
        for i, (name, dim) in enumerate(cfg.image_dims)
    }
    d = cfg.bert.hidden_size
    params["dpr_proj"] = L.dense_init(keys[3], d, d)
    params["ln"] = L.layer_norm_init(d)
    return params


def _ilf_fuse_visual(params, cfg: MMConfig, output, face_inputs,
                     image_inputs, deterministic, rng):
    """Shared ILF fusion tail (unpacked + packed paths — two copies
    drifted before a round-3 review merged them): masked face-projection
    sum + image-projection sums + LN + dropout. Exclusivity zeroes the
    image INPUT — reference parity, including the reference's dense-bias
    leak-through for face-bearing samples (meerqat/models/mm.py:850-859
    does image['input'][where_are_faces] = 0 then still applies the dense
    layer). Every dropout site gets its own folded key."""

    def site_rng(i):
        return jax.random.fold_in(rng, i) if rng is not None else None

    faces = face_inputs["face"]
    b, n_images, n_faces, _ = faces.shape
    if n_faces > 0:
        face_out = face_embedding_apply(
            params["face_embedding"], cfg,
            faces.reshape(b, n_images * n_faces, -1),
            face_inputs["bbox"].reshape(b, n_images * n_faces, -1),
            deterministic=deterministic, rng=site_rng(0),
        )
        # mask then sum over faces (divergence from the reference, which
        # sums the LN-of-zero embeddings of PADDED faces too)
        mask = face_inputs["attention_mask"].reshape(b, n_images * n_faces, 1)
        output = output + (face_out * mask).sum(axis=1)

    face_mask_flat = face_inputs["attention_mask"].reshape(b, -1)
    has_face = face_mask_flat.sum(axis=1, keepdims=True) > 0
    for img_i, (name, image) in enumerate((image_inputs or {}).items()):
        inp = image["input"].reshape(b, -1)
        if cfg.face_and_image_are_exclusive:
            inp = jnp.where(has_face, 0.0, inp)
        output = output + image_embedding_apply(
            params["image_embeddings"][name], cfg, inp,
            deterministic=deterministic, rng=site_rng(1 + img_i),
        )
    output = L.layer_norm(params["ln"], output, cfg.bert.layer_norm_eps)
    return L.dropout(
        output, cfg.bert.hidden_dropout_prob, deterministic, site_rng(99)
    )


def ilf_apply(
    params,
    cfg: MMConfig,
    text_inputs: Dict[str, jnp.ndarray],
    face_inputs: Dict[str, jnp.ndarray],
    image_inputs: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    remat_layers: bool = False,
) -> EncoderOutput:
    rngs = jax.random.split(rng, 2) if rng is not None else (None,) * 2
    bert_out = bert.apply(
        params["dpr_encoder"], cfg.bert,
        text_inputs["input_ids"], text_inputs["attention_mask"],
        token_type_ids=text_inputs.get("token_type_ids"),
        deterministic=deterministic, rng=rngs[0],
        compute_dtype=compute_dtype, remat_layers=remat_layers,
    )
    text = bert_out["last_hidden_state"][:, 0]
    output = L.dense(params["dpr_proj"], text)
    output = _ilf_fuse_visual(params, cfg, output, face_inputs,
                              image_inputs, deterministic, rngs[1])
    return EncoderOutput(
        pooler_output=output, moe_aux=bert_out.get("moe_aux")
    )


def ilf_apply_packed(
    params,
    cfg: MMConfig,
    input_ids: jnp.ndarray,
    segment_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    cls_rows: jnp.ndarray,
    cls_cols: jnp.ndarray,
    face_inputs: Dict[str, jnp.ndarray],
    image_inputs: Optional[Dict[str, Dict[str, jnp.ndarray]]] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
    remat_layers: bool = False,
    return_aux: bool = False,
) -> jnp.ndarray:
    """Packed-canvas ILF forward: the text CLS comes from a packed DPR
    tower (block-diagonal attention); the visual side is a per-sample SUM
    of projections (no tokens), so no reserved slots are needed — plain
    `pack_text_inputs` canvases work. Returns (n_cls, D); rows past the
    packer's n_seqs are garbage. With `return_aux`, returns
    (embeddings, moe_aux) — the MoE load-balance term (None for dense)."""
    rngs = jax.random.split(rng, 2) if rng is not None else (None,) * 2
    bert_out = bert.apply(
        params["dpr_encoder"], cfg.bert, input_ids,
        position_ids=position_ids, segment_ids=segment_ids,
        deterministic=deterministic, rng=rngs[0],
        compute_dtype=compute_dtype, remat_layers=remat_layers,
    )
    text = bert_out["last_hidden_state"][cls_rows, cls_cols]

    b = face_inputs["face"].shape[0]
    output = L.dense(params["dpr_proj"], text[: b])
    output = _ilf_fuse_visual(params, cfg, output, face_inputs,
                              image_inputs, deterministic, rngs[1])
    if return_aux:
        return output, bert_out.get("moe_aux")
    return output


# --------------------------------------------------------------------------
# Flamant: gated cross-attention every n layers
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class FlamantConfig(MMConfig):
    multimodal_attention_every: int = 1
    image_num_attention_heads: int = 12
    image_intermediate_size: int = 3072


def flamant_init(key, cfg: FlamantConfig) -> Dict[str, Any]:
    params = eca_init(key, cfg)
    d = cfg.bert.hidden_size
    params["xattn_layers"] = {}
    for i in range(0, cfg.bert.num_hidden_layers, cfg.multimodal_attention_every):
        k = jax.random.fold_in(key, 1000 + i)
        k1, k2 = jax.random.split(k)
        params["xattn_layers"][str(i)] = {
            "xattn": L.mha_init(k1, d, cfg.image_num_attention_heads),
            "xattn_ln": L.layer_norm_init(d),
            "ffw": L.mlp_init(k2, d, cfg.image_intermediate_size),
            "ln": L.layer_norm_init(d),
            "attn_gate": tanh_gate_init() if cfg.gating else None,
            "ffw_gate": tanh_gate_init() if cfg.gating else None,
        }
    return params


def flamant_apply(
    params,
    cfg: FlamantConfig,
    text_inputs: Dict[str, jnp.ndarray],
    face_inputs: Dict[str, jnp.ndarray],
    image_inputs: Optional[Dict] = None,
    deterministic: bool = True,
    rng=None,
    compute_dtype=jnp.float32,
) -> ECAEncoderOutput:
    if cfg.bert.moe_experts > 0:
        raise NotImplementedError(
            "Flamant hand-rolls its BertLayer loop (gated cross-attention "
            "interleaving) and does not support moe_experts > 0 — use a "
            "dense BertConfig or the ECA/ILF/DPR MoE paths"
        )
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
    vis_tokens, vis_mask = _visual_tokens(
        params, cfg, face_inputs, image_inputs, deterministic, rngs[0]
    )
    x = bert.embed(
        params["bert"], cfg.bert, text_inputs["input_ids"],
        token_type_ids=text_inputs.get("token_type_ids"),
        deterministic=deterministic, rng=rngs[1],
    )
    bcfg = cfg.bert

    # per-layer, per-site dropout keys (the reference's Flamant layers are
    # BertLayer-based and dropout attention probs + both hidden outputs;
    # this path previously trained with NO transformer dropout at all)
    def site_rng(i):
        return jax.random.fold_in(rngs[1], 1 + i) if rng is not None else None

    text_bias = L.attention_bias_from_mask(text_inputs["attention_mask"])
    vis_bias = L.attention_bias_from_mask(vis_mask)
    for i, layer in enumerate(params["bert"]["layers"]):
        xl = params["xattn_layers"].get(str(i))
        if xl is not None and vis_tokens.shape[1] > 0:
            # gated cross-attention block (residual+LN inside, like
            # BertAttention), then gated FFW, then LN
            attn = L.mha(
                xl["xattn"], x, vis_tokens, bias=vis_bias,
                n_heads=cfg.image_num_attention_heads,
                deterministic=deterministic,
                dropout_rate=bcfg.attention_probs_dropout_prob,
                rng=site_rng(6 * i),
                compute_dtype=compute_dtype,
            )
            attn = L.dropout(attn, bcfg.hidden_dropout_prob, deterministic,
                             site_rng(6 * i + 1))
            attn = L.layer_norm(xl["xattn_ln"], attn + x, bcfg.layer_norm_eps)
            if xl["attn_gate"] is not None:
                attn = tanh_gate(xl["attn_gate"], attn)
            x = attn + x
            ffw = L.mlp(xl["ffw"], x, "gelu", compute_dtype)
            ffw = L.dropout(ffw, bcfg.hidden_dropout_prob, deterministic,
                            site_rng(6 * i + 2))
            if xl["ffw_gate"] is not None:
                ffw = tanh_gate(xl["ffw_gate"], ffw)
            x = L.layer_norm(xl["ln"], ffw + x, bcfg.layer_norm_eps)
        # standard BERT layer
        attn = L.mha(
            layer["attention"], x, bias=text_bias,
            n_heads=bcfg.num_attention_heads,
            deterministic=deterministic,
            dropout_rate=bcfg.attention_probs_dropout_prob,
            rng=site_rng(6 * i + 3),
            compute_dtype=compute_dtype,
        )
        attn = L.dropout(attn, bcfg.hidden_dropout_prob, deterministic,
                         site_rng(6 * i + 4))
        x = L.layer_norm(layer["attention_ln"], x + attn, bcfg.layer_norm_eps)
        ff = L.mlp(layer["mlp"], x, bcfg.hidden_act, compute_dtype)
        ff = L.dropout(ff, bcfg.hidden_dropout_prob, deterministic,
                       site_rng(6 * i + 5))
        x = L.layer_norm(layer["output_ln"], x + ff, bcfg.layer_norm_eps)
    return ECAEncoderOutput(pooler_output=x[:, 0], last_hidden_state=x)


# --------------------------------------------------------------------------
# config-registry wrappers (get_pretrained parity: named instantiation of
# multimodal encoders from kwargs-tree configs, data/loading.py:167-183)
# --------------------------------------------------------------------------
from viquae_tpu.core.config import register as _register


class _MMEncoderBundle:
    """cfg + params + apply_fn triple the trainee/embedder layers consume."""

    init_fn = None
    forward = None

    def __init__(self, cfg: Optional[MMConfig] = None, params=None,
                 seed: int = 0, **cfg_kwargs):
        if cfg is None:
            cfg_kwargs = dict(cfg_kwargs)  # don't mutate the caller's tree
            if "image_dims" in cfg_kwargs and isinstance(
                cfg_kwargs["image_dims"], dict
            ):
                cfg_kwargs["image_dims"] = tuple(
                    cfg_kwargs["image_dims"].items()
                )
            elif "image_dims" in cfg_kwargs:
                # JSON lists of [name, dim] pairs -> hashable tuples
                cfg_kwargs["image_dims"] = tuple(
                    tuple(pair) for pair in cfg_kwargs["image_dims"]
                )
            if isinstance(cfg_kwargs.get("bert"), dict):
                cfg_kwargs["bert"] = bert.BertConfig(**cfg_kwargs["bert"])
            cfg = MMConfig(**cfg_kwargs)
        self.cfg = cfg
        self.params = (
            params if params is not None
            else type(self).init_fn(jax.random.key(seed), cfg)
        )

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        """Load params from an export_params dir (the save_ptm contract)."""
        from viquae_tpu.train.checkpoint import import_params

        bundle = cls(**kwargs)
        bundle.params = import_params(path, bundle.params)
        return bundle

    def apply_fn(self, params, text_inputs, face_inputs, image_inputs=None,
                 **kw):
        return type(self).forward(
            params, self.cfg, text_inputs, face_inputs, image_inputs, **kw
        )


@_register("ECAEncoder")
class ECAEncoder(_MMEncoderBundle):
    init_fn = staticmethod(eca_init)
    forward = staticmethod(eca_apply)
    PACKED_NEEDS_VIS = True  # visual tokens scatter into reserved slots

    def packed_apply_fn(self, params, input_ids, segment_ids, position_ids,
                        cls_rows, cls_cols, vis_rows, vis_cols,
                        face_inputs, image_inputs=None, **kw):
        """Packed-canvas forward (mm.eca_apply_packed) — the trainee routes
        here when the collator emits mm canvases (packed=True)."""
        return eca_apply_packed(
            params, self.cfg, input_ids, segment_ids, position_ids,
            cls_rows, cls_cols, vis_rows, vis_cols,
            face_inputs, image_inputs, **kw,
        )


@_register("IntermediateLinearFusion")
class IntermediateLinearFusion(_MMEncoderBundle):
    init_fn = staticmethod(ilf_init)
    forward = staticmethod(ilf_apply)
    PACKED_NEEDS_VIS = False  # visual side is a sum, not tokens

    def packed_apply_fn(self, params, input_ids, segment_ids, position_ids,
                        cls_rows, cls_cols, face_inputs, image_inputs=None,
                        **kw):
        return ilf_apply_packed(
            params, self.cfg, input_ids, segment_ids, position_ids,
            cls_rows, cls_cols, face_inputs, image_inputs, **kw,
        )


# --------------------------------------------------------------------------
# CLIPForIR
# --------------------------------------------------------------------------
def clip_for_ir_apply(clip_params, text_cfg, vision_cfg, input_ids,
                      attention_mask, pixel_values,
                      compute_dtype=jnp.float32) -> EncoderOutput:
    """text_embeds + image_embeds sum (models/mm.py:532-554): with
    dot-product similarity this scores all mono+cross-modal pairs."""
    from viquae_tpu.models import clip as clip_lib

    text = clip_lib.text_apply(
        clip_params["text"], text_cfg, input_ids, attention_mask,
        compute_dtype=compute_dtype,
    )["text_embeds"]
    image = clip_lib.vit_apply(
        clip_params["vision"], vision_cfg, pixel_values,
        compute_dtype=compute_dtype,
    )["image_embeds"]
    return EncoderOutput(pooler_output=text + image)
