"""ViLT: single-stream vision-and-language transformer.

The reference vendors HF ViLT internals for patch embedding with
interpolated position encodings (meerqat/models/vilt.py:30-340) and builds
`ViltForIR` (CLS-pooled retrieval encoder, models/mm.py:512-529) and
`MultiPassageVilt` (reader, models/qa.py:244-492) on top. Here ViLT is a
functional pre-LN ViT over the concatenated [text tokens | CLS+patches]
sequence with modality-type embeddings; the patch grid is STATIC (images
are resized to `image_size` on device) — the reference's dynamic
max_image_length patch sampling is an XLA anti-pattern and is replaced by
fixed-resolution + position-embedding interpolation at port time.

Weight port from HF `ViltModel` state_dicts via :func:`params_from_hf`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.models import layers as L
from viquae_tpu.models.outputs import EncoderOutput, ReaderOutput


@dataclasses.dataclass(frozen=True)
class ViltConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 40
    type_vocab_size: int = 2
    modality_type_vocab_size: int = 2
    image_size: int = 384
    patch_size: int = 32
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu_exact"
    n_images: int = 1

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _vit_block_init(key, cfg: ViltConfig):
    k1, k2 = jax.random.split(key)
    return {
        "ln_before": L.layer_norm_init(cfg.hidden_size),
        "attention": L.mha_init(k1, cfg.hidden_size, cfg.num_heads),
        "ln_after": L.layer_norm_init(cfg.hidden_size),
        "mlp": L.mlp_init(k2, cfg.hidden_size, cfg.intermediate_size),
    }


def init(key, cfg: ViltConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 6)
    return {
        "text": {
            "word": L.truncated_normal_init(
                keys[0], (cfg.vocab_size, cfg.hidden_size)
            ),
            "position": L.truncated_normal_init(
                keys[1], (cfg.max_positions, cfg.hidden_size)
            ),
            "token_type": L.truncated_normal_init(
                keys[2], (cfg.type_vocab_size, cfg.hidden_size)
            ),
            "ln": L.layer_norm_init(cfg.hidden_size),
        },
        "cls_token": L.truncated_normal_init(keys[3], (cfg.hidden_size,)),
        "patch_embedding": {
            "kernel": L.truncated_normal_init(
                keys[4], (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size)
            ),
            "bias": jnp.zeros((cfg.hidden_size,)),
        },
        "position_embeddings": L.truncated_normal_init(
            keys[5], (cfg.n_patches + 1, cfg.hidden_size)
        ),
        "modality_type": L.truncated_normal_init(
            jax.random.fold_in(key, 91),
            (cfg.modality_type_vocab_size, cfg.hidden_size),
        ),
        "blocks": [
            _vit_block_init(jax.random.fold_in(key, 100 + i), cfg)
            for i in range(cfg.num_layers)
        ],
        "final_ln": L.layer_norm_init(cfg.hidden_size),
        "pooler": L.dense_init(
            jax.random.fold_in(key, 92), cfg.hidden_size, cfg.hidden_size
        ),
    }


def visual_embed(params, cfg: ViltConfig, pixel_values: jnp.ndarray
                 ) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, n_patches+1, D) with CLS + position embeddings."""
    b = pixel_values.shape[0]
    patches = jax.lax.conv_general_dilated(
        pixel_values, params["patch_embedding"]["kernel"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + params["patch_embedding"]["bias"]
    x = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["position_embeddings"][: x.shape[1]]


def apply(
    params,
    cfg: ViltConfig,
    input_ids: jnp.ndarray,
    pixel_values: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    pixel_mask: Optional[jnp.ndarray] = None,
    image_token_type_idx: int = 1,
    compute_dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """input_ids (B, Lt); pixel_values (B, H, W, 3) already normalized;
    pixel_mask (B, n_images) masks whole absent images (n_images > 1 folds
    extra images into the patch sequence)."""
    b, lt = input_ids.shape
    text = params["text"]
    t = (
        text["word"][input_ids]
        + text["position"][jnp.arange(lt)][None]
        + text["token_type"][
            token_type_ids if token_type_ids is not None
            else jnp.zeros((b, lt), jnp.int32)
        ]
    )
    t = L.layer_norm(text["ln"], t, cfg.layer_norm_eps)
    t = t + params["modality_type"][0]

    if pixel_values.ndim == 5:  # (B, n_images, H, W, 3)
        n_images = pixel_values.shape[1]
        flat = pixel_values.reshape((-1,) + pixel_values.shape[2:])
        v = visual_embed(params, cfg, flat)
        v = v.reshape(b, n_images * v.shape[1], cfg.hidden_size)
        v_mask = (
            jnp.repeat(pixel_mask, cfg.n_patches + 1, axis=1)
            if pixel_mask is not None
            else jnp.ones((b, v.shape[1]), jnp.int32)
        )
    else:
        v = visual_embed(params, cfg, pixel_values)
        v_mask = jnp.ones((b, v.shape[1]), jnp.int32)
    v = v + params["modality_type"][image_token_type_idx]

    x = jnp.concatenate([t, v], axis=1)
    if attention_mask is None:
        attention_mask = jnp.ones((b, lt), jnp.int32)
    mask = jnp.concatenate([attention_mask, v_mask], axis=1)
    bias = L.attention_bias_from_mask(mask)

    for block in params["blocks"]:
        h = L.layer_norm(block["ln_before"], x, cfg.layer_norm_eps)
        x = x + L.mha(block["attention"], h, bias=bias, n_heads=cfg.num_heads,
                      compute_dtype=compute_dtype)
        h = L.layer_norm(block["ln_after"], x, cfg.layer_norm_eps)
        x = x + L.mlp(block["mlp"], h, cfg.hidden_act, compute_dtype)
    x = L.layer_norm(params["final_ln"], x, cfg.layer_norm_eps)
    pooled = jnp.tanh(L.dense(params["pooler"], x[:, 0]))
    return {"last_hidden_state": x, "pooler_output": pooled}


def vilt_for_ir_apply(params, cfg: ViltConfig, *args, **kwargs) -> EncoderOutput:
    """DPR-style CLS pooling instead of the ITM-pretrained pooler
    (models/mm.py:512-529)."""
    out = apply(params, cfg, *args, **kwargs)
    return EncoderOutput(pooler_output=out["last_hidden_state"][:, 0])


# --------------------------------------------------------------------------
# multi-passage reader on ViLT
# --------------------------------------------------------------------------
def reader_init(key, cfg: ViltConfig):
    return {
        "vilt": init(key, cfg),
        "qa_outputs": L.dense_init(
            jax.random.fold_in(key, 93), cfg.hidden_size, 2
        ),
    }


def multi_passage_vilt_apply(
    params, cfg: ViltConfig,
    input_ids, pixel_values,
    attention_mask=None,
    start_positions=None, end_positions=None, answer_mask=None,
    m_passages: int = 24,
    compute_dtype=jnp.float32,
) -> ReaderOutput:
    """MultiPassageVilt (models/qa.py:244-492): span extraction over the
    TEXT segment of each (question+passage, image) pair with the global
    multi-passage softmax."""
    from viquae_tpu.train.optim import multi_passage_rc_loss

    out = apply(
        params["vilt"], cfg, input_ids, pixel_values,
        attention_mask=attention_mask, compute_dtype=compute_dtype,
    )
    lt = input_ids.shape[1]
    text_hidden = out["last_hidden_state"][:, :lt]
    logits = L.dense(params["qa_outputs"], text_hidden)
    start_logits, end_logits = logits[..., 0], logits[..., 1]
    loss = start_lp = end_lp = None
    if start_positions is not None:
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
    )


# --------------------------------------------------------------------------
# weight port
# --------------------------------------------------------------------------
def params_from_hf(state_dict, cfg: ViltConfig) -> Dict[str, Any]:
    def get(name):
        t = state_dict[name]
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        )

    def lin(name):
        return {"kernel": get(f"{name}.weight").T, "bias": get(f"{name}.bias")}

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    n_layers = len({
        k.split(".")[2] for k in state_dict if k.startswith("encoder.layer.")
    })
    pos = get("embeddings.position_embeddings")[0]  # (n_patches+1, D)
    if pos.shape[0] != cfg.n_patches + 1:
        # interpolate patch position embeddings to the configured static grid
        side_src = int(np.sqrt(pos.shape[0] - 1))
        side_dst = cfg.image_size // cfg.patch_size
        grid = pos[1:].reshape(side_src, side_src, -1)
        grid = jax.image.resize(
            grid, (side_dst, side_dst, grid.shape[-1]), "bilinear"
        )
        pos = jnp.concatenate([pos[:1], grid.reshape(side_dst * side_dst, -1)])
    return {
        "text": {
            "word": get("embeddings.text_embeddings.word_embeddings.weight"),
            "position": get(
                "embeddings.text_embeddings.position_embeddings.weight"
            ),
            "token_type": get(
                "embeddings.text_embeddings.token_type_embeddings.weight"
            ),
            "ln": ln("embeddings.text_embeddings.LayerNorm"),
        },
        "cls_token": get("embeddings.cls_token")[0, 0],
        "patch_embedding": {
            "kernel": jnp.transpose(
                get("embeddings.patch_embeddings.projection.weight"),
                (2, 3, 1, 0),
            ),
            "bias": get("embeddings.patch_embeddings.projection.bias"),
        },
        "position_embeddings": pos,
        "modality_type": get("embeddings.token_type_embeddings.weight"),
        "blocks": [
            {
                "ln_before": ln(f"encoder.layer.{i}.layernorm_before"),
                "attention": {
                    "q": lin(f"encoder.layer.{i}.attention.attention.query"),
                    "k": lin(f"encoder.layer.{i}.attention.attention.key"),
                    "v": lin(f"encoder.layer.{i}.attention.attention.value"),
                    "o": lin(f"encoder.layer.{i}.attention.output.dense"),
                },
                "ln_after": ln(f"encoder.layer.{i}.layernorm_after"),
                "mlp": {
                    "in": lin(f"encoder.layer.{i}.intermediate.dense"),
                    "out": lin(f"encoder.layer.{i}.output.dense"),
                },
            }
            for i in range(n_layers)
        ],
        "final_ln": ln("layernorm"),
        "pooler": lin("pooler.dense"),
    }
