"""CLIP: ViT and ModifiedResNet visual towers + text tower.

The reference consumes CLIP three ways (SURVEY.md §2.2): OpenAI CLIP RN50
`model.visual` for image embeddings (meerqat/image/embedding.py:107-110,
column "clip-RN50", 1024-d), HF CLIP-ViT `get_image_features` (via the
`call` config), and `CLIPForIR` joint mono/cross-modal scoring
(models/mm.py:532-554). Here all towers are functional JAX:

- pre-LN transformer with quick_gelu (shared by text + ViT),
- ViT visual tower (patch conv, CLS token, pre/post LN, projection),
- text tower (causal mask, EOT pooling, projection),
- ModifiedResNet visual tower (3-conv stem with avgpools, avgpool-in-
  bottleneck, attention pooling) for RN50 checkpoints.

Weight ports: :func:`params_from_hf` (HF CLIPModel state_dict) and
:func:`visual_params_from_openai` (OpenAI "visual.*" RN50 layout).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.models import layers as L
from viquae_tpu.models import resnet as R


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    intermediate_size: int = 2048
    max_positions: int = 77
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5


# --------------------------------------------------------------------------
# pre-LN transformer blocks
# --------------------------------------------------------------------------
def _block_init(key, dim, heads, mlp_dim):
    k1, k2 = jax.random.split(key)
    return {
        "ln1": L.layer_norm_init(dim),
        "attn": L.mha_init(k1, dim, heads),
        "ln2": L.layer_norm_init(dim),
        "mlp": L.mlp_init(k2, dim, mlp_dim),
    }


def _block_apply(p, x, heads, eps, bias=None, compute_dtype=jnp.float32):
    h = L.layer_norm(p["ln1"], x, eps)
    x = x + L.mha(p["attn"], h, bias=bias, n_heads=heads,
                  compute_dtype=compute_dtype)
    h = L.layer_norm(p["ln2"], x, eps)
    x = x + L.mlp(p["mlp"], h, act="quick_gelu", compute_dtype=compute_dtype)
    return x


# --------------------------------------------------------------------------
# text tower
# --------------------------------------------------------------------------
def text_init(key, cfg: CLIPTextConfig):
    keys = jax.random.split(key, cfg.num_layers + 2)
    return {
        "token_embedding": 0.02 * jax.random.normal(
            keys[0], (cfg.vocab_size, cfg.hidden_size)
        ),
        "position_embedding": 0.01 * jax.random.normal(
            keys[1], (cfg.max_positions, cfg.hidden_size)
        ),
        "blocks": [
            _block_init(keys[2 + i], cfg.hidden_size, cfg.num_heads,
                        cfg.intermediate_size)
            for i in range(cfg.num_layers)
        ],
        "final_ln": L.layer_norm_init(cfg.hidden_size),
        "projection": {
            "kernel": 0.02 * jax.random.normal(
                jax.random.fold_in(key, 7), (cfg.hidden_size, cfg.projection_dim)
            )
        },
    }


def text_apply(params, cfg: CLIPTextConfig, input_ids: jnp.ndarray,
               attention_mask: Optional[jnp.ndarray] = None,
               compute_dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    b, l = input_ids.shape
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][:l]
    causal = jnp.triu(
        jnp.full((l, l), jnp.finfo(jnp.float32).min * 0.5), k=1
    )[None, None]
    bias = causal
    if attention_mask is not None:
        bias = bias + L.attention_bias_from_mask(attention_mask)
    for p in params["blocks"]:
        x = _block_apply(p, x, cfg.num_heads, cfg.layer_norm_eps, bias,
                         compute_dtype)
    x = L.layer_norm(params["final_ln"], x, cfg.layer_norm_eps)
    # EOT pooling: feature at the first eos token position (HF semantics)
    eos = (input_ids == cfg.eos_token_id)
    eot_pos = jnp.where(
        eos.any(axis=1), jnp.argmax(eos, axis=1), input_ids.argmax(axis=1)
    )
    pooled = x[jnp.arange(b), eot_pos]
    projected = pooled @ params["projection"]["kernel"]
    return {"last_hidden_state": x, "pooler_output": pooled,
            "text_embeds": projected}


# --------------------------------------------------------------------------
# ViT visual tower
# --------------------------------------------------------------------------
def vit_init(key, cfg: CLIPVisionConfig):
    keys = jax.random.split(key, cfg.num_layers + 3)
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "class_embedding": 0.02 * jax.random.normal(keys[0], (cfg.hidden_size,)),
        "patch_embedding": {
            "kernel": 0.02 * jax.random.normal(
                keys[1],
                (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size),
            )
        },
        "position_embedding": 0.01 * jax.random.normal(
            keys[2], (n_patches + 1, cfg.hidden_size)
        ),
        "pre_ln": L.layer_norm_init(cfg.hidden_size),
        "blocks": [
            _block_init(keys[3 + i], cfg.hidden_size, cfg.num_heads,
                        cfg.intermediate_size)
            for i in range(cfg.num_layers)
        ],
        "post_ln": L.layer_norm_init(cfg.hidden_size),
        "projection": {
            "kernel": 0.02 * jax.random.normal(
                jax.random.fold_in(key, 9),
                (cfg.hidden_size, cfg.projection_dim),
            )
        },
    }


def vit_apply(params, cfg: CLIPVisionConfig, images: jnp.ndarray,
              compute_dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """images: (B, H, W, 3) CLIP-normalized."""
    b = images.shape[0]
    patches = jax.lax.conv_general_dilated(
        images.astype(compute_dtype),
        params["patch_embedding"]["kernel"].astype(compute_dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    x = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        params["class_embedding"], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][: x.shape[1]]
    x = L.layer_norm(params["pre_ln"], x, cfg.layer_norm_eps)
    for p in params["blocks"]:
        x = _block_apply(p, x, cfg.num_heads, cfg.layer_norm_eps, None,
                         compute_dtype)
    pooled = L.layer_norm(params["post_ln"], x[:, 0], cfg.layer_norm_eps)
    projected = pooled @ params["projection"]["kernel"]
    return {"last_hidden_state": x, "pooler_output": pooled,
            "image_embeds": projected}


# --------------------------------------------------------------------------
# ModifiedResNet visual tower (OpenAI CLIP RN50)
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    bn_eps: float = 1e-5


def _avgpool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _mrn_bottleneck_apply(p, x, stride, eps, compute_dtype=None):
    cd = compute_dtype
    out = jax.nn.relu(R.batch_norm(p["bn1"], R.conv(p["conv1"], x, compute_dtype=cd), eps))
    out = jax.nn.relu(R.batch_norm(p["bn2"], R.conv(p["conv2"], out, compute_dtype=cd), eps))
    if stride > 1:
        out = _avgpool2(out)
    out = R.batch_norm(p["bn3"], R.conv(p["conv3"], out, compute_dtype=cd), eps)
    if "downsample_conv" in p:
        identity = x
        if stride > 1:
            identity = _avgpool2(identity)
        identity = R.batch_norm(
            p["downsample_bn"],
            R.conv(p["downsample_conv"], identity, compute_dtype=cd), eps
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def modified_resnet_apply(params, cfg: ModifiedResNetConfig,
                          images: jnp.ndarray,
                          compute_dtype=None) -> jnp.ndarray:
    """(B, H, W, 3) CLIP-normalized -> (B, output_dim) via attention pool.

    compute_dtype=bfloat16 runs the conv trunk on the MXU in bf16 with f32
    accumulation; BN and the attention pool stay f32."""
    eps = cfg.bn_eps
    x = images
    for i in (1, 2, 3):
        stride = 2 if i == 1 else 1
        x = jax.nn.relu(
            R.batch_norm(
                params[f"bn{i}"],
                R.conv(params[f"conv{i}"], x, stride,
                       compute_dtype=compute_dtype), eps
            )
        )
    x = _avgpool2(x)
    for stage, blocks in enumerate(params["layers"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _mrn_bottleneck_apply(block, x, stride, eps,
                                      compute_dtype=compute_dtype)
    # attention pooling (visual.attnpool)
    b_sz, h, w, c = x.shape
    tokens = x.reshape(b_sz, h * w, c)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
    tokens = tokens + params["attnpool"]["positional_embedding"][None]
    ap = params["attnpool"]
    q = tokens[:, :1] @ ap["q_proj"]["kernel"] + ap["q_proj"]["bias"]
    k = tokens @ ap["k_proj"]["kernel"] + ap["k_proj"]["bias"]
    v = tokens @ ap["v_proj"]["kernel"] + ap["v_proj"]["bias"]
    heads = cfg.heads
    hd = c // heads
    q = q.reshape(b_sz, 1, heads, hd)
    k = k.reshape(b_sz, -1, heads, hd)
    v = v.reshape(b_sz, -1, heads, hd)
    attn = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd), axis=-1
    )
    pooled = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b_sz, c)
    return pooled @ ap["c_proj"]["kernel"] + ap["c_proj"]["bias"]


# --------------------------------------------------------------------------
# joint wrapper
# --------------------------------------------------------------------------
def l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def clip_scores(text_embeds, image_embeds, logit_scale):
    """(N, D), (M, D) -> (N, M) cosine logits."""
    return logit_scale * (l2norm(text_embeds) @ l2norm(image_embeds).T)


# --------------------------------------------------------------------------
# weight ports
# --------------------------------------------------------------------------
def _to_jnp(t):
    return jnp.asarray(
        np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    )


def params_from_hf(state_dict) -> Dict[str, Any]:
    """Port an HF `CLIPModel` state_dict -> {"text", "vision", "logit_scale"}."""
    def get(name):
        return _to_jnp(state_dict[name])

    def lin(name):
        return {"kernel": get(f"{name}.weight").T, "bias": get(f"{name}.bias")}

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    def block(prefix):
        return {
            "ln1": ln(f"{prefix}.layer_norm1"),
            "attn": {
                "q": lin(f"{prefix}.self_attn.q_proj"),
                "k": lin(f"{prefix}.self_attn.k_proj"),
                "v": lin(f"{prefix}.self_attn.v_proj"),
                "o": lin(f"{prefix}.self_attn.out_proj"),
            },
            "ln2": ln(f"{prefix}.layer_norm2"),
            "mlp": {
                "in": lin(f"{prefix}.mlp.fc1"),
                "out": lin(f"{prefix}.mlp.fc2"),
            },
        }

    n_text = len({
        k.split(".")[3] for k in state_dict
        if k.startswith("text_model.encoder.layers.")
    })
    n_vis = len({
        k.split(".")[3] for k in state_dict
        if k.startswith("vision_model.encoder.layers.")
    })
    text = {
        "token_embedding": get("text_model.embeddings.token_embedding.weight"),
        "position_embedding": get(
            "text_model.embeddings.position_embedding.weight"
        ),
        "blocks": [
            block(f"text_model.encoder.layers.{i}") for i in range(n_text)
        ],
        "final_ln": ln("text_model.final_layer_norm"),
        "projection": {"kernel": get("text_projection.weight").T},
    }
    pre_ln_key = (
        "vision_model.pre_layrnorm"  # HF's historical typo
        if "vision_model.pre_layrnorm.weight" in state_dict
        else "vision_model.pre_layernorm"
    )
    vision = {
        "class_embedding": get("vision_model.embeddings.class_embedding"),
        "patch_embedding": {
            "kernel": jnp.transpose(
                get("vision_model.embeddings.patch_embedding.weight"),
                (2, 3, 1, 0),
            )
        },
        "position_embedding": get(
            "vision_model.embeddings.position_embedding.weight"
        ),
        "pre_ln": ln(pre_ln_key),
        "blocks": [
            block(f"vision_model.encoder.layers.{i}") for i in range(n_vis)
        ],
        "post_ln": ln("vision_model.post_layernorm"),
        "projection": {"kernel": get("visual_projection.weight").T},
    }
    return {
        "text": text,
        "vision": vision,
        "logit_scale": get("logit_scale"),
    }


def visual_params_from_openai(state_dict, cfg: ModifiedResNetConfig
                              ) -> Dict[str, Any]:
    """Port OpenAI CLIP RN50 `visual.*` weights (ModifiedResNet)."""
    def get(name):
        return _to_jnp(state_dict[name])

    def conv_p(name):
        return {"kernel": jnp.transpose(get(f"{name}.weight"), (2, 3, 1, 0))}

    def bn_p(name):
        return {
            "scale": get(f"{name}.weight"), "bias": get(f"{name}.bias"),
            "mean": get(f"{name}.running_mean"),
            "var": get(f"{name}.running_var"),
        }

    params: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = conv_p(f"visual.conv{i}")
        params[f"bn{i}"] = bn_p(f"visual.bn{i}")
    params["layers"] = []
    for stage, n_blocks in enumerate(cfg.stage_sizes, start=1):
        blocks = []
        for b in range(n_blocks):
            base = f"visual.layer{stage}.{b}"
            p = {
                "conv1": conv_p(f"{base}.conv1"), "bn1": bn_p(f"{base}.bn1"),
                "conv2": conv_p(f"{base}.conv2"), "bn2": bn_p(f"{base}.bn2"),
                "conv3": conv_p(f"{base}.conv3"), "bn3": bn_p(f"{base}.bn3"),
            }
            if f"{base}.downsample.1.weight" in state_dict:
                # OpenAI: downsample = [avgpool, conv, bn]
                p["downsample_conv"] = conv_p(f"{base}.downsample.1")
                p["downsample_bn"] = bn_p(f"{base}.downsample.2")
            blocks.append(p)
        params["layers"].append(blocks)
    params["attnpool"] = {
        "positional_embedding": get("visual.attnpool.positional_embedding"),
        "q_proj": {
            "kernel": get("visual.attnpool.q_proj.weight").T,
            "bias": get("visual.attnpool.q_proj.bias"),
        },
        "k_proj": {
            "kernel": get("visual.attnpool.k_proj.weight").T,
            "bias": get("visual.attnpool.k_proj.bias"),
        },
        "v_proj": {
            "kernel": get("visual.attnpool.v_proj.weight").T,
            "bias": get("visual.attnpool.v_proj.bias"),
        },
        "c_proj": {
            "kernel": get("visual.attnpool.c_proj.weight").T,
            "bias": get("visual.attnpool.c_proj.bias"),
        },
    }
    return params


# --------------------------------------------------------------------------
# config-registry tower wrappers (trainee / embedding contract)
# --------------------------------------------------------------------------
from viquae_tpu.core.config import register as _register  # noqa: E402


def _hf_clip_state_dict(path):
    import torch
    from transformers import CLIPModel

    model = CLIPModel.from_pretrained(path, torch_dtype=torch.float32)
    return model.config, model.state_dict()


@_register("CLIPTextTower")
class CLIPTextTower:
    """Registry entry bundling (cfg, params) for the CLIP text tower —
    mirrors get_pretrained('CLIPModel') text usage in the reference's jcm
    recipe (/root/reference/experiments/jcm/config.yaml)."""

    def __init__(self, cfg: Optional[CLIPTextConfig] = None, params=None,
                 seed: int = 0, **cfg_kwargs):
        self.cfg = cfg or CLIPTextConfig(**cfg_kwargs)
        self.params = (params if params is not None
                       else text_init(jax.random.key(seed), self.cfg))

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        hf_cfg, sd = _hf_clip_state_dict(path)
        t = hf_cfg.text_config
        cfg = CLIPTextConfig(
            vocab_size=t.vocab_size, hidden_size=t.hidden_size,
            num_layers=t.num_hidden_layers, num_heads=t.num_attention_heads,
            intermediate_size=t.intermediate_size,
            max_positions=t.max_position_embeddings,
            projection_dim=hf_cfg.projection_dim,
            eos_token_id=t.eos_token_id,
        )
        return cls(cfg=cfg, params=params_from_hf(sd)["text"], **kwargs)

    def __call__(self, input_ids, attention_mask=None, **kw):
        return text_apply(self.params, self.cfg, input_ids, attention_mask)

    def apply_fn(self, params, input_ids, attention_mask=None, **kw):
        return text_apply(params, self.cfg, input_ids, attention_mask)


@_register("CLIPVisionTower")
class CLIPVisionTower:
    """Registry entry for the CLIP ViT visual tower (cfg, params)."""

    def __init__(self, cfg: Optional[CLIPVisionConfig] = None, params=None,
                 seed: int = 0, compute_dtype=None, **cfg_kwargs):
        self.cfg = cfg or CLIPVisionConfig(**cfg_kwargs)
        self.compute_dtype = compute_dtype
        self.params = (params if params is not None
                       else vit_init(jax.random.key(seed), self.cfg))

    @classmethod
    def from_pretrained(cls, path, **kwargs):
        hf_cfg, sd = _hf_clip_state_dict(path)
        v = hf_cfg.vision_config
        cfg = CLIPVisionConfig(
            hidden_size=v.hidden_size, num_layers=v.num_hidden_layers,
            num_heads=v.num_attention_heads,
            intermediate_size=v.intermediate_size, image_size=v.image_size,
            patch_size=v.patch_size, projection_dim=hf_cfg.projection_dim,
        )
        return cls(cfg=cfg, params=params_from_hf(sd)["vision"], **kwargs)

    def __call__(self, pixels, **kw):
        return self.apply_fn(self.params, pixels)

    def apply_fn(self, params, pixels, **kw):
        return vit_apply(
            params, self.cfg, pixels,
            **({"compute_dtype": self.compute_dtype}
               if self.compute_dtype is not None else {}),
        )


def random_openai_rn50_state_dict(cfg: ModifiedResNetConfig, seed: int = 4):
    """Random weights in the EXACT OpenAI CLIP-RN50 `visual.*` layout —
    benchmark/test scaffolding for :func:`visual_params_from_openai`
    (timing-only; real checkpoints load through the same port)."""
    import torch

    torch.manual_seed(seed)
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = torch.rand(c) * 0.5 + 0.75
        sd[f"{name}.bias"] = torch.zeros(c)
        sd[f"{name}.running_mean"] = torch.randn(c) * 0.1
        sd[f"{name}.running_var"] = torch.rand(c) * 0.5 + 0.75

    w = cfg.width
    conv("visual.conv1", 3, w // 2, 3); bn("visual.bn1", w // 2)
    conv("visual.conv2", w // 2, w // 2, 3); bn("visual.bn2", w // 2)
    conv("visual.conv3", w // 2, w, 3); bn("visual.bn3", w)
    cin = w
    for stage, n in enumerate(cfg.stage_sizes):
        planes = w * 2 ** stage
        for b in range(n):
            base = f"visual.layer{stage + 1}.{b}"
            conv(f"{base}.conv1", cin, planes, 1); bn(f"{base}.bn1", planes)
            conv(f"{base}.conv2", planes, planes, 3)
            bn(f"{base}.bn2", planes)
            conv(f"{base}.conv3", planes, planes * 4, 1)
            bn(f"{base}.bn3", planes * 4)
            if b == 0:
                # OpenAI layout: downsample = [avgpool, conv, bn]
                conv(f"{base}.downsample.1", cin, planes * 4, 1)
                bn(f"{base}.downsample.2", planes * 4)
            cin = planes * 4
    # stem(stride 2) + avgpool + one stride-2 per later stage
    spacial = cfg.image_size // (4 * 2 ** (len(cfg.stage_sizes) - 1))
    sd["visual.attnpool.positional_embedding"] = (
        torch.randn(spacial * spacial + 1, cin) * 0.02)
    for proj, out in (("q_proj", cin), ("k_proj", cin), ("v_proj", cin),
                      ("c_proj", cfg.output_dim)):
        sd[f"visual.attnpool.{proj}.weight"] = torch.randn(out, cin) * 0.02
        sd[f"visual.attnpool.{proj}.bias"] = torch.zeros(out)
    return sd
