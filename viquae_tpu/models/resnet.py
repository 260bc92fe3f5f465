"""Bottleneck ResNet (torchvision layout) for ImageNet image embeddings.

The reference builds its "imagenet-RN50" embedder by cutting a torchvision
ResNet-50 at the penultimate layer and appending a configurable pool
(meerqat/image/embedding.py:29-38, :68-75): the 2048-d pooled trunk output
is the image embedding (`image_kwargs {"imagenet-RN50": 2048}`,
models/mm.py:20-87). Inference-mode BatchNorm (the reference never trains
image encoders). NHWC layout for TPU; weight port from a torchvision-format
state_dict via :func:`params_from_torchvision`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)   # resnet-50
    width: int = 64
    bn_eps: float = 1e-5
    pool: str = "avg"        # "avg" | "max" | "none" (feature map)


def conv(params, x, stride: int = 1, padding=None, compute_dtype=None):
    """2D conv, NHWC x HWIO, no bias (torchvision convs carry BN bias).

    compute_dtype=jnp.bfloat16 runs the MXU in bf16 with f32 accumulation
    (preferred_element_type) — the TPU-native fast path for inference."""
    kh = params["kernel"].shape[0]
    if padding is None:
        pad = (kh - 1) // 2
        padding = [(pad, pad), (pad, pad)]
    kernel = params["kernel"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def batch_norm(params, x, eps: float):
    """Inference-mode BN with folded running stats."""
    inv = jax.lax.rsqrt(params["var"] + eps)
    return (x - params["mean"]) * inv * params["scale"] + params["bias"]


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return {"kernel": std * jax.random.normal(key, (kh, kw, cin, cout))}


def _bn_init(c):
    return {
        "scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
    }


def _bottleneck_init(key, cin, planes, stride, downsample):
    keys = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(keys[0], 1, 1, cin, planes),
        "bn1": _bn_init(planes),
        "conv2": _conv_init(keys[1], 3, 3, planes, planes),
        "bn2": _bn_init(planes),
        "conv3": _conv_init(keys[2], 1, 1, planes, planes * 4),
        "bn3": _bn_init(planes * 4),
    }
    if downsample:
        p["downsample_conv"] = _conv_init(keys[3], 1, 1, cin, planes * 4)
        p["downsample_bn"] = _bn_init(planes * 4)
    return p


def init(key, cfg: ResNetConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 1 + len(cfg.stage_sizes))
    params: Dict[str, Any] = {
        "conv1": _conv_init(keys[0], 7, 7, 3, cfg.width),
        "bn1": _bn_init(cfg.width),
        "layers": [],
    }
    cin = cfg.width
    for stage, n_blocks in enumerate(cfg.stage_sizes):
        planes = cfg.width * (2 ** stage)
        blocks = []
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            downsample = b == 0 and (stride != 1 or cin != planes * 4)
            blocks.append(
                _bottleneck_init(
                    jax.random.fold_in(keys[1 + stage], b),
                    cin, planes, stride, downsample,
                )
            )
            cin = planes * 4
        params["layers"].append(blocks)
    return params


def _bottleneck_apply(p, x, stride, eps, compute_dtype=None):
    cd = compute_dtype
    out = jax.nn.relu(batch_norm(p["bn1"], conv(p["conv1"], x, compute_dtype=cd), eps))
    out = jax.nn.relu(batch_norm(p["bn2"], conv(p["conv2"], out, stride, compute_dtype=cd), eps))
    out = batch_norm(p["bn3"], conv(p["conv3"], out, compute_dtype=cd), eps)
    if "downsample_conv" in p:
        identity = batch_norm(
            p["downsample_bn"], conv(p["downsample_conv"], x, stride, compute_dtype=cd), eps
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def apply(params, cfg: ResNetConfig, images: jnp.ndarray,
          compute_dtype=None) -> jnp.ndarray:
    """(B, H, W, 3) normalized -> (B, 2048) pooled embedding (or the
    (B, h, w, 2048) feature map with pool='none'). compute_dtype=bfloat16
    runs convs on the MXU in bf16 with f32 accumulation; BN stays f32."""
    x = conv(params["conv1"], images, stride=2, padding=[(3, 3), (3, 3)],
             compute_dtype=compute_dtype)
    x = jax.nn.relu(batch_norm(params["bn1"], x, cfg.bn_eps))
    # torchvision maxpool: kernel 3, stride 2, padding 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    for stage, blocks in enumerate(params["layers"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _bottleneck_apply(block, x, stride, cfg.bn_eps,
                                  compute_dtype=compute_dtype)
    if cfg.pool == "avg":
        return x.mean(axis=(1, 2))
    if cfg.pool == "max":
        return x.max(axis=(1, 2))
    return x


# --------------------------------------------------------------------------
# weight port (torchvision state_dict layout)
# --------------------------------------------------------------------------
def params_from_torchvision(state_dict, cfg: ResNetConfig) -> Dict[str, Any]:
    def get(name):
        t = state_dict[name]
        return jnp.asarray(
            np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        )

    def conv_p(name):
        # torch OIHW -> HWIO
        return {"kernel": jnp.transpose(get(f"{name}.weight"), (2, 3, 1, 0))}

    def bn_p(name):
        return {
            "scale": get(f"{name}.weight"),
            "bias": get(f"{name}.bias"),
            "mean": get(f"{name}.running_mean"),
            "var": get(f"{name}.running_var"),
        }

    params: Dict[str, Any] = {
        "conv1": conv_p("conv1"),
        "bn1": bn_p("bn1"),
        "layers": [],
    }
    for stage, n_blocks in enumerate(cfg.stage_sizes, start=1):
        blocks = []
        for b in range(n_blocks):
            base = f"layer{stage}.{b}"
            p = {
                "conv1": conv_p(f"{base}.conv1"),
                "bn1": bn_p(f"{base}.bn1"),
                "conv2": conv_p(f"{base}.conv2"),
                "bn2": bn_p(f"{base}.bn2"),
                "conv3": conv_p(f"{base}.conv3"),
                "bn3": bn_p(f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = conv_p(f"{base}.downsample.0")
                p["downsample_bn"] = bn_p(f"{base}.downsample.1")
            blocks.append(p)
        params["layers"].append(blocks)
    return params
