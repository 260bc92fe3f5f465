"""ArcFace face embedder (insightface iresnet50, 512-d).

The reference embeds aligned 112x112 face crops with insightface's
`arcface_torch` r50 backbone in fp16 (meerqat/image/face_recognition.py:
16,55-61, checkpoint ms1mv3_arcface_r50_fp16). Here the backbone is a
functional NHWC iresnet: 3x3 stem (stride 1) + BN + PReLU, IBasicBlock
stages [3,4,14,3] (BN-conv-BN-PReLU-conv-BN with 1x1-conv downsample), then
BN -> flatten -> FC(512) -> BatchNorm1d features. bf16-friendly; weights
port from the insightface state_dict via :func:`params_from_insightface`.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.models.resnet import batch_norm, conv


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig:
    stage_sizes: Tuple[int, ...] = (3, 4, 14, 3)   # iresnet50
    width: int = 64
    embedding_size: int = 512
    image_size: int = 112
    bn_eps: float = 1e-5


def prelu(params, x):
    """Per-channel PReLU."""
    alpha = params["alpha"]
    return jnp.where(x >= 0, x, alpha * x)


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    return {
        "kernel": np.sqrt(2.0 / fan_in)
        * jax.random.normal(key, (kh, kw, cin, cout))
    }


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _block_init(key, cin, cout, downsample):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "bn1": _bn_init(cin),
        "conv1": _conv_init(k1, 3, 3, cin, cout),
        "bn2": _bn_init(cout),
        "prelu": {"alpha": 0.25 * jnp.ones((cout,))},
        "conv2": _conv_init(k2, 3, 3, cout, cout),
        "bn3": _bn_init(cout),
    }
    if downsample:
        p["downsample_conv"] = _conv_init(k3, 1, 1, cin, cout)
        p["downsample_bn"] = _bn_init(cout)
    return p


def init(key, cfg: ArcFaceConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, 3 + len(cfg.stage_sizes))
    params: Dict[str, Any] = {
        "conv1": _conv_init(keys[0], 3, 3, 3, cfg.width),
        "bn1": _bn_init(cfg.width),
        "prelu": {"alpha": 0.25 * jnp.ones((cfg.width,))},
        "layers": [],
    }
    cin = cfg.width
    for stage, n_blocks in enumerate(cfg.stage_sizes):
        cout = cfg.width * 2 ** stage
        blocks = []
        for b in range(n_blocks):
            blocks.append(
                _block_init(
                    jax.random.fold_in(keys[1 + stage], b), cin, cout,
                    downsample=(b == 0),
                )
            )
            cin = cout
        params["layers"].append(blocks)
    feat = cin * (cfg.image_size // 16) ** 2
    params["bn2"] = _bn_init(cin)
    params["fc"] = {
        "kernel": 0.01 * jax.random.normal(
            keys[-1], (feat, cfg.embedding_size)
        ),
        "bias": jnp.zeros((cfg.embedding_size,)),
    }
    params["features_bn"] = _bn_init(cfg.embedding_size)
    return params


def _block_apply(p, x, stride, eps, compute_dtype=None):
    cd = compute_dtype
    out = batch_norm(p["bn1"], x, eps)
    out = conv(p["conv1"], out, compute_dtype=cd)
    out = batch_norm(p["bn2"], out, eps)
    out = prelu(p["prelu"], out)
    out = conv(p["conv2"], out, stride=stride, compute_dtype=cd)
    out = batch_norm(p["bn3"], out, eps)
    if "downsample_conv" in p:
        identity = batch_norm(
            p["downsample_bn"],
            conv(p["downsample_conv"], x, stride, compute_dtype=cd), eps
        )
    else:
        identity = x
    return out + identity


def apply(params, cfg: ArcFaceConfig, images: jnp.ndarray,
          compute_dtype=None) -> jnp.ndarray:
    """(B, 112, 112, 3) normalized with mean/std 0.5 -> (B, 512).

    compute_dtype=bfloat16 mirrors the reference checkpoint's fp16
    inference (ms1mv3_arcface_r50_fp16) on the MXU; BN/PReLU stay f32."""
    eps = cfg.bn_eps
    x = prelu(params["prelu"], batch_norm(
        params["bn1"], conv(params["conv1"], images,
                            compute_dtype=compute_dtype), eps))
    for blocks in params["layers"]:
        for b, block in enumerate(blocks):
            x = _block_apply(block, x, stride=2 if b == 0 else 1, eps=eps,
                             compute_dtype=compute_dtype)
    x = batch_norm(params["bn2"], x, eps)
    # torch flattens NCHW: (C, H, W) order — transpose before reshape
    b_sz = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b_sz, -1)
    if compute_dtype is not None:
        x = jnp.dot(x.astype(compute_dtype),
                    params["fc"]["kernel"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        x = x + params["fc"]["bias"]
    else:
        x = x @ params["fc"]["kernel"] + params["fc"]["bias"]
    # features BatchNorm1d (no affine scale in insightface? it has affine)
    fbn = params["features_bn"]
    return (x - fbn["mean"]) * jax.lax.rsqrt(fbn["var"] + eps) * fbn["scale"] + fbn["bias"]


def params_from_insightface(state_dict, cfg: ArcFaceConfig) -> Dict[str, Any]:
    """Port insightface `iresnet50` backbone.pth weights."""
    def get(name):
        t = state_dict[name]
        arr = np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t)
        return jnp.asarray(arr)

    def conv_p(name):
        return {"kernel": jnp.transpose(get(f"{name}.weight"), (2, 3, 1, 0))}

    def bn_p(name):
        return {
            "scale": get(f"{name}.weight"), "bias": get(f"{name}.bias"),
            "mean": get(f"{name}.running_mean"),
            "var": get(f"{name}.running_var"),
        }

    def prelu_p(name):
        return {"alpha": get(f"{name}.weight")}

    params: Dict[str, Any] = {
        "conv1": conv_p("conv1"),
        "bn1": bn_p("bn1"),
        "prelu": prelu_p("prelu"),
        "layers": [],
    }
    for stage, n_blocks in enumerate(cfg.stage_sizes, start=1):
        blocks = []
        for b in range(n_blocks):
            base = f"layer{stage}.{b}"
            p = {
                "bn1": bn_p(f"{base}.bn1"),
                "conv1": conv_p(f"{base}.conv1"),
                "bn2": bn_p(f"{base}.bn2"),
                "prelu": prelu_p(f"{base}.prelu"),
                "conv2": conv_p(f"{base}.conv2"),
                "bn3": bn_p(f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = conv_p(f"{base}.downsample.0")
                p["downsample_bn"] = bn_p(f"{base}.downsample.1")
            blocks.append(p)
        params["layers"].append(blocks)
    params["bn2"] = bn_p("bn2")
    params["fc"] = {"kernel": get("fc.weight").T, "bias": get("fc.bias")}
    params["features_bn"] = bn_p("features")
    return params
