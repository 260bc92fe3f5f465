"""Shared functional building blocks for all encoders.

Params are nested dicts of jnp arrays. Linear kernels are stored (in, out)
— torch checkpoints transpose on port. Tensor-parallel sharding: each block
exposes a ``*_spec`` companion returning a matching pytree of
PartitionSpecs; attention heads and MLP hidden dims shard over the `model`
mesh axis, so a pjit-ed forward induces the standard Megatron
column/row-parallel collectives over ICI.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from viquae_tpu.core.mesh import MODEL_AXIS


def truncated_normal_init(key, shape, stddev=0.02, dtype=jnp.float32):
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---- dense ----------------------------------------------------------------
def dense_init(key, d_in, d_out, stddev=0.02):
    return {
        "kernel": truncated_normal_init(key, (d_in, d_out), stddev),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def dense(params, x, compute_dtype=None):
    kernel, bias = params["kernel"], params["bias"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32)
    return y + bias


def dense_spec(shard_out: bool = False, shard_in: bool = False):
    return {
        "kernel": P(MODEL_AXIS if shard_in else None,
                    MODEL_AXIS if shard_out else None),
        "bias": P(MODEL_AXIS if shard_out else None),
    }


# ---- layer norm -----------------------------------------------------------
def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params, x, eps=1e-12):
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def layer_norm_spec():
    return {"scale": P(None), "bias": P(None)}


# ---- activations ----------------------------------------------------------
def _gelu_hf(x):
    """HF/torch "gelu" (BertModel, DPR, nn.GELU) is the EXACT erf GELU —
    the tanh approximation drifts up to ~4e-4 at |x|~1.5-3, which
    accumulates over 12 layers on real ported fp32 checkpoints. In bf16
    compute, that 4e-4 is ~20x BELOW the format's ~8e-3 resolution, and
    exact erf upcasts through f32 on the VPU — measured ~8% of a whole
    bert step on the v5e — so bf16 keeps the tanh form (sub-ulp
    identical), fp32 gets the exact erf the parity contract needs."""
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


ACT = {
    "gelu": _gelu_hf,
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": jax.nn.gelu,  # HF's tanh approximation ("gelu_new")
    "relu": jax.nn.relu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "tanh": jnp.tanh,
}


# ---- multi-head attention -------------------------------------------------
def mha_init(key, dim, n_heads, kv_dim=None):
    kq, kk, kv, ko = jax.random.split(key, 4)
    kv_dim = kv_dim or dim
    return {
        "q": dense_init(kq, dim, dim),
        "k": dense_init(kk, kv_dim, dim),
        "v": dense_init(kv, kv_dim, dim),
        "o": dense_init(ko, dim, dim),
    }


def mha_spec():
    return {
        "q": dense_spec(shard_out=True),
        "k": dense_spec(shard_out=True),
        "v": dense_spec(shard_out=True),
        "o": dense_spec(shard_in=True),
    }


def mha(
    params,
    x_q: jnp.ndarray,
    x_kv: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    n_heads: int = 12,
    deterministic: bool = True,
    dropout_rate: float = 0.0,
    rng=None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Standard scaled dot-product MHA.

    x_q: (B, Lq, D); x_kv: (B, Lk, Dkv) (defaults to x_q — self-attention);
    bias: additive attention bias broadcastable to (B, H, Lq, Lk)
    (mask positions hold large negatives).
    """
    if x_kv is None:
        x_kv = x_q
    b, lq, dim = x_q.shape
    head_dim = dim // n_heads
    q = dense(params["q"], x_q, compute_dtype).reshape(b, lq, n_heads, head_dim)
    k = dense(params["k"], x_kv, compute_dtype).reshape(b, -1, n_heads, head_dim)
    v = dense(params["v"], x_kv, compute_dtype).reshape(b, -1, n_heads, head_dim)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(head_dim)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs.astype(compute_dtype or probs.dtype),
        v,
        preferred_element_type=jnp.float32,
    ).reshape(b, lq, dim)
    return dense(params["o"], ctx, compute_dtype)


# ---- MLP ------------------------------------------------------------------
def mlp_init(key, dim, hidden):
    k1, k2 = jax.random.split(key)
    return {"in": dense_init(k1, dim, hidden), "out": dense_init(k2, hidden, dim)}


def mlp_spec():
    return {"in": dense_spec(shard_out=True), "out": dense_spec(shard_in=True)}


def mlp(params, x, act="gelu", compute_dtype=jnp.float32):
    return dense(params["out"], ACT[act](dense(params["in"], x, compute_dtype)),
                 compute_dtype)


# ---- misc -----------------------------------------------------------------
def dropout(x, rate, deterministic, rng):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return x * keep / (1.0 - rate)


def attention_bias_from_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, L) 1/0 mask -> (B, 1, 1, L) additive bias."""
    return ((1.0 - mask.astype(dtype)) * jnp.finfo(dtype).min * 0.5)[
        :, None, None, :
    ]


def attention_bias_from_segments(
    segment_ids: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """(B, L) segment ids (0 = padding) -> (B, 1, L, L) block-diagonal bias.

    Token q may attend to token k iff they carry the same non-zero segment
    id — the packed-batch attention rule (ops/packing.py): independent
    sequences share a row without seeing each other."""
    same = segment_ids[:, :, None] == segment_ids[:, None, :]
    valid = (segment_ids > 0)[:, None, :]
    allowed = jnp.logical_and(same, valid)
    return ((~allowed).astype(dtype) * jnp.finfo(dtype).min * 0.5)[:, None]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
