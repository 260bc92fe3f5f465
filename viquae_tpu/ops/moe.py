"""Mixture-of-Experts FFN with expert parallelism (the `ep` scaling mode).

Beyond-reference: every encoder in the reference is dense bert-base scale
(meerqat/models/mm.py, train/trainee.py) and fits one GPU. This module
provides the TPU-native expert-parallel FFN for scaling encoder capacity
past one chip without scaling per-token FLOPs: expert weights are stacked
on a leading E axis and sharded over the `model` mesh axis, and the
GShard-style dense dispatch/combine einsums let GSPMD insert the
all-to-all traffic over ICI.

TPU/XLA design choices:

- **No ragged gathers.** Token->expert routing is materialized as dense
  one-hot dispatch/combine tensors (T, E, C) and three einsums — static
  shapes, MXU-friendly, and exactly the formulation GSPMD knows how to
  partition (GShard, arXiv:2006.16668). Overflow beyond each expert's
  capacity C drops the token's contribution for that expert (standard
  Switch/GShard semantics).
- **Expert-parallel by sharding, not by code**: `moe_spec()` puts
  P(model) on the stacked-expert axis; the per-expert einsums then run
  expert-local and the dispatch/combine contractions become the a2a.
  A `with_sharding_constraint` seam pins the (E, C, D) expert activations
  to the same layout so XLA cannot re-replicate them.
- **Router in fp32** regardless of compute dtype: softmax over experts is
  tiny and tie-sensitive; bf16 routing flips experts between otherwise
  identical runs.

`moe_apply` returns (y, aux) where aux is the Switch load-balance loss
(E * sum_e f_e * p_e, =1 at perfect balance) to be added to the task loss
with a small weight.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viquae_tpu.core.mesh import MODEL_AXIS
from viquae_tpu.models import layers as L


def moe_init(key, dim: int, hidden: int, n_experts: int, stddev: float = 0.02):
    """Stacked-expert two-layer FFN + router. Leaves lead with E."""
    kr, ki, ko = jax.random.split(key, 3)
    return {
        "router": {
            "kernel": L.truncated_normal_init(kr, (dim, n_experts), stddev),
        },
        "in": {
            "kernel": L.truncated_normal_init(
                ki, (n_experts, dim, hidden), stddev
            ),
            "bias": jnp.zeros((n_experts, hidden), jnp.float32),
        },
        "out": {
            "kernel": L.truncated_normal_init(
                ko, (n_experts, hidden, dim), stddev
            ),
            "bias": jnp.zeros((n_experts, dim), jnp.float32),
        },
    }


def moe_spec():
    """Expert axis over `model` — the ep sharding."""
    return {
        "router": {"kernel": P(None, None)},
        "in": {"kernel": P(MODEL_AXIS), "bias": P(MODEL_AXIS)},
        "out": {"kernel": P(MODEL_AXIS), "bias": P(MODEL_AXIS)},
    }


def moe_apply(
    params,
    x: jnp.ndarray,
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    act: str = "gelu",
    compute_dtype=jnp.float32,
    expert_sharding=None,
):
    """MoE FFN over (..., D) activations.

    Returns (y, aux_loss): y has x's shape; aux_loss is the Switch
    load-balance term. Token gates are the softmax router probs of the
    selected experts, renormalized to sum to 1 over the top_k (Mixtral
    convention), so top_k=1 with n_experts=1 reduces exactly to a dense
    two-layer FFN. `expert_sharding` (optional NamedSharding over the
    (E, C, D) expert batches) pins the ep layout under jit.
    """
    orig_shape = x.shape
    dim = orig_shape[-1]
    tokens = x.reshape(-1, dim)
    t = tokens.shape[0]
    n_experts = params["in"]["kernel"].shape[0]
    top_k = min(top_k, n_experts)
    capacity = max(
        1, math.ceil(capacity_factor * top_k * t / n_experts)
    )

    # router in fp32 (tie-stability)
    logits = jnp.dot(
        tokens.astype(jnp.float32),
        params["router"]["kernel"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)  # (T, E)
    gate_v, gate_i = jax.lax.top_k(probs, top_k)  # (T, k)
    gate_v = gate_v / jnp.maximum(gate_v.sum(-1, keepdims=True), 1e-9)

    # slot-by-slot dispatch with running expert fill counts (k is tiny —
    # static unroll, no scan needed)
    dispatch = jnp.zeros((t, n_experts, capacity), jnp.float32)
    combine = jnp.zeros((t, n_experts, capacity), jnp.float32)
    counts = jnp.zeros((n_experts,), jnp.int32)
    for j in range(top_k):
        oh = jax.nn.one_hot(gate_i[:, j], n_experts, dtype=jnp.int32)
        pos = jnp.cumsum(oh, axis=0) - 1 + counts[None, :]  # (T, E)
        counts = counts + oh.sum(axis=0)
        keep = (pos < capacity) & (oh > 0)
        slot = jax.nn.one_hot(
            jnp.clip(pos, 0, capacity - 1), capacity, dtype=jnp.float32
        )  # (T, E, C)
        d_j = keep.astype(jnp.float32)[..., None] * slot
        dispatch = dispatch + d_j
        combine = combine + gate_v[:, j, None, None] * d_j

    cd = compute_dtype or tokens.dtype
    expert_in = jnp.einsum(
        "tec,td->ecd", dispatch.astype(cd), tokens.astype(cd),
        preferred_element_type=jnp.float32,
    )  # (E, C, D)
    if expert_sharding is not None:
        expert_in = jax.lax.with_sharding_constraint(
            expert_in, expert_sharding
        )
    h = jnp.einsum(
        "ecd,edh->ech", expert_in.astype(cd),
        params["in"]["kernel"].astype(cd),
        preferred_element_type=jnp.float32,
    ) + params["in"]["bias"][:, None, :]
    h = L.ACT[act](h.astype(cd))
    expert_out = jnp.einsum(
        "ech,ehd->ecd", h, params["out"]["kernel"].astype(cd),
        preferred_element_type=jnp.float32,
    ) + params["out"]["bias"][:, None, :]
    if expert_sharding is not None:
        expert_out = jax.lax.with_sharding_constraint(
            expert_out, expert_sharding
        )
    y = jnp.einsum(
        "tec,ecd->td", combine, expert_out.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    # Switch load-balance loss: fraction of tokens whose TOP-1 lands on
    # expert e x mean router prob of e, scaled so perfect balance = 1
    top1 = jax.nn.one_hot(gate_i[:, 0], n_experts, dtype=jnp.float32)
    f = top1.mean(axis=0)
    p = probs.mean(axis=0)
    aux = n_experts * jnp.sum(f * p)
    return y.reshape(orig_shape), aux
