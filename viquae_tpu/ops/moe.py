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
  one-hot dispatch/combine tensors (G, T_g, E, C) and three einsums —
  static shapes, MXU-friendly, and exactly the formulation GSPMD knows
  how to partition (GShard, arXiv:2006.16668). Overflow beyond each
  expert's per-group capacity C drops the token's contribution for that
  expert (standard Switch/GShard semantics).
- **Tokens are GROUPED (GShard's G axis)** because the dispatch tensor
  is quadratic in ungrouped token count: C = ceil(cf*k*T/E) makes
  (T, E, C) ~ cf*k*T^2 floats — ~168 GiB at a real train shape of
  512x262 tokens. Splitting T into groups of at most `group_size`
  tokens (capacity budgeted per group) caps it at cf*k*T*group_size
  floats EACH for dispatch and combine: ~1.3 GiB at that shape with
  the 1024 default (halved again under bf16 compute — dispatch/combine
  are built directly in compute_dtype). Group count is a pure function
  of T, so jit programs stay shape-stable; tokens beyond T (group
  padding) are masked out of routing, capacity, and the aux loss.
  Groups are formed over the FLATTENED leading axes (B*L order):
  standard GShard behavior, but note a sequence's overflow drops under
  tight capacity therefore depend on its position in the batch, and
  packed canvases make group composition batch-order dependent.
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


def _grouped_sharding(expert_sharding):
    """(E, C, D) ep sharding -> the (G, E, C, D) grouped equivalent."""
    if expert_sharding is None:
        return None
    spec = P(None, *expert_sharding.spec)
    return jax.sharding.NamedSharding(expert_sharding.mesh, spec)


def moe_apply(
    params,
    x: jnp.ndarray,
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    act: str = "gelu",
    compute_dtype=jnp.float32,
    expert_sharding=None,
    group_size: int = 1024,
    token_mask=None,
):
    """MoE FFN over (..., D) activations.

    Returns (y, aux_loss): y has x's shape; aux_loss is the Switch
    load-balance term. Token gates are the softmax router probs of the
    selected experts, renormalized to sum to 1 over the top_k (Mixtral
    convention), so top_k=1 with n_experts=1 reduces exactly to a dense
    two-layer FFN. `expert_sharding` (optional NamedSharding over the
    (E, C, D) expert batches) pins the ep layout under jit. Tokens are
    processed in GShard groups of at most `group_size` with capacity
    budgeted per group (see module docstring); group count is derived
    from the static token count, so programs stay shape-stable. At
    T <= group_size (one group) the math is identical to ungrouped
    dispatch; across groups only the OVERFLOW rule changes (each group
    drops against its own capacity rather than a global one).

    Capacity semantics under padding: per-group capacity is budgeted from
    the PADDED group length (ceil(cf*k*Tg/E)) — static shapes preclude
    budgeting from the dynamic real-token count, so a heavily padded
    batch gets more effective capacity per REAL token than
    `capacity_factor` nominally implies, and drop behavior under tight
    cf differs between padded and unpadded runs of the same real tokens.
    Size cf against the worst-case (densest) batch.

    `token_mask` (x's leading shape, nonzero = real token) excludes
    padding tokens from routing entirely: without it, sequence/canvas
    pad rows claim expert capacity slots (starving real tokens under
    tight capacity_factor) and dilute the load-balance aux. Masked
    tokens output zeros (the residual stream carries them).
    """
    orig_shape = x.shape
    dim = orig_shape[-1]
    tokens = x.reshape(-1, dim)
    t = tokens.shape[0]
    n_experts = params["in"]["kernel"].shape[0]
    top_k = min(top_k, n_experts)
    n_groups = max(1, math.ceil(t / max(1, group_size)))
    tg = math.ceil(t / n_groups)
    capacity = max(
        1, math.ceil(capacity_factor * top_k * tg / n_experts)
    )
    pad = n_groups * tg - t
    # group-padding tokens are masked out of routing/capacity/aux below
    valid = jnp.arange(n_groups * tg) < t  # (G*Tg,)
    if token_mask is not None:
        tm = token_mask.reshape(-1).astype(bool)
        if pad:
            tm = jnp.concatenate([tm, jnp.zeros((pad,), bool)])
        valid = valid & tm
    if pad:
        tokens = jnp.concatenate(
            [tokens, jnp.zeros((pad, dim), tokens.dtype)]
        )

    # router in fp32 (tie-stability)
    logits = jnp.dot(
        tokens.astype(jnp.float32),
        params["router"]["kernel"].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)  # (G*Tg, E)
    gate_v, gate_i = jax.lax.top_k(probs, top_k)  # (G*Tg, k)
    gate_v = gate_v / jnp.maximum(gate_v.sum(-1, keepdims=True), 1e-9)

    grouped = tokens.reshape(n_groups, tg, dim)
    gate_vg = gate_v.reshape(n_groups, tg, top_k)
    gate_ig = gate_i.reshape(n_groups, tg, top_k)
    valid_g = valid.reshape(n_groups, tg)

    # slot-by-slot dispatch with running per-(group, expert) fill counts
    # (k is tiny — static unroll, no scan needed). dispatch/combine are the
    # LARGEST tensors of the layer (~1.3 GiB each at packed train shapes):
    # built directly in compute_dtype — dispatch entries are disjoint 0/1
    # (exact in bf16); combine only rounds the gate values to bf16, which
    # a bf16 training step rounds anyway at the next matmul
    cd = compute_dtype or tokens.dtype
    dispatch = jnp.zeros((n_groups, tg, n_experts, capacity), cd)
    combine = jnp.zeros((n_groups, tg, n_experts, capacity), cd)
    counts = jnp.zeros((n_groups, n_experts), jnp.int32)
    for j in range(top_k):
        oh = jax.nn.one_hot(gate_ig[..., j], n_experts, dtype=jnp.int32)
        oh = oh * valid_g[..., None]  # pad tokens never claim slots
        pos = jnp.cumsum(oh, axis=1) - 1 + counts[:, None, :]  # (G, Tg, E)
        counts = counts + oh.sum(axis=1)
        keep = (pos < capacity) & (oh > 0)
        slot = jax.nn.one_hot(
            jnp.clip(pos, 0, capacity - 1), capacity, dtype=cd
        )  # (G, Tg, E, C)
        d_j = keep.astype(cd)[..., None] * slot
        dispatch = dispatch + d_j
        combine = combine + gate_vg[..., j, None, None].astype(cd) * d_j

    es = _grouped_sharding(expert_sharding)
    expert_in = jnp.einsum(
        "gtec,gtd->gecd", dispatch, grouped.astype(cd),
        preferred_element_type=jnp.float32,
    )  # (G, E, C, D)
    if es is not None:
        expert_in = jax.lax.with_sharding_constraint(expert_in, es)
    # fold G into the per-expert row batch: (E, G*C, D) keeps the expert
    # matmuls in the plain batched-dot pattern (one big MXU matmul per
    # expert; the 4D "gecd,edh" form also hits an unsupported eager
    # bf16 DotThunk on the CPU backend)
    ei = expert_in.astype(cd).transpose(1, 0, 2, 3).reshape(
        n_experts, n_groups * capacity, dim
    )
    h = jnp.einsum(
        "ecd,edh->ech", ei, params["in"]["kernel"].astype(cd),
        preferred_element_type=jnp.float32,
    ) + params["in"]["bias"][:, None, :]
    h = L.ACT[act](h.astype(cd))
    eo = jnp.einsum(
        "ech,ehd->ecd", h, params["out"]["kernel"].astype(cd),
        preferred_element_type=jnp.float32,
    ) + params["out"]["bias"][:, None, :]
    expert_out = eo.reshape(
        n_experts, n_groups, capacity, dim
    ).transpose(1, 0, 2, 3)
    if es is not None:
        expert_out = jax.lax.with_sharding_constraint(expert_out, es)
    y = jnp.einsum(
        "gtec,gecd->gtd", combine, expert_out.astype(cd),
        preferred_element_type=jnp.float32,
    ).reshape(n_groups * tg, dim)
    if pad:
        y = y[:t]

    # Switch load-balance loss: fraction of (real) tokens whose TOP-1
    # lands on expert e x mean router prob of e, scaled so perfect
    # balance = 1
    top1 = jax.nn.one_hot(gate_i[:, 0], n_experts, dtype=jnp.float32)
    vf = valid.astype(jnp.float32)[:, None]
    denom = jnp.maximum(vf.sum(), 1.0)
    f = (top1 * vf).sum(axis=0) / denom
    p = (probs * vf).sum(axis=0) / denom
    aux = n_experts * jnp.sum(f * p)
    return y.reshape(orig_shape), aux
