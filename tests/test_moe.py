"""Expert-parallel MoE FFN (ops/moe.py) — the `ep` scaling mode.

Checks the dense dispatch/combine math against hand-computable cases and
pins expert-parallel sharding parity on the virtual mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.models import layers as L
from viquae_tpu.ops import moe

DIM, HID = 8, 16


def test_single_expert_reduces_to_dense_ffn():
    """n_experts=1, top_k=1 must equal the plain two-layer FFN exactly."""
    params = moe.moe_init(jax.random.key(0), DIM, HID, n_experts=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, DIM)), jnp.float32)
    y, aux = moe.moe_apply(params, x, top_k=1)
    dense = {
        "in": {"kernel": params["in"]["kernel"][0],
               "bias": params["in"]["bias"][0]},
        "out": {"kernel": params["out"]["kernel"][0],
                "bias": params["out"]["bias"][0]},
    }
    ref = L.mlp(dense, x, "gelu")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


def test_routing_follows_router_argmax():
    """With an identity-like router and top_k=1, each token's output must
    come from exactly its argmax expert."""
    n_exp = 4
    params = moe.moe_init(jax.random.key(1), DIM, HID, n_experts=n_exp)
    # router that hard-routes token i to expert i % n_exp
    router = np.zeros((DIM, n_exp), np.float32)
    t = 8
    x = np.zeros((t, DIM), np.float32)
    for i in range(t):
        x[i, i % 4] = 1.0
    router[:4, :] = 50.0 * np.eye(4, dtype=np.float32)
    params = dict(params)
    params["router"] = {"kernel": jnp.asarray(router)}
    y, _ = moe.moe_apply(params, jnp.asarray(x), top_k=1,
                         capacity_factor=4.0)
    # reference: run each token through its selected expert densely
    for i in range(t):
        e = i % 4
        dense = {
            "in": {"kernel": params["in"]["kernel"][e],
                   "bias": params["in"]["bias"][e]},
            "out": {"kernel": params["out"]["kernel"][e],
                    "bias": params["out"]["bias"][e]},
        }
        ref = L.mlp(dense, jnp.asarray(x[i:i + 1]), "gelu")
        np.testing.assert_allclose(np.asarray(y[i:i + 1]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"token {i} -> expert {e}")


def test_capacity_overflow_drops_tokens():
    """All tokens routed to expert 0 with capacity 2: tokens beyond the
    capacity contribute zero output (GShard drop semantics)."""
    n_exp = 2
    params = moe.moe_init(jax.random.key(2), DIM, HID, n_experts=n_exp)
    router = np.zeros((DIM, n_exp), np.float32)
    router[:, 0] = 10.0  # everyone prefers expert 0
    params = dict(params)
    params["router"] = {"kernel": jnp.asarray(router)}
    t = 8
    # positive features: the bias-free router scores 10 * sum(x), so
    # every token must prefer expert 0 only if its feature sum is > 0
    x = np.abs(
        np.random.default_rng(3).standard_normal((t, DIM))
    ).astype(np.float32) + 0.1
    # capacity_factor to get C=2: ceil(cf * 1 * 8 / 2) = 2 -> cf = 0.5
    y, _ = moe.moe_apply(params, jnp.asarray(x), top_k=1,
                         capacity_factor=0.5)
    np.testing.assert_array_equal(
        np.asarray(y[2:]), np.zeros_like(np.asarray(y[2:])))
    assert np.abs(np.asarray(y[:2])).sum() > 0


def test_top2_gates_renormalize():
    """top_k=2 output is the gate-weighted sum of two expert FFNs with
    gates renormalized over the selected pair."""
    n_exp = 3
    params = moe.moe_init(jax.random.key(4), DIM, HID, n_experts=n_exp)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((6, DIM)), jnp.float32)
    y, _ = moe.moe_apply(params, x, top_k=2, capacity_factor=4.0)
    probs = jax.nn.softmax(
        x @ params["router"]["kernel"], axis=-1)
    gv, gi = jax.lax.top_k(probs, 2)
    gv = gv / gv.sum(-1, keepdims=True)
    ref = np.zeros((6, DIM), np.float32)
    for i in range(6):
        for j in range(2):
            e = int(gi[i, j])
            dense = {
                "in": {"kernel": params["in"]["kernel"][e],
                       "bias": params["in"]["bias"][e]},
                "out": {"kernel": params["out"]["kernel"][e],
                        "bias": params["out"]["bias"][e]},
            }
            ref[i] += float(gv[i, j]) * np.asarray(
                L.mlp(dense, x[i:i + 1], "gelu"))[0]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_aux_loss_balance():
    """Uniform routing -> aux == 1; collapsed routing -> aux ~= E."""
    n_exp = 4
    params = moe.moe_init(jax.random.key(6), DIM, HID, n_experts=n_exp)
    params = dict(params)
    params["router"] = {"kernel": jnp.zeros((DIM, n_exp), jnp.float32)}
    # positive features so the bias-free collapsed router (logit =
    # 25 * sum(x) on one expert) actually collapses for every token
    x = jnp.asarray(
        np.abs(np.random.default_rng(7).standard_normal((16, DIM))) + 0.1,
        jnp.float32)
    _, aux_uniform = moe.moe_apply(params, x, top_k=1)
    np.testing.assert_allclose(float(aux_uniform), 1.0, rtol=1e-5)
    collapsed = np.zeros((DIM, n_exp), np.float32)
    collapsed[:, 2] = 25.0
    params["router"] = {"kernel": jnp.asarray(collapsed)}
    _, aux_collapsed = moe.moe_apply(params, x, top_k=1)
    assert float(aux_collapsed) > 3.5  # ~E when fully collapsed


def test_expert_parallel_sharding_parity(devices):
    """Params sharded over `model` (ep) on the virtual mesh: outputs,
    aux loss and gradients must match the unsharded run."""
    n_exp = 8
    params = moe.moe_init(jax.random.key(8), DIM, HID, n_experts=n_exp)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((4, 8, DIM)), jnp.float32)

    def loss(p, x_):
        y, aux = moe.moe_apply(p, x_, top_k=2)
        return jnp.mean(y ** 2) + 0.01 * aux

    ref_loss, ref_grads = jax.value_and_grad(loss)(params, x)

    ctx = meshlib.make_mesh(data=1, model=8)
    with meshlib.use(ctx):
        spec = moe.moe_spec()
        p_sharded = jax.tree_util.tree_map(
            lambda a, s: jax.device_put(a, ctx.sharding(*s)),
            params, spec,
            is_leaf=lambda v: isinstance(v, jax.sharding.PartitionSpec),
        )
        es = ctx.sharding(meshlib.MODEL_AXIS, None, None)

        def loss_ep(p, x_):
            y, aux = moe.moe_apply(p, x_, top_k=2, expert_sharding=es)
            return jnp.mean(y ** 2) + 0.01 * aux

        got_loss, got_grads = jax.jit(jax.value_and_grad(loss_ep))(
            p_sharded, x)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(got_grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_bf16_compute_dtype_runs():
    params = moe.moe_init(jax.random.key(10), DIM, HID, n_experts=4)
    x = jnp.asarray(
        np.random.default_rng(11).standard_normal((4, 4, DIM)), jnp.float32)
    y, aux = moe.moe_apply(params, x, compute_dtype=jnp.bfloat16)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y, np.float32)).all()
    assert np.isfinite(float(aux))
