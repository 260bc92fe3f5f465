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


# ---------------------------------------------------------------------------
# MoE inside BERT (BertConfig.moe_experts)
# ---------------------------------------------------------------------------
def _moe_cfg(**kw):
    from viquae_tpu.models import bert

    return bert.BertConfig(
        vocab_size=61, hidden_size=16, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False, **kw,
    )


def test_moe_bert_layer_placement_and_aux():
    from viquae_tpu.models import bert

    cfg = _moe_cfg(moe_experts=4, moe_every=2)
    params = bert.init(jax.random.key(0), cfg)
    assert "mlp" in params["layers"][0] and "moe" in params["layers"][1]
    assert "mlp" in params["layers"][2] and "moe" in params["layers"][3]
    spec = bert.param_spec(cfg)
    assert "moe" in spec["layers"][1] and "mlp" in spec["layers"][0]

    ids = np.random.default_rng(0).integers(0, 61, (4, 10)).astype(np.int32)
    out = bert.apply(params, cfg, ids)
    assert out["last_hidden_state"].shape == (4, 10, 16)
    assert np.isfinite(float(out["moe_aux"]))
    assert float(out["moe_aux"]) > 0  # two MoE layers contribute


def test_moe_bert_single_expert_equals_dense():
    """moe_experts=1/top_k=1 BERT == dense BERT with the same weights."""
    from viquae_tpu.models import bert

    cfg_moe = _moe_cfg(moe_experts=1, moe_top_k=1)
    cfg_dense = _moe_cfg()
    p_moe = bert.init(jax.random.key(1), cfg_moe)
    p_dense = jax.tree_util.tree_map(lambda x: x, p_moe)
    p_dense = dict(p_dense)
    p_dense["layers"] = [
        {
            "attention": lp["attention"],
            "attention_ln": lp["attention_ln"],
            "mlp": {
                "in": {"kernel": lp["moe"]["in"]["kernel"][0],
                       "bias": lp["moe"]["in"]["bias"][0]},
                "out": {"kernel": lp["moe"]["out"]["kernel"][0],
                        "bias": lp["moe"]["out"]["bias"][0]},
            },
            "output_ln": lp["output_ln"],
        }
        for lp in p_moe["layers"]
    ]
    ids = np.random.default_rng(2).integers(0, 61, (3, 8)).astype(np.int32)
    out_moe = bert.apply(p_moe, cfg_moe, ids)["last_hidden_state"]
    out_dense = bert.apply(p_dense, cfg_dense, ids)["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(out_moe), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-6)


def test_moe_bert_training_requires_aux():
    from viquae_tpu.models import bert

    cfg = _moe_cfg(moe_experts=2)
    params = bert.init(jax.random.key(3), cfg)
    x = jnp.zeros((2, 6, 16), jnp.float32)
    with pytest.raises(ValueError, match="return_moe_aux"):
        bert.encode(params, cfg, x, deterministic=False,
                    rng=jax.random.key(0))


def test_moe_bert_hf_port_guards():
    from viquae_tpu.models import bert

    cfg = _moe_cfg(moe_experts=2)
    with pytest.raises(ValueError, match="dense"):
        bert.params_from_hf({}, cfg)
    params = bert.init(jax.random.key(4), cfg)
    with pytest.raises(ValueError, match="exportable"):
        bert.params_to_hf_state_dict(params, cfg)


def test_moe_bert_pipelined_guard():
    from viquae_tpu.models import bert

    cfg = _moe_cfg(moe_experts=2)
    params = bert.init(jax.random.key(5), cfg)
    with pytest.raises(NotImplementedError):
        bert.encode_pipelined(params, cfg, jnp.zeros((2, 4, 16)),
                              n_micro=2)


def test_moe_bert_ep_train_step(devices):
    """dp x ep train step: MoE-BERT biencoder with expert weights sharded
    over `model`, aux loss in the objective — loss decreases."""
    from viquae_tpu.models import bert
    from viquae_tpu.train import objectives, optim
    from viquae_tpu.train.trainer import Trainer, TrainerConfig

    cfg = _moe_cfg(moe_experts=4, moe_every=2)
    ctx = meshlib.make_mesh(data=2, model=4)
    params = bert.init(jax.random.key(6), cfg)
    rng = np.random.default_rng(6)
    batch = {
        "ids": rng.integers(0, 61, (8, 10)).astype(np.int32),
        "mask": np.ones((8, 10), np.int32),
        "labels": np.arange(8, dtype=np.int32),
    }

    def loss_fn(p, b, _rng):
        out = bert.apply(p, cfg, b["ids"], b["mask"])
        q = out["last_hidden_state"][:, 0]
        loss, aux = objectives.biencoder_loss(q, q, b["labels"])
        return loss + 0.01 * out["moe_aux"], aux

    with meshlib.use(ctx):
        trainer = Trainer(
            loss_fn, params,
            optim.make_optimizer(params, lr=1e-2, total_steps=4),
            TrainerConfig(max_steps=3, log_every=1),
            mesh_ctx=ctx, param_spec=bert.param_spec(cfg),
        )
        result = trainer.fit([batch, batch, batch])
    assert result["final_step"] == 3
    losses = [h["loss"] for h in trainer.history if "loss" in h]
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# MoE through the trainee harness: the load-balance aux must reach the loss
# on EVERY apply path (padded, packed, multimodal, reader) — silently
# dropping it collapses experts (ops/moe.py docstring)
# ---------------------------------------------------------------------------
def _moe_biencoder(moe_aux_weight, **cfg_kw):
    from viquae_tpu.models import bert, dpr
    from viquae_tpu.train import trainee

    cfg = dpr.DPRConfig(bert=_moe_cfg(
        moe_experts=2, moe_capacity_factor=4.0, **cfg_kw))
    q = dpr.DPREncoder(cfg=cfg, seed=0)
    c = dpr.DPREncoder(cfg=cfg, seed=1)
    return trainee.BiEncoderTrainee(q, c, moe_aux_weight=moe_aux_weight)


def _biencoder_batch(n=4, m=2, l=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "question_inputs": {
            "input_ids": rng.integers(1, 61, (n, l)).astype(np.int32),
            "attention_mask": np.ones((n, l), np.int32),
        },
        "context_inputs": {
            "input_ids": rng.integers(1, 61, (n * m, l)).astype(np.int32),
            "attention_mask": np.ones((n * m, l), np.int32),
        },
        "labels": (np.arange(n) * m).astype(np.int32),
    }


def test_moe_biencoder_trainee_adds_aux_to_loss():
    be = _moe_biencoder(moe_aux_weight=0.05)
    be0 = _moe_biencoder(moe_aux_weight=0.0)
    # identical towers (same seeds) so the task losses match exactly
    batch = _biencoder_batch()
    loss_w, out_w = be.loss_fn(be.params, batch, jax.random.key(0),
                               deterministic=True)
    loss_0, out_0 = be0.loss_fn(be0.params, batch, jax.random.key(0),
                                deterministic=True)
    assert "moe_aux" in out_w and "moe_aux" in out_0
    aux = float(out_w["moe_aux"])
    assert aux > 0.0
    np.testing.assert_allclose(float(loss_w), float(loss_0) + aux, rtol=1e-6)

    # training mode works end-to-end (the encode-level guard is satisfied
    # by the plumbing) and the aux term carries gradients to the router
    def scalar_loss(p):
        l, _ = be.loss_fn(p, batch, jax.random.key(1), deterministic=False)
        return l

    grads = jax.grad(scalar_loss)(be.params)
    router_g = grads["question"]["layers"][0]["moe"]["router"]["kernel"]
    assert float(jnp.abs(router_g).max()) > 0.0


def test_moe_biencoder_dense_outputs_have_no_aux_key():
    from viquae_tpu.models import bert, dpr
    from viquae_tpu.train import trainee

    cfg = dpr.DPRConfig(bert=_moe_cfg())
    be = trainee.BiEncoderTrainee(dpr.DPREncoder(cfg=cfg, seed=0),
                                  dpr.DPREncoder(cfg=cfg, seed=1))
    loss, out = be.loss_fn(be.params, _biencoder_batch(),
                           jax.random.key(0), deterministic=True)
    assert "moe_aux" not in out
    assert np.isfinite(float(loss))


def test_moe_eca_paths_surface_aux():
    """eca_apply carries moe_aux in its output; eca_apply_packed returns
    it via return_aux — and packed == padded embeddings for MoE too."""
    from viquae_tpu.models import bert as bert_lib
    from viquae_tpu.models import mm
    from viquae_tpu.train import data as tdata

    cfg = mm.MMConfig(
        bert=bert_lib.BertConfig(
            vocab_size=100, hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48,
            max_position_embeddings=40, add_pooler=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            moe_experts=2, moe_capacity_factor=8.0,
        ),
        n_faces=2, face_dim=6, bbox_dim=7, image_dims=(("clip", 8),),
    )
    params = mm.eca_init(jax.random.key(3), cfg)
    rng = np.random.default_rng(11)
    b = 5
    lens = rng.integers(3, 14, b)
    ids = np.zeros((b, 16), np.int32)
    mask = np.zeros((b, 16), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1, 90, l)
        mask[i, :l] = 1
    batch = {
        "text_inputs": {"input_ids": ids, "attention_mask": mask},
        "face_inputs": {
            "face": rng.standard_normal((b, 1, 2, 6)).astype(np.float32),
            "bbox": rng.standard_normal((b, 1, 2, 7)).astype(np.float32),
            "attention_mask": (rng.random((b, 1, 2)) < 0.6).astype(np.int32),
        },
        "image_inputs": {"clip": {
            "input": rng.standard_normal((b, 1, 8)).astype(np.float32),
            "attention_mask": (rng.random((b, 1)) < 0.7).astype(np.int32),
        }},
    }
    out = mm.eca_apply(params, cfg, batch["text_inputs"],
                       batch["face_inputs"], batch["image_inputs"],
                       deterministic=True)
    assert out.moe_aux is not None and float(out.moe_aux) > 0.0

    t_vis = tdata.mm_visual_mask(
        batch["face_inputs"], batch["image_inputs"]).shape[1]
    canvas = tdata.pack_mm_text_inputs(batch, 16 + t_vis)
    cls, aux = mm.eca_apply_packed(
        params, cfg,
        jnp.asarray(canvas["canvas_input_ids"]),
        jnp.asarray(canvas["canvas_segment_ids"]),
        jnp.asarray(canvas["canvas_position_ids"]),
        jnp.asarray(canvas["canvas_cls_rows"]),
        jnp.asarray(canvas["canvas_cls_cols"]),
        jnp.asarray(canvas["canvas_vis_rows"]),
        jnp.asarray(canvas["canvas_vis_cols"]),
        batch["face_inputs"], batch["image_inputs"],
        deterministic=True, return_aux=True,
    )
    assert aux is not None and float(aux) > 0.0
    # routing is per-token, so with ample capacity the packed embeddings
    # still match the padded ones (the aux VALUES differ — different pad
    # token sets see the router)
    np.testing.assert_allclose(np.asarray(cls[:b]),
                               np.asarray(out.pooler_output),
                               rtol=2e-5, atol=2e-5)


def test_moe_reader_aux_in_trainee_loss():
    from viquae_tpu.models import qa

    cfg = qa.ReaderConfig(bert=_moe_cfg(
        moe_experts=2, moe_capacity_factor=4.0))
    params = qa.init(jax.random.key(7), cfg)
    rng = np.random.default_rng(7)
    nm, l, a = 4, 10, 2
    out = qa.reader_apply(
        params, cfg,
        rng.integers(1, 61, (nm, l)).astype(np.int32),
        attention_mask=np.ones((nm, l), np.int32),
        start_positions=rng.integers(0, l, (nm, a)).astype(np.int32),
        end_positions=rng.integers(0, l, (nm, a)).astype(np.int32),
        answer_mask=np.ones((nm, a), np.int32),
        m_passages=2, deterministic=True,
    )
    assert out.moe_aux is not None and float(out.moe_aux) > 0.0
    assert np.isfinite(float(out.loss))


def test_grouped_matches_ungrouped_when_capacity_ample():
    """GShard grouping only changes the OVERFLOW rule; with ample
    capacity the grouped output and aux must equal single-group
    dispatch exactly (including a non-divisible T that forces group
    padding)."""
    n_exp = 4
    params = moe.moe_init(jax.random.key(11), DIM, HID, n_experts=n_exp)
    rng = np.random.default_rng(12)
    for t in (32, 37):  # 37: pad tokens must stay inert
        x = jnp.asarray(rng.standard_normal((t, DIM)), jnp.float32)
        y1, aux1 = moe.moe_apply(
            params, x, top_k=2, capacity_factor=8.0, group_size=t + 1)
        yg, auxg = moe.moe_apply(
            params, x, top_k=2, capacity_factor=8.0, group_size=8)
        np.testing.assert_allclose(np.asarray(yg), np.asarray(y1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(auxg), float(aux1),
                                   rtol=1e-6)


def test_grouped_capacity_is_per_group():
    """Every token routes to expert 0; capacity is budgeted PER GROUP,
    so with two groups each group keeps its first C tokens (ungrouped
    dispatch would keep only the first 2*C tokens overall)."""
    n_exp = 2
    params = moe.moe_init(jax.random.key(13), DIM, HID, n_experts=n_exp)
    router = np.zeros((DIM, n_exp), np.float32)
    router[:, 0] = 10.0
    params = dict(params)
    params["router"] = {"kernel": jnp.asarray(router)}
    t, g = 8, 4
    x = np.abs(
        np.random.default_rng(14).standard_normal((t, DIM))
    ).astype(np.float32) + 0.1
    # per-group capacity C = ceil(0.5 * 1 * 4 / 2) = 1
    y, _ = moe.moe_apply(params, jnp.asarray(x), top_k=1,
                         capacity_factor=0.5, group_size=g)
    y = np.asarray(y)
    kept = [i for i in range(t) if np.abs(y[i]).sum() > 0]
    assert kept == [0, 4], kept  # first token of EACH group survives


def test_grouped_expert_sharding_parity():
    """The grouped (G, E, C, D) sharding constraint derived from the
    (E, C, D) ep sharding keeps loss/grad parity on the virtual mesh."""
    n_exp = 8
    params = moe.moe_init(jax.random.key(15), DIM, HID, n_experts=n_exp)
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.standard_normal((4, 8, DIM)), jnp.float32)

    def loss(p, x_):
        y, aux = moe.moe_apply(p, x_, top_k=2, group_size=8)
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
            y, aux = moe.moe_apply(p, x_, top_k=2, group_size=8,
                                   expert_sharding=es)
            return jnp.mean(y ** 2) + 0.01 * aux

        got_loss, got_grads = jax.jit(jax.value_and_grad(loss_ep))(
            p_sharded, x)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(got_grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_token_mask_excludes_padding_from_capacity():
    """Padding tokens must not claim expert-capacity slots: with every
    token routed to expert 0 and capacity 2, the two kept tokens must be
    the first two REAL tokens, not the first two rows."""
    n_exp = 2
    params = moe.moe_init(jax.random.key(17), DIM, HID, n_experts=n_exp)
    router = np.zeros((DIM, n_exp), np.float32)
    router[:, 0] = 10.0
    params = dict(params)
    params["router"] = {"kernel": jnp.asarray(router)}
    t = 8
    x = np.abs(
        np.random.default_rng(18).standard_normal((t, DIM))
    ).astype(np.float32) + 0.1
    mask = jnp.asarray([1, 0, 1, 0, 1, 0, 1, 0])
    # capacity C = ceil(0.5 * 1 * 8 / 2) = 2
    y, aux = moe.moe_apply(params, jnp.asarray(x), top_k=1,
                           capacity_factor=0.5, token_mask=mask)
    y = np.asarray(y)
    kept = [i for i in range(t) if np.abs(y[i]).sum() > 0]
    assert kept == [0, 2], kept  # first two REAL tokens
    # aux over real tokens only: all route to expert 0 -> E * 1 * p0
    assert np.isfinite(float(aux)) and float(aux) > 1.0


def test_bert_moe_padding_is_inert():
    """With MoE layers, a padded batch (attention_mask zeros) must give
    the same real-token outputs as the unpadded batch — pad tokens must
    neither shift routing positions nor consume capacity."""
    from viquae_tpu.models import bert

    # ample capacity so the capacity VALUE change (it scales with the
    # padded length) cannot cause drops in either run
    cfg = _moe_cfg(moe_experts=4, moe_capacity_factor=4.0)
    params = bert.init(jax.random.key(19), cfg)
    rng = np.random.default_rng(20)
    l = 8
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, l)))
    out = bert.apply(params, cfg, ids,
                     attention_mask=jnp.ones((2, l), jnp.int32),
                     deterministic=True)
    ids_pad = jnp.concatenate(
        [ids, jnp.zeros((2, l), ids.dtype)], axis=1)
    mask_pad = jnp.concatenate(
        [jnp.ones((2, l), jnp.int32), jnp.zeros((2, l), jnp.int32)],
        axis=1)
    out_pad = bert.apply(params, cfg, ids_pad, attention_mask=mask_pad,
                         deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_pad["last_hidden_state"])[:, :l],
        np.asarray(out["last_hidden_state"]),
        rtol=1e-5, atol=1e-5,
    )
