"""Pipeline parallelism (ops/pipeline.py + bert.encode_pipelined).

The GPipe schedule over the `pipe` mesh axis must be EXACTLY the
sequential encoder: same forward activations, same gradients (the
backward pipeline is jax.grad through ppermute/scan). Verified on the
8-device virtual CPU mesh in dp x pp and pure-pp layouts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.models import bert
from viquae_tpu.ops import pipeline as pl

CFG = bert.BertConfig(
    vocab_size=97, hidden_size=16, num_hidden_layers=4,
    num_attention_heads=2, intermediate_size=32,
    max_position_embeddings=32, add_pooler=False,
)


def _setup(seed=0, b=8, l=12):
    rng = np.random.default_rng(seed)
    params = bert.init(jax.random.key(seed), CFG)
    hidden = rng.standard_normal((b, l, CFG.hidden_size)).astype(np.float32)
    mask = np.ones((b, l), np.int32)
    mask[:, l - 3:] = 0  # ragged tail exercises the bias path
    return params, jnp.asarray(hidden), jnp.asarray(mask)


def test_stack_unstack_roundtrip():
    params, _, _ = _setup()
    staged = pl.stack_stages(params["layers"], 2)
    back = pl.unstack_stages(staged)
    assert len(back) == len(params["layers"])
    for a, b_ in zip(params["layers"], back):
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b_)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stack_rejects_uneven_split():
    params, _, _ = _setup()
    with pytest.raises(ValueError):
        pl.stack_stages(params["layers"], 3)


@pytest.mark.parametrize("data,pipe,n_micro", [(2, 4, 4), (1, 4, 8), (4, 2, 2)])
def test_forward_parity(data, pipe, n_micro):
    params, hidden, mask = _setup()
    ref = bert.encode(params, CFG, hidden, mask)
    ctx = meshlib.make_mesh(
        data=data, pipe=pipe, devices=jax.devices()[: data * pipe]
    )
    staged = bert.pipeline_params(params, pipe)
    with meshlib.use(ctx):
        out = jax.jit(
            lambda p, h, m: bert.encode_pipelined(
                p, CFG, h, m, n_micro=n_micro, mesh_ctx=ctx
            )
        )(staged, hidden, mask)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_gradient_parity():
    params, hidden, mask = _setup()
    tgt = jnp.asarray(
        np.random.default_rng(1).standard_normal(hidden.shape), jnp.float32
    )

    def seq_loss(p, h):
        return jnp.mean((bert.encode(p, CFG, h, mask) - tgt) ** 2)

    ref_loss, (ref_gp, ref_gh) = jax.value_and_grad(
        seq_loss, argnums=(0, 1)
    )(params, hidden)

    ctx = meshlib.make_mesh(data=2, pipe=4)
    staged = bert.pipeline_params(params, 4)

    def pipe_loss(p, h):
        out = bert.encode_pipelined(
            p, CFG, h, mask, n_micro=4, mesh_ctx=ctx
        )
        return jnp.mean((out - tgt) ** 2)

    with meshlib.use(ctx):
        loss, (gp, gh) = jax.jit(
            jax.value_and_grad(pipe_loss, argnums=(0, 1))
        )(staged, hidden)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gh), np.asarray(ref_gh), rtol=2e-5, atol=2e-6
    )
    # staged layer grads -> per-layer list, compare leaf-by-leaf
    back = pl.unstack_stages(gp["layers"])
    for i, (g, r) in enumerate(zip(back, ref_gp["layers"])):
        for x, y in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(r)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=5e-5, atol=1e-6,
                err_msg=f"layer {i}",
            )


def test_gradient_parity_remat():
    params, hidden, mask = _setup()
    ctx = meshlib.make_mesh(data=2, pipe=4)
    staged = bert.pipeline_params(params, 4)

    def loss(p, h, remat):
        out = bert.encode_pipelined(
            p, CFG, h, mask, n_micro=4, mesh_ctx=ctx, remat_layers=remat
        )
        return jnp.mean(out ** 2)

    with meshlib.use(ctx):
        g_plain = jax.jit(jax.grad(lambda p, h: loss(p, h, False)))(
            staged, hidden
        )
        g_remat = jax.jit(jax.grad(lambda p, h: loss(p, h, True)))(
            staged, hidden
        )
    for x, y in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-5, atol=1e-7
        )


def test_packed_segment_parity():
    """segment_ids (packed-canvas) mode pipelines identically."""
    params, hidden, _ = _setup()
    seg = np.zeros((8, 12), np.int32)
    seg[:, :5] = 1
    seg[:, 5:9] = 2  # two packed segments + padding tail
    seg = jnp.asarray(seg)
    ref = bert.encode(params, CFG, hidden, segment_ids=seg)
    ctx = meshlib.make_mesh(data=2, pipe=4)
    staged = bert.pipeline_params(params, 4)
    with meshlib.use(ctx):
        out = jax.jit(
            lambda p, h, s: bert.encode_pipelined(
                p, CFG, h, n_micro=4, mesh_ctx=ctx, segment_ids=s
            )
        )(staged, hidden, seg)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_dropout_runs_and_is_stochastic():
    params, hidden, mask = _setup()
    ctx = meshlib.make_mesh(data=2, pipe=4)
    staged = bert.pipeline_params(params, 4)

    def fwd(key):
        return bert.encode_pipelined(
            staged, CFG, hidden, mask, n_micro=4, mesh_ctx=ctx,
            deterministic=False, rng=key,
        )

    with meshlib.use(ctx):
        a = jax.jit(fwd)(jax.random.key(0))
        b = jax.jit(fwd)(jax.random.key(1))
        a2 = jax.jit(fwd)(jax.random.key(0))
    assert np.isfinite(np.asarray(a)).all()
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))


def test_train_step_with_trainer():
    """A biencoder-style train step where the towers' layer stacks are
    pipelined: Trainer drives it on a dp x pp mesh, loss goes down."""
    from viquae_tpu.train import objectives, optim
    from viquae_tpu.train.trainer import Trainer, TrainerConfig

    ctx = meshlib.make_mesh(data=2, pipe=4)
    params, _, _ = _setup()
    staged = bert.pipeline_params(params, 4)
    spec = bert.pipeline_param_spec(CFG, 4)
    rng = np.random.default_rng(0)
    n, length = 8, 12
    batch = {
        "ids": rng.integers(0, CFG.vocab_size, (n, length)).astype(np.int32),
        "mask": np.ones((n, length), np.int32),
        "labels": np.arange(n, dtype=np.int32),
    }

    def loss_fn(p, b, _rng):
        x = bert.embed(p, CFG, b["ids"])
        h = bert.encode_pipelined(
            p, CFG, x, b["mask"], n_micro=4, mesh_ctx=ctx
        )
        q = h[:, 0]
        return objectives.biencoder_loss(q, q, b["labels"])

    with meshlib.use(ctx):
        tx = optim.make_optimizer(staged, lr=1e-2, total_steps=4)
        trainer = Trainer(
            loss_fn, staged, tx, TrainerConfig(max_steps=3, log_every=1),
            mesh_ctx=ctx, param_spec=spec,
        )
        result = trainer.fit([batch, batch, batch])
    assert result["final_step"] == 3
    losses = [h["loss"] for h in trainer.history if "loss" in h]
    assert losses[-1] < losses[0]
