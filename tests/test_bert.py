"""Numerical parity of the functional BERT/DPR stack vs torch (cpu)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.models import bert, dpr
from viquae_tpu.models import layers as L

TINY = dict(
    vocab_size=99,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=2,
)


@pytest.fixture(scope="module")
def hf_tiny():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(**TINY)
    model = BertModel(hf_cfg).eval()
    return hf_cfg, model


def test_forward_matches_hf(hf_tiny):
    import torch

    hf_cfg, model = hf_tiny
    cfg = bert.BertConfig.from_hf(hf_cfg)
    params = bert.params_from_hf(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY["vocab_size"], (3, 10))
    mask = np.ones((3, 10), np.int64)
    mask[1, 7:] = 0
    tt = rng.integers(0, 2, (3, 10))

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            token_type_ids=torch.tensor(tt),
        )
    out = bert.apply(
        params, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(tt)
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]),
        ref.pooler_output.numpy(),
        atol=2e-5, rtol=1e-4,
    )


def test_mask_effect(hf_tiny):
    hf_cfg, model = hf_tiny
    cfg = bert.BertConfig.from_hf(hf_cfg)
    params = bert.params_from_hf(model.state_dict(), cfg)
    ids = np.full((1, 8), 5)
    m1 = np.array([[1, 1, 1, 1, 0, 0, 0, 0]])
    out1 = bert.apply(params, cfg, jnp.asarray(ids), jnp.asarray(m1))
    ids2 = ids.copy()
    ids2[0, 4:] = 7  # change only masked positions
    out2 = bert.apply(params, cfg, jnp.asarray(ids2), jnp.asarray(m1))
    np.testing.assert_allclose(
        np.asarray(out1["last_hidden_state"][0, :4]),
        np.asarray(out2["last_hidden_state"][0, :4]),
        atol=1e-5,
    )


def test_dpr_cls_embedding(hf_tiny):
    hf_cfg, model = hf_tiny
    cfg = dpr.DPRConfig(bert=bert.BertConfig.from_hf(hf_cfg, add_pooler=False))
    params = bert.params_from_hf(model.state_dict(), cfg.bert)
    ids = np.array([[1, 2, 3, 4]])
    out = dpr.apply(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]),
        np.asarray(out["last_hidden_state"][:, 0]),
    )
    assert out["pooler_output"].shape == (1, TINY["hidden_size"])


def test_init_and_spec_tree_match():
    cfg = bert.BertConfig(**TINY)
    params = bert.init(jax.random.key(0), cfg)
    spec = bert.param_spec(cfg)
    pt = jax.tree_util.tree_structure(params)
    st = jax.tree_util.tree_structure(spec, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
    assert pt == st
    assert L.count_params(params) > 0


def test_tensor_parallel_forward(devices):
    """TP-sharded forward on a 2-way model axis matches replicated."""
    from viquae_tpu.core import mesh as meshlib

    cfg = bert.BertConfig(**TINY, add_pooler=False)
    params = bert.init(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 99, (4, 8)))
    ref = bert.apply(params, cfg, ids)["last_hidden_state"]

    ctx = meshlib.make_mesh(data=4, model=2, kb=1)
    spec = bert.param_spec(cfg)
    sharded_params = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, ctx.sharding(*s)),
        params, spec,
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )
    with meshlib.use(ctx):
        out = jax.jit(
            lambda p, i: bert.apply(p, cfg, i)["last_hidden_state"]
        )(sharded_params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_hf_export_roundtrip(tmp_path):
    """params -> HF dir -> torch BertModel matches our forward."""
    import torch
    from transformers import BertModel

    cfg = bert.BertConfig(**TINY)
    params = bert.init(jax.random.key(3), cfg)
    out_dir = bert.save_pretrained_hf(params, cfg, tmp_path / "hf")
    model = BertModel.from_pretrained(str(out_dir)).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY["vocab_size"], (2, 7))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    ours = np.asarray(
        bert.apply(params, cfg, jnp.asarray(ids))["last_hidden_state"]
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-3)


def test_sequence_sharding_seam(devices):
    """activation_sharding (the SP seam): per-layer activations constrained
    to a (batch, seq) sharding produce the same outputs as unsharded."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.models import bert

    cfg = bert.BertConfig(
        vocab_size=60, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, add_pooler=False,
    )
    params = bert.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 60, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)

    ref = bert.apply(params, cfg, ids, mask)["last_hidden_state"]
    ctx = meshlib.make_mesh(data=2, model=4, kb=1)
    with meshlib.use(ctx):
        sharding = NamedSharding(ctx.mesh, P("data", "model", None))

        @jax.jit
        def fwd(params, ids, mask):
            return bert.apply(
                params, cfg, ids, mask, activation_sharding=sharding
            )["last_hidden_state"]

        out = fwd(params, ids, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_remat_layers_gradient_equality():
    """Per-layer gradient checkpointing must not change values or grads."""
    from viquae_tpu.models import bert as bert_lib

    cfg = bert_lib.BertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = bert_lib.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 50, (4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.int32)

    def loss(params, remat):
        out = bert_lib.apply(params, cfg, ids, mask, deterministic=True,
                             remat_layers=remat)
        return jnp.sum(out["last_hidden_state"] ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
