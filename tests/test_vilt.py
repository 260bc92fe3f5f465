"""ViLT parity vs HF ViltModel + reader head."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.models import vilt

TINY = vilt.ViltConfig(
    vocab_size=60, hidden_size=24, num_layers=2, num_heads=2,
    intermediate_size=48, max_positions=32, image_size=48, patch_size=16,
)


@pytest.fixture(scope="module")
def hf_vilt():
    import torch
    from transformers import ViltConfig as HFViltConfig, ViltModel

    torch.manual_seed(0)
    cfg = HFViltConfig(
        vocab_size=60, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=32, image_size=48, patch_size=16,
        modality_type_vocab_size=2, hidden_act="gelu",
    )
    return ViltModel(cfg).eval()


def test_vilt_matches_hf(hf_vilt):
    import torch

    params = vilt.params_from_hf(hf_vilt.state_dict(), TINY)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, (2, 6))
    pix = rng.standard_normal((2, 48, 48, 3)).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    with torch.no_grad():
        ref = hf_vilt(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pix.transpose(0, 3, 1, 2)),
        )
    out = vilt.apply(
        params, TINY, jnp.asarray(ids), jnp.asarray(pix),
        attention_mask=jnp.asarray(mask),
    )
    lt = ids.shape[1]
    # HF's visual_embed RANDOMLY PERMUTES patches (torch.multinomial) even at
    # full resolution; our static grid is deterministic. Attention is
    # permutation-equivariant, so: text tokens + pooler match exactly, image
    # tokens match as a (sorted) set.
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"][:, :lt]),
        ref.last_hidden_state.numpy()[:, :lt], atol=5e-5, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]),
        ref.pooler_output.numpy(), atol=5e-5, rtol=1e-3,
    )
    ours_img = np.sort(np.asarray(out["last_hidden_state"][:, lt:]), axis=1)
    ref_img = np.sort(ref.last_hidden_state.numpy()[:, lt:], axis=1)
    np.testing.assert_allclose(ours_img, ref_img, atol=5e-5, rtol=1e-3)


def test_vilt_for_ir_cls_pooling(hf_vilt):
    params = vilt.params_from_hf(hf_vilt.state_dict(), TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 60, (1, 4)))
    pix = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 48, 48, 3)).astype(np.float32)
    )
    out = vilt.vilt_for_ir_apply(params, TINY, ids, pix)
    full = vilt.apply(params, TINY, ids, pix)
    np.testing.assert_array_equal(
        np.asarray(out.pooler_output),
        np.asarray(full["last_hidden_state"][:, 0]),
    )


def test_position_interpolation(hf_vilt):
    # port to a LARGER static grid than the checkpoint's
    big = vilt.ViltConfig(
        vocab_size=60, hidden_size=24, num_layers=2, num_heads=2,
        intermediate_size=48, max_positions=32, image_size=96, patch_size=16,
    )
    params = vilt.params_from_hf(hf_vilt.state_dict(), big)
    assert params["position_embeddings"].shape == (big.n_patches + 1, 24)


def test_multi_passage_vilt_reader():
    params = vilt.reader_init(jax.random.key(0), TINY)
    n, m, L, A = 2, 2, 8, 2
    rng = np.random.default_rng(0)
    out = vilt.multi_passage_vilt_apply(
        params, TINY,
        jnp.asarray(rng.integers(0, 60, (n * m, L))),
        jnp.asarray(rng.standard_normal((n * m, 48, 48, 3)).astype(np.float32)),
        start_positions=jnp.asarray(rng.integers(0, L, (n, m, A))),
        end_positions=jnp.asarray(rng.integers(0, L, (n, m, A))),
        answer_mask=jnp.ones((n, m, A), jnp.int32),
        m_passages=m,
    )
    assert out.start_logits.shape == (n * m, L)
    assert np.isfinite(float(out.loss))


def test_multi_image():
    params = vilt.init(jax.random.key(0), TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 60, (2, 4)))
    pix = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3, 48, 48, 3)).astype(np.float32))
    pixel_mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.int32)
    out = vilt.apply(params, TINY, ids, pix, pixel_mask=pixel_mask)
    # 4 text + 3 images x (9+1) tokens
    assert out["last_hidden_state"].shape == (2, 4 + 3 * 10, 24)
    # masked image content must not affect output
    pix2 = pix.at[0, 2].add(100.0)
    out2 = vilt.apply(params, TINY, ids, pix2, pixel_mask=pixel_mask)
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"][0]),
        np.asarray(out2["pooler_output"][0]), atol=1e-5,
    )
