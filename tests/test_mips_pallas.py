"""Pallas fused MIPS kernel: parity on the CPU interpreter-backed path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viquae_tpu.ops import mips
from viquae_tpu.ops import mips_pallas


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    kb = rng.standard_normal((4096, 64)).astype(np.float32)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    return queries, kb


def test_fused_score_segmax():
    rng = np.random.default_rng(1)
    kb = rng.standard_normal((4096, 64)).astype(np.float32)
    queries = rng.standard_normal((16, 64)).astype(np.float32)
    scores_t, segmax_t = mips_pallas.fused_score_segmax(
        jnp.asarray(queries), jnp.asarray(kb), tile=1024
    )
    ref = queries @ kb.T
    np.testing.assert_allclose(
        np.asarray(scores_t).T, ref, rtol=2e-5, atol=2e-5
    )
    ref_seg = ref.reshape(16, -1, 128).max(axis=2)
    np.testing.assert_allclose(
        np.asarray(segmax_t).T, ref_seg, rtol=2e-5, atol=2e-5
    )


def test_topk_pallas_matches_exact(data):
    queries, kb = data
    scores, idx = mips_pallas.topk_pallas(
        jnp.asarray(queries), jnp.asarray(kb), 20, tile=1024
    )
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_topk_pallas_valid_rows(data):
    queries, kb = data
    padded = np.concatenate(
        [kb, 100 * np.ones((100, kb.shape[1]), np.float32)]
    )
    scores, idx = mips_pallas.topk_pallas(
        jnp.asarray(queries), jnp.asarray(padded), 10,
        valid_rows=jnp.int32(len(kb)), tile=1024,
    )
    assert np.asarray(idx).max() < len(kb)
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 10)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
