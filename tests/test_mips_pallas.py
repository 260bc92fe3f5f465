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


def test_topk_pallas_unaligned_default_masks_padding(devices):
    """valid_rows=None must mask the INTERNAL tile padding: with negative
    true scores, zero pad rows would otherwise win (round-3 review)."""
    from viquae_tpu.ops import mips_pallas

    rng = np.random.default_rng(0)
    kb = -np.abs(rng.standard_normal((1500, 32))).astype(np.float32)
    q = np.abs(rng.standard_normal((8, 32))).astype(np.float32)
    # all true scores are NEGATIVE; pad rows score exactly 0.0
    s, i = mips_pallas.topk_pallas(jnp.asarray(q), jnp.asarray(kb), 10)
    i = np.asarray(i)
    assert i.max() < 1500, i.max()
    _, ref = mips.exact_topk_numpy(q, kb, 10)
    overlap = np.mean([len(set(i[r]) & set(ref[r])) / 10 for r in range(8)])
    assert overlap > 0.95, overlap


def test_topk_pallas_k_exceeds_n_pads(devices):
    """k > N returns (Q, k) padded with NEG_INF / int32-max instead of
    crashing in lax.top_k (the topk_single contract)."""
    from viquae_tpu.ops import mips_pallas

    rng = np.random.default_rng(1)
    kb = rng.standard_normal((100, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    s, i = mips_pallas.topk_pallas(jnp.asarray(q), jnp.asarray(kb), 300)
    assert s.shape == (4, 300) and i.shape == (4, 300)
    i = np.asarray(i)
    pad_id = np.iinfo(np.int32).max
    assert (i[:, :100] < 100).all()
    assert (i[:, 100:] == pad_id).all()


def test_topk_pallas_any_query_count(devices):
    """Query counts that don't divide the kernel's q_block must work
    (queries pad internally; outputs slice back)."""
    from viquae_tpu.ops import mips_pallas

    rng = np.random.default_rng(2)
    kb = rng.standard_normal((2048, 16)).astype(np.float32)
    for q_count in (1, 7, 641, 700):
        q = rng.standard_normal((q_count, 16)).astype(np.float32)
        s, i = mips_pallas.topk_pallas(jnp.asarray(q), jnp.asarray(kb), 5)
        assert s.shape == (q_count, 5), q_count
        _, ref = mips.exact_topk_numpy(q, kb, 5)
        overlap = np.mean([
            len(set(np.asarray(i)[r]) & set(ref[r])) / 5
            for r in range(q_count)
        ])
        assert overlap > 0.95, (q_count, overlap)


def test_topk_pallas_partial_boundary_segment(devices):
    """Round-3 review (confirmed wrong results): valid_rows cutting
    mid-segment with HIGH-scoring invalid rows inflated that segment's
    max, displacing a fully-valid segment that held a true top-k element.
    The boundary segment's max is now recomputed over valid rows only."""
    rng = np.random.default_rng(0)
    n, d, nv = 4096, 16, 4032  # nv cuts segment 31 in half
    kb = rng.standard_normal((n, d)).astype(np.float32)
    kb[nv:] *= 100.0  # invalid rows dominate every segment max
    q = rng.standard_normal((8, d)).astype(np.float32)
    s, i = mips_pallas.topk_pallas(
        jnp.asarray(q), jnp.asarray(kb), 10, valid_rows=jnp.int32(nv))
    es, ei = mips.exact_topk_numpy(q, kb[:nv], 10)
    np.testing.assert_array_equal(np.asarray(i), ei)
    np.testing.assert_allclose(np.asarray(s), es, rtol=2e-2, atol=2e-2)
