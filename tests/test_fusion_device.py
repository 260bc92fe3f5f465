"""Device late fusion (ops.fusion.fuse_topk) parity vs the host pipeline
default_minimum -> normalize_run -> fuse(wsum) (rankeval.fusion — itself
parity-tested against meerqat/ir/fuse.py semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from viquae_tpu.ops.fusion import fuse_topk
from viquae_tpu.rankeval import Run, default_minimum, fuse, normalize_run

INT_MAX = np.iinfo(np.int32).max


def _make_runs(seed=0, n_q=9, ks=(7, 5, 6), n_docs=50):
    rng = np.random.default_rng(seed)
    scores_list, idx_list = [], []
    for k in ks:
        ids = np.stack([
            rng.choice(n_docs, size=k, replace=False) for _ in range(n_q)
        ]).astype(np.int32)
        scores = rng.normal(size=(n_q, k)).astype(np.float32) * 3 + 1
        # sort descending like a real top-k result
        order = np.argsort(-scores, axis=1)
        scores = np.take_along_axis(scores, order, axis=1)
        ids = np.take_along_axis(ids, order, axis=1)
        scores_list.append(scores)
        idx_list.append(ids)
    return scores_list, idx_list


def _to_runs(scores_list, idx_list):
    runs = []
    for r, (scores, ids) in enumerate(zip(scores_list, idx_list)):
        data = {}
        for q in range(scores.shape[0]):
            data[str(q)] = {
                str(int(d)): float(s)
                for d, s in zip(ids[q], scores[q]) if d != INT_MAX
            }
        runs.append(Run(data, name=f"run{r}"))
    return runs


def _host_fuse(scores_list, idx_list, weights, norm):
    """The reference's Fusion(defmin=True) order: impute THEN normalize."""
    runs = default_minimum(_to_runs(scores_list, idx_list))
    normed = [normalize_run(r, norm) for r in runs]
    return fuse(normed, norm=None, method="wsum",
                params={"weights": list(weights)})


@pytest.mark.parametrize("norm", ["gzmuv", "zmuv", "min-max", None])
@pytest.mark.parametrize("seed", [0, 7, 21])
def test_fuse_topk_matches_host_pipeline(norm, seed):
    scores_list, idx_list = _make_runs(seed=seed)
    weights = (0.5, 0.3, 0.2)
    k = 10
    top, top_idx = fuse_topk(
        tuple(jnp.asarray(s) for s in scores_list),
        tuple(jnp.asarray(i) for i in idx_list),
        weights, k, norm=norm,
    )
    top, top_idx = np.asarray(top), np.asarray(top_idx)

    host = _host_fuse(scores_list, idx_list, weights, norm)
    for q in range(scores_list[0].shape[0]):
        items = sorted(host[str(q)].items(), key=lambda kv: (-kv[1], int(kv[0])))
        ref_ids = [int(d) for d, _ in items[:k]]
        ref_scores = [s for _, s in items[:k]]
        np.testing.assert_array_equal(top_idx[q][: len(ref_ids)], ref_ids)
        np.testing.assert_allclose(
            top[q][: len(ref_scores)], ref_scores, rtol=2e-4, atol=2e-4
        )


def test_fuse_topk_padded_entries_ignored():
    scores_list, idx_list = _make_runs(seed=3)
    # pad the second index's last two lanes (k exceeded its rows)
    idx_list[1][:, -2:] = INT_MAX
    scores_list[1][:, -2:] = -np.inf
    weights = (0.4, 0.4, 0.2)
    top, top_idx = fuse_topk(
        tuple(jnp.asarray(s) for s in scores_list),
        tuple(jnp.asarray(i) for i in idx_list),
        weights, 8, norm="gzmuv",
    )
    top, top_idx = np.asarray(top), np.asarray(top_idx)
    assert (top_idx != INT_MAX).all() and np.isfinite(top).all()

    host = _host_fuse(scores_list, idx_list, weights, "gzmuv")
    for q in range(scores_list[0].shape[0]):
        items = sorted(host[str(q)].items(), key=lambda kv: (-kv[1], int(kv[0])))
        np.testing.assert_array_equal(
            top_idx[q][:8], [int(d) for d, _ in items[:8]]
        )


def test_fuse_topk_k_exceeds_union():
    scores_list, idx_list = _make_runs(seed=5, n_q=4, ks=(3, 3), n_docs=8)
    top, top_idx = fuse_topk(
        tuple(jnp.asarray(s) for s in scores_list),
        tuple(jnp.asarray(i) for i in idx_list),
        (0.6, 0.4), 20, norm="zmuv",
    )
    top, top_idx = np.asarray(top), np.asarray(top_idx)
    assert top.shape == (4, 20)
    # real docs first, then -inf / int-max padding
    for q in range(4):
        n_real = len(set(idx_list[0][q]) | set(idx_list[1][q]))
        assert np.isfinite(top[q][:n_real]).all()
        assert (top_idx[q][n_real:] == INT_MAX).all()
        assert np.all(top[q][n_real:] == -np.inf)


def test_fuse_topk_single_index_is_rerank_identity():
    """One index, no normalization: fusion must reproduce the input ranking
    (scores scaled by the weight)."""
    scores = np.sort(np.random.default_rng(1).normal(size=(5, 9)),
                     axis=1)[:, ::-1].astype(np.float32)
    ids = np.argsort(np.random.default_rng(2).normal(size=(5, 9)),
                     axis=1).astype(np.int32) + 100
    top, top_idx = fuse_topk(
        (jnp.asarray(scores),), (jnp.asarray(ids),), (2.0,), 9, norm=None,
    )
    # (s - m) + m != s exactly in f32; allow roundoff
    np.testing.assert_allclose(np.asarray(top), 2.0 * scores,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(top_idx), ids)
