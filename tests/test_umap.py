"""From-scratch UMAP: calibration invariants + cluster-structure recovery."""
import numpy as np
import pytest

from viquae_tpu.viz import umap


def make_clusters(seed=0, n_per=40, d=32, n_clusters=3, sep=8.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * sep
    x, labels = [], []
    for c in range(n_clusters):
        x.append(centers[c] + rng.normal(size=(n_per, d)))
        labels += [c] * n_per
    return np.concatenate(x), np.asarray(labels)


def test_smooth_knn_calibration():
    rng = np.random.default_rng(0)
    dists = np.sort(rng.uniform(0.1, 2.0, (50, 15)), axis=1)
    rho, sigma = umap.smooth_knn(dists)
    np.testing.assert_array_equal(rho, dists[:, 0])
    psum = np.exp(-np.maximum(dists - rho[:, None], 0) / sigma[:, None]).sum(1)
    np.testing.assert_allclose(psum, np.log2(15), rtol=1e-3)


def test_fuzzy_graph_symmetric_and_local():
    x, labels = make_clusters(n_per=20)
    heads, tails, w = umap.fuzzy_graph(x, n_neighbors=10, metric="euclidean")
    assert np.all(w > 0) and np.all(w <= 1.0 + 1e-9)
    # overwhelmingly intra-cluster edges for well-separated clusters
    intra = np.mean(labels[heads] == labels[tails])
    assert intra > 0.95, intra


def test_find_ab_params():
    a, b = umap.find_ab_params(0.1)
    # umap-learn's canonical values for min_dist=0.1, spread=1.0
    assert a == pytest.approx(1.577, rel=0.05)
    assert b == pytest.approx(0.895, rel=0.05)


def test_umap_recovers_clusters():
    x, labels = make_clusters()
    y = umap.umap_embed(x, n_neighbors=10, n_epochs=100, metric="euclidean",
                        seed=1)
    assert y.shape == (len(x), 2)
    assert np.all(np.isfinite(y))
    # 1-NN purity in the embedding: each point's nearest neighbor shares
    # its cluster label
    d = ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nn = d.argmin(1)
    purity = np.mean(labels[nn] == labels)
    assert purity > 0.9, purity
    # deterministic
    y2 = umap.umap_embed(x, n_neighbors=10, n_epochs=100,
                         metric="euclidean", seed=1)
    np.testing.assert_array_equal(y, y2)


def test_reduce_entry_and_projection_route():
    x, _ = make_clusters(n_per=15)
    y = umap.reduce(x, metric="cosine", n_epochs=30)
    assert y.shape == (len(x), 2)
    from viquae_tpu.viz import projection

    y3 = projection.project(x, method="umap", n_epochs=30)
    assert y3.shape == (len(x), 2)


def test_smooth_knn_duplicate_points():
    """Exact duplicates (zero nearest-neighbor distance) keep the
    local-connectivity property: rho = nearest NON-zero distance."""
    from viquae_tpu.viz.umap import smooth_knn

    dists = np.array([
        [0.0, 0.5, 1.0, 2.0],   # duplicate neighbor at distance 0
        [0.3, 0.6, 0.9, 1.2],   # no duplicates
        [0.0, 0.0, 0.0, 0.0],   # all duplicates
    ])
    rho, sigma = smooth_knn(dists)
    assert rho[0] == 0.5
    assert rho[1] == 0.3
    assert rho[2] == 0.0
    assert (sigma > 0).all()
