import jax.numpy as jnp
import numpy as np
import pytest

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.ops import mips


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    kb = rng.standard_normal((10_037, 64)).astype(np.float32)
    queries = rng.standard_normal((33, 64)).astype(np.float32)
    return queries, kb


def test_single_device_parity(data):
    queries, kb = data
    ref_scores, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    scores, idx = mips.topk_single(
        jnp.asarray(queries), jnp.asarray(kb), 20, chunk_size=1024
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=2e-5, atol=2e-5)


def test_tie_breaking_by_index():
    # duplicate rows => tied scores; FAISS contract: ascending index
    kb = np.tile(np.eye(4, dtype=np.float32), (5, 1))  # rows 0..19, dup every 4
    q = np.eye(4, dtype=np.float32)[:1]  # matches rows 0,4,8,12,16 equally
    scores, idx = mips.topk_single(jnp.asarray(q), jnp.asarray(kb), 5, chunk_size=4)
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 4, 8, 12, 16])
    assert np.all(np.asarray(scores)[0] == 1.0)


def test_valid_rows_masking(data):
    queries, kb = data
    padded = np.concatenate([kb, 100 * np.ones((11, kb.shape[1]), np.float32)])
    scores, idx = mips.topk_single(
        jnp.asarray(queries), jnp.asarray(padded), 10,
        chunk_size=2048, valid_rows=jnp.int32(len(kb)),
    )
    assert np.asarray(idx).max() < len(kb)
    ref_scores, ref_idx = mips.exact_topk_numpy(queries, kb, 10)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_sharded_matches_single(data, devices):
    queries, kb = data
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        n_pad = meshlib.pad_to_multiple(len(kb), 8 * 8)
        kb_pad = np.zeros((n_pad, kb.shape[1]), np.float32)
        kb_pad[: len(kb)] = kb
        import jax
        kb_sharded = jax.device_put(jnp.asarray(kb_pad), ctx.kb_sharded)
        scores, idx = mips.topk_sharded(
            jnp.asarray(queries), kb_sharded, 20,
            mesh_ctx=ctx, chunk_size=512, valid_rows=len(kb),
        )
    ref_scores, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=2e-5, atol=2e-5)


def test_dense_index_l2norm_and_roundtrip(tmp_path, data, devices):
    queries, kb = data
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        index = mips.DenseIndex(kb, do_l2norm=True, mesh_ctx=ctx, chunk_size=512)
        scores, idx = index.search_batch(queries, k=20)
        # reference: cosine via normalized ip
        kbn = kb / np.linalg.norm(kb, axis=1, keepdims=True)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        ref_scores, ref_idx = mips.exact_topk_numpy(qn, kbn, 20)
        np.testing.assert_array_equal(idx, ref_idx)
        np.testing.assert_allclose(scores, ref_scores, rtol=2e-5, atol=2e-5)

        index.save(tmp_path / "index.npz")
        loaded = mips.DenseIndex.load(tmp_path / "index.npz", mesh_ctx=ctx, chunk_size=512)
        s2, i2 = loaded.search_batch(queries, k=20)
        np.testing.assert_array_equal(i2, idx)


def test_k_larger_than_chunk(data):
    queries, kb = data
    scores, idx = mips.topk_single(jnp.asarray(queries), jnp.asarray(kb), 150, chunk_size=100)
    ref_scores, ref_idx = mips.exact_topk_numpy(queries, kb, 150)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_fast_mode_segmented_parity(data):
    # chunk 4096 -> 32 segments > k=20: exercises the two-level path
    queries, kb = data
    kb = kb[:8192]
    ref_scores, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    scores, idx = mips.topk_single(
        jnp.asarray(queries), jnp.asarray(kb), 20, chunk_size=4096, mode="fast"
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_approx_mode_high_recall(data):
    queries, kb = data
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    _, idx = mips.topk_single(
        jnp.asarray(queries), jnp.asarray(kb), 20, chunk_size=2048, mode="approx"
    )
    idx = np.asarray(idx)
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 20 for i in range(len(idx))
    ])
    assert recall > 0.8, recall


def test_topk_global_parity(data):
    queries, kb = data
    ref_scores, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    scores, idx = mips.topk_global(
        jnp.asarray(queries), jnp.asarray(kb), 20,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=2e-5, atol=2e-5)


def test_topk_global_valid_rows(data):
    queries, kb = data
    padded = np.concatenate([kb, 100 * np.ones((13, kb.shape[1]), np.float32)])
    _, idx = mips.topk_global(
        jnp.asarray(queries), jnp.asarray(padded), 10,
        valid_rows=jnp.int32(len(kb)), compute_dtype=jnp.float32,
    )
    assert np.asarray(idx).max() < len(kb)


def test_sharded_global_mode(data, devices):
    queries, kb = data
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        n_pad = meshlib.pad_to_multiple(len(kb), 8 * 8)
        kb_pad = np.zeros((n_pad, kb.shape[1]), np.float32)
        kb_pad[: len(kb)] = kb
        import jax
        kb_sharded = jax.device_put(jnp.asarray(kb_pad), ctx.kb_sharded)
        scores, idx = mips.topk_sharded(
            jnp.asarray(queries), kb_sharded, 20,
            mesh_ctx=ctx, valid_rows=len(kb),
            compute_dtype=jnp.float32, mode="global",
        )
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_topk_global_approx_mode(data):
    """mode="approx" (lax.approx_max_k fused selection) keeps high recall and
    respects valid_rows masking."""
    queries, kb = data
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    padded = np.concatenate([kb, 100 * np.ones((13, kb.shape[1]), np.float32)])
    scores, idx = mips.topk_global(
        jnp.asarray(queries), jnp.asarray(padded), 20,
        valid_rows=jnp.int32(len(kb)), compute_dtype=jnp.float32,
        mode="approx",
    )
    idx = np.asarray(idx)
    assert idx.max() < len(kb)
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 20 for i in range(len(idx))
    ])
    assert recall > 0.8, recall
    # scores sorted descending, ties broken ascending by index
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_dense_index_approx_mode(data, devices):
    queries, kb = data
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 10)
    index = mips.DenseIndex(kb, mode="approx")
    _, idx = index.search_batch(queries, k=10)
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 10 for i in range(len(idx))
    ])
    assert recall > 0.8, recall


def test_search_batch_device_array_input(data, devices):
    """Regression: search_batch accepts a jax.Array (the serving path keeps
    embeddings on device) and matches the host-array path exactly."""
    queries, kb = data
    index = mips.DenseIndex(kb)
    s_host, i_host = index.search_batch(queries, k=10)
    s_dev, i_dev = index.search_batch(jnp.asarray(queries), k=10)
    np.testing.assert_array_equal(i_host, i_dev)
    np.testing.assert_allclose(s_host, s_dev, rtol=1e-6)


# --------------------------------------------------------------------------
# fused Pallas q-major mode (ops/mips_pallas.topk_fused)
# --------------------------------------------------------------------------
def _distinct_bf16_kb(n_rows: int, dim: int, perm_seed: int = 1):
    """KB whose scores against an all-ones query are DISTINCT small
    integers (bf16-exact, so the bf16 kernel must match fp32 exactly and
    the fast-selection tie caveat never triggers)."""
    rng = np.random.default_rng(perm_seed)
    weights = rng.permutation(n_rows).astype(np.float32) + 1.0
    kb = np.zeros((n_rows, dim), np.float32)
    kb[np.arange(n_rows), np.arange(n_rows) % dim] = weights
    return kb


def test_topk_fused_exact_integer_scores(devices):
    """Distinct integer scores (<= 256, bf16-exact) => the fused kernel
    must reproduce the FULL FAISS contract: identical ids and scores."""
    from viquae_tpu.ops import mips_pallas

    kb = _distinct_bf16_kb(256, 64)
    q = np.concatenate([
        np.ones((1, 64), np.float32),
        2 * np.ones((1, 64), np.float32),  # scaled copy: same ranking
    ])
    padded = np.zeros((512, 64), np.float32)
    padded[:256] = kb
    ref_scores, ref_idx = mips.exact_topk_numpy(q, kb, 25)
    scores, idx = mips_pallas.topk_fused(
        jnp.asarray(q), jnp.asarray(padded).T, 25,
        valid_rows=jnp.int32(256),
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_array_equal(np.asarray(scores), ref_scores)


def test_topk_fused_tie_order_within_topk(devices):
    """Duplicate rows whose ties all FIT inside top-k keep the FAISS
    ascending-index order (the fast contract only allows swaps straddling
    the k-th boundary)."""
    from viquae_tpu.ops import mips_pallas

    kb = np.zeros((512, 8), np.float32)
    kb[:, 0] = 0.125  # background: distinct from the spikes, all tied BELOW
    for r in (3, 130, 259, 388, 500):  # spread across segments
        kb[r] = 0.0
        kb[r, 1] = 2.0
    q = np.zeros((1, 8), np.float32)
    q[0, 1] = 1.0
    q[0, 0] = 0.0
    scores, idx = mips_pallas.topk_fused(jnp.asarray(q), jnp.asarray(kb).T, 5)
    np.testing.assert_array_equal(np.asarray(idx)[0], [3, 130, 259, 388, 500])
    assert np.all(np.asarray(scores)[0] == 2.0)


def test_topk_fused_valid_rows(devices):
    from viquae_tpu.ops import mips_pallas

    kb = _distinct_bf16_kb(200, 64, perm_seed=2)
    poison = np.full((312, 64), 100.0, np.float32)  # pads to 512 total
    padded = np.concatenate([kb, poison])
    q = np.ones((9, 64), np.float32)
    ref_scores, ref_idx = mips.exact_topk_numpy(q, kb, 10)
    scores, idx = mips_pallas.topk_fused(
        jnp.asarray(q), jnp.asarray(padded).T, 10,
        valid_rows=jnp.int32(len(kb)),
    )
    assert np.asarray(idx).max() < len(kb)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_topk_fused_gaussian_recall(data):
    """On gaussian data the bf16 score quantization may swap near-ties vs
    the fp32 reference; require near-perfect set recall (same contract the
    bench reports as r_at_20 vs exact)."""
    from viquae_tpu.ops import mips_pallas

    queries, kb = data
    n_pad = meshlib.pad_to_multiple(len(kb), 512)
    padded = np.zeros((n_pad, kb.shape[1]), np.float32)
    padded[: len(kb)] = kb
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    _, idx = mips_pallas.topk_fused(
        jnp.asarray(queries), jnp.asarray(padded).T, 20,
        valid_rows=jnp.int32(len(kb)),
    )
    idx = np.asarray(idx)
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 20 for i in range(len(idx))
    ])
    assert recall > 0.95, recall


def test_dense_index_fused_mode(data, devices):
    queries, kb = data
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 10)
    index = mips.DenseIndex(kb, mode="fused")
    assert index.matrix.shape == (kb.shape[1], index.matrix.shape[1])
    _, idx = index.search_batch(queries, k=10)
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 10 for i in range(len(idx))
    ])
    assert recall > 0.95, recall


def test_dense_index_fused_sharded(data, devices):
    """fused mode on a kb-sharded mesh: per-shard Pallas kernels + the
    all-gather merge must agree with the single-device fused result —
    score-for-score; ids may swap ONLY on exact bf16 score ties (the
    fast-selection contract: tied duplicates straddling a k-th boundary
    are interchangeable, and per-shard boundaries differ from the global
    one)."""
    queries, kb = data
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        index = mips.DenseIndex(kb, mesh_ctx=ctx, mode="fused")
        assert index.matrix.shape[1] % (ctx.kb_size * 512) == 0
        s_shard, i_shard = index.search_batch(queries, k=10)
    single = mips.DenseIndex(kb, mode="fused")
    s_one, i_one = single.search_batch(queries, k=10)
    np.testing.assert_array_equal(s_shard, s_one)
    mismatch = i_shard != i_one
    assert np.array_equal(s_shard[mismatch], s_one[mismatch])
    assert mismatch.mean() < 0.1  # swaps are rare tied duplicates


def test_topk_fused_k_exceeds_shard_rows(data, devices):
    """k larger than one shard's rows: per-shard results pad with NEG_INF /
    int32-max (topk_single's convention) and the merge still returns the
    true global top-k."""
    queries, kb = data
    queries, kb = queries[:8], kb[:3000]  # 8 shards x 512 rows padded
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        index = mips.DenseIndex(kb, mesh_ctx=ctx, mode="fused")
        rows_per_shard = index.matrix.shape[1] // ctx.kb_size
        k = rows_per_shard + 88  # > one shard's candidate pool
        s, idx = index.search_batch(queries, k=k)
    _, ref_idx = mips.exact_topk_numpy(queries, kb, k)
    overlap = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / k for i in range(len(idx))
    ])
    assert overlap > 0.95, overlap
    assert np.isfinite(s).all() and idx.max() < len(kb)


def test_topk_sharded_pad_sentinel_unshifted(data, devices):
    """Total valid candidates < k: the merged output must carry the
    documented int32-max pad convention (NEG_INF score), NOT base-shifted
    sentinels wrapped to negative garbage ids — fuse_topk and QA serving
    key on the sentinel value."""
    queries, kb = data
    queries, kb = queries[:4], kb[:100]  # 100 valid rows over 8 shards
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        index = mips.DenseIndex(kb, mesh_ctx=ctx, mode="fused")
        k = 256  # > total valid candidates
        s, idx = index.search_batch(queries, k=k)
    _, ref_idx = mips.exact_topk_numpy(queries, kb, min(k, len(kb)))
    pad_id = np.iinfo(np.int32).max
    real = idx[:, : len(kb)]
    assert (real >= 0).all() and (real < len(kb)).all()
    np.testing.assert_array_equal(np.sort(real, 1), np.sort(ref_idx, 1))
    assert (idx[:, len(kb):] == pad_id).all(), idx[:, len(kb):]
    assert np.isneginf(s[:, len(kb):]).all() or (
        s[:, len(kb):] < -1e30).all()


def test_dense_index_fused_roundtrip(tmp_path, data, devices):
    queries, kb = data
    index = mips.DenseIndex(kb, mode="fused")
    path = str(tmp_path / "fused_idx")
    index.save(path)
    loaded = mips.DenseIndex.load(path, mode="fused")
    _, idx = index.search_batch(queries, k=5)
    _, idx2 = loaded.search_batch(queries, k=5)
    np.testing.assert_array_equal(idx, idx2)


def test_to_kernel_layout(devices):
    from viquae_tpu.ops import mips_pallas

    rng = np.random.default_rng(0)
    kb = rng.standard_normal((1000, 32)).astype(np.float32)
    kbt = np.asarray(mips_pallas.to_kernel_layout(jnp.asarray(kb)))
    assert kbt.shape == (32, 1024)  # padded to the 512 tile
    np.testing.assert_array_equal(kbt[:, :1000], kb.T)
    assert (kbt[:, 1000:] == 0).all()
    # already aligned: no padding
    kbt2 = np.asarray(mips_pallas.to_kernel_layout(jnp.asarray(kb[:512])))
    assert kbt2.shape == (32, 512)


def test_sharded_approx_honors_recall_target(data, devices):
    """mode='approx' on a kb-sharded mesh must honor the index's tuned
    recall target (round-3 review: it used the library default and
    silently degraded sharded recall)."""
    queries, kb = data
    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        index = mips.DenseIndex(kb, mesh_ctx=ctx, mode="approx",
                                approx_recall_target=0.99)
        s, idx = index.search_batch(queries, k=20)
    _, ref_idx = mips.exact_topk_numpy(queries, kb, 20)
    recall = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 20 for i in range(len(idx))
    ])
    assert recall > 0.9, recall


def test_select_topk_global_mode_alias():
    """'global' is accepted as an alias of the fast selection (it named
    the engine, not a selection scheme — previously accept-then-reject)."""
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.standard_normal((4, 1024)).astype(np.float32))
    s1, i1 = mips._select_topk(scores, 5, "global")
    s2, i2 = mips._select_topk(scores, 5, "fast")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_topk_global_k_exceeds_pool(devices):
    """Round-3 review (confirmed crash): k > the candidate pool (k > one
    shard's rows in topk_sharded modes global/approx) crashed
    jax.lax.top_k; now pads with NEG_INF / int32-max."""
    rng = np.random.default_rng(0)
    kb = rng.standard_normal((128, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    for mode in ("exact", "approx"):
        s, i = mips.topk_global(jnp.asarray(q), jnp.asarray(kb), 500,
                                compute_dtype=jnp.float32, mode=mode)
        s, i = np.asarray(s), np.asarray(i)
        assert s.shape == (4, 500) and i.shape == (4, 500)
        assert (i[:, 128:] == np.iinfo(np.int32).max).all()
        assert np.isneginf(s[:, 128:]).all()
        # the real 128 lead and (exact mode) match the oracle
        if mode == "exact":
            es, ei = mips.exact_topk_numpy(q, kb, 128)
            np.testing.assert_array_equal(i[:, :128], ei)


def test_topk_sharded_k_exceeds_shard_rows(devices):
    """The 8-way sharded wrappers hit the same k > rows_per_shard case."""
    import jax

    from viquae_tpu.core import mesh as meshlib

    rng = np.random.default_rng(1)
    kb = rng.standard_normal((1024, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    ctx = meshlib.make_mesh(kb=8)
    with meshlib.use(ctx):
        shards = jax.device_put(
            jnp.asarray(kb), ctx.sharding("kb", None))
        for mode in ("global", "approx"):
            s, i = mips.topk_sharded(
                jnp.asarray(q), shards, 500, mesh_ctx=ctx, mode=mode,
                valid_rows=1024)
            assert np.asarray(s).shape == (4, 500)
            if mode == "global":
                es, ei = mips.exact_topk_numpy(q, kb, 500)
                np.testing.assert_array_equal(np.asarray(i), ei)


def test_topk_pad_sentinel_convention(devices):
    """-inf lanes must carry the int32-max pad id, never a real-looking
    masked row id (fuse_topk's min/sigma and qa_serving's range guard key
    on it)."""
    rng = np.random.default_rng(2)
    kb = rng.standard_normal((64, 8)).astype(np.float32)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    for fn in (
        lambda: mips.topk_single(jnp.asarray(q), jnp.asarray(kb), 16,
                                 valid_rows=jnp.int32(4),
                                 compute_dtype=jnp.float32),
        lambda: mips.topk_global(jnp.asarray(q), jnp.asarray(kb), 16,
                                 valid_rows=jnp.int32(4),
                                 compute_dtype=jnp.float32),
    ):
        s, i = map(np.asarray, fn())
        assert (i[:, 4:] == np.iinfo(np.int32).max).all(), i
        assert (i[:, :4] < 4).all()


# ---------------------------------------------------------------------------
# incremental add / reconstruct (FAISS IndexFlat.add contract)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("mode", ["fast", "global", "fused"])
def test_dense_index_add_matches_fresh_build(devices, mode):
    """add() must be indistinguishable from building the index over the
    concatenated data: same ids, same scores, new rows searchable at
    ids [n, n+m). Covers both the in-place (within padding) and the
    repad (beyond padding) paths via two successive adds."""
    rng = np.random.default_rng(5)
    d = 32
    base = rng.standard_normal((600, d)).astype(np.float32)
    extra1 = rng.standard_normal((3, d)).astype(np.float32)    # in padding
    extra2 = rng.standard_normal((700, d)).astype(np.float32)  # forces repad
    queries = rng.standard_normal((9, d)).astype(np.float32)

    ctx = meshlib.make_kb_mesh(kb=1)
    with meshlib.use(ctx):
        idx = mips.DenseIndex(base, mesh_ctx=ctx, mode=mode, chunk_size=256)
        idx.add(extra1)
        idx.add(extra2)
        s_inc, i_inc = idx.search_batch(queries, k=25)
        fresh = mips.DenseIndex(
            np.concatenate([base, extra1, extra2]), mesh_ctx=ctx,
            mode=mode, chunk_size=256)
        s_ref, i_ref = fresh.search_batch(queries, k=25)
    np.testing.assert_array_equal(i_inc, i_ref)
    np.testing.assert_allclose(s_inc, s_ref, rtol=2e-5, atol=2e-5)
    assert idx.n == 1303
    # the appended rows are actually retrievable under their new ids
    with meshlib.use(ctx):
        s_hit, i_hit = idx.search_batch(extra2[:2], k=1)
    np.testing.assert_array_equal(i_hit[:, 0], [603, 604])


def test_dense_index_add_l2norm_and_sharded(devices):
    """add() normalizes new rows on an L2norm index and works on a
    kb-sharded mesh (the matrix re-shards after the update)."""
    rng = np.random.default_rng(6)
    d = 32
    base = rng.standard_normal((500, d)).astype(np.float32)
    extra = 5.0 * rng.standard_normal((77, d)).astype(np.float32)
    queries = rng.standard_normal((7, d)).astype(np.float32)

    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        idx = mips.DenseIndex(base, do_l2norm=True, mesh_ctx=ctx,
                              chunk_size=256)
        idx.add(extra)
        s_inc, i_inc = idx.search_batch(queries, k=15)
        fresh = mips.DenseIndex(np.concatenate([base, extra]),
                                do_l2norm=True, mesh_ctx=ctx,
                                chunk_size=256)
        s_ref, i_ref = fresh.search_batch(queries, k=15)
    np.testing.assert_array_equal(i_inc, i_ref)
    np.testing.assert_allclose(s_inc, s_ref, rtol=2e-5, atol=2e-5)


def test_dense_index_reconstruct(devices):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 16)).astype(np.float32)
    ctx = meshlib.make_kb_mesh(kb=1)
    with meshlib.use(ctx):
        idx = mips.DenseIndex(base, mesh_ctx=ctx, chunk_size=64)
        got = idx.reconstruct_batch([0, 17, 99])
        np.testing.assert_allclose(got, base[[0, 17, 99]], rtol=1e-6)
        # L2norm index returns the STORED (normalized) rows
        idxn = mips.DenseIndex(base, do_l2norm=True, mesh_ctx=ctx,
                               chunk_size=64)
        gotn = idxn.reconstruct_batch([3])
        np.testing.assert_allclose(np.linalg.norm(gotn[0]), 1.0, rtol=1e-5)
        with pytest.raises(IndexError):
            idx.reconstruct_batch([100])
        # fused mode stores (d, N); reconstruct transposes back, bf16-quantized
        idxf = mips.DenseIndex(base, mesh_ctx=ctx, mode="fused")
        gotf = idxf.reconstruct_batch([5, 50])
        np.testing.assert_allclose(gotf, base[[5, 50]], rtol=1e-2, atol=1e-2)


def test_dense_index_differential_fuzz(devices):
    """Randomized differential sweep: every exact-selection DenseIndex mode
    must match np.argsort over random (N, d, k, Q, l2norm) configs incl.
    awkward shapes (N not 8/128-aligned, N < one segment, k near N, Q=1).
    Complements the targeted edge tests above with breadth."""
    rng = np.random.default_rng(42)
    ctx = meshlib.make_kb_mesh(kb=1)
    for trial in range(8):
        n = int(rng.choice([37, 129, 800, 1000, 2049]))
        d = int(rng.choice([8, 32, 48]))
        q_count = int(rng.choice([1, 5, 17]))
        k = int(rng.choice([1, 3, min(64, n), min(n, 200)]))
        do_norm = bool(rng.integers(0, 2))
        kb = rng.standard_normal((n, d)).astype(np.float32)
        queries = rng.standard_normal((q_count, d)).astype(np.float32)
        kb_ref = kb if not do_norm else (
            kb / np.maximum(np.linalg.norm(kb, axis=1, keepdims=True), 1e-12))
        q_ref = queries if not do_norm else (
            queries / np.maximum(
                np.linalg.norm(queries, axis=1, keepdims=True), 1e-12))
        ref_s, ref_i = mips.exact_topk_numpy(q_ref, kb_ref, min(k, n))
        with meshlib.use(ctx):
            for mode in ("fast", "global"):
                index = mips.DenseIndex(kb, do_l2norm=do_norm, mesh_ctx=ctx,
                                        mode=mode, chunk_size=256)
                s, i = index.search_batch(queries, k=k)
                np.testing.assert_array_equal(
                    i, ref_i, err_msg=f"{trial=} {mode=} {n=} {k=}")
                np.testing.assert_allclose(
                    s, ref_s, rtol=2e-5, atol=2e-5,
                    err_msg=f"{trial=} {mode=} {n=} {k=}")


def test_dense_index_add_sharded_fused(devices):
    """add() on a kb-sharded FUSED index: the (d, N) column-sharded matrix
    extends along axis 1 and re-shards; parity vs a fresh build."""
    rng = np.random.default_rng(8)
    d = 32
    base = rng.standard_normal((3000, d)).astype(np.float32)
    extra = rng.standard_normal((1500, d)).astype(np.float32)
    queries = rng.standard_normal((8, d)).astype(np.float32)

    ctx = meshlib.make_kb_mesh()
    with meshlib.use(ctx):
        idx = mips.DenseIndex(base, mesh_ctx=ctx, mode="fused")
        idx.add(extra)
        s_inc, i_inc = idx.search_batch(queries, k=20)
        fresh = mips.DenseIndex(np.concatenate([base, extra]),
                                mesh_ctx=ctx, mode="fused")
        s_ref, i_ref = fresh.search_batch(queries, k=20)
    # bf16 scores: tolerate tied-id swaps (compare scores + id sets)
    np.testing.assert_allclose(s_inc, s_ref, rtol=1e-2, atol=1e-2)
    for r in range(len(queries)):
        assert set(i_inc[r]) == set(i_ref[r]), r


def test_streaming_index_matches_exact(devices):
    """StreamingDenseIndex (host-resident KB, double-buffered chunk
    uploads) matches np.argsort across chunk boundaries, tail chunks,
    k > chunk_rows, l2norm, and k > n."""
    rng = np.random.default_rng(9)
    d = 32
    kb = rng.standard_normal((1337, d)).astype(np.float32)
    queries = rng.standard_normal((7, d)).astype(np.float32)

    # f32: exact FAISS-contract parity
    idx = mips.StreamingDenseIndex(kb, chunk_rows=256, dtype=jnp.float32)
    s, i = idx.search_batch(queries, k=20)
    ref_s, ref_i = mips.exact_topk_numpy(queries, kb, 20)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=2e-5, atol=2e-5)

    # k larger than one chunk
    s, i = idx.search_batch(queries, k=300)
    ref_s, ref_i = mips.exact_topk_numpy(queries, kb, 300)
    np.testing.assert_array_equal(i, ref_i)

    # k > n pads with the sentinel convention
    small = mips.StreamingDenseIndex(kb[:50], chunk_rows=256,
                                     dtype=jnp.float32)
    s, i = small.search_batch(queries, k=60)
    assert i.shape == (7, 60)
    assert np.all(i[:, 50:] == np.iinfo(np.int32).max)
    assert np.all(np.isneginf(s[:, 50:]))

    # l2norm semantics match DenseIndex
    stream_n = mips.StreamingDenseIndex(kb, chunk_rows=512, do_l2norm=True,
                                        dtype=jnp.float32)
    ctx = meshlib.make_kb_mesh(kb=1)
    with meshlib.use(ctx):
        dense_n = mips.DenseIndex(kb, do_l2norm=True, mesh_ctx=ctx,
                                  mode="global")
        s_d, i_d = dense_n.search_batch(queries, k=15)
    s_s, i_s = stream_n.search_batch(queries, k=15)
    np.testing.assert_array_equal(i_s, i_d)
    np.testing.assert_allclose(s_s, s_d, rtol=2e-5, atol=2e-5)


def test_streaming_index_add(devices):
    """StreamingDenseIndex.add(): in-padding and new-chunk appends match a
    fresh build (f32 exact contract)."""
    rng = np.random.default_rng(10)
    d = 16
    base = rng.standard_normal((300, d)).astype(np.float32)
    extra = rng.standard_normal((270, d)).astype(np.float32)
    queries = rng.standard_normal((5, d)).astype(np.float32)
    idx = mips.StreamingDenseIndex(base, chunk_rows=256, dtype=jnp.float32)
    idx.add(extra)  # fills chunk 1's padding and spills into chunk 2
    assert idx.n == 570 and len(idx._chunks) == 3
    s, i = idx.search_batch(queries, k=30)
    ref_s, ref_i = mips.exact_topk_numpy(
        queries, np.concatenate([base, extra]), 30)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_allclose(s, ref_s, rtol=2e-5, atol=2e-5)


def test_streaming_index_empty_and_step_cache(devices):
    """Empty index returns sentinel rows (start-empty-then-add flow); the
    jitted merge step is built ONCE per instance (a per-call closure
    retraced every search)."""
    d = 16
    idx = mips.StreamingDenseIndex(
        np.zeros((0, d), np.float32), chunk_rows=256, dtype=jnp.float32)
    queries = np.random.default_rng(0).standard_normal((3, d)).astype(
        np.float32)
    s, i = idx.search_batch(queries, k=5)
    assert s.shape == (3, 5) and (s == mips.NEG_INF).all()
    assert (i == mips.INT32_MAX).all()
    assert idx._get_step() is idx._get_step()

    idx.add(np.eye(d, dtype=np.float32)[:4] * 3.0)
    s, i = idx.search_batch(queries, k=2)
    assert (i != mips.INT32_MAX).all()  # added rows searchable


def test_dense_index_rows_128_aligned(devices):
    """Non-fused DenseIndex matrices are stored 128-row aligned so
    topk_global's in-jit pad (a full-KB device copy otherwise) is a
    no-op."""
    rng = np.random.default_rng(3)
    kb = rng.standard_normal((333, 16)).astype(np.float32)
    for mode in ("global", "approx", "fast"):
        index = mips.DenseIndex(kb, mode=mode, dtype=jnp.float32)
        assert index.matrix.shape[0] % 128 == 0, mode
        s, i = index.search_batch(kb[:4], k=3)
        assert (np.asarray(i)[:, 0] == np.arange(4)).all()  # self-hit


def test_topk_fused_chunked_matches_single(devices):
    """chunks=2/3 must equal chunks=1 bitwise (ids AND scores), incl.
    valid_rows handling across the slab boundary — the merge sorts by
    (-score, global id), exactly finalize_topk's key. Scores near the
    k-boundary are DISTINCT bf16-exact integers (<= 256 — CLAUDE.md:
    fast-contract comparisons must avoid bf16 boundary ties)."""
    from viquae_tpu.ops import mips_pallas

    rng = np.random.default_rng(5)
    padded = np.zeros((1024, 64), np.float32)
    winners = rng.choice(900, size=40, replace=False)
    values = rng.permutation(40) + 201.0  # distinct, bf16-exact
    padded[winners, winners % 64] = values
    padded[900:, 0] = 999.0  # poison beyond valid_rows
    q = np.concatenate([np.ones((3, 64), np.float32),
                        2 * np.ones((2, 64), np.float32)])
    ref_s, ref_i = mips_pallas.topk_fused(
        jnp.asarray(q), jnp.asarray(padded).T, 30,
        valid_rows=jnp.int32(900))
    assert np.asarray(ref_i).max() < 900
    for chunks in (2, 3):
        s, i = mips_pallas.topk_fused(
            jnp.asarray(q), jnp.asarray(padded).T, 30,
            valid_rows=jnp.int32(900), chunks=chunks)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))


def test_topk_fused_chunked_ties_across_slabs(devices):
    """Tied rows living in DIFFERENT slabs must still come back in
    ascending-id order after the chunked merge."""
    from viquae_tpu.ops import mips_pallas

    kb = np.zeros((1024, 8), np.float32)
    for r in (3, 700):           # slab 0 and slab 1 under chunks=2
        kb[r, 1] = 2.0
    for r in (200, 900):         # second tie group, one per slab
        kb[r, 1] = 1.0
    q = np.zeros((1, 8), np.float32)
    q[0, 1] = 1.0
    s, i = mips_pallas.topk_fused(jnp.asarray(q), jnp.asarray(kb).T, 4,
                                  chunks=2)
    np.testing.assert_array_equal(np.asarray(i)[0], [3, 700, 200, 900])
    np.testing.assert_array_equal(np.asarray(s)[0], [2, 2, 1, 1])


def test_topk_fused_chunked_k_exceeds_slab(devices):
    """k larger than one slab's valid rows: pad sentinels must never leak
    into the merged result when OTHER slabs still have real rows."""
    from viquae_tpu.ops import mips_pallas

    kb = _distinct_bf16_kb(100, 64, perm_seed=7)
    padded = np.zeros((1024, 64), np.float32)
    padded[:100] = kb
    q = np.ones((2, 64), np.float32)
    ref_s, ref_i = mips.exact_topk_numpy(q, kb, 80)
    s, i = mips_pallas.topk_fused(
        jnp.asarray(q), jnp.asarray(padded).T, 80,
        valid_rows=jnp.int32(100), chunks=2)
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_array_equal(np.asarray(s), ref_s)
