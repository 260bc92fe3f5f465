"""DeviceBM25 vs the exact host scorer (ops/bm25_device.py).

The device path quantizes per-posting weights to bf16, so ranks may swap
on near-ties; the contract test checks RANK-QUALITY (every retrieved doc's
EXACT score is within bf16 tolerance of the exact k-th score) rather than
bitwise id equality — the same discipline as the dense bf16 leg
(PARITY.md "bf16 tie artifacts").
"""
import numpy as np
import pytest

from viquae_tpu.ops import bm25 as bm25_lib
from viquae_tpu.ops.bm25_device import DeviceBM25


def _synth_corpus(n_docs=400, vocab=300, seed=0):
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n_docs):
        length = rng.integers(10, 60)
        toks = (rng.zipf(1.3, length).astype(np.int64) - 1) % vocab
        texts.append(" ".join(f"w{t}" for t in toks))
    return texts


@pytest.fixture(scope="module")
def host_index():
    return bm25_lib.BM25Index.build(_synth_corpus(), k1=0.5, b=0.3)


@pytest.fixture(scope="module")
def device_index(host_index):
    return DeviceBM25(host_index, n_head=16, l_small=64, pool_mid=6,
                      pool_small=16, q_block=8)


def _exact_scores(index, query):
    """Full exact score vector on host (f32, original-order accumulation)."""
    scores = np.zeros(index.n_docs, np.float32)
    counts = {}
    for tok in bm25_lib.analyze(query):
        tid = index.vocab.get(tok)
        if tid is not None:
            counts[tid] = counts.get(tid, 0) + 1
    for tid, qtf in counts.items():
        lo, hi = index.offsets[tid], index.offsets[tid + 1]
        docs = index.docs[lo:hi]
        tf = index.tfs[lo:hi]
        scores[docs] += index.idf[tid] * qtf * tf / (tf + index.norm[docs])
    return scores


def _queries(host_index, n=24, seed=1, n_terms=6):
    rng = np.random.default_rng(seed)
    vocab = max(int(t[1:]) for t in host_index.vocab) + 1
    out = []
    for _ in range(n):
        terms = (rng.zipf(1.3, n_terms).astype(np.int64) - 1) % vocab
        out.append(" ".join(f"w{t}" for t in terms))
    return out


def test_device_matches_exact_to_bf16(host_index, device_index):
    queries = _queries(host_index)
    k = 20
    d_scores, d_ids = device_index.search_batch(queries, k=k)
    for q, (ds, di) in enumerate(zip(d_scores, d_ids)):
        exact = _exact_scores(host_index, queries[q])
        n_pos = int((exact > 0).sum())
        assert len(di) == min(k, n_pos), (q, len(di), n_pos)
        if not di:
            continue
        kth = np.sort(exact)[::-1][len(di) - 1]
        tol = 1.6e-2 * max(abs(kth), 1e-6) + 1e-6  # bf16 relative step
        for score, doc in zip(ds, di):
            # every retrieved doc must be a true near-top-k doc...
            assert exact[doc] >= kth - tol, (q, doc, exact[doc], kth)
            # ...and the device score must be the bf16-quantized exact one
            assert abs(score - exact[doc]) <= tol + 1.6e-2 * exact[doc], (
                q, doc, score, exact[doc])


def test_head_only_and_tail_only_queries(host_index, device_index):
    # w0 is the highest-df term (head); a rare term exercises the tail
    df = np.diff(host_index.offsets)
    head_term = f"w{np.argmax(df)}"
    rare = f"w{np.argmax(df == df[df > 0].min())}"
    for query in (head_term, rare, f"{head_term} {rare}"):
        (ds,), (di,) = device_index.search_batch([query], k=10)
        exact = _exact_scores(host_index, query)
        order = np.argsort(-exact, kind="stable")
        want = [d for d in order[:10] if exact[d] > 0]
        assert len(di) == min(10, len(want))
        assert exact[di[0]] >= exact[want[0]] * (1 - 2e-2)


def test_qtf_duplicates_count(host_index, device_index):
    df = np.diff(host_index.offsets)
    rare = f"w{np.argmax(df == df[df > 0].min())}"
    (s1,), (i1,) = device_index.search_batch([rare], k=5)
    (s2,), (i2,) = device_index.search_batch([f"{rare} {rare}"], k=5)
    assert i1 == i2
    np.testing.assert_allclose(np.asarray(s2), 2 * np.asarray(s1),
                               rtol=2e-2)


def test_overflow_falls_back_to_host_exactly(host_index, device_index):
    # more distinct TAIL terms than the whole block pool (6 mid + 16
    # small) in one query -> host fallback for that query
    df = np.diff(host_index.offsets)
    tail_terms = [f"w{t}" for t in np.argsort(-df)
                  if device_index.head_pos[host_index.vocab[f"w{t}"]] < 0
                  and df[host_index.vocab[f"w{t}"]] > 0][:23]
    assert len(tail_terms) == 23
    query = " ".join(tail_terms)
    plan, overflow = device_index._plan([query])
    assert overflow == [0]
    d_s, d_i = device_index.search_batch([query], k=10)
    h_s, h_i = host_index.search_batch([query], k=10)
    assert d_i == h_i
    assert d_s == h_s  # exact float equality: it IS the host path


def test_pool_exhaustion_spills_queries_not_results(host_index):
    """A tiny pool forces LATER queries in a block to the host fallback;
    their results must still be correct (and earlier queries unaffected)."""
    dev = DeviceBM25(host_index, n_head=16, l_small=64, pool_mid=1,
                     pool_small=2, q_block=8)
    df = np.diff(host_index.offsets)
    tails = [f"w{t}" for t in np.argsort(-df)
             if dev.head_pos[host_index.vocab[f"w{t}"]] < 0
             and df[host_index.vocab[f"w{t}"]] > 0][:6]
    queries = [f"{tails[0]} {tails[1]}", f"{tails[2]} {tails[3]}",
               f"{tails[4]} {tails[5]}"]
    _, overflow = dev._plan(queries)
    assert overflow, "tiny pool must overflow somewhere"
    d_s, d_i = dev.search_batch(queries, k=10)
    for q, query in enumerate(queries):
        exact = _exact_scores(host_index, query)
        if not d_i[q]:
            assert not (exact > 0).any()
            continue
        kth = np.sort(exact)[::-1][len(d_i[q]) - 1]
        tol = 2e-2 * max(kth, 1e-6) + 1e-6
        assert all(exact[d] >= kth - tol for d in d_i[q])


def test_empty_and_unknown_queries(device_index):
    scores, ids = device_index.search_batch(["", "zzz unknowntoken"], k=5)
    assert scores == [[], []] and ids == [[], []]


def test_batch_padding_isolated(host_index, device_index):
    """Results must not depend on block padding: 3 queries (pad to 8) ==
    the same queries inside a full block."""
    queries = _queries(host_index, n=3, seed=7)
    a = device_index.search_batch(queries, k=10)
    b = device_index.search_batch(queries + _queries(host_index, 5, 8),
                                  k=10)
    assert a[1] == b[1][:3]
    assert a[0] == b[0][:3]


def test_rebuild_after_retune(host_index):
    dev = DeviceBM25(host_index, n_head=16, l_small=64, q_block=8)
    host_index.set_hyperparameters(k1=1.2, b=0.75)
    try:
        dev.rebuild()
        queries = _queries(host_index, n=4, seed=3)
        d_s, d_i = dev.search_batch(queries, k=10)
        for q in range(len(queries)):
            exact = _exact_scores(host_index, queries[q])
            if not d_i[q]:
                continue
            kth = np.sort(exact)[::-1][len(d_i[q]) - 1]
            tol = 2e-2 * max(kth, 1e-6) + 1e-6
            assert all(exact[d] >= kth - tol for d in d_i[q])
    finally:
        host_index.set_hyperparameters(k1=0.5, b=0.3)


def test_searcher_seam_device_flag(host_index, tmp_path):
    """IndexKind.BM25 with index_kwargs={'device': True} builds a
    DeviceBM25 behind the same seam."""
    import datasets

    from viquae_tpu.ir.search import IndexKind, KnowledgeBase

    texts = _synth_corpus(n_docs=50, vocab=60, seed=5)
    kb = KnowledgeBase(datasets.Dataset.from_dict({"passage": texts}))
    kb.add_or_load_index(column="passage", index_name="sparse",
                         kind=IndexKind.BM25, k1=0.5, b=0.3, device=True,
                         n_head=8, l_small=32, l_mid=64, q_block=4)
    backend = kb.indexes["sparse"].backend
    assert isinstance(backend, DeviceBM25)
    # every device tunable must be whitelisted through the seam (l_mid
    # was once silently dropped / crashed the host build)
    assert backend.l_mid_cfg == 64
    scores, ids = kb.search_batch("sparse", [texts[0][:40]], k=5)
    assert ids[0], "non-empty retrieval through the seam"


# --------------------------------------------------------------------------
# KB-sharded device BM25
# --------------------------------------------------------------------------
def test_sharded_matches_single_device(host_index):
    """ShardedDeviceBM25 over kb=4 must return the same retrieval as the
    single-device DeviceBM25 (same bf16 weights, same selection, merge by
    (-score, id)) up to bf16 near-tie swaps at the k boundary."""
    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    ctx = meshlib.make_mesh(data=2, kb=4)
    single = DeviceBM25(host_index, n_head=16, l_small=64, pool_mid=6,
                        pool_small=16, q_block=8)
    sharded = ShardedDeviceBM25(host_index, mesh_ctx=ctx, n_head=16,
                                l_small=64, pool_mid=6, pool_small=16,
                                q_block=8)
    queries = _queries(host_index, n=16, seed=11)
    s1, i1 = single.search_batch(queries, k=15)
    s2, i2 = sharded.search_batch(queries, k=15)
    for q in range(len(queries)):
        assert len(i1[q]) == len(i2[q]), q
        if not i1[q]:
            continue
        # scores must agree element-wise (same bf16 arithmetic)...
        np.testing.assert_allclose(s1[q], s2[q], rtol=1e-6, atol=1e-6)
        # ...and ids agree except where equal scores tie
        for a, b, sa in zip(i1[q], i2[q], s1[q]):
            if a != b:
                assert abs(sa - s2[q][i2[q].index(b)]) <= 1e-6, (q, a, b)


def test_sharded_per_shard_ranges_cover_all_postings(host_index):
    """Every tail posting lands in exactly one shard's (start, len) range:
    sum of per-shard lens == total tail df per term."""
    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    ctx = meshlib.make_mesh(data=2, kb=4)
    sharded = ShardedDeviceBM25(host_index, mesh_ctx=ctx, n_head=16,
                                l_small=64, q_block=8)
    np.testing.assert_array_equal(
        sharded.tail_len.sum(axis=0), sharded.tail_df_total)


def test_sharded_overflow_and_empty(host_index):
    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    ctx = meshlib.make_mesh(data=2, kb=4)
    sharded = ShardedDeviceBM25(host_index, mesh_ctx=ctx, n_head=16,
                                l_small=64, pool_mid=1, pool_small=2,
                                q_block=4)
    df = np.diff(host_index.offsets)
    tails = [f"w{t}" for t in np.argsort(-df)
             if sharded.head_pos[host_index.vocab[f"w{t}"]] < 0
             and df[host_index.vocab[f"w{t}"]] > 0][:6]
    query = " ".join(tails)
    _, overflow = sharded._plan([query])
    assert overflow == [0]
    d_s, d_i = sharded.search_batch([query, ""], k=10)
    h_s, h_i = host_index.search_batch([query], k=10)
    assert d_i[0] == h_i[0] and d_s[0] == h_s[0]
    assert d_i[1] == [] and d_s[1] == []


def test_empty_corpus_returns_empty():
    idx = bm25_lib.BM25Index.build([], k1=0.5, b=0.3)
    dev = DeviceBM25(idx, n_head=4, l_small=16, pool_mid=2, pool_small=4,
                     q_block=4)
    scores, ids = dev.search_batch(["anything"], k=5)
    assert scores == [[]] and ids == [[]]


def test_search_batch_device_matches_host_convention(host_index,
                                                     device_index):
    """search_batch_device returns the framework pad convention on device
    (-inf / int32-max), row-identical to search_batch incl. overflow
    fallback rows."""
    df = np.diff(host_index.offsets)
    tails = [f"w{t}" for t in np.argsort(-df)
             if device_index.head_pos[host_index.vocab[f"w{t}"]] < 0
             and df[host_index.vocab[f"w{t}"]] > 0]
    queries = _queries(host_index, n=5, seed=13)
    queries.append(" ".join(tails[:23]))  # forces a host-fallback row
    _, overflow = device_index._plan(queries)
    assert overflow, "construction must include an overflow query"
    l_s, l_i = device_index.search_batch(queries, k=10)
    d_s, d_i = device_index.search_batch_device(queries, k=10)
    d_s, d_i = np.asarray(d_s), np.asarray(d_i)
    pad = np.iinfo(np.int32).max
    for q in range(len(queries)):
        keep = d_i[q] != pad
        assert d_i[q][keep].tolist() == l_i[q]
        np.testing.assert_allclose(d_s[q][keep], l_s[q], rtol=1e-6)
        assert np.all(np.isneginf(d_s[q][~keep]))


def test_sharded_search_batch_device_matches_lists(host_index):
    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    ctx = meshlib.make_mesh(data=2, kb=4)
    sharded = ShardedDeviceBM25(host_index, mesh_ctx=ctx, n_head=16,
                                l_small=64, pool_mid=6, pool_small=16,
                                q_block=8)
    queries = _queries(host_index, n=6, seed=17)
    l_s, l_i = sharded.search_batch(queries, k=10)
    d_s, d_i = sharded.search_batch_device(queries, k=10)
    d_s, d_i = np.asarray(d_s), np.asarray(d_i)
    pad = np.iinfo(np.int32).max
    for q in range(len(queries)):
        keep = d_i[q] != pad
        assert d_i[q][keep].tolist() == l_i[q]
        np.testing.assert_allclose(d_s[q][keep], l_s[q], rtol=1e-6)


def test_searcher_seam_sharded_device_flag(host_index):
    """device='sharded' behind the IndexKind.BM25 seam builds a
    ShardedDeviceBM25 over the ambient kb mesh."""
    import datasets

    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.ir.search import IndexKind, KnowledgeBase
    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    texts = _synth_corpus(n_docs=60, vocab=60, seed=9)
    ctx = meshlib.make_mesh(data=2, kb=4)
    kb = KnowledgeBase(datasets.Dataset.from_dict({"passage": texts}),
                       mesh_ctx=ctx)
    kb.add_or_load_index(column="passage", index_name="sparse",
                         kind=IndexKind.BM25, k1=0.5, b=0.3,
                         device="sharded", n_head=8, l_small=32,
                         pool_mid=4, pool_small=8, q_block=4)
    backend = kb.indexes["sparse"].backend
    assert isinstance(backend, ShardedDeviceBM25)
    scores, ids = kb.search_batch("sparse", [texts[5][:40]], k=5)
    assert ids[0], "non-empty retrieval through the sharded seam"


def test_pools_scale_with_q_block(host_index):
    """Default pools scale with q_block (a bigger block holds
    proportionally more (query, term) pairs); results agree with a
    small-block scorer on the same corpus."""
    big = DeviceBM25(host_index, n_head=16, l_small=64, q_block=256)
    assert big.pool_mid == 1088 and big.pool_small == 576
    small = DeviceBM25(host_index, n_head=16, l_small=64, q_block=128)
    assert small.pool_mid == 704 and small.pool_small == 384
    assert big.pool_mid > small.pool_mid
    assert big.pool_small > small.pool_small
    queries = _queries(host_index, n=12, seed=7)
    s_big, i_big = big.search_batch(queries, k=10)
    s_small, i_small = small.search_batch(queries, k=10)
    for a, b in zip(i_big, i_small):
        assert a == b
    for a, b in zip(s_big, s_small):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_split_slots_match_unsplit(host_index):
    """A tiny l_mid cap forces wide terms to SPLIT across consecutive
    slots; scores must match an unsplit scorer on the same corpus (adds
    are additive — only f32 summation order can differ)."""
    # n_head=0 leaves even the widest terms in the tail (df ~hundreds at
    # this fixture), so l_mid=128 forces multi-chunk splits
    unsplit = DeviceBM25(host_index, n_head=0, l_small=64, l_mid=1 << 20,
                         q_block=8)
    split = DeviceBM25(host_index, n_head=0, l_small=64, l_mid=128,
                       q_block=8)
    assert split.l_mid == 128
    assert unsplit.l_mid > split.l_mid, "fixture corpus too small to split"
    queries = _queries(host_index, n=16, seed=11)
    s_u, i_u = unsplit.search_batch(queries, k=10)
    s_s, i_s = split.search_batch(queries, k=10)
    assert split.last_overflow == 0, "split pools must absorb the chunks"
    for a, b in zip(i_u, i_s):
        assert a == b
    for a, b in zip(s_u, s_s):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_split_slots_sharded_matches_single_device(host_index):
    """Sharded split slots (same slot index on every shard, per-shard
    sub-ranges) must agree with the single-device split scorer."""
    from viquae_tpu.core import mesh as meshlib

    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    ctx = meshlib.make_mesh(data=2, kb=4)
    single = DeviceBM25(host_index, n_head=16, l_small=64, l_mid=128,
                        q_block=8)
    sharded = ShardedDeviceBM25(host_index, mesh_ctx=ctx, n_head=16,
                                l_small=64, l_mid=128, q_block=8)
    assert sharded.l_mid <= 128
    queries = _queries(host_index, n=16, seed=13)
    s_1, i_1 = single.search_batch(queries, k=10)
    s_n, i_n = sharded.search_batch(queries, k=10)
    for a, b in zip(i_1, i_n):
        assert a == b
    for a, b in zip(s_1, s_n):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_last_overflow_counter(host_index):
    """last_overflow reports the host-fallback query count per call —
    the bench labels the overflow rate next to the throughput."""
    dev = DeviceBM25(host_index, n_head=16, l_small=64, pool_mid=2,
                     pool_small=2, q_block=8)
    queries = _queries(host_index, n=16, seed=17)
    dev.search_batch(queries, k=10)
    assert dev.last_overflow > 0
    roomy = DeviceBM25(host_index, n_head=16, l_small=64, q_block=8)
    roomy.search_batch(queries, k=10)
    assert roomy.last_overflow == 0


def test_scatter_operands_behind_opt_barrier(host_index, device_index):
    """The tail scatter's gathered operands must stay materialized behind
    an optimization barrier in the COMPILED program: XLA otherwise fuses
    the slice-gather + mask into the scatter's operand computation and
    the scatter slows ~4x on TPU (round-5 exp_bm25_scatter_layout —
    85 ms vs ~162 ms for the same 4.3M lanes). The guard asserts the
    barrier at the StableHLO level — what this module controls; the CPU
    backend is free to elide it from its own scheduled HLO."""
    import jax.numpy as jnp

    from viquae_tpu.ops import bm25_device

    dev = device_index
    queries = _queries(host_index, n=8, seed=19)
    plan, _ = dev._plan(queries)
    head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
    lowered = bm25_device._bm25_block.lower(
        dev.head_dense, dev.tail_docs, dev.tail_w,
        jnp.asarray(head_w.astype(jnp.bfloat16)),
        jnp.asarray(ms[0]), jnp.asarray(ml[0]),
        jnp.asarray(mr[0]), jnp.asarray(mq[0]),
        jnp.asarray(ss[0]), jnp.asarray(sl[0]),
        jnp.asarray(sr[0]), jnp.asarray(sq[0]),
        k=10, l_mid=dev.l_mid, l_small=dev.l_small,
        n_docs=dev.index.n_docs)
    hlo = lowered.as_text()
    assert "stablehlo.optimization_barrier" in hlo, (
        "anti-fusion barrier missing from the lowered BM25 block — "
        "TPU XLA will fuse the gather into the scatter (~4x slower)")
    assert hlo.count("scatter") >= 2, "expected the two tier scatters"
