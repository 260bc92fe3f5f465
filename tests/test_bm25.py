import numpy as np
import pytest

from viquae_tpu.ops import bm25

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped over a sleepy canine",
    "python is a programming language",
    "the dog chased the cat around the garden",
    "quantum computing with superconducting qubits",
]


@pytest.fixture(scope="module")
def index():
    return bm25.BM25Index.build(DOCS, k1=1.2, b=0.75)


def test_basic_relevance(index):
    scores, docs = index.search("quick brown fox", k=3)
    assert docs[0] == 0
    assert scores == sorted(scores, reverse=True)


def test_rare_term_beats_common(index):
    _, docs = index.search("python programming", k=5)
    assert docs[0] == 2


def test_zero_hits_dropped(index):
    scores, docs = index.search("zebra spaceship", k=5)
    assert docs == [] and scores == []


def test_matches_reference_formula(index):
    # manual BM25 for doc 2, query "python"
    tokens = [bm25.analyze(d) for d in DOCS]
    df = sum("python" in t for t in tokens)
    n = len(DOCS)
    idf = np.log(1 + (n - df + 0.5) / (df + 0.5))
    dl = len(tokens[2])
    avgdl = np.mean([len(t) for t in tokens])
    tf = tokens[2].count("python")
    expected = idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    scores, docs = index.search("python", k=1)
    assert docs == [2]
    assert scores[0] == pytest.approx(expected, rel=1e-5)


def test_retune_hyperparameters(index):
    s1, _ = index.search("fox dog", k=5)
    index.set_hyperparameters(k1=0.5, b=0.3)
    s2, _ = index.search("fox dog", k=5)
    assert s1 != s2
    index.set_hyperparameters(k1=1.2, b=0.75)  # restore for other tests


def test_save_load_roundtrip(tmp_path, index):
    index.save(tmp_path / "bm25")
    loaded = bm25.BM25Index.load(tmp_path / "bm25")
    q = "lazy dog in the garden"
    assert loaded.search(q, k=4) == index.search(q, k=4)


def test_tie_break_by_doc_id():
    idx = bm25.BM25Index.build(["apple pie", "apple pie", "banana"])
    _, docs = idx.search("apple", k=2)
    assert docs == [0, 1]


def test_native_scorer_matches_python(index):
    from viquae_tpu.native import load_bm25_scorer

    native = load_bm25_scorer()
    assert native is not None, "g++ compile of the native scorer failed"
    queries = ["quick brown fox", "python", "the dog", "zebra spaceship", ""]
    native_out = index._search_batch_native(native, queries, k=4)
    # force the pure-python path
    py_scores, py_indices = [], []
    for q in queries:
        s, i = index.search(q, k=4)
        py_scores.append(s)
        py_indices.append(i)
    assert native_out[1] == py_indices
    for ns, ps in zip(native_out[0], py_scores):
        assert ns == pytest.approx(ps, rel=1e-6)


def test_native_scorer_large_random():
    rng = __import__("numpy").random.default_rng(0)
    vocab_words = [f"tok{i}" for i in range(500)]
    docs = [
        " ".join(rng.choice(vocab_words, rng.integers(5, 60)))
        for _ in range(2000)
    ]
    index = bm25.BM25Index.build(docs)
    queries = [
        " ".join(rng.choice(vocab_words, 5)) for _ in range(20)
    ]
    from viquae_tpu.native import load_bm25_scorer

    native_out = index._search_batch_native(load_bm25_scorer(), queries, k=10)
    for qi, q in enumerate(queries):
        s, i = index.search(q, k=10)
        assert native_out[1][qi] == i
        assert native_out[0][qi] == pytest.approx(s, rel=1e-5)


def test_maxscore_exact_parity_fuzz():
    """The MaxScore scorer is RANK-SAFE: identical scores, ids, and tie
    order to both the TAAT C++ scorer and the numpy path, fuzzed across
    random Zipf corpora (duplicated docs force score ties)."""
    from viquae_tpu.native import load_bm25_maxscore, load_bm25_scorer

    maxscore = load_bm25_maxscore()
    taat = load_bm25_scorer()
    assert maxscore is not None and taat is not None

    for seed in range(5):
        rng = np.random.default_rng(seed)
        n_docs, vocab = 400, 50
        docs = [
            " ".join(f"w{(int(z) - 1) % vocab}"
                     for z in rng.zipf(1.3, rng.integers(10, 60)))
            for _ in range(n_docs // 2)
        ]
        docs = docs + docs  # duplicates -> exact score ties
        index = bm25.BM25Index.build(docs, k1=0.5, b=0.3)
        queries = [
            " ".join(f"w{(int(z) - 1) % vocab}" for z in rng.zipf(1.3, 6))
            for _ in range(16)
        ] + ["", "zzz unknown"]
        k = int(rng.integers(3, 60))
        s_ms, i_ms = index._search_batch_native(maxscore, queries, k,
                                                maxscore=True)
        s_ta, i_ta = index._search_batch_native(taat, queries, k)
        for q in range(len(queries)):
            assert i_ms[q] == i_ta[q], (seed, q)
            np.testing.assert_allclose(s_ms[q], s_ta[q], rtol=1e-6)
            s_np, i_np = index.search(queries[q], k=k)
            assert i_ms[q] == i_np, (seed, q)
            np.testing.assert_allclose(s_ms[q], s_np, rtol=1e-5)


def test_maxscore_survives_retune():
    """term_ub is (k1, b)-dependent; set_hyperparameters must invalidate
    the cache or pruning would use stale bounds (rank-UNSAFE)."""
    rng = np.random.default_rng(0)
    docs = [" ".join(f"w{rng.integers(0, 20)}" for _ in range(30))
            for _ in range(100)]
    index = bm25.BM25Index.build(docs, k1=1.2, b=0.75)
    _ = index.term_ub  # populate the cache
    index.set_hyperparameters(k1=0.5, b=0.3)
    s, i = index.search_batch(["w1 w2 w3"], k=10)
    s_np, i_np = index.search("w1 w2 w3", k=10)
    assert i[0] == i_np
    np.testing.assert_allclose(s[0], s_np, rtol=1e-5)


def test_maxscore_mt_bitwise_matches_sequential():
    """The threaded MaxScore driver must return BITWISE-identical scores,
    ids, and tie order to the sequential one (queries are independent;
    threading only changes which worker runs each). Exercised at several
    thread counts including more threads than queries."""
    from viquae_tpu.native import load_bm25_maxscore, load_bm25_maxscore_mt

    seq = load_bm25_maxscore()
    mt = load_bm25_maxscore_mt()
    assert seq is not None and mt is not None

    rng = np.random.default_rng(7)
    n_docs, vocab = 600, 80
    docs = [
        " ".join(f"w{(int(z) - 1) % vocab}"
                 for z in rng.zipf(1.3, rng.integers(10, 80)))
        for _ in range(n_docs // 2)
    ]
    docs = docs + docs  # duplicates -> exact score ties
    index = bm25.BM25Index.build(docs, k1=0.5, b=0.3)
    queries = [
        " ".join(f"w{(int(z) - 1) % vocab}" for z in rng.zipf(1.3, 6))
        for _ in range(33)
    ] + ["", "zzz unknown"]
    s_seq, i_seq = index._search_batch_native(seq, queries, 25,
                                              maxscore=True)
    for n_threads in (1, 2, 4, 64):
        s_mt, i_mt = index._search_batch_native(
            mt, queries, 25, maxscore=True, n_threads=n_threads)
        assert i_mt == i_seq, n_threads
        for q in range(len(queries)):
            np.testing.assert_array_equal(
                np.asarray(s_mt[q], np.float32),
                np.asarray(s_seq[q], np.float32))


def test_search_batch_n_threads_kwarg():
    """The public search_batch honors n_threads and matches the default
    path exactly."""
    rng = np.random.default_rng(11)
    docs = [" ".join(f"w{rng.integers(0, 30)}" for _ in range(25))
            for _ in range(150)]
    index = bm25.BM25Index.build(docs, k1=0.5, b=0.3)
    queries = ["w1 w2 w3", "w4 w5", "w6"]
    s_a, i_a = index.search_batch(queries, k=10)
    s_b, i_b = index.search_batch(queries, k=10, n_threads=4)
    assert i_a == i_b
    for q in range(len(queries)):
        np.testing.assert_array_equal(
            np.asarray(s_a[q], np.float32), np.asarray(s_b[q], np.float32))


def test_term_ub_with_trailing_empty_terms():
    """The MaxScore upper bound must cover EVERY posting of the last
    non-empty term even when higher term ids have empty postings —
    reduceat with clipped starts chopped the last posting (an
    UNDERestimated bound = rank-unsafe pruning)."""
    from viquae_tpu.ops.bm25 import BM25Index

    # doc0="a b", doc1="a b b b" and an unused vocab entry 'zzz' appended
    # manually: build() only creates used terms, so craft the CSR directly
    idx = BM25Index.build(["a b", "a b b b"])
    vocab = dict(idx.vocab)
    vocab["zzz"] = len(vocab)
    vocab["zzz2"] = len(vocab)
    import numpy as np

    offsets = np.concatenate([idx.offsets,
                              [idx.offsets[-1], idx.offsets[-1]]])
    idx2 = BM25Index(vocab, offsets, idx.docs, idx.tfs, idx.doc_len,
                     idx.n_docs, idx.k1, idx.b)
    ub, ub2 = idx.term_ub, idx2.term_ub[: len(idx.term_ub)]
    np.testing.assert_allclose(ub2, ub, rtol=1e-6)
    assert (idx2.term_ub[len(idx.term_ub):] == 0).all()
    # the bound is genuinely an upper bound per term: 'b' has tf=3 in doc1
    b_tid = idx.vocab["b"]
    contrib_max = max(
        tf / (tf + idx.norm[d])
        for d, tf in zip(idx.docs[idx.offsets[b_tid]:idx.offsets[b_tid+1]],
                         idx.tfs[idx.offsets[b_tid]:idx.offsets[b_tid+1]])
    )
    assert idx.term_ub[b_tid] == np.float32(idx.idf[b_tid] * contrib_max)


def test_empty_index_search():
    from viquae_tpu.ops.bm25 import BM25Index

    idx = BM25Index.build([])
    assert idx.search("anything", k=5) == ([], [])
    s, i = idx.search_batch(["a", "b"], k=3)
    assert s == [[], []] and i == [[], []]
