"""BM25 at reference scale: build a 1.5M-passage synthetic corpus
(Zipf-distributed vocabulary, ~100-token passages — the shape of
`uniform_passages` output over the ViQuAE KB) and measure the C++ CSR
scorer's query throughput at the tuned b=0.3 / k1=0.5.

The corpus is synthesized directly into CSR postings (numpy) — the
string->postings build path is timed separately on a subset since it is a
one-off indexing cost, while query scoring is the serving-relevant number
(reference contract: meerqat/ir/search.py:268-293, ES BM25 behind
search_batch).

    python scripts/bm25_bench.py [--docs 1500000] [--queries 1280]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from viquae_tpu.ops import bm25 as bm25_lib  # noqa: E402


def synth_corpus_csr(rng, n_docs: int, vocab_size: int, mean_len: int = 100,
                     zipf_a: float = 1.2):
    """Zipf CSR corpus via the shared builder (ops.bm25.synth_zipf_index);
    also returns a token stream for the string-path build timing."""
    index = bm25_lib.synth_zipf_index(
        n_docs, vocab_size=vocab_size, mean_len=mean_len, zipf_a=zipf_a)
    tokens = (rng.zipf(zipf_a, 120_000).astype(np.int64) - 1) % vocab_size
    return index, tokens


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_500_000)
    ap.add_argument("--vocab", type=int, default=400_000)
    ap.add_argument("--queries", type=int, default=1280)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--build-subset", type=int, default=50_000)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    out = {}

    t0 = time.time()
    index, token_stream = synth_corpus_csr(rng, args.docs, args.vocab)
    out["synth_build_s"] = round(time.time() - t0, 2)
    out["n_docs"] = index.n_docs
    out["nnz_postings"] = int(len(index.docs))
    print(f"synth CSR build: {out['synth_build_s']}s, "
          f"{out['nnz_postings']/1e6:.1f}M postings", file=sys.stderr)

    # string-path build throughput (the one-off indexing cost), subset
    texts = []
    pos = 0
    lens = rng.poisson(100, args.build_subset).clip(20, 220)
    for L in lens:
        texts.append(" ".join(f"t{t}" for t in token_stream[pos: pos + L]))
        pos += L
    t0 = time.time()
    bm25_lib.BM25Index.build(texts, k1=0.5, b=0.3)
    dt = time.time() - t0
    out["string_build_docs_per_s"] = round(args.build_subset / dt, 1)
    print(f"string build: {out['string_build_docs_per_s']} docs/s "
          f"(~{args.docs / out['string_build_docs_per_s'] / 60:.1f} min "
          f"for {args.docs} docs)", file=sys.stderr)

    # realistic queries: ~8 terms from the same Zipf (common words included)
    q_tokens = (rng.zipf(1.2, (args.queries, 8)).astype(np.int64) - 1
                ) % args.vocab
    queries = [" ".join(f"t{t}" for t in row) for row in q_tokens]

    # native C++ scorer; the MaxScore term bounds are a one-off index
    # cost — build them before timing queries (bench.py does the same)
    t0 = time.time()
    _ = index.term_ub
    out["bound_meta_build_s"] = round(time.time() - t0, 2)
    print(f"term_ub build: {out['bound_meta_build_s']}s", file=sys.stderr)
    t0 = time.time()
    scores, idx = index.search_batch(queries, k=args.k)
    dt = time.time() - t0
    out["bm25_native_qps"] = round(args.queries / dt, 1)
    out["bm25_native_ms_per_query"] = round(dt / args.queries * 1e3, 3)
    n_hits = float(np.mean([len(s) for s in scores]))
    print(f"C++ scorer: {out['bm25_native_qps']} q/s "
          f"({out['bm25_native_ms_per_query']} ms/q, k={args.k}, "
          f"avg hits {n_hits:.0f})", file=sys.stderr)

    # numpy path on a query subset (sanity + speedup factor)
    sub = queries[:64]
    t0 = time.time()
    for q in sub:
        index.search(q, k=args.k)
    dt = time.time() - t0
    out["bm25_numpy_qps"] = round(len(sub) / dt, 1)
    print(f"numpy path: {out['bm25_numpy_qps']} q/s", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
