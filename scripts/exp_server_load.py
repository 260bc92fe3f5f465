"""Online serving under concurrency: request-level latency/throughput of the
dynamic micro-batching runtime (ir/server.py) over the full-scale program
(DPR-base packed embed + exact search over 1.5M x 768, one chip).

Closed-loop load: C client threads each issue R sequential requests to the
BatchedRetrievalService (no HTTP, measuring the batcher + device path; the
stdlib HTTP layer adds ~connection overhead, measured separately at one
level). Reports per-request p50/p99 latency and aggregate q/s per
concurrency level.

Run: python scripts/exp_server_load.py   (one TPU process at a time)
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    deadline = threading.Timer(600, lambda: (
        print("backend init exceeded 600s; exiting", file=sys.stderr),
        os._exit(3)))
    deadline.daemon = True
    deadline.start()
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()
    deadline.cancel()
    import jax.numpy as jnp

    from transformers import BertTokenizerFast

    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.serving import FusedRetrievalPipeline
    from viquae_tpu.ir.server import BatchedRetrievalService
    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    N, D, K = 1_500_000, 768, 100
    MAX_BATCH = 256
    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (N, D), jnp.bfloat16)
    kb = kb / np.sqrt(D)
    sync(kb)
    # device-resident bf16 KB without a 2.3GB host roundtrip (the
    # serve_bench.py trick: swap the matrix into a tiny index shell)
    index = mips.DenseIndex(np.zeros((1, D), np.float32), mode="global")
    index.matrix, index.n = kb, N
    index.dtype = jnp.bfloat16

    # local WordPiece vocab (no network)
    import tempfile

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(2000)
    ]
    tmp = tempfile.mkdtemp()
    with open(f"{tmp}/vocab.txt", "w") as f:
        f.write("\n".join(vocab))
    tokenizer = BertTokenizerFast(vocab_file=f"{tmp}/vocab.txt")

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.fold_in(key, 2), cfg))
    # ~18 tokens/query x 256 queries ~= 72 rows of 64; pin with headroom
    embedder = PackedTextEmbedder(
        dpr.make_packed_apply(cfg), params, tokenizer, row_len=64,
        batch_size=MAX_BATCH, fixed_rows=96,
    )
    pipeline = FusedRetrievalPipeline(
        embedder, index, batch_size=MAX_BATCH, k=K)

    rng = np.random.default_rng(0)

    def make_query():
        n_words = int(np.clip(rng.lognormal(np.log(14.0), 0.4), 4, 40))
        return " ".join(
            f"tok{rng.integers(0, 2000)}" for _ in range(n_words))

    queries = [make_query() for _ in range(4096)]

    # warmup: compile the padded dispatch shape once
    service = BatchedRetrievalService(pipeline, max_batch=MAX_BATCH,
                                      max_wait_ms=5.0)
    t0 = time.perf_counter()
    service.search(queries[0], timeout=1200)
    print(f"warmup (compile) {time.perf_counter() - t0:.1f}s", flush=True)
    service.search(queries[1], timeout=300)

    results = {}
    for concurrency, per_client in ((1, 8), (16, 8), (64, 8), (256, 4),
                                    (1024, 2)):
        latencies = []
        lock = threading.Lock()

        def client(cid):
            lat_local = []
            for r in range(per_client):
                q = queries[(cid * per_client + r) % len(queries)]
                t = time.perf_counter()
                service.search(q, timeout=600)
                lat_local.append(time.perf_counter() - t)
            with lock:
                latencies.extend(lat_local)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat = np.sort(np.asarray(latencies))
        row = {
            "concurrency": concurrency,
            "requests": len(lat),
            "p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
            "p99_ms": round(float(lat[int(len(lat) * 0.99)]) * 1e3, 1),
            "qps": round(len(lat) / wall, 1),
            "dispatches": service.batcher.n_dispatches,
        }
        results[concurrency] = row
        print(json.dumps(row), flush=True)

    service.close()
    print(json.dumps({"summary": results}, indent=1))


if __name__ == "__main__":
    main()
