"""Production DeviceBM25 at bench scale (1.5M docs / 400k vocab Zipf).

Validates the integrated class (ops/bm25_device.py) against the take-2
experiment numbers (77 ms / 128-query block -> ~1.6k q/s) and measures
retrieval agreement vs the exact host MaxScore scorer.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 1_500_000
N_QUERIES = 1280
K = 100


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from viquae_tpu.ops import bm25 as bm25_lib
    from viquae_tpu.ops.bm25_device import DeviceBM25

    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache",
                         f"bm25_{N_DOCS}_v400000")
    t0 = time.time()
    if os.path.exists(cache):
        index = bm25_lib.BM25Index.load(cache)
        print(f"loaded host index in {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        index = bm25_lib.synth_zipf_index(N_DOCS)
        print(f"synthesized host index in {time.time()-t0:.1f}s",
              file=sys.stderr)

    t0 = time.time()
    dev = DeviceBM25(index)
    print(f"DeviceBM25 build (weights+upload+head scatter): "
          f"{time.time()-t0:.1f}s  l_mid={dev.l_mid}", file=sys.stderr)

    rng = np.random.default_rng(3)
    queries = [" ".join(f"t{(z - 1) % 400_000}"
                        for z in rng.zipf(1.2, 8))
               for _ in range(N_QUERIES)]

    # warmup (compile)
    t0 = time.time()
    dev.search_batch(queries[:128], k=K)
    print(f"warmup block (compile): {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    d_scores, d_ids = dev.search_batch(queries, k=K)
    dt = time.time() - t0
    print(f"device: {N_QUERIES} queries in {dt:.2f}s = "
          f"{N_QUERIES/dt:.0f} q/s", file=sys.stderr)

    # host baseline on a subset (387 q/s -> 128 queries ~ 0.4s)
    t0 = time.time()
    h_scores, h_ids = index.search_batch(queries[:128], k=K)
    hdt = time.time() - t0
    print(f"host MaxScore: 128 queries in {hdt:.2f}s = "
          f"{128/hdt:.0f} q/s", file=sys.stderr)

    # agreement: R@100 overlap + near-tie diagnosis at the boundary
    overlaps = []
    for q in range(128):
        d, h = set(d_ids[q]), set(h_ids[q])
        if h:
            overlaps.append(len(d & h) / len(h))
    print(f"R@{K} overlap vs exact host: mean "
          f"{np.mean(overlaps):.4f} min {np.min(overlaps):.4f}",
          file=sys.stderr)
    # how many of the misses are bf16 boundary ties?
    q_bad = int(np.argmin(overlaps))
    d, h = d_ids[q_bad], h_ids[q_bad]
    kth = h_scores[q_bad][-1]
    missed = [s for s, i in zip(h_scores[q_bad], h)
              if i not in set(d)]
    near = sum(1 for s in missed if abs(s - kth) <= 2e-2 * kth + 1e-3)
    print(f"worst query: {len(missed)} missed, {near} within bf16 of the "
          f"kth score {kth:.4f}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
