"""A/B: split-slot vs unsplit DeviceBM25 planning at bench scale.

Round-5 change (ops/bm25_device.py): terms wider than l_mid split across
consecutive slots, cutting static scatter lanes 15.1M -> 4.3M per
512-query block (host-side lane math). This measures the actual block
time and e2e throughput on the real chip, interleaved (chip-state
variance is 6-13x across minutes — CLAUDE.md round-4), plus overflow
rates. Protocol mirrors bench.py stage_hybrid's device leg.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viquae_tpu.ops import bm25 as bm25_lib  # noqa: E402
from viquae_tpu.ops.bm25_device import DeviceBM25  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    n_docs = int(os.environ.get("N_DOCS", "1500000"))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"bm25_{n_docs}_v400000")
    if os.path.exists(os.path.join(cache, "postings.npz")):
        index = bm25_lib.BM25Index.load(cache)
    else:
        print("building index...", flush=True)
        index = bm25_lib.synth_zipf_index(n_docs, vocab_size=400_000)
        try:
            index.save(cache)
        except OSError:
            pass
    print(f"index: {index.n_docs} docs, "
          f"{len(index.docs)} postings", flush=True)

    rng = np.random.default_rng(3)
    queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}" for z in rng.zipf(1.2, 8))
        for _ in range(1280)
    ]

    variants = {}
    for q_block in (512,):
        t0 = time.time()
        variants[f"split_qb{q_block}"] = DeviceBM25(index, q_block=q_block)
        print(f"split qb{q_block} build {time.time()-t0:.0f}s "
              f"l_mid={variants[f'split_qb{q_block}'].l_mid} "
              f"pools=({variants[f'split_qb{q_block}'].pool_mid},"
              f"{variants[f'split_qb{q_block}'].pool_small})", flush=True)
        t0 = time.time()
        variants[f"unsplit_qb{q_block}"] = DeviceBM25(
            index, q_block=q_block, l_small=2048, l_mid=1 << 24,
            pool_mid=128 * (q_block // 128), pool_small=320 * (q_block // 128))
        print(f"unsplit qb{q_block} build {time.time()-t0:.0f}s "
              f"l_mid={variants[f'unsplit_qb{q_block}'].l_mid}", flush=True)

    # warm (compile) each variant
    for name, dev in variants.items():
        t0 = time.time()
        dev.search_batch_device(queries[: dev.q_block], k=100)
        print(f"{name}: compile+first {time.time()-t0:.1f}s "
              f"overflow {dev.last_overflow}", flush=True)

    # interleaved A/B, 3 rounds
    results = {name: [] for name in variants}
    overflow = {}
    for rep in range(3):
        for name, dev in variants.items():
            t0 = time.time()
            out = dev.search_batch_device(queries, k=100)
            sync(out)
            dt = time.time() - t0
            results[name].append(len(queries) / dt)
            overflow[name] = dev.last_overflow
    for name, qps in results.items():
        print(f"{name}: qps {['%.0f' % q for q in qps]} best "
              f"{max(qps):.0f} overflow {overflow[name]}/{len(queries)}",
              flush=True)

    # quality: split vs unsplit top-20 overlap (should be ~1.0 — same
    # scores up to f32 summation order)
    a = variants["split_qb512"].search_batch(queries[:256], k=20)
    b = variants["unsplit_qb512"].search_batch(queries[:256], k=20)
    overlap = np.mean([
        len(set(x) & set(y)) / max(len(y), 1)
        for x, y in zip(a[1], b[1]) if y])
    print(f"split-vs-unsplit top-20 overlap: {overlap:.4f}", flush=True)


if __name__ == "__main__":
    main()
