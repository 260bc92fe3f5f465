"""Why is the integrated DeviceBM25 13x slower per block than the v2
experiment's fused block (1005 ms vs 77 ms)? Decompose: host planning,
per-block upload/pull overhead, and the compiled block itself (timed with
v2's methodology: 5 reps, one sync)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 1_500_000
K = 100


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viquae_tpu.ops import bm25 as bm25_lib
    from viquae_tpu.ops import bm25_device

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache",
                         f"bm25_{N_DOCS}_v400000")
    index = bm25_lib.BM25Index.load(cache)
    t0 = time.time()
    dev = bm25_device.DeviceBM25(index)
    print(f"build {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(3)
    queries = [" ".join(f"t{(z - 1) % 400_000}" for z in rng.zipf(1.2, 8))
               for _ in range(1280)]

    t0 = time.time()
    plan, overflow = dev._plan(queries)
    print(f"_plan 1280 queries: {(time.time()-t0)*1e3:.0f} ms, "
          f"overflow={len(overflow)}", file=sys.stderr)

    head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
    lo, hi = 0, dev.q_block
    args_up = (
        jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
        jnp.asarray(ms[0]), jnp.asarray(ml[0]), jnp.asarray(mr[0]),
        jnp.asarray(mq[0]), jnp.asarray(ss[0]), jnp.asarray(sl[0]),
        jnp.asarray(sr[0]), jnp.asarray(sq[0]))
    sync(args_up)

    fn = bm25_device._bm25_block

    def block():
        return fn(dev.head_dense, dev.tail_docs, dev.tail_w, *args_up,
                  k=K, l_mid=dev.l_mid, l_small=dev.l_small,
                  n_docs=index.n_docs)

    out = block()
    sync(out)
    t0 = time.time()
    for _ in range(5):
        out = block()
    sync(out)
    print(f"block, pipelined x5: {(time.time()-t0)/5*1e3:.1f} ms",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(5):
        s, i = block()
        np.asarray(s), np.asarray(i)
    print(f"block, synced pulls: {(time.time()-t0)/5*1e3:.1f} ms",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(5):
        up = (jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
              jnp.asarray(ms[0]), jnp.asarray(ml[0]), jnp.asarray(mr[0]),
              jnp.asarray(mq[0]), jnp.asarray(ss[0]), jnp.asarray(sl[0]),
              jnp.asarray(sr[0]), jnp.asarray(sq[0]))
        s, i = fn(dev.head_dense, dev.tail_docs, dev.tail_w, *up,
                  k=K, l_mid=dev.l_mid, l_small=dev.l_small,
                  n_docs=index.n_docs)
        np.asarray(s), np.asarray(i)
    print(f"block, upload+pull per rep (production shape): "
          f"{(time.time()-t0)/5*1e3:.1f} ms", file=sys.stderr)

    t0 = time.time()
    s_b, i_b = dev.search_batch(queries[:128], k=K)
    print(f"search_batch 128: {(time.time()-t0)*1e3:.1f} ms",
          file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
