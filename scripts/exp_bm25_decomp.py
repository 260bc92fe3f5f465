"""Where do DeviceBM25's e2e milliseconds go at q_block=512, 1.5M docs?

Measured split-slot e2e is 2,211 q/s (579 ms / 1280 queries) but the
block cost model (scatter lanes + head matmul + selection) predicts
~210 ms. Suspects: host planning per call, per-block arg uploads
serializing with compute over the tunneled link (CLAUDE.md round-2:
uploads queue behind dispatched steps), and the block pad (1280 -> 1536).

Stages measured interleaved:
  plan        — host-only _plan on 1280 queries
  compute     — blocks with args PRE-UPLOADED (device_put before timing)
  e2e         — search_batch_device as the bench calls it
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
from viquae_tpu.ops.bm25_device import DeviceBM25, _bm25_block  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    n_docs = 1_500_000
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"bm25_{n_docs}_v400000")
    index = bm25_lib.BM25Index.load(cache)
    rng = np.random.default_rng(3)
    queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}" for z in rng.zipf(1.2, 8))
        for _ in range(1280)
    ]
    dev = DeviceBM25(index, q_block=512)
    print(f"l_mid={dev.l_mid} pools=({dev.pool_mid},{dev.pool_small})",
          flush=True)

    # --- plan cost (host only) ---
    t0 = time.time()
    plan, overflow = dev._plan(queries)
    plan_ms = (time.time() - t0) * 1e3
    t0 = time.time()
    plan, overflow = dev._plan(queries)
    plan_ms = min(plan_ms, (time.time() - t0) * 1e3)
    print(f"plan: {plan_ms:.0f} ms (overflow {len(overflow)})", flush=True)

    head_w, ms_, ml, mr, mq, ss, sl, sr, sq = plan
    qb = dev.q_block
    k = 100

    # --- pre-uploaded compute ---
    blocks = []
    for blk, lo in enumerate(range(0, head_w.shape[0], qb)):
        hi = lo + qb
        blocks.append(tuple(jax.device_put(a) for a in (
            jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
            jnp.asarray(ms_[blk]), jnp.asarray(ml[blk]),
            jnp.asarray(mr[blk]), jnp.asarray(mq[blk]),
            jnp.asarray(ss[blk]), jnp.asarray(sl[blk]),
            jnp.asarray(sr[blk]), jnp.asarray(sq[blk]))))
    n_blocks = len(blocks)

    def run_blocks():
        outs = []
        for args in blocks:
            outs.append(_bm25_block(
                dev.head_dense, dev.tail_docs, dev.tail_w, *args,
                k=k, l_mid=dev.l_mid, l_small=dev.l_small,
                n_docs=index.n_docs))
        return outs

    outs = run_blocks()
    sync(outs[-1])
    for rep in range(3):
        t0 = time.time()
        outs = run_blocks()
        sync(outs[-1])
        dt = (time.time() - t0) * 1e3
        print(f"compute (pre-uploaded, {n_blocks} blocks): {dt:.0f} ms "
              f"({dt / n_blocks:.0f} ms/block, "
              f"{1280 / dt * 1e3:.0f} q/s-equivalent)", flush=True)

    # --- e2e as the bench calls it ---
    out = dev.search_batch_device(queries, k=k)
    sync(out)
    for rep in range(3):
        t0 = time.time()
        out = dev.search_batch_device(queries, k=k)
        sync(out)
        dt = (time.time() - t0) * 1e3
        print(f"e2e search_batch_device: {dt:.0f} ms "
              f"({1280 / dt * 1e3:.0f} q/s)", flush=True)

    # --- one block, decomposed variants (compile each, then time) ---
    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def head_only(head_dense, head_w, *, k):
        scores = jax.lax.dot_general(
            head_w, head_dense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        from viquae_tpu.ops import mips
        return mips._select_topk(scores, k, "fast")

    args0 = blocks[0]
    o = head_only(dev.head_dense, args0[0], k=k)
    sync(o)
    t0 = time.time()
    for _ in range(3):
        o = head_only(dev.head_dense, args0[0], k=k)
    sync(o)
    print(f"head matmul + select only: {(time.time()-t0)/3*1e3:.0f} "
          "ms/block", flush=True)

    o = _bm25_block(dev.head_dense, dev.tail_docs, dev.tail_w, *args0,
                    k=k, l_mid=dev.l_mid, l_small=dev.l_small,
                    n_docs=index.n_docs)
    sync(o)
    t0 = time.time()
    for _ in range(3):
        o = _bm25_block(dev.head_dense, dev.tail_docs, dev.tail_w, *args0,
                        k=k, l_mid=dev.l_mid, l_small=dev.l_small,
                        n_docs=index.n_docs)
    sync(o)
    print(f"full block: {(time.time()-t0)/3*1e3:.0f} ms/block", flush=True)


if __name__ == "__main__":
    main()
