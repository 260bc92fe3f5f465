"""Decompose the DeviceBM25 512-query block (~231 ms at 2,211 q/s e2e)
into its component costs on the real chip, interleaved in one process
(chip-state variance — CLAUDE.md round-4).

Variants (each its OWN jitted program at the same shapes):
  full        head matmul + pool gather + 2D scatter + select   (= prod)
  no_tail     head matmul + select                    -> select cost
  head_only   head matmul + rowmax                    -> matmul+write cost
  no_select   head matmul + gather + scatter + rowmax -> scatter cost
  gather_only head matmul + gather + lane-sum + rowmax (no scatter)
  floor       rowsum of head_w (dispatch+sync floor)

Plan arrays are DEVICE-PUT BEFORE the timing loop (uploads serialize
with compute over the tunnel — round-2 pitfall); the upload cost is then
timed separately so the e2e number decomposes fully.
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viquae_tpu.ops import bm25 as bm25_lib  # noqa: E402
from viquae_tpu.ops import mips  # noqa: E402
from viquae_tpu.ops.bm25_device import DeviceBM25  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def make_variants(dev, k):
    l_mid, l_small, n_docs = dev.l_mid, dev.l_small, dev.index.n_docs

    def head(head_dense, head_w):
        return jax.lax.dot_general(
            head_w, head_dense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def pools(tail_docs, tail_w, ms, ml, mq, ss, sl, sq):
        trash = n_docs

        def pool(starts, lens, qtf, cap):
            def one(start):
                return (jax.lax.dynamic_slice(tail_docs, (start,), (cap,)),
                        jax.lax.dynamic_slice(tail_w, (start,), (cap,)))
            g_docs, g_w = jax.vmap(one)(starts)
            pos = jnp.arange(cap, dtype=jnp.int32)
            mask = pos < lens[:, None]
            g_docs = jnp.where(mask, g_docs, trash)
            g_w = jnp.where(mask, g_w.astype(jnp.float32) * qtf[:, None], 0.0)
            return g_docs, g_w

        return pool(ms, ml, mq, l_mid), pool(ss, sl, sq, l_small)

    @jax.jit
    def full(head_dense, tail_docs, tail_w, head_w,
             ms, ml, mr, mq, ss, sl, sr, sq):
        scores = head(head_dense, head_w)
        (im, vm), (s_i, s_v) = pools(tail_docs, tail_w,
                                     ms, ml, mq, ss, sl, sq)
        scores = scores.at[mr[:, None], im].add(vm)
        scores = scores.at[sr[:, None], s_i].add(s_v)
        return mips._select_topk(scores, k, "fast")

    @jax.jit
    def no_tail(head_dense, head_w):
        return mips._select_topk(head(head_dense, head_w), k, "fast")

    @jax.jit
    def head_only(head_dense, head_w):
        return head(head_dense, head_w).max(axis=1)

    @jax.jit
    def no_select(head_dense, tail_docs, tail_w, head_w,
                  ms, ml, mr, mq, ss, sl, sr, sq):
        scores = head(head_dense, head_w)
        (im, vm), (s_i, s_v) = pools(tail_docs, tail_w,
                                     ms, ml, mq, ss, sl, sq)
        scores = scores.at[mr[:, None], im].add(vm)
        scores = scores.at[sr[:, None], s_i].add(s_v)
        return scores.max(axis=1)

    @jax.jit
    def gather_only(head_dense, tail_docs, tail_w, head_w,
                    ms, ml, mr, mq, ss, sl, sr, sq):
        scores = head(head_dense, head_w)
        (im, vm), (s_i, s_v) = pools(tail_docs, tail_w,
                                     ms, ml, mq, ss, sl, sq)
        # consume gathers without a scatter: lane-sums folded into row 0
        tot = (vm.sum() + s_v.sum()
               + (im.sum() + s_i.sum()).astype(jnp.float32) * 0.0)
        return scores.max(axis=1) + tot

    @jax.jit
    def floor(head_w):
        return head_w.sum(axis=1)

    return {"full": full, "no_tail": no_tail, "head_only": head_only,
            "no_select": no_select, "gather_only": gather_only,
            "floor": floor}


def main():
    n_docs = int(os.environ.get("N_DOCS", "1500000"))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"bm25_{n_docs}_v400000")
    index = bm25_lib.BM25Index.load(cache)
    print(f"index: {index.n_docs} docs, {len(index.docs)} postings",
          flush=True)
    t0 = time.time()
    dev = DeviceBM25(index, q_block=512)
    print(f"device build {time.time()-t0:.0f}s l_mid={dev.l_mid} "
          f"pools=({dev.pool_mid},{dev.pool_small})", flush=True)

    rng = np.random.default_rng(3)
    queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}" for z in rng.zipf(1.2, 8))
        for _ in range(512)
    ]
    plan, overflow = dev._plan(queries)
    print(f"overflow {len(overflow)}/512", flush=True)
    head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
    args = dict(
        head_w=jax.device_put(jnp.asarray(head_w.astype(jnp.bfloat16))),
        ms=jax.device_put(jnp.asarray(ms[0])),
        ml=jax.device_put(jnp.asarray(ml[0])),
        mr=jax.device_put(jnp.asarray(mr[0])),
        mq=jax.device_put(jnp.asarray(mq[0])),
        ss=jax.device_put(jnp.asarray(ss[0])),
        sl=jax.device_put(jnp.asarray(sl[0])),
        sr=jax.device_put(jnp.asarray(sr[0])),
        sq=jax.device_put(jnp.asarray(sq[0])))
    sync(args["head_w"])

    k = 100
    fns = make_variants(dev, k)
    calls = {
        "full": lambda: fns["full"](
            dev.head_dense, dev.tail_docs, dev.tail_w, args["head_w"],
            args["ms"], args["ml"], args["mr"], args["mq"],
            args["ss"], args["sl"], args["sr"], args["sq"]),
        "no_tail": lambda: fns["no_tail"](dev.head_dense, args["head_w"]),
        "head_only": lambda: fns["head_only"](dev.head_dense,
                                              args["head_w"]),
        "no_select": lambda: fns["no_select"](
            dev.head_dense, dev.tail_docs, dev.tail_w, args["head_w"],
            args["ms"], args["ml"], args["mr"], args["mq"],
            args["ss"], args["sl"], args["sr"], args["sq"]),
        "gather_only": lambda: fns["gather_only"](
            dev.head_dense, dev.tail_docs, dev.tail_w, args["head_w"],
            args["ms"], args["ml"], args["mr"], args["mq"],
            args["ss"], args["sl"], args["sr"], args["sq"]),
        "floor": lambda: fns["floor"](args["head_w"]),
    }
    for name, call in calls.items():
        t0 = time.time()
        sync(call())
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    results = {name: [] for name in calls}
    for rep in range(5):
        for name, call in calls.items():
            t0 = time.time()
            sync(call())
            results[name].append((time.time() - t0) * 1e3)
    for name, times in results.items():
        best = min(times)
        print(f"{name:12s}: best {best:7.1f} ms  all "
              f"{['%.0f' % t for t in times]}", flush=True)

    # upload cost of one block's plan arrays (what search_batch pays
    # per block on top of the compute above)
    up = []
    for rep in range(5):
        t0 = time.time()
        xs = [jnp.asarray(head_w.astype(jnp.bfloat16)),
              jnp.asarray(ms[0]), jnp.asarray(ml[0]), jnp.asarray(mr[0]),
              jnp.asarray(mq[0]), jnp.asarray(ss[0]), jnp.asarray(sl[0]),
              jnp.asarray(sr[0]), jnp.asarray(sq[0])]
        for x in xs:
            jax.block_until_ready(x)
        sync(xs[0])
        up.append((time.time() - t0) * 1e3)
    nbytes = sum(int(np.asarray(a).nbytes) for a in
                 (head_w.astype(np.float16), ms[0], ml[0], mr[0], mq[0],
                  ss[0], sl[0], sr[0], sq[0]))
    print(f"plan upload: best {min(up):.1f} ms for {nbytes/1e6:.2f} MB "
          f"all {['%.0f' % t for t in up]}", flush=True)

    # e2e reference (prod path, same process)
    queries_full = [
        " ".join(f"t{(int(z) - 1) % 400_000}" for z in rng.zipf(1.2, 8))
        for _ in range(1280)
    ]
    dev.search_batch_device(queries_full[:512], k=100)  # warm prod fn
    for rep in range(3):
        t0 = time.time()
        out = dev.search_batch_device(queries_full, k=100)
        sync(out)
        dt = time.time() - t0
        print(f"prod e2e: {len(queries_full)/dt:.0f} q/s "
              f"({dt*1e3:.0f} ms, overflow {dev.last_overflow})",
              flush=True)


if __name__ == "__main__":
    main()
