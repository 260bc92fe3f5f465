"""Test: is the prod tail-scatter slow because XLA fuses the pool
gather+mask computation INTO the scatter op?

exp_bm25_scatter_layout measured scatter+select at 85 ms when the
scatter operands are literal device arrays, vs ~162 ms (full 201 -
matmul/gather/floor ~39) when they are computed in-program
(exp_bm25_block_decomp). Same lanes, same accumulator. If operand
fusion is the mechanism, a `lax.optimization_barrier` between the pool
gather and the scatter should recover most of the gap at zero cost.

Variants over the REAL index/plan (q_block=512, 1.5M docs, k=100):
  prod       current _bm25_block                         [control]
  barrier    optimization_barrier on (ids, vals) pre-scatter
  barrier1d  barrier + lanes flattened to 1D
  prefed     gathered arrays fed as inputs (upper bound)
Plus e2e throughput of the best variant vs prod on 1280 queries.
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
from viquae_tpu.ops import mips  # noqa: E402
from viquae_tpu.ops.bm25_device import DeviceBM25  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    n_docs = int(os.environ.get("N_DOCS", "1500000"))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"bm25_{n_docs}_v400000")
    index = bm25_lib.BM25Index.load(cache)
    t0 = time.time()
    dev = DeviceBM25(index, q_block=512)
    print(f"build {time.time()-t0:.0f}s", flush=True)
    k = 100
    l_mid, l_small = dev.l_mid, dev.l_small
    n = index.n_docs

    rng = np.random.default_rng(3)
    queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}" for z in rng.zipf(1.2, 8))
        for _ in range(1280)
    ]
    plan, overflow = dev._plan(queries[:512])
    head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
    args = [jax.device_put(jnp.asarray(a)) for a in
            (head_w.astype(np.float32), ms[0], ml[0], mr[0], mq[0],
             ss[0], sl[0], sr[0], sq[0])]
    args[0] = args[0].astype(jnp.bfloat16)
    sync(args[0])
    hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq = args

    def head(head_w):
        return jax.lax.dot_general(
            head_w, dev.head_dense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def pool(starts, lens, qtf, cap):
        def one(start):
            return (jax.lax.dynamic_slice(dev.tail_docs, (start,), (cap,)),
                    jax.lax.dynamic_slice(dev.tail_w, (start,), (cap,)))
        g_docs, g_w = jax.vmap(one)(starts)
        pos = jnp.arange(cap, dtype=jnp.int32)
        mask = pos < lens[:, None]
        g_docs = jnp.where(mask, g_docs, n)
        g_w = jnp.where(mask, g_w.astype(jnp.float32) * qtf[:, None], 0.0)
        return g_docs, g_w

    @jax.jit
    def prod(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq):
        scores = head(hw)
        im, vm = pool(Ms, Ml, Mq, l_mid)
        isl, vs = pool(Ss, Sl, Sq, l_small)
        scores = scores.at[Mr[:, None], im].add(vm)
        scores = scores.at[Sr[:, None], isl].add(vs)
        return mips._select_topk(scores, k, "fast")

    @jax.jit
    def barrier(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq):
        scores = head(hw)
        im, vm = pool(Ms, Ml, Mq, l_mid)
        isl, vs = pool(Ss, Sl, Sq, l_small)
        im, vm, isl, vs = jax.lax.optimization_barrier((im, vm, isl, vs))
        scores = scores.at[Mr[:, None], im].add(vm)
        scores = scores.at[Sr[:, None], isl].add(vs)
        return mips._select_topk(scores, k, "fast")

    @jax.jit
    def barrier1d(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq):
        scores = head(hw)
        im, vm = pool(Ms, Ml, Mq, l_mid)
        isl, vs = pool(Ss, Sl, Sq, l_small)
        im, vm, isl, vs = jax.lax.optimization_barrier((im, vm, isl, vs))
        rm = jnp.broadcast_to(Mr[:, None], im.shape)
        rs = jnp.broadcast_to(Sr[:, None], isl.shape)
        ids = jnp.concatenate([im.ravel(), isl.ravel()])
        rows = jnp.concatenate([rm.ravel(), rs.ravel()])
        vals = jnp.concatenate([vm.ravel(), vs.ravel()])
        scores = scores.at[rows, ids].add(vals)
        return mips._select_topk(scores, k, "fast")

    @jax.jit
    def gather_only(Ms, Ml, Mq, Ss, Sl, Sq):
        im, vm = pool(Ms, Ml, Mq, l_mid)
        isl, vs = pool(Ss, Sl, Sq, l_small)
        return im, vm, isl, vs

    @jax.jit
    def prefed(hw, im, vm, isl, vs, Mr, Sr):
        scores = head(hw)
        scores = scores.at[Mr[:, None], im].add(vm)
        scores = scores.at[Sr[:, None], isl].add(vs)
        return mips._select_topk(scores, k, "fast")

    g = gather_only(Ms, Ml, Mq, Ss, Sl, Sq)
    jax.block_until_ready(g)
    calls = {
        "prod": lambda: prod(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq),
        "barrier": lambda: barrier(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq),
        "barrier1d": lambda: barrier1d(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq),
        "prefed": lambda: prefed(hw, g[0], g[1], g[2], g[3], Mr, Sr),
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
        print(f"{name:10s}: best {min(times):7.1f} ms  all "
              f"{['%.0f' % t for t in times]}", flush=True)

    # correctness: barrier variants bitwise vs prod
    ref = prod(hw, Ms, Ml, Mr, Mq, Ss, Sl, Sr, Sq)
    for name in ("barrier", "barrier1d"):
        out = calls[name]()
        s_eq = bool(jnp.all(ref[0] == out[0]))
        i_eq = bool(jnp.all(ref[1] == out[1]))
        print(f"{name} vs prod: scores_eq={s_eq} ids_eq={i_eq}", flush=True)


if __name__ == "__main__":
    main()
