"""Isolate DeviceBM25 block costs at q_block=512, 1.5M docs.

exp_bm25_decomp found: full block 183 ms, head matmul + select 35 ms,
so tail gather+scatter ~148 ms over 4.29M static lanes (3.4e-5 ms/lane —
3x the round-4 per-lane cost measured at q_block=128). Variants:

  gather_only   — pools gathered + reduced (no scatter)
  scatter_only  — scatter precomputed (row,doc,val) lanes (no gather)
  full          — baseline block
  full_bf16     — bf16 score accumulator (halves scatter traffic;
                  quality checked via top-20 overlap vs f32)
  tight_pools   — pools at max-observed usage +5% instead of +40%
"""
import functools
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
from viquae_tpu.ops.bm25_device import DeviceBM25, _bm25_block  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, *args, reps=3, **kw):
    o = fn(*args, **kw)
    sync(o)
    t0 = time.time()
    for _ in range(reps):
        o = fn(*args, **kw)
    sync(o)
    return (time.time() - t0) / reps * 1e3, o


def main():
    n_docs = 1_500_000
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"bm25_{n_docs}_v400000")
    index = bm25_lib.BM25Index.load(cache)
    rng = np.random.default_rng(3)
    queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}" for z in rng.zipf(1.2, 8))
        for _ in range(512)
    ]
    k = 100

    dev = DeviceBM25(index, q_block=512)
    plan, _ = dev._plan(queries)
    head_w, ms_, ml, mr, mq, ss, sl, sr, sq = plan
    args0 = tuple(jax.device_put(a) for a in (
        jnp.asarray(head_w[:512].astype(jnp.bfloat16)),
        jnp.asarray(ms_[0]), jnp.asarray(ml[0]), jnp.asarray(mr[0]),
        jnp.asarray(mq[0]), jnp.asarray(ss[0]), jnp.asarray(sl[0]),
        jnp.asarray(sr[0]), jnp.asarray(sq[0])))
    print(f"pools ({dev.pool_mid},{dev.pool_small}) l_mid {dev.l_mid} "
          f"l_small {dev.l_small}", flush=True)

    dt, base_out = timeit(
        _bm25_block, dev.head_dense, dev.tail_docs, dev.tail_w, *args0,
        k=k, l_mid=dev.l_mid, l_small=dev.l_small, n_docs=n_docs)
    print(f"full block:        {dt:.0f} ms", flush=True)

    trash = n_docs

    @functools.partial(jax.jit, static_argnames=("l_mid", "l_small"))
    def gather_only(tail_docs, tail_w, ms, ml, mq, ss, sl, sq,
                    *, l_mid, l_small):
        def pool(starts, lens, qtf, cap):
            def one(start):
                return (jax.lax.dynamic_slice(tail_docs, (start,), (cap,)),
                        jax.lax.dynamic_slice(tail_w, (start,), (cap,)))
            g_docs, g_w = jax.vmap(one)(starts)
            pos = jnp.arange(cap, dtype=jnp.int32)
            mask = pos < lens[:, None]
            g_docs = jnp.where(mask, g_docs, trash)
            g_w = jnp.where(mask, g_w.astype(jnp.float32) * qtf[:, None],
                            0.0)
            return g_docs, g_w
        im, vm = pool(ms, ml, mq, l_mid)
        is_, vs = pool(ss, sl, sq, l_small)
        # force materialization without a scatter
        return (vm.sum() + vs.sum()
                + im.astype(jnp.float32).sum() * 1e-20
                + is_.astype(jnp.float32).sum() * 1e-20)

    dt, _ = timeit(gather_only, dev.tail_docs, dev.tail_w,
                   args0[1], args0[2], args0[4], args0[5], args0[6],
                   args0[8], l_mid=dev.l_mid, l_small=dev.l_small)
    print(f"gather only:       {dt:.0f} ms", flush=True)

    # scatter-only: lanes precomputed on host as dense inputs
    p_m, cap_m = dev.pool_mid, dev.l_mid
    p_s, cap_s = dev.pool_small, dev.l_small
    rng2 = np.random.default_rng(0)
    ids_m = rng2.integers(0, n_docs, (p_m, cap_m), dtype=np.int32)
    vals_m = rng2.random((p_m, cap_m), dtype=np.float32)
    ids_s = rng2.integers(0, n_docs, (p_s, cap_s), dtype=np.int32)
    vals_s = rng2.random((p_s, cap_s), dtype=np.float32)
    d_pad = dev.d_pad

    @jax.jit
    def scatter_only(head_dense, head_w, ids_m, vals_m, mr,
                     ids_s, vals_s, sr):
        scores = jax.lax.dot_general(
            head_w, head_dense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = scores.at[mr[:, None], ids_m].add(vals_m)
        scores = scores.at[sr[:, None], ids_s].add(vals_s)
        return mips._select_topk(scores, k, "fast")

    dt, _ = timeit(scatter_only, dev.head_dense, args0[0],
                   jax.device_put(ids_m), jax.device_put(vals_m), args0[3],
                   jax.device_put(ids_s), jax.device_put(vals_s), args0[7])
    print(f"scatter+head+sel:  {dt:.0f} ms (sorted-docs full block minus "
          "gather; RANDOM ids here)", flush=True)

    # bf16 accumulator variant
    @functools.partial(jax.jit,
                       static_argnames=("k", "l_mid", "l_small", "n_docs"))
    def block_bf16(head_dense, tail_docs, tail_w, head_w,
                   ms, ml, mr, mq, ss, sl, sr, sq,
                   *, k, l_mid, l_small, n_docs):
        scores = jax.lax.dot_general(
            head_w, head_dense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16)

        def pool(starts, lens, qtf, cap):
            def one(start):
                return (jax.lax.dynamic_slice(tail_docs, (start,), (cap,)),
                        jax.lax.dynamic_slice(tail_w, (start,), (cap,)))
            g_docs, g_w = jax.vmap(one)(starts)
            pos = jnp.arange(cap, dtype=jnp.int32)
            mask = pos < lens[:, None]
            g_docs = jnp.where(mask, g_docs, n_docs)
            g_w = jnp.where(mask,
                            g_w.astype(jnp.bfloat16)
                            * qtf[:, None].astype(jnp.bfloat16), 0)
            return g_docs, g_w

        im, vm = pool(ms, ml, mq, l_mid)
        is_, vs = pool(ss, sl, sq, l_small)
        scores = scores.at[mr[:, None], im].add(vm)
        scores = scores.at[sr[:, None], is_].add(vs)
        return mips._select_topk(scores, k, "fast")

    dt, out16 = timeit(
        block_bf16, dev.head_dense, dev.tail_docs, dev.tail_w, *args0,
        k=k, l_mid=dev.l_mid, l_small=dev.l_small, n_docs=n_docs)
    i32 = np.asarray(base_out[1])
    i16 = np.asarray(out16[1])
    ov = np.mean([len(set(i32[q][:20]) & set(i16[q][:20])) / 20
                  for q in range(512)])
    print(f"bf16 accumulator:  {dt:.0f} ms (top-20 overlap vs f32 "
          f"{ov:.4f})", flush=True)

    # tight pools (max usage + 5%)
    del args0, base_out, out16
    tight = DeviceBM25(index, q_block=512, pool_mid=1408, pool_small=768)
    planT, ovf = tight._plan(queries)
    print(f"tight pools (1408,768): overflow {len(ovf)}/512", flush=True)
    hT, msT, mlT, mrT, mqT, ssT, slT, srT, sqT = planT
    argsT = tuple(jax.device_put(a) for a in (
        jnp.asarray(hT[:512].astype(jnp.bfloat16)),
        jnp.asarray(msT[0]), jnp.asarray(mlT[0]), jnp.asarray(mrT[0]),
        jnp.asarray(mqT[0]), jnp.asarray(ssT[0]), jnp.asarray(slT[0]),
        jnp.asarray(srT[0]), jnp.asarray(sqT[0])))
    dt, _ = timeit(
        _bm25_block, tight.head_dense, tight.tail_docs, tight.tail_w,
        *argsT, k=k, l_mid=tight.l_mid, l_small=tight.l_small,
        n_docs=n_docs)
    print(f"tight-pool block:  {dt:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
