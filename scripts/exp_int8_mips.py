"""Prototype int8 MIPS v2: global-scale symmetric int8 KB, int8 x int8
MXU matmul with bf16 score epilogue (avoids the 7.7GB int32 score OOM),
exact and approx selection. Measures time + recall vs the bf16 path.
Runs bf16 reference FIRST, frees it, then the int8 variants.
"""
import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viquae_tpu.ops import mips

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    Q, NV, D, K, SEG = 1280, 1_500_000, 768, 100, 128
    N = NV + ((-NV) % SEG)
    rng = np.random.default_rng(0)
    kb_host = (rng.standard_normal((N, D)) / np.sqrt(D)).astype(np.float32)
    q_host = rng.standard_normal((Q, D)).astype(np.float32)
    q = jnp.asarray(q_host, jnp.bfloat16)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", file=sys.stderr)
        return out

    # ---- bf16 reference ---------------------------------------------------
    kb = jnp.asarray(kb_host, jnp.bfloat16)

    @jax.jit
    def bf16_exact(q, kb):
        return mips.topk_global(q, kb, K, valid_rows=jnp.int32(NV),
                                compute_dtype=jnp.bfloat16)

    out_bf = timeit("bf16 exact (current)", bf16_exact, q, kb)
    idx_bf = np.asarray(out_bf[1])
    del kb, out_bf
    gc.collect()

    # ---- int8 variants ----------------------------------------------------
    s_kb = np.abs(kb_host).max() / 127.0
    kb_i8 = jnp.asarray(np.clip(np.round(kb_host / s_kb), -127, 127), jnp.int8)
    n_seg = N // SEG

    def quantize_q(q):
        qs = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=1,
                     keepdims=True) / 127.0
        q_i8 = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127
                        ).astype(jnp.int8)
        return q_i8, qs

    @jax.jit
    def int8_exact(q, kb_i8):
        q_i8, qs = quantize_q(q)
        scores = jax.lax.dot_general(
            q_i8, kb_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16)
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, N), 1)
        scores = jnp.where(col < NV, scores, jnp.asarray(-1e30, scores.dtype))
        seg = scores.reshape(Q, n_seg, SEG)
        seg_max = seg.max(axis=2)
        _, seg_idx = mips._select_topk(seg_max.astype(jnp.float32), K, "fast")
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q, K * SEG).astype(jnp.float32)
        cand_idx = (seg_idx[:, :, None] * SEG
                    + jax.lax.broadcasted_iota(jnp.int32, (Q, K, SEG), 2)
                    ).reshape(Q, K * SEG)
        top_scores, pos = jax.lax.top_k(cand, K)
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        neg, top_idx = jax.lax.sort((-top_scores, top_idx), dimension=-1,
                                    num_keys=2)
        return (-neg) * qs * s_kb, top_idx

    @jax.jit
    def int8_approx(q, kb_i8):
        q_i8, qs = quantize_q(q)
        scores = jax.lax.dot_general(
            q_i8, kb_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16)
        col = jax.lax.broadcasted_iota(jnp.int32, (Q, N), 1)
        scores = jnp.where(col < NV, scores, jnp.asarray(-1e30, scores.dtype))
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, K, recall_target=0.99, aggregate_to_topk=True)
        neg, top_idx = jax.lax.sort(
            (-top_scores.astype(jnp.float32), top_idx), dimension=-1,
            num_keys=2)
        return (-neg) * qs * s_kb, top_idx

    out_i8 = timeit("int8 exact-select", int8_exact, q, kb_i8)
    out_ia = timeit("int8 approx-select", int8_approx, q, kb_i8)

    idx_i8 = np.asarray(out_i8[1])
    idx_ia = np.asarray(out_ia[1])
    for name, idx in (("int8-exact", idx_i8), ("int8-approx", idx_ia)):
        r100 = np.mean([len(set(idx_bf[i]) & set(idx[i])) / K for i in range(Q)])
        r20 = np.mean([len(set(idx_bf[i][:20]) & set(idx[i][:20])) / 20
                       for i in range(Q)])
        print(f"{name} vs bf16-exact: R@100 {r100:.4f}  R@20 {r20:.4f}",
              file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
