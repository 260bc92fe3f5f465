"""Measure the exact-selection stages of ops.mips.topk_global at bench
scale (1280 x 1.5M bf16) and try variants to shave the selection overhead.
KB is pre-padded to a multiple of 128 rows (one device copy).
"""
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

    Q, NV, D, K = 1280, 1_500_000, 768, 100
    SEG = 128
    N = NV + ((-NV) % SEG)          # 1,500,032: already 128-aligned
    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (N, D), jnp.bfloat16) / np.sqrt(D)
    q = jax.random.normal(jax.random.fold_in(key, 2), (Q, D), jnp.bfloat16)
    n_seg = N // SEG

    def timeit(name, fn, *args, reps=5):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", file=sys.stderr)
        return out

    @jax.jit
    def matmul_rowmax(q, kb):
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return s.max(axis=1)

    @jax.jit
    def matmul_segmax(q, kb):
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return s.reshape(Q, n_seg, SEG).max(axis=2)

    @jax.jit
    def current_exact(q, kb):
        return mips.topk_global(q, kb, K, valid_rows=jnp.int32(NV),
                                compute_dtype=jnp.bfloat16)

    def variant(final_tie_sort, bf16_cand):
        @jax.jit
        def fn(q, kb):
            s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            col = jax.lax.broadcasted_iota(jnp.int32, (Q, N), 1)
            s = jnp.where(col < NV, s, jnp.asarray(-1e30, s.dtype))
            seg = s.reshape(Q, n_seg, SEG)
            seg_max = seg.max(axis=2)
            _, seg_idx = mips._select_topk(seg_max.astype(jnp.float32), K, "fast")
            cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
            cand = cand.reshape(Q, K * SEG)
            if not bf16_cand:
                cand = cand.astype(jnp.float32)
            cand_idx = (seg_idx[:, :, None] * SEG
                        + jax.lax.broadcasted_iota(jnp.int32, (Q, K, SEG), 2)
                        ).reshape(Q, K * SEG)
            top_scores, pos = jax.lax.top_k(cand, K)
            top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            if final_tie_sort:
                neg, top_idx = jax.lax.sort(
                    (-top_scores.astype(jnp.float32), top_idx),
                    dimension=-1, num_keys=2)
                return -neg, top_idx
            return top_scores.astype(jnp.float32), top_idx
        return fn

    timeit("matmul+rowmax (no select)", matmul_rowmax, q, kb)
    timeit("matmul+segmax", matmul_segmax, q, kb)
    out_cur = timeit("current exact (prepadded kb)", current_exact, q, kb)
    out_b16 = timeit("exact bf16-cand", variant(True, True), q, kb)
    timeit("exact f32-cand no tie sort", variant(False, False), q, kb)
    timeit("exact bf16-cand no tie sort", variant(False, True), q, kb)

    a = np.asarray(out_cur[1]); b = np.asarray(out_b16[1])
    same = np.mean([len(set(a[i]) & set(b[i])) / K for i in range(Q)])
    print(f"bf16-cand set agreement: {same:.4f}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
