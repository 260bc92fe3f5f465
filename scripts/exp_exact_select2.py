"""Decompose topk_global exact: is the (Q,N) iota/where mask or the
candidate gather the post-segmax cost?"""
import os, sys, time
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
    def segmax_select(q, kb):
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        seg = s.reshape(Q, n_seg, SEG)
        seg_max = seg.max(axis=2)
        _, seg_idx = mips._select_topk(seg_max.astype(jnp.float32), K + 1, "fast")
        return seg_idx

    @jax.jit
    def nomask_exact(q, kb):
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        seg = s.reshape(Q, n_seg, SEG)
        seg_max = seg.max(axis=2)
        P = K + 1
        _, seg_idx = mips._select_topk(seg_max.astype(jnp.float32), P, "fast")
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q, P * SEG).astype(jnp.float32)
        cand_idx = (seg_idx[:, :, None] * SEG
                    + jax.lax.broadcasted_iota(jnp.int32, (Q, P, SEG), 2)
                    ).reshape(Q, P * SEG)
        cand = jnp.where(cand_idx < NV, cand, mips.NEG_INF)  # mask candidates only
        top_scores, pos = jax.lax.top_k(cand, K)
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        neg, top_idx = jax.lax.sort((-top_scores, top_idx), dimension=-1, num_keys=2)
        return -neg, top_idx

    @jax.jit
    def current_exact(q, kb):
        return mips.topk_global(q, kb, K, valid_rows=jnp.int32(NV),
                                compute_dtype=jnp.bfloat16)

    timeit("segmax+select only", segmax_select, q, kb)
    out_nm = timeit("exact, candidate-level mask", nomask_exact, q, kb)
    out_cur = timeit("current exact", current_exact, q, kb)
    a, b = np.asarray(out_cur[1]), np.asarray(out_nm[1])
    print("agreement:", np.mean(a == b), file=sys.stderr)

if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        print(f"retry after {e!r}", file=sys.stderr)
        main()
