"""Sweep the exact-selection segment width: wider segments -> fewer,
larger candidate-gather rows (better DRAM efficiency) but a wider final
sort. Containment still holds: any global top-k element lives in a
segment whose max >= the k-th score, and at most k segments qualify.
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
    key = jax.random.key(0)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", file=sys.stderr)
        return out

    results = {}
    for SEG in (128, 256, 512, 1024):
        N = NV + ((-NV) % SEG)
        kb = jax.random.normal(jax.random.fold_in(key, 1), (N, D),
                               jnp.bfloat16) / np.sqrt(D)
        q = jax.random.normal(jax.random.fold_in(key, 2), (Q, D), jnp.bfloat16)
        n_seg = N // SEG

        @jax.jit
        def exact(q, kb, n_seg=n_seg, SEG=SEG, N=N):
            s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            col = jax.lax.broadcasted_iota(jnp.int32, (Q, N), 1)
            s = jnp.where(col < NV, s, jnp.asarray(-1e30, s.dtype))
            seg = s.reshape(Q, n_seg, SEG)
            seg_max = seg.max(axis=2)
            _, seg_idx = mips._select_topk(seg_max.astype(jnp.float32), K,
                                           "fast")
            cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
            cand = cand.reshape(Q, K * SEG).astype(jnp.float32)
            cand_idx = (seg_idx[:, :, None] * SEG
                        + jax.lax.broadcasted_iota(jnp.int32, (Q, K, SEG), 2)
                        ).reshape(Q, K * SEG)
            top_scores, pos = jax.lax.top_k(cand, K)
            top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
            neg, top_idx = jax.lax.sort((-top_scores, top_idx),
                                        dimension=-1, num_keys=2)
            return -neg, top_idx

        out = timeit(f"exact SEG={SEG}", exact, q, kb)
        results[SEG] = np.asarray(out[1])
        del kb, q, out

    base = results[128]
    for SEG, idx in results.items():
        if SEG == 128:
            continue
        agree = np.mean([
            len(set(base[i]) & set(idx[i])) / K for i in range(Q)
        ])
        print(f"SEG={SEG} set agreement vs SEG=128: {agree:.4f}",
              file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
