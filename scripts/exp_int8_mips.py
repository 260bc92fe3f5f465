"""Prototype int8 MIPS: global-scale symmetric quantization of the KB,
int8 x int8 -> int32 matmul on the MXU, selection on raw int32 scores
(per-query scale preserves per-query ranking). Measures time + recall vs
the bf16 exact path at bench scale.
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

    Q, NV, D, K, SEG = 1280, 1_500_000, 768, 100, 128
    N = NV + ((-NV) % SEG)
    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (N, D), jnp.bfloat16) / np.sqrt(D)
    q = jax.random.normal(jax.random.fold_in(key, 2), (Q, D), jnp.bfloat16)

    # host-side global-scale quantization
    kb_f = np.asarray(kb, np.float32)
    s_kb = np.abs(kb_f).max() / 127.0
    kb_i8 = jnp.asarray(np.clip(np.round(kb_f / s_kb), -127, 127), jnp.int8)
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
    def int8_exact(q, kb_i8):
        qs = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
        q_i8 = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127
                        ).astype(jnp.int8)
        scores = jax.lax.dot_general(
            q_i8, kb_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        seg = scores.reshape(Q, n_seg, SEG)
        seg_max = seg.max(axis=2)
        P = K + 1
        _, seg_idx = mips._select_topk(seg_max.astype(jnp.float32), P, "fast")
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q, P * SEG)
        cand_idx = (seg_idx[:, :, None] * SEG
                    + jax.lax.broadcasted_iota(jnp.int32, (Q, P, SEG), 2)
                    ).reshape(Q, P * SEG)
        cand = jnp.where(cand_idx < NV, cand, -2 ** 30)
        top_scores, pos = jax.lax.top_k(cand, K)
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        neg, top_idx = jax.lax.sort((-top_scores, top_idx), dimension=-1,
                                    num_keys=2)
        return (-neg).astype(jnp.float32) * qs * s_kb, top_idx

    @jax.jit
    def int8_matmul_only(q, kb_i8):
        qs = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
        q_i8 = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127
                        ).astype(jnp.int8)
        scores = jax.lax.dot_general(
            q_i8, kb_i8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return scores.max(axis=1)

    @jax.jit
    def bf16_exact(q, kb):
        return mips.topk_global(q, kb, K, valid_rows=jnp.int32(NV),
                                compute_dtype=jnp.bfloat16)

    timeit("int8 matmul+rowmax", int8_matmul_only, q, kb_i8)
    out_i8 = timeit("int8 exact select", int8_exact, q, kb_i8)
    out_bf = timeit("bf16 exact (current)", bf16_exact, q, kb)

    a = np.asarray(out_bf[1])
    b = np.asarray(out_i8[1])
    r100 = np.mean([len(set(a[i]) & set(b[i])) / K for i in range(Q)])
    r20 = np.mean([len(set(a[i][:20]) & set(b[i][:20])) / 20 for i in range(Q)])
    print(f"int8 vs bf16-exact: R@100 {r100:.4f}  R@20 {r20:.4f}",
          file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
