"""Q-MAJOR fused scores+segmax Pallas kernel experiment, take 4.

Bisection (exp_fused_debug.py) showed Mosaic compiles the q-major matmul +
lane-group segmax fine — what crashed its remote compiler was a resident
(Q, 128) segmax block written in sub-lane pl.ds slices across an inner
grid dim. Fix: emit segmax as a 3D (n_tiles, Q, segs_per_tile) output with
one FULL-block write per grid step (block (1, Q, segs) — last dims equal
the array dims, satisfying Mosaic's rule), and moveaxis/reshape to
(Q, n_seg) in XLA afterwards (a ~30 MB transpose, negligible).

The KB is passed PRE-TRANSPOSED (d, N) so the matmul emits (Q, tile)
directly: no in-kernel transpose AND a cheap axis-1 candidate gather
downstream (the round-1 kb-major kernel made the gather axis bad instead,
costing ~200 ms).
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEG = 128


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from viquae_tpu.ops import mips

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    Q, NV, D, K = 1280, 1_500_000, 768, 100

    def make_kernel(tile):
        segs = tile // SEG

        def kernel(q_ref, kbt_ref, nv_ref, scores_ref, segmax_ref):
            i = pl.program_id(0)
            s = jax.lax.dot_general(
                q_ref[:], kbt_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Q, tile) q-major
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * tile
            s = jnp.where(col < nv_ref[0, 0], s, -jnp.inf)
            s = s.astype(scores_ref.dtype)
            scores_ref[:] = s
            segmax_ref[:] = s.reshape(s.shape[0], segs, SEG).max(axis=2)[None]

        return kernel, segs

    @functools.partial(jax.jit, static_argnames=("tile",))
    def fused(q, kbt, nv, tile):
        n = kbt.shape[1]
        kernel, segs = make_kernel(tile)
        assert n % tile == 0, (n, tile)
        grid = (n // tile,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Q, D), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((Q, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, segs), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q, n), jnp.bfloat16),
                jax.ShapeDtypeStruct((n // tile, Q, segs), jnp.bfloat16),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * Q * n * D,
                bytes_accessed=Q * D * 2 + D * n * 2 + Q * n * 2,
                transcendentals=0,
            ),
        )(q, kbt, nv)

    @functools.partial(jax.jit, static_argnames=("tile",))
    def fused_exact(q, kbt, nv, tile):
        n = kbt.shape[1]
        scores, segmax3 = fused(q, kbt, nv, tile)
        n_seg = n // SEG
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q, n_seg)
        p = min(n_seg, K)
        _, seg_idx = mips._select_topk(segmax.astype(jnp.float32), p, "fast")
        seg = scores.reshape(Q, n_seg, SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q, p * SEG).astype(jnp.float32)
        cand_idx = (
            seg_idx[:, :, None] * SEG
            + jax.lax.broadcasted_iota(jnp.int32, (Q, p, SEG), 2)
        ).reshape(Q, p * SEG)
        top_scores, pos = jax.lax.top_k(cand, K)
        top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        neg, top_idx = jax.lax.sort((-top_scores, top_idx), dimension=-1,
                                    num_keys=2)
        return -neg[:, :K], top_idx[:, :K]

    @jax.jit
    def current_exact(q, kb):
        return mips.topk_global(q, kb, K, valid_rows=jnp.int32(NV),
                                compute_dtype=jnp.bfloat16)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", file=sys.stderr)
        return out

    key = jax.random.key(0)
    q = jax.random.normal(jax.random.fold_in(key, 2), (Q, D), jnp.bfloat16)

    # ---- phase A: full-scale timing, ONLY the (d, N) layout resident -----
    # (holding kb AND kbt at 1.5M rows OOMs the chip with the 3.87GB score
    # buffer; XLA topk_global's 69.8 ms baseline comes from
    # exp_exact_select2.py on the same shapes/seed protocol)
    for tile in (512, 1024, 2048):
        n = NV + ((-NV) % tile)
        kbt = jax.random.normal(
            jax.random.fold_in(key, 1), (D, n), jnp.bfloat16) / np.sqrt(D)
        nv = jnp.asarray([[NV]], jnp.int32)
        try:
            out = timeit(f"fused kernel only (tile={tile})", fused,
                         q, kbt, nv, tile)
            del out  # 3.87GB of scores — free before the next phase
            out_f = timeit(f"fused exact (tile={tile})", fused_exact,
                           q, kbt, nv, tile)
            del out_f
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
        del kbt

    # ---- phase B: parity vs XLA topk_global at 262k rows ------------------
    n_small = 262144
    kb = jax.random.normal(
        jax.random.fold_in(key, 3), (n_small, D), jnp.bfloat16) / np.sqrt(D)
    kbt = jnp.matrix_transpose(kb)
    nv_small = n_small - 77  # exercise the tail mask
    out_f = fused_exact(q, kbt, jnp.asarray([[nv_small]], jnp.int32), 512)
    out_cur = jax.jit(
        lambda q, kb: mips.topk_global(
            q, kb, K, valid_rows=jnp.int32(nv_small),
            compute_dtype=jnp.bfloat16)
    )(q, kb)
    a, b = np.asarray(out_cur[1]), np.asarray(out_f[1])
    same = np.mean([len(set(a[i]) & set(b[i])) / K for i in range(Q)])
    exact_rows = np.mean((a == b).all(axis=1))
    print(f"262k parity: top-{K} set agreement {same:.4f}, "
          f"identical rows {exact_rows:.4f}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
