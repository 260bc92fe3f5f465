"""Decompose the post-kernel selection cost of ops.mips_pallas.topk_fused
at bench scale (1280 x 1.5M bf16, k=100) and A/B cheaper selection tails.

Known floors (PARITY.md): kernel alone 29.3 ms, end-to-end 54.1 ms ->
~25 ms of post-kernel work. Suspects:
  T  segmax3 (n_tiles, Q, 4) -> (Q, n_seg) moveaxis+reshape (60MB transpose)
  S  _select_topk(segmax, 100, "fast"): at width 11719 with k=100 the
     two-level scheme DEGENERATES (p = n_seg2 = 92, candidate pool = full
     width) into gathers + a full 11776-wide sort
  G  take_along_axis segment gather from the bf16 scores (32MB out)
  F  finalize_topk: top_k over the (Q, 12800) pool (full sort) + tie sort

Variants:
  V1 plain lax.top_k for the segment select (drop the degenerate level)
  V5 keep candidates bf16 through finalize's top_k (halve sort bytes);
     exact: f32<-bf16 is lossless so the order is identical
  V7 tile-hierarchy select: top-100 TILES by tilemax (sort 2930) ->
     their 400 segmaxes -> top-100 segments (sort 400) -> same gather.
     Exact by the same argument as segments (<= k-1 tiles can beat s_k).
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
    from viquae_tpu.ops import mips, mips_pallas

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    Q, NV, D, K, SEG, TILE = 1280, 1_500_000, 768, 100, 128, 512
    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (NV, D),
                           jnp.bfloat16) / np.sqrt(D)
    q = jax.random.normal(jax.random.fold_in(key, 2), (Q, D), jnp.bfloat16)
    kb_t = jax.jit(mips_pallas.to_kernel_layout,
                   static_argnames=("tile",))(kb, tile=TILE)
    kb_t = jax.device_put(kb_t)
    del kb
    N = kb_t.shape[1]
    n_seg = N // SEG
    n_tiles = N // TILE
    segs = TILE // SEG
    nv = jnp.int32(NV)
    print(f"N={N} n_seg={n_seg} n_tiles={n_tiles}", file=sys.stderr)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms",
              file=sys.stderr)
        return out

    kfn = mips_pallas.fused_score_segmax_qmajor

    @jax.jit
    def stage_kernel(q, kb_t, nv):
        return kfn(q, kb_t, nv, tile=TILE)

    @jax.jit
    def stage_transpose(q, kb_t, nv):
        scores, segmax3 = kfn(q, kb_t, nv, tile=TILE)
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q, n_seg)
        return scores, segmax

    @jax.jit
    def stage_select(q, kb_t, nv):
        scores, segmax3 = kfn(q, kb_t, nv, tile=TILE)
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q, n_seg)
        _, seg_idx = mips._select_topk(segmax.astype(jnp.float32), K, "fast")
        return scores, seg_idx

    @jax.jit
    def stage_gather(q, kb_t, nv):
        scores, segmax3 = kfn(q, kb_t, nv, tile=TILE)
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q, n_seg)
        _, seg_idx = mips._select_topk(segmax.astype(jnp.float32), K, "fast")
        seg = scores.reshape(Q, n_seg, SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        return cand

    @jax.jit
    def full_current(q, kb_t, nv):
        return mips_pallas.topk_fused(q, kb_t, K, valid_rows=nv, tile=TILE)

    def tail(seg_idx, scores, bf16_cand):
        seg = scores.reshape(Q, n_seg, SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q, K * SEG)
        if not bf16_cand:
            cand = cand.astype(jnp.float32)
        cand_idx = (
            seg_idx[:, :, None] * SEG
            + jax.lax.broadcasted_iota(jnp.int32, (Q, K, SEG), 2)
        ).reshape(Q, K * SEG)
        s, i = mips.finalize_topk(cand, cand_idx, K)
        return s.astype(jnp.float32), i

    @jax.jit
    def v1_plain_select(q, kb_t, nv):
        scores, segmax3 = kfn(q, kb_t, nv, tile=TILE)
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q, n_seg)
        _, seg_idx = jax.lax.top_k(segmax, K)  # bf16 sort, no gather level
        return tail(seg_idx, scores, bf16_cand=False)

    @jax.jit
    def v5_v1_bf16_cand(q, kb_t, nv):
        scores, segmax3 = kfn(q, kb_t, nv, tile=TILE)
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q, n_seg)
        _, seg_idx = jax.lax.top_k(segmax, K)
        return tail(seg_idx, scores, bf16_cand=True)

    @jax.jit
    def v7_tile_hierarchy(q, kb_t, nv):
        scores, segmax3 = kfn(q, kb_t, nv, tile=TILE)
        # tilemax (Q, n_tiles) straight from the kernel layout: max over segs
        tilemax = jnp.moveaxis(segmax3.max(axis=2), 0, 1)  # (Q, n_tiles)
        _, tile_idx = jax.lax.top_k(tilemax, K)  # (Q, K)
        # gather the K winning tiles' segmaxes: (n_tiles, Q, segs) axis 0
        sm_q = jnp.moveaxis(segmax3, 0, 1)  # (Q, n_tiles, segs)
        tile_sm = jnp.take_along_axis(sm_q, tile_idx[:, :, None], axis=1)
        tile_sm = tile_sm.reshape(Q, K * segs)
        sm_idx = (tile_idx[:, :, None] * segs
                  + jax.lax.broadcasted_iota(jnp.int32, (Q, K, segs), 2)
                  ).reshape(Q, K * segs)
        _, pos = jax.lax.top_k(tile_sm, K)  # (Q, K) of K*segs
        seg_idx = jnp.take_along_axis(sm_idx, pos, axis=1)
        return tail(seg_idx, scores, bf16_cand=True)

    timeit("A kernel only", stage_kernel, q, kb_t, nv)
    timeit("B +transpose", stage_transpose, q, kb_t, nv)
    timeit("C +select (_select_topk fast)", stage_select, q, kb_t, nv)
    timeit("D +cand gather", stage_gather, q, kb_t, nv)
    out_cur = timeit("E full current topk_fused", full_current, q, kb_t, nv)
    out_v1 = timeit("V1 plain top_k select", v1_plain_select, q, kb_t, nv)
    out_v5 = timeit("V5 V1 + bf16 cand", v5_v1_bf16_cand, q, kb_t, nv)
    out_v7 = timeit("V7 tile hierarchy + bf16 cand", v7_tile_hierarchy,
                    q, kb_t, nv)
    # interleaved A/B confirm (first-touch instability)
    timeit("E full current (2nd)", full_current, q, kb_t, nv)
    timeit("V5 (2nd)", v5_v1_bf16_cand, q, kb_t, nv)
    timeit("V7 (2nd)", v7_tile_hierarchy, q, kb_t, nv)

    a = np.asarray(out_cur[1])
    for name, out in (("V1", out_v1), ("V5", out_v5), ("V7", out_v7)):
        b = np.asarray(out[1])
        exact_rows = np.mean(np.all(a == b, axis=1))
        setagree = np.mean([len(set(a[i]) & set(b[i])) / K for i in range(Q)])
        print(f"{name}: exact-row agreement {exact_rows:.4f}, "
              f"set agreement {setagree:.4f}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
