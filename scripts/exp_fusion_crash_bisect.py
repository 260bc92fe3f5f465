"""Bisect the full-batch fusion-program remote-compile crash (round 4).

stage_fusion at Q=1280 crashes the remote compile helper (HTTP 500,
deterministic, 4/4) since the V5 topk_fused tail (commit f0058c2)
changed its HLO: the segment top_k now sorts BF16 keys and the finalize
sort carries bf16 candidates. The exact-stage program (topk_fused alone)
compiled with V5 on 2026-08-19 09:44, so the crash needs the larger
program. Variants (tail dtype combos) compiled in one process, most
conservative first:

  W: f32 segmax top_k + f32 candidates (pre-V5 dtypes, plain top_k)
  Z: bf16 segmax top_k + f32 candidates
  Y: f32 segmax top_k + bf16 candidates
  X: bf16 + bf16 (= V5, the crasher) — last, to confirm in-process
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q_PAD = 1280
N_KB = 1_500_000
K = 100


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viquae_tpu.ops import fusion as fusion_ops, mips, mips_pallas

    key = jax.random.PRNGKey(0)
    # kernel-layout KB built directly (2.3GB peak — bench degraded path)
    tile = 512
    n_total = N_KB + ((-N_KB) % tile)

    @jax.jit
    def gen_kbt():
        x = jax.random.normal(jax.random.fold_in(key, 1),
                              (768, n_total), jnp.bfloat16) / np.sqrt(768)
        col = jnp.arange(n_total, dtype=jnp.int32)[None, :]
        return jnp.where(col < N_KB, x, 0)

    kbt = gen_kbt()
    kb_clip = jax.random.normal(jax.random.fold_in(key, 7),
                                (N_KB, 512), jnp.bfloat16) / np.sqrt(512)
    kb_face = jax.random.normal(jax.random.fold_in(key, 8),
                                (506_237, 512), jnp.bfloat16) / np.sqrt(512)
    q = jax.random.normal(jax.random.fold_in(key, 2),
                          (Q_PAD, 768), jnp.bfloat16)
    q_clip = jax.random.normal(jax.random.fold_in(key, 9),
                               (Q_PAD, 512), jnp.bfloat16)
    q_face = jax.random.normal(jax.random.fold_in(key, 10),
                               (Q_PAD, 512), jnp.bfloat16)

    def fused_variant(queries, kb_t, f32_segmax, f32_cand):
        nv = jnp.asarray(jnp.int32(N_KB))
        scores, segmax3 = mips_pallas.fused_score_segmax_qmajor(
            queries, kb_t, nv, tile=tile)
        n = kb_t.shape[1]
        n_seg = n // mips_pallas._SEG
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q_PAD, n_seg)
        if f32_segmax:
            segmax = segmax.astype(jnp.float32)
        p = min(n_seg, K)
        _, seg_idx = jax.lax.top_k(segmax, p)
        seg = scores.reshape(Q_PAD, n_seg, mips_pallas._SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q_PAD, p * mips_pallas._SEG)
        if f32_cand:
            cand = cand.astype(jnp.float32)
        cand_idx = (
            seg_idx[:, :, None] * mips_pallas._SEG
            + jax.lax.broadcasted_iota(
                jnp.int32, (Q_PAD, p, mips_pallas._SEG), 2)
        ).reshape(Q_PAD, p * mips_pallas._SEG)
        out_s, out_i = mips.finalize_topk(cand, cand_idx, K)
        return out_s.astype(jnp.float32), out_i

    def make_program(f32_segmax, f32_cand):
        @jax.jit
        def program(q, q_clip, q_face, kbt, kb_clip, kb_face):
            s0, i0 = fused_variant(q, kbt, f32_segmax, f32_cand)
            s1, i1 = mips.topk_global(q_clip, kb_clip, K,
                                      compute_dtype=jnp.bfloat16,
                                      mode="approx")
            s2, i2 = mips.topk_global(q_face, kb_face, K,
                                      compute_dtype=jnp.bfloat16,
                                      mode="approx")
            return fusion_ops.fuse_topk(
                (s0, s1, s2),
                (i0.astype(jnp.int32), i1.astype(jnp.int32),
                 i2.astype(jnp.int32)),
                (0.6, 0.2, 0.2), K, norm="gzmuv",
                valid_queries=jnp.int32(1257))
        return program

    for name, f32_segmax, f32_cand in [
        ("W f32 top_k + f32 cand", True, True),
        ("Z bf16 top_k + f32 cand", False, True),
        ("Y f32 top_k + bf16 cand", True, False),
        ("X bf16 + bf16 (V5)", False, False),
    ]:
        t0 = time.time()
        try:
            program = make_program(f32_segmax, f32_cand)
            out = program(q, q_clip, q_face, kbt, kb_clip, kb_face)
            np.asarray(out[0].ravel()[:1])
            t1 = time.time()
            for _ in range(3):
                out = program(q, q_clip, q_face, kbt, kb_clip, kb_face)
            np.asarray(out[0].ravel()[:1])
            step = (time.time() - t1) / 3 * 1e3
            print(f"{name}: OK compile {t0 and time.time()-t0:.0f}s "
                  f"step {step:.1f} ms", file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: CRASH {repr(e)[:200]}", file=sys.stderr,
                  flush=True)


def main_with_encoder(f32_segmax=False, f32_cand=False,
                      two_level=False):
    """Round 2 of the bisect: variant X compiled fine WITHOUT the encoder
    but CRASHES (14s, deterministic) with the packed DPR embed in the
    same program. Round 3: which tail ingredient interacts with the
    encoder? two_level=True restores the pre-V5 _select_topk segment
    select."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import fusion as fusion_ops, mips, mips_pallas
    from viquae_tpu.ops import packing

    key = jax.random.PRNGKey(0)
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.fold_in(key, 2), cfg)
    params16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    n_queries = 1257
    lengths = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35,
                                             n_queries)), 8, 64).astype(int)
    seqs = [rng.integers(1000, 10_000, size=n).astype(np.int32)
            for n in lengths]
    packed = packing.pack_token_sequences(seqs, row_len=64, n_cls=Q_PAD,
                                          pad_rows_to=32)
    p_args = tuple(jnp.asarray(a) for a in (
        packed.input_ids, packed.segment_ids, packed.position_ids,
        packed.cls_rows, packed.cls_cols))

    tile = 512
    n_total = N_KB + ((-N_KB) % tile)

    @jax.jit
    def gen_kbt():
        x = jax.random.normal(jax.random.fold_in(key, 1),
                              (768, n_total), jnp.bfloat16) / np.sqrt(768)
        col = jnp.arange(n_total, dtype=jnp.int32)[None, :]
        return jnp.where(col < N_KB, x, 0)

    kbt = gen_kbt()
    kb_clip = jax.random.normal(jax.random.fold_in(key, 7),
                                (N_KB, 512), jnp.bfloat16) / np.sqrt(512)
    kb_face = jax.random.normal(jax.random.fold_in(key, 8),
                                (506_237, 512), jnp.bfloat16) / np.sqrt(512)
    q_clip = jax.random.normal(jax.random.fold_in(key, 9),
                               (Q_PAD, 512), jnp.bfloat16)
    q_face = jax.random.normal(jax.random.fold_in(key, 10),
                               (Q_PAD, 512), jnp.bfloat16)

    @jax.jit
    def fusion_program(params, ids, seg, pos, cr, cc, q_clip, q_face,
                       kbt, kb_clip, kb_face):
        q = dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                             deterministic=True,
                             compute_dtype=jnp.bfloat16)
        nv = jnp.asarray(jnp.int32(N_KB))
        scores, segmax3 = mips_pallas.fused_score_segmax_qmajor(
            q, kbt, nv, tile=tile)
        n_seg = kbt.shape[1] // mips_pallas._SEG
        segmax = jnp.moveaxis(segmax3, 0, 1).reshape(Q_PAD, n_seg)
        if f32_segmax:
            segmax = segmax.astype(jnp.float32)
        p = min(n_seg, K)
        if two_level:
            _, seg_idx = mips._select_topk(
                segmax.astype(jnp.float32), p, "fast")
        else:
            _, seg_idx = jax.lax.top_k(segmax, p)
        seg = scores.reshape(Q_PAD, n_seg, mips_pallas._SEG)
        cand = jnp.take_along_axis(seg, seg_idx[:, :, None], axis=1)
        cand = cand.reshape(Q_PAD, p * mips_pallas._SEG)
        if f32_cand:
            cand = cand.astype(jnp.float32)
        cand_idx = (
            seg_idx[:, :, None] * mips_pallas._SEG
            + jax.lax.broadcasted_iota(
                jnp.int32, (Q_PAD, p, mips_pallas._SEG), 2)
        ).reshape(Q_PAD, p * mips_pallas._SEG)
        s0, i0 = mips.finalize_topk(cand, cand_idx, K)
        s0 = s0.astype(jnp.float32)
        s1, i1 = mips.topk_global(q_clip, kb_clip, K,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        s2, i2 = mips.topk_global(q_face, kb_face, K,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        return fusion_ops.fuse_topk(
            (s0, s1, s2),
            (i0.astype(jnp.int32), i1.astype(jnp.int32),
             i2.astype(jnp.int32)),
            (0.6, 0.2, 0.2), K, norm="gzmuv",
            valid_queries=jnp.int32(n_queries))

    t0 = time.time()
    try:
        out = fusion_program(params16, *p_args, q_clip, q_face, kbt,
                             kb_clip, kb_face)
        np.asarray(out[0].ravel()[:1])
        print(f"encoder+fusion: OK compile {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"encoder+fusion: CRASH after {time.time()-t0:.0f}s "
              f"{repr(e)[:200]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "encoder":
        main_with_encoder(f32_segmax="f32seg" in sys.argv[2:],
                          f32_cand="f32cand" in sys.argv[2:],
                          two_level="twolevel" in sys.argv[2:])
    else:
        main()
