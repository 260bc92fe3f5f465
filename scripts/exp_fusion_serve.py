"""Multi-index late-fusion retrieval at ViQuAE scale on one chip.

The reference's best configs fuse several indexes offline (ranx over run
JSONs). This measures the ONLINE equivalent: the dpr+arcface+clip config
(late-fusion weights [0.6, 0.2, 0.2], experiments/ir/viquae/
dpr+clip-cross-modal/config_test.json; gzmuv + defmin) as ONE jitted
program per batch — packed question embed + 3 MIPS searches + device
fusion (ops/fusion.fuse_topk) — vs the sequential host-fusion baseline
(3 separate searches, scores to host, rankeval fusion).

Index sizes mirror the reference KB: DPR 1.5M x 768 (articles/passages),
CLIP 1.5M x 512 (one image embedding per article), ArcFace 506k x 512
(humans with faces). DPR searches with the Pallas fused exact kernel;
image indexes with approx_max_k (no score materialization — three exact
score matrices would blow HBM, and image runs are fusion INPUTS where
R@20 0.999 approx is immaterial).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import fusion as fusion_ops
    from viquae_tpu.ops import mips, mips_pallas, packing

    Q, K = 1280, 100
    N_DPR, N_CLIP, N_FACE = 1_500_000, 1_500_000, 506_237
    key = jax.random.key(0)

    kbt_dpr = jax.random.normal(
        jax.random.fold_in(key, 1), (768, N_DPR + ((-N_DPR) % 512)),
        jnp.bfloat16) / np.sqrt(768)
    kb_clip = jax.random.normal(
        jax.random.fold_in(key, 2), (N_CLIP, 512), jnp.bfloat16) / np.sqrt(512)
    kb_face = jax.random.normal(
        jax.random.fold_in(key, 3), (N_FACE, 512), jnp.bfloat16) / np.sqrt(512)

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.fold_in(key, 4), cfg),
    )

    rng = np.random.default_rng(0)
    lengths = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, 1257)),
                      8, 64).astype(int)
    seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32)
            for l in lengths]
    packed = packing.pack_token_sequences(seqs, row_len=64, n_cls=Q,
                                          pad_rows_to=32)
    p_args = tuple(jnp.asarray(a) for a in (
        packed.input_ids, packed.segment_ids, packed.position_ids,
        packed.cls_rows, packed.cls_cols))
    q_clip = jax.random.normal(jax.random.fold_in(key, 5), (Q, 512),
                               jnp.bfloat16)
    q_face = jax.random.normal(jax.random.fold_in(key, 6), (Q, 512),
                               jnp.bfloat16)
    weights = (0.6, 0.2, 0.2)

    @jax.jit
    def fused_program(params, ids, seg, pos, cr, cc, q_clip, q_face,
                      kbt_dpr, kb_clip, kb_face):
        q = dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                             deterministic=True,
                             compute_dtype=jnp.bfloat16).astype(jnp.bfloat16)
        s0, i0 = mips_pallas.topk_fused(q, kbt_dpr, K,
                                        valid_rows=jnp.int32(N_DPR))
        s1, i1 = mips.topk_global(q_clip, kb_clip, K,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        s2, i2 = mips.topk_global(q_face, kb_face, K,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        return fusion_ops.fuse_topk(
            (s0, s1, s2),
            (i0.astype(jnp.int32), i1.astype(jnp.int32), i2.astype(jnp.int32)),
            weights, K, norm="gzmuv", valid_queries=jnp.int32(1257),
        )

    def timeit(name, fn, *args, reps=5):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms/batch = {1257/dt:.0f} q/s",
              file=sys.stderr)
        return out, dt

    out, dt_fused = timeit(
        "fused 3-index program (embed + dpr-exact + clip/face-approx + fusion)",
        fused_program, params, *p_args, q_clip, q_face,
        kbt_dpr, kb_clip, kb_face)

    # ---- baseline: sequential searches, scores to host, rankeval fusion --
    from viquae_tpu.rankeval import Run, default_minimum, fuse, normalize_run

    @jax.jit
    def embed_q(params, ids, seg, pos, cr, cc):
        return dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                                deterministic=True,
                                compute_dtype=jnp.bfloat16).astype(jnp.bfloat16)

    def sequential():
        q = embed_q(params, *p_args)
        s0, i0 = mips_pallas.topk_fused(q, kbt_dpr, K,
                                        valid_rows=jnp.int32(N_DPR))
        s1, i1 = mips.topk_global(q_clip, kb_clip, K,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        s2, i2 = mips.topk_global(q_face, kb_face, K,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        runs = []
        for name, (s, i) in (("dpr", (s0, i0)), ("clip", (s1, i1)),
                             ("face", (s2, i2))):
            s, i = np.asarray(s)[:1257], np.asarray(i)[:1257]
            runs.append(Run({
                str(r): {str(int(d)): float(v) for d, v in zip(i[r], s[r])}
                for r in range(1257)
            }, name=name))
        runs = default_minimum(runs)
        runs = [normalize_run(r, "gzmuv") for r in runs]
        return fuse(runs, norm=None, method="wsum",
                    params={"weights": list(weights)})

    host_run = sequential()  # warm
    t0 = time.time()
    host_run = sequential()
    dt_host = time.time() - t0
    print(f"sequential + host rankeval fusion: {dt_host*1e3:.1f} ms/batch "
          f"= {1257/dt_host:.0f} q/s", file=sys.stderr)

    # parity: device fusion vs host fusion on the same searches
    f_scores = np.asarray(out[0])[:1257]
    f_idx = np.asarray(out[1])[:1257]
    agree = 0.0
    for q in range(1257):
        items = sorted(host_run[str(q)].items(),
                       key=lambda kv: (-kv[1], int(kv[0])))[:20]
        ref = [int(d) for d, _ in items]
        agree += len(set(f_idx[q][:20]) & set(ref)) / 20
    print(f"top-20 agreement device-vs-host fusion: {agree/1257:.4f}",
          file=sys.stderr)
    print(f"speedup: {dt_host/dt_fused:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
