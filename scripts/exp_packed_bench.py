"""Scratch experiment: packed query embed + search timings on the real chip.

Measures the round-2 bench candidates before committing to a protocol:
  A) padded   (1280, 64) embed + exact search   (round-1 headline)
  B) packed   (n_rows, 64) embed + exact search
  C) packed embed + approx search
Question lengths ~ lognormal(ln(18), 0.35) clipped [8, 64] — TriviaQA-style
question lengths (ViQuAE questions are rewritten TriviaQA questions).
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
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips, packing

    n_kb, dim, n_queries, k = 1_500_000, 768, 1257, 100
    q_pad = 1280

    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (n_kb, dim), jnp.bfloat16)
    kb = kb / np.sqrt(dim)
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.fold_in(key, 2), cfg)

    rng = np.random.default_rng(0)
    lengths = np.clip(
        np.round(rng.lognormal(np.log(18.0), 0.35, n_queries)), 8, 64
    ).astype(int)
    print(f"lengths: mean={lengths.mean():.1f} p50={np.median(lengths):.0f} "
          f"p99={np.percentile(lengths, 99):.0f} total={lengths.sum()}",
          file=sys.stderr)
    seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32) for l in lengths]

    packed = packing.pack_token_sequences(
        seqs, row_len=64, n_cls=q_pad, pad_rows_to=32
    )
    print(f"packed rows={packed.rows} eff={packing.packing_efficiency(packed):.3f}",
          file=sys.stderr)

    p_ids = jnp.asarray(packed.input_ids)
    p_seg = jnp.asarray(packed.segment_ids)
    p_pos = jnp.asarray(packed.position_ids)
    p_cr = jnp.asarray(packed.cls_rows)
    p_cc = jnp.asarray(packed.cls_cols)

    @jax.jit
    def packed_exact(params, ids, seg, pos, cr, cc, kb):
        q = dpr.apply_packed(
            params, cfg, ids, seg, pos, cr, cc,
            deterministic=True, compute_dtype=jnp.bfloat16,
        ).astype(jnp.bfloat16)
        return mips.topk_global(q, kb, k, compute_dtype=jnp.bfloat16)

    @jax.jit
    def packed_approx(params, ids, seg, pos, cr, cc, kb):
        q = dpr.apply_packed(
            params, cfg, ids, seg, pos, cr, cc,
            deterministic=True, compute_dtype=jnp.bfloat16,
        ).astype(jnp.bfloat16)
        return mips.topk_global(q, kb, k, compute_dtype=jnp.bfloat16,
                                mode="approx")

    @jax.jit
    def packed_embed_only(params, ids, seg, pos, cr, cc):
        return dpr.apply_packed(
            params, cfg, ids, seg, pos, cr, cc,
            deterministic=True, compute_dtype=jnp.bfloat16,
        )

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms -> {n_queries/dt:.0f} q/s",
              file=sys.stderr)
        return out, dt

    t0 = time.time()
    out_e, _ = timeit("warm exact", packed_exact, params, p_ids, p_seg, p_pos,
                      p_cr, p_cc, kb, reps=1)
    print(f"compile exact {time.time()-t0:.0f}s", file=sys.stderr)
    _, dt_embed = timeit("packed embed only", packed_embed_only, params, p_ids,
                         p_seg, p_pos, p_cr, p_cc)
    out_e, dt_e = timeit("packed+exact", packed_exact, params, p_ids, p_seg,
                         p_pos, p_cr, p_cc, kb)
    out_a, dt_a = timeit("packed+approx", packed_approx, params, p_ids, p_seg,
                         p_pos, p_cr, p_cc, kb)

    idx_e = np.asarray(out_e[1])[:n_queries]
    idx_a = np.asarray(out_a[1])[:n_queries]
    r20 = np.mean([
        len(set(idx_a[i][:20]) & set(idx_e[i][:20])) / 20
        for i in range(n_queries)
    ])
    print(f"approx R@20 vs exact: {r20:.4f}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"attempt 1 failed ({e!r}); retrying", file=sys.stderr)
        main()
