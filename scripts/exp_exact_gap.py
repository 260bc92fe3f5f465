"""Decompose the ~8ms gap between the combined exact bench program
(122ms) and its parts (embed 60.2 + fused search 54.1)."""
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
    from viquae_tpu.ops import mips_pallas, packing

    n_kb, dim, q_pad, row_len, k = 1_500_000, 768, 1280, 64, 100
    key = jax.random.key(0)
    kbt = jax.random.normal(
        jax.random.fold_in(key, 1), (dim, n_kb + ((-n_kb) % 512)),
        jnp.bfloat16) / np.sqrt(dim)
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.fold_in(key, 2), cfg))

    rng = np.random.default_rng(0)
    lengths = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, 1257)),
                      8, row_len).astype(int)
    seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32)
            for l in lengths]
    packed = packing.pack_token_sequences(seqs, row_len=row_len,
                                          n_cls=q_pad, pad_rows_to=32)
    p_args = tuple(jnp.asarray(a) for a in (
        packed.input_ids, packed.segment_ids, packed.position_ids,
        packed.cls_rows, packed.cls_cols))

    def embed_packed(params, ids, seg, pos, cr, cc):
        return dpr.apply_packed(
            params, cfg, ids, seg, pos, cr, cc,
            deterministic=True, compute_dtype=jnp.bfloat16,
        ).astype(jnp.bfloat16)

    @jax.jit
    def embed_only(params, ids, seg, pos, cr, cc):
        return embed_packed(params, ids, seg, pos, cr, cc)

    @jax.jit
    def search_only(q, kbt):
        return mips_pallas.topk_fused(q, kbt, k,
                                      valid_rows=jnp.int32(n_kb))

    @jax.jit
    def combined(params, ids, seg, pos, cr, cc, kbt):
        q = embed_packed(params, ids, seg, pos, cr, cc)
        return mips_pallas.topk_fused(q, kbt, k, valid_rows=jnp.int32(n_kb))

    def timeit(name, fn, *args, reps=10):
        out = fn(*args); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", file=sys.stderr)
        return out

    q = timeit("embed only", embed_only, params, *p_args)
    timeit("search only (pre-embedded q)", search_only, q, kbt)
    timeit("combined", combined, params, *p_args, kbt)
    # two-dispatch variant: does splitting the jit cost anything?
    def two_step(params, kbt):
        qq = embed_only(params, *p_args)
        return search_only(qq, kbt)
    timeit("two dispatches (embed jit -> search jit)", two_step, params, kbt)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
