"""Does fusing Q/K/V projections into one matmul speed the packed embed?
Compares the current 3-dot attention vs a concatenated-kernel variant at
bench shape (384x64 canvas, bert-base, bf16).
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

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.models import layers as L
    from viquae_tpu.ops import packing

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    lengths = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, 1257)),
                      8, 64).astype(int)
    seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32)
            for l in lengths]
    p = packing.pack_token_sequences(seqs, row_len=64, n_cls=1280,
                                     pad_rows_to=32)
    args = tuple(jnp.asarray(a) for a in (
        p.input_ids, p.segment_ids, p.position_ids, p.cls_rows, p.cls_cols))

    @jax.jit
    def current(params, ids, seg, pos, cr, cc):
        return dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                                deterministic=True,
                                compute_dtype=jnp.bfloat16)

    def mha_fused(lp, x, bias, n_heads, compute_dtype):
        b, lq, dim = x.shape
        head_dim = dim // n_heads
        wqkv = jnp.concatenate([
            lp["q"]["kernel"], lp["k"]["kernel"], lp["v"]["kernel"]
        ], axis=1).astype(compute_dtype)
        bqkv = jnp.concatenate([
            lp["q"]["bias"], lp["k"]["bias"], lp["v"]["bias"]])
        qkv = (jnp.dot(x.astype(compute_dtype), wqkv,
                       preferred_element_type=jnp.float32) + bqkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, lq, n_heads, head_dim)
        k = k.reshape(b, lq, n_heads, head_dim)
        v = v.reshape(b, lq, n_heads, head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(compute_dtype),
                            k.astype(compute_dtype),
                            preferred_element_type=jnp.float32
                            ) / np.sqrt(head_dim)
        probs = jax.nn.softmax((scores + bias).astype(jnp.float32), -1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(compute_dtype),
                         v.astype(compute_dtype),
                         preferred_element_type=jnp.float32
                         ).reshape(b, lq, dim)
        return L.dense(lp["o"], ctx, compute_dtype)

    @jax.jit
    def fused(params, ids, seg, pos, cr, cc):
        bcfg = cfg.bert
        x = bert.embed(params, bcfg, ids, position_ids=pos,
                       deterministic=True)
        bias = L.attention_bias_from_segments(seg)
        for layer in params["layers"]:
            attn = mha_fused(layer["attention"], x, bias,
                             bcfg.num_attention_heads, jnp.bfloat16)
            x = L.layer_norm(layer["attention_ln"], x + attn,
                             bcfg.layer_norm_eps)
            ff = L.mlp(layer["mlp"], x, bcfg.hidden_act, jnp.bfloat16)
            x = L.layer_norm(layer["output_ln"], x + ff, bcfg.layer_norm_eps)
        return x[cr, cc]

    def timeit(name, fn, *a, reps=5):
        out = fn(*a); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        sync(out)
        print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms", file=sys.stderr)
        return out

    o1 = timeit("current 3-dot attention", current, params, *args)
    o2 = timeit("fused QKV", fused, params, *args)
    np.testing.assert_allclose(np.asarray(o1)[:100], np.asarray(o2)[:100],
                               rtol=2e-2, atol=2e-2)
    print("numerics OK", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
