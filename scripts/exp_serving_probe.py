"""Probe the tunneled chip's serving-relevant costs:
host tokenize+pack, canvas upload, fused embed+search, result download,
and whether downloads overlap device compute.
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
    from transformers import BertTokenizerFast
    import tempfile

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips, packing

    td = tempfile.mkdtemp()
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [f"w{i}" for i in range(5000)])
    open(os.path.join(td, "vocab.txt"), "w").write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(td, "vocab.txt"))

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.key(0), cfg)
    kb = (jax.random.normal(jax.random.key(1), (1_500_000, 768), jnp.bfloat16)
          / np.sqrt(768))

    rng = np.random.default_rng(0)
    n_words = np.clip(np.round(rng.lognormal(np.log(16.0), 0.35, 1280)),
                      6, 60).astype(int)
    queries = [" ".join(f"w{j}" for j in rng.integers(0, 5000, w))
               for w in n_words]

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    # 1. host tokenize
    t0 = time.time()
    enc = tok(queries, truncation=True, max_length=64)["input_ids"]
    t_tok = time.time() - t0
    seqs = [np.asarray(s, np.int32) for s in enc]

    # 2. host pack
    t0 = time.time()
    p = packing.pack_token_sequences(seqs, 64, n_rows=512, n_cls=1280)
    t_pack = time.time() - t0

    # 3. canvas upload
    t0 = time.time()
    arrs = [jnp.asarray(a) for a in (p.input_ids, p.segment_ids,
                                     p.position_ids, p.cls_rows, p.cls_cols)]
    sync(arrs[0]); sync(arrs[1]); sync(arrs[2])
    t_up = time.time() - t0

    # 4. fused embed+search
    @jax.jit
    def fused(params, ids, seg, pos, cr, cc, kb):
        q = dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                             deterministic=True,
                             compute_dtype=jnp.bfloat16).astype(jnp.bfloat16)
        return mips.topk_global(q, kb, 100, compute_dtype=jnp.bfloat16)

    out = fused(params, *arrs, kb); sync(out)
    t0 = time.time()
    for _ in range(3):
        out = fused(params, *arrs, kb)
    sync(out)
    t_dev = (time.time() - t0) / 3

    # 5. result download, after compute idle
    scores, idx = out
    t0 = time.time()
    s_np, i_np = np.asarray(scores), np.asarray(idx)
    t_down_idle = time.time() - t0

    # 5b. combined single-transfer download (bitcast+stack)
    @jax.jit
    def pack_out(scores, idx):
        return jnp.stack([jax.lax.bitcast_convert_type(scores, jnp.int32),
                          idx.astype(jnp.int32)])
    packed_out = pack_out(scores, idx); sync(packed_out)
    t0 = time.time()
    both = np.asarray(pack_out(scores, idx))
    t_down_packed = time.time() - t0

    # 6. overlap test: dispatch next batch, then download previous results
    out1 = fused(params, *arrs, kb)
    sync(out1)
    t0 = time.time()
    out2 = fused(params, *arrs, kb)      # device busy ~134 ms
    s_np = np.asarray(out1[0]); i_np = np.asarray(out1[1])
    t_mid = time.time() - t0
    sync(out2)
    t_total = time.time() - t0

    # 7. upload while device busy
    out2 = fused(params, *arrs, kb)
    t0 = time.time()
    up = jnp.asarray(p.input_ids); sync(up)
    t_up_busy = time.time() - t0
    sync(out2)

    print(f"tokenize 1280: {t_tok*1e3:.1f} ms")
    print(f"pack 1280:     {t_pack*1e3:.1f} ms")
    print(f"upload canvas: {t_up*1e3:.1f} ms")
    print(f"fused dev:     {t_dev*1e3:.1f} ms")
    print(f"download idle (2 arrays): {t_down_idle*1e3:.1f} ms")
    print(f"download idle (1 packed): {t_down_packed*1e3:.1f} ms")
    print(f"download while busy: {t_mid*1e3:.1f} ms, total w/ compute {t_total*1e3:.1f} ms")
    print(f"upload while busy: {t_up_busy*1e3:.1f} ms")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
