"""Corpus-side indexing wall-clock: packed embedding of ~100-token passages
(the KB build stage the reference runs offline for hours on a V100 —
meerqat/ir/embedding.py over 1.5M uniform_passages, padded to max_length).

Measures steady-state passages/s of PackedColumnEmbedder's device program on
corpus-shaped batches (100-token rows at density ~0.99) and extrapolates the
full 1.5M-passage KB embed; also times the one-off kernel-layout transform.

Run: python scripts/exp_corpus_embed.py  (one TPU process at a time)
"""
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    deadline = threading.Timer(600, lambda: (
        print("backend init exceeded 600s; exiting", file=sys.stderr),
        os._exit(3)))
    deadline.daemon = True
    deadline.start()
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()
    deadline.cancel()
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import packing

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.key(2), cfg))

    # corpus batches: uniform_passages(n=100) emits ~100-token rows (+title
    # prefix); a 256-token canvas row holds 2 passages -> density ~0.98
    ROW_LEN, N_PASSAGES_PER_BATCH = 256, 512
    rng = np.random.default_rng(0)

    def corpus_batch():
        lengths = np.clip(
            rng.normal(104, 6, N_PASSAGES_PER_BATCH), 80, 128).astype(int)
        seqs = [rng.integers(1000, 25000, size=l).astype(np.int32)
                for l in lengths]
        p = packing.pack_token_sequences(
            seqs, row_len=ROW_LEN, n_cls=N_PASSAGES_PER_BATCH,
            pad_rows_to=8)
        return tuple(jnp.asarray(a) for a in (
            p.input_ids, p.segment_ids, p.position_ids, p.cls_rows,
            p.cls_cols)), p.input_ids.shape

    @jax.jit
    def embed(params, ids, seg, pos, cr, cc):
        q = dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                             deterministic=True,
                             compute_dtype=jnp.bfloat16)
        # KB build normalizes + stores bf16 (the serving dtype)
        q = q / jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                keepdims=True).astype(q.dtype)
        return q.astype(jnp.bfloat16)

    args, shape = corpus_batch()
    sync(embed(params, *args))  # compile
    print(f"canvas {shape[0]}x{ROW_LEN} for {N_PASSAGES_PER_BATCH} "
          f"passages (density "
          f"{104 * N_PASSAGES_PER_BATCH / (shape[0] * ROW_LEN):.3f})",
          file=sys.stderr, flush=True)

    # steady state with host packing overlapped the way ir/embedding's
    # PackedColumnEmbedder + prefetch run it: time device dispatches
    # back-to-back over pre-built canvases (host packing of the NEXT batch
    # overlaps the in-flight device step in the real pipeline)
    batches = [corpus_batch()[0] for _ in range(8)]
    t0 = time.perf_counter()
    reps = 3
    out = None
    for _ in range(reps):
        for args in batches:
            out = embed(params, *args)
    sync(out)
    wall = time.perf_counter() - t0
    n = reps * len(batches) * N_PASSAGES_PER_BATCH
    pps = n / wall
    # host packing rate (the overlapped producer must keep up)
    t0 = time.perf_counter()
    for _ in range(4):
        corpus_batch()
    host_pps = 4 * N_PASSAGES_PER_BATCH / (time.perf_counter() - t0)

    full_kb_min = 1_500_000 / min(pps, host_pps) / 60
    print(json.dumps({
        "device_passages_per_s": round(pps, 1),
        "host_pack_passages_per_s": round(host_pps, 1),
        "bound": "host-pack" if host_pps < pps else "device",
        "full_1p5M_kb_embed_minutes": round(full_kb_min, 2),
        "tokens_per_s": round(pps * 104, 0),
    }), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — transient chip errors
        print(f"retry after {e!r}", file=sys.stderr)
        main()
