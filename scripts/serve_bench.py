"""Serving-path benchmark: RetrievalPipeline (host tokenize -> device embed
-> MIPS) over a query stream, with prefetch overlap vs naive serial stages.

Not run by the driver (bench.py is the contract); this measures the
deployment loop in ir/serving.py. Usage:

    python scripts/serve_bench.py [--queries 5120] [--kb 1500000]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=5120)
    ap.add_argument("--kb", type=int, default=1_500_000)
    ap.add_argument("--batch", type=int, default=1280)
    ap.add_argument("--mode", choices=["global", "approx", "fused"],
                    default="fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from transformers import BertTokenizerFast

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.serving import FusedRetrievalPipeline, RetrievalPipeline
    from viquae_tpu.ops import mips

    # local offline tokenizer (no hub access in this environment)
    with tempfile.TemporaryDirectory() as td:
        vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                 + [f"w{i}" for i in range(5000)])
        vpath = os.path.join(td, "vocab.txt")
        with open(vpath, "w") as f:
            f.write("\n".join(vocab))
        tokenizer = BertTokenizerFast(vocab_file=vpath, do_lower_case=True)

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.key(0), cfg)
    kb = (jax.random.normal(jax.random.key(1), (args.kb, 768), jnp.bfloat16)
          / np.sqrt(768))
    index = mips.DenseIndex(np.zeros((1, 768), np.float32), mode=args.mode)
    if args.mode == "fused":
        # Pallas q-major kernel layout: transposed (d, N), tile-padded cols
        from viquae_tpu.ops import mips_pallas
        kb = mips_pallas.to_kernel_layout(kb)
    index.matrix, index.n = kb, args.kb  # device-resident bf16 KB
    index.dtype = jnp.bfloat16

    # packed query embedder — the same path bench.py measures (adaptive
    # canvas rounded to 32 rows; 1-2 compiled shapes for this stream)
    embed_fn = PackedTextEmbedder(
        dpr.make_packed_apply(cfg), params, tokenizer,
        row_len=64, batch_size=args.batch, compute_dtype=jnp.bfloat16,
    )

    # bench-matching question lengths: lognormal(ln18, 0.35) words
    rng = np.random.default_rng(0)
    n_words = np.clip(
        np.round(rng.lognormal(np.log(16.0), 0.35, args.queries)), 6, 60
    ).astype(int)
    queries = [" ".join(f"w{j}" for j in rng.integers(0, 5000, w))
               for w in n_words]
    ids = [str(i) for i in range(args.queries)]

    pipe = FusedRetrievalPipeline(embed_fn, index, batch_size=args.batch,
                                  k=100)
    pipe.run_arrays(queries)  # warmup/compile over the full stream

    arrays_qps = 0.0
    for _ in range(2):
        t0 = time.time()
        scores, idx = pipe.run_arrays(queries)
        arrays_qps = max(arrays_qps, args.queries / (time.time() - t0))

    # device-handoff path (retrieval feeds the on-device reader): sync only
    # the tail batch, like bench.py
    out_dev = pipe.run_device(queries)  # warm
    sync(out_dev[-1][1])
    device_qps = 0.0
    for _ in range(2):
        t0 = time.time()
        out_dev = pipe.run_device(queries)
        sync(out_dev[-1][1])
        device_qps = max(device_qps, args.queries / (time.time() - t0))

    t0 = time.time()
    run = pipe.run(ids, queries)
    dt = time.time() - t0
    qps = args.queries / dt
    assert len(run) == args.queries

    # naive serial comparison: tokenize+embed+search one batch at a time,
    # syncing each stage (no overlap, two dispatches, two downloads)
    t0 = time.time()
    for start in range(0, args.queries, args.batch):
        chunk = queries[start: start + args.batch]
        emb = embed_fn(list(chunk))
        s, i = index.search_batch(emb, k=100)  # sync=True: host roundtrip
    serial_dt = time.time() - t0

    print({
        "serving_qps_device_handoff": round(device_qps, 1),
        "serving_qps_arrays": round(arrays_qps, 1),
        "serving_qps_run": round(qps, 1),
        "serial_qps": round(args.queries / serial_dt, 1),
        "overlap_speedup": round(serial_dt / (args.queries / arrays_qps), 3),
        "stage_report": pipe.report(),
    })


if __name__ == "__main__":
    main()
