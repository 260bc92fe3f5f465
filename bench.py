"""North-star benchmark: embed + retrieve ViQuAE-scale queries over a
1.5M-entity KB on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (mirrors BASELINE.json): 1,257 test questions embedded by a
bert-base DPR question tower (seq 64, bf16 matmuls) and searched against a
1.5M x 768 KB with the fast exact MIPS engine, k=100. The reference path is
FAISS flat IP fed by a torch DPR on GPU; it publishes no QPS figure, so
vs_baseline is measured against the driver's north-star target of
10,000 queries/sec. R@20 parity is checked against an fp32 numpy
exact-argsort oracle on a query subsample.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

NORTH_STAR_QPS = 10_000.0


def sync(x):
    import jax

    # on the tunneled axon platform block_until_ready is unreliable; force a
    # tiny device->host transfer instead
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    small = bool(int(os.environ.get("BENCH_SMALL", "0")))
    import jax

    # persistent compilation cache: first-ever compile over the tunneled TPU
    # can take minutes; cached executables make reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips

    n_kb = 150_000 if small else 1_500_000
    dim = 768
    n_queries = 1257
    seq_len = 64
    k = 100
    q_pad = 1280  # pad queries to an MXU-friendly batch

    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (n_kb, dim), jnp.bfloat16)
    # scale like unit-ish embeddings
    kb = kb / np.sqrt(dim)

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.fold_in(key, 2), cfg)
    rng = np.random.default_rng(0)
    input_ids = jnp.asarray(
        rng.integers(1000, 10_000, (q_pad, seq_len)), jnp.int32
    )
    attention_mask = jnp.ones((q_pad, seq_len), jnp.int32)

    @jax.jit
    def embed_and_search(params, input_ids, attention_mask, kb):
        q = dpr.apply(
            params, cfg, input_ids, attention_mask,
            deterministic=True, compute_dtype=jnp.bfloat16,
        )["pooler_output"]
        q = q.astype(jnp.bfloat16)
        return mips.topk_global(q, kb, k, compute_dtype=jnp.bfloat16)

    # compile + warmup
    t0 = time.time()
    out = embed_and_search(params, input_ids, attention_mask, kb)
    sync(out)
    compile_s = time.time() - t0

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = embed_and_search(params, input_ids, attention_mask, kb)
    sync(out)
    dt = (time.time() - t0) / reps
    qps = n_queries / dt  # count only the real 1,257 queries

    # ---- approx variant (lax.approx_max_k fused into the matmul): faster,
    # ~0.97 R@20 vs exact — reported in details, NOT the headline (the
    # reference baseline is FAISS flat = exact)
    @jax.jit
    def embed_and_search_approx(params, input_ids, attention_mask, kb):
        q = dpr.apply(
            params, cfg, input_ids, attention_mask,
            deterministic=True, compute_dtype=jnp.bfloat16,
        )["pooler_output"].astype(jnp.bfloat16)
        return mips.topk_global(
            q, kb, k, compute_dtype=jnp.bfloat16, mode="approx"
        )

    out_a = embed_and_search_approx(params, input_ids, attention_mask, kb)
    sync(out_a)
    t0 = time.time()
    for _ in range(reps):
        out_a = embed_and_search_approx(params, input_ids, attention_mask, kb)
    sync(out_a)
    approx_qps = n_queries / ((time.time() - t0) / reps)
    idx_exact = np.asarray(out[1])
    idx_approx = np.asarray(out_a[1])
    r20_approx = np.mean([
        len(set(idx_approx[i][:20]) & set(idx_exact[i][:20])) / 20
        for i in range(n_queries)
    ])

    # ---- R@20 parity: fast selection vs exact full-sort, fp32 HIGHEST ---
    # over a single-chunk KB slice (keeps the exact-mode compile small; the
    # full-scale numpy FAISS-flat oracle parity is covered by
    # tests/test_mips.py — pulling the 4.6GB fp32 KB to host over the
    # tunneled TPU link is too slow for the bench)
    n_check = 16 if small else 64
    slice_rows = min(n_kb, 262144)
    q_fp32 = dpr.apply(
        params, cfg, input_ids[:n_check], attention_mask[:n_check],
        deterministic=True, compute_dtype=jnp.float32,
    )["pooler_output"]
    kb_f32 = kb[:slice_rows].astype(jnp.float32)
    _, idx = mips.topk_single(
        jnp.asarray(q_fp32), kb_f32, 20,
        chunk_size=slice_rows, compute_dtype=jnp.float32, mode="fast",
    )
    _, ref_idx = mips.topk_single(
        jnp.asarray(q_fp32), kb_f32, 20,
        chunk_size=slice_rows, compute_dtype=jnp.float32, mode="exact",
    )
    idx, ref_idx = np.asarray(idx), np.asarray(ref_idx)
    overlap = np.mean([
        len(set(idx[i]) & set(ref_idx[i])) / 20 for i in range(n_check)
    ])

    # ---- reader throughput vs the reference's headline number -----------
    # (MultiPassageBERT test: 2.505 samples/sec on 1xV100,
    # experiments/rc/viquae/metrics.json) — bert-base reader, M=24 passages
    # of seq 256 per question
    from viquae_tpu.models import qa

    rcfg = qa.ReaderConfig(bert=bert.BertConfig(add_pooler=False))
    r_params = qa.init(jax.random.fold_in(key, 3), rcfg)
    m_passages, r_seq, n_q = 24, 256, 8 if small else 16
    r_ids = jnp.asarray(
        rng.integers(1000, 10_000, (n_q * m_passages, r_seq)), jnp.int32
    )
    r_mask = jnp.ones_like(r_ids)

    @jax.jit
    def reader_step(params, ids, mask):
        out = qa.reader_apply(
            params, rcfg, ids, attention_mask=mask,
            m_passages=m_passages, deterministic=True,
            compute_dtype=jnp.bfloat16,
        )
        start_p = jnp.exp(jax.nn.log_softmax(out.start_logits, -1)).reshape(
            n_q, m_passages, r_seq
        )
        end_p = jnp.exp(jax.nn.log_softmax(out.end_logits, -1)).reshape(
            n_q, m_passages, r_seq
        )
        return qa.get_best_spans(start_p, end_p)

    out_r = reader_step(r_params, r_ids, r_mask)
    sync(out_r)
    t0 = time.time()
    for _ in range(reps):
        out_r = reader_step(r_params, r_ids, r_mask)
    sync(out_r)
    reader_sps = n_q / ((time.time() - t0) / reps)

    result = {
        "metric": "embed+search queries/sec over 1.5M-entity KB (1 chip)",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / NORTH_STAR_QPS, 4),
        "details": {
            "kb_rows": n_kb,
            "dim": dim,
            "k": k,
            "batch_ms": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "r_at_20_parity_vs_flat_fp32": round(float(overlap), 4),
            "encoder": "dpr-bert-base bf16 seq64",
            "topk_mode": "global",
            "approx_qps": round(approx_qps, 1),
            "approx_r_at_20_vs_exact": round(float(r20_approx), 4),
            "reader_samples_per_sec": round(reader_sps, 2),
            "reader_vs_reference_v100": round(reader_sps / 2.505, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # the tunneled TPU occasionally throws a transient INTERNAL error on
        # a fresh process; one retry reliably clears it
        print(f"bench attempt 1 failed ({e!r}); retrying once", file=sys.stderr)
        main()
