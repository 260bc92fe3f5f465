"""North-star benchmark: embed + retrieve ViQuAE-scale queries over a
1.5M-entity KB on the attached TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol (mirrors BASELINE.json): 1,257 test questions embedded by a
bert-base DPR question tower and searched against a 1.5M x 768 KB with the
EXACT single-pass MIPS engine (ops.mips_pallas.topk_fused — the Pallas
q-major scores+segmax kernel + one global selection), k=100. Question token
lengths are drawn from lognormal(ln 18, 0.35) clipped to [8, 64] — a
TriviaQA-style distribution (ViQuAE questions are rewritten TriviaQA
questions; the reference pads them all to 256 tokens,
experiments/ir/viquae/dpr/questions/config.json). The query tower runs the
PACKED path (ops/packing.py): many questions per row of one fixed
(rows, 64) canvas with block-diagonal attention — packed-vs-padded parity
is proven in tests/test_packing.py.

Parity keys (labels say exactly what was measured):
- approx_r_at_20_vs_exact_fullkb: lax.approx_max_k top-20 vs exact top-20,
  FULL 1.5M KB, on device, all 1,257 queries.
- r_at_20_fast_vs_exact_fullkb:   chunked two-level selection ("fast") vs
  exact, FULL KB, on device.
- r_at_20_fp32_contract_262k_slice: fp32-HIGHEST fast-vs-exact on a 262k
  slice — the FAISS-flat fp32 contract at bench scale; the full
  FAISS-tie-order contract is tested in tests/test_mips.py.
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


def r_at_20(idx, ref_idx, n):
    return float(np.mean([
        len(set(idx[i][:20]) & set(ref_idx[i][:20])) / 20 for i in range(n)
    ]))


def _bm25_corpus(n_docs: int, vocab_size: int = 400_000):
    """Synthetic Zipf passage corpus at KB scale (ops.bm25.synth_zipf_index)
    with an on-disk postings cache — the 1.5M build costs ~2 min of host
    time once, then loads in seconds."""
    from viquae_tpu.ops import bm25 as bm25_lib

    # cache key carries ALL generation params — a key of n_docs alone
    # silently reused a stale index after a vocab/corpus-shape change
    cache = os.path.join(
        os.path.dirname(__file__), ".bench_cache",
        f"bm25_{n_docs}_v{vocab_size}")
    if os.path.exists(os.path.join(cache, "postings.npz")):
        return bm25_lib.BM25Index.load(cache)
    index = bm25_lib.synth_zipf_index(n_docs, vocab_size=vocab_size)
    try:
        index.save(cache)
    except OSError:
        pass
    return index


def _image_chain_stage(jax, jnp, key, small, sync):
    """MTCNN cascade + ArcFace + CLIP ViT-B/32 + ImageNet RN50 items/s
    (bf16 compute, params as jit ARGS — closures embed 100s of MB of
    weight constants in the HLO and blow the remote-compile payload cap)."""
    import time as _time

    from viquae_tpu.models import arcface, clip as clip_lib, mtcnn
    from viquae_tpu.models import resnet as resnet_lib

    rng = np.random.default_rng(11)
    out = {}

    def timeit(fn, *a, n_items, reps=3):
        o = fn(*a); sync(o)
        t0 = _time.time()
        for _ in range(reps):
            o = fn(*a)
        sync(o)
        return n_items / ((_time.time() - t0) / reps)

    side, n_img = 256, 8 if small else 16
    mcfg = mtcnn.MTCNNConfig(canvas=side, min_face_size=20)
    m_params = mtcnn.init(jax.random.fold_in(key, 20))
    images = jnp.asarray(
        rng.uniform(0, 255, (n_img, side, side, 3)).astype(np.float32))
    hws = jnp.asarray(np.full((n_img, 2), float(side), np.float32))
    import functools
    out["mtcnn_images_per_s"] = round(timeit(
        jax.jit(functools.partial(mtcnn.detect_faces_batch, cfg=mcfg)),
        m_params, images, hws, n_items=n_img), 1)

    batch = 32 if small else 128
    acfg = arcface.ArcFaceConfig()
    a_params = arcface.init(jax.random.fold_in(key, 21), acfg)
    crops = jnp.asarray(
        rng.standard_normal((batch, 112, 112, 3)).astype(np.float32))
    out["arcface_faces_per_s"] = round(timeit(
        jax.jit(lambda p, x: arcface.apply(
            p, acfg, x, compute_dtype=jnp.bfloat16)),
        a_params, crops, n_items=batch), 1)

    vcfg = clip_lib.CLIPVisionConfig()
    v_params = clip_lib.vit_init(jax.random.fold_in(key, 22), vcfg)
    pixels = jnp.asarray(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
    out["clip_vit_images_per_s"] = round(timeit(
        jax.jit(lambda p, x: clip_lib.vit_apply(
            p, vcfg, x, compute_dtype=jnp.bfloat16)["image_embeds"]),
        v_params, pixels, n_items=batch), 1)

    rcfg = resnet_lib.ResNetConfig()
    r_params = resnet_lib.init(jax.random.fold_in(key, 23), rcfg)
    out["resnet50_images_per_s"] = round(timeit(
        jax.jit(lambda p, x: resnet_lib.apply(
            p, rcfg, x, compute_dtype=jnp.bfloat16)),
        r_params, pixels, n_items=batch), 1)

    # corpus wall-clock estimate: 1M images through the slowest embed tower
    slowest = min(out["clip_vit_images_per_s"],
                  out["resnet50_images_per_s"])
    out["corpus_1m_embed_minutes_est"] = round(1e6 / slowest / 60, 1)
    out["faces_506k_detect_minutes_est"] = round(
        506_237 / out["mtcnn_images_per_s"] / 60, 1)
    return out


def _train_stage(jax, jnp, key, small, sync):
    """One timed packed train step each for the biencoder (questions/s)
    and the ECA multimodal tower (pairs/s) — mirrors scripts/
    exp_train_packed.py and exp_train_eca_packed.py protocols."""
    import time as _time

    import optax

    from viquae_tpu.models import bert, dpr, mm
    from viquae_tpu.ops import packing
    from viquae_tpu.train import objectives

    rng = np.random.default_rng(12)

    # ---- packed biencoder step (N=64 questions x M=2 passages) ----------
    N, M = 64, 2
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = {
        "question": dpr.init(jax.random.fold_in(key, 30), cfg),
        "context": dpr.init(jax.random.fold_in(key, 31), cfg),
    }
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    q_lens = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, N)),
                     8, 64).astype(int)
    c_lens = np.clip(np.round(rng.normal(125, 8, N * M)), 100, 160
                     ).astype(int)
    pq = packing.pack_token_sequences(
        [rng.integers(1000, 10000, l).astype(np.int32) for l in q_lens],
        row_len=64, pad_rows_to=8)
    pc = packing.pack_token_sequences(
        [rng.integers(1000, 10000, l).astype(np.int32) for l in c_lens],
        row_len=256, pad_rows_to=8)
    pq_args = tuple(jnp.asarray(a) for a in (
        pq.input_ids, pq.segment_ids, pq.position_ids, pq.cls_rows,
        pq.cls_cols))
    pc_args = tuple(jnp.asarray(a) for a in (
        pc.input_ids, pc.segment_ids, pc.position_ids, pc.cls_rows,
        pc.cls_cols))
    labels = jnp.asarray((np.arange(N) * M).astype(np.int32))

    @jax.jit
    def step_biencoder(params, opt_state, pq_args, pc_args, labels):
        def loss(p):
            q = dpr.apply_packed(p["question"], cfg, *pq_args,
                                 deterministic=True,
                                 compute_dtype=jnp.bfloat16)
            c = dpr.apply_packed(p["context"], cfg, *pc_args,
                                 deterministic=True,
                                 compute_dtype=jnp.bfloat16)
            return objectives.biencoder_loss(q, c, labels)[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    o = step_biencoder(params, opt_state, pq_args, pc_args, labels)
    sync(o[2])
    reps = 3
    t0 = _time.time()
    for _ in range(reps):
        o = step_biencoder(params, opt_state, pq_args, pc_args, labels)
    sync(o[2])
    biencoder_qps = N / ((_time.time() - t0) / reps)
    del params, opt_state, o, pq_args, pc_args

    # ---- packed ECA step (MICT batch 512 pairs, per-layer remat) --------
    B, SEQ = 128 if small else 512, 256
    mcfg = mm.MMConfig(
        bert=bert.BertConfig(add_pooler=False),
        n_faces=4, face_dim=512, bbox_dim=7,
        image_dims=(("clip-RN50", 1024), ("imagenet-RN50", 2048)),
    )
    e_params = {
        "question": mm.eca_init(jax.random.fold_in(key, 32), mcfg),
        "context": mm.eca_init(jax.random.fold_in(key, 33), mcfg),
    }
    e_opt = tx.init(e_params)

    def mm_side(mu, sigma):
        lens = np.clip(
            np.round(rng.lognormal(np.log(mu), sigma, B)), 5, SEQ
        ).astype(int)
        ids = np.zeros((B, SEQ), np.int32)
        mask = np.zeros((B, SEQ), np.int32)
        for i, l in enumerate(lens):
            ids[i, :l] = rng.integers(1000, 20_000, l)
            mask[i, :l] = 1
        face_mask = np.zeros((B, 1, 4), np.int32)
        for i in np.nonzero(rng.random(B) < 0.4)[0]:
            face_mask[i, 0, : rng.integers(1, 5)] = 1
        inputs = {
            "text_inputs": {"input_ids": ids, "attention_mask": mask},
            "face_inputs": {
                "face": rng.standard_normal((B, 1, 4, 512)
                                            ).astype(np.float32),
                "bbox": rng.standard_normal((B, 1, 4, 7)
                                            ).astype(np.float32),
                "attention_mask": face_mask,
            },
            "image_inputs": {
                "clip-RN50": {
                    "input": rng.standard_normal((B, 1, 1024)
                                                 ).astype(np.float32),
                    "attention_mask": np.ones((B, 1), np.int32),
                },
                "imagenet-RN50": {
                    "input": rng.standard_normal((B, 1, 2048)
                                                 ).astype(np.float32),
                    "attention_mask": np.ones((B, 1), np.int32),
                },
            },
        }
        from viquae_tpu.train.data import pack_mm_text_inputs

        t_vis = 4 + 2
        inputs["text_inputs"] = {
            **inputs["text_inputs"],
            **pack_mm_text_inputs(inputs, SEQ + t_vis),
        }
        return inputs

    batch = {
        "question_inputs": mm_side(18.0, 0.35),
        "context_inputs": mm_side(64.0, 0.30),
        "labels": np.arange(B, dtype=np.int32),
    }
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    def enc(p, inputs):
        t = inputs["text_inputs"]
        return mm.eca_apply_packed(
            p, mcfg, t["canvas_input_ids"], t["canvas_segment_ids"],
            t["canvas_position_ids"], t["canvas_cls_rows"],
            t["canvas_cls_cols"], t["canvas_vis_rows"],
            t["canvas_vis_cols"], inputs["face_inputs"],
            inputs["image_inputs"], deterministic=True,
            compute_dtype=jnp.bfloat16, remat_layers=True,
        )[:B]

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_eca(params, opt_state, batch):
        def loss(p):
            q = enc(p["question"], batch["question_inputs"])
            c = enc(p["context"], batch["context_inputs"])
            return objectives.biencoder_loss(q, c, batch["labels"])[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    e_params, e_opt, l = step_eca(e_params, e_opt, batch)
    sync(l)
    t0 = _time.time()
    for _ in range(reps):
        e_params, e_opt, l = step_eca(e_params, e_opt, batch)
    sync(l)
    eca_pps = B / ((_time.time() - t0) / reps)
    return biencoder_qps, eca_pps


def main():
    small = bool(int(os.environ.get("BENCH_SMALL", "0")))
    import jax

    # persistent compilation cache: first-ever compile over the tunneled TPU
    # can take minutes; cached executables make reruns start in seconds
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # BENCH_PLATFORM=cpu: run the whole bench program flow on the virtual
    # CPU backend — a functional smoke of every stage (numbers meaningless)
    # for when the TPU tunnel is down; pairs with BENCH_SMALL=1
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    # backend-init deadline: a tunnel outage makes jax.devices() itself hang
    # (observed 25 min before UNAVAILABLE on 2026-08-17) inside native PJRT
    # code where no python exception can interrupt — fail FAST so the
    # driver sees a clear error instead of the watchdog burning 45 min
    import threading as _threading

    def _init_watchdog():
        print("bench: TPU backend init exceeded 600s (tunnel down?); "
              "exiting", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    _init_timer = _threading.Timer(600, _init_watchdog)
    _init_timer.daemon = True
    _init_timer.start()
    jax.devices()
    _init_timer.cancel()
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips, packing

    n_kb = 150_000 if small else 1_500_000
    dim = 768
    n_queries = 1257
    row_len = 64
    k = 100
    q_pad = 1280  # CLS slots padded to an MXU-friendly count
    # degraded half-batch protocol (attempt 3): free HBM on this SHARED
    # chip fluctuates (observed 2026-08-18: 8GB single allocs failing);
    # when two full-batch attempts OOM, halving the query batch halves
    # the 3.8GB score buffer and every downstream serving batch — a lower
    # but honest number beats no BENCH at all
    degraded = os.environ.get("VIQUAE_BENCH_HALF") == "1"
    if degraded:
        n_queries, q_pad = 628, 640

    key = jax.random.key(0)
    kb = jax.random.normal(jax.random.fold_in(key, 1), (n_kb, dim), jnp.bfloat16)
    # scale like unit-ish embeddings
    kb = kb / np.sqrt(dim)

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.fold_in(key, 2), cfg)
    # a bf16 serving deployment stores bf16 weights: precasting skips the
    # per-forward f32->bf16 conversion reads (~440MB f32/step). The fp32
    # FAISS-contract path keeps the f32 originals.
    params16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params
    )

    # realistic question lengths (see module docstring); fixed seed keeps the
    # packed canvas shape stable across runs -> compile-cache hits
    rng = np.random.default_rng(0)
    # n_queries=1257 always draws the same lengths for the same seed; the
    # degraded protocol takes a prefix of the same distribution
    lengths = np.clip(
        np.round(rng.lognormal(np.log(18.0), 0.35, n_queries)), 8, row_len
    ).astype(int)
    seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32) for l in lengths]
    packed = packing.pack_token_sequences(
        seqs, row_len=row_len, n_cls=q_pad, pad_rows_to=32
    )
    p_args = tuple(
        jnp.asarray(a) for a in (
            packed.input_ids, packed.segment_ids, packed.position_ids,
            packed.cls_rows, packed.cls_cols,
        )
    )

    def embed_packed(params, ids, seg, pos, cr, cc):
        return dpr.apply_packed(
            params, cfg, ids, seg, pos, cr, cc,
            deterministic=True, compute_dtype=jnp.bfloat16,
        ).astype(jnp.bfloat16)

    from viquae_tpu.ops import mips_pallas

    # ======================================================================
    # stage 1: paths that need the ROW-major (N, d) KB — run these first so
    # the matrix can be freed before the (d, N) layout + 3.8GB score buffer
    # come up (holding both layouts OOMs the chip)
    # ======================================================================

    # ---- full-KB "fast" chunked selection (compared to exact later) ------
    @jax.jit
    def embed_only(params, ids, seg, pos, cr, cc):
        return embed_packed(params, ids, seg, pos, cr, cc)

    q_dev = embed_only(params16, *p_args)  # same weights as the exact path
    _, idx_fast = mips.topk_single(
        q_dev, kb, k, chunk_size=min(n_kb, 262_144),
        compute_dtype=jnp.bfloat16, mode="fast",
    )
    idx_fast = np.asarray(idx_fast)
    # exact selection over the SAME q_dev: the fused program re-embeds in
    # a different XLA program, so comparing the fast path against ITS
    # output would fold bf16 cross-program embedding tie swaps into the
    # selection-contract metric (a real fast-path regression could hide
    # behind that accepted noise)
    _, idx_exact_q = mips.topk_global(
        q_dev, kb, k, valid_rows=jnp.int32(n_kb),
        compute_dtype=jnp.bfloat16,
    )
    idx_exact_q = np.asarray(idx_exact_q)

    # ---- fp32 FAISS-flat contract on a 262k slice ------------------------
    # (precision=HIGHEST fast vs exact; full-scale FAISS tie-order contract
    # lives in tests/test_mips.py — pulling the 4.6GB fp32 KB to host over
    # the tunnel is too slow for the bench)
    n_check = 16 if small else 64
    slice_rows = min(n_kb, 262144)
    # jitted: an eager 12-layer forward over the tunnel is hundreds of
    # per-primitive remote dispatches (minutes inside the watchdog budget)
    fp32_fwd = jax.jit(lambda p, *a: dpr.apply_packed(
        p, cfg, *a, deterministic=True, compute_dtype=jnp.float32))
    q_fp32 = fp32_fwd(params, *p_args)[:n_check]
    kb_f32 = kb[:slice_rows].astype(jnp.float32)
    _, idx = mips.topk_single(
        jnp.asarray(q_fp32), kb_f32, 20,
        chunk_size=slice_rows, compute_dtype=jnp.float32, mode="fast",
    )
    _, ref_idx = mips.topk_single(
        jnp.asarray(q_fp32), kb_f32, 20,
        chunk_size=slice_rows, compute_dtype=jnp.float32, mode="exact",
    )
    overlap = r_at_20(np.asarray(idx), np.asarray(ref_idx), n_check)
    del kb_f32, q_fp32, q_dev, idx, ref_idx
    del params  # f32 originals: only the fp32-contract stage needs them

    # ======================================================================
    # stage 2: transpose to the (d, N) kernel layout, FREE the row-major
    # copy, and run the headline exact (Pallas fused) + approx paths on it
    # ======================================================================
    kbt = mips_pallas.to_kernel_layout(kb)
    sync(kbt)
    del kb

    @jax.jit
    def embed_and_search(params, ids, seg, pos, cr, cc, kbt):
        # exact path: Pallas q-major fused scores+segmax kernel (54.1 ms vs
        # 69.8 ms XLA topk_global at this shape) + one global selection
        q = embed_packed(params, ids, seg, pos, cr, cc)
        return mips_pallas.topk_fused(q, kbt, k, valid_rows=jnp.int32(n_kb))

    @jax.jit
    def embed_and_search_approx(params, ids, seg, pos, cr, cc, kbt):
        q = embed_packed(params, ids, seg, pos, cr, cc)
        return mips.topk_global(
            q, kbt, k, valid_rows=jnp.int32(n_kb),
            compute_dtype=jnp.bfloat16, mode="approx", transposed=True,
        )

    # compile + warmup
    t0 = time.time()
    out = embed_and_search(params16, *p_args, kbt)
    sync(out)
    compile_s = time.time() - t0

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = embed_and_search(params16, *p_args, kbt)
    sync(out)
    dt = (time.time() - t0) / reps
    qps = n_queries / dt  # count only the real 1,257 queries

    # ---- approx variant (lax.approx_max_k fused into the matmul) --------
    out_a = embed_and_search_approx(params16, *p_args, kbt)
    sync(out_a)
    t0 = time.time()
    for _ in range(reps):
        out_a = embed_and_search_approx(params16, *p_args, kbt)
    sync(out_a)
    approx_qps = n_queries / ((time.time() - t0) / reps)
    idx_exact = np.asarray(out[1])
    idx_approx = np.asarray(out_a[1])
    r20_approx = r_at_20(idx_approx, idx_exact, n_queries)
    r20_fast = r_at_20(idx_fast, idx_exact_q, n_queries)
    del out, out_a  # free device result buffers before the fusion stage

    # ---- hybrid sparse+dense (BM25 C++ MaxScore on host, overlapped with
    # the in-flight dense program, fused on device — the reference's hybrid
    # retrieval mode, meerqat/ir/search.py:268-293, tuned b=.3/k1=.5) ------
    from viquae_tpu.ops import fusion as fusion_ops

    bm25_index = _bm25_corpus(n_kb)
    bm25_rng = np.random.default_rng(3)
    bm25_queries = [
        " ".join(f"t{(int(z) - 1) % 400_000}"
                 for z in bm25_rng.zipf(1.2, 8))
        for _ in range(n_queries)
    ]

    @jax.jit
    def fuse_hybrid(d_s, d_i, b_s, b_i):
        return fusion_ops.fuse_topk(
            (d_s, b_s), (d_i.astype(jnp.int32), b_i), (0.7, 0.3), k,
            norm="gzmuv", valid_queries=jnp.int32(n_queries),
        )

    def one_hybrid_pass():
        d_s, d_i = embed_and_search(params16, *p_args, kbt)  # async
        bs, bi = bm25_index.search_batch(bm25_queries, k=k)  # host overlap
        b_s = np.full((q_pad, k), -np.inf, np.float32)
        b_i = np.full((q_pad, k), np.iinfo(np.int32).max, np.int32)
        for row, (ss, ii) in enumerate(zip(bs, bi)):
            b_s[row, : len(ss)] = ss
            b_i[row, : len(ii)] = ii
        return fuse_hybrid(d_s, d_i, jnp.asarray(b_s), jnp.asarray(b_i))

    # bm25 alone (host, single core); build the MaxScore upper bounds
    # (one-off index cost) AND warm the lazy C++ scorer (first call may
    # g++-compile / ctypes-load the .so) before timing queries
    _ = bm25_index.term_ub
    bm25_index.search_batch(bm25_queries[:8], k=k)
    t0 = time.time()
    bm25_index.search_batch(bm25_queries, k=k)
    bm25_qps = n_queries / (time.time() - t0)
    out_h = one_hybrid_pass()
    sync(out_h)
    t0 = time.time()
    h_reps = 2
    for _ in range(h_reps):
        out_h = one_hybrid_pass()
    sync(out_h)
    hybrid_qps = n_queries / ((time.time() - t0) / h_reps)
    del out_h

    # ---- 3-index late fusion in ONE program (the reference's best-quality
    # config shape: dpr+arcface+clip wsum [0.6,0.2,0.2], gzmuv, defmin —
    # experiments/ir/viquae/dpr+clip-cross-modal/config_test.json): packed
    # embed + dpr Pallas-exact + clip/face approx + ops.fusion.fuse_topk.
    # The reference runs fusion offline over run files.
    n_clip = n_kb
    n_face = 50_624 if small else 506_237  # humans_with_faces
    kb_clip = jax.random.normal(
        jax.random.fold_in(key, 7), (n_clip, 512), jnp.bfloat16
    ) / np.sqrt(512)
    kb_face = jax.random.normal(
        jax.random.fold_in(key, 8), (n_face, 512), jnp.bfloat16
    ) / np.sqrt(512)
    q_clip = jax.random.normal(
        jax.random.fold_in(key, 9), (q_pad, 512), jnp.bfloat16)
    q_face = jax.random.normal(
        jax.random.fold_in(key, 10), (q_pad, 512), jnp.bfloat16)

    @jax.jit
    def fusion_program(params, ids, seg, pos, cr, cc, q_clip, q_face,
                       kbt, kb_clip, kb_face):
        q = embed_packed(params, ids, seg, pos, cr, cc)
        s0, i0 = mips_pallas.topk_fused(q, kbt, k,
                                        valid_rows=jnp.int32(n_kb))
        s1, i1 = mips.topk_global(q_clip, kb_clip, k,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        s2, i2 = mips.topk_global(q_face, kb_face, k,
                                  compute_dtype=jnp.bfloat16, mode="approx")
        return fusion_ops.fuse_topk(
            (s0, s1, s2),
            (i0.astype(jnp.int32), i1.astype(jnp.int32),
             i2.astype(jnp.int32)),
            (0.6, 0.2, 0.2), k, norm="gzmuv",
            valid_queries=jnp.int32(n_queries),
        )

    out_f = fusion_program(params16, *p_args, q_clip, q_face,
                           kbt, kb_clip, kb_face)
    sync(out_f)
    t0 = time.time()
    for _ in range(reps):
        out_f = fusion_program(params16, *p_args, q_clip, q_face,
                               kbt, kb_clip, kb_face)
    sync(out_f)
    fusion_qps = n_queries / ((time.time() - t0) / reps)
    del kb_clip, kb_face, q_clip, q_face, out_f, kbt

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

    # ---- PACKED reader: same model, (question, passage) pairs at their
    # REAL lengths — the reference's passages are exactly 100 tokenizer
    # tokens (meerqat/data/loading.py:274-306), so a pair is ~125 tokens,
    # not 256; many pairs share each canvas row (qa.reader_apply_packed,
    # parity-tested in tests/test_packing.py)
    pair_lens = np.clip(
        np.round(rng.lognormal(np.log(18.0), 0.35, n_q * m_passages)),
        8, 64,
    ).astype(int) + 100 + 3
    pair_seqs = [
        rng.integers(1000, 10_000, size=int(l)).astype(np.int32)
        for l in pair_lens
    ]
    rp = packing.pack_token_sequences(
        pair_seqs, row_len=r_seq, pad_rows_to=16
    )
    tt = packing.pack_parallel(
        rp, [np.r_[np.zeros(int(l) - 101, np.int32), np.ones(101, np.int32)]
             for l in pair_lens]
    )
    g_idx, g_mask = packing.gather_indices(rp, r_seq)

    @jax.jit
    def reader_step_packed(params, ids, seg, pos, tt, g_idx, g_mask):
        out = qa.reader_apply_packed(
            params, rcfg, ids, seg, pos, tt, g_idx, g_mask,
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

    rp_args = tuple(jnp.asarray(a) for a in (
        rp.input_ids, rp.segment_ids, rp.position_ids, tt, g_idx, g_mask
    ))
    out_rp = reader_step_packed(r_params, *rp_args)
    sync(out_rp)
    t0 = time.time()
    for _ in range(reps):
        out_rp = reader_step_packed(r_params, *rp_args)
    sync(out_rp)
    reader_packed_sps = n_q / ((time.time() - t0) / reps)
    del out_r, out_rp, r_ids, r_mask, rp_args

    # ---- image/face chain (the offline corpus stages: the reference
    # embeds ~1M+ images + detects faces over 506k humans —
    # meerqat/image/embedding.py:169-183, face_detection.py:87-139) -------
    image_chain = _image_chain_stage(jax, jnp, key, small, sync)

    # ---- train-step throughput (driver-tracked: a packing or remat
    # regression in training must move the bench) ------------------------
    train_biencoder_qps, train_eca_pps = _train_stage(
        jax, jnp, key, small, sync)

    result = {
        "metric": "embed+search queries/sec over 1.5M-entity KB (1 chip, exact)",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / NORTH_STAR_QPS, 4),
        "details": {
            "kb_rows": n_kb,
            "dim": dim,
            "k": k,
            **({"degraded_half_batch":
                f"{n_queries} queries / {q_pad}-slot canvas (two "
                "full-batch attempts OOMed; shared-chip HBM floor)"}
               if degraded else {}),
            "batch_ms": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "encoder": "dpr-bert-base bf16, packed canvas "
                       f"({packed.rows}x{row_len}, density "
                       f"{packing.packing_efficiency(packed):.3f})",
            "question_len_tokens": "lognormal(ln18,0.35) clip [8,64], "
                                   f"mean {lengths.mean():.1f}",
            "topk_mode": "pallas-fused scores+segmax kernel, exact global selection, bf16 scores",
            "approx_qps": round(approx_qps, 1),
            "fusion_3index_qps": round(fusion_qps, 1),
            "fusion_3index_config": "dpr(1.5Mx768 pallas-exact) + "
                                    "clip(1.5Mx512 approx) + "
                                    "face(506kx512 approx), wsum "
                                    "[.6,.2,.2] gzmuv defmin, one program",
            "approx_r_at_20_vs_exact_fullkb": round(r20_approx, 4),
            "r_at_20_fast_vs_exact_fullkb": round(r20_fast, 4),
            "r_at_20_fp32_contract_262k_slice": round(overlap, 4),
            "reader_samples_per_sec": round(reader_sps, 2),
            "reader_vs_reference_v100": round(reader_sps / 2.505, 1),
            "reader_packed_samples_per_sec": round(reader_packed_sps, 2),
            "reader_packed_vs_reference_v100": round(
                reader_packed_sps / 2.505, 1),
            "reader_packed_canvas": f"{rp.rows}x{r_seq} density "
                                    f"{packing.packing_efficiency(rp):.3f}",
            "bm25_qps": round(bm25_qps, 1),
            "bm25_config": f"{n_kb} Zipf passages, 400k vocab, C++ "
                           "MaxScore, b=0.3 k1=0.5, k=100, "
                           f"{os.cpu_count()} host core(s)",
            "hybrid_qps": round(hybrid_qps, 1),
            "hybrid_config": "dense pallas-exact (device, overlapped) + "
                             "bm25 (host) + device gzmuv fusion [.7,.3]",
            "image_chain": image_chain,
            "train_biencoder_qps": round(train_biencoder_qps, 1),
            "train_eca_pps": round(train_eca_pps, 1),
            "train_config": "packed canvases; biencoder 64qx2p bf16 sgd; "
                            "ECA MICT batch "
                            f"{128 if small else 512} pairs, per-layer "
                            "remat",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import threading

    # the tunnel occasionally HANGS a dispatch outright (15+ min, zero
    # output, 0% CPU — CLAUDE.md round-2 notes). That hang blocks inside
    # the native PJRT client, where a SIGALRM python handler would never
    # run; a daemon watchdog THREAD force-exits instead so the driver sees
    # a fast failure rather than a lost run.
    def _watchdog():
        print("bench watchdog: no completion within budget; exiting",
              file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    timer = threading.Timer(2700, _watchdog)
    timer.daemon = True
    timer.start()
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # the tunneled TPU occasionally throws a transient INTERNAL error
        # on a fresh process; one retry reliably clears it. Retry in a
        # FRESH process (CLAUDE.md): exec replaces this one, so the
        # exception traceback's multi-GB device buffers are freed, the
        # PJRT client re-initializes, and the watchdog budget re-arms —
        # an in-process retry held attempt 1's kb/kbt alive through the
        # traceback and re-allocated on a near-full chip.
        attempt = os.environ.get("VIQUAE_BENCH_RETRY", "0")
        if attempt == "2" or (
            attempt == "1"
            and "RESOURCE_EXHAUSTED" not in repr(e)
        ):
            raise
        if attempt == "1":
            # two full-batch attempts failed on HBM: final attempt runs
            # the half-batch protocol (halves the score buffer + every
            # serving batch) so the driver still records a number
            print(f"bench attempt 2 failed on HBM ({e!r}); final attempt "
                  "runs the degraded half-batch protocol", file=sys.stderr)
            env = dict(os.environ, VIQUAE_BENCH_RETRY="2",
                       VIQUAE_BENCH_HALF="1")
        else:
            print(f"bench attempt 1 failed ({e!r}); retrying in a fresh "
                  f"process", file=sys.stderr)
            env = dict(os.environ, VIQUAE_BENCH_RETRY="1")
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)
    timer.cancel()
