"""Roofline/MFU audit for every BENCH stage (VERDICT r4 item 4).

For each bench.py stage this script answers: how far is the measured
throughput from the chip's shape-limited compute peak?

  achieved TFLOP/s = FLOPs/item (XLA cost analysis of the SAME program at
                     the SAME shapes)  x  measured items/s (BENCH json)
  MFU             = achieved / shape-class peak (measured matmul/conv
                     microbenches on THIS chip, not the 197 TFLOP/s
                     datasheet number)

Three subcommands (composable):

  python scripts/roofline.py flops   --out fixtures/roofline_flops.json
      CPU-only: lowers each stage's jitted program on the virtual CPU
      platform and extracts XLA's FLOP count. No TPU needed.
  python scripts/roofline.py peaks   --out fixtures/roofline_peaks.json
      TPU: times one representative bf16 matmul per shape class (bert
      GEMM rows x 768x3072, ViT rows, search 768-contraction, 8192^3).
  python scripts/roofline.py table   --bench BENCH_r04.json
      Joins flops x peaks x a BENCH json into the PARITY.md markdown
      table; exits non-zero if any stage lacks an entry.

FLOP counts are of the EXECUTED program (remat recompute included), so
MFU here is "how busy is the MXU", not the model-FLOPs MFU convention;
stages where the two differ (ECA: per-layer remat) list both.

Reference for the audited stages: bench.py stage_* constructors; shapes
are kept in lockstep (test_roofline pins them against bench.Ctx).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

# shapes mirrored from bench.py (Ctx + stage_* constructors); full batch
N_QUERIES, Q_PAD, ROW_LEN = 1257, 1280, 64
N_KB, DIM, K = 1_500_000, 768, 100
READER_NQ, READER_M, READER_SEQ = 16, 24, 256
BI_N, BI_M = 64, 2
ECA_B, ECA_SEQ = 512, 256
IMG_BATCH, MTCNN_N, MTCNN_SIDE = 128, 16, 256


def _force_cpu():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def _flops_of(jitted, *args) -> float:
    """XLA FLOP count of the lowered (unoptimized) program. Dots dominate
    every audited stage, and dot FLOPs are identical pre/post fusion."""
    low = jitted.lower(*args)
    cost = low.cost_analysis()
    if isinstance(cost, (list, tuple)):  # per-device list on some versions
        cost = cost[0]
    f = float(cost.get("flops", float("nan")))
    if not np.isfinite(f) or f <= 0:
        f = float(low.compile().cost_analysis()["flops"])
    return f


# ---------------------------------------------------------------------------
# stage program constructors (shapes in lockstep with bench.py stage_*)
# ---------------------------------------------------------------------------
def _packed_canvas(jnp, rng, n_seqs, row_len, mu, sigma, lo, hi,
                   n_cls=None, pad_rows_to=32, offset=0):
    from viquae_tpu.ops import packing

    lengths = np.clip(np.round(rng.lognormal(np.log(mu), sigma, n_seqs)),
                      lo, hi).astype(int) + offset
    seqs = [rng.integers(1000, 10_000, size=int(l)).astype(np.int32)
            for l in lengths]
    packed = packing.pack_token_sequences(
        seqs, row_len=row_len, n_cls=n_cls, pad_rows_to=pad_rows_to)
    return packed, lengths


def flops_embed(jax, jnp):
    """stage_exact's embed leg: DPR tower over the packed question canvas
    (bench.py Ctx.model / Ctx.embed_packed)."""
    from viquae_tpu.models import bert, dpr

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = dpr.init(jax.random.key(2), cfg)
    params16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    packed, _ = _packed_canvas(jnp, rng, N_QUERIES, ROW_LEN, 18.0, 0.35,
                               8, ROW_LEN, n_cls=Q_PAD)
    p_args = tuple(jnp.asarray(a) for a in (
        packed.input_ids, packed.segment_ids, packed.position_ids,
        packed.cls_rows, packed.cls_cols))

    @jax.jit
    def embed(params, ids, seg, pos, cr, cc):
        return dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                                deterministic=True,
                                compute_dtype=jnp.bfloat16)

    return {"flops": _flops_of(embed, params16, *p_args),
            "items": N_QUERIES, "unit": "query",
            "note": f"packed canvas {packed.rows}x{ROW_LEN}"}


def flops_search_exact(jax, jnp):
    """stage_exact's search leg: scores matmul + segmax + global top-k.
    The Pallas kernel's FLOPs are the same 2*Q*N*d matmul; audit the XLA
    twin (mips.topk_global transposed) which XLA can count."""
    from viquae_tpu.ops import mips

    import jax

    # abstract avals: lowering never materializes the 2.3GB KB on host
    q = jax.ShapeDtypeStruct((Q_PAD, DIM), jnp.bfloat16)
    kbt = jax.ShapeDtypeStruct((DIM, N_KB + (-N_KB) % 512), jnp.bfloat16)

    @jax.jit
    def search(q, kbt):
        return mips.topk_global(q, kbt, K, valid_rows=jnp.int32(N_KB),
                                compute_dtype=jnp.bfloat16,
                                transposed=True)

    return {"flops": _flops_of(search, q, kbt), "items": N_QUERIES,
            "unit": "query", "note": "XLA twin of the Pallas fused kernel"}


def flops_reader(jax, jnp, packed=True):
    """stage_reader packed variant (the benched headline)."""
    from viquae_tpu.models import bert, qa
    from viquae_tpu.ops import packing

    rng = np.random.default_rng(5)
    rcfg = qa.ReaderConfig(bert=bert.BertConfig(add_pooler=False))
    r_params = qa.init(jax.random.key(3), rcfg)
    n_pairs = READER_NQ * READER_M
    if not packed:
        ids = jnp.zeros((n_pairs, READER_SEQ), jnp.int32)
        mask = jnp.ones_like(ids)

        @jax.jit
        def reader_step(params, ids, mask):
            out = qa.reader_apply(params, rcfg, ids, attention_mask=mask,
                                  m_passages=READER_M, deterministic=True,
                                  compute_dtype=jnp.bfloat16)
            sp = jax.nn.softmax(out.start_logits, -1).reshape(
                READER_NQ, READER_M, READER_SEQ)
            ep = jax.nn.softmax(out.end_logits, -1).reshape(
                READER_NQ, READER_M, READER_SEQ)
            return qa.get_best_spans(sp, ep)

        return {"flops": _flops_of(reader_step, r_params, ids, mask),
                "items": READER_NQ, "unit": "question",
                "note": f"padded {n_pairs}x{READER_SEQ}"}

    pair_lens = np.clip(
        np.round(rng.lognormal(np.log(18.0), 0.35, n_pairs)),
        8, 64).astype(int) + 100 + 3
    pair_seqs = [rng.integers(1000, 10_000, size=int(l)).astype(np.int32)
                 for l in pair_lens]
    rp = packing.pack_token_sequences(pair_seqs, row_len=READER_SEQ,
                                      pad_rows_to=16)
    tt = packing.pack_parallel(
        rp, [np.r_[np.zeros(int(l) - 101, np.int32),
                   np.ones(101, np.int32)]
             for l in pair_lens])
    g_idx, g_mask = packing.gather_indices(rp, READER_SEQ)
    rp_args = tuple(jnp.asarray(a) for a in (
        rp.input_ids, rp.segment_ids, rp.position_ids, tt, g_idx, g_mask))

    @jax.jit
    def reader_step_packed(params, ids, seg, pos, tt, g_idx, g_mask):
        out = qa.reader_apply_packed(
            params, rcfg, ids, seg, pos, tt, g_idx, g_mask,
            m_passages=READER_M, deterministic=True,
            compute_dtype=jnp.bfloat16)
        sp = jax.nn.softmax(out.start_logits, -1).reshape(
            READER_NQ, READER_M, READER_SEQ)
        ep = jax.nn.softmax(out.end_logits, -1).reshape(
            READER_NQ, READER_M, READER_SEQ)
        return qa.get_best_spans(sp, ep)

    return {"flops": _flops_of(reader_step_packed, r_params, *rp_args),
            "items": READER_NQ, "unit": "question",
            "note": f"packed canvas {rp.rows}x{READER_SEQ}"}


def flops_biencoder(jax, jnp):
    """stage_train's packed biencoder step (fwd+bwd+sgd)."""
    import optax

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.train import objectives

    rng = np.random.default_rng(12)
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = {"question": dpr.init(jax.random.key(30), cfg),
              "context": dpr.init(jax.random.key(31), cfg)}
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    pq, _ = _packed_canvas(jnp, rng, BI_N, 64, 18.0, 0.35, 8, 64,
                           pad_rows_to=8)
    pc, _ = _packed_canvas(jnp, rng, BI_N * BI_M, 256, 125.0, 0.06, 100,
                           160, pad_rows_to=8)
    pq_args = tuple(jnp.asarray(a) for a in (
        pq.input_ids, pq.segment_ids, pq.position_ids, pq.cls_rows,
        pq.cls_cols))
    pc_args = tuple(jnp.asarray(a) for a in (
        pc.input_ids, pc.segment_ids, pc.position_ids, pc.cls_rows,
        pc.cls_cols))
    labels = jnp.asarray((np.arange(BI_N) * BI_M).astype(np.int32))

    @jax.jit
    def step(params, opt_state, pq_args, pc_args, labels):
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

    return {"flops": _flops_of(step, params, opt_state, pq_args, pc_args,
                               labels),
            "items": BI_N, "unit": "question",
            "note": "fwd+bwd+sgd, both towers"}


def flops_eca(jax, jnp):
    """stage_train's packed ECA step (fwd+bwd+sgd, per-layer remat).
    XLA counts the EXECUTED flops, i.e. remat recompute included."""
    import functools

    import optax

    from viquae_tpu.models import bert, mm
    from viquae_tpu.train import objectives
    from viquae_tpu.train.data import pack_mm_text_inputs

    rng = np.random.default_rng(12)
    B, SEQ = ECA_B, ECA_SEQ
    mcfg = mm.MMConfig(
        bert=bert.BertConfig(add_pooler=False),
        n_faces=4, face_dim=512, bbox_dim=7,
        image_dims=(("clip-RN50", 1024), ("imagenet-RN50", 2048)),
    )
    e_params = {"question": mm.eca_init(jax.random.key(32), mcfg),
                "context": mm.eca_init(jax.random.key(33), mcfg)}
    tx = optax.sgd(1e-3)
    e_opt = tx.init(e_params)

    def mm_side(mu, sigma):
        lens = np.clip(np.round(rng.lognormal(np.log(mu), sigma, B)),
                       5, SEQ).astype(int)
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
        inputs["text_inputs"] = {
            **inputs["text_inputs"],
            **pack_mm_text_inputs(inputs, SEQ + 6),
        }
        return inputs

    batch = {"question_inputs": mm_side(18.0, 0.35),
             "context_inputs": mm_side(64.0, 0.30),
             "labels": np.arange(B, dtype=np.int32)}
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

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        def loss(p):
            q = enc(p["question"], batch["question_inputs"])
            c = enc(p["context"], batch["context_inputs"])
            return objectives.biencoder_loss(q, c, batch["labels"])[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    f = _flops_of(step, e_params, e_opt, batch)

    # model-FLOPs variant (no remat) for the MFU-convention number
    def enc_nr(p, inputs):
        t = inputs["text_inputs"]
        return mm.eca_apply_packed(
            p, mcfg, t["canvas_input_ids"], t["canvas_segment_ids"],
            t["canvas_position_ids"], t["canvas_cls_rows"],
            t["canvas_cls_cols"], t["canvas_vis_rows"],
            t["canvas_vis_cols"], inputs["face_inputs"],
            inputs["image_inputs"], deterministic=True,
            compute_dtype=jnp.bfloat16, remat_layers=False,
        )[:B]

    @jax.jit
    def step_nr(params, opt_state, batch):
        def loss(p):
            q = enc_nr(p["question"], batch["question_inputs"])
            c = enc_nr(p["context"], batch["context_inputs"])
            return objectives.biencoder_loss(q, c, batch["labels"])[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    f_model = _flops_of(step_nr, e_params, e_opt, batch)
    return {"flops": f, "model_flops": f_model, "items": ECA_B,
            "unit": "pair", "note": "executed flops incl per-layer remat"}


def flops_towers(jax, jnp):
    """stage_image_chain: MTCNN cascade + the three embed towers."""
    import functools

    from viquae_tpu.models import arcface, clip as clip_lib, mtcnn
    from viquae_tpu.models import resnet as resnet_lib

    out = {}
    mcfg = mtcnn.MTCNNConfig(canvas=MTCNN_SIDE, min_face_size=20)
    m_params = mtcnn.init(jax.random.key(20))
    images = jnp.zeros((MTCNN_N, MTCNN_SIDE, MTCNN_SIDE, 3), jnp.float32)
    hws = jnp.full((MTCNN_N, 2), float(MTCNN_SIDE), jnp.float32)
    out["mtcnn"] = {
        "flops": _flops_of(
            jax.jit(functools.partial(mtcnn.detect_faces_batch, cfg=mcfg)),
            m_params, images, hws),
        "items": MTCNN_N, "unit": "image",
        "note": "full cascade, worst-case static candidate counts"}

    acfg = arcface.ArcFaceConfig()
    a_params = arcface.init(jax.random.key(21), acfg)
    crops = jnp.zeros((IMG_BATCH, 112, 112, 3), jnp.float32)
    out["arcface"] = {
        "flops": _flops_of(
            jax.jit(lambda p, x: arcface.apply(
                p, acfg, x, compute_dtype=jnp.bfloat16)), a_params, crops),
        "items": IMG_BATCH, "unit": "face", "note": "iresnet100 112x112"}

    vcfg = clip_lib.CLIPVisionConfig()
    v_params = clip_lib.vit_init(jax.random.key(22), vcfg)
    pixels = jnp.zeros((IMG_BATCH, 224, 224, 3), jnp.float32)
    out["clip_vit"] = {
        "flops": _flops_of(
            jax.jit(lambda p, x: clip_lib.vit_apply(
                p, vcfg, x, compute_dtype=jnp.bfloat16)["image_embeds"]),
            v_params, pixels),
        "items": IMG_BATCH, "unit": "image", "note": "ViT-B/32 224x224"}

    rcfg = resnet_lib.ResNetConfig()
    r_params = resnet_lib.init(jax.random.key(23), rcfg)
    out["resnet50"] = {
        "flops": _flops_of(
            jax.jit(lambda p, x: resnet_lib.apply(
                p, rcfg, x, compute_dtype=jnp.bfloat16)), r_params,
            pixels),
        "items": IMG_BATCH, "unit": "image", "note": "RN50 224x224"}
    return out


def cmd_flops(args):
    jax = _force_cpu()
    import jax.numpy as jnp

    only = set(args.stages.split(",")) if args.stages else None
    out = {}
    todo = {
        "embed": lambda: flops_embed(jax, jnp),
        "search_exact": lambda: flops_search_exact(jax, jnp),
        "reader_packed": lambda: flops_reader(jax, jnp, packed=True),
        "reader_padded": lambda: flops_reader(jax, jnp, packed=False),
        "train_biencoder": lambda: flops_biencoder(jax, jnp),
        "train_eca": lambda: flops_eca(jax, jnp),
    }
    for name, fn in todo.items():
        if only and name not in only:
            continue
        t0 = time.time()
        out[name] = fn()
        out[name]["lower_s"] = round(time.time() - t0, 1)
        print(f"{name}: {out[name]['flops']:.3e} flops "
              f"({out[name]['lower_s']}s)", file=sys.stderr)
    if not only or only & {"mtcnn", "arcface", "clip_vit", "resnet50"}:
        towers = flops_towers(jax, jnp)
        if only:
            towers = {k: v for k, v in towers.items() if k in only}
        out.update(towers)
        for k, v in towers.items():
            print(f"{k}: {v['flops']:.3e} flops", file=sys.stderr)
    _merge_out(args.out, out, "flops")


# ---------------------------------------------------------------------------
# shape-class peaks (TPU)
# ---------------------------------------------------------------------------
PEAK_SHAPES = {
    # class -> (M, K, N): one representative bf16 GEMM per audited stage
    "bert_gemm": (24576, 768, 3072),     # packed-canvas MLP GEMM (fwd/dgrad)
    "wgrad_gemm": (768, 16384, 3072),    # weight-grad GEMM (train steps)
    "vit_gemm": (6400, 768, 3072),       # 128 img x 50 tok
    "search_gemm": (1280, 768, 131072),  # scores matmul chunk (f32 acc
                                         # caps the loop accumulator <1GB)
    "conv_gemm": (12544, 1152, 256),     # RN50 3x3@56^2 as im2col GEMM
    "square8k": (8192, 8192, 8192),      # chip ceiling reference
}


def cmd_peaks(args):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from bench import sync

    out = {}
    for name, (m, k, n) in PEAK_SHAPES.items():
        try:
            key = jax.random.key(0)
            a = jax.random.normal(key, (m, k), jnp.bfloat16)
            b = jax.random.normal(key, (k, n), jnp.bfloat16)
            # enough in-jit GEMMs that device time (~0.2s/dispatch at peak)
            # swamps the tunnel dispatch floor — a single small GEMM per
            # dispatch measures the ~5-30ms link, not the MXU
            loops = max(2, int(40e12 / (2 * m * k * n)))

            @jax.jit
            def mm(a, b):
                def body(i, acc):
                    # i-dependent input defeats loop-invariant hoisting
                    return acc + (a + i.astype(a.dtype)) @ b
                return jax.lax.fori_loop(
                    0, loops, body, jnp.zeros((m, n), jnp.float32))

            o = mm(a, b)
            sync(o)
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                o = mm(a, b)
            sync(o)
            dt = (time.time() - t0) / reps
            tf = 2 * m * k * n * loops / dt / 1e12
            out[name] = {"shape": [m, k, n], "loops": loops,
                         "ms": round(dt * 1e3 / loops, 3),
                         "tflops": round(tf, 1)}
            print(f"{name} {m}x{k}x{n} x{loops}: {tf:.1f} TFLOP/s",
                  file=sys.stderr)
            del a, b, o
        except Exception as e:  # noqa: BLE001 — squeezed-chip OOM: keep going
            print(f"{name}: FAILED {e!r}", file=sys.stderr)
    _merge_out(args.out, out, "peaks")


# ---------------------------------------------------------------------------
# the table
# ---------------------------------------------------------------------------
# stage -> (bench json key, flops entry, peak class)
TABLE = [
    ("reader padded", "reader_samples_per_sec", "reader_padded",
     "bert_gemm"),
    ("reader packed", "reader_packed_samples_per_sec", "reader_packed",
     "bert_gemm"),
    ("train biencoder", "train_biencoder_qps", "train_biencoder",
     "train_composite"),
    ("train ECA", "train_eca_pps", "train_eca", "train_composite"),
    ("MTCNN", ("image_chain", "mtcnn_images_per_s"), "mtcnn", "conv_gemm"),
    ("ArcFace", ("image_chain", "arcface_faces_per_s"), "arcface",
     "conv_gemm"),
    ("CLIP ViT-B/32", ("image_chain", "clip_vit_images_per_s"), "clip_vit",
     "vit_gemm"),
    ("ImageNet RN50", ("image_chain", "resnet50_images_per_s"), "resnet50",
     "conv_gemm"),
]


def _bench_details(path):
    line = None
    with open(path) as f:
        txt = f.read()
    try:
        rec = json.loads(txt)
        tail = rec.get("tail", txt)
    except json.JSONDecodeError:
        tail = txt
    for cand in tail.strip().splitlines():
        cand = cand.strip()
        if cand.startswith("{") and '"metric"' in cand:
            line = json.loads(cand)
    if line is None:
        raise SystemExit(f"no bench JSON line found in {path}")
    return line["details"]


def cmd_table(args):
    data = json.loads(Path(args.data).read_text())
    flops, peaks = data.get("flops", {}), data.get("peaks", {})
    details = _bench_details(args.bench)
    rows = []
    missing = []

    # exact e2e: embed + search legs fused into one row; the composite
    # compute-bound peak is the flops-weighted harmonic of the two class
    # peaks (total_flops / sum(leg_flops / leg_peak))
    fe, fs = flops.get("embed"), flops.get("search_exact")
    pe, ps = peaks.get("bert_gemm"), peaks.get("search_gemm")
    if fe and fs and pe and ps and details.get("exact_qps"):
        tot = fe["flops"] + fs["flops"]
        comp = tot / (fe["flops"] / pe["tflops"]
                      + fs["flops"] / ps["tflops"])
        rows.append(("exact e2e (embed+search)",
                     {"flops": tot, "items": N_QUERIES, "unit": "query"},
                     {"tflops": round(comp, 1), "shape": ["composite"]},
                     details["exact_qps"]))
    else:
        missing.append("exact e2e")

    # train steps: fwd + dgrad GEMMs are bert_gemm-shaped, wgrad GEMMs are
    # token-contraction-shaped; executed flops split ~2/3 : 1/3
    if peaks.get("bert_gemm") and peaks.get("wgrad_gemm"):
        bt, wt = (peaks["bert_gemm"]["tflops"],
                  peaks["wgrad_gemm"]["tflops"])
        peaks = {**peaks, "train_composite": {
            "tflops": round(3 / (2 / bt + 1 / wt), 1),
            "shape": ["2/3 fwd+dgrad, 1/3 wgrad"]}}

    for label, key, fkey, pclass in TABLE:
        f = flops.get(fkey)
        p = peaks.get(pclass)
        ips = (details.get(key[0], {}).get(key[1])
               if isinstance(key, tuple) else details.get(key))
        if f is None or p is None or ips is None:
            missing.append(label)
            continue
        rows.append((label, f, p, ips))
    lines = ["| stage | items/s | GFLOPs/item | achieved TFLOP/s | "
             "shape peak (measured) | MFU |",
             "|---|---|---|---|---|---|"]
    for label, f, p, ips in rows:
        gf = f["flops"] / f["items"] / 1e9
        ach = gf * ips / 1e3
        mfu = ach / p["tflops"]
        shape = ("x".join(map(str, p["shape"]))
                 if len(p["shape"]) == 3 else p["shape"][0])
        lines.append(
            f"| {label} | {ips:,} {f['unit']}/s | {gf:.2f} | "
            f"{ach:.1f} | {p['tflops']} ({shape}) | {mfu:.0%} |")
    print("\n".join(lines))
    if missing:
        print(f"MISSING: {missing}", file=sys.stderr)
        raise SystemExit(1)


def _merge_out(path, new, section):
    data = {}
    p = Path(path)
    if p.exists():
        data = json.loads(p.read_text())
    data.setdefault(section, {}).update(new)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(data, indent=1, sort_keys=True))
    print(f"wrote {section} -> {path}", file=sys.stderr)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = str(REPO / "fixtures" / "roofline.json")
    p = sub.add_parser("flops")
    p.add_argument("--out", default=d)
    p.add_argument("--stages", default=None,
                   help="comma list to restrict (embed,search_exact,...)")
    p.set_defaults(fn=cmd_flops)
    p = sub.add_parser("peaks")
    p.add_argument("--out", default=d)
    p.set_defaults(fn=cmd_peaks)
    p = sub.add_parser("table")
    p.add_argument("--data", default=d)
    p.add_argument("--bench", default=str(REPO / "BENCH_r04.json"))
    p.set_defaults(fn=cmd_table)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
