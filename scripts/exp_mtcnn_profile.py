"""Decompose MTCNN cascade time on the chip: pyramid resize, PNet convs,
per-scale NMS, cross-scale NMS, RNet stage, ONet stage — to find which of
the static-canvas redesign's parts dominates the 30 img/s number.

    python scripts/exp_mtcnn_profile.py [--batch 16] [--canvas 256]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--canvas", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viquae_tpu.models import mtcnn

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timeit(name, fn, *a, reps=5):
        out = fn(*a); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        sync(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms", file=sys.stderr)
        return dt

    import torch  # noqa: F401  (image_bench helper builds torch tensors)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from image_bench import _facenet_like_sd

    params = mtcnn.params_from_facenet(_facenet_like_sd())
    side = args.canvas
    cfg = mtcnn.MTCNNConfig(canvas=side, min_face_size=20)
    print(f"scales: {[round(s, 3) for s in cfg.scales]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(0, 255, (args.batch, side, side, 3)).astype(np.float32))
    hws = jnp.asarray(np.full((args.batch, 2), float(side), np.float32))

    # full cascade baseline
    full = jax.jit(functools.partial(mtcnn.detect_faces_batch, cfg=cfg))
    timeit("full cascade", full, params, images, hws)

    # ---- stage A: pyramid resize only -----------------------------------
    @jax.jit
    def pyramid_only(images):
        outs = []
        for scale in cfg.scales:
            size = max(12, int(round(cfg.canvas * scale)))
            outs.append(jax.vmap(
                lambda im: mtcnn._bilinear_resize(im, size))(images).sum())
        return jnp.stack(outs)

    timeit("A pyramid resize", pyramid_only, images)

    # ---- stage B: resize + pnet convs -----------------------------------
    @jax.jit
    def pnet_only(params, images):
        outs = []
        for scale in cfg.scales:
            size = max(12, int(round(cfg.canvas * scale)))
            scaled = jax.vmap(
                lambda im: mtcnn._bilinear_resize(im, size))(images)
            probs, reg = mtcnn.pnet_apply(
                params["pnet"], mtcnn._normalize(scaled))
            outs.append(probs.sum() + reg.sum())
        return jnp.stack(outs)

    timeit("B resize+pnet", pnet_only, params, images)

    # ---- stage C: + top-k + per-scale NMS (stage 1 complete) ------------
    def stage1(params, image, true_hw):
        all_boxes, all_scores, all_reg, all_valid = [], [], [], []
        for scale in cfg.scales:
            size = max(12, int(round(cfg.canvas * scale)))
            scaled = mtcnn._bilinear_resize(image, size)
            probs, reg = mtcnn.pnet_apply(
                params["pnet"], mtcnn._normalize(scaled)[None])
            probs, reg = probs[0], reg[0]
            h, w = probs.shape
            flat = probs.reshape(-1)
            k = min(cfg.k_per_scale, flat.shape[0])
            top_p, top_i = jax.lax.top_k(flat, k)
            row = (top_i // w).astype(jnp.float32)
            col = (top_i % w).astype(jnp.float32)
            boxes = jnp.stack([(col * 2 + 1) / scale, (row * 2 + 1) / scale,
                               (col * 2 + 12) / scale,
                               (row * 2 + 12) / scale], axis=1)
            regs = reg.reshape(-1, 4)[top_i]
            valid = top_p >= cfg.thresholds[0]
            valid &= (boxes[:, 0] < true_hw[1]) & (boxes[:, 1] < true_hw[0])
            if k < cfg.k_per_scale:
                pad = cfg.k_per_scale - k
                boxes = jnp.concatenate([boxes, jnp.zeros((pad, 4))])
                regs = jnp.concatenate([regs, jnp.zeros((pad, 4))])
                top_p = jnp.concatenate([top_p, jnp.zeros(pad)])
                valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
            keep = mtcnn.nms_fixed(boxes, top_p, valid, 0.5)
            all_boxes.append(boxes); all_scores.append(top_p)
            all_reg.append(regs); all_valid.append(keep)
        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        valid = jnp.concatenate(all_valid)
        keep = mtcnn.nms_fixed(boxes, scores, valid, 0.7)
        return boxes.sum() + keep.sum()

    s1 = jax.jit(jax.vmap(lambda im, hw: stage1(params, im, hw)))
    timeit("C stage1 (resize+pnet+topk+NMS)", s1, images, hws)

    # ---- stage D: per-scale NMS only (synthetic boxes) ------------------
    k = cfg.k_per_scale
    boxes = jnp.asarray(rng.uniform(0, side, (args.batch, k, 4)), jnp.float32)
    boxes = boxes.at[..., 2:].add(20.0)
    scores = jnp.asarray(rng.uniform(0, 1, (args.batch, k)), jnp.float32)

    nms_scale = jax.jit(jax.vmap(
        lambda b, s: mtcnn.nms_fixed(b, s, s > 0.1, 0.5)))
    dt = timeit("D one per-scale NMS (k=64)", nms_scale, boxes, scores)
    print(f"  x{len(cfg.scales)} scales = {dt*len(cfg.scales)*1e3:.1f} ms",
          file=sys.stderr)

    kk = cfg.k_per_scale * len(cfg.scales)
    boxes2 = jnp.asarray(rng.uniform(0, side, (args.batch, kk, 4)),
                         jnp.float32)
    boxes2 = boxes2.at[..., 2:].add(20.0)
    scores2 = jnp.asarray(rng.uniform(0, 1, (args.batch, kk)), jnp.float32)
    nms_cross = jax.jit(jax.vmap(
        lambda b, s: mtcnn.nms_fixed(b, s, s > 0.1, 0.7)))
    timeit(f"E cross-scale NMS (k={kk})", nms_cross, boxes2, scores2)

    # ---- stage F: crops + rnet / onet ------------------------------------
    b1 = jnp.asarray(rng.uniform(0, side - 48, (args.batch, cfg.k_stage1, 4)),
                     jnp.float32)
    b1 = b1.at[..., 2:].add(32.0)

    @jax.jit
    def rnet_stage(params, images, boxes):
        crops = jax.vmap(lambda im, b: mtcnn.crop_resize(im, b, 24))(
            images, boxes)
        flat = crops.reshape(-1, 24, 24, 3)
        probs, reg = mtcnn.rnet_apply(params["rnet"], mtcnn._normalize(flat))
        return probs.sum() + reg.sum()

    timeit(f"F crop24+rnet (k={cfg.k_stage1})", rnet_stage, params, images, b1)

    b2 = b1[:, : cfg.k_stage2]

    @jax.jit
    def onet_stage(params, images, boxes):
        crops = jax.vmap(lambda im, b: mtcnn.crop_resize(im, b, 48))(
            images, boxes)
        flat = crops.reshape(-1, 48, 48, 3)
        probs, reg, lm = mtcnn.onet_apply(
            params["onet"], mtcnn._normalize(flat))
        return probs.sum() + reg.sum() + lm.sum()

    timeit(f"G crop48+onet (k={cfg.k_stage2})", onet_stage, params, images, b2)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
