"""Image-chain throughput on the real chip: MTCNN cascade, ArcFace
embedding, CLIP ViT-B/32 + ModifiedResNet image embedding, ImageNet
ResNet-50. The reference runs these as CUDA models (facenet_pytorch,
insightface, openai-CLIP, torchvision — meerqat/image/embedding.py:169-183,
face_detection.py:87-139); these are the TPU-native numbers.

CRITICAL LESSON (round 3): params must be passed as jit ARGUMENTS, never
captured in a closure — closed-over weights are embedded as HLO constants
(CLIP ViT-B/32 = 351 MB of proto), which exceeds the tunnel's remote-compile
payload cap (HTTP 413) and would crawl through the link even below it.

    python scripts/image_bench.py [--batch 64] [--mtcnn-batch 16]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--mtcnn-batch", type=int, default=16)
    ap.add_argument("--mtcnn-canvas", type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timeit(name, fn, *a, n_items, reps=5):
        out = fn(*a); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        sync(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms -> {n_items/dt:.1f} items/s",
              file=sys.stderr)
        return n_items / dt

    def cos(a, b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9
        return float((num / den).mean())

    rng = np.random.default_rng(0)
    results = {}

    # ---- MTCNN cascade ---------------------------------------------------
    from viquae_tpu.models import mtcnn

    params = mtcnn.params_from_facenet(_facenet_like_sd())
    side = args.mtcnn_canvas
    cfg = mtcnn.MTCNNConfig(
        canvas=side, min_face_size=max(20, 40 * side // 512))
    n_img = args.mtcnn_batch
    images = jnp.asarray(
        rng.uniform(0, 255, (n_img, side, side, 3)).astype(np.float32))
    hws = jnp.asarray(np.full((n_img, 2), float(side), np.float32))
    fn = jax.jit(functools.partial(mtcnn.detect_faces_batch, cfg=cfg))
    results["mtcnn_images_per_s"] = timeit(
        f"MTCNN cascade {side}px x{n_img}", fn, params, images, hws,
        n_items=n_img)

    # ---- ArcFace iresnet50 (112px crops) ---------------------------------
    from viquae_tpu.models import arcface

    acfg = arcface.ArcFaceConfig()
    aparams = arcface.init(jax.random.key(1), acfg)
    crops = jnp.asarray(
        rng.standard_normal((args.batch, 112, 112, 3)).astype(np.float32))
    af32 = jax.jit(lambda p, x: arcface.apply(p, acfg, x))
    abf16 = jax.jit(
        lambda p, x: arcface.apply(p, acfg, x, compute_dtype=jnp.bfloat16))
    results["arcface_faces_per_s_f32"] = timeit(
        f"ArcFace r50 112px x{args.batch} f32", af32,
        aparams, crops, n_items=args.batch)
    results["arcface_faces_per_s"] = timeit(
        f"ArcFace r50 112px x{args.batch} bf16", abf16,
        aparams, crops, n_items=args.batch)
    results["arcface_bf16_cos"] = round(
        cos(abf16(aparams, crops), af32(aparams, crops)), 6)

    # ---- CLIP ViT-B/32 (224px) -------------------------------------------
    from viquae_tpu.models import clip as clip_lib

    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072,
        image_size=224, patch_size=32, projection_dim=512,
    )
    vparams = clip_lib.vit_init(jax.random.key(2), vcfg)
    pixels = jnp.asarray(
        rng.standard_normal((args.batch, 224, 224, 3)).astype(np.float32))
    cf32 = jax.jit(lambda p, x: clip_lib.vit_apply(p, vcfg, x)["image_embeds"])
    cbf16 = jax.jit(lambda p, x: clip_lib.vit_apply(
        p, vcfg, x, compute_dtype=jnp.bfloat16)["image_embeds"])
    results["clip_vit_images_per_s_f32"] = timeit(
        f"CLIP ViT-B/32 224px x{args.batch} f32", cf32, vparams, pixels,
        n_items=args.batch)
    results["clip_vit_images_per_s"] = timeit(
        f"CLIP ViT-B/32 224px x{args.batch} bf16", cbf16, vparams, pixels,
        n_items=args.batch)
    results["clip_vit_bf16_cos"] = round(
        cos(cbf16(vparams, pixels), cf32(vparams, pixels)), 6)

    # ---- CLIP ModifiedResNet RN50 (224px, attention pool) ----------------
    mcfg = clip_lib.ModifiedResNetConfig()
    mparams = _modified_resnet_params(mcfg)
    mf32 = jax.jit(lambda p, x: clip_lib.modified_resnet_apply(p, mcfg, x))
    mbf16 = jax.jit(lambda p, x: clip_lib.modified_resnet_apply(
        p, mcfg, x, compute_dtype=jnp.bfloat16))
    results["clip_rn50_images_per_s_f32"] = timeit(
        f"CLIP RN50 224px x{args.batch} f32", mf32, mparams, pixels,
        n_items=args.batch)
    results["clip_rn50_images_per_s"] = timeit(
        f"CLIP RN50 224px x{args.batch} bf16", mbf16, mparams, pixels,
        n_items=args.batch)
    results["clip_rn50_bf16_cos"] = round(
        cos(mbf16(mparams, pixels), mf32(mparams, pixels)), 6)

    # ---- torchvision-style ResNet-50 (ImageNet encoder) -------------------
    from viquae_tpu.models import resnet as resnet_lib

    rcfg = resnet_lib.ResNetConfig()
    rparams = resnet_lib.init(jax.random.key(3), rcfg)
    rf32 = jax.jit(lambda p, x: resnet_lib.apply(p, rcfg, x))
    rbf16 = jax.jit(
        lambda p, x: resnet_lib.apply(p, rcfg, x,
                                      compute_dtype=jnp.bfloat16))
    results["resnet50_images_per_s_f32"] = timeit(
        f"ResNet-50 224px x{args.batch} f32", rf32, rparams, pixels,
        n_items=args.batch)
    results["resnet50_images_per_s"] = timeit(
        f"ResNet-50 224px x{args.batch} bf16", rbf16, rparams, pixels,
        n_items=args.batch)
    results["resnet50_bf16_cos"] = round(
        cos(rbf16(rparams, pixels), rf32(rparams, pixels)), 6)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


def _modified_resnet_params(mcfg):
    """Random CLIP-RN50 params via the OpenAI-layout port (timing only)."""
    from viquae_tpu.models import clip as clip_lib

    return clip_lib.visual_params_from_openai(
        clip_lib.random_openai_rn50_state_dict(mcfg), mcfg)


def _facenet_like_sd():
    """Random weights in the exact facenet_pytorch layout (timing only)."""
    import torch

    torch.manual_seed(0)
    sd = {}

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, k) * 0.1
        sd[f"{name}.bias"] = torch.zeros(cout)

    def prelu(name, c):
        sd[f"{name}.weight"] = torch.full((c,), 0.25)

    def dense(name, i, o):
        sd[f"{name}.weight"] = torch.randn(o, i) * 0.02
        sd[f"{name}.bias"] = torch.zeros(o)

    conv("pnet.conv1", 3, 10, 3); prelu("pnet.prelu1", 10)
    conv("pnet.conv2", 10, 16, 3); prelu("pnet.prelu2", 16)
    conv("pnet.conv3", 16, 32, 3); prelu("pnet.prelu3", 32)
    conv("pnet.conv4_1", 32, 2, 1); conv("pnet.conv4_2", 32, 4, 1)
    conv("rnet.conv1", 3, 28, 3); prelu("rnet.prelu1", 28)
    conv("rnet.conv2", 28, 48, 3); prelu("rnet.prelu2", 48)
    conv("rnet.conv3", 48, 64, 2); prelu("rnet.prelu3", 64)
    dense("rnet.dense4", 576, 128); prelu("rnet.prelu4", 128)
    dense("rnet.dense5_1", 128, 2); dense("rnet.dense5_2", 128, 4)
    conv("onet.conv1", 3, 32, 3); prelu("onet.prelu1", 32)
    conv("onet.conv2", 32, 64, 3); prelu("onet.prelu2", 64)
    conv("onet.conv3", 64, 64, 3); prelu("onet.prelu3", 64)
    conv("onet.conv4", 64, 128, 2); prelu("onet.prelu4", 128)
    dense("onet.dense5", 1152, 256); prelu("onet.prelu5", 256)
    dense("onet.dense6_1", 256, 2); dense("onet.dense6_2", 256, 4)
    dense("onet.dense6_3", 256, 10)
    return sd


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
