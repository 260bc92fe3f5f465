"""Image-chain throughput on the real chip: MTCNN cascade, ArcFace
embedding, CLIP ViT-B/32 + ModifiedResNet image embedding, ImageNet
ResNet-50. The reference runs these as CUDA models (facenet_pytorch,
insightface, openai-CLIP, torchvision); these are the TPU-native numbers.

    python scripts/image_bench.py [--batch 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timeit(name, fn, *a, n_items, reps=3):
        out = fn(*a); sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        sync(out)
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms -> {n_items/dt:.1f} items/s",
              file=sys.stderr)
        return n_items / dt

    rng = np.random.default_rng(0)
    results = {}

    # ---- MTCNN cascade (512px canvas, full pyramid) ----------------------
    from viquae_tpu.models import mtcnn

    params = mtcnn.params_from_facenet({
        k: v for k, v in _facenet_like_sd().items()
    })
    # NOTE: the full 512px/min_face-20 pyramid compiles fine on a directly
    # attached host (tests run it on CPU) but its HLO embeds per-scale
    # resize constants and exceeds this tunnel's remote-compile payload cap
    # (HTTP 413); bench a 256px/min_face-40 pyramid here.
    cfg = mtcnn.MTCNNConfig(canvas=256, min_face_size=40)
    n_img = min(args.batch, 8)
    images = jnp.asarray(
        rng.uniform(0, 255, (n_img, 256, 256, 3)).astype(np.float32))
    hws = jnp.asarray(np.full((n_img, 2), 256.0, np.float32))
    fn = jax.jit(lambda im, hw: mtcnn.detect_faces_batch(params, im, hw, cfg))
    results["mtcnn_images_per_s"] = timeit(
        f"MTCNN cascade 256px x{n_img}", fn, images, hws, n_items=n_img)

    # ---- ArcFace iresnet50 (112px crops) ---------------------------------
    from viquae_tpu.models import arcface

    acfg = arcface.ArcFaceConfig()
    aparams = arcface.init(jax.random.key(1), acfg)
    crops = jnp.asarray(
        rng.standard_normal((args.batch, 112, 112, 3)).astype(np.float32))
    afn = jax.jit(lambda x: arcface.apply(aparams, acfg, x))
    results["arcface_faces_per_s"] = timeit(
        f"ArcFace r50 112px x{args.batch}", afn, crops, n_items=args.batch)

    # ---- CLIP ViT-B/32 (224px) -------------------------------------------
    from viquae_tpu.models import clip as clip_lib

    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=768, num_layers=12, num_heads=12, intermediate_size=3072,
        image_size=224, patch_size=32, projection_dim=512,
    )
    vparams = clip_lib.vit_init(jax.random.key(2), vcfg)
    pixels = jnp.asarray(
        rng.standard_normal((args.batch, 224, 224, 3)).astype(np.float32))
    cfn = jax.jit(lambda x: clip_lib.vit_apply(vparams, vcfg, x)["image_embeds"])
    results["clip_vit_images_per_s"] = timeit(
        f"CLIP ViT-B/32 224px x{args.batch}", cfn, pixels, n_items=args.batch)

    # ---- torchvision-style ResNet-50 (ImageNet encoder) -------------------
    from viquae_tpu.models import resnet as resnet_lib

    rcfg = resnet_lib.ResNetConfig()
    rparams = resnet_lib.init(jax.random.key(3), rcfg)
    rfn = jax.jit(lambda x: resnet_lib.apply(rparams, rcfg, x))
    results["resnet50_images_per_s"] = timeit(
        f"ResNet-50 224px x{args.batch}", rfn, pixels, n_items=args.batch)

    import json
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


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
