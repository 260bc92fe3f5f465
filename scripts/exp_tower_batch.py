"""Round-5 probe: are the image towers' MFU gaps (CLIP ViT 34%, RN50 29%,
ArcFace 50% at bench batch 128 — PARITY.md roofline table) a batch-size
artifact or structural?

Times each tower at batch 128/256/512 (bf16 compute, f32 pixel inputs as
in bench.py stage_image_chain) and at bf16 pixel inputs, interleaved
A/B in one process per the CLAUDE.md protocol. MFU uses the same
GFLOPs/item as fixtures/roofline.json (XLA cost analysis) and the same
measured class peaks.

Run on the real chip: python scripts/roofline.py flops must have been run
first (reads fixtures/roofline.json).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import sync  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from viquae_tpu.models import arcface, clip as clip_lib
    from viquae_tpu.models import resnet as resnet_lib

    roof = json.loads((REPO / "fixtures" / "roofline.json").read_text())
    gf = {k: roof["flops"][k]["flops"] / roof["flops"][k]["items"] / 1e9
          for k in ("arcface", "clip_vit", "resnet50")}
    peak = {"arcface": roof["peaks"]["conv_gemm"]["tflops"],
            "clip_vit": roof["peaks"]["vit_gemm"]["tflops"],
            "resnet50": roof["peaks"]["conv_gemm"]["tflops"]}

    key = jax.random.key(0)
    acfg = arcface.ArcFaceConfig()
    a_params = arcface.init(jax.random.fold_in(key, 21), acfg)
    vcfg = clip_lib.CLIPVisionConfig()
    v_params = clip_lib.vit_init(jax.random.fold_in(key, 22), vcfg)
    rcfg = resnet_lib.ResNetConfig()
    r_params = resnet_lib.init(jax.random.fold_in(key, 23), rcfg)

    towers = {
        "arcface": (a_params, (112, 112),
                    lambda p, x: arcface.apply(
                        p, acfg, x, compute_dtype=jnp.bfloat16)),
        "clip_vit": (v_params, (224, 224),
                     lambda p, x: clip_lib.vit_apply(
                         p, vcfg, x,
                         compute_dtype=jnp.bfloat16)["image_embeds"]),
        "resnet50": (r_params, (224, 224),
                     lambda p, x: resnet_lib.apply(
                         p, rcfg, x, compute_dtype=jnp.bfloat16)),
    }

    rng = np.random.default_rng(11)
    results = {}
    for name, (params, side, fn) in towers.items():
        jfn = jax.jit(fn)
        for batch in (128, 256, 512):
            for in_dtype in ("f32", "bf16"):
                dt = jnp.float32 if in_dtype == "f32" else jnp.bfloat16
                x = jnp.asarray(rng.standard_normal(
                    (batch, side[0], side[1], 3)).astype(np.float32),
                    dtype=dt)
                o = jfn(params, x)
                sync(o)
                reps = 3
                t0 = time.time()
                for _ in range(reps):
                    o = jfn(params, x)
                sync(o)
                ips = batch / ((time.time() - t0) / reps)
                mfu = gf[name] * ips / 1e3 / peak[name]
                results[f"{name}/b{batch}/{in_dtype}"] = (
                    round(ips, 1), round(mfu * 100, 1))
                print(f"{name:9s} b{batch:4d} {in_dtype:4s}: "
                      f"{ips:8.1f} img/s  MFU {mfu:5.1%}", flush=True)
                del x, o
    print(json.dumps(results))


if __name__ == "__main__":
    main()
