"""Network-gated real-checkpoint weight-port validation (VERDICT r1 item 3).

Loads the ACTUAL pretrained checkpoints the reference uses
(meerqat/data/loading.py:167-183 get_pretrained contract), ports them
through the params_from_* paths, asserts activation parity vs the torch
forward on fixed inputs, and records sha256 checksums of the (rounded)
activations to fixtures/port_checksums.json so later offline rounds can
regression-test the port code.

Requires HF-hub access (and insightface/facenet checkpoints on disk for
--arcface/--mtcnn). The OFFLINE companion is tests/test_port_fullsize.py:
identical architectures with synthesized weights, runs in CI.

Usage:
    python scripts/validate_ports.py [--models bert,dpr,clip] [--out PATH]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKPOINTS = {
    "bert": "bert-base-uncased",
    "dpr": "facebook/dpr-question_encoder-single-nq-base",
    "dpr_ctx": "facebook/dpr-ctx_encoder-single-nq-base",
    "clip": "openai/clip-vit-base-patch32",
    "vilt": "dandelin/vilt-b32-finetuned-vqa",
    # the reference's released TriviaQA reader (EXPERIMENTS.rst: init for
    # the ViQuAE rc fine-tune; docs/RUNBOOK_EGRESS.md step 2)
    "reader": "PaulLerner/multi_passage_bert_triviaqa_without_viquae"
              "_mean_pool_loss",
}


def set_checkpoint_root(root):
    """Point every checkpoint at <root>/<name> (save_pretrained layout).
    Lets CI execute this script's exact port+parity+checksum logic on
    locally-saved tiny checkpoints (tests/test_validate_ports.py) even
    though the real HF-hub pulls need network."""
    for name in CHECKPOINTS:
        CHECKPOINTS[name] = os.path.join(str(root), name)


def checksum(arr: np.ndarray) -> str:
    return hashlib.sha256(
        np.round(np.asarray(arr, np.float64), 3).tobytes()
    ).hexdigest()[:16]


def validate_bert(results):
    import torch
    from transformers import BertModel

    import jax.numpy as jnp
    from viquae_tpu.models import bert

    model = BertModel.from_pretrained(CHECKPOINTS["bert"]).eval()
    cfg = bert.BertConfig.from_hf(model.config)
    params = bert.params_from_hf(model.state_dict(), cfg)
    rng = np.random.default_rng(0)
    vocab = model.config.vocab_size
    ids = rng.integers(min(999, vocab - 2), min(9999, vocab), (2, 16))
    mask = np.ones((2, 16), np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask))
    out = bert.apply(params, cfg, jnp.asarray(ids, jnp.int32),
                     jnp.asarray(mask, jnp.int32), deterministic=True)
    diff = float(np.abs(
        np.asarray(out["pooler_output"]) - ref.pooler_output.numpy()
    ).max())
    assert diff < 1e-3, f"bert pooler diff {diff}"
    results["bert"] = {
        "checkpoint": CHECKPOINTS["bert"], "max_abs_diff": diff,
        "pooler_sha": checksum(out["pooler_output"]),
    }


def validate_dpr(results):
    import torch
    from transformers import DPRQuestionEncoder

    import jax.numpy as jnp
    from viquae_tpu.models import bert, dpr

    model = DPRQuestionEncoder.from_pretrained(CHECKPOINTS["dpr"]).eval()
    # derive dims from the loaded config (HF DPRConfig carries the BERT
    # fields) — hardcoded bert-base dims would silently mis-port any
    # other checkpoint
    cfg = dpr.DPRConfig(
        bert=bert.BertConfig.from_hf(model.config, add_pooler=False)
    )
    params = dpr.params_from_hf_dpr(model.state_dict(), cfg)
    rng = np.random.default_rng(1)
    vocab = model.config.vocab_size
    ids = rng.integers(min(999, vocab - 2), min(9999, vocab), (2, 16))
    mask = np.ones((2, 16), np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).pooler_output.numpy()
    out = np.asarray(dpr.apply(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        deterministic=True)["pooler_output"])
    diff = float(np.abs(out - ref).max())
    assert diff < 1e-3, f"dpr diff {diff}"
    results["dpr"] = {
        "checkpoint": CHECKPOINTS["dpr"], "max_abs_diff": diff,
        "embedding_sha": checksum(out),
    }


def validate_clip(results):
    import torch
    from transformers import CLIPModel

    import jax.numpy as jnp
    from viquae_tpu.models import clip as clip_lib

    model = CLIPModel.from_pretrained(CHECKPOINTS["clip"]).eval()
    params = clip_lib.params_from_hf(model.state_dict())
    vc = model.config.vision_config
    vcfg = clip_lib.CLIPVisionConfig(
        hidden_size=vc.hidden_size, num_layers=vc.num_hidden_layers,
        num_heads=vc.num_attention_heads,
        intermediate_size=vc.intermediate_size,
        image_size=vc.image_size, patch_size=vc.patch_size,
        projection_dim=model.config.projection_dim,
    )
    rng = np.random.default_rng(2)
    size = vc.image_size
    pixels = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model.get_image_features(
            pixel_values=torch.tensor(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    out = np.asarray(clip_lib.vit_apply(
        params["vision"], vcfg, jnp.asarray(pixels))["image_embeds"])
    diff = float(np.abs(out - ref).max())
    assert diff < 5e-3, f"clip image diff {diff}"
    results["clip"] = {
        "checkpoint": CHECKPOINTS["clip"], "max_abs_diff": diff,
        "image_embeds_sha": checksum(out),
    }


def validate_reader(results):
    import torch
    from transformers import BertForQuestionAnswering

    import jax.numpy as jnp
    from viquae_tpu.models import qa

    # snapshot to a local dir first when pulling from the hub is desired;
    # a local save_pretrained dir works directly
    path = CHECKPOINTS["reader"]
    if not os.path.isdir(path):
        from huggingface_hub import snapshot_download

        path = snapshot_download(path)
    params, cfg = qa.params_from_pretrained_dir(path)
    model = BertForQuestionAnswering.from_pretrained(
        CHECKPOINTS["reader"]).eval()
    rng = np.random.default_rng(4)
    vocab = model.config.vocab_size
    n, m, L = 1, 2, 24
    ids = rng.integers(999, min(9999, vocab), (n * m, L))
    mask = np.ones((n * m, L), np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask))
    out = qa.reader_apply(
        params, cfg, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32), m_passages=m)
    diff = float(np.abs(
        np.asarray(out.start_logits).reshape(n * m, L)
        - ref.start_logits.numpy()).max())
    assert diff < 1e-3, f"reader start-logit diff {diff}"
    results["reader"] = {
        "checkpoint": CHECKPOINTS["reader"], "max_abs_diff": diff,
        "start_logits_sha": checksum(out.start_logits),
    }


def validate_arcface(results, path):
    """path: local ms1mv3_arcface_r50_fp16/backbone.pth (insightface
    release; the reference's image/face_recognition.py:55-61 checkpoint)."""
    import torch

    import jax.numpy as jnp
    from viquae_tpu.models import arcface

    sd = torch.load(path, map_location="cpu")
    cfg = arcface.ArcFaceConfig()
    params = arcface.params_from_insightface(sd, cfg)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 112, 112, 3)).astype(np.float32)
    out = np.asarray(arcface.apply(params, cfg, jnp.asarray(x)))
    results["arcface"] = {
        "checkpoint": str(path),
        "embedding_sha": checksum(out),
        "note": "torch-side oracle requires the insightface repo; "
                "layout parity is tested offline at full depth "
                "(tests/test_port_fullsize.py)",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="bert,dpr,clip")
    ap.add_argument("--arcface-path", default=None)
    ap.add_argument("--checkpoint-root", default=None,
                    help="read checkpoints from <root>/<name> "
                         "(save_pretrained layout) instead of the HF hub")
    ap.add_argument("--platform", default="cpu",
                    help="JAX platform for the ported forward ('cpu' "
                         "default: parity is vs torch-CPU and the "
                         "accelerator is irrelevant — on this rig the "
                         "tunneled TPU turns tiny compiles into minutes; "
                         "pass 'default' to use the attached device)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "port_checksums.json"))
    args = ap.parse_args()
    if args.platform != "default":
        # before any backend query (the axon plugin ignores JAX_PLATFORMS;
        # the config route works — CLAUDE.md environment notes)
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.checkpoint_root:
        set_checkpoint_root(args.checkpoint_root)

    results: dict = {"timestamp": time.strftime("%Y-%m-%dT%H:%M:%S")}
    todo = args.models.split(",")
    fns = {"bert": validate_bert, "dpr": validate_dpr,
           "clip": validate_clip, "reader": validate_reader}
    for name in todo:
        if name == "arcface":
            if args.arcface_path:
                validate_arcface(results, args.arcface_path)
            continue
        try:
            fns[name](results)
            print(f"{name}: OK {results[name]}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED/unreachable — {e!r}", file=sys.stderr)
            results[name] = {"error": repr(e)}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
