"""Packed + gradient-accumulated ECA training at GLOBAL batch 1024 on one
chip — the composition round 2 could not express (packing and accumulation
were mutually exclusive; VERDICT item 5). Two packed 512-pair microbatch
canvases are stacked (train.data.stack_microbatches) and scanned by the
microbatched trainer path: one optimizer update per 1024 pairs.

    python scripts/exp_train_packed_accum.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from viquae_tpu.models import bert, mm
    from viquae_tpu.train import objectives
    from viquae_tpu.train.data import pack_mm_text_inputs, stack_microbatches

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    B, SEQ, ACCUM = 512, 256, 2
    cfg = mm.MMConfig(
        bert=bert.BertConfig(add_pooler=False),
        n_faces=4, face_dim=512, bbox_dim=7,
        image_dims=(("clip-RN50", 1024), ("imagenet-RN50", 2048)),
    )
    key = jax.random.key(0)
    params = {
        "question": mm.eca_init(jax.random.fold_in(key, 0), cfg),
        "context": mm.eca_init(jax.random.fold_in(key, 1), cfg),
    }
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)

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
                "face": rng.standard_normal((B, 1, 4, 512)).astype(np.float32),
                "bbox": rng.standard_normal((B, 1, 4, 7)).astype(np.float32),
                "attention_mask": face_mask,
            },
            "image_inputs": {
                "clip-RN50": {
                    "input": rng.standard_normal((B, 1, 1024)).astype(np.float32),
                    "attention_mask": np.ones((B, 1), np.int32),
                },
                "imagenet-RN50": {
                    "input": rng.standard_normal((B, 1, 2048)).astype(np.float32),
                    "attention_mask": np.ones((B, 1), np.int32),
                },
            },
        }
        inputs["text_inputs"] = {
            **inputs["text_inputs"],
            **pack_mm_text_inputs(inputs, SEQ + 6),
        }
        return inputs

    def make_micro():
        return {
            "question_inputs": mm_side(18.0, 0.35),
            "context_inputs": mm_side(64.0, 0.30),
            "labels": np.arange(B, dtype=np.int32),
        }

    batch = stack_microbatches([make_micro() for _ in range(ACCUM)])
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    def enc(p, inputs):
        t = inputs["text_inputs"]
        return mm.eca_apply_packed(
            p, cfg, t["canvas_input_ids"], t["canvas_segment_ids"],
            t["canvas_position_ids"], t["canvas_cls_rows"],
            t["canvas_cls_cols"], t["canvas_vis_rows"],
            t["canvas_vis_cols"], inputs["face_inputs"],
            inputs["image_inputs"], deterministic=True,
            compute_dtype=jnp.bfloat16, remat_layers=True,
        )[:B]

    def loss_fn(p, mb):
        q = enc(p["question"], mb["question_inputs"])
        c = enc(p["context"], mb["context_inputs"])
        return objectives.biencoder_loss(q, c, mb["labels"])[0]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        def body(acc, mb):
            l, g = jax.value_and_grad(loss_fn)(params, mb)
            return jax.tree_util.tree_map(jnp.add, acc, g), l

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads, losses = jax.lax.scan(body, zero, batch)
        grads = jax.tree_util.tree_map(lambda g: g / ACCUM, grads)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, losses.mean()

    params, opt_state, l = step(params, opt_state, batch)
    sync(l)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        params, opt_state, l = step(params, opt_state, batch)
    sync(l)
    dt = (time.time() - t0) / reps
    total = B * ACCUM
    print(f"packed+accum ECA step: {dt*1e3:.1f} ms for GLOBAL batch "
          f"{total} pairs ({total/dt:.0f} pairs/s; {ACCUM} packed "
          f"microbatch canvases scanned, one optimizer update)",
          file=sys.stderr)
    import json
    print(json.dumps({"global_batch": total, "step_ms": round(dt * 1e3, 1),
                      "pairs_per_s": round(total / dt, 1)}))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
