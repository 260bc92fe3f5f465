"""Packed vs padded ECA (multimodal) training step at the reference's MICT
shape: batch 512 question-context pairs, bert-base towers, n_faces=4,
clip-RN50 (1024) + imagenet-RN50 (2048) image features (EXPERIMENTS.rst:
337-339, experiments/ict/ilf/config.yaml batch 512; the reference pads
text to max_length and runs torch on 1x V100).

Padded path: mm.eca_apply at seq 256 (the reference tokenization).
Packed path: mm.eca_apply_packed over pack_mm_text_inputs canvases at
REAL text lengths (questions ~ lognormal(ln18, .35), contexts ~ 3-5
sentences ~ lognormal(ln64, .3), T_vis = 6 slots/sample).

Both paths use per-layer gradient checkpointing (bert.encode
remat_layers=True) — mandatory at this batch: without it the padded step
needs 12 live f32 (512, 12, 262, 262) attention-score tensors (~100GB);
the reference's own recipe checkpoints too.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viquae_tpu.models import bert, mm
    from viquae_tpu.train import data as tdata
    from viquae_tpu.train import objectives, optim

    B, SEQ = 512, 256
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
    tx = optim.make_optimizer(params, lr=1e-5, warmup_steps=10,
                              total_steps=1000)
    # keep the master params on HOST: each timing uploads a fresh copy and
    # donates it, so no second device copy ever exists
    params = jax.device_get(params)

    rng = np.random.default_rng(0)

    def mm_side(lens_mu, lens_sigma):
        lens = np.clip(np.round(rng.lognormal(np.log(lens_mu), lens_sigma, B)),
                       5, SEQ).astype(int)
        ids = np.zeros((B, SEQ), np.int32)
        mask = np.zeros((B, SEQ), np.int32)
        for i, l in enumerate(lens):
            ids[i, :l] = rng.integers(1000, 20_000, l)
            mask[i, :l] = 1
        face_mask = np.zeros((B, 1, 4), np.int32)
        has_face = rng.random(B) < 0.4  # ~humans_with_faces share
        for i in range(B):
            if has_face[i]:
                face_mask[i, 0, : rng.integers(1, 5)] = 1
        return {
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
        }, lens

    q_inputs, q_lens = mm_side(18.0, 0.35)
    c_inputs, c_lens = mm_side(64.0, 0.30)
    labels = np.arange(B, dtype=np.int32)

    def loss_padded(params, batch, rng_):
        def enc(p, inputs):
            return mm.eca_apply(
                p, cfg, inputs["text_inputs"], inputs["face_inputs"],
                inputs["image_inputs"], deterministic=True,
                compute_dtype=jnp.bfloat16, remat_layers=True,
            ).pooler_output
        q = enc(params["question"], batch["question_inputs"])
        c = enc(params["context"], batch["context_inputs"])
        return objectives.biencoder_loss(q, c, batch["labels"])

    def loss_packed(params, batch, rng_):
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
        q = enc(params["question"], batch["question_inputs"])
        c = enc(params["context"], batch["context_inputs"])
        return objectives.biencoder_loss(q, c, batch["labels"])

    def make_step(loss_fn):
        # donate params/opt_state: without donation both the old and new
        # copies (2 x 2.7GB) are live across the update and the padded
        # microbatch step tips over HBM
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, None)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss
        return step

    def make_accum_step(loss_fn):
        # TRUE 2-microbatch gradient accumulation: two fwd+bwd, gradients
        # averaged, ONE optimizer update per 512 pairs (charging two adam
        # updates would overstate the padded baseline's cost). lax.scan
        # forces the microbatches SEQUENTIAL — an unrolled version lets XLA
        # interleave both backward passes and OOMs by 1.3GB.
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, b1, b2):
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), b1, b2)

            def body(acc, mb):
                (l, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mb, None)
                return jax.tree_util.tree_map(jnp.add, acc, g), l

            zero = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads, losses = jax.lax.scan(body, zero, stacked)
            grads = jax.tree_util.tree_map(lambda x: x / 2, grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses[0]
        return step

    # the padded step at batch 512 misses HBM by ~0.5GB even with
    # per-layer remat (16.26G needed of 15.75G); a practitioner runs it as
    # 2x256 gradient accumulation (the framework's grad_accum; the
    # reference's global-batch-256 DPR recipe accumulates the same way).
    # The PACKED step fits batch 512 outright: 216 canvas rows vs 1024.
    half = B // 2

    def half_side(inputs):
        out = {}
        for k, v in inputs.items():
            if isinstance(v, dict):
                out[k] = half_side(v)
            else:
                out[k] = v[:half]
        return out

    pad_batch_half = {
        "question_inputs": half_side(q_inputs),
        "context_inputs": half_side(c_inputs),
        "labels": labels[:half],
    }

    t_vis = tdata.mm_visual_mask(
        q_inputs["face_inputs"], q_inputs["image_inputs"]).shape[1]
    packed_batch = {
        "question_inputs": {
            **q_inputs,
            "text_inputs": {
                **q_inputs["text_inputs"],
                **tdata.pack_mm_text_inputs(q_inputs, SEQ),
            },
        },
        "context_inputs": {
            **c_inputs,
            "text_inputs": {
                **c_inputs["text_inputs"],
                **tdata.pack_mm_text_inputs(c_inputs, SEQ),
            },
        },
        "labels": labels,
    }
    for side in ("question_inputs", "context_inputs"):
        t = packed_batch[side]["text_inputs"]
        rows = t["canvas_input_ids"].shape
        dens = (t["canvas_segment_ids"] > 0).mean()
        print(f"{side}: canvas {rows} density {dens:.3f} (T_vis={t_vis})",
              file=sys.stderr)

    def timeit(name, step, *batches, reps=5, pairs=None):
        # fresh state per timing (host -> device): step donates its inputs.
        # The batch is uploaded ONCE: a real input pipeline overlaps
        # uploads with compute, and the tunneled dev link serializes them
        # (~12MB/batch would otherwise dominate the step).
        batches = tuple(
            jax.tree_util.tree_map(jnp.asarray, b) for b in batches)
        p = jax.tree_util.tree_map(jnp.asarray, params)
        o = tx.init(p)
        p, o, loss = step(p, o, *batches)
        sync(loss)
        t0 = time.time()
        pp, oo = p, o
        for _ in range(reps):
            pp, oo, loss = step(pp, oo, *batches)
        sync(loss)
        del pp, oo
        dt = (time.time() - t0) / reps
        pairs = pairs or B
        print(f"{name}: {dt*1e3:.1f} ms/step = {pairs/dt:.0f} pairs/s "
              f"(loss {float(loss):.4f})", file=sys.stderr)
        return dt

    dt_pad = timeit(
        f"padded ECA train step (seq 256, 2x{half} grad accumulation, "
        "one adam update)",
        make_accum_step(loss_padded), pad_batch_half, pad_batch_half,
        pairs=B)
    dt_packed = timeit("packed ECA train step (real lengths, batch 512)",
                       make_step(loss_packed), packed_batch)
    print(f"speedup: {dt_pad/dt_packed:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
