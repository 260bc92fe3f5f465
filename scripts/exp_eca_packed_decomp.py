"""Decompose the packed-ECA training slowdown: forward vs backward, remat
vs not, scatter vs not (1.58x measured where token math predicts ~4x)."""
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

    B, SEQ = 512, 256
    cfg = mm.MMConfig(
        bert=bert.BertConfig(add_pooler=False),
        n_faces=4, face_dim=512, bbox_dim=7,
        image_dims=(("clip-RN50", 1024), ("imagenet-RN50", 2048)),
    )
    key = jax.random.key(0)
    params = mm.eca_init(jax.random.fold_in(key, 0), cfg)
    params = jax.device_get(params)

    rng = np.random.default_rng(0)
    lens = np.clip(np.round(rng.lognormal(np.log(64.0), 0.30, B)),
                   5, SEQ).astype(int)
    ids = np.zeros((B, SEQ), np.int32)
    mask = np.zeros((B, SEQ), np.int32)
    for i, l in enumerate(lens):
        ids[i, :l] = rng.integers(1000, 20_000, l)
        mask[i, :l] = 1
    inputs = {
        "text_inputs": {"input_ids": ids, "attention_mask": mask},
        "face_inputs": {
            "face": rng.standard_normal((B, 1, 4, 512)).astype(np.float32),
            "bbox": rng.standard_normal((B, 1, 4, 7)).astype(np.float32),
            "attention_mask": np.ones((B, 1, 4), np.int32),
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
    canvas = tdata.pack_mm_text_inputs(inputs, SEQ)
    print("canvas", canvas["canvas_input_ids"].shape,
          "density", (canvas["canvas_segment_ids"] > 0).mean(),
          file=sys.stderr)

    def fwd_packed(p, remat):
        t = canvas
        return mm.eca_apply_packed(
            p, cfg, jnp.asarray(t["canvas_input_ids"]),
            jnp.asarray(t["canvas_segment_ids"]),
            jnp.asarray(t["canvas_position_ids"]),
            jnp.asarray(t["canvas_cls_rows"]),
            jnp.asarray(t["canvas_cls_cols"]),
            jnp.asarray(t["canvas_vis_rows"]),
            jnp.asarray(t["canvas_vis_cols"]),
            inputs["face_inputs"], inputs["image_inputs"],
            deterministic=True, compute_dtype=jnp.bfloat16,
            remat_layers=remat,
        )[:B]

    def fwd_padded(p, remat):
        return mm.eca_apply(
            p, cfg, inputs["text_inputs"], inputs["face_inputs"],
            inputs["image_inputs"], deterministic=True,
            compute_dtype=jnp.bfloat16, remat_layers=remat,
        ).pooler_output

    def timeit(name, fn, reps=5):
        p = jax.tree_util.tree_map(jnp.asarray, params)
        try:
            out = fn(p)
            sync(out)
            t0 = time.time()
            for _ in range(reps):
                out = fn(p)
            sync(out)
            print(f"{name}: {(time.time()-t0)/reps*1e3:.1f} ms",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}",
                  file=sys.stderr)
        del p

    for name, f in (("packed", fwd_packed), ("padded", fwd_padded)):
        timeit(f"{name} forward only", jax.jit(lambda p, f=f: f(p, False)))
        timeit(f"{name} loss+grad (no remat)",
               jax.jit(lambda p, f=f: jax.grad(
                   lambda q: jnp.sum(f(q, False)[:64] ** 2))(p)))
        timeit(f"{name} loss+grad (remat)",
               jax.jit(lambda p, f=f: jax.grad(
                   lambda q: jnp.sum(f(q, True)[:64] ** 2))(p)))


if __name__ == "__main__":
    main()
