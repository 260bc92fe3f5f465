"""Packed vs padded biencoder TRAINING step on the real chip.

Reference recipe shapes (EXPERIMENTS.rst:274-279): 32 questions x 2
passages per device step, tokenized to max_length 256. Real lengths:
questions ~19 tokens, passages ~125 (uniform_passages n=100 + title +
specials). Measures jitted value_and_grad+sgd step time both ways.
"""
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

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import packing
    from viquae_tpu.train import objectives

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    N, M, L = 64, 2, 256
    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    key = jax.random.key(0)
    params = {
        "question": dpr.init(jax.random.fold_in(key, 0), cfg),
        "context": dpr.init(jax.random.fold_in(key, 1), cfg),
    }
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    q_lens = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, N)), 8, 64
                     ).astype(int)
    c_lens = np.clip(np.round(rng.normal(125, 8, N * M)), 100, 160).astype(int)
    q_seqs = [rng.integers(1000, 10000, l).astype(np.int32) for l in q_lens]
    c_seqs = [rng.integers(1000, 10000, l).astype(np.int32) for l in c_lens]
    labels = jnp.asarray((np.arange(N) * M).astype(np.int32))

    # ---- padded ---------------------------------------------------------
    def pad(seqs, L):
        ids = np.zeros((len(seqs), L), np.int32)
        mask = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    q_ids, q_mask = pad(q_seqs, L)
    c_ids, c_mask = pad(c_seqs, L)

    @jax.jit
    def step_padded(params, opt_state, q_ids, q_mask, c_ids, c_mask, labels):
        def loss(p):
            q = dpr.apply(p["question"], cfg, q_ids, q_mask,
                          deterministic=True,
                          compute_dtype=jnp.bfloat16)["pooler_output"]
            c = dpr.apply(p["context"], cfg, c_ids, c_mask,
                          deterministic=True,
                          compute_dtype=jnp.bfloat16)["pooler_output"]
            return objectives.biencoder_loss(q, c, labels)[0]
        l, g = jax.value_and_grad(loss)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, l

    # ---- packed ---------------------------------------------------------
    pq = packing.pack_token_sequences(q_seqs, row_len=64, pad_rows_to=8)
    pc = packing.pack_token_sequences(c_seqs, row_len=256, pad_rows_to=8)
    pq_args = tuple(jnp.asarray(a) for a in (
        pq.input_ids, pq.segment_ids, pq.position_ids, pq.cls_rows, pq.cls_cols))
    pc_args = tuple(jnp.asarray(a) for a in (
        pc.input_ids, pc.segment_ids, pc.position_ids, pc.cls_rows, pc.cls_cols))
    print(f"question canvas {pq.rows}x64, context canvas {pc.rows}x256",
          file=sys.stderr)

    @jax.jit
    def step_packed(params, opt_state, pq_args, pc_args, labels):
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

    def timeit(name, fn, *args, reps=5):
        out = fn(*args); sync(out[2])
        t0 = time.time()
        state = args
        for _ in range(reps):
            out = fn(*args)
        sync(out[2])
        dt = (time.time() - t0) / reps
        print(f"{name}: {dt*1e3:.1f} ms/step -> "
              f"{N/dt:.0f} questions/s", file=sys.stderr)

    timeit("padded step (seq 256)", step_padded, params, opt_state,
           q_ids, q_mask, c_ids, c_mask, labels)
    timeit("packed step (real lengths)", step_packed, params, opt_state,
           pq_args, pc_args, labels)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
