"""Serving LATENCY (not throughput): per-dispatch wall time of the fused
embed+search program at batch 1 / 64 / 1280 over the 1.5M x 768 KB, p50/p99
over repeated dispatches. The reference serves one query at a time
(meerqat/interact/system.py); this measures what that user experiences here,
and how much the tunnel dominates at small batches (on directly-attached
hardware the small-batch numbers would be far lower).

Run: python scripts/exp_latency.py  (one TPU process at a time)
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t = threading.Timer(600, lambda: (
        print("backend init exceeded 600s; exiting", file=sys.stderr),
        os._exit(3)))
    t.daemon = True
    t.start()
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()
    t.cancel()
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips_pallas, packing

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    N, D, K = 1_500_000, 768, 100
    key = jax.random.key(0)
    # generate DIRECTLY in the kernel's (d, N_pad) layout: materializing a
    # row-major kb first and transposing doubles peak HBM (kb+kbt = 4.6GB
    # coexist), which OOMed on 2026-08-18 when available HBM dipped to
    # ~6-7GB (shared chip). For latency timing random values are random
    # either way; padding columns are masked via valid_rows=N.
    n_pad = N + ((-N) % 512)
    kbt = jax.random.normal(jax.random.fold_in(key, 1), (D, n_pad),
                            jnp.bfloat16) / np.sqrt(D)
    if n_pad != N:
        kbt = kbt.at[:, N:].set(0)
    sync(kbt)

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.fold_in(key, 2), cfg))

    rng = np.random.default_rng(0)

    def packed_args(n_q, q_pad):
        lengths = np.clip(np.round(rng.lognormal(np.log(18.0), 0.35, n_q)),
                          8, 64).astype(int)
        seqs = [rng.integers(1000, 10_000, size=l).astype(np.int32)
                for l in lengths]
        p = packing.pack_token_sequences(seqs, row_len=64, n_cls=q_pad,
                                         pad_rows_to=8)
        return tuple(jnp.asarray(a) for a in (
            p.input_ids, p.segment_ids, p.position_ids, p.cls_rows,
            p.cls_cols))

    from viquae_tpu.ops import mips

    @jax.jit
    def step(params, ids, seg, pos, cr, cc, kbt):
        q = dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                             deterministic=True,
                             compute_dtype=jnp.bfloat16
                             ).astype(jnp.bfloat16)
        return mips_pallas.topk_fused(q, kbt, K, valid_rows=jnp.int32(N))

    @jax.jit
    def step_approx(params, ids, seg, pos, cr, cc, kbt):
        q = dpr.apply_packed(params, cfg, ids, seg, pos, cr, cc,
                             deterministic=True,
                             compute_dtype=jnp.bfloat16
                             ).astype(jnp.bfloat16)
        return mips.topk_global(q, kbt, K, valid_rows=jnp.int32(N),
                                compute_dtype=jnp.bfloat16, mode="approx",
                                transposed=True)

    for label, fn in (("exact/fused", step), ("approx", step_approx)):
        for n_q, q_pad in ((1, 8), (64, 64), (1257, 1280)):
            args = packed_args(n_q, q_pad)
            out = fn(params, *args, kbt)
            sync(out)  # compile + warm
            lat = []
            reps = 30 if n_q < 100 else 10
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(params, *args, kbt)
                sync(out)
                lat.append((time.perf_counter() - t0) * 1e3)
            lat = np.sort(lat)
            print(f"[{label:>11}] batch {n_q:>5} (pad {q_pad:>5}): "
                  f"p50 {np.percentile(lat, 50):7.1f} ms  "
                  f"p99 {np.percentile(lat, 99):7.1f} ms  min {lat[0]:7.1f}  "
                  f"({n_q / np.percentile(lat, 50) * 1e3:,.0f} q/s at p50)",
                  file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
