"""Upload-ahead scheduling probe (VERDICT r2 item 9).

The serving loop measures ~10% under the sync-only bench; the evidenced
explanation is that the tunneled link serializes host->device uploads with
dispatched compute (scripts/exp_serving_probe.py). One unexplored idea:
upload batch n+1's int16 canvas BEFORE dispatching batch n's program, so
the link is busy only while the device is idle between dispatches.

Three schedules over the same 12-batch stream (1280 queries x 1.5M KB,
packed canvases, Pallas-fused exact engine):
  A baseline    — per batch: upload -> dispatch -> (lagged drain)
  B upload-ahead— upload batch n+1, then dispatch batch n
  C device-only — canvases pre-uploaded outside the loop (the sync-only
                  bench's protocol; the target ceiling)

    python scripts/exp_upload_ahead.py [--batches 12]
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
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--kb", type=int, default=1_500_000)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips_pallas, packing

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    n_kb, dim, row_len, q_pad = args.kb, 768, 64, 1280
    k = 100
    key = jax.random.key(0)
    # synthetic KB: generate DIRECTLY in the (d, N_pad) kernel layout —
    # a transpose would briefly hold 3 x 2.3GB copies for nothing
    n_pad = ((n_kb + 511) // 512) * 512
    kbt = jax.random.normal(jax.random.fold_in(key, 1), (dim, n_pad),
                            jnp.bfloat16) / np.sqrt(dim)
    sync(kbt)

    cfg = dpr.DPRConfig(bert=bert.BertConfig(add_pooler=False))
    params16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.fold_in(key, 2), cfg))

    rng = np.random.default_rng(0)

    def make_canvas(seed):
        r = np.random.default_rng(seed)
        lengths = np.clip(np.round(r.lognormal(np.log(18.0), 0.35, 1257)),
                          8, row_len).astype(int)
        seqs = [r.integers(1000, 10_000, size=l).astype(np.int32)
                for l in lengths]
        p = packing.pack_token_sequences(
            seqs, row_len=row_len, n_rows=416, n_cls=q_pad)
        # compact wire dtypes (ir/serving compact_transfer)
        return (p.input_ids.astype(np.int16),
                p.segment_ids.astype(np.int8),
                p.position_ids.astype(np.int8),
                p.cls_rows.astype(np.int16),
                p.cls_cols.astype(np.int8))

    host_canvases = [make_canvas(s) for s in range(args.batches)]

    @jax.jit
    def retrieve(params, ids, seg, pos, cr, cc, kbt):
        q = dpr.apply_packed(
            params, cfg, ids.astype(jnp.int32), seg.astype(jnp.int32),
            pos.astype(jnp.int32), cr.astype(jnp.int32),
            cc.astype(jnp.int32), deterministic=True,
            compute_dtype=jnp.bfloat16,
        ).astype(jnp.bfloat16)
        s, i = mips_pallas.topk_fused(q, kbt, k, valid_rows=jnp.int32(n_kb))
        return jax.lax.bitcast_convert_type(s, jnp.int16), i

    def upload(c):
        return tuple(jnp.asarray(a) for a in c)

    print("canvases built; compiling", file=sys.stderr)
    # warmup compile
    out = retrieve(params16, *upload(host_canvases[0]), kbt)
    sync(out)
    print("compiled", file=sys.stderr)

    # all schedules keep a LAGGED WINDOW of 2 in-flight programs (the
    # serving loop's drain depth; unbounded dispatch OOMs — each queued
    # program holds its kernel workspace)
    def run_baseline():
        pending = []
        t0 = time.time()
        for c in host_canvases:
            pending.append(retrieve(params16, *upload(c), kbt))
            if len(pending) > 2:
                sync(pending.pop(0))
        for o in pending:
            sync(o)
        return time.time() - t0

    def run_upload_ahead():
        pending = []
        t0 = time.time()
        dev = upload(host_canvases[0])
        for i in range(len(host_canvases)):
            nxt = (upload(host_canvases[i + 1])
                   if i + 1 < len(host_canvases) else None)
            pending.append(retrieve(params16, *dev, kbt))
            dev = nxt
            if len(pending) > 2:
                sync(pending.pop(0))
        for o in pending:
            sync(o)
        return time.time() - t0

    def run_device_only():
        devs = [upload(c) for c in host_canvases]
        for d in devs:
            sync(d[0])
        pending = []
        t0 = time.time()
        for d in devs:
            pending.append(retrieve(params16, *d, kbt))
            if len(pending) > 2:
                sync(pending.pop(0))
        for o in pending:
            sync(o)
        return time.time() - t0

    n_q_total = 1257 * args.batches
    results = {}
    # interleave the schedules to cancel link drift (CLAUDE.md: first-touch
    # timings over the tunnel are unstable)
    for name, fn in [("baseline", run_baseline),
                     ("upload_ahead", run_upload_ahead),
                     ("device_only", run_device_only)]:
        print(f"warm {name}", file=sys.stderr)
        fn()  # warm pass
    for rep in range(2):
        for name, fn in [("baseline", run_baseline),
                         ("upload_ahead", run_upload_ahead),
                         ("device_only", run_device_only)]:
            dt = fn()
            results.setdefault(name, []).append(n_q_total / dt)
    import json
    summary = {n: round(float(np.max(v)), 1) for n, v in results.items()}
    summary["upload_ahead_vs_baseline"] = round(
        summary["upload_ahead"] / summary["baseline"], 4)
    summary["baseline_vs_device_only"] = round(
        summary["baseline"] / summary["device_only"], 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
