"""Mechanism probe: what sets the DeviceBM25 tail-scatter's per-lane
cost? exp_bm25_block_decomp measured ~136 ms for 4.03M lanes into a
(512, 1.5M) f32 block (3.4e-5 ms/lane) — 3x the round-4 cost model
fitted on 128-query blocks (0.77GB accumulator). Candidates: accumulator
size, accumulator orientation (query-major vs doc-major), and doc-order
within a slot.

Variants (same synthetic lane structure as prod: 1856 mid slots x 2048
cap + 960 small x 512, rows random, ids doc-ascending within a slot,
~49% mid fill to match the measured 1.96M actual lanes; all in ONE
process, interleaved):
  qmajor        scatter (row, doc) into (512, 1.5M)        [prod control]
  qmajor_4way   4 scatters into 4 x (512, 375k) — lanes partitioned by
                doc range at "plan" time (pools split 4-way, cap/4)
  dmajor        scatter (doc, row) into (1.5M, 512) — consecutive lanes
                walk ascending sublanes
  dmajor_unsort same, ids shuffled within each slot
  dmajor_e2e    dmajor + transpose back + _select_topk (viability e2e)
  qmajor_e2e    qmajor + _select_topk                      [prod e2e]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from viquae_tpu.ops import mips  # noqa: E402


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


Q = 512
D = 1_536_000  # 1.5M rounded to 128
P_MID, CAP_MID = 1856, 2048
P_SML, CAP_SML = 960, 512
FILL = 0.49  # -> ~1.96M actual lanes of 4.03M static


def make_lanes(rng, n_parts=1, sorted_ids=True):
    """Per-partition (ids, vals, rows) with prod-like structure. For
    n_parts>1 the doc space splits into equal ranges and each slot's
    cap splits by n_parts (same static lane total)."""
    parts = []
    d_part = D // n_parts
    for p in range(n_parts):
        lo = p * d_part
        out = []
        for n_slots, cap in ((P_MID, CAP_MID // n_parts),
                             (P_SML, CAP_SML // n_parts)):
            ids = rng.integers(lo, lo + d_part,
                               size=(n_slots, cap)).astype(np.int32)
            if sorted_ids:
                ids.sort(axis=1)
            fill = (rng.random((n_slots, cap)) < FILL)
            vals = np.where(fill, rng.random((n_slots, cap)), 0.0
                            ).astype(np.float32)
            # masked lanes scatter to the trash column like prod
            ids = np.where(fill, ids, D - 1 if n_parts == 1
                           else lo + d_part - 1)
            rows = rng.integers(0, Q, size=(n_slots, 1)).astype(np.int32)
            rows = np.broadcast_to(rows, ids.shape)
            out.append((ids.ravel(), vals.ravel(), rows.ravel()))
        ids = np.concatenate([o[0] for o in out])
        vals = np.concatenate([o[1] for o in out])
        rows = np.concatenate([o[2] for o in out])
        parts.append((jnp.asarray(ids), jnp.asarray(vals),
                      jnp.asarray(rows)))
    return parts


def main():
    rng = np.random.default_rng(7)
    lanes_1 = make_lanes(rng, 1)
    lanes_4 = make_lanes(rng, 4)
    lanes_unsort = make_lanes(rng, 1, sorted_ids=False)
    total = sum(int(i.size) for i, _, _ in lanes_1)
    print(f"static lanes: {total/1e6:.2f}M", flush=True)

    @jax.jit
    def qmajor(ids, vals, rows):
        acc = jnp.zeros((Q, D), jnp.float32)
        acc = acc.at[rows, ids].add(vals)
        return acc.max(axis=1)

    @jax.jit
    def qmajor_4way(parts):
        outs = []
        d_part = D // 4
        for p, (ids, vals, rows) in enumerate(parts):
            acc = jnp.zeros((Q, d_part), jnp.float32)
            acc = acc.at[rows, ids - p * d_part].add(vals)
            outs.append(acc.max(axis=1))
        return jnp.stack(outs).max(axis=0)

    @jax.jit
    def dmajor(ids, vals, rows):
        acc = jnp.zeros((D, Q), jnp.float32)
        acc = acc.at[ids, rows].add(vals)
        return acc.max(axis=0)

    @jax.jit
    def qmajor_e2e(ids, vals, rows):
        acc = jnp.zeros((Q, D), jnp.float32)
        acc = acc.at[rows, ids].add(vals)
        return mips._select_topk(acc, 100, "fast")

    @jax.jit
    def dmajor_e2e(ids, vals, rows):
        acc = jnp.zeros((D, Q), jnp.float32)
        acc = acc.at[ids, rows].add(vals)
        return mips._select_topk(acc.T, 100, "fast")

    calls = {
        "qmajor": lambda: qmajor(*lanes_1[0]),
        "qmajor_4way": lambda: qmajor_4way(lanes_4),
        "dmajor": lambda: dmajor(*lanes_1[0]),
        "dmajor_unsort": lambda: dmajor(*lanes_unsort[0]),
        "qmajor_e2e": lambda: qmajor_e2e(*lanes_1[0]),
        "dmajor_e2e": lambda: dmajor_e2e(*lanes_1[0]),
    }
    for name, call in calls.items():
        t0 = time.time()
        sync(call())
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
    results = {name: [] for name in calls}
    for rep in range(5):
        for name, call in calls.items():
            t0 = time.time()
            sync(call())
            results[name].append((time.time() - t0) * 1e3)
    for name, times in results.items():
        print(f"{name:14s}: best {min(times):7.1f} ms  all "
              f"{['%.0f' % t for t in times]}", flush=True)


if __name__ == "__main__":
    main()
