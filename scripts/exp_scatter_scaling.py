"""Scatter-add cost vs accumulator shape on the v5e.

exp_bm25_scatter_iso measured ~3.4e-5 ms/lane into a (512, 1.5M) f32
accumulator (3GB) vs round-4's 1.1e-5 into (128, 1.5M) (768MB). If the
per-lane cost scales with the accumulator working set, scoring in
column chunks (virtual shards) is the structural win; if it scales with
the ROW count (q_block), smaller blocks are. This sweeps both axes with
a fixed 2M random (row, doc) update set.
"""
import functools
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


def sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    n_lanes = 2_000_000
    cap = 2048
    n_slots = n_lanes // cap
    rng = np.random.default_rng(0)

    for q_rows, n_cols in [(512, 1_500_096), (256, 1_500_096),
                           (128, 1_500_096), (512, 750_080),
                           (512, 375_040), (512, 187_520),
                           (128, 187_520)]:
        ids = rng.integers(0, n_cols, (n_slots, cap), dtype=np.int32)
        ids.sort(axis=1)  # postings are doc-ascending within a slot
        vals = rng.random((n_slots, cap), dtype=np.float32)
        rows = rng.integers(0, q_rows, n_slots, dtype=np.int32)
        d_ids = jax.device_put(jnp.asarray(ids))
        d_vals = jax.device_put(jnp.asarray(vals))
        d_rows = jax.device_put(jnp.asarray(rows))

        @functools.partial(jax.jit, static_argnames=("q", "d"))
        def scat(ids, vals, rows, *, q, d):
            scores = jnp.zeros((q, d), jnp.float32)
            scores = scores.at[rows[:, None], ids].add(vals)
            return scores.sum(axis=1)  # force the scatter, tiny output

        o = scat(d_ids, d_vals, d_rows, q=q_rows, d=n_cols)
        sync(o)
        t0 = time.time()
        for _ in range(3):
            o = scat(d_ids, d_vals, d_rows, q=q_rows, d=n_cols)
        sync(o)
        dt = (time.time() - t0) / 3 * 1e3
        gb = q_rows * n_cols * 4 / 1e9
        print(f"acc ({q_rows:>4}, {n_cols:>9}) {gb:4.1f}GB: {dt:6.1f} ms "
              f"for {n_lanes/1e6:.1f}M lanes = "
              f"{dt/n_lanes*1e6:.1f} ns/lane", flush=True)
        del d_ids, d_vals, d_rows, o


if __name__ == "__main__":
    main()
