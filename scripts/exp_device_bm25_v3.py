"""Device BM25, take 3: scatter micro-A/B at the real block shapes.

Take 2 (exp_device_bm25_v2.py): gather fixed (7 ms), ONE fused scatter at
70.7 ms = the block's floor. Hypothesis under test: most scattered lanes
are PADDING (mean ~2.2 real tail terms/query vs 2x14976+4x2048 = 38k
padded lanes), and they all add to the SAME trash column — if XLA
serializes same-address adds, the padding dominates. Variants:

- A (baseline): all padding lanes -> one trash column (n_docs).
- B: padding lanes -> UNIQUE ascending ids past n_docs (row-local), so no
  two lanes in a row collide; accumulator widened by the lane count.
- C: per-slot sorted scatters with unique pads (indices_are_sorted=True
  is then honest for the padding tail of each slot).
- D: half the tail budget (1x14976 mid + 4x2048 small) with unique pads —
  does scatter time scale with padded lanes?
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D_DOCS = 1_500_000
L_MID = 14_976
L_SMALL = 2_048
N_MID, N_SMALL = 2, 4
Q_BLK = 128


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        sync(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.time() - t0) / reps * 1e3
        print(f"{name}: {dt:.1f} ms", file=sys.stderr)
        return out, dt

    rng = np.random.default_rng(0)

    def make(n_mid, n_small):
        """Synthesize realistic gathered blocks: ~2.2 real terms/query,
        real lens drawn like the v2 run, rest padding."""
        lanes = n_mid * L_MID + n_small * L_SMALL
        ids = np.full((Q_BLK, lanes), D_DOCS, np.int32)
        vals = np.zeros((Q_BLK, lanes), np.float32)
        for q in range(Q_BLK):
            off = 0
            for s in range(n_mid):
                ln = int(rng.integers(2048, L_MID)) if rng.random() < 0.5 \
                    else 0
                ids[q, off:off + ln] = rng.integers(0, D_DOCS, ln)
                vals[q, off:off + ln] = rng.random(ln) + 0.1
                off += L_MID
            for s in range(n_small):
                ln = int(rng.integers(16, L_SMALL)) if rng.random() < 0.4 \
                    else 0
                ids[q, off:off + ln] = rng.integers(0, D_DOCS, ln)
                vals[q, off:off + ln] = rng.random(ln) + 0.1
                off += L_SMALL
        return jnp.asarray(ids), jnp.asarray(vals), lanes

    ids_a, vals_a, lanes = make(N_MID, N_SMALL)
    # unique ascending pads: lane position past D_DOCS
    pos = np.arange(lanes, dtype=np.int32)[None, :]
    ids_b = jnp.where(np.asarray(ids_a) == D_DOCS,
                      jnp.asarray(D_DOCS + pos), ids_a)

    scores = jnp.zeros((Q_BLK, D_DOCS), jnp.float32)
    rows = jnp.arange(Q_BLK)[:, None]

    @jax.jit
    def scat_trash(scores, ids, vals):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, 128), jnp.float32)], axis=1)
        acc = acc.at[rows, ids].add(vals)
        return acc[:, :D_DOCS]

    pad_w = ((lanes + 127) // 128) * 128

    @jax.jit
    def scat_unique(scores, ids, vals):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, pad_w), jnp.float32)], axis=1)
        acc = acc.at[rows, ids].add(vals)
        return acc[:, :D_DOCS]

    _, a_ms = timeit("A trash-column pads", scat_trash, scores, ids_a,
                     vals_a)
    _, b_ms = timeit("B unique pads", scat_unique, scores, ids_b, vals_a)

    @jax.jit
    def scat_per_slot(scores, ids, vals):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, pad_w), jnp.float32)], axis=1)
        off = 0
        for cap in [L_MID] * N_MID + [L_SMALL] * N_SMALL:
            acc = acc.at[rows, ids[:, off:off + cap]].add(
                vals[:, off:off + cap])
            off += cap
        return acc[:, :D_DOCS]

    _, c_ms = timeit("C per-slot unique pads", scat_per_slot, scores,
                     ids_b, vals_a)

    ids_d, vals_d, lanes_d = make(1, 4)
    pos_d = np.arange(lanes_d, dtype=np.int32)[None, :]
    ids_d = jnp.where(np.asarray(ids_d) == D_DOCS,
                      jnp.asarray(D_DOCS + pos_d), ids_d)
    pad_d = ((lanes_d + 127) // 128) * 128

    @jax.jit
    def scat_half(scores, ids, vals):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, pad_d), jnp.float32)], axis=1)
        acc = acc.at[rows, ids].add(vals)
        return acc[:, :D_DOCS]

    _, d_ms = timeit("D half-lanes unique pads", scat_half, scores, ids_d,
                     vals_d)
    print(f"lanes full={lanes} half={lanes_d}", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
