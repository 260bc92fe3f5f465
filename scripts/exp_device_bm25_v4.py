"""Device BM25, take 4: BLOCK-LEVEL slot pools + 2D scatter.

Take 3 showed the fused scatter is linear in padded lanes (~14 ms base +
~1.4e-3 ms per per-query lane at Q=128) with no same-address pathology.
Per-QUERY slots are the waste: every query pays 2x14976 mid lanes though
the mean mid-term count per query is ~0.3. Under test: a per-BLOCK pool —
32 mid slots (term, query) pairs shared by the block + 256 small slots —
scattered with explicit (row, col) index pairs:

  A (baseline): per-query slots, 1D row-scatter (current production)
  B: block pool, 2D scatter  (mid 32x14976 + small 256x2048 = 1.0M
     elements vs A's 4.9M)
  C: B but scatter in TWO calls (mid then small) — does the 2D scatter
     also pay ~a full accumulator pass per op?

Equality: A == B bitwise on the same synthetic plan (f32 adds in both,
same per-(query,term) contributions, order may differ -> compare with
exact integer-valued weights).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D_DOCS = 1_500_000
L_MID = 14_976
L_SMALL = 2_048
N_MID, N_SMALL = 2, 4          # per-query (baseline)
P_MID, P_SMALL = 48, 256       # per-block pools
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

    # synthetic per-block plan: ~38 mid terms + ~205 small terms per block
    # (Zipf-8 queries: ~0.3 mid + ~1.6 small per query), integer weights
    mid_entries = []   # (query_row, ids, vals)
    small_entries = []
    for q in range(Q_BLK):
        for _ in range(int(rng.random() < 0.3)):
            ln = int(rng.integers(2048, L_MID))
            mid_entries.append((q, rng.integers(0, D_DOCS, ln).astype(
                np.int32), rng.integers(1, 8, ln).astype(np.float32)))
        for _ in range(int(rng.random() < 0.8) + int(rng.random() < 0.8)):
            ln = int(rng.integers(16, L_SMALL))
            small_entries.append((q, rng.integers(0, D_DOCS, ln).astype(
                np.int32), rng.integers(1, 8, ln).astype(np.float32)))
    print(f"block plan: {len(mid_entries)} mid terms, "
          f"{len(small_entries)} small terms", file=sys.stderr)
    assert len(mid_entries) <= P_MID and len(small_entries) <= P_SMALL

    # ---- A: per-query slots (current production layout) ----------------
    lanes = N_MID * L_MID + N_SMALL * L_SMALL
    ids_a = np.full((Q_BLK, lanes), D_DOCS, np.int32)
    vals_a = np.zeros((Q_BLK, lanes), np.float32)
    mid_used = np.zeros(Q_BLK, np.int64)
    small_used = np.zeros(Q_BLK, np.int64)
    for q, ids, vals in mid_entries:
        s = mid_used[q]; assert s < N_MID
        off = s * L_MID
        ids_a[q, off:off + len(ids)] = ids
        vals_a[q, off:off + len(ids)] = vals
        mid_used[q] += 1
    for q, ids, vals in small_entries:
        s = small_used[q]
        if s >= N_SMALL:
            continue
        off = N_MID * L_MID + s * L_SMALL
        ids_a[q, off:off + len(ids)] = ids
        vals_a[q, off:off + len(ids)] = vals
        small_used[q] += 1

    # ---- B: block pools --------------------------------------------------
    pool_mid_ids = np.full((P_MID, L_MID), D_DOCS, np.int32)
    pool_mid_vals = np.zeros((P_MID, L_MID), np.float32)
    pool_mid_row = np.zeros(P_MID, np.int32)
    for s, (q, ids, vals) in enumerate(mid_entries):
        pool_mid_ids[s, :len(ids)] = ids
        pool_mid_vals[s, :len(ids)] = vals
        pool_mid_row[s] = q
    pool_small_ids = np.full((P_SMALL, L_SMALL), D_DOCS, np.int32)
    pool_small_vals = np.zeros((P_SMALL, L_SMALL), np.float32)
    pool_small_row = np.zeros(P_SMALL, np.int32)
    for s, (q, ids, vals) in enumerate(small_entries):
        pool_small_ids[s, :len(ids)] = ids
        pool_small_vals[s, :len(ids)] = vals
        pool_small_row[s] = q

    scores = jnp.zeros((Q_BLK, D_DOCS), jnp.float32)
    rows = jnp.arange(Q_BLK)[:, None]

    @jax.jit
    def scat_a(scores, ids, vals):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, 128), jnp.float32)], axis=1)
        acc = acc.at[rows, ids].add(vals)
        return acc[:, :D_DOCS]

    @jax.jit
    def scat_b(scores, m_ids, m_vals, m_row, s_ids, s_vals, s_row):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, 128), jnp.float32)], axis=1)
        all_rows = jnp.concatenate(
            [jnp.repeat(m_row, L_MID), jnp.repeat(s_row, L_SMALL)])
        all_ids = jnp.concatenate([m_ids.ravel(), s_ids.ravel()])
        all_vals = jnp.concatenate([m_vals.ravel(), s_vals.ravel()])
        acc = acc.at[all_rows, all_ids].add(all_vals)
        return acc[:, :D_DOCS]

    @jax.jit
    def scat_c(scores, m_ids, m_vals, m_row, s_ids, s_vals, s_row):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, 128), jnp.float32)], axis=1)
        acc = acc.at[jnp.repeat(m_row, L_MID), m_ids.ravel()].add(
            m_vals.ravel())
        acc = acc.at[jnp.repeat(s_row, L_SMALL), s_ids.ravel()].add(
            s_vals.ravel())
        return acc[:, :D_DOCS]

    dev = jax.device_put
    ids_a_d, vals_a_d = dev(ids_a), dev(vals_a)
    pm = (dev(pool_mid_ids), dev(pool_mid_vals), dev(pool_mid_row))
    ps = (dev(pool_small_ids), dev(pool_small_vals), dev(pool_small_row))
    sync((ids_a_d, pm, ps))

    out_a, a_ms = timeit("A per-query 1D scatter", scat_a, scores,
                         ids_a_d, vals_a_d)
    out_b, b_ms = timeit("B block-pool 2D scatter", scat_b, scores,
                         *pm, *ps)
    out_c, c_ms = timeit("C block-pool 2D, two calls", scat_c, scores,
                         *pm, *ps)

    # equality on integer weights (order-independent in f32 up to 2^24)
    a_np = np.asarray(out_a)
    b_np = np.asarray(out_b)
    c_np = np.asarray(out_c)
    print(f"B == A: {np.array_equal(a_np, b_np)}  "
          f"C == A: {np.array_equal(a_np, c_np)}", file=sys.stderr)
    # B includes entries A dropped (small overflow beyond N_SMALL)
    if not np.array_equal(a_np, b_np):
        diff = np.argwhere(a_np != b_np)
        print(f"  ({len(diff)} differing cells — check small_used "
              f"overflow: {int((small_used > N_SMALL).sum())})",
              file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
