"""IVF-Flat at KB scale on the real chip: build cost, interactive latency,
recall vs exact — the measurement behind ops/ivf.py's "when to use which
index" guidance.

Setup: 1.5M x 768 synthetic CLUSTERED embeddings (4096 true centers,
noise sigma 0.35 — gaussian-random KBs have no IVF structure by
construction), generated on device (multi-GB tunnel uploads are the known
killer). Compares:

  A  exact flat search (ops.mips.topk_global, the serving engine class)
  B  IVF nlist=1024 at nprobe 8/32/96, bf16 storage

at batches 1/8/32/128, plus build wall-clock and R@20 vs exact.

Usage: timeout 1800 python scripts/exp_ivf.py
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax

    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def _init_watchdog():
        print("exp_ivf: backend init exceeded 600s; exiting", file=sys.stderr)
        os._exit(3)

    t = threading.Timer(600, _init_watchdog)
    t.daemon = True
    t.start()
    jax.devices()
    t.cancel()

    import jax.numpy as jnp
    from viquae_tpu.ops import mips
    from viquae_tpu.ops.ivf import IVFFlatIndex

    n_kb, dim, n_centers, sigma = 1_500_000, 768, 4096, 0.35
    small = bool(int(os.environ.get("IVF_SMALL", "0")))
    if small:
        n_kb, n_centers = 150_000, 512

    key = jax.random.key(0)
    centers = jax.random.normal(
        jax.random.fold_in(key, 1), (n_centers, dim), jnp.float32)
    # chunked generation: kb[i] = centers[c_i] + sigma * noise
    chunk = 1 << 18
    parts = []
    for j, i0 in enumerate(range(0, n_kb, chunk)):
        m = min(chunk, n_kb - i0)
        kc = jax.random.fold_in(key, 100 + j)
        cid = jax.random.randint(kc, (m,), 0, n_centers)
        noise = jax.random.normal(jax.random.fold_in(kc, 1), (m, dim),
                                  jnp.float32)
        parts.append((jnp.take(centers, cid, axis=0) + sigma * noise
                      ).astype(jnp.bfloat16))
    kb = jnp.concatenate(parts)
    del parts
    sync(kb)
    print(f"kb {kb.shape} {kb.dtype} on {jax.devices()[0].platform}",
          flush=True)

    n_eval = 256
    qk = jax.random.fold_in(key, 7)
    q_cid = jax.random.randint(qk, (n_eval,), 0, n_centers)
    q = (jnp.take(centers, q_cid, axis=0)
         + sigma * jax.random.normal(jax.random.fold_in(qk, 1),
                                     (n_eval, dim), jnp.float32)
         ).astype(jnp.float32)
    sync(q)

    # ---- A: exact reference + exact batch-1 latency ---------------------
    t0 = time.perf_counter()
    s_ex, i_ex = mips.topk_global(q, kb, 20, valid_rows=jnp.int32(n_kb),
                                  compute_dtype=jnp.bfloat16)
    sync(i_ex)
    print(f"exact eval batch ({n_eval}q): {time.perf_counter()-t0:.2f}s "
          "(incl compile)", flush=True)
    i_ex = np.asarray(i_ex)

    def timed(fn, reps=12):
        fn()  # warmup/compile
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            lat.append(time.perf_counter() - t0)
        lat.sort()
        return lat[len(lat) // 2] * 1e3  # median ms

    exact_lat = {}
    for b in (1, 8, 32, 128):
        qb = q[:b]
        exact_lat[b] = timed(lambda qb=qb: sync(mips.topk_global(
            qb, kb, 20, valid_rows=jnp.int32(n_kb),
            compute_dtype=jnp.bfloat16)[1]))
        print(f"exact batch {b}: {exact_lat[b]:.1f} ms", flush=True)

    # ---- B: IVF build + search ------------------------------------------
    t0 = time.perf_counter()
    ivf = IVFFlatIndex(kb, nlist=1024 if not small else 256, nprobe=32,
                       dtype=jnp.bfloat16, seed=0)
    sync(ivf._st.matrix)
    build_s = time.perf_counter() - t0
    sizes = np.asarray(ivf._st.sizes)
    print(f"IVF build: {build_s:.1f}s  nlist={ivf.nlist} (post-split) "
          f"list sizes mean={sizes[sizes > 0].mean():.0f} max={sizes.max()} "
          f"empty={(sizes == 0).sum()}  list_cap={ivf.list_cap}", flush=True)

    # full-probe recall isolates bf16 tie-flips from genuine probe misses;
    # post-split full probe reads <= max_list_factor x N rows/query, so
    # bound it to a few query chunks
    n_f = min(64, n_eval)
    _, i_f = ivf.search_batch(q[:n_f], k=20, nprobe=ivf.nlist, sync=False)
    i_f = np.asarray(i_f)
    rec_f = np.mean([len(set(i_f[j]) & set(i_ex[j])) / 20
                     for j in range(n_f)])
    print(f"IVF full-probe R@20 vs exact ({n_f}q): {rec_f:.4f} "
          "(gap = tie-order/bf16 artifacts, not probe misses)", flush=True)

    for nprobe in (8, 32, 96):
        s, i = ivf.search_batch(q, k=20, nprobe=nprobe, sync=False)
        i = np.asarray(i)
        rec = np.mean([len(set(i[j]) & set(i_ex[j])) / 20
                       for j in range(n_eval)])
        lats = {}
        for b in (1, 8, 32, 128):
            qb = q[:b]
            lats[b] = timed(lambda qb=qb, np_=nprobe: sync(
                ivf.search_batch(qb, k=20, nprobe=np_, sync=False)[1]))
        print(f"IVF nprobe={nprobe:3d}: R@20={rec:.4f}  " +
              "  ".join(f"b{b}={lats[b]:.1f}ms" for b in lats), flush=True)


if __name__ == "__main__":
    main()
