"""Does the Pallas fused engine unlock serving batch 2560?

Round-2 found topk_global at Q=2560 OOMs (bf16 scores 2560 x 1.5M =
7.7GB), capping the serving batch at 1280. The fused scores+segmax
kernel (ops/mips_pallas.topk_fused) never materializes scores — only
(n_steps, Q, w) segment maxima — so Q=2560 should fit. Measure exact
search at Q=1280 vs 2560 (per-query time), plus the packed embed at
both batch sizes, interleaved after warmup (first-touch timings are
unstable over the tunnel, CLAUDE.md).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viquae_tpu.ops import mips_pallas

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    NV, D, K = 1_500_000, 768, 100
    SEG = 512  # columns must pad to the kernel tile
    N = NV + ((-NV) % SEG)
    rng = np.random.default_rng(0)
    print("building KB...", file=sys.stderr)
    kbt_host = (rng.standard_normal((D, N)) / np.sqrt(D)).astype(np.float32)
    kbt = jax.device_put(jnp.asarray(kbt_host, jnp.bfloat16))
    del kbt_host

    qs = {
        q: jax.device_put(jnp.asarray(
            rng.standard_normal((q, D)), jnp.bfloat16))
        for q in (1280, 2560)
    }

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def fused(q, kbt, k):
        return mips_pallas.topk_fused(q, kbt, k, valid_rows=jnp.int32(NV))

    # warmup/compile both shapes
    for q in (1280, 2560):
        t0 = time.time()
        sync(fused(qs[q], kbt, K))
        print(f"compile+first Q={q}: {time.time()-t0:.1f}s", file=sys.stderr)

    # interleaved A/B
    times = {1280: [], 2560: []}
    for rep in range(6):
        for q in (1280, 2560):
            t0 = time.time()
            out = fused(qs[q], kbt, K)
            sync(out)
            times[q].append(time.time() - t0)
    for q in (1280, 2560):
        ms = np.median(times[q]) * 1e3
        print(f"Q={q}: {ms:.1f} ms/batch = {q / np.median(times[q]):,.0f} "
              f"q/s (search only)", file=sys.stderr)

    # parity: 2560 rows 0:1280 must equal the 1280 run exactly
    s_a, i_a = fused(qs[1280], kbt, K)
    q2 = jnp.concatenate([qs[1280], qs[2560][1280:]], axis=0)
    s_b, i_b = fused(q2, kbt, K)
    same_ids = np.array_equal(np.asarray(i_a), np.asarray(i_b)[:1280])
    print(f"prefix-parity ids identical: {same_ids}", file=sys.stderr)


if __name__ == "__main__":
    main()
