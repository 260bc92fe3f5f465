"""DeviceBM25 query-block sweep (q_block 128 vs 256 vs 512).

Hypothesis: per-block costs that do NOT scale with the query count —
the head matmul's 1.5GB matrix read (~12 ms) and the top-k selection
base cost — amortize with a larger block, while the tail scatter is
linear in padded lanes (so per-query scatter cost is constant). If so,
q_block=256/512 should cut per-query device time ~25-30% and lift the
hybrid leg (pinned at ~1.8k q/s by this path).

Pools scale proportionally with the block (slots hold (query, term)
pairs; the term population per block is ~linear in queries).

Interleaved A/B/C over rounds (chip-state variance can be 6-13x across
minutes — CLAUDE.md round-4 findings); per-stage decomposition (plan /
dispatch+sync / pull) printed per round.
"""
import copy
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 1_500_000
N_QUERIES = 1280
K = 100
BLOCKS = (128, 256, 512)
ROUNDS = 3


def _arm_deadline(seconds: int):
    def boom():
        print(f"DEADLINE: backend init exceeded {seconds}s", file=sys.stderr)
        os._exit(3)

    t = threading.Timer(seconds, boom)
    t.daemon = True
    t.start()
    return t


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    guard = _arm_deadline(600)
    dev_count = len(jax.devices())
    guard.cancel()
    print(f"devices: {dev_count}", file=sys.stderr)

    from viquae_tpu.ops import bm25 as bm25_lib
    from viquae_tpu.ops.bm25_device import DeviceBM25

    cache = os.path.join(os.path.dirname(__file__), "..", ".bench_cache",
                         f"bm25_{N_DOCS}_v400000")
    t0 = time.time()
    if os.path.exists(cache):
        index = bm25_lib.BM25Index.load(cache)
        print(f"loaded host index in {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        index = bm25_lib.synth_zipf_index(N_DOCS)
        print(f"synthesized host index in {time.time()-t0:.1f}s",
              file=sys.stderr)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        index.save(cache)

    t0 = time.time()
    base = DeviceBM25(index)  # q_block=128, pools 128/320
    print(f"DeviceBM25 build: {time.time()-t0:.1f}s  l_mid={base.l_mid}",
          file=sys.stderr)

    variants = {}
    for qb in BLOCKS:
        v = copy.copy(base)  # shares device arrays + host CSR metadata
        scale = qb // 128
        v.q_block = qb
        v.pool_mid = 128 * scale
        v.pool_small = 320 * scale
        variants[qb] = v

    rng = np.random.default_rng(3)
    queries = [" ".join(f"t{(z - 1) % 400_000}" for z in rng.zipf(1.2, 8))
               for _ in range(N_QUERIES)]

    # warmup/compile each block shape
    for qb, v in variants.items():
        t0 = time.time()
        v.search_batch(queries[:qb], k=K)
        print(f"warmup qb={qb} (compile): {time.time()-t0:.1f}s",
              file=sys.stderr)

    def timed_run(v):
        """e2e + stage decomposition for the full 1280-query batch."""
        import jax
        t0 = time.time()
        plan, overflow = v._plan(queries)
        t_plan = time.time() - t0
        head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
        qb = v.q_block
        import jax.numpy as jnp
        from viquae_tpu.ops.bm25_device import _bm25_block
        t0 = time.time()
        pending = []
        for blk, lo in enumerate(range(0, head_w.shape[0], qb)):
            hi = lo + qb
            s, i = _bm25_block(
                v.head_dense, v.tail_docs, v.tail_w,
                jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
                jnp.asarray(ms[blk]), jnp.asarray(ml[blk]),
                jnp.asarray(mr[blk]), jnp.asarray(mq[blk]),
                jnp.asarray(ss[blk]), jnp.asarray(sl[blk]),
                jnp.asarray(sr[blk]), jnp.asarray(sq[blk]),
                k=K, l_mid=v.l_mid, l_small=v.l_small,
                n_docs=v.index.n_docs)
            pending.append((s, i))
        # force completion with a tiny pull (block_until_ready unreliable
        # on axon)
        _ = np.asarray(pending[-1][0].ravel()[:1])
        for s, i in pending[:-1]:
            _ = np.asarray(s.ravel()[:1])
        t_disp = time.time() - t0
        t0 = time.time()
        outs = [(np.asarray(s), np.asarray(i)) for s, i in pending]
        t_pull = time.time() - t0
        return t_plan, t_disp, t_pull, len(overflow), outs

    results = {qb: [] for qb in BLOCKS}
    for rnd in range(ROUNDS):
        for qb in BLOCKS:
            tp, td, tl, n_over, _ = timed_run(variants[qb])
            tot = tp + td + tl
            results[qb].append(tot)
            print(f"round {rnd} qb={qb}: plan {tp*1e3:.0f} ms  "
                  f"dispatch+sync {td*1e3:.0f} ms  pull {tl*1e3:.0f} ms  "
                  f"total {tot*1e3:.0f} ms = {N_QUERIES/tot:.0f} q/s  "
                  f"overflow {n_over}", file=sys.stderr)

    print("\n== medians ==", file=sys.stderr)
    for qb in BLOCKS:
        med = float(np.median(results[qb]))
        print(f"qb={qb}: {med*1e3:.0f} ms = {N_QUERIES/med:.0f} q/s",
              file=sys.stderr)

    # correctness: the fastest variant must agree with qb=128 e2e results
    s128, i128 = variants[128].search_batch(queries[:256], k=K)
    best = max(BLOCKS, key=lambda qb: N_QUERIES / np.median(results[qb]))
    sb, ib = variants[best].search_batch(queries[:256], k=K)
    agree = np.mean([len(set(a) & set(b)) / max(len(b), 1)
                     for a, b in zip(ib, i128)])
    print(f"top-{K} agreement qb={best} vs qb=128: {agree:.4f}",
          file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
