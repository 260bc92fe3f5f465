"""Host-only slot/lane math for DeviceBM25 tier configs (no chip).

The tail scatter is LINEAR in static padded lanes (~14 ms base +
~1.1e-5 ms/lane — round-4 take 3), and static lanes = pool_mid*l_mid +
pool_small*l_small. Smaller caps cut per-slot padding (a term's final
chunk fills l_mid only partially) at the cost of more slots; this script
simulates `_plan`'s slot demand over bench-protocol Zipf-8 queries for a
grid of (l_small, l_mid) and predicts the scatter time per 512-query
block, so the chip A/B (exp_bm25_tiers.py) only runs the 2-3 best
candidates.

Run after the bench index cache exists (bench.py or exp_bm25_split.py
build it): python scripts/exp_bm25_lane_math.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from viquae_tpu.ops import bm25 as bm25_lib  # noqa: E402

LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def main():
    n_docs = int(os.environ.get("N_DOCS", "1500000"))
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache", f"bm25_{n_docs}_v400000")
    index = bm25_lib.BM25Index.load(cache)
    df = np.diff(index.offsets)
    n_head = 512
    order = np.argsort(-df, kind="stable")
    is_head = np.zeros(len(df), bool)
    is_head[order[:n_head]] = True
    tail_df = np.where(is_head, 0, df)
    print(f"tail postings: {tail_df.sum()/1e6:.1f}M, "
          f"max tail df {tail_df.max()}", flush=True)

    rng = np.random.default_rng(3)
    queries = [
        [(int(z) - 1) % 400_000 for z in rng.zipf(1.2, 8)]
        for _ in range(1280)
    ]
    qb = 512
    n_blocks = -(-len(queries) // qb)

    configs = [
        (512, 2048),   # current default
        (512, 1536),
        (512, 1024),
        (384, 1024),
        (256, 1024),
        (256, 768),
        (256, 512),
        (128, 512),
        (128, 384),
        (128, 256),
    ]
    print(f"{'l_s':>5} {'l_m':>5} {'midP':>6} {'smlP':>6} "
          f"{'lanes(M)':>9} {'actual(M)':>9} {'pred ms':>8}")
    for l_small, l_mid in configs:
        l_mid_r = _round_up(l_mid, LANE)
        mid_used = np.zeros(n_blocks, np.int64)
        small_used = np.zeros(n_blocks, np.int64)
        actual = 0
        for i, q in enumerate(queries):
            blk = i // qb
            counts = {}
            for tid in q:
                counts[tid] = counts.get(tid, 0) + 1
            for tid in counts:
                if is_head[tid]:
                    continue
                d = int(tail_df[tid])
                if d == 0:
                    continue
                actual += d
                while d > l_small:
                    take = min(d, l_mid_r)
                    mid_used[blk] += 1
                    d -= take
                if d > 0:
                    small_used[blk] += 1
        # pool sized at max-demand + the default-style headroom margin
        p_m = _round_up(int(mid_used.max() * 1.25) + 64, 64)
        p_s = _round_up(int(small_used.max() * 1.25) + 64, 64)
        lanes = p_m * l_mid_r + p_s * l_small
        pred = 14.0 + 1.1e-5 * lanes
        print(f"{l_small:>5} {l_mid_r:>5} {p_m:>6} {p_s:>6} "
              f"{lanes/1e6:>9.2f} {actual/n_blocks/1e6:>9.2f} "
              f"{pred:>8.1f}", flush=True)


if __name__ == "__main__":
    main()
