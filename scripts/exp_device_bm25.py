"""Measure the primitives for ON-DEVICE BM25 at reference scale
(VERDICT r3 item 3: hybrid retrieval is pinned at ~387 q/s by one host
core; the device is the only unbound resource on this VM).

Design under test (TPU-native sparse scoring):
- per-posting BM25 weights w_p = idf[t] * tf_p / (tf_p + norm[doc_p]) are
  PRECOMPUTABLE at index build (k1/b fixed) -> scoring is a sparse
  (Q, V) x (V, D) product;
- HEAD terms (top-H by document frequency — with Zipf df these hold most
  postings AND most query-term mass) densify into a (H, D) bf16 matrix:
  a query's head contribution is ONE MXU matmul (Q_blk, H) x (H, D);
- TAIL terms keep CSR postings resident in HBM (docs int32 + w bf16);
  per query-slot: gather a contiguous L_cap range (offset + iota, masked
  to the trash column D), scatter-add into a (Q_blk, D+1) f32 accumulator
  (per-term doc ids ascending -> indices_are_sorted);
- selection: the existing two-level fast top-k over the accumulator.

Shapes: D=1.5M docs, nnz ~ 91.6M postings, V=400k, Zipf(1.2) df; block
Q_blk=128 queries x S=8 term slots, L_cap=16384 (df at head boundary
H=512). Prints per-primitive ms + projected q/s.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D_DOCS = 1_500_000
V = 400_000
H = 512
L_CAP = 16_384
Q_BLK = 128
S_SLOTS = 8
K = 100


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from viquae_tpu.ops import mips

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

    # ---- synthetic postings with the Zipf df profile ---------------------
    # df_r ~ D * (1 - exp(-mean_len * p_r)), p_r Zipf(1.2)
    ranks = np.arange(1, V + 1, dtype=np.float64)
    p = ranks ** -1.2
    p /= p.sum()
    df = np.maximum(1, (D_DOCS * (1 - np.exp(-100 * p)))).astype(np.int64)
    nnz = int(df.sum())
    print(f"synthetic df: nnz={nnz/1e6:.1f}M, df[0]={df[0]}, "
          f"df[{H}]={df[H]}, df[8192]={df[8192]}", file=sys.stderr)
    offsets = np.zeros(V + 1, np.int64)
    np.cumsum(df, out=offsets[1:])
    # doc ids: ascending random per term (realistic for the scatter);
    # weights: positive smalls
    docs_host = np.empty(nnz, np.int32)
    step = rng.integers(1, 2 * D_DOCS, size=nnz)  # cheap ascending-ish fill
    # per-term sorted uniform ids without a 92M sort: cumsum trick per term
    # (approximate realism is fine for THROUGHPUT measurement)
    u = rng.random(nnz).astype(np.float32)
    seg_id = np.repeat(np.arange(V), df)
    # sorted-within-term uniform: use the order statistics shortcut
    # ids = floor(D * sorted(u)) per segment — emulate with per-term cumsum
    gaps = -np.log(u)  # exp(1) gaps -> normalized cumsum is sorted uniform
    cs = np.cumsum(gaps)
    seg_starts = offsets[:-1]
    seg_base = np.repeat(cs[np.maximum(seg_starts - 1, 0)] *
                         (seg_starts > 0), df)
    seg_cum = cs - seg_base
    seg_tot = np.repeat(seg_cum[offsets[1:] - 1] + gaps[offsets[1:] - 1] * 0
                        + 1e-9, df)
    docs_host[:] = np.minimum(
        (seg_cum / seg_tot * D_DOCS).astype(np.int64), D_DOCS - 1)
    w_host = (rng.random(nnz).astype(np.float32) * 4.0 + 0.1)

    import jax
    t0 = time.time()
    docs_dev = jax.device_put(docs_host)
    w_dev = jax.device_put(w_host.astype(jnp.bfloat16))
    off_dev = jax.device_put(offsets.astype(np.int64))
    sync(docs_dev), sync(w_dev)
    up_s = time.time() - t0
    mb = (docs_host.nbytes + w_host.nbytes // 2) / 1e6
    print(f"postings upload: {mb:.0f} MB in {up_s:.1f}s "
          f"({mb/up_s:.0f} MB/s)", file=sys.stderr)

    # dense head (H, D) bf16 built ON DEVICE by scatter from head postings
    n_head_post = int(offsets[H])
    print(f"head postings: {n_head_post/1e6:.1f}M "
          f"({100*n_head_post/nnz:.0f}% of nnz)", file=sys.stderr)

    @jax.jit
    def build_head(docs, w, off):
        rows = jnp.searchsorted(
            off[1:H + 1], jnp.arange(n_head_post, dtype=jnp.int64),
            side="right").astype(jnp.int32)
        dense = jnp.zeros((H, D_DOCS), jnp.float32)
        dense = dense.at[rows, docs[:n_head_post]].add(
            w[:n_head_post].astype(jnp.float32))
        return dense.astype(jnp.bfloat16)

    (head_dense, build_ms) = timeit("build head dense (one-time)",
                                    build_head, docs_dev, w_dev, off_dev,
                                    reps=1)

    # ---- query batch: head one-hot weights + tail slots -----------------
    # realistic term draw: zipf(1.2) ranks
    q_terms = (rng.zipf(1.2, (Q_BLK, S_SLOTS)).astype(np.int64) - 1) % V
    head_w = np.zeros((Q_BLK, H), np.float32)
    tail_tid = np.full((Q_BLK, S_SLOTS), -1, np.int64)
    n_tail = 0
    for i in range(Q_BLK):
        s = 0
        for t in q_terms[i]:
            if t < H:
                head_w[i, t] += 1.0
            else:
                tail_tid[i, s] = t
                s += 1
                n_tail += 1
    print(f"tail terms per query: {n_tail/Q_BLK:.2f}", file=sys.stderr)
    head_w_dev = jnp.asarray(head_w.astype(jnp.bfloat16))
    tail_tid_dev = jnp.asarray(tail_tid)

    # ---- primitives -------------------------------------------------------
    @jax.jit
    def head_matmul(head_w, head_dense):
        return jax.lax.dot_general(
            head_w, head_dense, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _, mm_ms = timeit("head matmul (128,512)x(512,1.5M)->f32",
                      head_matmul, head_w_dev, head_dense)

    @jax.jit
    def tail_gather(tids, docs, w, off):
        starts = off[jnp.maximum(tids, 0)]
        lens = off[jnp.maximum(tids, 0) + 1] - starts
        lens = jnp.where(tids < 0, 0, lens)
        idx = starts[:, :, None] + jnp.arange(L_CAP, dtype=jnp.int64)
        mask = (jnp.arange(L_CAP) < lens[:, :, None])
        idx = jnp.minimum(idx, len(docs_host) - 1)
        g_docs = jnp.where(mask, docs[idx], D_DOCS)  # trash col
        g_w = jnp.where(mask, w[idx].astype(jnp.float32), 0.0)
        return g_docs, g_w

    (gd, gw), gather_ms = timeit(
        f"tail gather ({Q_BLK},{S_SLOTS},{L_CAP})",
        tail_gather, tail_tid_dev, docs_dev, w_dev, off_dev)

    @jax.jit
    def tail_scatter(scores, g_docs, g_w):
        acc = jnp.concatenate(
            [scores, jnp.zeros((Q_BLK, 1), jnp.float32)], axis=1)
        for s in range(S_SLOTS):
            acc = acc.at[
                jnp.arange(Q_BLK)[:, None], g_docs[:, s, :]
            ].add(g_w[:, s, :], indices_are_sorted=True)
        return acc[:, :D_DOCS]

    scores0 = head_matmul(head_w_dev, head_dense)
    _, scatter_ms = timeit("tail scatter-add (8 slots)", tail_scatter,
                           scores0, gd, gw)

    @jax.jit
    def select(scores):
        s, i = mips._select_topk(scores, K, "fast")
        return s, i

    _, sel_ms = timeit("select top-100 (128,1.5M f32)", select, scores0)

    # ---- fused block program ---------------------------------------------
    @jax.jit
    def bm25_block(head_w, tids, head_dense, docs, w, off):
        scores = head_matmul(head_w, head_dense)
        g_docs, g_w = tail_gather(tids, docs, w, off)
        scores = tail_scatter(scores, g_docs, g_w)
        return select(scores)

    _, block_ms = timeit("FUSED block (head+tail+select)", bm25_block,
                         head_w_dev, tail_tid_dev, head_dense, docs_dev,
                         w_dev, off_dev)
    qps = Q_BLK / (block_ms / 1e3)
    print(f"projected device bm25: {qps:.0f} q/s "
          f"(vs 387 host MaxScore)", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
