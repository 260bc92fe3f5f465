"""TPU-resident BM25 scoring (the device leg of hybrid retrieval).

The reference serves sparse retrieval from Elasticsearch on a beefy host
(meerqat/ir/search.py:268-293); this repo's host replacement
(`ops.bm25.BM25Index` + the C++ MaxScore scorer) is exact but pinned to
~387 q/s at 1.5M passages by the single host core. On a TPU VM the chip
is the unbound resource, so this module moves the scoring there.

Design (measured in scripts/exp_device_bm25{,_v2}.py — take 2 hit 77 ms
per 128-query block at 1.5M docs / 86M postings, a 4.3x over the host):

- **Per-posting weights at build time**: with k1/b fixed, BM25 decomposes
  as s(q, d) = sum_t qtf(t) * w(t, d) with
  w(t, d) = idf(t) * tf / (tf + k1*(1-b+b*dl/avgdl)) — a static sparse
  matrix. Query scoring is then a sparse-matrix / dense-vector product,
  which maps onto the TPU in two tiers:
- **Head terms** (top `n_head` by document frequency, ~65% of postings):
  densified into an (n_head, D_pad) bf16 matrix ONCE; a query block scores
  them with a single MXU matmul (12 ms for 128 x 512 x 1.5M).
- **Tail terms**: kept as CSR (docs int32 + weights bf16, term-major).
  Each tail term of each query becomes one or more (start, len) ranges
  placed in a PER-BLOCK slot pool (two tiers: `l_small`- and `l_mid`-cap
  slots; a term wider than `l_mid` SPLITS across consecutive slots — the
  round-5 change that cut static scatter lanes 15.1M -> 4.3M per
  512-query block at 1.5M docs), gathered with vmapped
  `dynamic_slice` (contiguous — an element-wise gather of the same
  postings costs 867 ms) and scatter-added with explicit (row, doc)
  index pairs into the f32 score block. Scatter cost is linear in
  padded lanes (take 3: ~14 ms + ~1.1e-5 ms/element, no same-address
  pathology), so the pool — sized to the block's ACTUAL term population
  — beats per-query worst-case slots 27.8 ms vs 66.8 ms (take 4,
  bitwise-equal outputs).
- **Selection**: `ops.mips._select_topk` fast mode over the (Q, D_pad)
  scores (12 ms), same selection used by the dense leg.

Queries with more tail terms than slots (~2/128 at 8-term Zipf queries)
fall back to the host MaxScore scorer — exact, and invisible behind the
`search_batch` contract.

Score contract: weights are bf16-quantized (~3 decimal digits), summed in
f32; ranks can differ from the exact host scorer on near-ties, like the
dense leg's bf16 scores (PARITY.md "bf16 tie artifacts"). The host index
remains the exact oracle; `BM25Index.search_batch` is unchanged.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.ops import bm25 as bm25_lib
from viquae_tpu.ops import mips

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("k", "l_mid", "l_small", "n_docs"))
def _bm25_block(head_dense, tail_docs, tail_w, head_w,
                mid_start, mid_len, mid_row, mid_qtf,
                small_start, small_len, small_row, small_qtf,
                *, k: int, l_mid: int, l_small: int, n_docs: int):
    """Score one padded query block: head matmul + BLOCK-POOL tail
    gather/scatter + top-k selection. All shapes static.

    Tail slots are a per-block POOL of (query_row, term) pairs, not
    per-query slots: scatter cost is linear in padded lanes (take 3), and
    per-query slots padded every query to the worst case (~4.9M lanes) —
    the pool carries only ~1.2M (take 4: 27.8 ms vs 66.8 ms, bitwise
    equal)."""
    trash = n_docs  # first padding column of D_pad — scatter target for
    # masked lanes; its head score is 0 (zero dense column) and masked
    # tail values are 0, so it never outranks a real positive score

    scores = jax.lax.dot_general(
        head_w, head_dense, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    def pool(starts, lens, qtf, cap):
        def one(start):
            return (jax.lax.dynamic_slice(tail_docs, (start,), (cap,)),
                    jax.lax.dynamic_slice(tail_w, (start,), (cap,)))

        g_docs, g_w = jax.vmap(one)(starts)       # (P, cap)
        pos = jnp.arange(cap, dtype=jnp.int32)
        mask = pos < lens[:, None]
        g_docs = jnp.where(mask, g_docs, trash)
        g_w = jnp.where(mask, g_w.astype(jnp.float32) * qtf[:, None], 0.0)
        return g_docs, g_w

    ids_m, vals_m = pool(mid_start, mid_len, mid_qtf, l_mid)
    ids_s, vals_s = pool(small_start, small_len, small_qtf, l_small)
    # materialize the gathered operands BEFORE the scatter: XLA otherwise
    # fuses the slice-gather + mask into the scatter's operand computation
    # and the scatter slows ~4x (round-5 exp_bm25_scatter_layout: the same
    # lanes scatter+select in 85 ms from literal arrays vs ~162 ms fused;
    # the barrier costs one ~45MB HBM round-trip, bitwise-identical out)
    ids_m, vals_m, ids_s, vals_s = jax.lax.optimization_barrier(
        (ids_m, vals_m, ids_s, vals_s))
    # 2D scatter: (row, doc) per lane; two calls cost the same as one
    # fused (take 4: 29.1 vs 27.8 ms)
    scores = scores.at[mid_row[:, None], ids_m].add(vals_m)
    scores = scores.at[small_row[:, None], ids_s].add(vals_s)
    return mips._select_topk(scores, k, "fast")


class DeviceBM25:
    """Device scorer over a host :class:`~viquae_tpu.ops.bm25.BM25Index`.

    Same ``search_batch(queries, k) -> (scores, indices)`` contract as the
    host index, so it drops behind the ``IndexKind.BM25`` seam
    (``index_kwargs={"device": True}``). Holds a reference to the host
    index for overflow fallback; call :meth:`rebuild` after
    ``set_hyperparameters`` (weights bake in k1/b).
    """

    def __init__(self, index: bm25_lib.BM25Index, n_head: int = 512,
                 l_small: int = 512, l_mid: int = 2048,
                 pool_mid: Optional[int] = None,
                 pool_small: Optional[int] = None, q_block: int = 128):
        """pool_mid/pool_small: PER-BLOCK slot pools shared by the
        q_block queries (a slot holds one (query, term) posting range;
        one query may use several). Defaults SCALE WITH q_block from the
        measured Zipf-8 slot density with headroom (take 5 found a
        48-slot pool overflowed 21% of queries to the host fallback,
        which silently dominated e2e time); a block whose pool fills
        sends the unplaceable QUERIES to the host fallback.

        l_mid CAPS the mid-slot width: a term whose posting list exceeds
        it is SPLIT across consecutive slots (same row/qtf, consecutive
        starts — scatter-adds are additive, so scores are unchanged up
        to f32 summation order). Splitting decouples slot width from the
        corpus' max tail df: at 1.5M docs the widest tail term is ~15k
        postings, and unsplit slots padded EVERY mid term to it — 15.1M
        static scatter lanes per 512-query block vs 4.3M split (the
        scatter cost is linear in padded lanes: ~14 ms + ~1.1e-5
        ms/lane, round-4 take 3).

        q_block: queries scored per device program. Per-block costs (the
        head matrix read, selection, and the tunnel's per-transfer
        overhead) amortize with larger blocks: 512 measured 1.6x the
        e2e throughput of 128 at batch 1280 (scripts/exp_bm25_qblock.py,
        interleaved, identical top-100). The scatter's padded lanes and
        the (q_block, n_docs) f32 score block (3GB at 512 x 1.5M) scale
        WITH the block, so small serving batches and HBM-squeezed
        windows want 128 (see docs/SERVING.md crossover table)."""
        self.index = index
        self.n_head = n_head
        self.l_small_cfg = l_small
        self.l_mid_cfg = l_mid
        # measured split-slot usage per 128 Zipf-8 queries at 1.5M docs:
        # ~318 mid / ~169 small (mean), ~372 / ~188 (max) — defaults
        # carry ~1.8x headroom at q_block=128 and ~1.4x at 512 (larger
        # blocks smooth per-block variance)
        self.pool_mid = (pool_mid if pool_mid is not None
                         else _round_up(3 * q_block + 320, 64))
        self.pool_small = (pool_small if pool_small is not None
                           else _round_up(3 * q_block // 2 + 160, 64))
        self.q_block = q_block
        self.last_overflow = 0  # queries host-fallbacked by the last call
        self.rebuild()

    @property
    def n_docs(self) -> int:
        """Corpus size (duck-type parity with BM25Index so this scorer
        drops into ir/serving.HybridRetrievalPipeline unchanged)."""
        return self.index.n_docs

    # ---- build ---------------------------------------------------------
    def rebuild(self):
        """(Re)build device arrays from the host index (uses its CURRENT
        k1/b). One-time cost: per-posting weights on host (one vectorized
        pass) + a ~6 B/posting upload + a device scatter for the head."""
        index = self.index
        df = np.diff(index.offsets)
        order = np.argsort(-df, kind="stable")  # df desc, ties by term id
        n_head = min(self.n_head, int((df > 0).sum()))
        head_terms = order[:n_head]
        self.head_pos = np.full(len(df), -1, np.int32)
        self.head_pos[head_terms] = np.arange(n_head, dtype=np.int32)
        self.is_head = self.head_pos >= 0

        n_docs = index.n_docs
        self.d_pad = _round_up(n_docs + 1, LANE)
        tail_df = np.where(self.is_head, 0, df)
        # mid slots are capped at l_mid_cfg; wider terms split across
        # consecutive slots (see __init__) — slot width no longer scales
        # with the corpus' widest tail term
        self.l_mid = max(LANE, min(
            _round_up(int(tail_df.max(initial=0)), LANE),
            _round_up(self.l_mid_cfg, LANE)))
        self.l_small = min(self.l_small_cfg, self.l_mid)

        # per-posting weights w(t, d) = idf * tf / (tf + norm_d)
        tids = np.repeat(np.arange(len(df), dtype=np.int64), df)
        w_all = (index.idf[tids] * index.tfs
                 / (index.tfs + index.norm[index.docs])).astype(np.float32)

        head_mask = self.is_head[tids]
        head_rows = self.head_pos[tids[head_mask]].astype(np.int32)
        head_docs = index.docs[head_mask].astype(np.int32)
        head_w = w_all[head_mask].astype(jnp.bfloat16)

        @jax.jit
        def build_head(rows, docs, w):
            dense = jnp.zeros((n_head, self.d_pad), jnp.bfloat16)
            # each (term, doc) pair is unique in CSR postings, so the adds
            # are pure writes — no bf16 accumulation error
            return dense.at[rows, docs].add(w)

        self.head_dense = build_head(
            jax.device_put(head_rows), jax.device_put(head_docs),
            jax.device_put(np.asarray(head_w)))

        tail_mask = ~head_mask
        # trailing pad so dynamic_slice(start, cap) stays in bounds for
        # every tail range start
        pad = self.l_mid
        tail_docs = np.concatenate([
            index.docs[tail_mask].astype(np.int32),
            np.full(pad, n_docs, np.int32)])
        tail_w = np.concatenate([
            w_all[tail_mask], np.zeros(pad, np.float32)])
        self.tail_docs = jax.device_put(tail_docs)
        self.tail_w = jax.device_put(
            np.asarray(tail_w.astype(jnp.bfloat16)))
        # host CSR over TAIL postings only, indexed by original term id
        tail_counts = np.where(self.is_head, 0, df)
        self.tail_offsets = np.zeros(len(df) + 1, np.int64)
        np.cumsum(tail_counts, out=self.tail_offsets[1:])
        self.tail_df = tail_counts
        # slot starts ride as int32 device scalars
        assert self.tail_offsets[-1] < 2**31, (
            "tail postings exceed int32 range — shard the corpus "
            "(ShardedDeviceBM25) before the device path")
        jax.block_until_ready(self.head_dense)

    # ---- search ---------------------------------------------------------
    def _plan(self, queries: Sequence[str]):
        """Host query planning: head weights + tiered tail ranges.
        Returns per-block device args + the overflow-query positions."""
        nq = len(queries)
        qb = self.q_block
        n_pad = _round_up(max(nq, 1), qb)
        n_blocks = n_pad // qb
        p_m, p_s = self.pool_mid, self.pool_small
        head_w = np.zeros((n_pad, self.head_dense.shape[0]), np.float32)
        mid_start = np.zeros((n_blocks, p_m), np.int32)
        mid_len = np.zeros((n_blocks, p_m), np.int32)
        mid_row = np.zeros((n_blocks, p_m), np.int32)
        mid_qtf = np.zeros((n_blocks, p_m), np.float32)
        small_start = np.zeros((n_blocks, p_s), np.int32)
        small_len = np.zeros((n_blocks, p_s), np.int32)
        small_row = np.zeros((n_blocks, p_s), np.int32)
        small_qtf = np.zeros((n_blocks, p_s), np.float32)
        mid_used = np.zeros(n_blocks, np.int64)
        small_used = np.zeros(n_blocks, np.int64)
        overflow: List[int] = []
        for i, query in enumerate(queries):
            blk, row = divmod(i, qb)
            counts: dict = {}
            for tok in bm25_lib.analyze(query):
                tid = self.index.vocab.get(tok)
                if tid is not None:
                    counts[tid] = counts.get(tid, 0) + 1
            head_terms, mids, smalls = [], [], []
            for tid, qtf in counts.items():
                pos = self.head_pos[tid]
                if pos >= 0:
                    head_terms.append((pos, qtf))
                    continue
                d = int(self.tail_df[tid])
                if d == 0:
                    continue
                # split wide terms into l_mid-cap chunks (consecutive
                # starts; adds are additive so splitting is score-exact
                # up to f32 summation order); a remainder <= l_small
                # takes a small slot
                off = int(self.tail_offsets[tid])
                while d > self.l_small:
                    take = min(d, self.l_mid)
                    mids.append((off, take, qtf))
                    off += take
                    d -= take
                if d > 0:
                    smalls.append((off, d, qtf))
            # small terms also fit mid slots — spill before giving up
            free_s = p_s - small_used[blk]
            free_m = p_m - mid_used[blk]
            while len(smalls) > free_s and len(mids) < free_m:
                mids.append(smalls.pop())
            if len(mids) > free_m or len(smalls) > free_s:
                overflow.append(i)  # pool exhausted -> host fallback
                continue
            for pos, qtf in head_terms:
                head_w[i, pos] = qtf
            for off, length, qtf in mids:
                s = mid_used[blk]
                mid_start[blk, s] = off
                mid_len[blk, s] = length
                mid_row[blk, s] = row
                mid_qtf[blk, s] = qtf
                mid_used[blk] += 1
            for off, length, qtf in smalls:
                s = small_used[blk]
                small_start[blk, s] = off
                small_len[blk, s] = length
                small_row[blk, s] = row
                small_qtf[blk, s] = qtf
                small_used[blk] += 1
        return (head_w, mid_start, mid_len, mid_row, mid_qtf,
                small_start, small_len, small_row, small_qtf), overflow

    def search_batch(self, queries: Sequence[str], k: int = 100
                     ) -> Tuple[List[List[float]], List[List[int]]]:
        nq = len(queries)
        if nq == 0:
            return [], []
        k_eff = min(k, self.index.n_docs)
        if k_eff == 0:  # empty corpus: nothing retrievable
            return [[] for _ in queries], [[] for _ in queries]
        plan, overflow = self._plan(queries)
        self.last_overflow = len(overflow)
        head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
        qb = self.q_block
        scores_out = np.zeros((head_w.shape[0], k_eff), np.float32)
        ids_out = np.zeros((head_w.shape[0], k_eff), np.int64)
        # dispatch every block before pulling any result: JAX dispatch is
        # async, so the device pipelines blocks back-to-back while a
        # per-block pull would serialize each block with a (slow-link)
        # host round-trip (+49 ms/block measured over the tunnel —
        # scripts/exp_bm25_prod_probe.py)
        pending = []
        for blk, lo in enumerate(range(0, head_w.shape[0], qb)):
            hi = lo + qb
            s, i = _bm25_block(
                self.head_dense, self.tail_docs, self.tail_w,
                jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
                jnp.asarray(ms[blk]), jnp.asarray(ml[blk]),
                jnp.asarray(mr[blk]), jnp.asarray(mq[blk]),
                jnp.asarray(ss[blk]), jnp.asarray(sl[blk]),
                jnp.asarray(sr[blk]), jnp.asarray(sq[blk]),
                k=k_eff, l_mid=self.l_mid, l_small=self.l_small,
                n_docs=self.index.n_docs)
            pending.append((lo, hi, s, i))
        for lo, hi, s, i in pending:
            scores_out[lo:hi] = np.asarray(s)
            ids_out[lo:hi] = np.asarray(i)
        scores_batch: List[List[float]] = []
        indices_batch: List[List[int]] = []
        for q in range(nq):
            # zero-score docs (incl. padding columns) are "not retrieved"
            keep = (scores_out[q] > 0) & (ids_out[q] < self.index.n_docs)
            scores_batch.append(scores_out[q][keep].tolist())
            indices_batch.append(ids_out[q][keep].tolist())
        if overflow:
            fb_s, fb_i = self.index.search_batch(
                [queries[i] for i in overflow], k=k)
            for pos, i in enumerate(overflow):
                scores_batch[i] = fb_s[pos]
                indices_batch[i] = fb_i[pos]
        return scores_batch, indices_batch

    def search_batch_device(self, queries: Sequence[str], k: int = 100):
        """Like :meth:`search_batch` but the results STAY on device in the
        framework pad convention (score -inf, id int32-max for
        not-retrieved) — (n_pad, k) f32 scores + int32 ids, ready for
        `ops.fusion.fuse_topk`. Saves the pull-pad-reupload round-trip the
        hybrid path otherwise pays per batch (~2 x Q x k x 8B over the
        link). Overflow queries' host-fallback rows are scattered back in
        with one small device update."""
        nq = len(queries)
        k_eff = min(k, self.index.n_docs)
        if nq == 0 or k_eff == 0:
            pad_rows = max(_round_up(max(nq, 1), self.q_block), 1)
            return (jnp.full((pad_rows, max(k_eff, 1)), -jnp.inf),
                    jnp.full((pad_rows, max(k_eff, 1)),
                             jnp.iinfo(jnp.int32).max, jnp.int32))
        plan, overflow = self._plan(queries)
        self.last_overflow = len(overflow)
        head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
        qb = self.q_block
        outs = []
        for blk, lo in enumerate(range(0, head_w.shape[0], qb)):
            hi = lo + qb
            outs.append(_bm25_block(
                self.head_dense, self.tail_docs, self.tail_w,
                jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
                jnp.asarray(ms[blk]), jnp.asarray(ml[blk]),
                jnp.asarray(mr[blk]), jnp.asarray(mq[blk]),
                jnp.asarray(ss[blk]), jnp.asarray(sl[blk]),
                jnp.asarray(sr[blk]), jnp.asarray(sq[blk]),
                k=k_eff, l_mid=self.l_mid, l_small=self.l_small,
                n_docs=self.index.n_docs))
        fb = None
        if overflow:
            fb_s, fb_i = self.index.search_batch(
                [queries[i] for i in overflow], k=k_eff)
            fb_scores = np.full((len(overflow), k_eff), -np.inf,
                                np.float32)
            fb_ids = np.full((len(overflow), k_eff),
                             np.iinfo(np.int32).max, np.int32)
            for pos in range(len(overflow)):
                fb_scores[pos, : len(fb_s[pos])] = fb_s[pos]
                fb_ids[pos, : len(fb_i[pos])] = fb_i[pos]
            fb = (jnp.asarray(np.asarray(overflow, np.int32)),
                  jnp.asarray(fb_scores), jnp.asarray(fb_ids))
        return _finalize_device(
            tuple(s for s, _ in outs), tuple(i for _, i in outs), fb,
            n_docs=self.index.n_docs)


@partial(jax.jit, static_argnames=("n_docs",))
def _finalize_device(score_blocks, id_blocks, fb, *, n_docs: int):
    """Concatenate per-block results and apply the pad convention on
    device: zero-score docs and padding columns become (-inf, int32-max);
    overflow rows are replaced by their host-fallback results."""
    scores = jnp.concatenate(score_blocks, axis=0)
    ids = jnp.concatenate(id_blocks, axis=0).astype(jnp.int32)
    valid = (scores > 0) & (ids < n_docs)
    scores = jnp.where(valid, scores, -jnp.inf)
    ids = jnp.where(valid, ids, jnp.iinfo(jnp.int32).max)
    if fb is not None:
        rows, fb_scores, fb_ids = fb
        scores = scores.at[rows].set(fb_scores)
        ids = ids.at[rows].set(fb_ids)
    return scores, ids


# --------------------------------------------------------------------------
# KB-sharded device BM25 (multi-chip)
# --------------------------------------------------------------------------
class ShardedDeviceBM25:
    """Device BM25 with the corpus partitioned over the `kb` mesh axis.

    Mirrors :func:`viquae_tpu.ops.mips.topk_sharded`: docs split into
    contiguous per-shard ranges; each shard holds its column slice of the
    head matrix and its slice of every tail posting list (postings are
    doc-ascending within a term, so the per-(term, shard) split is a
    contiguous sub-range); every shard scores the replicated query block
    locally (head matmul + pool gather/scatter + local top-k) and the
    per-shard candidates merge with one `all_gather` + sort over ICI —
    candidate-sized traffic (n_dev * Q * k), never score-sized.

    A (query, term) pool slot occupies the SAME slot index on every shard
    with a per-shard (start, len) range (len 0 where the shard holds no
    postings of that term); per-shard slot caps shrink ~linearly with the
    shard count, so the scatter — the single-chip cost floor — scales
    down with the mesh.

    Same bf16-weight score contract and host-fallback semantics as
    :class:`DeviceBM25`. Construction is host-side numpy (one stable
    permutation of the postings into (shard, term, doc) order) +
    per-shard `device_put`; fine for the dryrun/CPU mesh and index-build
    time at corpus scale.
    """

    def __init__(self, index: bm25_lib.BM25Index, mesh_ctx=None,
                 n_head: int = 512, l_small: int = 512,
                 l_mid: int = 2048, pool_mid: Optional[int] = None,
                 pool_small: Optional[int] = None,
                 q_block: int = 128):
        from viquae_tpu.core import mesh as meshlib

        self.index = index
        self.ctx = mesh_ctx or meshlib.current()
        self.n_head = n_head
        self.l_small_cfg = l_small
        self.l_mid_cfg = l_mid
        # pools scale with q_block like DeviceBM25 (same split-slot
        # density; a chunk occupies the same slot index on every shard)
        self.pool_mid = (pool_mid if pool_mid is not None
                         else _round_up(3 * q_block + 320, 64))
        self.pool_small = (pool_small if pool_small is not None
                           else _round_up(3 * q_block // 2 + 160, 64))
        self.q_block = q_block
        self.last_overflow = 0
        self.rebuild()

    @property
    def n_docs(self) -> int:
        """Duck-type parity with BM25Index / DeviceBM25."""
        return self.index.n_docs

    def rebuild(self):
        from jax.sharding import PartitionSpec as P

        from viquae_tpu.core import mesh as meshlib

        index = self.index
        n_dev = self.ctx.kb_size
        self.n_dev = n_dev
        df = np.diff(index.offsets)
        order = np.argsort(-df, kind="stable")
        n_head = min(self.n_head, int((df > 0).sum()))
        self.head_pos = np.full(len(df), -1, np.int32)
        self.head_pos[order[:n_head]] = np.arange(n_head, dtype=np.int32)
        self.is_head = self.head_pos >= 0

        n_docs = index.n_docs
        self.d_shard = -(-max(n_docs, 1) // n_dev)  # docs per shard
        self.d_shard_pad = _round_up(self.d_shard + 1, LANE)

        # per-posting weights, shard of each posting
        tids = np.repeat(np.arange(len(df), dtype=np.int64), df)
        w_all = (index.idf[tids] * index.tfs
                 / (index.tfs + index.norm[index.docs])).astype(np.float32)
        shard_of = (index.docs // self.d_shard).astype(np.int64)
        local_doc = (index.docs - shard_of * self.d_shard).astype(np.int32)

        # ---- head: (H, n_dev * d_shard_pad) block-columned ------------
        head_mask = self.is_head[tids]
        h_rows = self.head_pos[tids[head_mask]].astype(np.int64)
        h_cols = (shard_of[head_mask] * self.d_shard_pad
                  + local_doc[head_mask])
        head_np = np.zeros((n_head, n_dev * self.d_shard_pad), np.float32)
        head_np[h_rows, h_cols] = w_all[head_mask]
        self.head_dense = self.ctx.shard(
            head_np.astype(jnp.bfloat16), None, meshlib.KB_AXIS)
        del head_np

        # ---- tail: per-shard CSR in (shard, term, doc) order -----------
        tail_mask = ~head_mask
        t_tids = tids[tail_mask]
        t_shard = shard_of[tail_mask]
        t_docs = local_doc[tail_mask]
        t_w = w_all[tail_mask]
        # postings arrive (term, doc)-sorted; docs ascend within a term so
        # shard ascends too -> stable sort by shard alone yields
        # (shard, term, doc) order
        perm = np.argsort(t_shard, kind="stable")
        t_tids, t_shard = t_tids[perm], t_shard[perm]
        t_docs, t_w = t_docs[perm], t_w[perm]
        # per-(shard, term) contiguous ranges
        key = t_shard * len(df) + t_tids
        bounds = np.searchsorted(
            key, np.arange(n_dev * len(df) + 1, dtype=np.int64))
        self.tail_start = bounds[:-1].reshape(n_dev, len(df))
        self.tail_len = np.diff(bounds).reshape(n_dev, len(df)).astype(
            np.int32)
        self.tail_df_total = np.where(self.is_head, 0, df)
        # per-shard slot caps from ACTUAL per-shard maxima, capped at
        # l_mid_cfg (wider per-shard slices split across slots)
        self.l_mid = max(LANE, min(
            _round_up(int(self.tail_len.max(initial=0)), LANE),
            _round_up(self.l_mid_cfg, LANE)))
        self.l_small = min(self.l_small_cfg, self.l_mid)
        # small-slot safety: _plan classifies by MAX PER-SHARD width and
        # emits l_mid chunks until that width is <= l_small, so every
        # remainder chunk's per-shard slice fits the small cap by
        # construction (split-slot planning, round 5)
        shard_bounds = np.searchsorted(t_shard,
                                       np.arange(n_dev + 1, dtype=np.int64))
        per_shard_n = np.diff(shard_bounds)
        t_len = int(per_shard_n.max(initial=0)) + self.l_mid
        tail_docs = np.full((n_dev, t_len), self.d_shard, np.int32)
        tail_w = np.zeros((n_dev, t_len), np.float32)
        for s in range(n_dev):
            lo, hi = shard_bounds[s], shard_bounds[s + 1]
            tail_docs[s, : hi - lo] = t_docs[lo:hi]
            tail_w[s, : hi - lo] = t_w[lo:hi]
            # make starts shard-local
            self.tail_start[s] -= lo
        self.tail_docs = self.ctx.shard(tail_docs, meshlib.KB_AXIS)
        self.tail_w = self.ctx.shard(
            tail_w.astype(jnp.bfloat16), meshlib.KB_AXIS)
        self.tail_start = self.tail_start.astype(np.int32)
        self._fn_cache = {}

    # ---- sharded block program -----------------------------------------
    def _block_fn(self, k: int):
        if k in self._fn_cache:
            return self._fn_cache[k]
        import jax
        from jax.sharding import PartitionSpec as P

        from viquae_tpu.core import mesh as meshlib

        d_shard, d_shard_pad = self.d_shard, self.d_shard_pad
        l_mid, l_small = self.l_mid, self.l_small
        n_dev = self.n_dev
        int_max = jnp.iinfo(jnp.int32).max

        def shard_fn(head_local, docs_l, w_l, head_w,
                     ms, ml, mr, mq, ss, sl, sr, sq):
            docs_l, w_l = docs_l[0], w_l[0]
            ms, ml = ms[0], ml[0]
            ss, sl = ss[0], sl[0]
            trash = d_shard
            scores = jax.lax.dot_general(
                head_w, head_local, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            def pool(starts, lens, qtf, cap):
                def one(start):
                    return (jax.lax.dynamic_slice(docs_l, (start,), (cap,)),
                            jax.lax.dynamic_slice(w_l, (start,), (cap,)))

                g_docs, g_w = jax.vmap(one)(starts)
                pos = jnp.arange(cap, dtype=jnp.int32)
                mask = pos < lens[:, None]
                g_docs = jnp.where(mask, g_docs, trash)
                g_w = jnp.where(mask, g_w.astype(jnp.float32)
                                * qtf[:, None], 0.0)
                return g_docs, g_w

            ids_m, vals_m = pool(ms, ml, mq, l_mid)
            ids_s, vals_s = pool(ss, sl, sq, l_small)
            # same anti-fusion barrier as _bm25_block (see there)
            ids_m, vals_m, ids_s, vals_s = jax.lax.optimization_barrier(
                (ids_m, vals_m, ids_s, vals_s))
            scores = scores.at[mr[:, None], ids_m].add(vals_m)
            scores = scores.at[sr[:, None], ids_s].add(vals_s)
            s, i = mips._select_topk(scores, k, "fast")
            base = jax.lax.axis_index(meshlib.KB_AXIS).astype(
                jnp.int32) * d_shard
            invalid = i >= d_shard
            s = jnp.where(invalid, -jnp.inf, s)
            i = jnp.where(invalid, int_max, i + base)
            all_s = jax.lax.all_gather(s, meshlib.KB_AXIS)
            all_i = jax.lax.all_gather(i, meshlib.KB_AXIS)
            all_s = jnp.moveaxis(all_s, 0, -1).reshape(
                head_w.shape[0], n_dev * k)
            all_i = jnp.moveaxis(all_i, 0, -1).reshape(
                head_w.shape[0], n_dev * k)
            neg, idx = jax.lax.sort((-all_s, all_i), dimension=-1,
                                    num_keys=2)
            return -neg[:, :k], idx[:, :k]

        fn = jax.jit(jax.shard_map(
            shard_fn,
            mesh=self.ctx.mesh,
            in_specs=(P(None, meshlib.KB_AXIS), P(meshlib.KB_AXIS),
                      P(meshlib.KB_AXIS), P(),
                      P(meshlib.KB_AXIS), P(meshlib.KB_AXIS), P(), P(),
                      P(meshlib.KB_AXIS), P(meshlib.KB_AXIS), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        self._fn_cache[k] = fn
        return fn

    # ---- planning + search ----------------------------------------------
    def _plan(self, queries: Sequence[str]):
        """Like DeviceBM25._plan, but slot ranges are per-shard arrays
        (n_blocks, n_dev, P)."""
        nq = len(queries)
        qb = self.q_block
        n_pad = _round_up(max(nq, 1), qb)
        n_blocks = n_pad // qb
        n_dev = self.n_dev
        p_m, p_s = self.pool_mid, self.pool_small
        head_w = np.zeros((n_pad, self.head_dense.shape[0]), np.float32)
        mid_start = np.zeros((n_blocks, n_dev, p_m), np.int32)
        mid_len = np.zeros((n_blocks, n_dev, p_m), np.int32)
        mid_row = np.zeros((n_blocks, p_m), np.int32)
        mid_qtf = np.zeros((n_blocks, p_m), np.float32)
        small_start = np.zeros((n_blocks, n_dev, p_s), np.int32)
        small_len = np.zeros((n_blocks, n_dev, p_s), np.int32)
        small_row = np.zeros((n_blocks, p_s), np.int32)
        small_qtf = np.zeros((n_blocks, p_s), np.float32)
        mid_used = np.zeros(n_blocks, np.int64)
        small_used = np.zeros(n_blocks, np.int64)
        overflow: List[int] = []
        for i, query in enumerate(queries):
            blk, row = divmod(i, qb)
            counts: dict = {}
            for tok in bm25_lib.analyze(query):
                tid = self.index.vocab.get(tok)
                if tid is not None:
                    counts[tid] = counts.get(tid, 0) + 1
            head_terms, mids, smalls = [], [], []
            for tid, qtf in counts.items():
                pos = self.head_pos[tid]
                if pos >= 0:
                    head_terms.append((pos, qtf))
                    continue
                if self.tail_df_total[tid] == 0:
                    continue
                starts = self.tail_start[:, tid]
                lens = self.tail_len[:, tid]
                width = int(lens.max(initial=0))
                # split wide per-shard slices into l_mid-cap chunks; a
                # chunk occupies the SAME slot index on every shard with
                # a per-shard (start+j*cap, clip(len-j*cap, 0, cap))
                # sub-range (len 0 where the shard's slice is shorter)
                j = 0
                while width > self.l_small:
                    c_len = np.clip(lens - j * self.l_mid, 0, self.l_mid)
                    mids.append((starts + j * self.l_mid,
                                 c_len.astype(np.int32), qtf))
                    j += 1
                    width -= self.l_mid
                if width > 0:
                    c_len = np.clip(lens - j * self.l_mid, 0,
                                    self.l_small)
                    smalls.append((starts + j * self.l_mid,
                                   c_len.astype(np.int32), qtf))
            free_s = p_s - small_used[blk]
            free_m = p_m - mid_used[blk]
            while len(smalls) > free_s and len(mids) < free_m:
                mids.append(smalls.pop())
            if len(mids) > free_m or len(smalls) > free_s:
                overflow.append(i)
                continue
            for pos, qtf in head_terms:
                head_w[i, pos] = qtf
            for starts, lens, qtf in mids:
                s = mid_used[blk]
                mid_start[blk, :, s] = starts
                mid_len[blk, :, s] = lens
                mid_row[blk, s] = row
                mid_qtf[blk, s] = qtf
                mid_used[blk] += 1
            for starts, lens, qtf in smalls:
                s = small_used[blk]
                small_start[blk, :, s] = starts
                small_len[blk, :, s] = lens
                small_row[blk, s] = row
                small_qtf[blk, s] = qtf
                small_used[blk] += 1
        return (head_w, mid_start, mid_len, mid_row, mid_qtf,
                small_start, small_len, small_row, small_qtf), overflow

    def search_batch(self, queries: Sequence[str], k: int = 100
                     ) -> Tuple[List[List[float]], List[List[int]]]:
        nq = len(queries)
        if nq == 0:
            return [], []
        k_eff = min(k, self.index.n_docs)
        if k_eff == 0:  # empty corpus: nothing retrievable
            return [[] for _ in queries], [[] for _ in queries]
        plan, overflow = self._plan(queries)
        self.last_overflow = len(overflow)
        head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
        qb = self.q_block
        fn = self._block_fn(k_eff)
        scores_out = np.zeros((head_w.shape[0], k_eff), np.float32)
        ids_out = np.zeros((head_w.shape[0], k_eff), np.int64)
        pending = []
        for blk, lo in enumerate(range(0, head_w.shape[0], qb)):
            hi = lo + qb
            s, i = fn(
                self.head_dense, self.tail_docs, self.tail_w,
                jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
                jnp.asarray(ms[blk]), jnp.asarray(ml[blk]),
                jnp.asarray(mr[blk]), jnp.asarray(mq[blk]),
                jnp.asarray(ss[blk]), jnp.asarray(sl[blk]),
                jnp.asarray(sr[blk]), jnp.asarray(sq[blk]))
            pending.append((lo, hi, s, i))
        for lo, hi, s, i in pending:
            scores_out[lo:hi] = np.asarray(s)
            ids_out[lo:hi] = np.asarray(i)
        scores_batch: List[List[float]] = []
        indices_batch: List[List[int]] = []
        for q in range(nq):
            keep = (scores_out[q] > 0) & (ids_out[q] < self.index.n_docs)
            scores_batch.append(scores_out[q][keep].tolist())
            indices_batch.append(ids_out[q][keep].tolist())
        if overflow:
            fb_s, fb_i = self.index.search_batch(
                [queries[i] for i in overflow], k=k)
            for pos, i in enumerate(overflow):
                scores_batch[i] = fb_s[pos]
                indices_batch[i] = fb_i[pos]
        return scores_batch, indices_batch

    def search_batch_device(self, queries: Sequence[str], k: int = 100):
        """Device-resident results in the framework pad convention —
        same contract as :meth:`DeviceBM25.search_batch_device` (results
        replicated across the mesh after the all-gather merge)."""
        nq = len(queries)
        k_eff = min(k, self.index.n_docs)
        if nq == 0 or k_eff == 0:
            pad_rows = max(_round_up(max(nq, 1), self.q_block), 1)
            return (jnp.full((pad_rows, max(k_eff, 1)), -jnp.inf),
                    jnp.full((pad_rows, max(k_eff, 1)),
                             jnp.iinfo(jnp.int32).max, jnp.int32))
        plan, overflow = self._plan(queries)
        self.last_overflow = len(overflow)
        head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
        qb = self.q_block
        fn = self._block_fn(k_eff)
        outs = []
        for blk, lo in enumerate(range(0, head_w.shape[0], qb)):
            hi = lo + qb
            outs.append(fn(
                self.head_dense, self.tail_docs, self.tail_w,
                jnp.asarray(head_w[lo:hi].astype(jnp.bfloat16)),
                jnp.asarray(ms[blk]), jnp.asarray(ml[blk]),
                jnp.asarray(mr[blk]), jnp.asarray(mq[blk]),
                jnp.asarray(ss[blk]), jnp.asarray(sl[blk]),
                jnp.asarray(sr[blk]), jnp.asarray(sq[blk])))
        fb = None
        if overflow:
            fb_s, fb_i = self.index.search_batch(
                [queries[i] for i in overflow], k=k_eff)
            fb_scores = np.full((len(overflow), k_eff), -np.inf,
                                np.float32)
            fb_ids = np.full((len(overflow), k_eff),
                             np.iinfo(np.int32).max, np.int32)
            for pos in range(len(overflow)):
                fb_scores[pos, : len(fb_s[pos])] = fb_s[pos]
                fb_ids[pos, : len(fb_i[pos])] = fb_i[pos]
            fb = (jnp.asarray(np.asarray(overflow, np.int32)),
                  jnp.asarray(fb_scores), jnp.asarray(fb_ids))
        return _finalize_device(
            tuple(s for s, _ in outs), tuple(i for _, i in outs), fb,
            n_docs=self.index.n_docs)
