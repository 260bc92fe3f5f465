"""Scaling guards over the COMPILED multi-device programs.

The sharding design (SURVEY.md §2.4: per-shard scoring + candidate-only
merges over ICI) is asserted for CORRECTNESS elsewhere; these tests pin its
COMMUNICATION LAYOUT by inspecting the optimized HLO. A lost shard_map, a
wrong in_spec, or an XLA repartition that resharded the KB would show up as
a shard-sized (or KB-sized) collective here — long before any real pod run
could measure the regression as ICI saturation.

Reference contrast: the reference's scale story is FAISS sharding + torch
DDP/NCCL (meerqat uses single-host FAISS; SURVEY.md §2.3), which has no
compile-time artifact to guard at all.
"""
import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.ops import mips

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = ("all-gather", "all-reduce", "all-to-all",
                "collective-permute", "reduce-scatter")


def collective_sizes(hlo_text: str):
    """[(op, bytes)] for every collective in an optimized HLO module.

    An HLO line reads `%name = f32[8,16,10]{2,1,0} all-gather(...)` (or a
    tuple `(f32[...], s32[...]) all-reduce(...)`); the result shape(s)
    sit between `=` and the op name.
    """
    out = []
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(.+?)\s+(" + "|".join(_COLLECTIVES) + r")\(",
                      line)
        if not m:
            continue
        total = 0
        for dt, dims in re.findall(r"(\w+)\[([0-9,]*)\]", m.group(1)):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        out.append((m.group(2), total))
    return out


@pytest.mark.parametrize("mode", ["fast", "global", "approx", "fused"])
def test_sharded_search_collectives_are_candidate_sized(devices, mode):
    """topk_sharded's inter-device traffic must be the (n_dev, Q, k)
    candidate merge — never per-shard score rows or KB rows. 'fused' is
    the Pallas engine (interpreted on CPU; its column-sharded (d, N)
    layout rides the same merge)."""
    ctx = meshlib.make_kb_mesh()
    n_dev = ctx.kb_size
    Q, d, k = 16, 32, 10
    rows_per_shard = 512
    N = n_dev * rows_per_shard
    with meshlib.use(ctx):
        if mode == "fused":
            kb = jax.device_put(
                jnp.zeros((d, N), jnp.bfloat16),
                ctx.sharding(None, meshlib.KB_AXIS))
            q = jnp.zeros((Q, d), jnp.bfloat16)
        else:
            kb = jax.device_put(
                jnp.asarray(np.zeros((N, d), np.float32)), ctx.kb_sharded)
            q = jnp.zeros((Q, d), jnp.float32)

        def search(q, kb):
            return mips.topk_sharded(
                q, kb, k, mesh_ctx=ctx, chunk_size=256,
                valid_rows=N, mode=mode)

        txt = jax.jit(search).lower(q, kb).compile().as_text()

    sizes = collective_sizes(txt)
    assert sizes, "expected at least the candidate all-gather"
    # candidate merge: scores f32 + ids s32, (n_dev, Q, k) each = 2 * 4B
    candidate_bytes = n_dev * Q * k * 4
    budget = 4 * 2 * candidate_bytes  # slack for fused tuples/padding
    # a shard-sized leak would be >= Q * rows_per_shard * 4B = 128KB
    for op, nbytes in sizes:
        assert nbytes <= budget, (
            f"{op} moves {nbytes}B (> {budget}B candidate budget) in "
            f"mode={mode} — shard-sized data is crossing the mesh:\n"
            + "\n".join(f"  {o}: {b}B" for o, b in sizes))


def test_sharded_search_traffic_scales_with_k_not_n(devices):
    """Doubling the KB must NOT grow collective traffic; doubling k must
    grow it proportionally — the signature of a candidate-only merge."""
    ctx = meshlib.make_kb_mesh()
    n_dev = ctx.kb_size
    Q, d = 16, 32

    def total_traffic(rows_per_shard, k):
        N = n_dev * rows_per_shard
        with meshlib.use(ctx):
            kb = jax.device_put(
                jnp.asarray(np.zeros((N, d), np.float32)), ctx.kb_sharded)
            q = jnp.zeros((Q, d), jnp.float32)
            txt = jax.jit(
                lambda q, kb: mips.topk_sharded(
                    q, kb, k, mesh_ctx=ctx, chunk_size=256,
                    valid_rows=N, mode="fast")
            ).lower(q, kb).compile().as_text()
        return sum(b for _, b in collective_sizes(txt))

    base = total_traffic(256, 8)
    double_n = total_traffic(512, 8)
    double_k = total_traffic(256, 16)
    assert double_n == base, (base, double_n)
    assert base < double_k <= 2 * base + 64, (base, double_k)


def test_sequence_parallel_parity_and_layout(devices):
    """The sequence-parallel seam (bert.encode activation_sharding,
    SURVEY §5.7): constraining the L axis of the (B, L, D) activations to
    the `model` axis (Megatron-SP style — sp borrows the tp axis) must
    (a) keep outputs numerically identical and (b) actually shard — the
    compiled program must carry per-layer collectives that re-materialize
    the full sequence for attention, and the constraint must survive into
    the optimized HLO rather than being constant-folded away."""
    from viquae_tpu.models import bert

    cfg = bert.BertConfig(
        vocab_size=97, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    )
    params = bert.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 97, (8, 16)), jnp.int32)
    mask = np.ones((8, 16), np.int32)
    mask[:, 13:] = 0
    mask = jnp.asarray(mask)

    ref = bert.apply(params, cfg, ids, mask)["last_hidden_state"]

    ctx = meshlib.make_mesh(data=2, model=4)
    with meshlib.use(ctx):
        seq_sharding = ctx.sharding(
            meshlib.DATA_AXIS, meshlib.MODEL_AXIS, None)
        fn = jax.jit(
            lambda p, i, m: bert.apply(
                p, cfg, i, m, activation_sharding=seq_sharding
            )["last_hidden_state"]
        )
        out = fn(params, ids, mask)
        hlo = fn.lower(params, ids, mask).compile().as_text()

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert collective_sizes(hlo), (
        "sequence-sharded activations compiled to a collective-free "
        "program — the activation_sharding constraint was dropped")
    # the constraint itself must be visible in the final sharding layout
    assert "sharding=" in hlo


def test_sharded_device_bm25_collectives_candidate_sized(devices):
    """ShardedDeviceBM25's block program (VERDICT r4 item 6): the only
    inter-shard traffic must be the (n_dev, Q, k) candidate merge — a
    lost in_spec or an XLA repartition would move the per-shard f32
    score block (Q x d_shard_pad) or the postings across the mesh."""
    from viquae_tpu.ops import bm25 as bm25_lib
    from viquae_tpu.ops.bm25_device import ShardedDeviceBM25

    rng = np.random.default_rng(0)
    texts = [" ".join(f"w{(int(z) - 1) % 300}"
                      for z in rng.zipf(1.3, rng.integers(10, 60)))
             for _ in range(2000)]
    index = bm25_lib.BM25Index.build(texts, k1=0.5, b=0.3)
    ctx = meshlib.make_mesh(data=2, kb=4)
    dev = ShardedDeviceBM25(index, mesh_ctx=ctx, n_head=16, l_small=64,
                            l_mid=128, q_block=8)
    queries = [" ".join(f"w{(int(z) - 1) % 300}" for z in rng.zipf(1.3, 6))
               for _ in range(8)]
    k = 5
    plan, overflow = dev._plan(queries)
    head_w, ms, ml, mr, mq, ss, sl, sr, sq = plan
    fn = dev._block_fn(k)
    args = (dev.head_dense, dev.tail_docs, dev.tail_w,
            jnp.asarray(head_w[:8].astype(jnp.bfloat16)),
            jnp.asarray(ms[0]), jnp.asarray(ml[0]), jnp.asarray(mr[0]),
            jnp.asarray(mq[0]), jnp.asarray(ss[0]), jnp.asarray(sl[0]),
            jnp.asarray(sr[0]), jnp.asarray(sq[0]))
    txt = fn.lower(*args).compile().as_text()
    sizes = collective_sizes(txt)
    assert sizes, "expected the candidate all-gather"
    n_dev, Q = dev.n_dev, 8
    candidate_bytes = n_dev * Q * k * 4  # f32 scores (ids s32 same size)
    budget = 4 * 2 * candidate_bytes
    # a leaked per-shard score block is Q * d_shard_pad * 4B >= 20KB here
    leak = Q * dev.d_shard_pad * 4
    assert budget < leak, "guard must be able to tell the two apart"
    for op, nbytes in sizes:
        assert nbytes <= budget, (
            f"{op} moves {nbytes}B (> {budget}B candidate budget) — "
            "shard-sized BM25 data is crossing the mesh:\n"
            + "\n".join(f"  {o}: {b}B" for o, b in sizes))


def test_qa_fused_program_collectives_candidate_sized(devices):
    """The dp x kb fused QA retrieval program (dryrun's qa_retrieve
    shape: packed DPR encode + two kb-sharded topk legs + on-device
    gzmuv fusion) must keep every collective candidate-sized — the
    encoder is data-parallel (no collectives), the sharded searches
    merge candidates only, and fusion runs on replicated candidates."""
    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import fusion as fusion_ops
    from viquae_tpu.ops import packing

    cfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=97, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64, add_pooler=False))
    params = dpr.init(jax.random.key(0), cfg)
    ctx = meshlib.make_mesh(data=2, kb=4)
    n_dev = ctx.kb_size
    Q, k, m_qa, d = 16, 10, 3, 16
    rows_per_shard = 128
    N = n_dev * rows_per_shard

    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 97, rng.integers(5, 12)).astype(np.int32)
            for _ in range(Q)]
    packed = packing.pack_token_sequences(seqs, row_len=16, n_cls=Q,
                                          pad_rows_to=4)
    canvas = tuple(jnp.asarray(a) for a in (
        packed.input_ids, packed.segment_ids, packed.position_ids,
        packed.cls_rows, packed.cls_cols))

    with meshlib.use(ctx):
        kb_dev = jax.device_put(
            jnp.asarray(rng.standard_normal((N, d)).astype(np.float32)),
            ctx.kb_sharded)
        kb_face = jax.device_put(
            jnp.asarray(rng.standard_normal((N, d)).astype(np.float32)),
            ctx.kb_sharded)
        q_face = jnp.asarray(
            rng.standard_normal((Q, d)).astype(np.float32))

        def qa_retrieve(q_params, ids, seg, pos, cr, cc, kb_shards,
                        face_shards, qf):
            ids = jax.lax.with_sharding_constraint(
                ids, ctx.batch_sharded)
            q = dpr.apply_packed(q_params, cfg, ids, seg, pos, cr, cc,
                                 deterministic=True)
            s0, i0 = mips.topk_sharded(q, kb_shards, k, mesh_ctx=ctx,
                                       chunk_size=64, mode="fast")
            s1, i1 = mips.topk_sharded(qf, face_shards, k, mesh_ctx=ctx,
                                       chunk_size=64, mode="fast")
            return fusion_ops.fuse_topk(
                (s0, s1), (i0.astype(jnp.int32), i1.astype(jnp.int32)),
                (0.6, 0.4), m_qa, norm="gzmuv",
                valid_queries=jnp.int32(Q))

        fn = jax.jit(qa_retrieve)
        txt = fn.lower(params, *canvas, kb_dev, kb_face,
                       q_face).compile().as_text()

    sizes = collective_sizes(txt)
    assert sizes, "expected candidate merges from the two sharded legs"
    candidate_bytes = n_dev * packed.rows * k * 4
    budget = 4 * 2 * candidate_bytes
    # leaks to catch: per-shard score rows (Q x rows_per_shard x 4B) or
    # a resharded KB (rows_per_shard x d x 4B x n_dev)
    for op, nbytes in sizes:
        assert nbytes <= budget, (
            f"{op} moves {nbytes}B (> {budget}B candidate budget) in the "
            "fused QA program:\n"
            + "\n".join(f"  {o}: {b}B" for o, b in sizes))
