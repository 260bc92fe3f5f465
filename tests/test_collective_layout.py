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
