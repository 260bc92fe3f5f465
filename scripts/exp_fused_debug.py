"""Bisect which construct crashes Mosaic in the q-major fused kernel.

Variants (tiny shapes, Q=256, N=32768, tile=512):
  v0: matmul + mask + scores write only (nv as (1,1) SMEM)
  v1: v0 + lane-group segmax via 3D reshape/max, full-block write each
      step (segmax laid out (n_super, Q, SEG) so no partial writes)
  v2: v1 but segmax written with sub-lane pl.ds into a (Q, n_seg) block
      resident across the inner grid dim  (the take-3 design)
"""
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEG = 128


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, N, D, TILE = 256, 32768, 768, 512
    SEGS = TILE // SEG          # 4
    INNER = SEG // SEGS         # 32
    SUPER = TILE * INNER        # 16384
    key = jax.random.key(0)
    q = jax.random.normal(jax.random.fold_in(key, 0), (Q, D), jnp.bfloat16)
    kbt = jax.random.normal(jax.random.fold_in(key, 1), (D, N), jnp.bfloat16)
    nv = jnp.asarray([[N - 100]], jnp.int32)

    def report(name, fn, *args):
        try:
            out = fn(*args)
            out = [np.asarray(o) for o in jax.tree_util.tree_leaves(out)]
            print(f"{name}: OK {[o.shape for o in out]}", file=sys.stderr)
            return out
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)
            return None

    # ---- v0: scores only ------------------------------------------------
    def k0(q_ref, kbt_ref, nv_ref, scores_ref):
        i = pl.program_id(0)
        s = jax.lax.dot_general(
            q_ref[:], kbt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * TILE
        s = jnp.where(col < nv_ref[0, 0], s, -jnp.inf)
        scores_ref[:] = s.astype(scores_ref.dtype)

    @jax.jit
    def v0(q, kbt, nv):
        return pl.pallas_call(
            k0, grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((Q, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((Q, TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, N), jnp.bfloat16),
        )(q, kbt, nv)

    # ---- v1: + segmax, 3D-layout output, full-block writes ---------------
    def k1(q_ref, kbt_ref, nv_ref, scores_ref, segmax_ref):
        i = pl.program_id(0)
        s = jax.lax.dot_general(
            q_ref[:], kbt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * TILE
        s = jnp.where(col < nv_ref[0, 0], s, -jnp.inf)
        s = s.astype(scores_ref.dtype)
        scores_ref[:] = s
        segmax_ref[:] = s.reshape(s.shape[0], SEGS, SEG).max(axis=2)[None]

    @jax.jit
    def v1(q, kbt, nv):
        return pl.pallas_call(
            k1, grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((Q, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((Q, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q, SEGS), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q, N), jnp.bfloat16),
                jax.ShapeDtypeStruct((N // TILE, Q, SEGS), jnp.bfloat16),
            ],
        )(q, kbt, nv)

    # ---- v2: resident (Q, SEG) segmax block + sub-lane ds stores ---------
    def k2(q_ref, kbt_ref, nv_ref, scores_ref, segmax_ref):
        o, t = pl.program_id(0), pl.program_id(1)
        s = jax.lax.dot_general(
            q_ref[:], kbt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
               + (o * INNER + t) * TILE)
        s = jnp.where(col < nv_ref[0, 0], s, -jnp.inf)
        s = s.astype(scores_ref.dtype)
        scores_ref[:] = s
        off = pl.multiple_of(t * SEGS, SEGS)
        segmax_ref[:, pl.ds(off, SEGS)] = (
            s.reshape(s.shape[0], SEGS, SEG).max(axis=2))

    @jax.jit
    def v2(q, kbt, nv):
        return pl.pallas_call(
            k2, grid=(N // SUPER, INNER),
            in_specs=[
                pl.BlockSpec((Q, D), lambda o, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, TILE), lambda o, t: (0, o * INNER + t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda o, t: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((Q, TILE), lambda o, t: (0, o * INNER + t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, SEG), lambda o, t: (0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Q, N), jnp.bfloat16),
                jax.ShapeDtypeStruct((Q, N // SEG), jnp.bfloat16),
            ],
        )(q, kbt, nv)

    s0 = report("v0 scores-only", v0, q, kbt, nv)
    s1 = report("v1 3D segmax", v1, q, kbt, nv)
    s2 = report("v2 resident-block segmax", v2, q, kbt, nv)

    # reference check
    ref = np.asarray(
        jnp.dot(q, kbt, preferred_element_type=jnp.float32)).astype(np.float32)
    ref[:, N - 100:] = -np.inf
    if s0 is not None:
        d = np.abs(s0[0].astype(np.float32)[:, :N - 100]
                   - ref[:, :N - 100]).max()
        print(f"v0 score max|diff| {d:.5f}", file=sys.stderr)
    refmax = ref.reshape(Q, N // SEG, SEG).max(axis=2)
    if s1 is not None:
        m = np.moveaxis(s1[1].astype(np.float32), 0, 1).reshape(Q, N // SEG)
        print(f"v1 segmax max|diff| {np.abs(m - refmax).max():.5f}",
              file=sys.stderr)
    if s2 is not None:
        m = s2[1].astype(np.float32)
        print(f"v2 segmax max|diff| {np.abs(m - refmax).max():.5f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
