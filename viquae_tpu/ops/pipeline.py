"""GPipe-style pipeline parallelism over the `pipe` mesh axis.

The reference scales training by data parallelism only (4x V100 DDP,
EXPERIMENTS.rst:274-279); its encoders fit one GPU. This module provides
the TPU-native scale-out for encoders that do NOT fit one chip: the layer
stack is split into `pipe_size` contiguous stages, each device holds ONE
stage's parameters (the HBM win), and microbatches stream through the
stage ring via `lax.ppermute` on ICI — the classic GPipe schedule of
``n_micro + n_stages - 1`` ticks with bubble fraction (S-1)/(M+S-1).

Design notes (TPU/XLA-first):

- The whole schedule is ONE `lax.scan` inside ONE `shard_map`: every tick
  is the same traced program (stage compute + ppermute), so XLA compiles a
  single fused loop body and the ring transfer overlaps with the next
  dispatch. No per-tick Python, no dynamic shapes.
- SPMD trick: every device runs the same tick body; "which microbatch am I
  holding" is pure index arithmetic on `axis_index('pipe')`. Stage 0
  injects fresh microbatches, the last stage banks results; everyone else
  just relays.
- Differentiable end-to-end: `ppermute`/`scan`/`psum` all have transpose
  rules, so `jax.grad` through `pipeline_apply` yields exactly the
  backward pipeline (cotangents ride the reverse ring). Gradient equality
  vs the sequential stack is asserted in tests/test_pipeline.py.
- Composes with data parallelism: batch-dim shards on `data` while stage
  params shard on `pipe`; gradient sync over `data` stays implicit in the
  sharded autodiff outside the shard_map.

Stage parameters are "stacked" pytrees: each leaf carries a leading
(n_stages, layers_per_stage) pair of axes, sharded P('pipe') so one
stage's slice lives per device. `stack_stages`/`unstack_stages` convert
between that layout and the per-layer list the rest of the framework uses
(checkpoints and HF ports keep the list form).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from viquae_tpu.core import mesh as meshlib


# --------------------------------------------------------------------------
# stacked-stage parameter layout
# --------------------------------------------------------------------------
def stack_stages(layer_params: list, n_stages: int):
    """List of per-layer pytrees -> one pytree with leading
    (n_stages, layers_per_stage) axes (shard the first over `pipe`)."""
    n_layers = len(layer_params)
    if n_stages < 1 or n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers do not split into {n_stages} equal stages"
        )
    per = n_layers // n_stages
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *layer_params
    )
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages, per) + x.shape[1:]), stacked
    )


def unstack_stages(stacked) -> list:
    """Inverse of :func:`stack_stages`: back to the per-layer list."""
    leaves = jax.tree_util.tree_leaves(stacked)
    n_stages, per = leaves[0].shape[:2]
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((n_stages * per,) + x.shape[2:]), stacked
    )
    return [
        jax.tree_util.tree_map(lambda x: x[i], flat)
        for i in range(n_stages * per)
    ]


def stage_spec(stacked):
    """PartitionSpec pytree sharding the stage axis over `pipe`."""
    return jax.tree_util.tree_map(
        lambda _: P(meshlib.PIPE_AXIS), stacked
    )


def microbatch(x, n_micro: int):
    """(B, ...) -> (n_micro, B / n_micro, ...); B must divide evenly."""
    def split(a):
        b = a.shape[0]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
        return a.reshape((n_micro, b // n_micro) + a.shape[1:])

    return jax.tree_util.tree_map(split, x)


def unmicrobatch(x):
    """Inverse of :func:`microbatch` on the leading two axes."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]), x
    )


# --------------------------------------------------------------------------
# the pipelined map
# --------------------------------------------------------------------------
def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    inputs: jnp.ndarray,
    consts: Any = None,
    mesh_ctx: Optional[meshlib.MeshContext] = None,
    batch_axis: Optional[str] = meshlib.DATA_AXIS,
):
    """Run `inputs` through the staged stack on the `pipe` mesh axis.

    stage_fn(stage_layers, x, const, layer_offset) -> y with y.shape ==
    x.shape; `stage_layers` is one stage's slice of `stage_params` (leading
    layers_per_stage axis), `layer_offset` the global index of its first
    layer (for per-layer dropout key derivation).

    inputs: (n_micro, mb, ...) microbatched activations (see
    :func:`microbatch`). consts: optional pytree of per-microbatch
    constants with leading n_micro (attention bias, rng keys, ...).

    Returns (n_micro, mb, ...) outputs. The microbatch dim stays replicated
    over `pipe` (stage 0 reads it, the last stage writes it — the params
    are what sharding saves); `batch_axis` shards the mb dim for dp x pp.
    """
    ctx = mesh_ctx or meshlib.current()
    n_stages = ctx.pipe_size
    leaves = jax.tree_util.tree_leaves(stage_params)
    if leaves[0].shape[0] != n_stages:
        raise ValueError(
            f"stage_params carries {leaves[0].shape[0]} stages but the mesh "
            f"pipe axis is {n_stages} — restack with stack_stages(...)"
        )
    per_stage = leaves[0].shape[1]
    n_micro = inputs.shape[0]
    if consts is None:
        consts = jnp.zeros((n_micro,), jnp.float32)

    def shard_fn(params, xs, cs):
        # local views: params (1, per_stage, ...) -> (per_stage, ...)
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        sid = jax.lax.axis_index(meshlib.PIPE_AXIS)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, outs = carry
            # microbatch index currently at this stage (clipped warmup/
            # drain ticks compute on garbage that is never consumed)
            mb = jnp.clip(t - sid, 0, n_micro - 1)
            x = jnp.where(sid == 0, xs[jnp.clip(t, 0, n_micro - 1)], state)
            c = jax.tree_util.tree_map(lambda a: a[mb], cs)
            y = stage_fn(params, x, c, sid * per_stage)
            # last stage banks microbatch t - (n_stages - 1)
            o = t - (n_stages - 1)
            banked = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(o, 0, n_micro - 1), 0
            )
            outs = jnp.where(
                (sid == n_stages - 1) & (o >= 0), banked, outs
            )
            state = jax.lax.ppermute(y, meshlib.PIPE_AXIS, perm)
            return (state, outs), None

        init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        (_, outs), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + n_stages - 1)
        )
        # results live on the last stage only; psum over the ring hands
        # every rank the same replicated output
        outs = jnp.where(sid == n_stages - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, meshlib.PIPE_AXIS)

    def mb_spec(a):
        # (n_micro, mb, ...): mb over `data`, replicated over `pipe`
        if batch_axis is None or a.ndim < 2:
            return P()
        return P(None, batch_axis, *([None] * (a.ndim - 2)))

    fn = jax.shard_map(
        shard_fn,
        mesh=ctx.mesh,
        in_specs=(
            stage_spec(stage_params),
            mb_spec(inputs),
            jax.tree_util.tree_map(mb_spec, consts),
        ),
        out_specs=mb_spec(inputs),
        check_vma=False,
    )
    return fn(stage_params, inputs, consts)
