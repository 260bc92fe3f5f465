"""Device mesh and sharding contract.

The whole framework communicates through ONE mesh with three named axes:

- ``data``  — batch/data parallelism. Gradient sync and global in-batch
  negatives (the reference's only collective: Lightning DDP `all_gather`
  with label shifting, meerqat/train/trainee.py:438-452) ride this axis.
- ``model`` — tensor parallelism: attention heads and MLP hidden dims of
  the encoders are sharded here. The reference (bert-base scale) has no TP;
  we provide it as a first-class axis so larger encoders scale over ICI.
- ``kb``    — the retrieval scale axis: knowledge-base embedding matrices
  (1.5M x 768 per index in ViQuAE) are row-sharded here; MIPS does a
  per-shard matmul + local top-k and merges over ICI (ops/mips.py).
- ``pipe``  — pipeline parallelism: encoder layer stacks are split into
  contiguous stages sharded here; microbatches stream through the stage
  ring via `ppermute` (ops/pipeline.py). Size 1 unless requested, so the
  axis is free for every existing layout.

Collectives are never called directly by user code — they are induced by
`jax.sharding` annotations under jit, or used explicitly inside
`shard_map`-ped kernels. This module is the single place where axis names
are defined.
"""
from __future__ import annotations

import contextlib
import dataclasses
import math
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
KB_AXIS = "kb"
PIPE_AXIS = "pipe"

_ACTIVE: list["MeshContext"] = []


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """A live mesh plus convenience shardings."""

    mesh: Mesh

    @property
    def data_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[MODEL_AXIS]

    @property
    def kb_size(self) -> int:
        return self.mesh.shape[KB_AXIS]

    @property
    def pipe_size(self) -> int:
        # meshes built before the axis existed (loaded configs, ad-hoc
        # Mesh objects) count as pipe=1
        return self.mesh.shape.get(PIPE_AXIS, 1)

    # ---- shardings ----------------------------------------------------
    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    @property
    def batch_sharded(self) -> NamedSharding:
        """Leading dim over `data`."""
        return self.sharding(DATA_AXIS)

    @property
    def kb_sharded(self) -> NamedSharding:
        """Row-shard a (N, d) KB matrix over `kb`."""
        return self.sharding(KB_AXIS)

    def shard(self, x, *spec):
        return jax.device_put(x, self.sharding(*spec))


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    kb: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    """Build the framework mesh.

    By default all devices go to the `data` axis. `kb` sharding for search
    reuses the same devices through a distinct axis so one process can run
    data-parallel embedding and kb-sharded search on the same chips.
    `pipe` sits next to `data` in the device grid so stage neighbours are
    ICI-adjacent (ppermute rides the ring, not DCN).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * kb * pipe)
    assert data * model * kb * pipe == n, (
        f"mesh {data}x{pipe}x{model}x{kb} != {n} devices"
    )
    arr = np.asarray(devices).reshape(data, pipe, model, kb)
    mesh = Mesh(arr, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS, KB_AXIS))
    return MeshContext(mesh)


def make_kb_mesh(kb: Optional[int] = None, devices=None) -> MeshContext:
    """All devices on the `kb` axis — the search-serving layout."""
    devices = list(devices if devices is not None else jax.devices())
    kb = kb if kb is not None else len(devices)
    return make_mesh(data=len(devices) // kb, model=1, kb=kb, devices=devices)


@contextlib.contextmanager
def use(ctx: MeshContext):
    _ACTIVE.append(ctx)
    try:
        with jax.sharding.set_mesh(ctx.mesh):
            yield ctx
    finally:
        _ACTIVE.pop()


def current() -> MeshContext:
    if _ACTIVE:
        return _ACTIVE[-1]
    return make_mesh()  # default: all-data mesh


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def host_device_count_flags(n: int = 8) -> dict:
    """Env vars that emulate an n-device CPU mesh (for tests/dry runs)."""
    return {
        "XLA_FLAGS": (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip(),
        "JAX_PLATFORMS": "cpu",
    }
