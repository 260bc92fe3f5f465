"""Checkpoint / resume / export.

Replaces the reference's Lightning ModelCheckpoint + `save_ptm.py` pair
(SURVEY.md §5.4): orbax saves the full TrainState (params + opt state +
step) for resume; :func:`export_params` persists a params subtree as the
inter-stage contract (what `save_ptm.py:22-31` does by splitting a ckpt
into HF `save_pretrained` dirs — e.g. question/context towers consumed by
ir.embedding).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_state(ckpt_dir, state, step: int, keep: Optional[int] = None):
    ocp = _ocp()
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step_{step}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if keep is not None:
        steps = sorted(all_steps(ckpt_dir))
        for old in steps[:-keep]:
            import shutil

            shutil.rmtree(ckpt_dir / f"step_{old}", ignore_errors=True)
    return path


def all_steps(ckpt_dir):
    ckpt_dir = Path(ckpt_dir)
    return [
        int(p.name.split("_")[1])
        for p in ckpt_dir.glob("step_*") if p.is_dir()
    ]


def restore_state(ckpt_dir, template, step: Optional[int] = None):
    """Restore into the structure of `template` (a concrete TrainState)."""
    ocp = _ocp()
    ckpt_dir = Path(ckpt_dir).resolve()
    if step is None:
        steps = all_steps(ckpt_dir)
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        step = max(steps)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(ckpt_dir / f"step_{step}", template), step


# --------------------------------------------------------------------------
# params-only export (the inter-stage checkpoint contract)
# --------------------------------------------------------------------------
def export_params(path, params, config: Optional[dict] = None):
    """Flat .npz of a params pytree + JSON config — loadable without jax."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    np.savez(path / "params.npz", **flat)
    if config is not None:
        (path / "config.json").write_text(json.dumps(config, indent=2))


def import_params(path, template) -> Any:
    """Inverse of export_params, restoring the structure of `template`."""
    path = Path(path)
    data = np.load(path / "params.npz")
    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)
    flat, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for keypath, leaf in leaves_with_path[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        arr = data[name]
        assert arr.shape == tuple(leaf.shape), (name, arr.shape, leaf.shape)
        restored.append(arr)
    return jax.tree_util.tree_unflatten(treedef, restored)
