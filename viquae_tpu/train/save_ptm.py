"""Export trained checkpoints as standalone encoder dirs
(parity meerqat/train/save_ptm.py:22-40).

Converts an orbax TrainState checkpoint into params-only npz dirs — the
inter-stage contract consumed by ir.embedding. `--bert` unwraps a DPR tower
to its bare BERT params (a no-op structurally here since DPR == BERT without
pooler, kept for interface parity).
"""
from __future__ import annotations

import argparse
from pathlib import Path

from viquae_tpu.train import checkpoint as ckpt_lib


def save_ptm(ckpt_dir, output_dir, template_state, subtree: str = "params",
             split_keys=("question", "context"), step=None):
    """Restore a TrainState and export its params subtree(s)."""
    state, step = ckpt_lib.restore_state(ckpt_dir, template_state, step=step)
    params = state[subtree] if subtree else state
    output_dir = Path(output_dir)
    exported = []
    if isinstance(params, dict) and any(k in params for k in split_keys):
        for key in split_keys:
            if key in params:
                ckpt_lib.export_params(output_dir / f"{key}_model", params[key])
                exported.append(str(output_dir / f"{key}_model"))
    else:
        ckpt_lib.export_params(output_dir, params)
        exported.append(str(output_dir))
    return {"step": step, "exported": exported}
