"""Tracing / profiling (SURVEY.md §5.1 — absent in the reference, where the
Lightning profiler hook exists but is disabled in every config).

Two levels:
- :class:`StageTimer` — lightweight named wall-clock stages with device
  sync, accumulated into a report (per-stage total/mean/count), JSONL
  persistable. Used by pipeline stages (embed/search/train steps).
- :func:`trace` — context manager around `jax.profiler.trace` producing
  TensorBoard-loadable XPlane traces of the compiled TPU execution.

On the tunneled axon platform `block_until_ready` can return before the
device finishes; :func:`device_sync` forces a tiny device->host transfer.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import numpy as np


def device_sync(x=None):
    """Force completion of pending device work (transfer one element)."""
    import jax

    if x is None:
        return None
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        return x
    np.asarray(leaves[0].ravel()[:1])
    return x


class StageTimer:
    def __init__(self, name: str = "pipeline", log_path: Optional[str] = None):
        self.name = name
        self.log_path = Path(log_path) if log_path else None
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, stage_name: str, sync_output=None):
        start = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            device_sync(holder.get("out", sync_output))
            elapsed = time.perf_counter() - start
            self.totals[stage_name] += elapsed
            self.counts[stage_name] += 1
            if self.log_path:
                self.log_path.parent.mkdir(parents=True, exist_ok=True)
                with open(self.log_path, "a") as f:
                    f.write(json.dumps({
                        "timer": self.name, "stage": stage_name,
                        "elapsed_s": round(elapsed, 6),
                    }) + "\n")

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            stage: {
                "total_s": round(self.totals[stage], 4),
                "count": self.counts[stage],
                "mean_s": round(self.totals[stage] / self.counts[stage], 6),
            }
            for stage in self.totals
        }

    def __str__(self):
        lines = [f"[{self.name}]"]
        for stage, row in sorted(
            self.report().items(), key=lambda kv: -kv[1]["total_s"]
        ):
            lines.append(
                f"  {stage:<30} {row['total_s']:>9.3f}s total "
                f"({row['count']}x, {row['mean_s'] * 1e3:.2f} ms/call)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """XPlane trace of everything inside the context (TensorBoard: open
    `log_dir` with the profile plugin)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TPU timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
