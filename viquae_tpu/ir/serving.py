"""Streaming retrieval service (the production-serving entry).

The reference's online path handles one query at a time
(meerqat/interact/system.py); batch retrieval re-runs dataset.map. This
module is the deployment-shaped loop, built so the DEVICE is the only
critical path:

- host tokenization + packing runs in a prefetch thread (batch i+1
  tokenizes while batch i computes — JAX dispatch is async),
- embeddings stay on device between embed and search (no host roundtrip),
- search results are drained LAGGED: the np.asarray sync + ranx-run dict
  building for batch i happens while the device computes batch i+1
  (`DenseIndex.search_batch(sync=False)`),
- per-stage timings come from core.profiling.StageTimer.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from viquae_tpu.core.profiling import StageTimer
from viquae_tpu.rankeval import Run
from viquae_tpu.train.prefetch import PrefetchIterable


class RetrievalPipeline:
    """embed -> MIPS search, pipelined over a query stream.

    Parameters
    ----------
    embed_fn: callable(list[str]) -> device array (B, d) — typically an
        ir.embedding.PackedTextEmbedder (tokenize + pack on host, dispatch
        the jitted packed forward WITHOUT syncing).
    index: ops.mips.DenseIndex (or anything with search_batch).
    batch_size: fixed serving batch (XLA static shapes).
    """

    def __init__(self, embed_fn: Callable, index, batch_size: int = 1280,
                 k: int = 100, timer: Optional[StageTimer] = None):
        self.embed_fn = embed_fn
        self.index = index
        self.batch_size = batch_size
        self.k = k
        self.timer = timer or StageTimer("retrieval")

    def _batches(self, queries: List[str]):
        for start in range(0, len(queries), self.batch_size):
            yield start, queries[start: start + self.batch_size]

    def run_arrays(self, queries: List[str]
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Retrieve for all queries; returns (scores, indices) numpy arrays
        of shape (len(queries), k) in input order — the raw deployment
        contract (no per-query dict materialization)."""
        n = len(queries)
        scores_out = np.empty((n, self.k), np.float32)
        idx_out = np.empty((n, self.k), np.int64)

        def tokenized_stream():
            for start, chunk in self._batches(queries):
                with self.timer.stage("tokenize+embed_dispatch"):
                    embeddings = self.embed_fn(list(chunk))
                yield start, len(chunk), embeddings

        pending: deque = deque()

        def drain():
            start, n_real, scores, indices = pending.popleft()
            with self.timer.stage("drain_to_host"):
                scores_out[start: start + n_real] = np.asarray(
                    scores
                )[:n_real]
                idx_out[start: start + n_real] = np.asarray(indices)[:n_real]

        for start, n_real, embeddings in PrefetchIterable(
            tokenized_stream(), buffer_size=2
        ):
            with self.timer.stage("search_dispatch"):
                # device arrays pass straight through; sync=False keeps the
                # results on device so this returns at dispatch time
                scores, indices = self.index.search_batch(
                    embeddings, k=self.k, sync=False
                )
            pending.append((start, n_real, scores, indices))
            if len(pending) > 1:
                drain()  # batch i-1 syncs while batch i computes
        while pending:
            drain()
        return scores_out, idx_out

    def run(self, query_ids: List[str], queries: List[str]) -> Run:
        """Retrieve for all queries; returns a rankeval Run."""
        assert len(query_ids) == len(queries)
        scores, indices = self.run_arrays(queries)
        with self.timer.stage("build_run"):
            results: Dict[str, Dict[str, float]] = {}
            for row, q_id in enumerate(query_ids):
                results[q_id] = {
                    str(d): float(s)
                    for s, d in zip(scores[row], indices[row])
                }
        return Run(results, name="serving")

    def report(self) -> dict:
        return self.timer.report()
