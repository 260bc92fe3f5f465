"""Streaming retrieval service (the production-serving entry).

The reference's online path handles one query at a time
(meerqat/interact/system.py); batch retrieval re-runs dataset.map. This
module is the deployment-shaped loop: indexes stay device-resident, query
batches stream through a host-side prefetch thread (tokenization overlaps
device compute — JAX dispatch is async, so the embed+search of batch i
executes while batch i+1 tokenizes), and per-stage timings come from
core.profiling.StageTimer.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from viquae_tpu.core.profiling import StageTimer, device_sync
from viquae_tpu.rankeval import Run
from viquae_tpu.train.prefetch import PrefetchIterable


class RetrievalPipeline:
    """embed -> MIPS search, pipelined over a query stream.

    Parameters
    ----------
    embed_fn: callable(list[str]) -> device array (B, d) — typically a
        TextEmbedder-backed closure that tokenizes on host and dispatches
        the jitted forward WITHOUT syncing.
    index: ops.mips.DenseIndex (or anything with search_batch).
    batch_size: fixed serving batch (XLA static shapes).
    """

    def __init__(self, embed_fn: Callable, index, batch_size: int = 256,
                 k: int = 100, timer: Optional[StageTimer] = None):
        self.embed_fn = embed_fn
        self.index = index
        self.batch_size = batch_size
        self.k = k
        self.timer = timer or StageTimer("retrieval")

    def _batches(self, queries: List[str]) -> Iterator[Tuple[int, List[str]]]:
        for start in range(0, len(queries), self.batch_size):
            yield start, queries[start: start + self.batch_size]

    def run(self, query_ids: List[str], queries: List[str]) -> Run:
        """Retrieve for all queries; returns a rankeval Run."""
        assert len(query_ids) == len(queries)

        def tokenized_stream():
            for start, chunk in self._batches(queries):
                # pad the final batch to the compiled shape
                pad = self.batch_size - len(chunk)
                padded = list(chunk) + [""] * pad
                with self.timer.stage("embed_dispatch"):
                    embeddings = self.embed_fn(padded)
                yield start, len(chunk), embeddings

        results: Dict[str, Dict[str, float]] = {}
        for start, n_real, embeddings in PrefetchIterable(
            tokenized_stream(), buffer_size=2
        ):
            with self.timer.stage("search"):
                # pass the device array straight through — pulling it to host
                # first costs a device->host->device roundtrip per batch
                scores, indices = self.index.search_batch(
                    embeddings, k=self.k
                )
            for row in range(n_real):
                q_id = query_ids[start + row]
                results[q_id] = {
                    str(d): float(s)
                    for s, d in zip(scores[row], indices[row])
                }
        return Run(results, name="serving")

    def report(self) -> dict:
        return self.timer.report()
