"""Online serving runtime: dynamic micro-batching + a JSON-over-HTTP front.

The reference's only online surface is a stdin loop that embeds and searches
ONE query at a time and never prints results or runs the reader
(meerqat/interact/system.py:24-73). On TPU, per-query dispatch wastes the
MXU — the chip's serving sweet spot is a large packed batch (bench.py:
10k+ q/s at batch 1280 vs ~100 q/s at batch 1 over the tunneled link). The
production-shaped answer is DYNAMIC BATCHING: concurrent requests queue,
a dispatcher collects up to `max_batch` of them (or waits at most
`max_wait_ms` after the first), pads the batch to ONE compiled shape, runs
the single-dispatch pipeline, and resolves each request's future.

Components:
- :class:`DynamicBatcher` — generic request queue + dispatcher thread over
  a `process(items) -> results` callable. Padding to a fixed batch is the
  processor's job (shape stability is what keeps XLA from recompiling:
  a fresh canvas shape costs MINUTES of compile on the tunneled chip).
- :class:`BatchedRetrievalService` / :class:`BatchedAnswerService` —
  adapters over `ir.serving.RetrievalPipeline.run_arrays` and
  `ir.qa_serving.AnswerPipeline.run` with fixed-shape padding.
- :func:`make_http_server` — stdlib ThreadingHTTPServer exposing
  POST /search, POST /answer, GET /health. No web-framework dependency.
"""
from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeoutError
from typing import Callable, List, Optional, Sequence

import numpy as np

_SHUTDOWN = object()

# error strings the tunneled chip throws TRANSIENTLY (CLAUDE.md: INTERNAL
# on fresh processes, RESOURCE_EXHAUSTED while free HBM fluctuates); the
# jitted pipelines are pure, so one re-dispatch of the same batch is safe
TRANSIENT_ERROR_MARKERS = (
    "RESOURCE_EXHAUSTED", "ResourceExhausted", "INTERNAL", "UNAVAILABLE",
    "ABORTED",
)


def is_transient_device_error(e: BaseException) -> bool:
    r = repr(e)
    return any(m in r for m in TRANSIENT_ERROR_MARKERS)


class DynamicBatcher:
    """Queue requests; dispatch them through `process` in micro-batches.

    process(items: list) -> list of per-item results (same order/length).
    A batch is dispatched when `max_batch` items are pending, or
    `max_wait_ms` after the FIRST pending item arrived — the classic
    latency/throughput knob. Results (or the batch's exception) resolve
    each item's Future.
    """

    def __init__(self, process: Callable[[List], List],
                 max_batch: int = 64, max_wait_ms: float = 10.0,
                 name: str = "batcher", max_inflight: int = 1,
                 retry_transient: int = 1,
                 retry_backoff_s: float = 0.5):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        if max_inflight < 1:
            raise ValueError(
                f"max_inflight must be >= 1, got {max_inflight}")
        self.process = process
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # bounded retry of a failed dispatch on TRANSIENT device errors
        # (same compiled fn, fresh arrays rebuilt by process()) before the
        # exception reaches callers — bench.py has had this robustness for
        # two rounds; the serving path gets the same
        self.retry_transient = retry_transient
        self.retry_backoff_s = retry_backoff_s
        self.n_dispatches = 0
        self.n_items = 0
        self.n_retries = 0
        self._queue: queue.Queue = queue.Queue()
        # >1 overlaps micro-batches: while batch n's device work drains,
        # batch n+1 tokenizes/packs/dispatches — the cross-batch pipelining
        # a single pipeline.run() gets internally. process() must be
        # re-entrant (the jitted pipelines are).
        self._inflight = threading.Semaphore(max_inflight)
        self._stats_lock = threading.Lock()
        self._close_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name=f"viquae-{name}")
        self._closed = False
        self._workers: List[threading.Thread] = []
        self._thread.start()

    def submit(self, item) -> Future:
        future: Future = Future()
        # the lock closes the check-then-enqueue race with close(): without
        # it an item could land BEHIND the shutdown sentinel and its future
        # would never resolve
        with self._close_lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._queue.put((item, future))
        return future

    def __call__(self, item, timeout: Optional[float] = None):
        """Blocking convenience: submit + wait."""
        return self.submit(item).result(timeout=timeout)

    def close(self):
        """Drain pending work, then stop the dispatcher thread."""
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_SHUTDOWN)
        self._thread.join()
        for worker in list(self._workers):
            worker.join()

    def _collect(self) -> Optional[List]:
        """Block for the first item, then batch up to max_batch or until
        max_wait_ms passes."""
        first = self._queue.get()
        if first is _SHUTDOWN:
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is _SHUTDOWN:
                # re-enqueue so the loop exits after this batch resolves
                self._queue.put(_SHUTDOWN)
                break
            batch.append(item)
        return batch

    def _process_with_retry(self, items):
        attempt = 0
        while True:
            try:
                return self.process(items)
            except Exception as e:  # noqa: BLE001
                if (attempt >= self.retry_transient
                        or not is_transient_device_error(e)):
                    raise
                attempt += 1
                with self._stats_lock:
                    self.n_retries += 1
                time.sleep(self.retry_backoff_s)

    def _run_batch(self, batch):
        items = [item for item, _ in batch]
        futures = [future for _, future in batch]
        try:
            try:
                results = self._process_with_retry(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"process returned {len(results)} results for "
                        f"{len(items)} items"
                    )
            except BaseException as e:  # noqa: BLE001 — deliver to callers
                for future in futures:
                    future.set_exception(e)
                return
            with self._stats_lock:
                self.n_dispatches += 1
                self.n_items += len(items)
            for future, result in zip(futures, results):
                future.set_result(result)
        finally:
            self._inflight.release()

    def _loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            self._inflight.acquire()
            worker = threading.Thread(
                target=self._run_batch, args=(batch,), daemon=True,
                name=f"{self._thread.name}-run")
            self._workers.append(worker)
            self._workers = [w for w in self._workers if w.is_alive()
                             or w is worker]
            worker.start()


def _pad_queries(queries: Sequence[str], max_batch: int) -> List[str]:
    """Pad to the pinned dispatch width with empty queries ([CLS][SEP]
    rows) so every dispatch reuses ONE compiled program."""
    return list(queries) + [""] * (max_batch - len(queries))


class BatchedRetrievalService:
    """DynamicBatcher over a retrieval pipeline: query str -> top-k hits.

    Every dispatch is padded to `batcher.max_batch` queries; combined with
    a `fixed_rows`-pinned PackedTextEmbedder this keeps the whole serving
    path on one compiled shape.
    """

    def __init__(self, pipeline, max_batch: int = 64,
                 max_wait_ms: float = 10.0, max_inflight: int = 1):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batcher = DynamicBatcher(
            self._process, max_batch=max_batch, max_wait_ms=max_wait_ms,
            name="retrieval", max_inflight=max_inflight,
        )

    def _process(self, queries: List[str]) -> List[dict]:
        n = len(queries)
        scores, indices = self.pipeline.run_arrays(
            _pad_queries(queries, self.max_batch))
        return [
            {"indices": indices[i].tolist(),
             "scores": np.asarray(scores[i], np.float64).tolist()}
            for i in range(n)
        ]

    def search(self, query: str, timeout: Optional[float] = None) -> dict:
        return self.batcher(query, timeout=timeout)

    def search_many(self, queries: Sequence[str],
                    timeout: Optional[float] = None) -> List[dict]:
        """Submit a client-side batch; the requests coalesce into the same
        micro-batches as everyone else's."""
        futures = [self.batcher.submit(q) for q in queries]
        return [f.result(timeout=timeout) for f in futures]

    def close(self):
        self.batcher.close()


class BatchedAnswerService:
    """DynamicBatcher over ir.qa_serving.AnswerPipeline: question -> answer."""

    def __init__(self, pipeline, max_batch: int = 64,
                 max_wait_ms: float = 25.0, max_inflight: int = 1):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batcher = DynamicBatcher(
            self._process, max_batch=max_batch, max_wait_ms=max_wait_ms,
            name="answer", max_inflight=max_inflight,
        )

    def _process(self, questions: List[str]) -> List[dict]:
        n = len(questions)
        results = self.pipeline.run(_pad_queries(questions, self.max_batch))
        return results[:n]

    def answer(self, question: str, timeout: Optional[float] = None) -> dict:
        return self.batcher(question, timeout=timeout)

    def answer_many(self, questions: Sequence[str],
                    timeout: Optional[float] = None) -> List[dict]:
        futures = [self.batcher.submit(q) for q in questions]
        return [f.result(timeout=timeout) for f in futures]

    def close(self):
        self.batcher.close()


class BatchedVQAService:
    """(question, raw image) -> answer: the full KVQA loop online.

    Wraps an `ir.qa_serving.AnswerPipeline` whose retrieval is a
    `MultiIndexRetrievalPipeline` with online image/face encoders
    (`image_encoders`/`face_encoders`) — the towers run INSIDE the fused
    per-batch programs, nothing precomputed. Items are
    ``(question, {index_name: PIL.Image or None})``; questions without an
    image are absent from that index's leg (None-masking, the reference's
    search_batch_if_not_None semantics). The reference never finished this
    path at all (meerqat/interact/system.py:42).
    """

    def __init__(self, pipeline, image_index_names: Sequence[str],
                 max_batch: int = 64, max_wait_ms: float = 25.0,
                 max_inflight: int = 1):
        self.pipeline = pipeline
        self.image_index_names = list(image_index_names)
        self.max_batch = max_batch
        self.batcher = DynamicBatcher(
            self._process, max_batch=max_batch, max_wait_ms=max_wait_ms,
            name="vqa", max_inflight=max_inflight,
        )

    def _process(self, items: List) -> List[dict]:
        n = len(items)
        pad = self.max_batch - n
        questions = [q for q, _ in items] + [""] * pad
        query_images = {
            name: [images.get(name) for _, images in items] + [None] * pad
            for name in self.image_index_names
        }
        results = self.pipeline.run(questions, query_images=query_images)
        return results[:n]

    def answer(self, question: str, images: Optional[dict] = None,
               timeout: Optional[float] = None) -> dict:
        return self.batcher((question, images or {}), timeout=timeout)

    def close(self):
        self.batcher.close()


def _decode_image_payload(payload, image_index_names):
    """{"image_b64": ...} (routed to every image index) or
    {"images_b64": {index_name: ...}} -> {index_name: PIL.Image}."""
    import base64
    import io

    from PIL import Image

    def decode(b64):
        try:
            return Image.open(
                io.BytesIO(base64.b64decode(b64))).convert("RGB")
        except Exception as e:  # noqa: BLE001 — client error, not a 500
            raise ValueError(f"undecodable image payload: {e}") from e

    if "images_b64" in payload:
        named = payload["images_b64"]
        unknown = set(named) - set(image_index_names)
        if unknown:
            raise ValueError(f"unknown image index names {sorted(unknown)}; "
                             f"configured: {image_index_names}")
        return {name: decode(b64) for name, b64 in named.items()}
    if "image_b64" in payload:
        image = decode(payload["image_b64"])
        return {name: image for name in image_index_names}
    return {}


# ---------------------------------------------------------------------------
# HTTP front (stdlib only)
# ---------------------------------------------------------------------------
def make_http_server(host: str = "127.0.0.1", port: int = 0,
                     retrieval=None, answerer=None, vqa=None,
                     request_timeout_s: float = 600.0):
    """ThreadingHTTPServer over the batched services.

    POST /search {"query": str}   -> {"indices": [...], "scores": [...]}
    POST /search {"queries": [..]}-> {"results": [per-query dicts]}
    POST /answer {"question": str}-> {"answer": str, ...}
    POST /answer {"questions": [..]} -> {"results": [...]}
    POST /answer {"question": str, "image_b64": ... |
                  "images_b64": {index: ...}} -> {"answer": str, ...}
                  (vqa service: base64 JPEG/PNG query image(s))
    GET  /health                  -> {"ok": true, dispatch stats}

    Returns the server object; run `.serve_forever()` (typically in a
    thread) and `.shutdown()` to stop. `port=0` picks a free port
    (`server.server_address[1]`).
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, status: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path != "/health":
                return self._reply(404, {"error": "unknown path"})
            stats = {}
            for name, service in (("search", retrieval),
                                  ("answer", answerer), ("vqa", vqa)):
                if service is not None:
                    stats[name] = {
                        "dispatches": service.batcher.n_dispatches,
                        "items": service.batcher.n_items,
                        "transient_retries": service.batcher.n_retries,
                    }
            return self._reply(200, {"ok": True, **stats})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._reply(400, {"error": "invalid JSON body"})
            if not isinstance(payload, dict):
                # a JSON list/string body would otherwise surface as a
                # confusing 500 (substring 'in' checks, .get attribute
                # errors) — it is a client error
                return self._reply(400, {"error": "body must be a JSON "
                                                  "object"})
            try:
                if self.path == "/search":
                    if retrieval is None:
                        return self._reply(404, {"error": "no retrieval "
                                                          "service"})
                    if "queries" in payload:
                        queries = payload["queries"]
                        if (not isinstance(queries, list) or not queries
                                or not all(isinstance(q, str) and q.strip()
                                           for q in queries)):
                            return self._reply(400, {
                                "error": "'queries' must be a non-empty "
                                         "list of non-empty strings"})
                        return self._reply(
                            200, {"results": retrieval.search_many(
                                queries, timeout=request_timeout_s)})
                    query = payload.get("query", "")
                    if not isinstance(query, str) or not query.strip():
                        return self._reply(400, {"error": "need a "
                                                          "non-empty 'query'"})
                    return self._reply(200, retrieval.search(
                        query, timeout=request_timeout_s))
                if self.path == "/answer":
                    if vqa is not None:
                        if "questions" in payload:
                            # text-only batch form works on a fusion
                            # server too (image legs None-masked)
                            questions = payload["questions"]
                            if (not isinstance(questions, list)
                                    or not questions
                                    or not all(isinstance(q, str)
                                               and q.strip()
                                               for q in questions)):
                                return self._reply(400, {
                                    "error": "'questions' must be a "
                                             "non-empty list of non-empty "
                                             "strings"})
                            futures = [vqa.batcher.submit((q, {}))
                                       for q in questions]
                            return self._reply(200, {"results": [
                                f.result(timeout=request_timeout_s)
                                for f in futures
                            ]})
                        question = payload.get("question", "")
                        if (not isinstance(question, str)
                                or not question.strip()):
                            return self._reply(
                                400,
                                {"error": "need a non-empty 'question'"})
                        try:
                            images = _decode_image_payload(
                                payload, vqa.image_index_names)
                        except ValueError as e:
                            return self._reply(400, {"error": str(e)})
                        return self._reply(
                            200, vqa.answer(question, images,
                                            timeout=request_timeout_s))
                    if answerer is None:
                        return self._reply(404, {"error": "no answer "
                                                          "service"})
                    if "questions" in payload:
                        questions = payload["questions"]
                        if (not isinstance(questions, list) or not questions
                                or not all(isinstance(q, str) and q.strip()
                                           for q in questions)):
                            return self._reply(400, {
                                "error": "'questions' must be a non-empty "
                                         "list of non-empty strings"})
                        return self._reply(
                            200, {"results": answerer.answer_many(
                                questions, timeout=request_timeout_s)})
                    question = payload.get("question", "")
                    if not isinstance(question, str) or not question.strip():
                        return self._reply(
                            400, {"error": "need a non-empty 'question'"})
                    return self._reply(200, answerer.answer(
                        question, timeout=request_timeout_s))
                return self._reply(404, {"error": "unknown path"})
            except FuturesTimeoutError:
                # a hung device dispatch (the tunnel CAN hang a dispatch
                # indefinitely) must surface as a gateway timeout, not
                # wedge every request thread forever
                return self._reply(504, {
                    "error": f"request exceeded {request_timeout_s:.0f}s"})
            except Exception as e:  # noqa: BLE001 — report, don't kill the server
                return self._reply(500, {"error": repr(e)})

    return ThreadingHTTPServer((host, port), Handler)
