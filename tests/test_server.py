"""Dynamic micro-batching + HTTP serving runtime (viquae_tpu/ir/server.py)."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from viquae_tpu.ir.server import (
    BatchedAnswerService,
    BatchedRetrievalService,
    DynamicBatcher,
    make_http_server,
)


# ---------------------------------------------------------------------------
# DynamicBatcher unit behavior
# ---------------------------------------------------------------------------
def test_batcher_batches_concurrent_requests():
    calls = []

    def process(items):
        calls.append(list(items))
        time.sleep(0.02)  # dispatch latency lets the queue fill
        return [x * 10 for x in items]

    b = DynamicBatcher(process, max_batch=8, max_wait_ms=50.0)
    futures = [b.submit(i) for i in range(16)]
    results = [f.result(timeout=5) for f in futures]
    b.close()
    assert results == [i * 10 for i in range(16)]  # per-item order kept
    assert sum(len(c) for c in calls) == 16
    assert len(calls) < 16          # batching actually happened
    assert all(len(c) <= 8 for c in calls)


def test_batcher_max_wait_dispatches_partial_batch():
    b = DynamicBatcher(lambda items: items, max_batch=1000, max_wait_ms=30.0)
    start = time.monotonic()
    assert b.submit("x").result(timeout=5) == "x"
    elapsed = time.monotonic() - start
    b.close()
    assert elapsed < 2.0  # did not wait for 1000 items


def test_batcher_propagates_process_errors():
    def process(items):
        raise ValueError("boom")

    b = DynamicBatcher(process, max_batch=4, max_wait_ms=5.0)
    futures = [b.submit(i) for i in range(3)]
    for f in futures:
        with pytest.raises(ValueError, match="boom"):
            f.result(timeout=5)
    # the dispatcher survives a failing batch
    b2 = b.submit.__self__  # noqa: B018 — same object, readability
    assert b2 is b
    b.process = lambda items: items
    assert b.submit(7).result(timeout=5) == 7
    b.close()


def test_batcher_retries_transient_device_error_once():
    """One bounded re-dispatch on a TRANSIENT device error (the tunneled
    chip throws INTERNAL/RESOURCE_EXHAUSTED transiently — CLAUDE.md);
    the retry must be invisible to callers."""
    attempts = []

    def process(items):
        attempts.append(list(items))
        if len(attempts) == 1:
            raise RuntimeError("INTERNAL: TPU backend error (fresh process)")
        return [x * 10 for x in items]

    b = DynamicBatcher(process, max_batch=4, max_wait_ms=5.0,
                       retry_backoff_s=0.01)
    assert b.submit(3).result(timeout=5) == 30
    b.close()
    assert len(attempts) == 2           # failed once, retried once
    assert attempts[0] == attempts[1]   # SAME batch re-dispatched
    assert b.n_retries == 1


def test_batcher_transient_retry_is_bounded():
    """A persistently failing device still surfaces the exception after
    the bounded retry (no infinite loop)."""
    n_calls = [0]

    def process(items):
        n_calls[0] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error")

    b = DynamicBatcher(process, max_batch=4, max_wait_ms=5.0,
                       retry_transient=1, retry_backoff_s=0.01)
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        b.submit(1).result(timeout=5)
    b.close()
    assert n_calls[0] == 2  # original + exactly one retry


def test_batcher_non_transient_error_is_not_retried():
    n_calls = [0]

    def process(items):
        n_calls[0] += 1
        raise ValueError("bad collation, deterministic")

    b = DynamicBatcher(process, max_batch=4, max_wait_ms=5.0,
                       retry_backoff_s=0.01)
    with pytest.raises(ValueError, match="deterministic"):
        b.submit(1).result(timeout=5)
    b.close()
    assert n_calls[0] == 1
    assert b.n_retries == 0


def test_batcher_max_inflight_overlaps_batches():
    """max_inflight=2 runs two micro-batches concurrently (cross-batch
    pipelining); results still land on the right futures."""
    active = []
    peak = []
    lock = threading.Lock()

    def process(items):
        with lock:
            active.append(1)
            peak.append(len(active))
        time.sleep(0.05)
        with lock:
            active.pop()
        return [x * 10 for x in items]

    b = DynamicBatcher(process, max_batch=4, max_wait_ms=1.0,
                       max_inflight=2)
    futures = [b.submit(i) for i in range(32)]
    results = [f.result(timeout=10) for f in futures]
    b.close()
    assert results == [i * 10 for i in range(32)]
    assert max(peak) == 2  # genuinely overlapped, and bounded


def test_batcher_close_drains_pending():
    done = []

    def process(items):
        time.sleep(0.01)
        done.extend(items)
        return items

    b = DynamicBatcher(process, max_batch=4, max_wait_ms=1.0)
    futures = [b.submit(i) for i in range(10)]
    b.close()
    assert [f.result(timeout=1) for f in futures] == list(range(10))
    assert sorted(done) == list(range(10))
    with pytest.raises(RuntimeError):
        b.submit(99)


def test_batcher_result_count_mismatch_is_an_error():
    b = DynamicBatcher(lambda items: items[:-1] if len(items) > 1 else items,
                       max_batch=4, max_wait_ms=20.0)
    futures = [b.submit(i) for i in range(4)]
    time.sleep(0.05)
    errors = [f for f in futures if f.exception(timeout=5) is not None]
    ok = [f for f in futures if f.exception(timeout=5) is None]
    b.close()
    # either all 4 landed in one failing batch, or stragglers succeeded
    # alone — but a short result list must never silently drop requests
    assert errors, "mismatched process() output must fail the batch"
    for f in errors:
        assert "results for" in str(f.exception())
    for f in ok:
        f.result(timeout=1)


# ---------------------------------------------------------------------------
# services over real pipelines (tiny models, CPU mesh)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def retrieval_pipeline(tmp_path_factory):
    from transformers import BertTokenizerFast

    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.serving import FusedRetrievalPipeline
    from viquae_tpu.models import bert, dpr
    from viquae_tpu.ops import mips

    import jax

    tmp = tmp_path_factory.mktemp("srv")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    (tmp / "vocab.txt").write_text("\n".join(vocab))
    tokenizer = BertTokenizerFast(vocab_file=str(tmp / "vocab.txt"))

    cfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=40, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, add_pooler=False,
    ))
    params = dpr.init(jax.random.key(0), cfg)
    embedder = PackedTextEmbedder(
        dpr.make_packed_apply(cfg), params, tokenizer, row_len=16,
        batch_size=8, fixed_rows=8,
    )
    rng = np.random.default_rng(0)
    kb = rng.standard_normal((50, 16)).astype(np.float32)
    index = mips.DenseIndex(kb, mode="global")
    return FusedRetrievalPipeline(embedder, index, batch_size=8, k=5)


def test_retrieval_service_matches_direct_pipeline(retrieval_pipeline):
    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(7)]
    direct_scores, direct_idx = retrieval_pipeline.run_arrays(list(queries))

    service = BatchedRetrievalService(
        retrieval_pipeline, max_batch=8, max_wait_ms=40.0)
    results = [None] * len(queries)

    def client(i):
        results[i] = service.search(queries[i], timeout=60)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(queries))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    service.close()

    for i, got in enumerate(results):
        assert got["indices"] == direct_idx[i].tolist()
        np.testing.assert_allclose(
            got["scores"], direct_scores[i].astype(np.float64),
            rtol=1e-5, atol=1e-5,
        )
    # 7 concurrent requests into max_batch=8 should not need 7 dispatches
    assert service.batcher.n_dispatches < len(queries)


def test_answer_service_pads_and_trims():
    class StubAnswerPipeline:
        def __init__(self):
            self.calls = []

        def run(self, questions):
            self.calls.append(len(questions))
            return [{"answer": q.upper()} for q in questions]

    stub = StubAnswerPipeline()
    service = BatchedAnswerService(stub, max_batch=4, max_wait_ms=20.0)
    futures = [service.batcher.submit(q) for q in ("a", "b", "c")]
    out = [f.result(timeout=5) for f in futures]
    service.close()
    assert out == [{"answer": "A"}, {"answer": "B"}, {"answer": "C"}]
    assert all(n == 4 for n in stub.calls)  # every dispatch padded to shape


# ---------------------------------------------------------------------------
# HTTP front
# ---------------------------------------------------------------------------
def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_server_end_to_end(retrieval_pipeline):
    service = BatchedRetrievalService(
        retrieval_pipeline, max_batch=8, max_wait_ms=30.0)
    server = make_http_server(retrieval=service)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        queries = [f"w{i} w{i + 1}" for i in range(6)]
        direct_scores, direct_idx = retrieval_pipeline.run_arrays(
            list(queries))
        responses = [None] * len(queries)

        def client(i):
            responses[i] = _post(f"{base}/search", {"query": queries[i]})

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (status, body) in enumerate(responses):
            assert status == 200
            assert body["indices"] == direct_idx[i].tolist()

        status, health = _post_health(base)
        assert status == 200 and health["ok"]
        assert health["search"]["items"] == len(queries)
        assert health["search"]["dispatches"] < len(queries)

        # client-side batch endpoint coalesces into the same dispatches
        status, body = _post(f"{base}/search", {"queries": queries[:3]})
        assert status == 200
        assert [r["indices"] for r in body["results"]] == [
            direct_idx[i].tolist() for i in range(3)
        ]

        # error paths
        assert _post(f"{base}/search", {"query": ""})[0] == 400
        assert _post(f"{base}/search", {})[0] == 400
        assert _post(f"{base}/search", {"queries": []})[0] == 400
        assert _post(f"{base}/search", {"queries": ["ok", ""]})[0] == 400
        assert _post(f"{base}/search", [1, 2, 3])[0] == 400  # non-dict body
        assert _post(f"{base}/search", "queries")[0] == 400
        assert _post(f"{base}/answer", {"question": "x"})[0] == 404
        assert _post(f"{base}/nope", {})[0] == 404
    finally:
        server.shutdown()
        thread.join(timeout=5)
        service.close()


def _post_health(base):
    with urllib.request.urlopen(f"{base}/health", timeout=10) as resp:
        return resp.status, json.loads(resp.read())


def test_service_sees_concurrent_index_adds(retrieval_pipeline):
    """A DenseIndex.add() while the service is live becomes searchable —
    the traced-row-count contract under the batcher (a lagging batch may
    miss the newest rows, but a subsequent request must see them)."""
    service = BatchedRetrievalService(
        retrieval_pipeline, max_batch=8, max_wait_ms=5.0)
    try:
        index = retrieval_pipeline.index
        n_before = index.n
        service.search("w1 w2", timeout=60)  # compile/warm

        # add a row tailored to dominate a known query's embedding
        import jax.numpy as jnp

        emb = retrieval_pipeline.embed_fn
        p = emb.pack(["w7 w8 w9"])
        q = np.asarray(emb._forward(
            emb.params, jnp.asarray(p.input_ids),
            jnp.asarray(p.segment_ids), jnp.asarray(p.position_ids),
            jnp.asarray(p.cls_rows), jnp.asarray(p.cls_cols),
        ), np.float32)
        spike = q[0] * 100.0
        index.add(spike[None, :])
        out = service.search("w7 w8 w9", timeout=60)
        assert out["indices"][0] == n_before  # the new row wins top-1
    finally:
        service.close()


def test_cli_evqa_bem_scorer(tmp_path, capsys):
    """CLI `evqa --scorer bem` end-to-end with a tiny random-init BEM
    (asserting the protocol runs: EM hits short-circuit, misses go
    through the BEM forward)."""
    import json as json_lib

    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(tok_dir / "vocab.txt")).save_pretrained(
        tok_dir)

    (tmp_path / "pred.json").write_text(json_lib.dumps(
        {"q0": "w1", "q1": "w5"}))
    (tmp_path / "ref.json").write_text(json_lib.dumps({
        "q0": {"reference": "w1", "question": "what?"},   # EM short-circuit
        "q1": {"reference": "w9", "question": "which?"},  # -> BEM forward
    }))
    (tmp_path / "bem.json").write_text(json_lib.dumps({
        "tokenizer": str(tok_dir),
        "bem_config": {"bert_config": {
            "vocab_size": 40, "hidden_size": 16, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 64, "type_vocab_size": 3,
            "add_pooler": True,
        }, "max_length": 64},
    }))
    from viquae_tpu.cli import main as cli_main

    cli_main(["evqa", str(tmp_path / "pred.json"), str(tmp_path / "ref.json"),
              "--scorer", "bem", "--config", str(tmp_path / "bem.json")])
    out = json.loads(capsys.readouterr().out)
    assert out["n_evaluated"] == 2
    assert 0.5 <= out["accuracy"] <= 1.0  # q0 is an EM hit regardless of BEM


def test_cli_server_hybrid_config(tmp_path):
    """`server` with a "bm25" hybrid config routes /search through
    HybridRetrievalPipeline (dense + host BM25 + device fusion)."""
    import argparse

    from datasets import Dataset
    from transformers import BertTokenizerFast

    from viquae_tpu.cli_aux import build_server_from_config

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)
    rng = np.random.default_rng(0)
    Dataset.from_dict({
        "embedding": rng.standard_normal((30, 16)).astype(
            np.float32).tolist(),
        "passage": [f"w{i} w{i + 1} w{i + 2}" for i in range(30)],
    }).save_to_disk(str(tmp_path / "kb"))
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": {
            "vocab_size": 40, "hidden_size": 16, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 32, "add_pooler": False,
        }},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "global"},
        "bm25": {"kb": str(tmp_path / "kb"), "column": "passage",
                 "b": 0.3, "k1": 0.5},
        "weights": [0.7, 0.3],
    }
    (tmp_path / "server.json").write_text(json.dumps(config))
    args = argparse.Namespace(
        config=str(tmp_path / "server.json"), host="127.0.0.1", port=0,
        k=5, m_passages=4, max_batch=4, max_wait_ms=10.0,
    )
    server, services = build_server_from_config(args)
    from viquae_tpu.ir.serving import HybridRetrievalPipeline

    assert isinstance(services[0].pipeline, HybridRetrievalPipeline)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    try:
        status, body = _post(f"http://127.0.0.1:{port}/search",
                             {"query": "w3 w4 w5"})
        assert status == 200
        assert len(body["indices"]) == 5
        # the BM25 leg makes lexically-matching passages win
        assert 3 in body["indices"][:3]
    finally:
        server.shutdown()
        thread.join(timeout=5)
        for s in services:
            s.close()


def test_vqa_service_http_end_to_end(tmp_path):
    """(question, image) -> answer over HTTP: MultiIndex retrieval with an
    ONLINE image tower feeding the reader, base64 image payloads, parity
    vs the direct pipeline."""
    import base64
    import io

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from transformers import BertTokenizerFast

    from viquae_tpu.image.embedding import ImageEmbedder
    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.qa_serving import AnswerPipeline
    from viquae_tpu.ir.server import BatchedVQAService
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.models import bert, dpr, qa
    from viquae_tpu.ops import mips

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [f"w{i}" for i in range(60)])
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(tok_dir / "vocab.txt"))

    bcfg = bert.BertConfig(
        vocab_size=80, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=64, add_pooler=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    dcfg = dpr.DPRConfig(bert=bcfg)
    d_params = dpr.init(jax.random.key(0), dcfg)
    rcfg = qa.ReaderConfig(bert=bcfg)
    r_params = qa.init(jax.random.key(1), rcfg)

    rng = np.random.default_rng(0)
    kb_rows = [
        {"passage": " ".join(
            f"w{j}" for j in rng.integers(0, 60, rng.integers(8, 16)))}
        for _ in range(40)
    ]
    kb_text = rng.normal(size=(40, 16)).astype(np.float32)
    kb_img = rng.normal(size=(40, 6)).astype(np.float32)

    w_img = rng.normal(size=(3, 6)).astype(np.float32)
    img_enc = ImageEmbedder(
        lambda p, px: px.mean(axis=(1, 2)) @ p["w"],
        {"w": jnp.asarray(w_img)}, save_as="e", image_size=8,
        preprocessing="clip", batch_size=4,
    )

    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=16, batch_size=4,
                             compute_dtype=jnp.float32)
    retrieval = MultiIndexRetrievalPipeline(
        emb,
        {"dpr": mips.DenseIndex(kb_text, mode="global", dtype=jnp.float32),
         "img": mips.DenseIndex(kb_img, mode="global", dtype=jnp.float32)},
        {"dpr": 0.6, "img": 0.4}, text_index="dpr",
        batch_size=4, k=2, norm="zmuv", compact_transfer=False,
        image_encoders={"img": img_enc},
    )
    pipe = AnswerPipeline(retrieval, kb_rows, rcfg, r_params, tok,
                          m_passages=2, reader_seq=32,
                          questions_per_step=4,
                          compute_dtype=jnp.float32)

    questions = ["w1 w2 w3", "w9 w8", "w20 w21 w22"]
    images = [
        Image.fromarray(rng.integers(0, 255, (12, 12, 3), dtype=np.uint8),
                        "RGB")
        for _ in questions
    ]
    direct = pipe.run(list(questions),
                      query_images={"img": list(images)})

    service = BatchedVQAService(pipe, ["img"], max_batch=4,
                                max_wait_ms=30.0)
    server = make_http_server(vqa=service)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        responses = [None] * len(questions)

        def client(i):
            buf = io.BytesIO()
            images[i].save(buf, format="PNG")
            responses[i] = _post(f"{base}/answer", {
                "question": questions[i],
                "image_b64": base64.b64encode(buf.getvalue()).decode(),
            })

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(questions))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (status, body) in enumerate(responses):
            assert status == 200
            assert body["answer"] == direct[i]["answer"]
            assert body["passage_ids"] == list(direct[i]["passage_ids"])

        # a question WITHOUT an image still answers (None-masked img leg)
        status, body = _post(f"{base}/answer", {"question": "w5 w6"})
        assert status == 200 and body["answer"] is not None

        # the text-only batch form works on a fusion server too
        status, body = _post(f"{base}/answer",
                             {"questions": ["w5 w6", "w9 w8"]})
        assert status == 200 and len(body["results"]) == 2
        assert all(r["answer"] is not None for r in body["results"])

        # bad image payloads are client errors
        status, body = _post(f"{base}/answer", {
            "question": "w1", "image_b64": "not base64!!"})
        assert status == 400
        status, body = _post(f"{base}/answer", {
            "question": "w1", "images_b64": {"nope": "x"}})
        assert status == 400 and "unknown image index" in body["error"]
    finally:
        server.shutdown()
        thread.join(timeout=5)
        service.close()


def test_cli_server_vqa_config(tmp_path):
    """A fusion server config (indexes + online image/face encoders +
    reader) builds the full pixels-in KVQA service from the CLI schema
    and answers (question, image) posts."""
    import argparse
    import base64
    import io

    from datasets import Dataset
    from PIL import Image
    from transformers import BertTokenizerFast

    from viquae_tpu.cli_aux import build_server_from_config

    rng = np.random.default_rng(0)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    n_docs = 20
    Dataset.from_dict({
        "embedding": rng.standard_normal((n_docs, 16)).astype(
            np.float32).tolist(),
        "clip": rng.standard_normal((n_docs, 8)).astype(
            np.float32).tolist(),
        "face": rng.standard_normal((n_docs, 12)).astype(
            np.float32).tolist(),
        "passage": [f"w{i} w{i + 1} w{i + 2} w{i + 3}"
                    for i in range(n_docs)],
    }).save_to_disk(str(tmp_path / "kb"))

    kb = str(tmp_path / "kb")
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": {
            "vocab_size": 40, "hidden_size": 16, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 32, "add_pooler": False,
        }},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "indexes": {
            "dpr": {"dataset": kb, "column": "embedding",
                    "mode": "global"},
            "clip": {"dataset": kb, "column": "clip", "mode": "global",
                     "do_l2norm": True},
            "face": {"dataset": kb, "column": "face", "mode": "global",
                     "do_l2norm": True},
        },
        "weights": {"dpr": 0.6, "clip": 0.2, "face": 0.2},
        "text_index": "dpr",
        "norm": "zmuv",
        "image_encoders": {
            "clip": {"model": "clip-vit", "model_config": {
                "hidden_size": 16, "num_layers": 1, "num_heads": 2,
                "intermediate_size": 32, "image_size": 32,
                "patch_size": 16, "projection_dim": 8,
            }, "image_size": 32},
        },
        "face_encoders": {
            "face": {"mtcnn": {"canvas": 128, "min_face_size": 40,
                               "max_faces": 2, "k_per_scale": 8,
                               "k_stage1": 16, "k_stage2": 8,
                               "thresholds": [0.0, 0.0, 0.0]},
                     "arcface": {"stage_sizes": [1, 1, 1, 1], "width": 8,
                                 "embedding_size": 12}},
        },
        "reader": {"class_name": "MultiPassageBERTReader",
                   "bert_config": {
                       "vocab_size": 40, "hidden_size": 16,
                       "num_hidden_layers": 1, "num_attention_heads": 2,
                       "intermediate_size": 32,
                       "max_position_embeddings": 64,
                       "add_pooler": False}},
        "passages": kb,
        "reader_seq": 32,
        "questions_per_step": 4,
    }
    (tmp_path / "vqa.json").write_text(json.dumps(config))
    args = argparse.Namespace(
        config=str(tmp_path / "vqa.json"), host="127.0.0.1", port=0,
        k=5, m_passages=2, max_batch=4, max_wait_ms=15.0,
    )
    server, services = build_server_from_config(args)
    from viquae_tpu.ir.server import BatchedVQAService

    assert isinstance(services[0], BatchedVQAService)
    assert services[0].image_index_names == ["clip", "face"]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
                        "RGB").save(buf, format="PNG")
        status, body = _post(f"{base}/answer", {
            "question": "w1 w2 w3",
            "image_b64": base64.b64encode(buf.getvalue()).decode(),
        })
        assert status == 200
        assert body["answer"] is not None
        assert len(body["passage_ids"]) == 2

        # text-only question rides the same service (image legs masked)
        status, body = _post(f"{base}/answer", {"question": "w7 w8"})
        assert status == 200 and body["answer"] is not None
    finally:
        server.shutdown()
        thread.join(timeout=5)
        for s in services:
            s.close()


def test_cli_server_subprocess(tmp_path):
    """`viquae_tpu server` end-to-end over a real socket in a fresh
    process (the deployment shape)."""
    import os
    import subprocess
    import sys

    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)
    rng = np.random.default_rng(0)
    Dataset.from_dict({
        "embedding": rng.standard_normal((40, 16)).astype(
            np.float32).tolist(),
    }).save_to_disk(str(tmp_path / "kb"))
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": {
            "vocab_size": 40, "hidden_size": 16, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 32, "add_pooler": False,
        }},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "global"},
    }
    (tmp_path / "server.json").write_text(json.dumps(config))

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu'); "
         "from viquae_tpu.cli import main; main()",
         "server", str(tmp_path / "server.json"),
         "--port", "0", "--k", "3", "--max-batch", "4",
         "--max-wait-ms", "20"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        info = json.loads(line)
        base = info["listening"]
        status, body = _post(f"{base}/search", {"query": "w1 w2 w3"})
        assert status == 200
        assert len(body["indices"]) == 3
        status, health = _post_health(base)
        assert status == 200 and health["ok"]
        assert health["search"]["items"] == 1
    finally:
        proc.terminate()
        proc.wait(timeout=10)
