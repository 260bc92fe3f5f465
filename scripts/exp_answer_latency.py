"""Interactive QA latency: one (question) -> answer through the full loop
(packed embed -> exact 1.5M retrieval -> top-24 passage fetch -> packed
reader -> span), single-request p50/p99 plus the micro-batched service
under concurrency. The reference's interactive path never produced an
answer at all (reader TODO, meerqat/interact/system.py:42).

Run: python scripts/exp_answer_latency.py  (one TPU process at a time)
"""
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    deadline = threading.Timer(600, lambda: (
        print("backend init exceeded 600s; exiting", file=sys.stderr),
        os._exit(3)))
    deadline.daemon = True
    deadline.start()
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.devices()
    deadline.cancel()
    import jax.numpy as jnp

    from transformers import BertTokenizerFast

    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.qa_serving import AnswerPipeline
    from viquae_tpu.ir.server import BatchedAnswerService
    from viquae_tpu.ir.serving import FusedRetrievalPipeline
    from viquae_tpu.models import bert, dpr, qa
    from viquae_tpu.ops import mips

    n_kb, dim = 1_500_000, 768
    M, reader_seq = 24, 256
    SERVICE_BATCH = 64

    with tempfile.TemporaryDirectory() as td:
        vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                 + [f"w{i}" for i in range(20000)])
        vpath = os.path.join(td, "vocab.txt")
        with open(vpath, "w") as f:
            f.write("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=vpath, do_lower_case=True)

    bcfg = bert.BertConfig(add_pooler=False)
    dcfg = dpr.DPRConfig(bert=bcfg)
    key = jax.random.key(0)
    to16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16), t)
    d_params = to16(dpr.init(jax.random.fold_in(key, 0), dcfg))
    rcfg = qa.ReaderConfig(bert=bcfg)
    r_params = to16(qa.init(jax.random.fold_in(key, 1), rcfg))

    kb_mat = jax.random.normal(
        jax.random.fold_in(key, 2), (dim, n_kb + ((-n_kb) % 512)),
        jnp.bfloat16) / np.sqrt(dim)
    index = mips.DenseIndex(np.zeros((1, dim), np.float32), mode="fused")
    index.matrix, index.n, index.dtype = kb_mat, n_kb, jnp.bfloat16

    class LazyKB:
        def __len__(self):
            return n_kb

        def __getitem__(self, i):
            r = np.random.default_rng(int(i))
            return {"passage_tokens": (r.integers(0, 20000, 97) + 5)}

    rng = np.random.default_rng(0)

    def make_question():
        w = int(np.clip(np.round(rng.lognormal(np.log(16.0), 0.35)), 6, 60))
        return " ".join(f"w{j}" for j in rng.integers(0, 20000, w))

    def build_pipe(batch, fixed_rows, packed_rows):
        emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                                 row_len=64, batch_size=batch,
                                 compute_dtype=jnp.bfloat16,
                                 fixed_rows=fixed_rows)
        retrieval = FusedRetrievalPipeline(emb, index, batch_size=batch, k=M)
        return AnswerPipeline(retrieval, LazyKB(), rcfg, r_params, tok,
                              m_passages=M, reader_seq=reader_seq,
                              passage_tokens_key="passage_tokens",
                              questions_per_step=batch,
                              packed_reader=True, packed_rows=packed_rows)

    # ---- single-question latency (the interactive-user number): a
    # dedicated pipeline pinned to INTERACTIVE shapes — 8-row query canvas,
    # 16-row reader canvas (24 pairs x ~121 tokens) — because an
    # interactive deployment compiles for its own batch=1 program, not the
    # throughput service's 768-row canvas
    pipe1 = build_pipe(1, fixed_rows=8, packed_rows=16)
    pipe1.run([make_question()])          # compile
    pipe1.run([make_question()])          # warm
    lat = []
    for _ in range(20):
        q = make_question()
        t0 = time.perf_counter()
        out = pipe1.run([q])
        lat.append((time.perf_counter() - t0) * 1e3)
        assert out[0]["answer"] is not None
    lat = np.sort(lat)
    single = {"p50_ms": round(float(np.percentile(lat, 50)), 1),
              "p99_ms": round(float(np.percentile(lat, 99)), 1),
              "min_ms": round(float(lat[0]), 1)}
    print(json.dumps({"single_question": single}), flush=True)

    # ---- micro-batched service under concurrency ----
    pipe = build_pipe(SERVICE_BATCH, fixed_rows=64, packed_rows=768)
    service = BatchedAnswerService(pipe, max_batch=SERVICE_BATCH,
                                   max_wait_ms=10.0)
    service.answer(make_question(), timeout=1200)  # compile padded shape
    results = {}
    for concurrency, per_client in ((16, 4), (64, 4), (256, 2)):
        latencies = []
        lock = threading.Lock()

        def client(cid):
            local = []
            for _ in range(per_client):
                t0 = time.perf_counter()
                service.answer(make_question(), timeout=600)
                local.append(time.perf_counter() - t0)
            with lock:
                latencies.extend(local)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(concurrency)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        arr = np.sort(np.asarray(latencies))
        row = {"concurrency": concurrency,
               "p50_ms": round(float(np.percentile(arr, 50)) * 1e3, 1),
               "p99_ms": round(float(np.percentile(arr, 99)) * 1e3, 1),
               "answers_per_s": round(len(arr) / wall, 1)}
        results[concurrency] = row
        print(json.dumps(row), flush=True)
    service.close()
    print(json.dumps({"single_question": single, "service": results},
                     indent=1))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — transient chip errors
        print(f"retry after {e!r}", file=sys.stderr)
        main()
