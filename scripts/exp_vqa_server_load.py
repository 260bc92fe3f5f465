"""Online KVQA serving under concurrency: (question, raw image) requests
through BatchedVQAService — MTCNN->align->ArcFace + CLIP ViT + packed DPR
run ONLINE per micro-batch, 3-index device fusion (dpr 1.5Mx768 exact +
clip 1.5Mx512 + face 506kx512), packed reader. The service-level
counterpart of exp_pixels_answer.py's batch protocol (36.8 answers/s).

Run: python scripts/exp_vqa_server_load.py  (one TPU process at a time)
"""
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TokenKB:
    def __init__(self, tokens):
        self.tokens = tokens

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, i):
        return {"passage_tokens": self.tokens[i]}


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
    from PIL import Image
    from transformers import BertTokenizerFast

    from viquae_tpu.image.embedding import ImageEmbedder
    from viquae_tpu.image.face_recognition import FaceQueryEncoder
    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.qa_serving import AnswerPipeline
    from viquae_tpu.ir.server import BatchedVQAService
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.models import arcface, bert, clip as clip_lib, dpr, \
        mtcnn, qa
    from viquae_tpu.ops import mips

    BATCH, M = 256, 24
    n_kb, n_face_kb = 1_500_000, 506_237
    dim_t, dim_i, dim_f = 768, 512, 512
    key = jax.random.key(0)
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as td:
        vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                 + [f"w{i}" for i in range(20000)])
        vpath = os.path.join(td, "vocab.txt")
        with open(vpath, "w") as f:
            f.write("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=vpath, do_lower_case=True)

    dcfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=len(vocab) + 12, add_pooler=False))
    to16 = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16), t)
    d_params = to16(dpr.init(jax.random.fold_in(key, 1), dcfg))
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=64, batch_size=BATCH)

    vcfg = clip_lib.CLIPVisionConfig()
    clip_enc = ImageEmbedder(
        lambda p, x: clip_lib.vit_apply(
            p, vcfg, x, compute_dtype=jnp.bfloat16)["image_embeds"],
        clip_lib.vit_init(jax.random.fold_in(key, 2), vcfg),
        save_as="clip", batch_size=BATCH, compute_dtype=jnp.bfloat16)
    face_enc = FaceQueryEncoder(
        mtcnn.init(jax.random.fold_in(key, 3)),
        arcface.init(jax.random.fold_in(key, 4), arcface.ArcFaceConfig()),
        mtcnn_cfg=mtcnn.MTCNNConfig(canvas=256, min_face_size=20,
                                    thresholds=(0.5, 0.5, 0.5)),
        batch_size=64)

    def kbmat(seed, n, d):
        return (jax.random.normal(jax.random.fold_in(key, seed), (n, d),
                                  jnp.bfloat16) / np.sqrt(d))

    indexes = {
        "dpr": mips.DenseIndex(kbmat(11, n_kb, dim_t), mode="global",
                               dtype=jnp.bfloat16),
        "clip": mips.DenseIndex(kbmat(12, n_kb, dim_i), do_l2norm=True,
                                mode="approx", dtype=jnp.bfloat16),
        "face": mips.DenseIndex(kbmat(13, n_face_kb, dim_f),
                                do_l2norm=True, mode="approx",
                                dtype=jnp.bfloat16),
    }
    retrieval = MultiIndexRetrievalPipeline(
        emb, indexes, {"dpr": 0.6, "clip": 0.2, "face": 0.2},
        text_index="dpr", batch_size=BATCH, k=M,
        image_encoders={"clip": clip_enc}, face_encoders={"face": face_enc})

    kb_tokens = rng.integers(5, 20_000, (n_kb, 100)).astype(np.int32)
    rcfg = qa.ReaderConfig(bert=bert.BertConfig(
        vocab_size=len(vocab) + 12, add_pooler=False))
    r_params = to16(qa.init(jax.random.fold_in(key, 5), rcfg))
    pipe = AnswerPipeline(
        retrieval, TokenKB(kb_tokens), rcfg, r_params, tok,
        m_passages=M, reader_seq=160, questions_per_step=64,
        passage_tokens_key="passage_tokens", compute_dtype=jnp.bfloat16)

    def make_item():
        w = int(rng.integers(8, 20))
        q = " ".join(f"w{j}" for j in rng.integers(0, 20_000, w))
        img = Image.fromarray(
            rng.integers(0, 255, (256, 256, 3), dtype=np.uint8))
        return q, {"clip": img, "face": img}

    service = BatchedVQAService(pipe, ["clip", "face"], max_batch=BATCH,
                                max_wait_ms=20.0, max_inflight=2)
    t0 = time.perf_counter()
    q, imgs = make_item()
    service.answer(q, imgs, timeout=1800)
    print(f"warmup (compile) {time.perf_counter() - t0:.1f}s", flush=True)
    q, imgs = make_item()
    service.answer(q, imgs, timeout=600)

    results = {}
    for concurrency, per_client in ((1, 4), (64, 3), (256, 3)):
        latencies = []
        lock = threading.Lock()

        def client(cid):
            local = []
            for _ in range(per_client):
                q, imgs = make_item()
                t0 = time.perf_counter()
                out = service.answer(q, imgs, timeout=900)
                local.append(time.perf_counter() - t0)
                assert out["answer"] is not None
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
               "p50_s": round(float(np.percentile(arr, 50)), 2),
               "p99_s": round(float(np.percentile(arr, 99)), 2),
               "answers_per_s": round(len(arr) / wall, 1)}
        results[concurrency] = row
        print(json.dumps(row), flush=True)
    service.close()
    print(json.dumps({"summary": results}, indent=1))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — transient chip errors
        print(f"retry after {e!r}", file=sys.stderr)
        main()
