"""Pixels-in -> answer-out: the COMPLETE online multimodal QA protocol
(VERDICT r2 item 2). Each query = (question text, raw image); per batch the
pipeline runs ONLINE:

  MTCNN detect -> align -> ArcFace   (face leg, FaceQueryEncoder)
  CLIP ViT-B/32                      (image leg, inside the fused program)
  packed DPR question tower          (text leg, inside the fused program)
  -> 3-index device fusion (dpr 1.5Mx768 exact + clip 1.5Mx512 + face
     506kx512, wsum gzmuv defmin)
  -> top-M pretokenized passages -> packed MultiPassageBERT reader
  -> answer spans decoded to text

The reference precomputes face AND image features offline and never wired
the reader into its interactive loop (meerqat/interact/system.py:24-42).
Measured: answers/s for the 1,257-question ViQuAE-shaped protocol.

    python scripts/exp_pixels_answer.py [--queries 1257]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TokenKB:
    """Lightweight AnswerPipeline KB adapter over a pretokenized token
    table — avoids materializing 1.5M python dicts."""

    def __init__(self, tokens: np.ndarray):
        self.tokens = tokens

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, i):
        return {"passage_tokens": self.tokens[i]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=1257)
    ap.add_argument("--kb", type=int, default=1_500_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--m", type=int, default=24)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from PIL import Image
    from transformers import BertTokenizerFast

    from viquae_tpu.image.embedding import ImageEmbedder
    from viquae_tpu.image.face_recognition import FaceQueryEncoder
    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.qa_serving import AnswerPipeline
    from viquae_tpu.ir.serving import MultiIndexRetrievalPipeline
    from viquae_tpu.models import arcface, bert, clip as clip_lib, dpr
    from viquae_tpu.models import mtcnn, qa
    from viquae_tpu.ops import mips

    rng = np.random.default_rng(0)
    n_kb, n_face_kb = args.kb, args.kb // 3
    dim_t, dim_i, dim_f = 768, 512, 512

    # ---- local WordPiece vocab (offline) --------------------------------
    tok_dir = "/tmp/_pixels_answer_tok"
    os.makedirs(tok_dir, exist_ok=True)
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [f"w{i}" for i in range(20_000)])
    with open(os.path.join(tok_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(tok_dir, "vocab.txt"))

    # ---- towers ---------------------------------------------------------
    key = jax.random.key(0)
    dcfg = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=len(vocab) + 12, add_pooler=False))
    d_params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        dpr.init(jax.random.fold_in(key, 1), dcfg))
    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=64, batch_size=args.batch)

    vcfg = clip_lib.CLIPVisionConfig()
    v_params = clip_lib.vit_init(jax.random.fold_in(key, 2), vcfg)
    clip_enc = ImageEmbedder(
        lambda p, x: clip_lib.vit_apply(
            p, vcfg, x, compute_dtype=jnp.bfloat16)["image_embeds"],
        v_params, save_as="clip", batch_size=args.batch,
        compute_dtype=jnp.bfloat16)

    face_enc = FaceQueryEncoder(
        mtcnn.init(jax.random.fold_in(key, 3)),
        arcface.init(jax.random.fold_in(key, 4), arcface.ArcFaceConfig()),
        mtcnn_cfg=mtcnn.MTCNNConfig(canvas=256, min_face_size=20,
                                    thresholds=(0.5, 0.5, 0.5)),
        batch_size=64)

    # ---- indexes (one doc-id space) -------------------------------------
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
        text_index="dpr", batch_size=args.batch, k=args.m,
        image_encoders={"clip": clip_enc}, face_encoders={"face": face_enc})

    # ---- reader over a pretokenized KB ----------------------------------
    kb_tokens = rng.integers(5, 20_000, (n_kb, 100)).astype(np.int32)
    rcfg = qa.ReaderConfig(bert=bert.BertConfig(
        vocab_size=len(vocab) + 12, add_pooler=False))
    r_params = qa.init(jax.random.fold_in(key, 5), rcfg)
    pipe = AnswerPipeline(
        retrieval, TokenKB(kb_tokens), rcfg, r_params, tok,
        m_passages=args.m, reader_seq=160, questions_per_step=64,
        passage_tokens_key="passage_tokens", compute_dtype=jnp.bfloat16)

    # ---- the 1,257-question protocol ------------------------------------
    queries = [
        " ".join(f"w{j}" for j in rng.integers(0, 20_000,
                                               rng.integers(8, 20)))
        for _ in range(args.queries)
    ]
    images = [
        None if i % 11 == 0 else Image.fromarray(
            rng.integers(0, 255, (256, 256, 3), dtype=np.uint8))
        for i in range(args.queries)
    ]

    t0 = time.time()
    out = pipe.run(queries, query_images={"clip": images, "face": images})
    warm_compile_s = time.time() - t0
    print(f"pass 1 (compile+run): {warm_compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    out = pipe.run(queries, query_images={"clip": images, "face": images})
    dt = time.time() - t0
    aps = args.queries / dt
    assert len(out) == args.queries
    n_answered = sum(o["answer"] is not None for o in out)

    import json
    print(json.dumps({
        "answers_per_s": round(aps, 1),
        "total_s": round(dt, 2),
        "queries": args.queries,
        "answered": n_answered,
        "per_stage": pipe.timer.report(),
        "retrieval_stages": retrieval.timer.report(),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
