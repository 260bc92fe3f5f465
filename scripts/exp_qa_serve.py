"""End-to-end batch QA serving throughput on one chip: retrieve over the
1.5M x 768 KB (Pallas fused exact) -> fetch/tokenize top-M=24 passages ->
packed MultiPassageBERT reader -> answer strings.

The reference's reading stage ALONE runs at 2.505 samples/s on a V100
(experiments/rc/viquae/metrics.json); its full pipeline is offline dataset
stages. This measures the whole loop as a deployment would run it
(ir/qa_serving.AnswerPipeline).
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from transformers import BertTokenizerFast

    from viquae_tpu.ir.embedding import PackedTextEmbedder
    from viquae_tpu.ir.qa_serving import AnswerPipeline
    from viquae_tpu.ir.serving import FusedRetrievalPipeline
    from viquae_tpu.models import bert, dpr, qa
    from viquae_tpu.ops import mips

    n_kb, dim = 1_500_000, 768
    n_queries = 1257
    M, reader_seq = 24, 256

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

    # KB: device bf16 matrix (fused layout) + host passage texts (~100
    # tokenizer tokens each, uniform_passages), lazily generated per id
    kb_mat = jax.random.normal(
        jax.random.fold_in(key, 2), (dim, n_kb + ((-n_kb) % 512)),
        jnp.bfloat16) / np.sqrt(dim)
    index = mips.DenseIndex(np.zeros((1, dim), np.float32), mode="fused")
    index.matrix, index.n, index.dtype = kb_mat, n_kb, jnp.bfloat16

    rng = np.random.default_rng(0)

    class LazyKB:
        """Passage text per id, deterministic, generated on access (holding
        1.5M strings on host is pointless for a throughput measurement)."""

        def __len__(self):
            return n_kb

        def __getitem__(self, i):
            r = np.random.default_rng(int(i))
            # production contract: the KB is tokenized once at index-build
            # time; serve-time pair assembly is numpy (5 is the first real
            # token id after the special tokens)
            return {"passage_tokens": (r.integers(0, 20000, 97) + 5)}

    n_words = np.clip(np.round(rng.lognormal(np.log(16.0), 0.35, n_queries)),
                      6, 60).astype(int)
    queries = [" ".join(f"w{j}" for j in rng.integers(0, 20000, w))
               for w in n_words]

    emb = PackedTextEmbedder(dpr.make_packed_apply(dcfg), d_params, tok,
                             row_len=64, batch_size=1280,
                             compute_dtype=jnp.bfloat16)
    retrieval = FusedRetrievalPipeline(emb, index, batch_size=1280, k=M)

    for packed in (True, False):
        pipe = AnswerPipeline(retrieval, LazyKB(), rcfg, r_params, tok,
                              m_passages=M, reader_seq=reader_seq,
                              passage_tokens_key="passage_tokens",
                              questions_per_step=64, packed_reader=packed,
                              packed_rows=768)  # ~719 rows/batch at ~120
        # tokens/pair; one compiled shape, overflow falls back
        pipe.run(queries[:64])  # warmup/compile
        pipe.run(queries)        # first full pass: absorbs the canvas-shape
        # compiles the packed reader sees across real batches (persistent
        # cache keeps them for deployment)
        t0 = time.time()
        out = pipe.run(queries)
        dt = time.time() - t0
        assert len(out) == n_queries and all(
            o["answer"] is not None for o in out)
        label = "packed" if packed else "padded"
        print(f"end-to-end QA ({label} reader): {n_queries/dt:.1f} "
              f"answers/s ({dt:.1f}s for {n_queries} questions)",
              file=sys.stderr)
        print("stages:", {k: round(v["total_s"], 2) for k, v in
                          pipe.report().items()}, file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"retry after {e!r}", file=sys.stderr)
        main()
