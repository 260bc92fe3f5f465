"""End-to-end batch QA serving: retrieve -> read -> answer strings.

The reference runs its full pipeline (embed -> search -> read) as offline
dataset stages plus a ONE-query-at-a-time REPL (meerqat/interact/
system.py); reading alone is its throughput headline (2.505 samples/s on
a V100, experiments/rc/viquae/metrics.json). This module is the batch
deployment loop over the same stages:

- retrieval: any serving pipeline with `run_arrays` (FusedRetrievalPipeline
  / MultiIndexRetrievalPipeline) — one device dispatch per batch;
- passage fetch + (question, passage) pair tokenization on host, in a
  prefetch thread so it overlaps the reader's device compute;
- reader: jitted MultiPassageBERT forward with the reference's GLOBAL
  softmax over all M passages per question, spans decoded to strings with
  `qa.log_probs_to_answers`.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from viquae_tpu.core.profiling import StageTimer
from viquae_tpu.ir.serving import drain_lagged


class AnswerPipeline:
    """queries (+ modal features/images) -> extractive answers, batched.

    Parameters
    ----------
    retrieval: serving pipeline with run_arrays(queries, ...) -> (scores,
        indices) over the PASSAGE id space.
    kb: passage dataset/list; kb[int(id)][passage_key] is the text.
    reader_cfg / reader_params: models.qa MultiPassageBERT bundle.
    tokenizer: HF tokenizer for (question, passage) pairs + span decode.
    m_passages: top-M passages read per question (reference default 24).
    questions_per_step: reader batch (fixed XLA shape).
    """

    def __init__(self, retrieval, kb, reader_cfg, reader_params, tokenizer,
                 m_passages: int = 24, reader_seq: int = 256,
                 passage_key: str = "passage",
                 passage_tokens_key: Optional[str] = None,
                 questions_per_step: int = 16,
                 timer: Optional[StageTimer] = None,
                 compute_dtype=None,
                 packed_reader: bool = False,
                 packed_rows: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from viquae_tpu.models import qa

        self.retrieval = retrieval
        r_k = getattr(retrieval, "k", None)
        if r_k is not None and r_k < m_passages:
            raise ValueError(
                f"retrieval returns k={r_k} passages but m_passages="
                f"{m_passages}; construct the retrieval pipeline with "
                "k >= m_passages (the fuse_ir_score path would otherwise "
                "crash on the short score rows)")
        self.kb = kb
        self.reader_cfg = reader_cfg
        self.reader_params = reader_params
        self.tokenizer = tokenizer
        self.M = m_passages
        self.reader_seq = reader_seq
        self.passage_key = passage_key
        # passage_tokens_key: column of PRE-TOKENIZED passage ids (no
        # special tokens). KB passages are static, so a deployment
        # tokenizes them once at index-build time; at serve time only the
        # short questions hit the tokenizer and the (question, passage)
        # pairs are assembled with numpy. Without it, tokenizing M=24
        # full pairs per question is the end-to-end bottleneck (~33s for
        # the 1,257-question protocol vs ~9s of reader compute).
        self.passage_tokens_key = passage_tokens_key
        self.n_q = questions_per_step
        self.timer = timer or StageTimer("qa-serving")
        # packed_reader: run the forward on a packed canvas at the REAL
        # pair lengths (qa.reader_apply_packed, ~1.8x at the reference's
        # ~125-token pairs); the padded ids are still built host-side for
        # span decode only
        self.packed_reader = packed_reader
        # packed_rows pins the packed canvas height to ONE compiled shape
        # (PackedTextEmbedder.fixed_rows counterpart) — without it every
        # new per-batch row count recompiles the reader; batches that
        # overflow the pinned canvas fall back to an unpinned pack
        self.packed_rows = packed_rows
        compute_dtype = compute_dtype or jnp.bfloat16
        m = m_passages
        self.fuse_ir_score = bool(getattr(reader_cfg, "fuse_ir_score",
                                          False))

        def _postprocess(start_logits, end_logits, mask):
            # the reference's GLOBAL normalization (softmax over all M
            # passages jointly, train/optim.py:42-87) + span selection, ALL
            # inside the jit: the host receives three (n,) index vectors
            # instead of (n*m, L) log-probs — over the tunneled link the
            # per-batch syncs were the end-to-end bottleneck
            neg = jnp.asarray(-1e30, start_logits.dtype)
            s = jnp.where(mask > 0, start_logits, neg)
            e = jnp.where(mask > 0, end_logits, neg)
            nm, length = s.shape
            n = nm // m
            start_p = jax.nn.softmax(
                s.reshape(n, m * length), axis=-1).reshape(n, m, length)
            end_p = jax.nn.softmax(
                e.reshape(n, m * length), axis=-1).reshape(n, m, length)
            return qa.get_best_spans(start_p, end_p)

        @jax.jit
        def _read(params, ids, mask, token_types, passage_scores):
            # the reference's GLOBAL normalization: softmax over all M
            # passages of a question jointly (train/optim.py:42-87); pad
            # positions can't win spans (_postprocess masks them);
            # passage_scores feed the fuse_ir_score projection when the
            # reader was trained with it
            out = qa.reader_apply(
                params, reader_cfg, ids, attention_mask=mask,
                token_type_ids=token_types, m_passages=m,
                passage_scores=passage_scores,
                deterministic=True, compute_dtype=compute_dtype,
            )
            return _postprocess(out.start_logits, out.end_logits, mask)

        @jax.jit
        def _read_packed(params, ids, seg, pos, tt, g_idx, g_mask, mask,
                         passage_scores):
            out = qa.reader_apply_packed(
                params, reader_cfg, ids, seg, pos, tt, g_idx, g_mask,
                m_passages=m, passage_scores=passage_scores,
                deterministic=True, compute_dtype=compute_dtype,
            )
            return _postprocess(out.start_logits, out.end_logits, mask)

        self._read = _read
        self._read_packed = _read_packed
        self._qa = qa

    # ------------------------------------------------------------------
    def _encode_questions(self, queries):
        """Encode ONCE, truncated to reader_seq // 2 (the question budget;
        pair assembly happens from the encoded ids directly — a
        decode->re-encode round trip is not guaranteed token-identical)."""
        return self.tokenizer(
            list(map(str, queries)), add_special_tokens=False,
            truncation=True, max_length=self.reader_seq // 2,
        )["input_ids"]

    def _fill_pair_canvas(self, chunk, q_ids_all, doc_tokens):
        """Assemble one fixed-shape reader batch: [CLS] q [SEP] p [SEP]
        rows with token types 0/1 (BertTokenizerFast pair format,
        parity-tested). `doc_tokens[j]` lists the retrieved passages'
        token sequences for chunk[j] (<= M entries; missing docs leave
        all-zero rows). ONE fill loop serves both the pretokenized and
        the tokenize-at-serve-time producers so their span inputs cannot
        drift apart."""
        tok = self.tokenizer
        cls_id, sep_id = tok.cls_token_id, tok.sep_token_id
        seq = self.reader_seq
        nm = self.n_q * self.M
        ids = np.zeros((nm, seq), np.int32)
        mask = np.zeros((nm, seq), np.int32)
        tt = np.zeros((nm, seq), np.int32)
        row = 0
        for j, qi in enumerate(chunk):
            head = [cls_id] + list(q_ids_all[qi]) + [sep_id]
            budget = seq - len(head) - 1
            for p_ids in doc_tokens[j]:
                if not len(p_ids):
                    # empty/out-of-range passage: keep the ROW POSITION
                    # (spans map back to passage rank by row) but leave it
                    # all-zero — a live [CLS] q [SEP][SEP] row would
                    # compete in the global softmax and could win a
                    # nonsense span inside the question text
                    row += 1
                    continue
                full = head + list(p_ids)[: max(budget, 0)] + [sep_id]
                L = len(full)
                ids[row, :L] = full
                mask[row, :L] = 1
                tt[row, len(head): L] = 1
                row += 1
            row += self.M - len(doc_tokens[j])
        return ids, mask, tt

    def _reader_batches(self, queries, indices):
        """Host producer: fetch top-M passages (pre-tokenized KB column,
        or tokenize at serve time) + assemble fixed-shape pair batches."""
        tok = self.tokenizer
        q_ids_all = self._encode_questions(queries)
        pretok = self.passage_tokens_key is not None
        for start in range(0, len(queries), self.n_q):
            chunk = range(start, min(start + self.n_q, len(queries)))
            n_real = len(chunk)
            if pretok:
                doc_tokens = [
                    [self.kb[int(d)][self.passage_tokens_key]
                     if 0 <= int(d) < len(self.kb) else []
                     for d in indices[qi][: self.M]]
                    for qi in chunk
                ]
            else:
                texts = [
                    str(self.kb[int(d)][self.passage_key])
                    if 0 <= int(d) < len(self.kb) else ""
                    for qi in chunk for d in indices[qi][: self.M]
                ]
                flat = tok(texts, add_special_tokens=False, truncation=True,
                           max_length=self.reader_seq)["input_ids"] \
                    if texts else []
                doc_tokens, p_i = [], 0
                for qi in chunk:
                    n_docs = len(indices[qi][: self.M])
                    doc_tokens.append(flat[p_i: p_i + n_docs])
                    p_i += n_docs
            ids, mask, tt = self._fill_pair_canvas(chunk, q_ids_all,
                                                   doc_tokens)
            yield start, n_real, ids, mask, tt

    def run(self, queries: List[str], **retrieval_kwargs) -> List[Dict]:
        """Answer every query; returns [{"answer", "passage_ids",
        "scores"}] in input order."""
        import jax.numpy as jnp

        with self.timer.stage("retrieve"):
            scores, indices = self.retrieval.run_arrays(
                queries, **retrieval_kwargs)

        answers: List[Optional[str]] = [None] * len(queries)

        def stream():
            for item in self._reader_batches(queries, indices):
                start, n_real, ids, mask, tt = item
                p_scores = None
                if self.fuse_ir_score:
                    sl = np.zeros((self.n_q, self.M), np.float32)
                    sl[:n_real] = scores[start: start + n_real, : self.M]
                    p_scores = jnp.asarray(sl.reshape(-1))
                with self.timer.stage("reader_dispatch"):
                    if self.packed_reader:
                        from viquae_tpu.ops import packing

                        lens = mask.sum(axis=1).clip(min=1)
                        seqs = [ids[r, : lens[r]] for r in range(len(ids))]
                        try:
                            p = packing.pack_token_sequences(
                                seqs, row_len=self.reader_seq,
                                n_rows=self.packed_rows, pad_rows_to=16)
                        except ValueError:
                            # batch overflows the pinned canvas
                            p = packing.pack_token_sequences(
                                seqs, row_len=self.reader_seq,
                                pad_rows_to=16)
                        tts = [tt[r, : lens[r]] for r in range(len(ids))]
                        tt_canvas = packing.pack_parallel(p, tts)
                        g_idx, g_mask = packing.gather_indices(
                            p, self.reader_seq)
                        spans = self._read_packed(
                            self.reader_params,
                            jnp.asarray(p.input_ids),
                            jnp.asarray(p.segment_ids),
                            jnp.asarray(p.position_ids),
                            jnp.asarray(tt_canvas),
                            jnp.asarray(g_idx), jnp.asarray(g_mask),
                            jnp.asarray(mask), p_scores,
                        )
                    else:
                        spans = self._read(
                            self.reader_params, jnp.asarray(ids),
                            jnp.asarray(mask), jnp.asarray(tt), p_scores,
                        )
                    for arr in spans:
                        if hasattr(arr, "copy_to_host_async"):
                            arr.copy_to_host_async()
                yield start, n_real, ids, spans

        def drain_one(item):
            start, n_real, ids, spans = item
            with self.timer.stage("decode"):
                passage, s_idx, e_idx = (np.asarray(a) for a in spans)
                ids3 = ids.reshape(self.n_q, self.M, self.reader_seq)
                for i in range(n_real):
                    span = ids3[i, passage[i], s_idx[i]: e_idx[i]]
                    answers[start + i] = self.tokenizer.decode(
                        span, skip_special_tokens=True)

        # prefetch: batch i+1 tokenizes while batch i reads on device;
        # lagged drain overlaps span decode with the next reader step
        drain_lagged(stream(), drain_one)

        return [
            {
                "answer": answers[i],
                "passage_ids": indices[i][: self.M].tolist(),
                "scores": scores[i][: self.M].tolist(),
            }
            for i in range(len(queries))
        ]

    def report(self) -> dict:
        return self.timer.report()
