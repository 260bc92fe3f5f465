"""Dataset -> embedding columns (parity with meerqat/ir/embedding.py).

The reference maps a torch no-grad forward over the dataset
(ir/embedding.py:197-272), wrapping the model in `nn.DataParallel` on
multi-GPU (:287-288). Here the forward is one jitted, data-sharded JAX
function: every batch is padded to a fixed (batch_size, max_length) so XLA
compiles once, the tokenizer runs on host, and the mesh's `data` axis
provides the DataParallel equivalent via sharding annotations.

Multimodal seams kept from the reference: `map_passage_to_kb` joins
precomputed image features from the article KB through `batch['index']`
(:110-125) and `expand_query` appends the top-1 entity name of a visual run
to the text query (:128-144).
"""
from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viquae_tpu.core import mesh as meshlib


def pad_batch(arrays: Dict[str, np.ndarray], batch_size: int
              ) -> tuple[Dict[str, np.ndarray], int]:
    """Pad leading dim to batch_size; returns (padded, n_real)."""
    n = len(next(iter(arrays.values())))
    if n == batch_size:
        return arrays, n
    out = {}
    for k, v in arrays.items():
        pad_width = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    return out, n


class TextEmbedder:
    """Embeds a text column with a (params, cfg, apply) tower.

    apply_fn(params, input_ids, attention_mask, token_type_ids) must return
    a dict; `output_key` selects the embedding (default "pooler_output").
    """

    def __init__(
        self,
        apply_fn: Callable,
        params,
        tokenizer,
        key: str = "passage",
        save_as: str = "embedding",
        output_key: str = "pooler_output",
        max_length: int = 256,
        batch_size: int = 128,
        mesh_ctx: Optional[meshlib.MeshContext] = None,
        compute_dtype=jnp.float32,
        extra_input_fn: Optional[Callable] = None,
        layers: Optional[list] = None,
    ):
        self.tokenizer = tokenizer
        self.key = key
        self.save_as = save_as
        self.output_key = output_key
        self.max_length = max_length
        self.batch_size = batch_size
        self.mesh_ctx = mesh_ctx or meshlib.current()
        self.extra_input_fn = extra_input_fn
        self.params = params
        # per-layer CLS extraction (parity ir/embedding.py:228-244):
        # saves {save_as}_layer_{i} columns instead of the pooled output
        self.layers = layers

        data_sharding = self.mesh_ctx.batch_sharded
        replicated = self.mesh_ctx.replicated

        @functools.partial(
            jax.jit,
            out_shardings=replicated,
            static_argnames=(),
        )
        def _forward(params, input_ids, attention_mask, token_type_ids):
            input_ids = jax.lax.with_sharding_constraint(
                input_ids, data_sharding
            )
            out = apply_fn(
                params,
                input_ids=input_ids,
                attention_mask=attention_mask,
                token_type_ids=token_type_ids,
                deterministic=True,
                compute_dtype=compute_dtype,
                **({"output_hidden_states": True} if self.layers else {}),
            )
            if self.layers:
                return tuple(
                    out["hidden_states"][layer][:, 0] for layer in self.layers
                )
            return out[self.output_key]

        self._forward = _forward

    def tokenize(self, texts) -> Dict[str, np.ndarray]:
        enc = self.tokenizer(
            list(texts),
            padding="max_length",
            truncation=True,
            max_length=self.max_length,
            return_tensors="np",
        )
        out = {
            "input_ids": enc["input_ids"].astype(np.int32),
            "attention_mask": enc["attention_mask"].astype(np.int32),
            "token_type_ids": enc.get(
                "token_type_ids",
                np.zeros_like(enc["input_ids"]),
            ).astype(np.int32),
        }
        return out

    def __call__(self, batch: dict) -> dict:
        """dataset.map(batched=True) entry — writes the `save_as` column(s)."""
        texts = batch[self.key]
        if self.extra_input_fn is not None:
            texts = self.extra_input_fn(batch, texts)
        embeddings = self.embed_texts(texts)
        if self.layers:
            for layer, emb in zip(self.layers, embeddings):
                batch[f"{self.save_as}_layer_{layer}"] = emb
        else:
            batch[self.save_as] = embeddings
        return batch

    def embed_texts(self, texts):
        if len(texts) == 0:
            # np.concatenate([]) raises on an empty dataset.map batch;
            # probe the tower once for the output width (same guard as
            # PackedColumnEmbedder)
            probe = self.embed_texts([""])
            width = (np.asarray(probe[0]).shape[-1] if self.layers
                     else np.asarray(probe).shape[-1])
            empty = np.zeros((0, width), np.float32)
            return [empty] * len(self.layers) if self.layers else empty
        chunks = []
        for start in range(0, len(texts), self.batch_size):
            sub = texts[start: start + self.batch_size]
            enc = self.tokenize(sub)
            enc, n_real = pad_batch(enc, self.batch_size)
            out = self._forward(
                self.params,
                jnp.asarray(enc["input_ids"]),
                jnp.asarray(enc["attention_mask"]),
                jnp.asarray(enc["token_type_ids"]),
            )
            if self.layers:
                chunks.append([np.asarray(o)[:n_real] for o in out])
            else:
                chunks.append(np.asarray(out)[:n_real])
        if self.layers:
            return [
                np.concatenate([c[i] for c in chunks], axis=0)
                for i in range(len(self.layers))
            ]
        return np.concatenate(chunks, axis=0)


class PackedTextEmbedder:
    """Packed-canvas query embedder: the serving/bench hot path.

    Tokenizes WITHOUT padding, packs the batch into one fixed
    (rows, row_len) canvas (ops/packing.py) and runs a block-diagonal
    forward — ~3x fewer encoder FLOPs than pad-to-max on question-length
    text (the reference pads questions to 256 tokens,
    experiments/ir/viquae/dpr/questions/config.json). Canvas row counts are
    rounded up a fixed ladder so XLA compiles at most a handful of shapes
    for any stream of batches.

    packed_apply_fn(params, input_ids, segment_ids, position_ids,
    cls_rows, cls_cols) -> (n_cls, D); e.g. a partial of
    models.dpr.apply_packed.
    """

    ROWS_GRANULARITY = 32  # canvas rows round up to this; a stable query-
    # length distribution then re-uses 1-2 compiled shapes (persistent
    # compile cache absorbs the rest)

    def __init__(
        self,
        packed_apply_fn: Callable,
        params,
        tokenizer,
        row_len: int = 64,
        batch_size: int = 1280,
        compute_dtype=jnp.bfloat16,
        fixed_rows: Optional[int] = None,
    ):
        """`fixed_rows` pins the canvas height to ONE compiled shape (size
        it at the stream's p99 token budget); the ladder is the adaptive
        default. Batches that overflow the pinned canvas fall back to the
        one-row-per-sequence worst case."""
        self.tokenizer = tokenizer
        self.row_len = row_len
        self.batch_size = batch_size
        self.fixed_rows = fixed_rows
        self.params = params

        @functools.partial(jax.jit, static_argnames=())
        def _forward(params, ids, seg, pos, cr, cc):
            return packed_apply_fn(
                params, ids, seg, pos, cr, cc,
                deterministic=True, compute_dtype=compute_dtype,
            )

        self._forward = _forward

    def pack(self, texts):
        """Host side only: tokenize without padding + pack into a canvas
        rounded to ROWS_GRANULARITY rows (or the pinned `fixed_rows`).
        Returns an ops.packing.PackedBatch."""
        from viquae_tpu.ops import packing

        assert len(texts) <= self.batch_size
        enc = self.tokenizer(
            list(texts), truncation=True, max_length=self.row_len,
        )["input_ids"]
        seqs = [np.asarray(s, np.int32) for s in enc]
        if self.fixed_rows is not None:
            try:
                return packing.pack_token_sequences(
                    seqs, self.row_len, n_rows=self.fixed_rows,
                    n_cls=self.batch_size,
                )
            except ValueError:  # batch overflows the pinned canvas
                pass
        return packing.pack_token_sequences(
            seqs, self.row_len, n_rows=None,
            pad_rows_to=self.ROWS_GRANULARITY, n_cls=self.batch_size,
        )

    def embed_texts(self, texts):
        """Returns a DEVICE array (batch_size, D); rows past len(texts) are
        garbage (pad pointers) — callers slice. Dispatch is async: no sync
        here, so tokenization of the next batch overlaps device compute."""
        p = self.pack(texts)
        return self._forward(
            self.params,
            jnp.asarray(p.input_ids), jnp.asarray(p.segment_ids),
            jnp.asarray(p.position_ids),
            jnp.asarray(p.cls_rows), jnp.asarray(p.cls_cols),
        )

    def __call__(self, texts):
        return self.embed_texts(texts)


class PackedColumnEmbedder(PackedTextEmbedder):
    """dataset.map(batched=True) column adapter over the PACKED tower —
    the corpus-embedding counterpart of PackedTextEmbedder.

    The reference embeds every passage padded to max_length
    (ir/embedding.py:249-272 with experiments/ir/*/passages configs,
    max_length 256) although `uniform_passages` makes them ~100 tokens:
    >2x of the encoder FLOPs are padding. This packs passages at their
    real lengths instead; CLS pooling only (no per-layer extraction).
    """

    def __init__(self, *args, key: str = "passage",
                 save_as: str = "embedding",
                 extra_input_fn: Optional[Callable] = None, **kwargs):
        # corpus embeddings default to f32 like TextEmbedder — flipping
        # "packed" on must change PACKING, not the numeric contract (the
        # serving-oriented parent defaults to bf16)
        kwargs.setdefault("compute_dtype", jnp.float32)
        super().__init__(*args, **kwargs)
        self.key = key
        self.save_as = save_as
        self.extra_input_fn = extra_input_fn

    def __call__(self, batch: dict) -> dict:  # type: ignore[override]
        texts = batch[self.key]
        if self.extra_input_fn is not None:
            texts = self.extra_input_fn(batch, texts)
        if len(texts) == 0:
            # np.concatenate([]) raises on an empty dataset.map batch;
            # probe the tower once for the output width instead
            if not hasattr(self, "_dim"):
                self._dim = int(
                    np.asarray(self.embed_texts([""])).shape[-1])
            batch[self.save_as] = np.zeros((0, self._dim), np.float32)
            return batch
        chunks = []
        for start in range(0, len(texts), self.batch_size):
            sub = list(texts[start: start + self.batch_size])
            out = np.asarray(self.embed_texts(sub))[: len(sub)]
            chunks.append(out.astype(np.float32))
        batch[self.save_as] = np.concatenate(chunks, axis=0)
        self._dim = int(batch[self.save_as].shape[-1])
        return batch


class MMEmbedder:
    """Multimodal query/passage embedding (ECA/ILF encoders): tokenized text
    + precomputed face/image feature columns -> embedding column (parity
    ir/embedding.py:29-107 `get_face_inputs`/`get_image_inputs` +
    multimodal `embed`)."""

    def __init__(self, apply_fn, params, tokenizer, image_features,
                 key: str = "input", save_as: str = "mm_embedding",
                 max_length: int = 256, batch_size: int = 64,
                 mesh_ctx=None, compute_dtype=jnp.float32,
                 kb=None, kb_features=None, packed_bundle=None):
        from viquae_tpu.train.data import PreComputedImageFeatures

        self.tokenizer = tokenizer
        self.features: "PreComputedImageFeatures" = image_features
        self.key = key
        self.save_as = save_as
        self.max_length = max_length
        self.batch_size = batch_size
        self.mesh_ctx = mesh_ctx or meshlib.current()
        self.params = params
        self.kb = kb                    # article KB for passage joins
        self.kb_features = kb_features  # feature column names to join
        # packed_bundle: an _MMEncoderBundle with packed_apply_fn
        # (ECAEncoder / IntermediateLinearFusion) — embeds the text at REAL
        # lengths on a packed canvas (the reference pads every ~100-token
        # passage to max_length)
        self.packed_bundle = packed_bundle
        self._needs_vis = bool(
            getattr(packed_bundle, "PACKED_NEEDS_VIS", False))

        @jax.jit
        def forward(params, text_inputs, face_inputs, image_inputs):
            out = apply_fn(
                params,
                text_inputs=text_inputs,
                face_inputs=face_inputs,
                image_inputs=image_inputs,
                deterministic=True,
                compute_dtype=compute_dtype,
            )
            return out.pooler_output if hasattr(out, "pooler_output") else out

        self._forward = forward

        if packed_bundle is not None:
            packed_apply = packed_bundle.packed_apply_fn

            @jax.jit
            def forward_packed(params, canvas, face_inputs, image_inputs):
                return packed_apply(
                    params, *canvas, face_inputs, image_inputs,
                    deterministic=True, compute_dtype=compute_dtype,
                )

            self._forward_packed = forward_packed

    def _row_budget(self, rows: int) -> int:
        """Sticky monotone canvas row budget (one compiled shape per
        running max — the QADataModule._row_budget rule)."""
        pinned = getattr(self, "_rows_pinned", 0)
        if rows > pinned:
            self._rows_pinned = pinned = rows
        return pinned

    def __call__(self, batch: dict) -> dict:
        items = [
            {k: batch[k][i] for k in batch} for i in range(len(batch[self.key]))
        ]
        if len(items) == 0:
            # empty dataset.map batch: np.concatenate([]) raises; probe
            # the encoder ONCE with a padding-only item for the width
            # (same guard as PackedColumnEmbedder/TextEmbedder). The kb
            # join is bypassed for the probe — a padding item has no
            # article index to join on (missing features embed as zeros)
            if not hasattr(self, "_dim"):
                kb_saved, self.kb = self.kb, None
                try:
                    probe = self({self.key: [""]})
                finally:
                    self.kb = kb_saved
                self._dim = int(
                    np.asarray(probe[self.save_as]).shape[-1])
            batch[self.save_as] = np.zeros((0, self._dim), np.float32)
            return batch
        if self.kb is not None and self.kb_features:
            joined = map_passage_to_kb(batch, self.kb, self.kb_features)
            for i, item in enumerate(items):
                for f in self.kb_features:
                    item[f] = joined[f][i]
        embeddings = []
        for start in range(0, len(items), self.batch_size):
            chunk = items[start: start + self.batch_size]
            n_real = len(chunk)
            if n_real < self.batch_size:
                chunk = chunk + [
                    {self.key: ""} for _ in range(self.batch_size - n_real)
                ]
            enc = self.tokenizer(
                [item.get(self.key, "") for item in chunk],
                padding="max_length", truncation=True,
                max_length=self.max_length, return_tensors="np",
            )
            face_np = self.features.get_face_inputs(chunk)
            image_np = self.features.get_image_inputs(chunk)
            face_inputs = jax.tree_util.tree_map(jnp.asarray, face_np)
            image_inputs = jax.tree_util.tree_map(jnp.asarray, image_np)
            if self.packed_bundle is not None:
                from viquae_tpu.train.data import (
                    mm_visual_mask, pack_mm_text_inputs,
                )

                mm_inputs = {
                    "text_inputs": {
                        "input_ids": enc["input_ids"].astype(np.int32),
                        "attention_mask":
                            enc["attention_mask"].astype(np.int32),
                    },
                    "face_inputs": face_np,
                    "image_inputs": image_np,
                }
                t_vis = mm_visual_mask(face_np, image_np).shape[1] \
                    if self._needs_vis else 0
                c = pack_mm_text_inputs(
                    mm_inputs, self.max_length + t_vis,
                    self.packed_bundle.cfg.face_and_image_are_exclusive,
                    needs_vis=self._needs_vis,
                    # sticky monotone row budget: without it every 8-row
                    # token-total boundary a batch crosses is a fresh
                    # canvas shape — a fresh minutes-long compile over the
                    # tunnel (the QADataModule._row_budget rule)
                    row_budget=self._row_budget,
                )
                canvas = [
                    c["canvas_input_ids"], c["canvas_segment_ids"],
                    c["canvas_position_ids"], c["canvas_cls_rows"],
                    c["canvas_cls_cols"],
                ]
                if self._needs_vis:
                    canvas += [c["canvas_vis_rows"], c["canvas_vis_cols"]]
                out = np.asarray(self._forward_packed(
                    self.params, tuple(jnp.asarray(a) for a in canvas),
                    face_inputs, image_inputs,
                ))[:n_real]
            else:
                text_inputs = {
                    "input_ids":
                        jnp.asarray(enc["input_ids"].astype(np.int32)),
                    "attention_mask": jnp.asarray(
                        enc["attention_mask"].astype(np.int32)
                    ),
                }
                out = np.asarray(self._forward(
                    self.params, text_inputs, face_inputs, image_inputs
                ))[:n_real]
            embeddings.append(out)
        batch[self.save_as] = np.concatenate(embeddings, axis=0)
        return batch


def map_passage_to_kb(batch: dict, kb, features) -> Dict[str, list]:
    """Join per-article `features` columns onto a passage batch via
    batch['index'] (parity ir/embedding.py:110-125)."""
    out: Dict[str, list] = {f: [] for f in features}
    for article_index in batch["index"]:
        article = kb[int(article_index)]
        for f in features:
            out[f].append(article[f])
    return out


def expand_query(batch: dict, visual_run, kb, key: str = "input",
                 reference_key: str = "wikipedia_title") -> list:
    """Append the top-1 entity name from a visual run to each query
    (parity ir/embedding.py:128-144)."""
    expanded = []
    for q_id, text in zip(batch["id"], batch[key]):
        results = visual_run[q_id] if q_id in visual_run else {}
        if results:
            top = max(results.items(), key=lambda kv: kv[1])[0]
            entity = kb[int(top)][reference_key]
            expanded.append(f"{text} {entity}")
        else:
            expanded.append(text)
    return expanded


def dataset_embed(dataset_path, embedder, output_path=None,
                  map_kwargs: Optional[dict] = None):
    """Load dataset, map the embedder over it, save back
    (parity ir/embedding.py:249-272)."""
    from datasets import load_from_disk

    if isinstance(dataset_path, (str, Path)):
        dataset = load_from_disk(str(dataset_path))
    else:
        dataset = dataset_path
    dataset = dataset.map(
        embedder, batched=True,
        batch_size=embedder.batch_size,
        **(map_kwargs or {}),
    )
    if output_path is not None:
        dataset.save_to_disk(str(output_path))
    elif isinstance(dataset_path, (str, Path)):
        save_in_place(dataset, dataset_path)
    return dataset


def save_in_place(dataset, path):
    """Overwrite a dataset with itself: Arrow forbids writing onto the
    memory-mapped source dir, so write next to it and swap.

    Crash recovery: a leftover `.tmp_old` from a prior crash means the
    previous swap didn't finish — the original data may live ONLY there,
    so restore it before proceeding; a leftover `.tmp_save` is a partial
    write and is discarded."""
    import shutil

    path = Path(path)
    tmp = path.with_name(path.name + ".tmp_save")
    old = path.with_name(path.name + ".tmp_old")
    if old.exists():
        if not path.exists():
            old.rename(path)  # crashed mid-swap: .tmp_old IS the data
        else:
            shutil.rmtree(old)
    if tmp.exists():
        shutil.rmtree(tmp)  # partial write from a prior crash
    dataset.save_to_disk(str(tmp))
    path.rename(old)
    tmp.rename(path)
    shutil.rmtree(old)
