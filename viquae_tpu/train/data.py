"""Collators — the batch-building heart (parity meerqat/train/data.py).

Host-side, pure-numpy batch construction feeding the jitted train/eval
steps. Kept semantics:

- :class:`PreComputedImageFeatures` (:292-391): pad/trim faces to n_faces,
  square (B, 1, n_faces, dim) tensors, zero-mask for missing features.
- :class:`QADataModule.get_training_passages` (:523-585): sample up to
  n_relevant from `{search_key}_provenance_indices` and up to
  M - n_relevant BM25 negatives from `{search_key}_irrelevant_indices`.
- :class:`BiEncoderCollator` (:627-702): N questions + N*M passages where
  the first N rows are the relevant ones; labels = arange(N) with
  IGNORE_INDEX for questions without a relevant passage.
- :class:`ReaderCollator` (:877-1083): top-M eval passages from search
  columns or a run, token-level answer-position labeling
  (`get_answer_position`, vectorized with numpy sliding windows),
  max_n_answers, oracle mode, passage scores for IR fusion.
- :class:`ICTCollator` (:1086-1260): multimodal inverse cloze — a random
  sentence becomes the pseudo-question, surrounding sentences the target,
  text/image mask rates, hard negatives by rolling image features across
  the batch.
- :class:`ReRankerCollator` (:762-861): train = 1 relevant + M-1
  irrelevant; eval = top-M of a run.

All collators return dicts of numpy arrays with fixed shapes (XLA-ready).
"""
from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from viquae_tpu.train.objectives import IGNORE_INDEX


# --------------------------------------------------------------------------
# image feature formatting
# --------------------------------------------------------------------------
@dataclasses.dataclass
class PreComputedImageFeatures:
    n_faces: int = 4
    face_dim: int = 512
    bbox_dim: int = 7
    image_dims: Dict[str, int] = dataclasses.field(
        default_factory=lambda: {"clip-RN50": 1024, "imagenet-RN50": 2048}
    )

    def get_face_inputs(self, items: Sequence[dict]) -> Dict[str, np.ndarray]:
        n = len(items)
        faces = np.zeros((n, 1, self.n_faces, self.face_dim), np.float32)
        boxes = np.zeros((n, 1, self.n_faces, self.bbox_dim), np.float32)
        mask = np.zeros((n, 1, self.n_faces), np.int32)
        if self.n_faces > 0:
            for i, item in enumerate(items):
                emb = item.get("face_embedding")
                if emb is None:
                    continue
                k = min(self.n_faces, len(emb))
                faces[i, 0, :k] = np.asarray(emb[:k], np.float32)
                box = item.get("face_box") or item.get("scaled_face_box")
                if box is not None:
                    boxes[i, 0, :k] = np.asarray(box[:k], np.float32)
                mask[i, 0, :k] = 1
        return {"face": faces, "bbox": boxes, "attention_mask": mask}

    def get_image_inputs(self, items: Sequence[dict]
                         ) -> Dict[str, Dict[str, np.ndarray]]:
        out = {}
        for name, dim in self.image_dims.items():
            features = np.zeros((len(items), 1, dim), np.float32)
            mask = np.zeros((len(items), 1), np.int32)
            for i, item in enumerate(items):
                feat = item.get(name)
                if feat is None:
                    continue
                feat = np.asarray(feat, np.float32)
                if np.isnan(feat).all():
                    continue  # NaN rows mark missing embeddings
                features[i, 0] = feat
                mask[i, 0] = 1
            out[name] = {"input": features, "attention_mask": mask}
        return out


class ImageFormatter:
    """Merges tokenized text with face/image features
    (parity train/data.py:180-289, precomputed-features mode)."""

    def __init__(self, features: Optional[PreComputedImageFeatures] = None):
        self.features = features
        self.precomputed = features is not None

    def format_batch(self, text_inputs: Dict[str, np.ndarray],
                     items: Sequence[dict],
                     passage_items: Optional[Sequence[dict]] = None) -> dict:
        if self.features is None:
            return dict(text_inputs)
        face = self.features.get_face_inputs(items)
        image = self.features.get_image_inputs(items)
        if passage_items is not None:
            # question+passage pairs: the reference CONCATENATES question
            # and passage features along the n_images dim (train/data.py:
            # 252-283 torch.cat dim=1) — a round-3 review caught this
            # substituting passage features for the question's
            assert len(passage_items) == len(items), (
                "passage_items must align 1:1 with (repeated) items")
            p_face = self.features.get_face_inputs(passage_items)
            p_image = self.features.get_image_inputs(passage_items)
            face = {k: np.concatenate([face[k], p_face[k]], axis=1)
                    for k in face}
            image = {
                name: {k: np.concatenate([image[name][k], v], axis=1)
                       for k, v in d.items()}
                for name, d in p_image.items()
            }
        return {
            "text_inputs": dict(text_inputs),
            "face_inputs": face,
            "image_inputs": image,
        }


# --------------------------------------------------------------------------
# tokenization helper (fixed shapes)
# --------------------------------------------------------------------------
def tokenize(tokenizer, texts, pairs=None, max_length: int = 256
             ) -> Dict[str, np.ndarray]:
    enc = tokenizer(
        list(texts), *(list(pairs),) if pairs is not None else (),
        padding="max_length", truncation=True, max_length=max_length,
        return_tensors="np",
    )
    out = {
        "input_ids": enc["input_ids"].astype(np.int32),
        "attention_mask": enc["attention_mask"].astype(np.int32),
    }
    if "token_type_ids" in enc:
        out["token_type_ids"] = enc["token_type_ids"].astype(np.int32)
    return out


def step_indexed_batches(dataset, collate_fn, batch_size: int, seed: int = 42,
                         rng_owner=None):
    """Deterministic ``step -> batch`` source for O(1) trainer resume.

    The Lightning stack (and our legacy iterable path) fast-forwards the
    data stream on resume, re-collating every skipped batch. This instead
    derives batch ``step`` purely from ``(seed, step)``: a per-epoch
    permutation picks the example indices and, when ``rng_owner`` is given
    (a collator with a ``.rng`` attribute, e.g. QADataModule's passage
    sampler), its RNG is reseeded per step — so a resumed run reproduces the
    exact batch sequence without touching steps [0, start).
    """
    n = len(dataset)
    batches_per_epoch = max(n // batch_size, 1)
    perm_cache: Dict[int, np.ndarray] = {}

    def source(step: int):
        epoch, slot = divmod(step, batches_per_epoch)
        if epoch not in perm_cache:
            perm_cache.clear()  # keep one epoch resident
            perm_cache[epoch] = np.random.default_rng(
                [seed, epoch]
            ).permutation(n)
        idx = perm_cache[epoch][slot * batch_size: (slot + 1) * batch_size]
        if len(idx) < batch_size:  # short tail / dataset smaller than batch
            if n < batch_size:
                warnings.warn(
                    f"batch_size {batch_size} > dataset size {n}: examples "
                    "repeat WITHIN a batch — in-batch contrastive losses "
                    "get contradictory targets (a twin's positive is the "
                    "other twin's negative with identical embeddings)")
            reps = -(-(batch_size - len(idx)) // n)
            filler = np.tile(perm_cache[epoch], reps)[: batch_size - len(idx)]
            idx = np.concatenate([idx, filler])
        items = [dataset[int(i)] for i in idx]
        if rng_owner is not None:
            rng_owner.rng = np.random.default_rng([seed, 1 + step])
        return collate_fn(items)

    return source


# --------------------------------------------------------------------------
# base datamodule
# --------------------------------------------------------------------------
class QADataModule:
    """Question<->KB wiring + passage sampling."""

    def __init__(
        self,
        tokenizer,
        dataset=None,
        kb=None,
        image_kb=None,
        M: int = 24,
        n_relevant_passages: int = 1,
        search_key: str = "search",
        input_key: str = "input",
        kb_input_key: str = "passage",
        max_length: int = 256,
        image_features: Optional[PreComputedImageFeatures] = None,
        seed: int = 42,
    ):
        assert n_relevant_passages <= M
        self.tokenizer = tokenizer
        self.dataset = dataset
        self.kb = kb
        self.image_kb = image_kb
        self.M = M
        self.n_relevant_passages = n_relevant_passages
        self.search_key = search_key
        self.input_key = input_key
        self.kb_input_key = kb_input_key
        self.max_length = max_length
        self.image_formatter = ImageFormatter(image_features)
        self.rng = np.random.default_rng(seed)
        self.padding_passage = [{kb_input_key: ""}]

    def filter_rels(self, dataset):
        """Drop questions with no relevant passage (train/data.py:510-521)."""
        key = f"{self.search_key}_provenance_indices"
        return dataset.filter(lambda item: len(item[key]) > 0)

    def _select_kb(self, indices):
        if hasattr(self.kb, "select") and len(indices) > 1:
            # HF dataset: ONE batched Arrow gather (columnar read) instead
            # of a per-row __getitem__ in the collate hot loop
            batch = self.kb[[int(i) for i in indices]]
            keys = list(batch)
            return [dict(zip(keys, vals))
                    for vals in zip(*(batch[k] for k in keys))]
        return [self.kb[int(i)] for i in indices]

    def _row_budget(self, rows: int, role: str = "default") -> int:
        """Sticky canvas row budget: a monotone running max of the natural
        (pad_rows_to-rounded) row counts. Later batches pad up to it, so
        the jitted train step compiles once per max-increase (expected
        O(log n) for iid batches) instead of once per pad_rows_to
        increment the token totals happen to cross — compiles cost
        minutes over the tunneled TPU. No headroom factor: a constant
        +8% would tax EVERY batch with padding compute to save at most a
        couple of compiles.

        `role` keys the pin PER CANVAS: a biencoder/ICT collator packs a
        question canvas AND a ~M-times-larger context canvas — one shared
        pin padded every question canvas up to the context row count
        (~25x the question tower's FLOPs, silently)."""
        pins = getattr(self, "_rows_pinned", None)
        if pins is None:
            pins = self._rows_pinned = {}
        if rows > pins.get(role, 0):
            pins[role] = rows
        return pins[role]

    def add_image_features(self, passages: List[dict]) -> List[dict]:
        """Join per-article image features from image_kb via passage['index']
        (train/data.py:587-607)."""
        if self.image_kb is None:
            return passages
        out = []
        for passage in passages:
            passage = dict(passage)
            article = self.image_kb[int(passage["index"])]
            for k, v in article.items():
                if k not in passage:
                    passage[k] = v
            out.append(passage)
        return out

    def get_training_passages(self, item: dict, with_scores: bool = False):
        relevant, relevant_scores = [], np.zeros(0, np.float32)
        all_rel = item[self.search_key + "_provenance_indices"]
        n_rel = min(len(all_rel), self.n_relevant_passages)
        if n_rel > 0:
            # sample n_rel from the FULL list (permuting only the first
            # n_rel entries showed the model the same passages every epoch)
            order = self.rng.permutation(len(all_rel))[:n_rel]
            indices = np.asarray(all_rel)[order]
            if with_scores:
                relevant_scores = np.asarray(
                    item[self.search_key + "_provenance_scores"], np.float32
                )[order]
            relevant = self._select_kb(indices)
        irrelevant, irrelevant_scores = [], np.zeros(0, np.float32)
        all_irr = item[self.search_key + "_irrelevant_indices"]
        n_irr = min(len(all_irr), self.M - self.n_relevant_passages)
        if n_irr > 0:
            order = self.rng.permutation(len(all_irr))[:n_irr]
            indices = np.asarray(all_irr)[order]
            if with_scores:
                irrelevant_scores = np.asarray(
                    item[self.search_key + "_irrelevant_scores"], np.float32
                )[order]
            irrelevant = self._select_kb(indices)
        elif n_rel <= 0:
            warnings.warn(f"Didn't find any passage for question {item.get('id')}")
        if self.image_kb is not None:
            relevant = self.add_image_features(relevant)
            irrelevant = self.add_image_features(irrelevant)
        if with_scores:
            return relevant, irrelevant, relevant_scores, irrelevant_scores
        return relevant, irrelevant

    def _passage_texts(self, passages: List[dict]) -> List[str]:
        return [p[self.kb_input_key] if isinstance(p, dict) else p
                for p in passages]

    def _pack_inputs(self, inputs: dict, role: str = "default") -> dict:
        """Shared packing seam for collators with packed=True (biencoder +
        ICT): text-only inputs pack directly; multimodal inputs pack with
        T_vis reserved visual-token slots per sample (ECA) or text alone
        (ILF). The exclusivity flag and the row-budget rule live HERE
        only — two copies drifted before a round-3 review merged them."""
        mm_needs_vis = getattr(self, "mm_packed_needs_vis", True)
        exclusive = getattr(self, "face_and_image_are_exclusive", False)
        if "face_inputs" in inputs:  # multimodal (ECA/ILF) inputs
            # T_vis reserved slots per sample; row budget must cover
            # max_length text + the visual tokens (ECA only)
            t_vis = mm_visual_mask(
                inputs["face_inputs"], inputs.get("image_inputs")
            ).shape[1] if mm_needs_vis else 0
            return {
                **inputs,
                "text_inputs": {
                    **inputs["text_inputs"],
                    **pack_mm_text_inputs(
                        inputs, self.max_length + t_vis,
                        exclusive, needs_vis=mm_needs_vis,
                        row_budget=lambda r: self._row_budget(r, role),
                    ),
                },
            }
        return {**inputs, **pack_text_inputs(
            inputs, self.max_length,
            row_budget=lambda r: self._row_budget(r, role))}


def pack_text_inputs(inputs: Dict[str, np.ndarray], row_len: int,
                     row_budget=None) -> dict:
    """Canvas fields for CLS-pooled packed encoding (dpr.apply_packed):
    strip padding from tokenized {input_ids, attention_mask} and pack.
    ``row_budget`` (rows -> rows) pins a stable canvas height across
    batches (QADataModule._row_budget) so the train step compiles once."""
    from viquae_tpu.ops import packing

    ids = inputs["input_ids"]
    lens = inputs["attention_mask"].sum(axis=1).astype(int)
    seqs = [ids[i, : lens[i]] for i in range(len(ids))]
    p = packing.pack_token_sequences(seqs, row_len=row_len, pad_rows_to=8)
    if row_budget is not None:
        p = packing.pad_packed_rows(p, row_budget(p.rows))
    return {
        "canvas_input_ids": p.input_ids,
        "canvas_segment_ids": p.segment_ids,
        "canvas_position_ids": p.position_ids,
        "canvas_cls_rows": p.cls_rows,
        "canvas_cls_cols": p.cls_cols,
    }


def mm_visual_mask(face_inputs, image_inputs,
                   face_and_image_are_exclusive: bool = False) -> np.ndarray:
    """(B, T_vis) visual-token validity in models.mm._visual_tokens ORDER:
    faces (n_images*n_faces) then each image kind (n_images each) in
    image_inputs insertion order, with the face/image exclusivity rule."""
    faces = face_inputs["face"]
    b, n_images, n_faces = faces.shape[:3]
    parts = []
    face_mask = face_inputs["attention_mask"].reshape(b, n_images * n_faces)
    if n_faces > 0:
        parts.append(face_mask)
    image_parts = [
        v["attention_mask"] for v in (image_inputs or {}).values()
    ]
    if image_parts:
        im = np.concatenate(image_parts, axis=1)
        if face_and_image_are_exclusive:
            has_face = face_mask.sum(axis=1, keepdims=True) > 0
            im = np.where(has_face, 0, im)
        parts.append(im)
    if not parts:
        return np.zeros((b, 0), np.int32)
    return np.concatenate(parts, axis=1).astype(np.int32)


def pack_mm_text_inputs(mm_inputs: Dict[str, Any], row_len: int,
                        face_and_image_are_exclusive: bool = False,
                        needs_vis: bool = True, row_budget=None) -> dict:
    """Canvas fields for mm.eca_apply_packed: strip text padding, pack with
    T_vis reserved slots per sample (the visual-token scatter targets), and
    zero the segment id of slots whose face/image is ABSENT so attention
    ignores them (the packed equivalent of eca_apply's mask concat).
    `face_and_image_are_exclusive` must mirror the model's MMConfig.

    needs_vis=False (IntermediateLinearFusion: the visual side is a SUM of
    projections, not attention tokens) packs the text alone — reserved
    slots would otherwise sit in the text attention as stray pad tokens."""
    from viquae_tpu.ops import packing

    text = mm_inputs["text_inputs"]
    if not needs_vis:
        return pack_text_inputs(text, row_len, row_budget=row_budget)
    vis_mask = mm_visual_mask(
        mm_inputs["face_inputs"], mm_inputs.get("image_inputs"),
        face_and_image_are_exclusive,
    )
    t_vis = vis_mask.shape[1]
    ids = text["input_ids"]
    lens = text["attention_mask"].sum(axis=1).astype(int)
    seqs = [ids[i, : lens[i]] for i in range(len(ids))]
    p, vis_rows, vis_cols = packing.pack_with_reserved(
        seqs, t_vis, row_len=row_len, pad_rows_to=8
    )
    if row_budget is not None:
        # appended all-pad rows never move existing cls/vis pointers
        p = packing.pad_packed_rows(p, row_budget(p.rows))
    seg = p.segment_ids.copy()
    b = len(seqs)
    absent = vis_mask[:b] == 0
    seg[vis_rows[:b][absent], vis_cols[:b][absent]] = 0
    return {
        "canvas_input_ids": p.input_ids,
        "canvas_segment_ids": seg,
        "canvas_position_ids": p.position_ids,
        "canvas_cls_rows": p.cls_rows,
        "canvas_cls_cols": p.cls_cols,
        "canvas_vis_rows": vis_rows,
        "canvas_vis_cols": vis_cols,
    }


def stack_microbatches(batches: Sequence[dict]) -> dict:
    """Stack per-microbatch dicts into one batch with a leading accum dim.

    Packed canvases may disagree in row count across microbatches (adaptive
    pad_rows_to rounding); arrays are zero-padded to the elementwise-max
    shape first — zero rows carry segment_id 0, which packed attention
    ignores, so padding is numerically inert. Host-only leaves (strings,
    ragged lists) are kept as a per-microbatch list; the trainer drops them
    before the device step anyway."""
    out: Dict[str, Any] = {}
    for key in batches[0]:
        vals = [b[key] for b in batches]
        if isinstance(vals[0], dict):
            out[key] = stack_microbatches(vals)
        elif isinstance(vals[0], np.ndarray):
            shape = tuple(
                int(m) for m in np.max([v.shape for v in vals], axis=0)
            )
            padded = []
            for v in vals:
                if v.shape != shape:
                    pv = np.zeros(shape, v.dtype)
                    pv[tuple(slice(0, s) for s in v.shape)] = v
                    v = pv
                padded.append(v)
            out[key] = np.stack(padded)
        else:
            out[key] = vals
    return out


def microbatch_collate(collate_fn, accum: int):
    """Compose packing with gradient accumulation: split the items into
    `accum` equal groups, collate each group independently (each packed
    canvas's pointers stay local to its microbatch), and stack with a
    leading accum dim for Trainer(grad_accum=accum, microbatched=True).

    This is how the reference's global-batch-256 recipe
    (EXPERIMENTS.rst:274-279) runs packed on memory-constrained configs:
    the per-microbatch canvas bounds live memory while the scan in the
    train step accumulates the full-batch gradient. Note the in-batch
    negative pool is per-microbatch — the standard DDP+accumulation
    semantics, identical to the unpacked grad_accum path."""
    if accum < 1:
        raise ValueError(f"accum must be >= 1, got {accum}")

    def fn(items):
        n = len(items)
        if n % accum:
            raise ValueError(
                f"microbatch_collate(accum={accum}) needs len(items) "
                f"divisible by accum, got {n}"
            )
        size = n // accum
        return stack_microbatches([
            collate_fn(items[i * size: (i + 1) * size])
            for i in range(accum)
        ])

    return fn


# --------------------------------------------------------------------------
# biencoder
# --------------------------------------------------------------------------
class BiEncoderCollator(QADataModule):
    def __init__(self, *args, passage_type_ids: bool = False,
                 packed: bool = False,
                 face_and_image_are_exclusive: bool = False,
                 mm_packed_needs_vis: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.passage_type_ids = passage_type_ids
        # False for IntermediateLinearFusion towers (no visual tokens)
        self.mm_packed_needs_vis = mm_packed_needs_vis
        # packed=True adds canvases (pack_text_inputs, or
        # pack_mm_text_inputs when image features are attached) so the
        # trainee runs dpr.apply_packed / mm.eca_apply_packed — ~2-4x fewer
        # encoder FLOPs at real question/passage lengths
        if packed and passage_type_ids:
            raise ValueError("packed biencoder does not carry token types")
        self.packed = packed
        # must mirror the model's MMConfig.face_and_image_are_exclusive
        # (affects which visual slots leave the packed attention)
        self.face_and_image_are_exclusive = face_and_image_are_exclusive

    def collate_fn(self, items: Sequence[dict]) -> dict:
        assert self.n_relevant_passages == 1
        n_irr = self.M - 1
        questions, relevant, irrelevant, labels = [], [], [], []
        for i, item in enumerate(items):
            rel, irr = self.get_training_passages(item)
            if len(rel) < 1:
                rel = list(self.padding_passage)
                labels.append(IGNORE_INDEX)
            else:
                labels.append(i)
            if len(irr) < n_irr:
                irr = list(irr) + self.padding_passage * (n_irr - len(irr))
            questions.append(item[self.input_key])
            relevant.extend(rel)
            irrelevant.extend(irr)
        all_passages = list(relevant) + list(irrelevant)
        question_inputs = tokenize(
            self.tokenizer, questions, max_length=self.max_length
        )
        context_inputs = tokenize(
            self.tokenizer, self._passage_texts(all_passages),
            max_length=self.max_length,
        )
        if self.passage_type_ids and "token_type_ids" in context_inputs:
            context_inputs["token_type_ids"] = context_inputs[
                "attention_mask"
            ].astype(np.int32)
        question_inputs = self.image_formatter.format_batch(
            question_inputs, items
        )
        context_inputs = self.image_formatter.format_batch(
            context_inputs, all_passages
        )
        if self.packed:
            question_inputs = self._pack(question_inputs, role="question")
            context_inputs = self._pack(context_inputs, role="context")
        return {
            "question_inputs": question_inputs,
            "context_inputs": context_inputs,
            "labels": np.asarray(labels, np.int32),
        }

    def _pack(self, inputs: dict, role: str = "default") -> dict:
        return self._pack_inputs(inputs, role=role)


class JointBiEncoderAndClipCollator(BiEncoderCollator):
    """Adds CLIP-tokenized passage titles (text before ' [SEP] ')
    (train/data.py:705-759)."""

    def __init__(self, *args, cm_tokenizer, cm_max_length: int = 77, **kwargs):
        super().__init__(*args, **kwargs)
        self.cm_tokenizer = cm_tokenizer
        self.cm_max_length = cm_max_length

    def collate_fn(self, items):
        batch = super().collate_fn(items)
        # recover the titles from the tokenized passages' source text
        # by re-running passage selection deterministically is fragile;
        # instead extract from the raw text we just used
        texts = self._last_passage_texts
        # split on ' [SEP] ' exactly (the reference's join form): find()-1
        # sliced a stray character when the separator wasn't preceded by
        # one space, and swallowed the whole body for an empty title
        titles = [
            t.split(" [SEP] ", 1)[0] if " [SEP] " in t else "" for t in texts
        ]
        enc = self.cm_tokenizer(
            titles, padding="max_length", truncation=True,
            max_length=self.cm_max_length, return_tensors="np",
        )
        ctx = batch["context_inputs"]
        ctx["titles"] = {
            "input_ids": enc["input_ids"].astype(np.int32),
            "attention_mask": enc["attention_mask"].astype(np.int32),
        }
        return batch

    def _passage_texts(self, passages):
        texts = super()._passage_texts(passages)
        self._last_passage_texts = texts
        return texts


# --------------------------------------------------------------------------
# reader
# --------------------------------------------------------------------------
class ReaderCollator(QADataModule):
    def __init__(self, *args, max_n_answers: int = 10,
                 train_original_answer_only: bool = True,
                 oracle: bool = False, run=None,
                 with_scores: bool = False, train: bool = True,
                 packed: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.max_n_answers = max_n_answers
        self.train_original_answer_only = train_original_answer_only
        self.oracle = oracle
        self.run = run
        self.with_scores = with_scores
        self.train = train
        # packed=True additionally emits a canvas (ops/packing.py) so the
        # trainee can run qa.reader_apply_packed: (question, passage) pairs
        # are ~125 real tokens vs max_length=256 padded, ~2x reader FLOPs
        self.packed = packed
        if packed and self.image_formatter.precomputed:
            raise ValueError(
                "ReaderCollator(packed=True) is text-only — there is no "
                "packed multimodal reader path (reader_apply_packed takes "
                "no visual inputs); drop packed or image_features")
        if self.oracle and self.n_relevant_passages != self.M:
            warnings.warn(f"Oracle mode: setting n_relevant_passages={self.M}")
            self.n_relevant_passages = self.M

    def get_eval_passages(self, item):
        """Top-M retrieved passages (train/data.py:925-945)."""
        if self.run is None:
            indices = item[self.search_key + "_indices"][: self.M]
            scores = list(item[self.search_key + "_scores"][: self.M])
        else:
            results = self.run[item["id"]] if item["id"] in self.run else {}
            if not results:
                return [], []
            indices = [int(d) for d in list(results.keys())[: self.M]]
            scores = list(results.values())[: self.M]
        passages = self._select_kb(indices)
        if self.image_kb is not None:
            passages = self.add_image_features(passages)
        return passages, scores

    def get_answer_position(self, input_ids: np.ndarray,
                            answers: List[List[np.ndarray]],
                            answer_mask: np.ndarray) -> Dict[str, np.ndarray]:
        """Token-level answer spans per passage (train/data.py:947-975
        semantics): the C++ matcher (viquae_tpu/native/answer_spans.cpp)
        when available, numpy sliding windows otherwise."""
        from viquae_tpu.native import load_answer_span_matcher

        native = load_answer_span_matcher()
        if native is not None:
            return self._answer_positions_native(
                native, input_ids, answers, answer_mask
            )
        start_positions = np.zeros_like(answer_mask)
        end_positions = np.zeros_like(answer_mask)
        length = input_ids.shape[1]
        for j, answer_list in enumerate(answers):
            row = input_ids[j]
            starts: List[int] = []
            ends: List[int] = []
            for a in answer_list:
                alen = len(a)
                if alen == 0 or alen > length:
                    continue
                windows = np.lib.stride_tricks.sliding_window_view(row, alen)
                matches = np.nonzero((windows == a).all(axis=1))[0]
                for start in matches:
                    end = start + alen - 1
                    if start not in starts and end not in ends:
                        starts.append(int(start))
                        ends.append(int(end))
                        if len(starts) >= self.max_n_answers:
                            break
                if len(starts) >= self.max_n_answers:
                    break
            for i, (s, e) in enumerate(zip(starts, ends)):
                start_positions[j, i] = s
                end_positions[j, i] = e
                answer_mask[j, i] = 1
        m, a = self.M, self.max_n_answers
        return {
            "start_positions": start_positions.reshape(-1, m, a),
            "end_positions": end_positions.reshape(-1, m, a),
            "answer_mask": answer_mask.reshape(-1, m, a),
        }

    def _answer_positions_native(self, native, input_ids, answers,
                                 answer_mask):
        n_rows, length = input_ids.shape
        answer_tokens: List[int] = []
        answer_offsets = [0]
        row_offsets = [0]
        for answer_list in answers:
            for a in answer_list:
                answer_tokens.extend(int(t) for t in a)
                answer_offsets.append(len(answer_tokens))
            row_offsets.append(len(answer_offsets) - 1)
        out_starts = np.zeros((n_rows, self.max_n_answers), np.int32)
        out_ends = np.zeros((n_rows, self.max_n_answers), np.int32)
        out_counts = np.zeros(n_rows, np.int32)
        native(
            np.ascontiguousarray(input_ids, np.int32),
            np.int64(n_rows), np.int64(length),
            np.ascontiguousarray(answer_tokens, np.int32)
            if answer_tokens else np.zeros(0, np.int32),
            np.ascontiguousarray(answer_offsets, np.int64),
            np.ascontiguousarray(row_offsets, np.int64),
            np.int32(self.max_n_answers),
            out_starts, out_ends, out_counts,
        )
        for r in range(n_rows):
            answer_mask[r, : out_counts[r]] = 1
        m, a = self.M, self.max_n_answers
        return {
            "start_positions": out_starts.reshape(-1, m, a),
            "end_positions": out_ends.reshape(-1, m, a),
            "answer_mask": answer_mask.reshape(-1, m, a),
        }

    def collate_fn(self, items: Sequence[dict]) -> dict:
        questions, passages, answers, answer_strings = [], [], [], []
        passage_scores: List[np.ndarray] = []
        n = len(items)
        answer_mask = np.zeros((n * self.M, self.max_n_answers), np.int32)
        for i, item in enumerate(items):
            questions.extend([item] * self.M)
            if (not self.train) and not self.oracle:
                passage, score = self.get_eval_passages(item)
                score = list(score) + [0.0] * (self.M - len(score))
                passage_scores.append(np.asarray(score, np.float32))
            else:
                rel, irr, *scores = self.get_training_passages(
                    item, with_scores=self.with_scores
                )
                passage = list(rel) + list(irr)
                if self.with_scores:
                    rel_s, irr_s = scores
                    pad = self.M - len(rel_s) - len(irr_s)
                    passage_scores.append(np.concatenate([
                        rel_s, irr_s, np.zeros(pad, np.float32)
                    ]))
            passages.extend(passage)
            answer_mask[i * self.M: i * self.M + len(passage), 0] = 1
            if len(passage) < self.M:
                passages.extend(self.padding_passage * (self.M - len(passage)))

            original_answer = item["output"]["original_answer"]
            answer = list(item["output"]["answer"])
            answer_strings.extend([answer] * self.M)
            if self.train_original_answer_only:
                answer = [original_answer]
            else:
                lower = getattr(self.tokenizer, "do_lower_case", False)
                if lower:
                    original_answer = original_answer.lower()
                    # sorted: set iteration order varies per interpreter
                    # run, and slot filling stops at max_n_answers — an
                    # unordered dedup made labeled spans non-reproducible
                    answer = sorted(
                        {a.lower() for a in answer} - {original_answer})
                answer = [original_answer] + answer
            token_lists = self.tokenizer(
                answer, add_special_tokens=False,
                return_token_type_ids=False, return_attention_mask=False,
            )["input_ids"]
            answers.extend(
                [[np.asarray(a, np.int64) for a in token_lists]] * self.M
            )

        questions_text = [q[self.input_key] for q in questions]
        passages_text = self._passage_texts(passages)
        batch = tokenize(
            self.tokenizer, questions_text, pairs=passages_text,
            max_length=self.max_length,
        )
        answer_position = self.get_answer_position(
            batch["input_ids"], answers, answer_mask)
        if self.image_formatter.precomputed:
            # reference order (train/data.py:1070-1072): format FIRST, then
            # positions/strings/scores live TOP-LEVEL next to text_inputs —
            # trainees read batch["start_positions"] unnested
            batch = {
                **self.image_formatter.format_batch(batch, questions, passages)
            }
        batch.update(answer_position)
        batch["answer_strings"] = answer_strings
        if passage_scores:
            batch["passage_scores"] = np.concatenate(passage_scores)
        if self.packed:
            batch.update(self._pack_pairs(batch))
        return batch

    def _pack_pairs(self, batch) -> dict:
        """Canvas fields for qa.reader_apply_packed: strip padding, pack
        pairs many-per-row, carry token types, and record gather indices
        back into the (N*M, max_length) frame (answer positions are
        per-pair token offsets, identical in both frames)."""
        from viquae_tpu.ops import packing

        ids = batch["input_ids"]
        lens = batch["attention_mask"].sum(axis=1).astype(int)
        seqs = [ids[i, : lens[i]] for i in range(len(ids))]
        types = [
            batch["token_type_ids"][i, : lens[i]] for i in range(len(ids))
        ] if "token_type_ids" in batch else [np.zeros(l, np.int32) for l in lens]
        p = packing.pack_token_sequences(
            seqs, row_len=self.max_length, pad_rows_to=8
        )
        p = packing.pad_packed_rows(p, self._row_budget(p.rows))
        tt = packing.pack_parallel(p, types)
        g_idx, g_mask = packing.gather_indices(p, self.max_length)
        return {
            "canvas_input_ids": p.input_ids,
            "canvas_segment_ids": p.segment_ids,
            "canvas_position_ids": p.position_ids,
            "canvas_token_type_ids": tt,
            "gather_idx": g_idx,
            "gather_mask": g_mask,
        }


def map_run(run, mapping: Dict[str, list], k: int = 100):
    """Expand run doc ids through a one2many mapping (e.g. article ->
    passages), capping at k per query (parity train/data.py:864-874)."""
    from viquae_tpu.rankeval import Run

    new_run = {}
    for q_id, results in run.items():
        new_results: Dict[str, float] = {}
        for doc_id, score in results.items():
            for i in mapping[doc_id]:
                new_results[str(i)] = score
                if len(new_results) >= k:
                    break
            if len(new_results) >= k:
                break
        new_run[q_id] = new_results
    return Run(new_run, name=run.name)


class CrossModalCollator(QADataModule):
    """(text, image-feature) pairs for CLIP-style contrastive training
    (parity CrossModalDataModule, train/data.py:394-498 precomputed mode):
    tokenized captions/titles + pixel values or precomputed features."""

    def __init__(self, *args, text_key: str = "text",
                 pixels_key: str = "pixel_values", **kwargs):
        super().__init__(*args, **kwargs)
        self.text_key = text_key
        self.pixels_key = pixels_key

    def collate_fn(self, items: Sequence[dict]) -> dict:
        text_inputs = tokenize(
            self.tokenizer, [item[self.text_key] for item in items],
            max_length=self.max_length,
        )
        batch = {"text_inputs": text_inputs}
        if self.pixels_key in items[0]:
            batch["pixel_values"] = np.stack(
                [np.asarray(item[self.pixels_key], np.float32) for item in items]
            )
        elif self.image_formatter.precomputed:
            batch["image_inputs"] = self.image_formatter.features.get_image_inputs(items)
        batch["labels"] = np.arange(len(items), dtype=np.int32)
        return batch


# --------------------------------------------------------------------------
# reranker
# --------------------------------------------------------------------------
class ReRankerCollator(QADataModule):
    def __init__(self, *args, run=None, train: bool = True,
                 packed: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.run = run
        self.train = train
        self.packed = packed  # emit canvases for rr.bert_reranker_apply_packed

    def collate_fn(self, items):
        questions, passages, labels = [], [], []
        for item in items:
            questions.extend([item[self.input_key]] * self.M)
            if self.train:
                rel, irr = self.get_training_passages(item)
                passage = list(rel) + list(irr)
                label = 0 if rel else IGNORE_INDEX
            elif self.run is None:
                # same fallback as ReaderCollator.get_eval_passages: the
                # search columns ARE the eval retrieval when no run file
                # is given (silently yielding all-padding batches here
                # produced plausible metrics over empty passages)
                indices = [int(d) for d in
                           item[self.search_key + "_indices"][: self.M]]
                passage = self._select_kb(indices)
                rel_set = set(
                    item.get(self.search_key + "_provenance_indices", [])
                )
                label = next(
                    (k for k, idx in enumerate(indices) if idx in rel_set),
                    IGNORE_INDEX,
                )
            else:
                results = (
                    self.run[item["id"]] if item["id"] in self.run else {}
                )
                indices = [int(d) for d in list(results.keys())[: self.M]]
                passage = self._select_kb(indices)
                rel_set = set(
                    item.get(self.search_key + "_provenance_indices", [])
                )
                label = next(
                    (k for k, idx in enumerate(indices) if idx in rel_set),
                    IGNORE_INDEX,
                )
            if len(passage) < self.M:
                passage = list(passage) + self.padding_passage * (
                    self.M - len(passage)
                )
            passages.extend(passage)
            labels.append(label)
        batch = tokenize(
            self.tokenizer, questions, pairs=self._passage_texts(passages),
            max_length=self.max_length,
        )
        batch["labels"] = np.asarray(labels, np.int32)
        if self.packed:
            from viquae_tpu.ops import packing

            lens = batch["attention_mask"].sum(axis=1).astype(int)
            tts = batch.get("token_type_ids",
                            np.zeros_like(batch["input_ids"]))
            p = packing.pack_token_sequences(
                [batch["input_ids"][i, : lens[i]] for i in range(len(lens))],
                row_len=self.max_length, pad_rows_to=8,
            )
            p = packing.pad_packed_rows(p, self._row_budget(p.rows))
            batch.update({
                "canvas_input_ids": p.input_ids,
                "canvas_segment_ids": p.segment_ids,
                "canvas_position_ids": p.position_ids,
                "canvas_cls_rows": p.cls_rows,
                "canvas_cls_cols": p.cls_cols,
                "canvas_token_type_ids": packing.pack_parallel(
                    p, [tts[i, : lens[i]] for i in range(len(lens))]
                ),
            })
        return batch


# --------------------------------------------------------------------------
# multimodal inverse cloze task
# --------------------------------------------------------------------------
class ICTCollator(QADataModule):
    def __init__(self, *args, sentences_per_target: int = 4,
                 prepend_title: bool = False, text_mask_rate: float = 1.0,
                 image_mask_rate: float = 1.0, packed: bool = False,
                 face_and_image_are_exclusive: bool = False,
                 mm_packed_needs_vis: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        assert self.n_relevant_passages == 1
        self.sentences_per_target = sentences_per_target
        self.prepend_title = prepend_title
        self.text_mask_rate = text_mask_rate
        self.image_mask_rate = image_mask_rate
        # packed=True emits mm canvases (pack_mm_text_inputs) so the
        # trainee runs mm.eca_apply_packed on both towers; the flag must
        # mirror MMConfig.face_and_image_are_exclusive
        if packed and not self.image_formatter.precomputed:
            raise ValueError(
                "ICTCollator(packed=True) needs precomputed image features "
                "(image_features=...); without them there is no packed mm "
                "path and training would silently run padded")
        self.packed = packed
        self.face_and_image_are_exclusive = face_and_image_are_exclusive
        self.mm_packed_needs_vis = mm_packed_needs_vis

    def get_pseudo_question(self, item: dict):
        sentences = item["sentences"]
        i = int(self.rng.integers(len(sentences)))
        query = {"text": sentences[i]["text"]}
        n = min(self.sentences_per_target, len(sentences) - 1)
        max_shift = min(i, n)
        min_shift = max(0, i + n - len(sentences) + 1)
        shift = int(self.rng.integers(min_shift, max_shift + 1))
        if self.rng.random() < self.text_mask_rate:
            target = [
                s["text"]
                for s in sentences[i - shift: i] + sentences[i + 1: i + 1 + n - shift]
            ]
        else:
            target = [s["text"] for s in sentences[i - shift: i + 1 + n - shift]]
        if self.prepend_title:
            target = [item["title"], self.tokenizer.sep_token] + target
        target = {"text": " ".join(target)}
        context_prefix = (
            "context_" if self.rng.random() < self.image_mask_rate else ""
        )
        if self.image_formatter.precomputed:
            keys = {"face_box", "face_embedding"} | set(
                self.image_formatter.features.image_dims
            )
            for k in keys:
                target[k] = item.get(f"{context_prefix}{k}")
                query[k] = item.get(k)
        return query, target

    def collate_fn(self, items):
        questions, targets = [], []
        for item in items:
            q, t = self.get_pseudo_question(item)
            questions.append(q)
            targets.append(t)
        question_inputs = self.image_formatter.format_batch(
            tokenize(self.tokenizer, [q["text"] for q in questions],
                     max_length=self.max_length),
            questions,
        )
        context_inputs = self.image_formatter.format_batch(
            tokenize(self.tokenizer, [t["text"] for t in targets],
                     max_length=self.max_length),
            targets,
        )
        n_hard = self.M - 1
        if 0 < len(items) <= n_hard:
            raise ValueError(
                f"ICT rolling hard negatives need len(items) > M-1 "
                f"({n_hard}), got {len(items)}: np.roll wraps to the "
                "identity at shift=len(items), pairing a question with its "
                "OWN features as a 'negative'")
        if n_hard > 0 and not self.image_formatter.precomputed:
            # reference parity (train/data.py:1197-1199): rolling-image
            # hard negatives NEED precomputed features; silently training
            # with in-batch negatives only would misrepresent M
            raise NotImplementedError(
                "ICT hard negatives (M > 1) require precomputed image "
                "features")
        if n_hard > 0 and self.image_formatter.precomputed:
            # duplicate relevant text M times; roll visual features across
            # the batch for hard negatives (same text, wrong image)
            for k, v in context_inputs["text_inputs"].items():
                context_inputs["text_inputs"][k] = np.tile(v, (n_hard + 1, 1))
            for name, v in context_inputs["image_inputs"].items():
                v["input"] = np.concatenate(
                    [v["input"]] + [
                        np.roll(v["input"], s + 1, 0) for s in range(n_hard)
                    ]
                )
                v["attention_mask"] = np.concatenate(
                    [v["attention_mask"]] + [
                        np.roll(v["attention_mask"], s + 1, 0)
                        for s in range(n_hard)
                    ]
                )
            fi = context_inputs["face_inputs"]
            for k in ("face", "bbox", "attention_mask"):
                fi[k] = np.concatenate(
                    [fi[k]] + [np.roll(fi[k], s + 1, 0) for s in range(n_hard)]
                )
        labels = np.arange(len(items), dtype=np.int32)
        if self.packed:
            # same packing seam as BiEncoderCollator._pack (one shared
            # helper: the row-budget and exclusivity rules must not drift)
            question_inputs = self._pack_inputs(question_inputs,
                                                role="question")
            context_inputs = self._pack_inputs(context_inputs,
                                               role="context")
        return {
            "question_inputs": question_inputs,
            "context_inputs": context_inputs,
            "labels": labels,
        }
