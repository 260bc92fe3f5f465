"""Training objectives.

Parity with meerqat/train/trainee.py, re-expressed SPMD-first:

- :func:`biencoder_loss` <- BiEncoder.step (:422-459). The reference runs
  DDP and must `all_gather(sync_grads=True)` question/context embeddings and
  shift labels by i*N*M per rank (:438-452). Under pjit there is ONE logical
  global batch: embeddings are batch-sharded over the `data` mesh axis, the
  (N, N*M) similarity matmul makes XLA insert the all-gather over ICI, and
  gradient sync falls out of sharded autodiff — no label shifting, no
  explicit collective.
- :func:`clip_contrastive_loss` <- CrossModal (:199-231), symmetric InfoNCE.
- :func:`joint_mono_cross_modal_loss` <- JointBiEncoderAndClip (:490-626):
  weighted sum of text-text, image-image, image-title similarities.
- :func:`reranker_loss` <- ReRanker (:631-694): CE over M passage logits.
- :func:`ict_loss`: inverse-cloze-task biencoder objective (same NLL; data
  construction lives in train.data).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def _nll_from_similarities(similarities: jnp.ndarray, labels: jnp.ndarray):
    """Mean NLL over labels != IGNORE_INDEX; returns (loss, log_probs)."""
    log_probs = jax.nn.log_softmax(similarities, axis=1)
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(log_probs, safe_labels[:, None], axis=1)[:, 0]
    loss = -jnp.sum(picked * valid) / jnp.maximum(valid.sum(), 1)
    return loss, log_probs


def biencoder_loss(
    question_embeddings: jnp.ndarray,  # (N, D) global batch
    context_embeddings: jnp.ndarray,   # (N*M, D) global batch
    labels: jnp.ndarray,               # (N,) global index of the relevant
                                       #      context, or IGNORE_INDEX
):
    """DPR in-batch-negatives NLL over the global (N, N*M) similarity."""
    similarities = jnp.dot(
        question_embeddings, context_embeddings.T,
        preferred_element_type=jnp.float32,
    )
    loss, log_probs = _nll_from_similarities(similarities, labels)
    return loss, {"log_probs": log_probs, "labels": labels}


def clip_contrastive_loss(
    text_embeddings: jnp.ndarray,   # (N, D) L2-normalized
    image_embeddings: jnp.ndarray,  # (N, D) L2-normalized
    logit_scale: jnp.ndarray,       # scalar (exp of learnable temperature)
):
    """Symmetric InfoNCE (CLIP)."""
    logits = logit_scale * jnp.dot(
        text_embeddings, image_embeddings.T, preferred_element_type=jnp.float32
    )
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss_t, _ = _nll_from_similarities(logits, labels)
    loss_i, _ = _nll_from_similarities(logits.T, labels)
    return 0.5 * (loss_t + loss_i), {"logits": logits}


def joint_mono_cross_modal_loss(
    question_embeddings: jnp.ndarray,   # (N, D) text tower
    context_embeddings: jnp.ndarray,    # (N*M, D) text tower
    question_image_embeddings: jnp.ndarray,  # (N, Di) CLIP image
    context_image_embeddings: jnp.ndarray,   # (N*M, Di) CLIP image
    context_title_embeddings: jnp.ndarray,   # (N*M, Di) CLIP text of titles
    labels: jnp.ndarray,                # (N,)
    question_weight: jnp.ndarray,
    image_weight: jnp.ndarray,
    cm_weight: jnp.ndarray,
    temperature: jnp.ndarray = 1.0,
):
    """Weighted 3-way similarity (text-text + image-image + image-title),
    parity with JointBiEncoderAndClip (trainee.py:490-626)."""
    sim = question_weight * (question_embeddings @ context_embeddings.T)
    sim = sim + image_weight * (
        question_image_embeddings @ context_image_embeddings.T
    )
    sim = sim + cm_weight * (
        question_image_embeddings @ context_title_embeddings.T
    )
    sim = sim * temperature
    loss, aux = _nll_from_similarities(sim, labels)
    return loss, aux


def reranker_loss(logits: jnp.ndarray, labels: jnp.ndarray):
    """Cross-entropy over the M candidate passages of each question.

    logits: (N, M); labels: (N,) index of the relevant passage or
    IGNORE_INDEX (parity: ReRanker, trainee.py:631-694).
    """
    return _nll_from_similarities(logits, labels)


ict_loss = biencoder_loss  # same objective, different data construction
