"""Typed model outputs (parity meerqat/models/outputs.py:11-79).

Lightweight NamedTuples (pytree-compatible, jit-safe) instead of HF
ModelOutput dataclasses.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class EncoderOutput(NamedTuple):
    pooler_output: Optional[jnp.ndarray] = None
    # summed MoE load-balance aux (BertConfig.moe_experts > 0), else None
    moe_aux: Optional[jnp.ndarray] = None


class ECAEncoderOutput(NamedTuple):
    pooler_output: Optional[jnp.ndarray] = None
    last_hidden_state: Optional[jnp.ndarray] = None
    moe_aux: Optional[jnp.ndarray] = None


class BiEncoderOutput(NamedTuple):
    question_pooler_output: Optional[jnp.ndarray] = None
    context_pooler_output: Optional[jnp.ndarray] = None


class JointMonoAndCrossModalOutput(NamedTuple):
    question_pooler_output: Optional[jnp.ndarray] = None
    context_pooler_output: Optional[jnp.ndarray] = None
    question_image_output: Optional[jnp.ndarray] = None
    context_image_output: Optional[jnp.ndarray] = None
    context_title_output: Optional[jnp.ndarray] = None


class ReaderOutput(NamedTuple):
    loss: Optional[jnp.ndarray] = None
    start_logits: Optional[jnp.ndarray] = None
    end_logits: Optional[jnp.ndarray] = None
    start_log_probs: Optional[jnp.ndarray] = None
    end_log_probs: Optional[jnp.ndarray] = None
    moe_aux: Optional[jnp.ndarray] = None


class ReRankerOutput(NamedTuple):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None
    moe_aux: Optional[jnp.ndarray] = None
