"""Seed discipline.

The reference pins `seed_everything(42)` (meerqat/train/trainer.py:35) and a
multi-seed protocol [0,1,2,3,42]. Here all randomness flows from a single
`jax.random.key` split per named purpose; host-side RNG (sampling negatives
in collators) uses an independently seeded `numpy.random.Generator` so device
and host streams never alias.
"""
from __future__ import annotations

import dataclasses

import jax
import numpy as np

DEFAULT_SEED = 42


@dataclasses.dataclass
class SeedBundle:
    seed: int

    def __post_init__(self):
        self.key = jax.random.key(self.seed)
        self.host = np.random.default_rng(np.uint64(self.seed) ^ np.uint64(0x9E3779B97F4A7C15))

    def split(self, name: str) -> jax.Array:
        """Deterministic named key derivation (stable across runs)."""
        folded = jax.random.fold_in(self.key, _stable_hash(name))
        return folded


def _stable_hash(name: str) -> int:
    h = 2166136261
    for c in name.encode():
        h = ((h ^ c) * 16777619) & 0xFFFFFFFF
    return h & 0x7FFFFFFF
