"""viquae_tpu — a TPU-native knowledge-based VQA retrieval framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
PaulLerner/ViQuAE (`meerqat`): entity-centric visual question answering via
multimodal retrieval (dense text, image, face, BM25, late/early fusion) plus
an extractive multi-passage reader.

Public contract (kept from the reference): pipeline stages are pure functions
over batches of a columnar dataset; stages communicate through named columns;
configs are JSON/YAML kwargs-trees with a ``class_name`` registry; runs/qrels
are ranx-compatible JSON.

Execution substrate (all-new): functional JAX models with explicit param
pytrees, one `jax.sharding.Mesh` with axes ("data", "model", "kb"), jitted
stage kernels, Pallas kernels on the hot paths (MIPS scoring, image
preprocessing), bf16 matmuls with fp32 accumulation.
"""

__version__ = "0.3.0"

from viquae_tpu.core import mesh as mesh  # noqa: F401
