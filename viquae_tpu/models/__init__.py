"""Model zoo: functional JAX models with explicit param pytrees.

Every model is (Config dataclass, ``init(key, cfg) -> params``,
``apply(params, cfg, ...) -> outputs``) — no module framework, so weight
porting from the reference's torch checkpoints is transparent and pjit
sharding is a pure pytree-of-PartitionSpec concern.

Replaces (TPU-first, not ported): meerqat/models/bert.py (vendored HF BERT),
models/mm.py (ECA/ILF/Flamant/CLIPForIR), models/qa.py (MultiPassageBERT),
models/rr.py (rerankers), models/image.py (face/image embeddings), plus the
encoder dependencies meerqat pulls from torch hub (CLIP, ArcFace, MTCNN).
"""
# importing registers the config-registry entries (DPREncoder, ECAEncoder,
# IntermediateLinearFusion, ...)
from viquae_tpu.models import bert, clip, dpr, mm, qa  # noqa: F401
