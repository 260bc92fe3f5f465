"""Parallelism surface: the single place to reason about distribution.

Re-exports the mesh contract (axes `data` / `model` / `kb`) and the
collective-backed primitives built on it:

- data parallelism: batches sharded on `data`; gradient sync is implicit in
  sharded autodiff (replaces the reference's Lightning DDP / NCCL,
  SURVEY.md §2.4).
- global in-batch negatives: the (N, N*M) similarity matmul over
  batch-sharded embeddings makes XLA insert the all-gather over ICI
  (train.objectives.biencoder_loss) — no label shifting.
- tensor parallelism: encoder heads/MLP sharded on `model`
  (models.layers *_spec companions) — absent in the reference, provided as
  a first-class axis.
- KB sharding ("TP for retrieval", the real scale axis): embedding matrices
  row-sharded on `kb` with per-shard top-k + all-gather merge
  (ops.mips.topk_sharded).
- pipeline parallelism: encoder layer stacks staged over `pipe`,
  microbatches streamed through the stage ring via ppermute
  (ops.pipeline.pipeline_apply / models.bert.encode_pipelined) —
  gradient-exact vs the sequential stack.
- sequence parallelism: per-layer activations L-sharded on the tp axis
  (Megatron-SP) through the `activation_sharding` seam of bert.encode.
- expert parallelism: GShard-style MoE FFN with stacked expert weights
  sharded on the tp axis (ops.moe.moe_apply / moe_spec).
"""
from viquae_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    KB_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    MeshContext,
    current,
    make_kb_mesh,
    make_mesh,
    use,
)
from viquae_tpu.ops.mips import topk_sharded  # noqa: F401
from viquae_tpu.ops.pipeline import (  # noqa: F401
    pipeline_apply,
    stack_stages,
    unstack_stages,
)
