"""Multimodal ICT end-to-end (BASELINE config 4): ICT collator batches ->
ECA biencoder -> SPMD training reduces loss and improves in-batch MRR."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.models import bert, mm
from viquae_tpu.train import data as tdata
from viquae_tpu.train import metrics as tmetrics
from viquae_tpu.train import objectives, optim
from viquae_tpu.train.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(60)
    ] + ["sentence", "doc", "of", "."]
    d = tmp_path_factory.mktemp("tok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)


def test_ict_eca_training(tokenizer, devices):
    cfg = mm.MMConfig(
        bert=bert.BertConfig(
            vocab_size=len(tokenizer), hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48,
            max_position_embeddings=40, add_pooler=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        n_faces=1, face_dim=6, bbox_dim=7, image_dims=(("clip", 8),),
    )
    key = jax.random.key(0)
    params = {
        "question": mm.eca_init(jax.random.fold_in(key, 0), cfg),
        "context": mm.eca_init(jax.random.fold_in(key, 1), cfg),
    }

    def loss_fn(params, batch, rng, deterministic=True):
        def encode(p, inputs):
            return mm.eca_apply(
                p, cfg, inputs["text_inputs"], inputs["face_inputs"],
                inputs["image_inputs"], deterministic=deterministic,
            ).pooler_output

        q = encode(params["question"], batch["question_inputs"])
        c = encode(params["context"], batch["context_inputs"])
        return objectives.ict_loss(q, c, batch["labels"])

    # WIT-style items: each doc has distinctive text + a distinctive image
    feats = tdata.PreComputedImageFeatures(
        n_faces=1, face_dim=6, bbox_dim=7, image_dims={"clip": 8}
    )
    rng = np.random.default_rng(0)
    items = []
    for i in range(8):
        items.append({
            "sentences": [
                {"text": f"sentence {j} of doc w{i} ."} for j in range(5)
            ],
            "title": f"doc w{i}",
            "face_embedding": [rng.standard_normal(6).tolist()],
            "face_box": [[0.1] * 7],
            "clip": (np.eye(8)[i % 8] * 3).tolist(),
            "context_clip": (np.eye(8)[i % 8] * 3 + 0.1).tolist(),
            "context_face_embedding": [rng.standard_normal(6).tolist()],
            "context_face_box": [[0.2] * 7],
        })
    collator = tdata.ICTCollator(
        tokenizer, M=2, max_length=16, seed=0, image_features=feats,
        sentences_per_target=2,
    )
    batches = [collator.collate_fn(items) for _ in range(4)]

    ctx = meshlib.make_mesh(data=8)
    tx = optim.make_optimizer(params, lr=2e-3, warmup_steps=5,
                              total_steps=200, grad_clip=1.0)
    with meshlib.use(ctx):
        trainer = Trainer(
            loss_fn, params, tx,
            TrainerConfig(max_steps=60, log_every=20), mesh_ctx=ctx,
        )
        result = trainer.fit(batches)
        _, aux = jax.jit(loss_fn)(
            trainer.state["params"], trainer._shard_batch(batches[0]),
            jax.random.key(1),
        )
    losses = [h["loss"] for h in result["history"] if "loss" in h]
    assert losses[-1] < losses[0], losses
    m = tmetrics.batch_retrieval(
        np.asarray(aux["log_probs"]), np.asarray(aux["labels"])
    )
    acc = tmetrics.accumulate_batch_metrics([m])
    assert acc["MRR@N*M"] > 0.5, acc


def test_ict_eca_packed_trainee_matches_padded(tokenizer, devices):
    """ICTCollator(packed=True) + BiEncoderTrainee over ECAEncoder bundles:
    the packed loss equals the padded loss (deterministic forward)."""
    from viquae_tpu.models.mm import ECAEncoder
    from viquae_tpu.train import trainee as trainee_lib

    cfg = mm.MMConfig(
        bert=bert.BertConfig(
            vocab_size=len(tokenizer), hidden_size=24, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=48,
            max_position_embeddings=64, add_pooler=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        n_faces=1, face_dim=6, bbox_dim=7, image_dims=(("clip", 8),),
    )
    q_model = ECAEncoder(cfg=cfg, seed=0)
    c_model = ECAEncoder(cfg=cfg, seed=1)
    be = trainee_lib.BiEncoderTrainee(q_model, c_model)

    feats = tdata.PreComputedImageFeatures(
        n_faces=1, face_dim=6, bbox_dim=7, image_dims={"clip": 8}
    )
    rng = np.random.default_rng(0)
    items = []
    for i in range(6):
        items.append({
            "sentences": [
                {"text": f"sentence {j} of doc w{i} ."} for j in range(5)
            ],
            "title": f"doc w{i}",
            "face_embedding": (
                [rng.standard_normal(6).tolist()] if i % 3 else None
            ),
            "face_box": [[0.1] * 7],
            "clip": (np.eye(8)[i % 8] * 3).tolist(),
            "context_clip": (np.eye(8)[i % 8] * 3 + 0.1).tolist(),
            "context_face_embedding": [rng.standard_normal(6).tolist()],
            "context_face_box": [[0.2] * 7],
        })

    def make_batch(packed):
        coll = tdata.ICTCollator(
            tokenizer, M=2, max_length=16, seed=5, image_features=feats,
            sentences_per_target=2, packed=packed,
        )
        coll.rng = np.random.default_rng(123)  # same pseudo-questions
        return coll.collate_fn(items)

    b_pad = make_batch(False)
    b_packed = make_batch(True)
    key = jax.random.key(0)
    loss_pad, _ = jax.jit(
        lambda p, b: be.loss_fn(p, b, key, deterministic=True)
    )(be.params, b_pad)
    loss_packed, _ = jax.jit(
        lambda p, b: be.loss_fn(p, b, key, deterministic=True)
    )(be.params, b_packed)
    np.testing.assert_allclose(
        float(loss_packed), float(loss_pad), rtol=2e-5, atol=2e-5
    )
