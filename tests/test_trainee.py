"""Trainee bundles: biencoder/reranker/reader wiring + export + test-after-fit."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.models import bert, dpr, qa
from viquae_tpu.train import optim, save_ptm, trainee
from viquae_tpu.train.callbacks import test_after_fit as run_test_after_fit
from viquae_tpu.train.trainer import Trainer, TrainerConfig

TINY = dict(
    vocab_size=50, hidden_size=16, num_hidden_layers=1,
    num_attention_heads=2, intermediate_size=32,
    max_position_embeddings=40, add_pooler=False,
)


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(45)
    ]
    d = tmp_path_factory.mktemp("tok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"))


def make_biencoder():
    cfg = dpr.DPRConfig(bert=bert.BertConfig(**TINY))
    q = dpr.DPREncoder(cfg=cfg, seed=0)
    c = dpr.DPREncoder(cfg=cfg, seed=1)
    return trainee.BiEncoderTrainee(q, c)


def biencoder_batch(n=4, m=2, l=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "question_inputs": {
            "input_ids": rng.integers(0, 50, (n, l)).astype(np.int32),
            "attention_mask": np.ones((n, l), np.int32),
        },
        "context_inputs": {
            "input_ids": rng.integers(0, 50, (n * m, l)).astype(np.int32),
            "attention_mask": np.ones((n * m, l), np.int32),
        },
        "labels": (np.arange(n) * m).astype(np.int32),
    }


def test_biencoder_trainee_with_trainer(devices, tmp_path):
    be = make_biencoder()
    ctx = meshlib.make_mesh(data=8)
    tx = optim.make_optimizer(be.params, lr=1e-3, total_steps=6)
    with meshlib.use(ctx):
        trainer = Trainer(
            be.loss_fn, be.params, tx,
            TrainerConfig(max_steps=4, log_every=2, eval_every=2,
                          ckpt_dir=str(tmp_path / "c"), monitor="MRR@N*M"),
            mesh_ctx=ctx, eval_fn=be.eval_fn,
        )
        result = trainer.fit(
            [biencoder_batch(seed=s) for s in range(3)],
            eval_batches=lambda: [biencoder_batch(seed=9)],
        )
        assert result["final_step"] == 4
        assert result["best_metric"] is not None
        # test-after-fit reloads the best checkpoint
        metrics = run_test_after_fit(trainer, lambda: [biencoder_batch(seed=9)])
        assert "MRR@N*M" in metrics

    # export (save_ptm contract) from the checkpoint
    out = save_ptm.save_ptm(
        tmp_path / "c", tmp_path / "export", trainer.state
    )
    assert any("question_model" in e for e in out["exported"])
    restored = __import__(
        "viquae_tpu.train.checkpoint", fromlist=["import_params"]
    ).import_params(
        tmp_path / "export" / "question_model", be.params["question"]
    )
    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(
        be.params["question"]
    )


def test_reader_trainee_eval_and_m_tuning(tokenizer, tmp_path):
    cfg = qa.ReaderConfig(bert=bert.BertConfig(**TINY))
    params = qa.init(jax.random.key(0), cfg)
    rt = trainee.ReaderTrainee(cfg, params, tokenizer, m_passages=2,
                               tune_M=False)
    n, m, L, A = 2, 2, 10, 2
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(5, 50, (n * m, L)).astype(np.int32),
        "attention_mask": np.ones((n * m, L), np.int32),
        "start_positions": rng.integers(1, L - 1, (n, m, A)),
        "end_positions": rng.integers(1, L - 1, (n, m, A)),
        "answer_mask": np.ones((n, m, A), np.int32),
        "answer_strings": [["w7"]] * (n * m),
        "passage_scores": rng.uniform(1, 2, n * m).astype(np.float32),
    }
    result = rt.test(params, [batch], tmp_path / "log")
    assert (tmp_path / "log" / "metrics.json").exists()
    assert (tmp_path / "log" / "predictions.json").exists()
    assert (tmp_path / "log" / "weighted_predictions.json").exists()
    assert len(result["predictions"]) == n
    assert result["metrics"]["exact_match"] is not None

    # M tuning over cached log-probs
    outputs = [rt.eval_batch(params, batch)]
    sweep = rt.m_tuning(outputs, tmp_path / "log")
    assert [s["@M"] for s in sweep] == [1, 2]
    assert (tmp_path / "log" / "metrics_wrt_m.json").exists()


def test_power_range():
    assert list(trainee.power_range(24)) == [1, 2, 4, 8, 16, 24]
    assert list(trainee.power_range(4)) == [1, 2, 4]


def test_biencoder_packed_training(tokenizer, devices):
    """BiEncoderCollator(packed=True) + DPREncoder.packed_apply_fn: the
    packed loss equals the padded loss exactly (CLS pooling, mask-free)."""
    import jax
    from viquae_tpu.models import dpr
    from viquae_tpu.train import data as tdata

    dcfg = dpr.DPRConfig(bert=bert.BertConfig(**TINY))
    q_model = dpr.DPREncoder(cfg=dcfg, seed=0)
    c_model = dpr.DPREncoder(cfg=dcfg, seed=1)
    be = trainee.BiEncoderTrainee(q_model, c_model)

    kb = [{"passage": f"ent{i} fact{i} answer", "index": i} for i in range(8)]
    items = [
        {"id": f"q{i}", "input": f"question about ent{i}",
         "search_provenance_indices": [i],
         "search_irrelevant_indices": [(i + 3) % 8]}
        for i in range(4)
    ]
    packed_coll = tdata.BiEncoderCollator(
        tokenizer, kb=kb, M=2, max_length=16, seed=0, packed=True)
    padded_coll = tdata.BiEncoderCollator(
        tokenizer, kb=kb, M=2, max_length=16, seed=0, packed=False)
    b_packed = packed_coll.collate_fn(items)
    b_padded = padded_coll.collate_fn(items)
    assert "canvas_input_ids" in b_packed["question_inputs"]

    lp, _ = be.loss_fn(be.params, b_packed, jax.random.key(0),
                       deterministic=True)
    lu, _ = be.loss_fn(be.params, b_padded, jax.random.key(0),
                       deterministic=True)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)

    # token types are incompatible with packing
    with pytest.raises(ValueError):
        tdata.BiEncoderCollator(tokenizer, kb=kb, M=2, max_length=16,
                                packed=True, passage_type_ids=True)


def test_reader_trainee_eval_fn_with_trainer(tokenizer, devices):
    """Round-3 review: readers exposed no fit-time eval_fn, so the rc
    recipes' monitor: f1 had nothing to watch. The 2-arg eval_fn contract
    (outputs + host batches) must surface exact_match/f1 from
    Trainer.evaluate."""
    import optax

    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.train.trainer import Trainer, TrainerConfig

    cfg = qa.ReaderConfig(bert=bert.BertConfig(**TINY))
    params = qa.init(jax.random.key(0), cfg)
    rt = trainee.ReaderTrainee(cfg, params, tokenizer, m_passages=2)
    n, m, L, A = 2, 2, 10, 2
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(5, 50, (n * m, L)).astype(np.int32),
        "attention_mask": np.ones((n * m, L), np.int32),
        "start_positions": rng.integers(1, L - 1, (n, m, A)),
        "end_positions": rng.integers(1, L - 1, (n, m, A)),
        "answer_mask": np.ones((n, m, A), np.int32),
        "answer_strings": [["w7"]] * (n * m),
    }
    ctx = meshlib.make_mesh(data=8)
    with meshlib.use(ctx):
        t = Trainer(rt.loss_fn, params, optax.sgd(1e-3),
                    TrainerConfig(log_every=0), mesh_ctx=ctx,
                    eval_fn=rt.eval_fn)
        metrics = t.evaluate([batch])
    assert set(metrics) >= {"loss", "exact_match", "f1"}
    assert 0.0 <= metrics["f1"] <= 1.0


def test_moe_biencoder_packed_training(tokenizer, devices):
    """MoE towers through the PACKED trainee path: return_aux plumbing via
    DPREncoder.packed_apply_fn. With the aux weight zeroed, packed ==
    padded loss (ample expert capacity -> per-token routing unaffected by
    the differing pad-token sets); with it on, the loss carries the term."""
    from viquae_tpu.models import dpr
    from viquae_tpu.train import data as tdata

    cfg = dpr.DPRConfig(bert=bert.BertConfig(
        **TINY, moe_experts=2, moe_capacity_factor=8.0))
    q_model = dpr.DPREncoder(cfg=cfg, seed=0)
    c_model = dpr.DPREncoder(cfg=cfg, seed=1)

    kb = [{"passage": f"ent{i} fact{i} answer", "index": i} for i in range(8)]
    items = [
        {"id": f"q{i}", "input": f"question about ent{i}",
         "search_provenance_indices": [i],
         "search_irrelevant_indices": [(i + 3) % 8]}
        for i in range(4)
    ]
    b_packed = tdata.BiEncoderCollator(
        tokenizer, kb=kb, M=2, max_length=16, seed=0, packed=True
    ).collate_fn(items)
    b_padded = tdata.BiEncoderCollator(
        tokenizer, kb=kb, M=2, max_length=16, seed=0, packed=False
    ).collate_fn(items)

    be0 = trainee.BiEncoderTrainee(q_model, c_model, moe_aux_weight=0.0)
    lp, op = be0.loss_fn(be0.params, b_packed, jax.random.key(0),
                         deterministic=True)
    lu, _ = be0.loss_fn(be0.params, b_padded, jax.random.key(0),
                        deterministic=True)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-5)
    assert "moe_aux" in op  # surfaced (zero-weighted) even at weight 0

    be = trainee.BiEncoderTrainee(q_model, c_model, moe_aux_weight=0.05)
    lw, ow = be.loss_fn(be.params, b_packed, jax.random.key(0),
                        deterministic=True)
    aux = float(ow["moe_aux"])
    assert aux > 0.0
    np.testing.assert_allclose(float(lw), float(lp) + aux, rtol=1e-6)
