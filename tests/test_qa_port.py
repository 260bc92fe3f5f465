"""Reader weight-port parity (egress-runbook step 2, VERDICT r4 item 7).

The reference fine-tunes its ViQuAE reader FROM the released TriviaQA
MultiPassageBERT checkpoint (EXPERIMENTS.rst: `save_ptm` the best TriviaQA
step, set it as pre-trained model). qa.params_from_pretrained_dir is the
port that makes docs/RUNBOOK_EGRESS.md executable the day an egress host
exists — these tests pin its logic on locally-saved tiny checkpoints.
"""
import numpy as np
import pytest

TINY = dict(
    vocab_size=1100, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def reader_ckpt_dir(tmp_path_factory):
    """Tiny BertForQuestionAnswering saved with save_pretrained (the layout
    of PaulLerner/multi_passage_bert_triviaqa_without_viquae_*)."""
    import torch
    from transformers import BertConfig, BertForQuestionAnswering

    torch.manual_seed(7)
    model = BertForQuestionAnswering(BertConfig(**TINY)).eval()
    root = tmp_path_factory.mktemp("reader_ckpt")
    model.save_pretrained(root)
    return root, model


def test_reader_port_logit_parity(reader_ckpt_dir):
    import jax.numpy as jnp
    import torch

    from viquae_tpu.models import qa

    path, model = reader_ckpt_dir
    params, cfg = qa.params_from_pretrained_dir(path)
    assert cfg.bert.hidden_size == TINY["hidden_size"]
    assert not cfg.fuse_ir_score

    rng = np.random.default_rng(0)
    n, m, L = 2, 3, 16
    ids = rng.integers(5, TINY["vocab_size"], (n * m, L))
    mask = (rng.random((n * m, L)) > 0.2).astype(np.int64)
    mask[:, 0] = 1
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask))
    out = qa.reader_apply(
        params, cfg, jnp.asarray(ids, jnp.int32),
        attention_mask=jnp.asarray(mask, jnp.int32), m_passages=m,
    )
    np.testing.assert_allclose(
        np.asarray(out.start_logits).reshape(n * m, L)[mask == 1],
        ref.start_logits.numpy()[mask == 1], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out.end_logits).reshape(n * m, L)[mask == 1],
        ref.end_logits.numpy()[mask == 1], atol=2e-5)


def test_reader_port_fused_score_proj(reader_ckpt_dir, tmp_path):
    """The fused variant's score_proj_w/b ride the raw state dict (HF
    from_pretrained would drop them as unexpected keys)."""
    import torch

    from viquae_tpu.models import qa

    path, model = reader_ckpt_dir
    sd = dict(model.state_dict())
    sd["score_proj_w"] = torch.full((1, 1), 2.5)
    sd["score_proj_b"] = torch.full((1,), -0.5)
    model.config.save_pretrained(tmp_path)
    torch.save(sd, tmp_path / "pytorch_model.bin")

    cfg = qa.ReaderConfig(
        bert=__import__("viquae_tpu.models.bert", fromlist=["bert"])
        .BertConfig.from_hf(model.config, add_pooler=False),
        fuse_ir_score=True,
    )
    params, cfg2 = qa.params_from_pretrained_dir(tmp_path, cfg)
    assert float(params["score_proj_w"][0, 0]) == 2.5
    assert float(params["score_proj_b"][0]) == -0.5


def test_build_trainee_pretrained(reader_ckpt_dir):
    """train/run.build_trainee wires `pretrained:` — the rc recipe's
    init-from-TriviaQA step."""
    from viquae_tpu.train.run import build_trainee

    path, model = reader_ckpt_dir
    trainee = build_trainee(
        {"kind": "reader", "pretrained": str(path), "m_passages": 3},
        tokenizer=None,
    )
    assert trainee.cfg.bert.hidden_size == TINY["hidden_size"]
    ref_emb = model.state_dict()["bert.embeddings.word_embeddings.weight"]
    np.testing.assert_array_equal(
        np.asarray(trainee.params["bert"]["embeddings"]["word"]),
        ref_emb.numpy())
    # fused fine-tune FROM a non-fused checkpoint seeds identity fusion
    trainee_f = build_trainee(
        {"kind": "reader", "pretrained": str(path), "fuse_ir_score": True,
         "m_passages": 3},
        tokenizer=None,
    )
    assert float(trainee_f.params["score_proj_w"][0, 0]) == 1.0


# ---------------------------------------------------------------------------
# `train test` checkpoint restore (reference: trainer test --ckpt_path)
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def rc_workspace(tmp_path_factory):
    from datasets import Dataset

    tmp_path = tmp_path_factory.mktemp("rc_ws")
    passages = [f"w{i} is famous the answer is w{i + 20}" for i in range(12)]
    Dataset.from_dict({"passage": passages}).save_to_disk(
        str(tmp_path / "kb"))
    Dataset.from_dict({
        "id": [f"q{i}" for i in range(6)],
        "input": [f"what about w{i}" for i in range(6)],
        "output": [{"original_answer": f"w{i + 20}",
                    "answer": [f"w{i + 20}"],
                    "provenance": [{"title": [f"T{i}"]}]}
                   for i in range(6)],
        "search_provenance_indices": [[i] for i in range(6)],
        "search_provenance_scores": [[5.0]] * 6,
        "search_irrelevant_indices": [[(i + 3) % 12] for i in range(6)],
        "search_irrelevant_scores": [[1.0]] * 6,
        "search_indices": [[i, (i + 3) % 12] for i in range(6)],
        "search_scores": [[5.0, 1.0]] * 6,
    }).save_to_disk(str(tmp_path / "questions"))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(40)
    ] + ["what", "about", "is", "famous", "the", "answer"]
    (tmp_path / "tok").mkdir()
    (tmp_path / "tok" / "vocab.txt").write_text("\n".join(vocab))
    return tmp_path


def _rc_config(ws, tmp_path, **overrides):
    cfg = {
        "seed": 42,
        "trainee": {"kind": "reader", "m_passages": 2,
                    "bert_config": {
                        "vocab_size": 64, "hidden_size": 16,
                        "num_hidden_layers": 1, "num_attention_heads": 2,
                        "intermediate_size": 32,
                        "max_position_embeddings": 32}},
        "data": {"tokenizer": str(ws / "tok"),
                 "dataset": str(ws / "questions"), "kb": str(ws / "kb"),
                 "collator": "reader", "M": 2, "n_relevant_passages": 1,
                 "max_n_answers": 2, "batch_size": 3, "max_length": 16},
        "optimizer": {"lr": 1e-4, "total_steps": 2},
        "trainer": {"max_steps": 2, "log_every": 1,
                    "ckpt_dir": str(tmp_path / "ckpts"),
                    "ckpt_every": 1},
    }
    cfg.update(overrides)
    return cfg


def test_train_test_restores_checkpoint(rc_workspace, tmp_path):
    """fit with ckpt_dir, then `test` restores the saved step and emits
    metrics.json/predictions.json with the rc metric keys."""
    import json

    import yaml

    from viquae_tpu.train.run import run_from_config

    ws = rc_workspace
    cfg = _rc_config(ws, tmp_path)
    cfg_path = tmp_path / "rc.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    run_from_config(cfg_path, subcommand="fit")

    test_cfg = _rc_config(ws, tmp_path)
    test_cfg["data"]["train"] = False
    test_path = tmp_path / "rc_test.yaml"
    test_path.write_text(yaml.safe_dump(test_cfg))
    result = run_from_config(test_path, subcommand="test")
    assert set(result["metrics"]) >= {"exact_match", "f1"}
    metrics = json.loads((tmp_path / "ckpts" / "metrics.json").read_text())
    assert "exact_match" in metrics and "f1" in metrics
    # compare_rc_metrics consumes this file (machine-readable runbook step)
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "compare_rc_metrics.py"),
         str(tmp_path / "ckpts" / "metrics.json"),
         "--expected-em", str(metrics["exact_match"]),
         "--expected-f1", str(metrics["f1"]),
         "--out", str(tmp_path / "cmp.json")],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert json.loads(proc.stdout)["pass"] is True


def test_train_fit_ckpt_path_resumes(rc_workspace, tmp_path):
    """`fit --ckpt-path` resumes training from the latest saved step
    (reference parity: Lightning trainer fit --ckpt_path), rather than
    silently training from scratch."""
    import yaml

    from viquae_tpu.train.run import run_from_config

    ws = rc_workspace
    cfg = _rc_config(ws, tmp_path)
    cfg_path = tmp_path / "rc.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    r1 = run_from_config(cfg_path, subcommand="fit")
    assert r1["final_step"] == 2

    cfg2 = _rc_config(ws, tmp_path)
    cfg2["trainer"]["max_steps"] = 4
    cfg2_path = tmp_path / "rc_resume.yaml"
    cfg2_path.write_text(yaml.safe_dump(cfg2))
    r2 = run_from_config(cfg2_path, subcommand="fit",
                         ckpt_path=str(tmp_path / "ckpts"))
    # resumed at step 2: only steps 3..4 were trained this run
    assert r2["final_step"] == 4
    assert all(h["step"] > 2 for h in r2["history"])

    # a ckpt_path with no steps must raise, not train from scratch
    cfg3 = _rc_config(ws, tmp_path)
    cfg3["trainer"].pop("ckpt_dir")
    cfg3_path = tmp_path / "rc_bad.yaml"
    cfg3_path.write_text(yaml.safe_dump(cfg3))
    with pytest.raises(ValueError, match="no checkpoint steps"):
        run_from_config(cfg3_path, subcommand="fit",
                        ckpt_path=str(tmp_path / "empty_ckpts"))


def test_train_test_without_checkpoint_raises(rc_workspace, tmp_path):
    import yaml

    from viquae_tpu.train.run import run_from_config

    cfg = _rc_config(rc_workspace, tmp_path)
    cfg["trainer"].pop("ckpt_dir")
    cfg["data"]["train"] = False
    cfg_path = tmp_path / "rc_nockpt.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        run_from_config(cfg_path, subcommand="test")
