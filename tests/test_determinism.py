"""End-to-end determinism through the config-driven CLI (VERDICT r3 item 5).

The reference's reproducibility protocol pins seeds and best-checkpoint
steps (/root/reference/EXPERIMENTS.rst:716-719, train/trainer.py:35) but
never asserts it. Here the whole seeded mini pipeline — `train fit`
(export) -> `embed` (questions + KB with the exported tower) -> `search`
(dense + BM25, fusion fit) — runs TWICE into separate directories and
every artifact must match: params bit-identical, every metrics/run/qrels/
best-params JSON byte-identical.
"""
import json
from pathlib import Path

import numpy as np
import pytest
import yaml

from viquae_tpu.cli import main as cli_main
from viquae_tpu.train.run import run_from_config

BCFG = {
    "vocab_size": 64, "hidden_size": 16, "num_hidden_layers": 1,
    "num_attention_heads": 2, "intermediate_size": 32,
    "max_position_embeddings": 32, "add_pooler": False,
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from datasets import Dataset

    root = tmp_path_factory.mktemp("det_ws")
    passages = [f"w{i} is famous the answer is w{i + 20}" for i in range(12)]
    Dataset.from_dict({"passage": passages}).save_to_disk(str(root / "kb"))
    Dataset.from_dict({
        "id": [f"q{i}" for i in range(6)],
        "input": [f"what about w{i}" for i in range(6)],
        "output": [
            {"original_answer": f"w{i + 20}", "answer": [f"w{i + 20}"],
             "provenance": [{"title": [f"T{i}"]}]}
            for i in range(6)
        ],
        "search_provenance_indices": [[i] for i in range(6)],
        "search_provenance_scores": [[5.0]] * 6,
        "search_irrelevant_indices": [[(i + 3) % 12] for i in range(6)],
        "search_irrelevant_scores": [[1.0]] * 6,
    }).save_to_disk(str(root / "questions"))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(40)
    ] + ["what", "about", "is", "famous", "the", "answer"]
    tok_dir = root / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    from transformers import BertTokenizerFast

    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)
    return root


def _run_chain(workspace, out: Path) -> dict:
    """train fit -> embed questions + kb -> search(+fusion fit); returns
    {relative artifact name: bytes} plus the exported param arrays."""
    out.mkdir(parents=True, exist_ok=True)

    # ---- 1. seeded training, export the question tower ------------------
    train_cfg = {
        "seed": 42,
        "trainee": {
            "kind": "biencoder",
            "question_model": {
                "class_name": "DPREncoder", "seed": 0, "bert_config": BCFG,
            },
        },
        "data": {
            "tokenizer": str(workspace / "tok"),
            "dataset": str(workspace / "questions"),
            "kb": str(workspace / "kb"),
            "M": 2, "batch_size": 3, "max_length": 16,
        },
        "optimizer": {"lr": 1e-4, "total_steps": 4},
        "trainer": {"max_steps": 2, "log_every": 1},
        "export": str(out / "export"),
    }
    (out / "train.yaml").write_text(yaml.safe_dump(train_cfg))
    assert run_from_config(out / "train.yaml", "fit")["final_step"] == 2

    # ---- 2. embed questions and KB with the EXPORTED tower --------------
    model_cfg = {
        "class_name": "DPREncoder",
        "pretrained_model_name_or_path": str(
            out / "export" / "question_model"),
        "bert_config": BCFG,
    }
    for name, (ds, key) in {
        "q_emb": (workspace / "questions", "input"),
        "kb_emb": (workspace / "kb", "passage"),
    }.items():
        cfg = {"model": model_cfg, "tokenizer": str(workspace / "tok"),
               "key": key, "save_as": "dpr_emb",
               "max_length": 16, "batch_size": 4}
        (out / f"{name}.json").write_text(json.dumps(cfg))
        cli_main(["embed", str(ds), str(out / f"{name}.json"),
                  "--output", str(out / name)])

    # ---- 3. dense + BM25 search, fusion fit ------------------------------
    search_cfg = {
        "kb_kwargs": {
            str(out / "kb_emb"): {
                "index_kwargs": {
                    "dpr": {"column": "dpr_emb", "key": "dpr_emb"},
                    "bm25": {"column": "passage", "key": "input",
                             "kind": "BM25"},
                }
            }
        },
        "reference_kb_path": str(out / "kb_emb"),
        "do_fusion": True,
        "fusion_kwargs": {"subcommand": "fit",
                          "norm": "gzmuv", "method": "wsum",
                          "subcommand_kwargs": {"step": 0.25}},
    }
    (out / "search.json").write_text(json.dumps(search_cfg))
    cli_main(["search", str(out / "q_emb"), str(out / "search.json"),
              "--k", "5", "--metrics", str(out / "metrics")])

    artifacts = {}
    for p in sorted((out / "metrics").glob("*.json")):
        artifacts[p.name] = p.read_bytes()
    assert "metrics.json" in artifacts and "qrels.json" in artifacts
    assert any("best_params" in name for name in artifacts), artifacts.keys()
    npz = np.load(out / "export" / "question_model" / "params.npz")
    params = {k: npz[k].copy() for k in npz.files}
    embeds = np.asarray(
        __import__("datasets").load_from_disk(str(out / "q_emb"))["dpr_emb"])
    return {"artifacts": artifacts, "params": params, "embeds": embeds}


@pytest.mark.slow  # ~75-100s: marked slow per the <20-min default-suite budget
def test_cli_pipeline_is_deterministic(workspace, tmp_path):
    a = _run_chain(workspace, tmp_path / "run_a")
    b = _run_chain(workspace, tmp_path / "run_b")

    # exported params bit-identical across runs
    assert a["params"].keys() == b["params"].keys()
    for k in a["params"]:
        np.testing.assert_array_equal(a["params"][k], b["params"][k], err_msg=k)

    # query embeddings bit-identical
    np.testing.assert_array_equal(a["embeds"], b["embeds"])

    # every metrics/run/qrels/best-params JSON byte-identical
    assert a["artifacts"].keys() == b["artifacts"].keys()
    for name in a["artifacts"]:
        assert a["artifacts"][name] == b["artifacts"][name], (
            f"{name} differs between identically-seeded runs")

    # the dense run actually retrieved something (not an empty-run artifact)
    run = json.loads(a["artifacts"]["dpr.json"])
    assert run and all(len(v) > 0 for v in run.values())
