"""CLI + config-driven training end-to-end on tiny on-disk datasets."""
import json

import numpy as np
import pytest

from viquae_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from datasets import Dataset

    root = tmp_path_factory.mktemp("ws")
    passages = []
    for i in range(12):
        passages.append(f"w{i} is famous the answer is w{i + 20}")
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
    return root


def test_cli_stats(workspace, capsys):
    cli_main(["stats", str(workspace / "questions")])
    out = json.loads(capsys.readouterr().out)
    assert out["n_items"] == 6


def test_cli_search_bm25(workspace, capsys, tmp_path):
    config = {
        "kb_kwargs": {
            str(workspace / "kb"): {
                "index_kwargs": {
                    "bm25": {"column": "passage", "key": "input",
                             "kind": "BM25"},
                }
            }
        },
        "reference_kb_path": str(workspace / "kb"),
        "do_fusion": False,
    }
    cfg_path = tmp_path / "search.json"
    cfg_path.write_text(json.dumps(config))
    cli_main([
        "search", str(workspace / "questions"), str(cfg_path),
        "--k", "5", "--metrics", str(tmp_path / "m"),
    ])
    assert (tmp_path / "m" / "metrics.json").exists()
    out = capsys.readouterr().out
    assert "bm25" in out


def test_cli_train_fit(workspace, tmp_path, capsys):
    config = {
        "seed": 42,
        "trainee": {
            "kind": "biencoder",
            "question_model": {
                "class_name": "DPREncoder", "seed": 0,
                "cfg": None,
            },
        },
        "data": {
            "tokenizer": str(workspace / "tok"),
            "dataset": str(workspace / "questions"),
            "kb": str(workspace / "kb"),
            "M": 2,
            "batch_size": 3,
            "max_length": 16,
        },
        "optimizer": {"lr": 1e-4, "total_steps": 4},
        "trainer": {"max_steps": 2, "log_every": 1},
        "export": str(tmp_path / "export"),
    }
    import yaml

    from viquae_tpu.train.run import run_from_config

    # size the tower from the config tree (the YAML-facing path)
    config["trainee"]["question_model"] = {
        "class_name": "DPREncoder", "seed": 0,
        "bert_config": {
            "vocab_size": 64, "hidden_size": 16, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 32, "add_pooler": False,
        },
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    result = run_from_config(cfg_path, subcommand="fit")
    assert result["final_step"] == 2
    assert (tmp_path / "export" / "question_model" / "params.npz").exists()


def test_cli_faces_random_weights(workspace, tmp_path):
    """Face-detection stage through the CLI with random-init MTCNN
    (thresholds 0 so the random cascade emits detections)."""
    import json

    from datasets import Dataset
    from PIL import Image
    import numpy as np

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (100, 80, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / f"im{i}.jpg")
    ds_dir = tmp_path / "faces_ds"
    Dataset.from_dict({"image": [f"im{i}.jpg" for i in range(2)]}).save_to_disk(
        str(ds_dir)
    )
    cfg = tmp_path / "faces.json"
    cfg.write_text(json.dumps({
        "mtcnn": {"canvas": 128, "min_face_size": 40, "max_faces": 2,
                  "k_per_scale": 8, "k_stage1": 16, "k_stage2": 8,
                  "thresholds": [0.0, 0.0, 0.0]},
        "batch_size": 2,
    }))
    import os

    os.environ["VIQUAE_IMAGES_PATH"] = str(img_dir)
    try:
        cli_main(["faces", str(ds_dir), "--config", str(cfg)])
    finally:
        del os.environ["VIQUAE_IMAGES_PATH"]
    from datasets import load_from_disk

    out = load_from_disk(str(ds_dir))
    assert "face_prob" in out.column_names
    assert "face_landmarks" in out.column_names


def test_cli_embed_multimodal(tmp_path, devices):
    """`embed` routes configs with an image_features block to MMEmbedder
    (ECAEncoder by class_name over precomputed face/image columns)."""
    import jax
    from datasets import Dataset, load_from_disk
    from transformers import BertTokenizerFast

    from viquae_tpu.models import bert as bert_lib
    from viquae_tpu.models import mm
    from viquae_tpu.train.checkpoint import export_params

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "who", "is",
             "this"] + [f"ent{i}" for i in range(10)]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    bcfg = dict(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=16, add_pooler=False)
    cfg = mm.MMConfig(bert=bert_lib.BertConfig(**bcfg), n_faces=2,
                      face_dim=8, image_dims=(("clip", 10),))
    export_params(tmp_path / "params", mm.eca_init(jax.random.key(0), cfg))

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        rows.append({
            "input": f"who is this ent{i}",
            "face_embedding": (None if i == 1 else
                               rng.standard_normal((2, 8)).astype(np.float32).tolist()),
            "face_box": (None if i == 1 else
                         rng.standard_normal((2, 7)).astype(np.float32).tolist()),
            "clip": rng.standard_normal(10).astype(np.float32).tolist(),
        })
    Dataset.from_list(rows).save_to_disk(str(tmp_path / "ds"))

    config = {
        "model": {"class_name": "ECAEncoder",
                  "pretrained_model_name_or_path": str(tmp_path / "params"),
                  "bert": bcfg, "n_faces": 2, "face_dim": 8,
                  "image_dims": {"clip": 10}},
        "tokenizer": str(tok_dir),
        "image_features": {"n_faces": 2, "face_dim": 8,
                           "image_dims": {"clip": 10}},
        "key": "input", "save_as": "mm_embedding",
        "max_length": 8, "batch_size": 2,
    }
    (tmp_path / "cfg.json").write_text(json.dumps(config))
    cli_main(["embed", str(tmp_path / "ds"), str(tmp_path / "cfg.json"),
              "--output", str(tmp_path / "out")])
    out = load_from_disk(str(tmp_path / "out"))
    emb = np.asarray(out["mm_embedding"])
    assert emb.shape == (3, 16) and np.isfinite(emb).all()
    assert len({tuple(r.round(5)) for r in emb}) == 3

    # a multimodal model without image_features must fail with a clear error
    del config["image_features"]
    (tmp_path / "bad.json").write_text(json.dumps(config))
    with pytest.raises(ValueError, match="image_features"):
        cli_main(["embed", str(tmp_path / "ds"), str(tmp_path / "bad.json"),
                  "--output", str(tmp_path / "out2")])


def test_cli_embed_image_hf_alias_conflict(tmp_path, devices):
    """embed-image accepts HF CLIPVisionConfig names; conflicting old+new
    spellings are rejected."""
    from datasets import Dataset

    Dataset.from_dict({"image": ["nope.png"]}).save_to_disk(
        str(tmp_path / "ds")
    )
    cfg = {"model": "clip-vit",
           "model_config": {"hidden_size": 16, "num_hidden_layers": 1,
                            "num_layers": 3, "num_heads": 2,
                            "intermediate_size": 32, "image_size": 32,
                            "patch_size": 16, "projection_dim": 8},
           "save_as": "emb", "image_size": 32, "batch_size": 1}
    (tmp_path / "cfg.json").write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="num_hidden_layers"):
        cli_main(["embed-image", str(tmp_path / "ds"),
                  str(tmp_path / "cfg.json")])


def test_cli_config_both_styles(workspace, tmp_path, capsys):
    """Configs are accepted positionally or via --config; both/neither fail."""
    (tmp_path / "cfg.json").write_text("{}")
    with pytest.raises(SystemExit):
        cli_main(["hp"])  # neither
    assert "config is required" in capsys.readouterr().err
    with pytest.raises(SystemExit):
        cli_main(["hp", str(tmp_path / "cfg.json"),
                  "--config", str(tmp_path / "cfg.json")])  # both
    assert "both positionally" in capsys.readouterr().err


def test_cli_serve(tmp_path, capsys):
    """`serve`: query file -> fused packed retrieval -> run JSON."""
    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(0)
    kb_rows = rng.standard_normal((40, 16)).astype(np.float32)
    Dataset.from_dict(
        {"embedding": kb_rows.tolist()}
    ).save_to_disk(str(tmp_path / "kb"))

    bcfg = dict(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=32, add_pooler=False)
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": bcfg},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "global"},
    }
    (tmp_path / "serve.json").write_text(json.dumps(config))
    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(9)]
    (tmp_path / "queries.txt").write_text("\n".join(queries))

    cli_main([
        "serve", str(tmp_path / "queries.txt"),
        str(tmp_path / "serve.json"), str(tmp_path / "run.json"),
        "--k", "5", "--batch", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["queries"] == 9
    run = json.loads((tmp_path / "run.json").read_text())
    assert len(run) == 9
    assert all(len(v) == 5 for v in run.values())


def test_cli_serve_fusion(tmp_path, capsys):
    """`serve` with a late-fusion config ("indexes"/"weights"/"text_index"
    + query_features .npy) routes through MultiIndexRetrievalPipeline."""
    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(1)
    kb_rows = rng.standard_normal((40, 16)).astype(np.float32)
    Dataset.from_dict(
        {"embedding": kb_rows.tolist()}
    ).save_to_disk(str(tmp_path / "kb"))
    from viquae_tpu.ops import mips
    clip_idx = mips.DenseIndex(
        rng.standard_normal((40, 8)).astype(np.float32), do_l2norm=True)
    clip_idx.save(str(tmp_path / "clip_idx"))

    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(9)]
    np.save(tmp_path / "q_clip.npy",
            rng.standard_normal((9, 8)).astype(np.float32))

    bcfg = dict(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=32, add_pooler=False)
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": bcfg},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "indexes": {
            "dpr": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                    "mode": "global"},
            "clip": {"load": str(tmp_path / "clip_idx.npz"),
                     "mode": "global"},
        },
        "weights": {"dpr": 0.6, "clip": 0.4},
        "text_index": "dpr",
        "norm": "gzmuv",
        "query_features": {"clip": str(tmp_path / "q_clip.npy")},
    }
    (tmp_path / "serve.json").write_text(json.dumps(config))
    (tmp_path / "queries.txt").write_text("\n".join(queries))

    cli_main([
        "serve", str(tmp_path / "queries.txt"),
        str(tmp_path / "serve.json"), str(tmp_path / "run.json"),
        "--k", "5", "--batch", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["queries"] == 9
    run = json.loads((tmp_path / "run.json").read_text())
    assert len(run) == 9
    assert all(len(v) == 5 for v in run.values())


def test_cli_embed_packed_matches_padded(tmp_path, devices):
    """`embed` with "packed": true routes to PackedColumnEmbedder (packed
    corpus embedding) and matches the padded TextEmbedder column."""
    import json

    from datasets import Dataset, load_from_disk
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(40)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(0)
    texts = [
        " ".join(f"w{j}" for j in rng.integers(0, 40, rng.integers(3, 12)))
        for _ in range(17)
    ]
    Dataset.from_dict({"passage": texts}).save_to_disk(str(tmp_path / "ds"))
    Dataset.from_dict({"passage": texts}).save_to_disk(str(tmp_path / "ds2"))

    base = {
        "model": {
            "class_name": "DPREncoder",
            "bert_config": dict(
                vocab_size=50, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=32, add_pooler=False),
            "seed": 3,
        },
        "tokenizer": str(tok_dir),
        "max_length": 16,
        "batch_size": 8,
    }
    (tmp_path / "pad.json").write_text(json.dumps(
        {**base, "key": "passage", "save_as": "embedding"}))
    (tmp_path / "packed.json").write_text(json.dumps(
        {**base, "key": "passage", "save_as": "embedding", "packed": True}))

    cli_main(["embed", str(tmp_path / "ds"), str(tmp_path / "pad.json")])
    cli_main(["embed", str(tmp_path / "ds2"), str(tmp_path / "packed.json")])
    pad = np.asarray(load_from_disk(str(tmp_path / "ds"))["embedding"])
    packed = np.asarray(load_from_disk(str(tmp_path / "ds2"))["embedding"])
    np.testing.assert_allclose(packed, pad, rtol=2e-4, atol=2e-4)


def test_cli_answer(tmp_path, capsys, devices):
    """`answer`: query file -> retrieve -> read -> answers JSON."""
    import json

    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(0)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 30, 8))
             for _ in range(40)]
    Dataset.from_dict({
        "passage": texts,
        "embedding": rng.standard_normal((40, 16)).astype(np.float32).tolist(),
    }).save_to_disk(str(tmp_path / "kb"))

    bcfg = dict(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=64, add_pooler=False)
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": bcfg},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "fused"},
        "reader": {"class_name": "MultiPassageBERTReader",
                   "bert_config": {k: v for k, v in bcfg.items()
                                   if k != "add_pooler"}},
        "passages": str(tmp_path / "kb"),
        "reader_seq": 48,
        "questions_per_step": 4,
        "packed_reader": True,
    }
    (tmp_path / "answer.json").write_text(json.dumps(config))
    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(9)]
    (tmp_path / "queries.txt").write_text("\n".join(queries))

    cli_main([
        "answer", str(tmp_path / "queries.txt"),
        str(tmp_path / "answer.json"), str(tmp_path / "answers.json"),
        "--m-passages", "3", "--batch", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["queries"] == 9
    results = json.loads((tmp_path / "answers.json").read_text())
    assert len(results) == 9
    assert all(r["answer"] is not None and r["question"] for r in results)
    assert all(len(r["passage_ids"]) == 3 for r in results)


def test_cli_answer_fusion(tmp_path, capsys, devices):
    """`answer` with a late-fusion retrieval config: the reference's best
    config (multi-index wsum) feeding the reader, end to end."""
    import json

    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 30, 8))
             for _ in range(40)]
    Dataset.from_dict({
        "passage": texts,
        "embedding": rng.standard_normal((40, 16)).astype(np.float32).tolist(),
        "clip": rng.standard_normal((40, 8)).astype(np.float32).tolist(),
    }).save_to_disk(str(tmp_path / "kb"))
    np.save(tmp_path / "q_clip.npy",
            rng.standard_normal((9, 8)).astype(np.float32))

    bcfg = dict(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=64, add_pooler=False)
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": bcfg},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "indexes": {
            "dpr": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                    "mode": "fused"},
            "clip": {"dataset": str(tmp_path / "kb"), "column": "clip",
                     "mode": "global"},
        },
        "weights": {"dpr": 0.6, "clip": 0.4},
        "text_index": "dpr",
        "query_features": {"clip": str(tmp_path / "q_clip.npy")},
        "reader": {"class_name": "MultiPassageBERTReader",
                   "bert_config": {k: v for k, v in bcfg.items()
                                   if k != "add_pooler"}},
        "passages": str(tmp_path / "kb"),
        "reader_seq": 48,
        "questions_per_step": 4,
        "packed_reader": True,
    }
    (tmp_path / "cfg.json").write_text(json.dumps(config))
    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(9)]
    (tmp_path / "queries.txt").write_text("\n".join(queries))

    cli_main([
        "answer", str(tmp_path / "queries.txt"),
        str(tmp_path / "cfg.json"), str(tmp_path / "out.json"),
        "--m-passages", "3", "--batch", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["queries"] == 9
    results = json.loads((tmp_path / "out.json").read_text())
    assert len(results) == 9
    assert all(r["answer"] is not None for r in results)


def test_cli_serve_hybrid(tmp_path, capsys):
    """`serve` with a "bm25" block routes to HybridRetrievalPipeline:
    dense + BM25 interpolation from one config (the reference's
    BM25-as-index mode, tuned b=0.3/k1=0.5)."""
    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(0)
    kb_rows = rng.standard_normal((40, 16)).astype(np.float32)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 30, 12))
             for _ in range(40)]
    Dataset.from_dict(
        {"embedding": kb_rows.tolist(), "passage": texts}
    ).save_to_disk(str(tmp_path / "kb"))

    bcfg = dict(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=32, add_pooler=False)
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": bcfg},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "global"},
        "bm25": {"kb": str(tmp_path / "kb"), "column": "passage",
                 "b": 0.3, "k1": 0.5},
        "weights": [0.7, 0.3],
        "norm": "gzmuv",
    }
    (tmp_path / "serve.json").write_text(json.dumps(config))
    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(9)]
    (tmp_path / "queries.txt").write_text("\n".join(queries))

    cli_main([
        "serve", str(tmp_path / "queries.txt"),
        str(tmp_path / "serve.json"), str(tmp_path / "run.json"),
        "--k", "5", "--batch", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["queries"] == 9
    assert "bm25_host" in out["stages"]
    run = json.loads((tmp_path / "run.json").read_text())
    assert len(run) == 9
    assert all(len(v) == 5 for v in run.values())

    # "device": true in the bm25 block scores the sparse leg on-device
    # (ops/bm25_device.DeviceBM25) — same run contract
    config["bm25"].update(device=True, n_head=8, l_small=16,
                          pool_mid=8, pool_small=16, q_block=4)
    (tmp_path / "serve_dev.json").write_text(json.dumps(config))
    cli_main([
        "serve", str(tmp_path / "queries.txt"),
        str(tmp_path / "serve_dev.json"), str(tmp_path / "run_dev.json"),
        "--k", "5", "--batch", "4",
    ])
    out_dev = json.loads(capsys.readouterr().out)
    assert out_dev["queries"] == 9
    run_dev = json.loads((tmp_path / "run_dev.json").read_text())
    assert len(run_dev) == 9
    # bf16-quantized sparse scores: fused ranking overlap, not equality
    for q in run:
        shared = set(run[q]) & set(run_dev[q])
        assert len(shared) >= 3, (q, run[q], run_dev[q])


def test_cli_answer_hybrid(tmp_path, capsys, devices):
    """`answer` with a "bm25" block: hybrid sparse+dense retrieval in
    front of the packed reader, from one config."""
    import json

    from datasets import Dataset
    from transformers import BertTokenizerFast

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(30)
    ]
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    (tok_dir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(tok_dir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(tok_dir)

    rng = np.random.default_rng(0)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 30, 8))
             for _ in range(40)]
    Dataset.from_dict({
        "passage": texts,
        "embedding": rng.standard_normal((40, 16)).astype(np.float32).tolist(),
    }).save_to_disk(str(tmp_path / "kb"))

    bcfg = dict(vocab_size=40, hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=32,
                max_position_embeddings=64, add_pooler=False)
    config = {
        "model": {"class_name": "DPREncoder", "bert_config": bcfg},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "global"},
        "bm25": {"kb": str(tmp_path / "kb"), "column": "passage",
                 "b": 0.3, "k1": 0.5},
        "weights": [0.7, 0.3],
        "reader": {"class_name": "MultiPassageBERTReader",
                   "bert_config": {k: v for k, v in bcfg.items()
                                   if k != "add_pooler"}},
        "passages": str(tmp_path / "kb"),
        "reader_seq": 48,
        "questions_per_step": 4,
        "packed_reader": True,
    }
    (tmp_path / "answer.json").write_text(json.dumps(config))
    queries = [f"w{i} w{i + 1} w{i + 2}" for i in range(9)]
    (tmp_path / "queries.txt").write_text("\n".join(queries))

    cli_main([
        "answer", str(tmp_path / "queries.txt"),
        str(tmp_path / "answer.json"), str(tmp_path / "answers.json"),
        "--m-passages", "3", "--batch", "4",
    ])
    out = json.loads(capsys.readouterr().out)
    assert out["queries"] == 9
    results = json.loads((tmp_path / "answers.json").read_text())
    assert len(results) == 9
    assert all(r["answer"] is not None for r in results)


def test_cli_train_fit_with_eval_dataset(workspace, tmp_path):
    """Round-3 review: eval_every/monitor/best-keeping were silently inert
    because run_from_config never built eval batches. With
    data.eval_dataset set, eval must run and write ckpt best/."""
    import yaml

    from viquae_tpu.train.run import run_from_config

    config = {
        "seed": 42,
        "trainee": {
            "kind": "biencoder",
            "question_model": {
                "class_name": "DPREncoder", "seed": 0,
                "bert_config": {
                    "vocab_size": 64, "hidden_size": 16,
                    "num_hidden_layers": 1, "num_attention_heads": 2,
                    "intermediate_size": 32,
                    "max_position_embeddings": 32, "add_pooler": False,
                },
            },
        },
        "data": {
            "tokenizer": str(workspace / "tok"),
            "dataset": str(workspace / "questions"),
            "eval_dataset": str(workspace / "questions"),
            "kb": str(workspace / "kb"),
            "M": 2,
            "batch_size": 3,
            "max_length": 16,
        },
        "optimizer": {"lr": 1e-4, "total_steps": 4},
        "trainer": {"max_steps": 2, "log_every": 1, "eval_every": 1,
                    "monitor": "MRR@N*M", "monitor_mode": "max",
                    "ckpt_dir": str(tmp_path / "ck")},
    }
    cfg_path = tmp_path / "train_eval.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    result = run_from_config(cfg_path, subcommand="fit")
    assert result["final_step"] == 2
    assert result["best_step"] is not None
    assert (tmp_path / "ck" / "best").exists()
