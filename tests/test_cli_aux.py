"""CLI coverage of the data-construction / viz / export / interactive
surfaces (viquae_tpu/cli_aux.py) on tiny on-disk fixtures."""
import json

import numpy as np
import pytest

from viquae_tpu.cli import main as cli_main


ALL_SUBCOMMANDS = [
    # cli.py
    "passages", "mapping", "relevant", "embed", "search", "serve",
    "answer", "fuse", "hp", "faces", "face-embed", "embed-image",
    "resize", "stats", "train",
    # cli_aux.py
    "kilt2vqa", "sentences", "face-box", "wikidump", "wit", "labelstudio",
    "mscelebs", "evqa", "infoseek", "html", "plot", "wtl-filter",
    "save-ptm", "server", "interact",
]


def test_every_subcommand_registered():
    """--help must parse for every documented subcommand (a registration
    or argparse-conflict regression fails here, not in a user's shell)."""
    for cmd in ALL_SUBCOMMANDS:
        with pytest.raises(SystemExit) as exc:
            cli_main([cmd, "--help"])
        assert exc.value.code == 0, cmd
    # and the total count matches the documented surface
    with pytest.raises(SystemExit):
        cli_main(["--help"])


# ---------------------------------------------------------------------------
# kilt2vqa chain: ner -> ned -> count-entities -> mentions -> vq -> tasks
# ---------------------------------------------------------------------------
@pytest.fixture()
def kilt_workspace(tmp_path):
    from datasets import Dataset

    Dataset.from_list([
        {
            "id": "q0",
            "input": "Who married Ada Lovelace?",
            "output": {
                "original_answer": "William King",
                "provenance": [
                    {"wikipedia_id": ["1"], "title": ["Ada Lovelace"]},
                    {"wikipedia_id": ["2"], "title": ["Mathematics"]},
                ],
            },
        },
        {
            "id": "q1",
            "input": "Who composed the opera Carmen?",
            "output": {
                "original_answer": "Georges Bizet",
                "provenance": [
                    {"wikipedia_id": ["3"], "title": ["Carmen"]},
                ],
            },
        },
    ]).save_to_disk(str(tmp_path / "questions"))

    Dataset.from_list([
        {"wikipedia_id": "1", "wikipedia_title": "Ada Lovelace",
         "wikidata_info": {"wikidata_id": "Q7259",
                           "aliases": {"alias": ["ada king"]}}},
        {"wikipedia_id": "2", "wikipedia_title": "Mathematics",
         "wikidata_info": {"wikidata_id": "Q395",
                           "aliases": {"alias": []}}},
        {"wikipedia_id": "3", "wikipedia_title": "Carmen",
         "wikidata_info": {"wikidata_id": "Q185968",
                           "aliases": {"alias": ["carmen opera"]}}},
    ]).save_to_disk(str(tmp_path / "wikipedia"))
    return tmp_path


def test_cli_kilt2vqa_chain(kilt_workspace, tmp_path, capsys):
    ws = kilt_workspace
    ner_cfg = tmp_path / "ner.json"
    ner_cfg.write_text(json.dumps({
        "titles": str(ws / "wikipedia"), "title_key": "wikipedia_title",
    }))
    cli_main([
        "kilt2vqa", "ner", str(ws / "questions"),
        "--output", str(tmp_path / "ner_out"), "--config", str(ner_cfg),
    ])
    assert json.loads(capsys.readouterr().out)["items"] == 2

    cli_main([
        "kilt2vqa", "ned", str(tmp_path / "ner_out"),
        "--output", str(tmp_path / "ned_out"),
        "--wikipedia", str(ws / "wikipedia"),
    ])
    capsys.readouterr()
    from datasets import load_from_disk

    ned = load_from_disk(str(tmp_path / "ned_out"))
    entity = ned[0]["placeholder"][0]["entity"]
    assert entity["wikidata_info"]["wikidata_id"] == "Q7259"
    assert entity["wer"] == 0.0

    cli_main([
        "kilt2vqa", "count-entities", str(tmp_path / "ned_out"),
        "--output", str(tmp_path / "entities.json"),
    ])
    assert json.loads(capsys.readouterr().out)["entities"] == 2
    # enrich the counted entities the way wiki.py would (gender/occupation
    # and a heuristics-scored image are inputs of mentions/vq generation)
    entities = json.loads((tmp_path / "entities.json").read_text())
    entities["Q7259"].update({
        "gender": {"value": "http://www.wikidata.org/entity/Q6581072"},
        "instanceof": {"http://www.wikidata.org/entity/Q5": {}},
        "occupation": {"Q121594": {"label": {"value": "mathematician"}}},
        "images": {"File:Ada.jpg": {"heuristics": {"title": True}}},
    })
    entities["Q185968"].update({
        "instanceof": {"http://www.wikidata.org/entity/Q1344": {}},
        "instanceofLabel": {"Q1344": {"value": "opera"}},
        "images": {"File:Carmen.jpg": {"heuristics": {"title": True}}},
    })
    (tmp_path / "entities.json").write_text(json.dumps(entities))

    cli_main([
        "kilt2vqa", "generate-mentions", str(tmp_path / "ned_out"),
        "--output", str(tmp_path / "mention_out"),
        "--entities", str(tmp_path / "entities.json"),
    ])
    capsys.readouterr()
    cli_main([
        "kilt2vqa", "generate-vq", str(tmp_path / "mention_out"),
        "--output", str(tmp_path / "vq_out"),
        "--entities", str(tmp_path / "entities.json"),
    ])
    capsys.readouterr()
    vq = load_from_disk(str(tmp_path / "vq_out"))
    generated = {v["input"] for item in vq for v in item["vq"]}
    assert "Who married this woman?" in generated
    assert "Who composed this opera?" in generated

    cli_main([
        "kilt2vqa", "labelstudio", str(tmp_path / "vq_out"),
        "--output", str(tmp_path / "tasks.json"),
    ])
    n_tasks = json.loads(capsys.readouterr().out)["tasks"]
    tasks = json.loads((tmp_path / "tasks.json").read_text())
    assert len(tasks) == n_tasks >= 2
    assert tasks[0]["data"]["answer"] in ("William King", "Georges Bizet")


# ---------------------------------------------------------------------------
# wikidump / wit
# ---------------------------------------------------------------------------
def test_cli_wikidump(tmp_path, capsys):
    xml = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
<page><ns>6</ns><title>File:Ada.jpg</title><revision><text>
{{Information
|description = Portrait of Ada
}}
[[Category:Ada Lovelace]]
</text></revision></page>
</mediawiki>"""
    (tmp_path / "dump.xml").write_text(xml)
    # entities.json layout (per-qid categories) instead of flat mapping
    (tmp_path / "cats.json").write_text(json.dumps(
        {"Q7259": {"categories": ["Ada Lovelace"]}}
    ))
    cli_main([
        "wikidump", str(tmp_path / "dump.xml"), str(tmp_path / "cats.json"),
        str(tmp_path / "images.json"),
    ])
    assert json.loads(capsys.readouterr().out)["images"] == 1
    images = json.loads((tmp_path / "images.json").read_text())
    assert images["Q7259"][0]["title"] == "File:Ada.jpg"


def test_cli_wit(tmp_path, capsys):
    import csv

    rows = []
    for a in range(10):
        for s in range(3):
            rows.append({
                "language": "en",
                "page_title": f"Article{a}",
                "section_title": f"S{s}",
                "image_url": f"http://x/img_{a}_{s}.jpg",
                "context_section_description": f"text {a} {s}",
                "caption_reference_description": f"cap {a} {s}",
            })
    with open(tmp_path / "wit.tsv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0]), delimiter="\t")
        writer.writeheader()
        writer.writerows(rows)
    cli_main([
        "wit", str(tmp_path / "wit.tsv"), str(tmp_path / "mict"),
    ])
    sizes = json.loads(capsys.readouterr().out)
    assert set(sizes) == {"train", "validation", "test"}
    assert sum(sizes.values()) == 30


def test_cli_sentences(tmp_path, capsys):
    from datasets import Dataset, load_from_disk

    Dataset.from_dict({
        "text": ["First sentence here. Second one! A third?"],
    }).save_to_disk(str(tmp_path / "ds"))
    cli_main(["sentences", str(tmp_path / "ds")])
    assert json.loads(capsys.readouterr().out)["items"] == 1
    out = load_from_disk(str(tmp_path / "ds"))
    sents = out[0]["sentences"]
    assert len(sents) == 3
    assert sents[0]["text"].startswith("First")
    assert all(s["n_tokens"] >= 2 for s in sents)


def test_cli_face_box(tmp_path, capsys, monkeypatch):
    from datasets import Dataset, load_from_disk
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.new("RGB", (200, 100)).save(img_dir / "im0.jpg")
    Dataset.from_list([{
        "image": "im0.jpg",
        "face_box": [[20.0, 10.0, 120.0, 60.0]],
        "face_landmarks": [[[40.0, 20.0], [80.0, 20.0], [60.0, 30.0],
                            [50.0, 45.0], [70.0, 45.0]]],
    }]).save_to_disk(str(tmp_path / "ds"))
    monkeypatch.setenv("VIQUAE_IMAGES_PATH", str(img_dir))
    cli_main(["face-box", str(tmp_path / "ds")])
    assert json.loads(capsys.readouterr().out)["items"] == 1
    out = load_from_disk(str(tmp_path / "ds"))
    box = out[0]["scaled_face_box"][0]
    # x1,y1,x2,y2,w,h,wh scaled by (200,100)
    assert box == pytest.approx([0.1, 0.1, 0.6, 0.6, 0.5, 0.5, 0.25])


# ---------------------------------------------------------------------------
# labelstudio / mscelebs
# ---------------------------------------------------------------------------
def test_cli_labelstudio(tmp_path, capsys):
    t1 = [{"id": 1, "data": {"question": "q1", "answer": "a1"},
           "annotations": [{"result": [
               {"from_name": "discard", "value": {"choices": ["keep"]}}]}]}]
    t2 = [{"id": 1, "data": {"question": "q1", "answer": "a1"},
           "annotations": [{"result": [
               {"from_name": "discard", "value": {"choices": ["keep"]}}]}]},
          {"id": 2, "data": {"question": "q2", "answer": "a2"},
           "annotations": [{"result": [
               {"from_name": "discard",
                "value": {"choices": ["discard"]}}]}]}]
    (tmp_path / "a.json").write_text(json.dumps(t1))
    (tmp_path / "b.json").write_text(json.dumps(t2))

    cli_main(["labelstudio", "merge", str(tmp_path / "a.json"),
              str(tmp_path / "b.json"),
              "--output", str(tmp_path / "merged.json")])
    assert json.loads(capsys.readouterr().out)["tasks"] == 2

    cli_main(["labelstudio", "agreement", str(tmp_path / "merged.json")])
    agreement = json.loads(capsys.readouterr().out)
    assert agreement["n_double_annotated"] == 1
    assert agreement["raw_agreement"] == 1.0

    cli_main(["labelstudio", "vqa", str(tmp_path / "merged.json"),
              "--output", str(tmp_path / "vqa.json")])
    out = json.loads(capsys.readouterr().out)
    assert out == {"kept": 1, "of": 2}  # the discarded task is dropped

    cli_main(["labelstudio", "assign", str(tmp_path / "merged.json"),
              "--n-annotators", "2", "--overlap", "1",
              "--output", str(tmp_path / "assign.json")])
    assigned = json.loads(capsys.readouterr().out)
    assert assigned["annotators"] == 2
    assert (tmp_path / "assign_0.json").exists()
    assert (tmp_path / "assign_1.json").exists()


def test_cli_mscelebs(tmp_path, capsys):
    import base64

    face = base64.b64encode(b"JPEGDATA")
    (tmp_path / "faces.tsv").write_bytes(
        b"m.0abc\timg1\t" + face + b"\nm.0def\timg2\t" + face + b"\n"
    )
    # entities.json layout with wikidata-style freebase ids
    (tmp_path / "entities.json").write_text(json.dumps(
        {"Q1": {"freebase": {"value": "/m/0abc"}}}
    ))
    cli_main(["mscelebs", "entities", str(tmp_path / "faces.tsv"),
              "--mids", str(tmp_path / "entities.json"),
              "--output", str(tmp_path / "counts.json")])
    out = json.loads(capsys.readouterr().out)
    assert out == {"entities_with_faces": 1, "faces": 1}

    cli_main(["mscelebs", "extract", str(tmp_path / "faces.tsv"),
              "--mids", str(tmp_path / "entities.json"),
              "--save-root", str(tmp_path / "out")])
    assert json.loads(capsys.readouterr().out)["extracted"] == 1
    assert (tmp_path / "out" / "m.0abc" / "img1.jpg").exists()


# ---------------------------------------------------------------------------
# evqa / infoseek
# ---------------------------------------------------------------------------
def test_cli_evqa(tmp_path, capsys):
    (tmp_path / "pred.json").write_text(json.dumps(
        {"q0": "Paris", "q1": "cat", "q2": "whatever"}
    ))
    (tmp_path / "ref.json").write_text(json.dumps({
        "q0": {"reference": "paris|lutetia", "question_type": "single"},
        "q1": {"reference": "cat && dog", "question_type": "multi_answer"},
        "q2": {"reference": "other"},
    }))
    cli_main(["evqa", str(tmp_path / "pred.json"), str(tmp_path / "ref.json")])
    out = json.loads(capsys.readouterr().out)
    assert out["n_evaluated"] == 3
    # q0 EM via the | alternative; q1 passes multi-answer IoU (1/2 >= the
    # 0.5 threshold); q2 wrong
    assert out["accuracy"] == pytest.approx(2 / 3)


def test_cli_infoseek(tmp_path, capsys):
    refs = [
        {"data_id": "i0", "question_type": "String",
         "answer_eval": ["paris"]},
        {"data_id": "i1", "question_type": "Numerical",
         "answer_eval": [1.0, 3.0]},
    ]
    preds = [
        {"data_id": "i0", "prediction": "Paris"},
        {"data_id": "i1", "prediction": "2"},
    ]
    (tmp_path / "refs.jsonl").write_text(
        "\n".join(json.dumps(r) for r in refs))
    (tmp_path / "preds.jsonl").write_text(
        "\n".join(json.dumps(p) for p in preds))
    cli_main(["infoseek", str(tmp_path / "preds.jsonl"),
              str(tmp_path / "refs.jsonl")])
    out = json.loads(capsys.readouterr().out)
    assert out["score"] == 100.0


# ---------------------------------------------------------------------------
# viz: html / plot / wtl-filter
# ---------------------------------------------------------------------------
def test_cli_html(tmp_path, capsys):
    from datasets import Dataset

    Dataset.from_list([
        {"id": "q0", "input": "who is this?", "image": "im0.jpg",
         "output": {"original_answer": "Ada"}},
        {"id": "q1", "input": "what is that?", "image": "im1.jpg",
         "output": {"original_answer": "Carmen"}},
    ]).save_to_disk(str(tmp_path / "ds"))
    (tmp_path / "run.json").write_text(json.dumps(
        {"q0": {"3": 2.0, "1": 1.0}, "q1": {"2": 5.0}}
    ))
    Dataset.from_dict({
        "passage": [f"p{i}" for i in range(4)],
        "index": list(range(4)),
    }).save_to_disk(str(tmp_path / "passages"))
    cli_main([
        "html", str(tmp_path / "ds"), str(tmp_path / "out.html"),
        "--run", str(tmp_path / "run.json"),
        "--passages", str(tmp_path / "passages"),
    ])
    html = (tmp_path / "out.html").read_text()
    assert "who is this?" in html and "Ada" in html
    assert "p3" in html  # q0's top-1 passage text


def test_cli_plot(tmp_path, capsys):
    from datasets import Dataset

    rng = np.random.default_rng(0)
    Dataset.from_dict({
        "embedding": rng.standard_normal((20, 8)).tolist(),
        "label": ["a"] * 10 + ["b"] * 10,
    }).save_to_disk(str(tmp_path / "ds"))
    cli_main([
        "plot", str(tmp_path / "ds"), "embedding", "--labels", "label",
        "--method", "pca", "--output", str(tmp_path / "plot.png"),
    ])
    assert json.loads(capsys.readouterr().out)["saved"].endswith("plot.png")
    assert (tmp_path / "plot.png").stat().st_size > 0


def test_cli_wtl_filter(tmp_path, capsys):
    from datasets import Dataset

    Dataset.from_dict({
        "id": ["q0", "q1"], "input": ["a", "b"],
    }).save_to_disk(str(tmp_path / "ds"))
    (tmp_path / "qrels.json").write_text(json.dumps(
        {"q0": {"d0": 1}, "q1": {"d1": 1}}
    ))
    # run wins on q0 (top-1 = d0), loses on q1
    (tmp_path / "run.json").write_text(json.dumps(
        {"q0": {"d0": 2.0, "d9": 1.0}, "q1": {"d9": 2.0, "d1": 1.0}}
    ))
    cli_main([
        "wtl-filter", str(tmp_path / "ds"), str(tmp_path / "qrels.json"),
        str(tmp_path / "run.json"), str(tmp_path / "filtered"),
        "--filter", "win",
    ])
    assert json.loads(capsys.readouterr().out) == {"kept": 1, "of": 2}
    from datasets import load_from_disk

    assert load_from_disk(str(tmp_path / "filtered"))["id"] == ["q0"]


# ---------------------------------------------------------------------------
# save-ptm
# ---------------------------------------------------------------------------
def test_cli_save_ptm(tmp_path, capsys):
    import yaml
    from datasets import Dataset

    from viquae_tpu.train.run import run_from_config

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
    }).save_to_disk(str(tmp_path / "questions"))
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"w{i}" for i in range(40)
    ] + ["what", "about", "is", "famous", "the", "answer"]
    (tmp_path / "tok").mkdir()
    (tmp_path / "tok" / "vocab.txt").write_text("\n".join(vocab))

    config = {
        "seed": 42,
        "trainee": {
            "kind": "biencoder",
            "question_model": {
                "class_name": "DPREncoder", "seed": 0,
                "bert_config": {
                    "vocab_size": 64, "hidden_size": 16,
                    "num_hidden_layers": 1, "num_attention_heads": 2,
                    "intermediate_size": 32, "max_position_embeddings": 32,
                    "add_pooler": False,
                },
            },
        },
        "data": {
            "tokenizer": str(tmp_path / "tok"),
            "dataset": str(tmp_path / "questions"),
            "kb": str(tmp_path / "kb"),
            "M": 2, "batch_size": 3, "max_length": 16,
        },
        "optimizer": {"lr": 1e-4, "total_steps": 2},
        "trainer": {"max_steps": 2, "log_every": 1,
                    "ckpt_dir": str(tmp_path / "ckpts")},
    }
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(yaml.safe_dump(config))
    run_from_config(cfg_path, subcommand="fit")
    capsys.readouterr()

    cli_main(["save-ptm", str(cfg_path), str(tmp_path / "export")])
    out = json.loads(capsys.readouterr().out)
    assert out["step"] == 2
    assert (tmp_path / "export" / "question_model" / "params.npz").exists()


# ---------------------------------------------------------------------------
# interact
# ---------------------------------------------------------------------------
def test_cli_interact(tmp_path, capsys, monkeypatch):
    import io

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
    Dataset.from_dict({
        "embedding": rng.standard_normal((40, 16)).astype(
            np.float32).tolist(),
        "passage": [f"passage number {i}" for i in range(40)],
    }).save_to_disk(str(tmp_path / "kb"))

    config = {
        "model": {"class_name": "DPREncoder", "bert_config": {
            "vocab_size": 40, "hidden_size": 16, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 32,
            "max_position_embeddings": 32, "add_pooler": False,
        }},
        "tokenizer": str(tok_dir),
        "row_len": 16,
        "index": {"dataset": str(tmp_path / "kb"), "column": "embedding",
                  "mode": "global"},
        "passages": str(tmp_path / "kb"),
    }
    (tmp_path / "interact.json").write_text(json.dumps(config))

    monkeypatch.setattr("sys.stdin", io.StringIO("w1 w2 w3\n\n"))
    cli_main(["interact", str(tmp_path / "interact.json"),
              "--k", "3", "--batch", "4"])
    out = capsys.readouterr().out
    assert "ready" in out
    assert "passage number" in out  # top-k lines carry passage text


def test_cli_kilt2vqa_ner_neural(kilt_workspace, tmp_path, capsys):
    """`kilt2vqa ner` with a `neural` config block loads an HF
    BertForTokenClassification dir through models/ner.NeuralNER."""
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertForTokenClassification, BertTokenizerFast

    ws = kilt_workspace
    torch.manual_seed(0)
    id2label = {0: "O", 1: "B-PER", 2: "I-PER"}
    hf_cfg = HFBertConfig(
        vocab_size=40, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, num_labels=3, id2label=id2label,
        label2id={v: k for k, v in id2label.items()},
    )
    mdir = tmp_path / "ner_model"
    BertForTokenClassification(hf_cfg).eval().save_pretrained(mdir)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "who",
             "married", "composed", "the", "opera", "carmen", "ada",
             "lovelace", "?"] + [f"w{i}" for i in range(26)]
    (mdir / "vocab.txt").write_text("\n".join(vocab))
    BertTokenizerFast(
        vocab_file=str(mdir / "vocab.txt"), do_lower_case=True
    ).save_pretrained(mdir)

    cfg = tmp_path / "ner_neural.json"
    cfg.write_text(json.dumps({
        "neural": {"path": str(mdir), "max_length": 16, "batch_size": 2},
    }))
    cli_main([
        "kilt2vqa", "ner", str(ws / "questions"),
        "--output", str(tmp_path / "ner_neural_out"), "--config", str(cfg),
    ])
    assert json.loads(capsys.readouterr().out)["items"] == 2
    from datasets import load_from_disk

    out = load_from_disk(str(tmp_path / "ner_neural_out"))
    assert "placeholder" in out.column_names
