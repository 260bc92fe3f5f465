"""The shipped experiment corpus (configs/experiments/**) loads and
instantiates through the registry (VERDICT r2 item 6).

Every reference recipe's translation must parse, reference only registered
class_names, use only real schema keys (TrainerConfig / make_optimizer /
collator signatures), and carry the reference's tuned values. Trainees are
instantiated with tiny architecture overrides (pretrained paths need data
on disk; class wiring is what these tests pin).
"""
import dataclasses
import inspect
import json
from pathlib import Path

import numpy as np
import pytest

CORPUS = Path(__file__).parent.parent / "configs" / "experiments"
TRAIN_YAMLS = sorted(CORPUS.glob("**/*.yaml"))
IR_JSONS = sorted(CORPUS.glob("ir/**/*.json"))

TINY_BERT = dict(
    vocab_size=64, hidden_size=16, num_hidden_layers=1,
    num_attention_heads=2, intermediate_size=32,
    max_position_embeddings=32,
)


def _load(path):
    from viquae_tpu.core.config import load_config

    return load_config(str(path))


def test_corpus_covers_reference_tree():
    """Spot-check completeness: one config per reference recipe family."""
    names = {p.relative_to(CORPUS).as_posix() for p in CORPUS.glob("**/*")
             if p.is_file()}
    for expected in [
        "passages.json", "dpr/triviaqa.yaml", "dpr/viquae.yaml",
        "ict/eca.yaml", "ict/ilf.yaml", "mm/eca.yaml", "mm/ilf.yaml",
        "rc/triviaqa.yaml", "rc/viquae.yaml", "jcm.yaml",
        "ir/bm25.json", "ir/hp_bm25.json", "ir/dpr_search.json",
        "ir/dpr_questions.json", "ir/dpr_passages.json", "ir/clip.json",
        "ir/eca_embedding.json", "ir/ilf_embedding.json",
        "ir/eca_embedding_kb.json", "ir/ilf_embedding_kb.json",
        "ir/clip_article.json",
        "ir/fusion/dpr+clip.json", "ir/fusion/dpr+clip-cross-modal.json",
        "ir/fusion/dpr+arcface+clip+imagenet.json",
        "ir/fusion/bm25+arcface+clip+imagenet.json",
        "image/face_recognition.json", "image/clip_rn50.json",
        "image/clip_vit.json", "image/imagenet_rn50.json",
    ]:
        assert expected in names, f"missing corpus config {expected}"


@pytest.mark.parametrize("path", TRAIN_YAMLS, ids=lambda p: p.stem)
def test_train_config_instantiates(path, devices):
    """Trainee block builds through build_trainee + the registry (with a
    tiny architecture override in place of pretrained checkpoints), and
    optimizer/trainer blocks only use real schema keys."""
    from viquae_tpu.train.optim import make_optimizer
    from viquae_tpu.train.run import build_trainee
    from viquae_tpu.train.trainer import TrainerConfig

    config = _load(path)
    assert config.get("seed") == 42  # the reference pins seed 42

    trainee_cfg = dict(config["trainee"])

    def shrink(model_cfg):
        if not isinstance(model_cfg, dict):
            return model_cfg
        out = {k: v for k, v in model_cfg.items()
               if k != "pretrained_model_name_or_path"}
        name = out.get("class_name")
        if name == "DPREncoder":
            out["bert_config"] = dict(TINY_BERT, add_pooler=False)
        elif name in ("ECAEncoder", "IntermediateLinearFusion"):
            out["bert"] = TINY_BERT
        elif name in ("CLIPTextTower",):
            out.update(vocab_size=50, hidden_size=16, num_layers=1,
                       num_heads=2, intermediate_size=32, max_positions=16,
                       projection_dim=8, eos_token_id=49)
        elif name in ("CLIPVisionTower",):
            out.update(hidden_size=16, num_layers=1, num_heads=2,
                       intermediate_size=32, image_size=16, patch_size=8,
                       projection_dim=8)
        return out

    for key in ("question_model", "context_model", "text_model",
                "vision_model"):
        if key in trainee_cfg:
            trainee_cfg[key] = shrink(trainee_cfg[key])
    if trainee_cfg.get("kind") == "reader":
        trainee_cfg["bert_config"] = dict(TINY_BERT)

    trainee = build_trainee(trainee_cfg)
    assert hasattr(trainee, "loss_fn") and hasattr(trainee, "params")

    # optimizer keys must be real make_optimizer parameters
    opt_keys = set(config.get("optimizer", {}))
    allowed = set(inspect.signature(make_optimizer).parameters) - {"params"}
    assert opt_keys <= allowed, opt_keys - allowed
    tx = make_optimizer(trainee.params, **config.get("optimizer", {}))
    assert tx is not None

    # trainer keys must be real TrainerConfig fields
    tr_keys = set(config.get("trainer", {}))
    fields = {f.name for f in dataclasses.fields(TrainerConfig)}
    assert tr_keys <= fields, tr_keys - fields

    # data block: collator kwargs must exist on the collator class
    from viquae_tpu.train import data as tdata

    data_cfg = dict(config["data"])
    kind = config["trainee"]["kind"]
    collator_cls = {
        "biencoder": tdata.BiEncoderCollator,
        "reader": tdata.ReaderCollator,
        "reranker": tdata.ReRankerCollator,
        "ict": tdata.ICTCollator,
        "crossmodal": tdata.CrossModalCollator,
    }[data_cfg.pop("collator", {"jcm": "crossmodal"}.get(kind, kind))]
    sig = set()
    for klass in collator_cls.__mro__:
        if klass is object:
            continue
        sig |= set(inspect.signature(klass.__init__).parameters)
    sig |= {"tokenizer", "dataset", "kb", "image_kb", "batch_size"}
    extra = set(data_cfg) - sig - {"self", "args", "kwargs"}
    assert not extra, f"unknown data keys for {collator_cls.__name__}: {extra}"


def test_tuned_values_match_reference():
    """The headline tuned numbers survive translation verbatim."""
    bm25 = _load(CORPUS / "ir" / "bm25.json")
    idx = bm25["kb_kwargs"]["data/viquae_passages"]["index_kwargs"]["BM25"]
    assert (idx["b"], idx["k1"]) == (0.3, 0.5)
    assert idx["interpolation_weight"] == 0.3

    weights = {
        "dpr+clip.json": [0.5, 0.5],
        "dpr+clip-cross-modal.json": [0.6, 0.2, 0.2],
        "dpr+arcface+clip+imagenet.json": [0.3, 0.2, 0.2, 0.2],
        "bm25+arcface+clip+imagenet.json": [0.3, 0.1, 0.3, 0.3],
    }
    for name, w in weights.items():
        cfg = _load(CORPUS / "ir" / "fusion" / name)
        fk = cfg["fusion_kwargs"]
        assert fk["norm"] == "gzmuv" and fk["defmin"] is True
        assert fk["subcommand_kwargs"]["best_params"]["weights"] == w
        # one weight per index across all KBs
        n_idx = sum(len(kb["index_kwargs"])
                    for kb in cfg["kb_kwargs"].values())
        assert n_idx == len(w), (name, n_idx, len(w))

    rc = _load(CORPUS / "rc" / "viquae.yaml")
    assert rc["data"]["M"] == 24 and rc["data"]["max_n_answers"] == 10
    assert rc["data"]["n_relevant_passages"] == 8
    assert rc["optimizer"]["lr"] == 1e-5
    assert rc["optimizer"]["grad_clip"] == 1.0

    ict = _load(CORPUS / "ict" / "eca.yaml")
    assert ict["data"]["batch_size"] == 512
    assert ict["trainee"]["remat_layers"] is True
    assert "freeze_regex" in ict["optimizer"]

    jcm = _load(CORPUS / "jcm.yaml")
    assert jcm["trainee"]["image_weight"] == 0.5
    assert jcm["optimizer"]["lr"] == 2e-6
    assert jcm["optimizer"]["weight_decay"] == 0.1


@pytest.mark.parametrize("path", IR_JSONS, ids=lambda p: p.stem)
def test_ir_config_schema(path):
    """Search/embed/hp configs parse and use the real index/fusion seams."""
    cfg = _load(path)
    if "model" in cfg:  # embed config: class_name must resolve
        from viquae_tpu.core.config import get_class_from_name

        get_class_from_name(cfg["model"]["class_name"])
        assert "save_as" in cfg and "key" in cfg
        return
    if "grid" in cfg:  # hp config
        assert set(cfg["grid"]) == {"b", "k1"}
        return
    assert "kb_kwargs" in cfg and "reference_kb_path" in cfg
    for kb_path, kb in cfg["kb_kwargs"].items():
        for name, idx in kb["index_kwargs"].items():
            assert "column" in idx and "key" in idx, (kb_path, name)
            if idx.get("kind") == "BM25":
                assert {"b", "k1"} <= set(idx)
            else:
                assert idx.get("string_factory") in ("Flat", "L2norm,Flat")
    fusion = cfg.get("fusion_kwargs")
    if fusion:
        assert fusion["norm"] in ("gzmuv", "zmuv", "minmax", "none")


def test_freeze_regexes_match_param_paths(devices):
    """The translated freeze regexes actually hit this repo's param tree
    paths (a regex written for torch module names would silently freeze
    nothing)."""
    import re

    import jax

    from viquae_tpu.train.run import build_trainee

    ict = _load(CORPUS / "ict" / "eca.yaml")
    pattern = re.compile(ict["optimizer"]["freeze_regex"])
    trainee = build_trainee({
        "kind": "biencoder",
        "question_model": {"class_name": "ECAEncoder",
                           "bert": dict(TINY_BERT, num_hidden_layers=12),
                           "n_faces": 0, "image_dims": {"clip-RN50": 8}},
        "context_model": {"class_name": "DPREncoder",
                          "bert_config": dict(TINY_BERT,
                                              num_hidden_layers=12,
                                              add_pooler=False)},
    })
    paths = [
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(trainee.params)[0]
    ]
    frozen = [p for p in paths if pattern.search(p)]
    trainable = [p for p in paths if not pattern.search(p)]
    assert frozen, "freeze_regex matched no parameters"
    assert any("/layers/6/" in p for p in frozen)
    assert all(not any(f"/layers/{i}/" in p for i in (6, 7, 8, 9, 10, 11))
               for p in trainable)
    assert any("/layers/0/" in p for p in trainable)


def test_ir_configs_instantiate_through_searcher(tmp_path, devices):
    """The corpus search configs must drive the REAL Searcher seam (the
    code-review found "_mirror" comment keys and legacy normalization
    blocks crashing every CLI entry point — this pins the fix): load the
    shipped ir/bm25.json and ir/dpr_search.json, rewire only the kb paths
    to a tiny on-disk dataset, and run dataset_search end to end."""
    import numpy as np
    from datasets import Dataset

    from viquae_tpu.core.config import load_config
    from viquae_tpu.ir.search import dataset_search

    rng = np.random.default_rng(0)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 40, 30))
             for _ in range(50)]
    emb = rng.normal(size=(50, 8)).astype(np.float32)
    Dataset.from_dict({
        "passage": texts, "DPR_few_shot": emb.tolist(),
    }).save_to_disk(str(tmp_path / "kb"))
    queries = {
        "id": ["q0", "q1"],
        "input": [texts[3][:40], texts[7][:40]],
        "output": [{"original_answer": "w1", "answer": ["w1"]},
                   {"original_answer": "w2", "answer": ["w2"]}],
        "DPR_few_shot": emb[[3, 7]].tolist(),
    }
    Dataset.from_dict(queries).save_to_disk(str(tmp_path / "q"))

    for name in ("bm25.json", "dpr_search.json"):
        cfg = load_config(CORPUS / "ir" / name)
        assert not any(k.startswith("_") for k in cfg), cfg.keys()
        kb_cfg = next(iter(cfg["kb_kwargs"].values()))
        from datasets import load_from_disk

        report, runs, qrels = dataset_search(
            load_from_disk(str(tmp_path / "q")), k=5,
            kb_kwargs={str(tmp_path / "kb"): kb_cfg},
            reference_kb_path=str(tmp_path / "kb"),
        )
        assert len(runs) == 1
        run = next(iter(runs.values()))
        assert len(run) == 2
        # the legacy normalization block is APPLIED (scores are z-scored):
        # raw BM25 scores are positive; (s - 20.1)/5.85 * 0.3 at toy scale
        # is strongly negative. Raw DPR dots are O(1); (s - 71.3)/2.17 is
        # strongly negative too.
        top_scores = [max(v.values()) for v in run.values() if v]
        assert top_scores and all(s < 0 for s in top_scores), top_scores


def test_legacy_normalization_matches_formula(devices):
    """Index(normalization=..., interpolation_weight=...) returns
    w * (s - mean) / std of the raw backend scores."""
    import numpy as np

    from viquae_tpu.ir.search import KnowledgeBase

    rng = np.random.default_rng(1)
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 20, 20))
             for _ in range(30)]
    kb_plain = KnowledgeBase(
        kb_path={"passage": texts},
        index_kwargs={"bm25": {"column": "passage", "kind": "BM25",
                               "b": 0.3, "k1": 0.5}})
    kb_norm = KnowledgeBase(
        kb_path={"passage": texts},
        index_kwargs={"bm25": {
            "column": "passage", "kind": "BM25", "b": 0.3, "k1": 0.5,
            "normalization": {"method": "normalize",
                              "mean": 2.0, "std": 4.0},
            "interpolation_weight": 0.3,
        }})
    q = ["w1 w2 w3"]
    s_raw, i_raw = kb_plain.search_batch("bm25", q, k=5)
    s_n, i_n = kb_norm.search_batch("bm25", q, k=5)
    assert i_raw == i_n
    np.testing.assert_allclose(
        s_n[0], [(s - 2.0) / 4.0 * 0.3 for s in s_raw[0]], rtol=1e-6)
