"""Committed golden metrics (VERDICT r2 item 4).

The reference's de-facto validation mechanism is a COMMITTED expected-
metrics file (experiments/rc/viquae/metrics.json + seed pinning,
SURVEY.md §4). This mirrors it: a fully seeded mini pipeline — passage
split -> biencoder train (fixed steps) -> embed -> dense+BM25 search ->
fusion -> reader train -> EM/F1 — must reproduce the frozen numbers in
tests/fixtures/golden_metrics.json exactly (at the committed rounding).
Any numerical regression in any stage (tokenizer, packing, train step,
MIPS selection, qrels, fusion math, span extraction) fails this test.

Regenerate intentionally with:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden_metrics.py -q
then inspect the diff of the fixture before committing.
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "golden_metrics.json"
DECIMALS = 4


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"ent{i}" for i in range(16)]
        + [f"fact{i}" for i in range(16)]
        + ["the", "of", "was", "born", "in", "city", "famous", "for",
           "what", "is", "known", "question", "about", ".", "?"]
    )
    d = tmp_path_factory.mktemp("gtok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"),
                             do_lower_case=True)


def _run_pipeline(tokenizer, tmp_path):
    import jax
    from datasets import Dataset, load_from_disk

    from viquae_tpu.core import mesh as meshlib
    from viquae_tpu.data.loading import make_passages
    from viquae_tpu.ir.embedding import TextEmbedder, dataset_embed
    from viquae_tpu.ir.metrics import find_relevant
    from viquae_tpu.ir.search import dataset_search
    from viquae_tpu.models import bert, dpr, qa
    from viquae_tpu.train import data as tdata
    from viquae_tpu.train import optim, trainee
    from viquae_tpu.train.trainer import Trainer, TrainerConfig

    n_entities = 12
    articles = [
        f"ent{i} was born in city. ent{i} is famous for fact{i}. "
        f"the city is known for ent{i}."
        for i in range(n_entities)
    ]
    passages, owners = [], []
    for i, article in enumerate(articles):
        chunks = make_passages([article], method="uniform_sents", n=12)
        passages.extend(chunks)
        owners.extend([i] * len(chunks))
    Dataset.from_dict({"passage": passages, "index": owners}).save_to_disk(
        str(tmp_path / "passages"))

    kb_list = [{"passage": p} for p in passages]
    questions = []
    for i in range(n_entities):
        rel = [
            j for j in range(len(passages))
            if owners[j] == i
            and find_relevant([j], f"fact{i}", [], kb_list)[1]
        ]
        irrel = [j for j in [(i * 2 + 3) % len(passages)] if j not in rel]
        questions.append({
            "id": f"q{i}",
            "input": f"what is ent{i} famous for ?",
            "output": {"original_answer": f"fact{i}",
                       "answer": [f"fact{i}"]},
            "search_provenance_indices": rel,
            "search_provenance_scores": [5.0] * len(rel),
            "search_irrelevant_indices": irrel,
            "search_irrelevant_scores": [1.0] * len(irrel),
        })
    Dataset.from_dict({
        k: [q[k] for q in questions] for k in questions[0]
    }).save_to_disk(str(tmp_path / "questions"))

    tiny = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=len(tokenizer), hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=32, add_pooler=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ))
    be = trainee.BiEncoderTrainee(
        dpr.DPREncoder(cfg=tiny, seed=0), dpr.DPREncoder(cfg=tiny, seed=1))
    collator = tdata.BiEncoderCollator(
        tokenizer, kb=kb_list, M=2, max_length=20, seed=0)
    ctx = meshlib.make_mesh(data=8)
    tx = optim.make_optimizer(be.params, lr=1e-3, warmup_steps=5,
                              total_steps=120, grad_clip=1.0)
    batches = [collator.collate_fn(questions[i::3]) for i in range(3)]
    with meshlib.use(ctx):
        trainer = Trainer(
            be.loss_fn, be.params, tx,
            TrainerConfig(max_steps=60, log_every=0, seed=42),
            mesh_ctx=ctx, eval_fn=be.eval_fn)
        trainer.fit(batches)

        def q_apply(p, **kw):
            return dpr.apply(p, tiny, kw.pop("input_ids"),
                             kw.pop("attention_mask"),
                             kw.pop("token_type_ids", None), **kw)

        dataset_embed(
            str(tmp_path / "passages"),
            TextEmbedder(q_apply, trainer.state["params"]["context"],
                         tokenizer, key="passage", save_as="dpr_emb",
                         max_length=20, batch_size=8, mesh_ctx=ctx))
        dataset_embed(
            str(tmp_path / "questions"),
            TextEmbedder(q_apply, trainer.state["params"]["question"],
                         tokenizer, key="input", save_as="dpr_emb",
                         max_length=20, batch_size=8, mesh_ctx=ctx))

        report, runs, qrels = dataset_search(
            load_from_disk(str(tmp_path / "questions")),
            k=20,
            metrics_kwargs={"metrics": ["mrr@100", "precision@1",
                                        "precision@20", "hit_rate@20"]},
            metric_save_path=tmp_path / "runs",
            kb_kwargs={str(tmp_path / "passages"): dict(index_kwargs={
                "dpr": dict(column="dpr_emb", key="dpr_emb",
                            chunk_size=256),
                "bm25": dict(column="passage", key="input", kind="BM25",
                             b=0.3, k1=0.5),
            })},
            reference_kb_path=str(tmp_path / "passages"),
            fusion_kwargs={"subcommand": "fit", "norm": "zmuv"},
        )

        metrics = {}
        for name, vals in report.scores.items():
            for m, v in vals.items():
                metrics[f"ir/{name}/{m}"] = round(float(v), DECIMALS)

        # fused run with the FITTED weights: pins the fusion math +
        # weight grid search end to end (fit writes JSON — the file
        # `fuse test --best_params` consumes)
        from viquae_tpu.rankeval import default_minimum, evaluate, fuse

        best = json.loads(
            (tmp_path / "runs" / "zmuv_wsum_best_params.json").read_text())
        fused_run = fuse(default_minimum(list(runs.values())),
                         norm="zmuv", method="wsum", params=best)
        for m, v in evaluate(qrels, fused_run,
                             ["mrr@100", "precision@1",
                              "hit_rate@20"]).items():
            metrics[f"ir/fusion/{m}"] = round(float(v), DECIMALS)
        metrics["ir/fusion/weights"] = [
            round(float(w), DECIMALS) for w in best["weights"]]

        # ---- reader (fixed steps) -> EM / F1 ---------------------------
        rcfg = qa.ReaderConfig(bert=tiny.bert)
        rt = trainee.ReaderTrainee(
            rcfg, qa.init(jax.random.key(7), rcfg), tokenizer,
            m_passages=2)
        reader_collator = tdata.ReaderCollator(
            tokenizer, kb=kb_list, M=2, max_length=28, max_n_answers=2,
            seed=0, train=True)
        r_batches = [reader_collator.collate_fn(questions[:6])]
        r_trainer = Trainer(
            rt.loss_fn, rt.params,
            optim.make_optimizer(rt.params, lr=3e-3, total_steps=30),
            TrainerConfig(max_steps=18, log_every=0, seed=42),
            mesh_ctx=ctx)
        r_trainer.fit(r_batches)
        test_out = rt.test(
            r_trainer.state["params"], r_batches, tmp_path / "rlog")
        saved = json.loads(
            (tmp_path / "rlog" / "metrics.json").read_text())
        metrics["reader/exact_match"] = round(
            float(saved["exact_match"]), DECIMALS)
        metrics["reader/f1"] = round(float(saved["f1"]), DECIMALS)
    return metrics


def test_golden_metrics(tokenizer, tmp_path, devices):
    metrics = _run_pipeline(tokenizer, tmp_path)
    # the pipeline must produce nontrivial numbers for the fixture to pin
    # anything (all-zero or all-one metrics would hide regressions)
    assert 0.0 < metrics["ir/dpr/mrr@100"] <= 1.0
    assert metrics["ir/bm25/mrr@100"] > 0.5
    assert any(0.0 < v < 1.0 for v in metrics.values()), metrics

    if os.environ.get("GOLDEN_REGEN"):
        FIXTURE.parent.mkdir(parents=True, exist_ok=True)
        FIXTURE.write_text(json.dumps(metrics, indent=1, sort_keys=True))
        pytest.skip(f"regenerated {FIXTURE}")

    assert FIXTURE.exists(), (
        "golden fixture missing — run GOLDEN_REGEN=1 pytest "
        "tests/test_golden_metrics.py once and commit the file")
    expected = json.loads(FIXTURE.read_text())
    assert set(metrics) == set(expected), (
        set(metrics) ^ set(expected))
    def differs(a, b):
        if isinstance(a, list) or isinstance(b, list):
            return list(np.ravel(a)) != list(np.ravel(b))
        return abs(a - b) > 10 ** -DECIMALS

    mismatches = {
        k: (metrics[k], expected[k]) for k in expected
        if differs(metrics[k], expected[k])
    }
    assert not mismatches, (
        f"golden metrics drifted: {mismatches}. If the change is an "
        "intended numerical-behavior change, regenerate with "
        "GOLDEN_REGEN=1 and review the diff.")
