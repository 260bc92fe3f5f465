"""Golden end-to-end pipeline: the whole framework in one flow.

Mirrors BASELINE config 1 at mini scale: articles -> passage splitting ->
provenance relevance -> biencoder training -> split-encoder export -> corpus
+ query embedding with the TRAINED tower -> dense+BM25 search with
on-the-fly qrels -> late fusion -> reader training -> reader test emitting
metrics.json/predictions.json. Every stage consumes the previous stage's
on-disk artifacts (the named-column contract).
"""
import json

import numpy as np
import pytest


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
    d = tmp_path_factory.mktemp("tok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)


def test_full_pipeline(tokenizer, tmp_path, devices):
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
    # ---- 1. articles -> sentence-preserving passages -------------------
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
    assert len(passages) > n_entities  # actually split
    Dataset.from_dict({"passage": passages, "index": owners}).save_to_disk(
        str(tmp_path / "passages")
    )

    # ---- 2. provenance relevance (which passages hold the answer) ------
    kb_list = [{"passage": p} for p in passages]
    questions = []
    for i in range(n_entities):
        rel = [
            j for j in range(len(passages))
            if owners[j] == i
            and find_relevant([j], f"fact{i}", [], kb_list)[1]
        ]
        irrel = [(i * 2 + 3) % len(passages)]
        irrel = [j for j in irrel if j not in rel]
        questions.append({
            "id": f"q{i}",
            "input": f"what is ent{i} famous for ?",
            "output": {"original_answer": f"fact{i}", "answer": [f"fact{i}"]},
            "search_provenance_indices": rel,
            "search_provenance_scores": [5.0] * len(rel),
            "search_irrelevant_indices": irrel,
            "search_irrelevant_scores": [1.0] * len(irrel),
        })
        assert rel, f"no relevant passage found for q{i}"
    Dataset.from_dict({
        k: [q[k] for q in questions] for k in questions[0]
    }).save_to_disk(str(tmp_path / "questions"))

    # ---- 3. biencoder training on provenance labels --------------------
    tiny = dpr.DPRConfig(bert=bert.BertConfig(
        vocab_size=len(tokenizer), hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=32, add_pooler=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ))
    be = trainee.BiEncoderTrainee(
        dpr.DPREncoder(cfg=tiny, seed=0), dpr.DPREncoder(cfg=tiny, seed=1)
    )
    collator = tdata.BiEncoderCollator(
        tokenizer, kb=kb_list, M=2, max_length=20, seed=0
    )
    ctx = meshlib.make_mesh(data=8)
    tx = optim.make_optimizer(be.params, lr=1e-3, warmup_steps=10,
                          total_steps=600, grad_clip=1.0)
    batches = [collator.collate_fn(questions[i::3]) for i in range(3)]
    with meshlib.use(ctx):
        trainer = Trainer(
            be.loss_fn, be.params, tx,
            TrainerConfig(max_steps=300, log_every=100), mesh_ctx=ctx,
            eval_fn=be.eval_fn,
        )
        result = trainer.fit(batches)
        # in-batch retrieval must be (near) solved on this toy task
        metrics = trainer.evaluate(iter([batches[0]]))
    assert metrics["MRR@N*M"] > 0.6, metrics

    # ---- 4. export split encoders + reload (save_ptm contract) ---------
    be.export(tmp_path / "export", params=trainer.state["params"], hf=True)
    from viquae_tpu.train.checkpoint import import_params

    q_params = import_params(
        tmp_path / "export" / "question_model", be.params["question"]
    )
    c_params = import_params(
        tmp_path / "export" / "context_model", be.params["context"]
    )
    assert (tmp_path / "export" / "question_model_hf" / "config.json").exists()

    # ---- 5. embed corpus + queries with the trained towers -------------
    def q_apply(p, **kw):
        return dpr.apply(p, tiny, kw.pop("input_ids"),
                         kw.pop("attention_mask"),
                         kw.pop("token_type_ids", None), **kw)

    with meshlib.use(ctx):
        dataset_embed(
            str(tmp_path / "passages"),
            TextEmbedder(q_apply, c_params, tokenizer, key="passage",
                         save_as="dpr_emb", max_length=20, batch_size=8,
                         mesh_ctx=ctx),
        )
        dataset_embed(
            str(tmp_path / "questions"),
            TextEmbedder(q_apply, q_params, tokenizer, key="input",
                         save_as="dpr_emb", max_length=20, batch_size=8,
                         mesh_ctx=ctx),
        )

        # ---- 6. dense + BM25 search, on-the-fly qrels, fusion ----------
        report, runs, qrels = dataset_search(
            load_from_disk(str(tmp_path / "questions")),
            k=5,
            metric_save_path=tmp_path / "runs",
            kb_kwargs={str(tmp_path / "passages"): dict(index_kwargs={
                "dpr": dict(column="dpr_emb", key="dpr_emb", chunk_size=256),
                "bm25": dict(column="passage", key="input", kind="BM25"),
            })},
            reference_kb_path=str(tmp_path / "passages"),
            fusion_kwargs={"subcommand": "fit", "norm": "zmuv"},
        )
    assert report.scores["bm25"]["mrr@100"] > 0.9
    assert report.scores["dpr"]["mrr@100"] > 0.5  # trained dense retrieval
    assert (tmp_path / "runs" / "zmuv_wsum_best_params.json").exists()

    # ---- 7. reader: train briefly, then test with artifacts ------------
    rcfg = qa.ReaderConfig(bert=tiny.bert)
    import jax as _jax

    r_params = qa.init(_jax.random.key(7), rcfg)
    rt = trainee.ReaderTrainee(rcfg, r_params, tokenizer, m_passages=2)
    reader_collator = tdata.ReaderCollator(
        tokenizer, kb=kb_list, M=2, max_length=28, max_n_answers=2,
        seed=0, train=True,
    )
    r_batches = [reader_collator.collate_fn(questions[:6])]
    with meshlib.use(ctx):
        r_trainer = Trainer(
            rt.loss_fn, rt.params, optim.make_optimizer(rt.params, lr=3e-3,
                                                        total_steps=20),
            TrainerConfig(max_steps=12, log_every=6), mesh_ctx=ctx,
        )
        r_trainer.fit(r_batches)
        test_out = rt.test(
            r_trainer.state["params"], r_batches, tmp_path / "reader_log"
        )
    assert (tmp_path / "reader_log" / "metrics.json").exists()
    assert (tmp_path / "reader_log" / "predictions.json").exists()
    saved = json.loads((tmp_path / "reader_log" / "metrics.json").read_text())
    assert "exact_match" in saved and "f1" in saved
    assert len(test_out["predictions"]) == 6
