"""Aux subsystems: infoseek, hp search, viz, interact, utils."""
import json

import numpy as np
import pytest

from viquae_tpu.data import infoseek
from viquae_tpu.data.utils import md5, to_latex, to_markdown_table
from viquae_tpu.ir import hp
from viquae_tpu.ops import bm25
from viquae_tpu.rankeval import Qrels, Run
from viquae_tpu.viz import html as viz_html
from viquae_tpu.viz import projection, stats, wtl_filter


# ---- infoseek -------------------------------------------------------------
def test_find_numbers():
    nums, raw = infoseek.find_numbers("between 9-10 meters, 1,200 kg, 3.5e2")
    assert nums == [9.0, 10.0, 1200.0, 350.0]


def test_process_numerical_answer():
    assert infoseek.process_numerical_answer("around 5 meters") == 5.0
    assert infoseek.process_numerical_answer("5 to 10") == [5.0, 10.0]
    assert infoseek.process_numerical_answer("no numbers") == [0, 0]


def test_metric_numerical_range():
    assert infoseek.metric_numerical_range(100.0, 100.0) == 1
    assert infoseek.metric_numerical_range(109.0, 100.0) == 1  # within 10%
    assert infoseek.metric_numerical_range(120.0, 100.0) == 0
    assert infoseek.metric_numerical_range([4.0, 6.0], [4.0, 6.0]) == 1


def test_numerical_relevance_in_find_relevant():
    from viquae_tpu.ir.metrics import find_relevant

    kb = [{"passage": "the tower is 312 meters tall"},
          {"passage": "no numbers here"}]
    _, rel = find_relevant(
        [0, 1], "310", ["300", "320"], kb,
        question_type=infoseek.QuestionType.Numerical,
    )
    assert rel == [0]


def test_evaluate_infoseek():
    qid2example = {
        "q1": {"answer_eval": ["paris"], "question_type": "String"},
        "q2": {"answer_eval": ["100", "110"], "question_type": "Numerical"},
    }
    predictions = [
        {"data_id": "q1", "prediction": "Paris"},
        {"data_id": "q2", "prediction": "105 meters"},
    ]
    out = infoseek.evaluate_infoseek(predictions, qid2example)
    assert out["score"] == 100.0


# ---- hyperparameter search ------------------------------------------------
def test_grid_search_resumable(tmp_path):
    calls = []

    def objective(params):
        calls.append(params)
        return -((params["x"] - 2) ** 2)

    storage = tmp_path / "trials.json"
    out = hp.GridSearch({"x": [0, 1, 2, 3]}, storage=str(storage)).run(objective)
    assert out["best_params"] == {"x": 2}
    assert len(calls) == 4
    # resume: no new evaluations
    out2 = hp.GridSearch({"x": [0, 1, 2, 3]}, storage=str(storage)).run(objective)
    assert len(calls) == 4
    assert out2["best_params"] == {"x": 2}


def test_bm25_objective_retunes():
    docs = ["the quick fox", "a quick brown dog", "lazy dog sleeps"]
    index = bm25.BM25Index.build(docs)
    qrels = Qrels({"q0": {"1": 1}})
    obj = hp.BM25Objective(index, {"q0": "quick brown dog"}, qrels, k=3,
                           metric="precision@1")
    result = hp.hyperparameter_search(
        obj, {"b": [0.3, 0.75], "k1": [0.5, 1.2]}
    )
    assert result["best_value"] == 1.0
    assert set(result["best_params"]) == {"b", "k1"}


# ---- viz ------------------------------------------------------------------
def test_wtl_filter():
    qrels = Qrels({"q1": {"d1": 1}, "q2": {"d2": 1}, "q3": {"d3": 1}})
    run_a = Run({"q1": {"d1": 1.0}, "q2": {"d9": 1.0}, "q3": {"d3": 1.0}}, name="A")
    run_b = Run({"q1": {"d1": 1.0}, "q2": {"d2": 1.0}, "q3": {"d9": 1.0}}, name="B")
    assert wtl_filter.select_ids(qrels, run_a, run_b, "win") == {"q3"}
    # two-run "loose" is the COMPLEMENT of (B strictly beats A) — ties
    # and A-wins kept (reference meerqat/viz/wtl_filter.py:59 code, not
    # its docstring)
    assert wtl_filter.select_ids(qrels, run_a, run_b, "loose") == {
        "q1", "q3"}
    assert wtl_filter.select_ids(qrels, run_a, run_b, "intersection") == {"q1"}
    assert wtl_filter.select_ids(qrels, run_a, run_b, "union") == {"q1", "q2", "q3"}
    assert wtl_filter.select_ids(qrels, run_a, run_b, "nunion") == set()


def test_html_rendering(tmp_path):
    items = [
        {"id": "q1", "input": "who is this?",
         "output": {"original_answer": "Ada"}, "image": "img1.jpg"},
    ]
    run = Run({"q1": {"0": 2.0, "1": 1.0}}, name="dense")
    passages = [{"passage": "Ada Lovelace was...", "index": 0}]
    wiki = [{"url": "http://w/Ada", "wikipedia_title": "Ada"}]
    page = viz_html.dataset_to_html(
        items, tmp_path / "out.html", passages=passages, wiki=wiki,
        search_run=run,
    )
    assert "who is this?" in page
    assert "Ada Lovelace" in page
    assert (tmp_path / "out.html").exists()


def test_projection_and_plot(tmp_path):
    rng = np.random.default_rng(0)
    emb = np.concatenate([
        rng.normal(0, 1, (30, 8)), rng.normal(5, 1, (30, 8))
    ]).astype(np.float32)
    labels = [0] * 30 + [1] * 30
    xy = projection.plot_embeddings(
        emb, labels, output=str(tmp_path / "plot.png"), method="pca"
    )
    assert xy.shape == (60, 2)
    assert (tmp_path / "plot.png").exists()
    # clusters separate along the first component
    assert abs(xy[:30, 0].mean() - xy[30:, 0].mean()) > 1.0


def test_stats():
    data = {"input": ["a b c", "d e", None], "faces": [[1, 2], [], None]}

    class DS(dict):
        column_names = list(data)

        def __len__(self):
            return 3

    out = stats.dataset_stats(DS(data), columns=["input", "faces"])
    assert out["n_items"] == 3
    assert out["input"]["coverage"] == pytest.approx(2 / 3)
    assert out["input"]["mean_words"] == pytest.approx(2.5)


# ---- utils ----------------------------------------------------------------
def test_utils():
    assert md5("abc") == "900150983cd24fb0d6963f7d28e17f72"
    table = to_markdown_table({"mrr": 0.51234, "p@1": 0.4})
    assert "0.5123" in table
    assert "mrr" in to_latex({"mrr": 0.5})


# ---- interact -------------------------------------------------------------
def test_interact_system(devices):
    from viquae_tpu.interact.system import System
    from viquae_tpu.ir.search import Searcher

    kb_vectors = np.eye(4, 8, dtype=np.float32)
    passages = [f"passage {i} with answer{i}" for i in range(4)]

    class KB:
        column_names = ["emb", "passage"]

        def __getitem__(self, key):
            if key == "emb":
                return list(kb_vectors)
            if key == "passage":
                return passages
            return {"emb": kb_vectors[key], "passage": passages[key]}

        def remove_columns(self, cols):
            return self

        def __len__(self):
            return 4

    class FakeTextEmbedder:
        save_as = "emb"
        key = "input"

        def embed_texts(self, texts):
            # embed "question i" onto basis vector i
            i = int(texts[0].split()[-1])
            return kb_vectors[i: i + 1] + 0.01

    searcher = Searcher(
        kb_kwargs={"kb": dict(kb_path=KB(), index_kwargs={
            "emb": dict(column="emb", key="emb", chunk_size=64)
        })},
        reference_kb_path=KB(), k=3,
    )
    system = System(FakeTextEmbedder(), searcher, kb=KB(), k=2)
    out = system("question 2")
    assert out["results"][0][0] == "2"
    assert out["passages"][0] == "passage 2 with answer2"


def test_fusion_rrf_optimization():
    """Regression: optimize_fusion(method='rrf') used to crash on the report
    key; and Fusion.test must unwrap single-element list norms."""
    from viquae_tpu.ir.fuse import Fusion
    from viquae_tpu.rankeval import optimize_fusion as opt

    qrels = Qrels({"q1": {"d1": 1}, "q2": {"d2": 1}})
    r1 = Run({"q1": {"d1": 1.0, "d2": 0.5}, "q2": {"d2": 1.0, "d1": 0.5}}, name="a")
    r2 = Run({"q1": {"d1": 0.9, "d2": 0.4}, "q2": {"d2": 0.9, "d1": 0.4}}, name="b")
    best = opt(qrels, [r1, r2], method="rrf", metric="mrr@10")
    assert "k" in best
    fusion = Fusion(qrels=qrels, runs=[r1, r2], norm=["zmuv"], method=["wsum"])
    fusion.fit()
    combined = fusion.test({"weights": (0.5, 0.5)}, metrics=["mrr@10"])
    assert "q1" in combined
    with pytest.raises(ValueError, match="single norm"):
        Fusion(qrels=qrels, runs=[r1, r2], norm=["zmuv", "min-max"]).test({})


def test_ndcg_idcg_from_full_qrels():
    """Regression: IDCG must come from ALL qrels grades, not just retrieved."""
    from viquae_tpu.rankeval import evaluate

    qrels = Qrels({"q": {"A": 3, "B": 2}})
    run = Run({"q": {"B": 1.0}})  # best doc (A) was never retrieved

    got = evaluate(qrels, run, "ndcg@10")
    expected = 2.0 / (3.0 + 2.0 / np.log2(3))
    assert got == pytest.approx(expected, rel=1e-6)


def test_interact_system_repeated_queries(devices):
    """Regression: a second query must not return the first query's results."""
    from viquae_tpu.interact.system import System
    from viquae_tpu.ir.search import Searcher

    kb_vectors = np.eye(4, 8, dtype=np.float32)
    passages = [f"passage {i} with answer{i}" for i in range(4)]

    class KB:
        column_names = ["emb", "passage"]

        def __getitem__(self, key):
            if key == "emb":
                return list(kb_vectors)
            if key == "passage":
                return passages
            return {"emb": kb_vectors[key], "passage": passages[key]}

        def remove_columns(self, cols):
            return self

        def __len__(self):
            return 4

    class FakeTextEmbedder:
        save_as = "emb"
        key = "input"

        def embed_texts(self, texts):
            i = int(texts[0].split()[-1])
            return kb_vectors[i: i + 1] + 0.01

    searcher = Searcher(
        kb_kwargs={"kb": dict(kb_path=KB(), index_kwargs={
            "emb": dict(column="emb", key="emb", chunk_size=64)
        })},
        reference_kb_path=KB(), k=2,
    )
    system = System(FakeTextEmbedder(), searcher, kb=KB(), k=1)
    assert system("question 2")["results"][0][0] == "2"
    assert system("question 1")["results"][0][0] == "1"
    assert system("question 3")["results"][0][0] == "3"


def test_negative_numerical_answers_score_correctly():
    """Round-3 review: the official [a*(1-t), a*(1+t)] recipe inverts the
    range for negative answers (exact predictions scored 0) — the deviation
    sorts the bounds."""
    assert infoseek.metric_numerical_range(-86.0, -86.0) == 1
    assert infoseek.metric_numerical_range(-80.0, -86.0) == 1  # within 10%
    assert infoseek.metric_numerical_range(-50.0, -86.0) == 0
    assert infoseek.numerical_relevant(["-86"], "the depth is -86 meters")


def test_infoseek_full_reports_harmonic_final():
    qid2example = {
        "a": {"question_type": "String", "answer_eval": ["paris"]},
        "b": {"question_type": "String", "answer_eval": ["rome"]},
    }
    out = infoseek.evaluate_infoseek_full(
        {"unseen_question": [{"data_id": "a", "prediction": "paris"}],
         "unseen_entity": [{"data_id": "b", "prediction": "wrong"}]},
        qid2example,
    )
    assert out["unseen_question"]["score"] == 100.0
    assert out["unseen_entity"]["score"] == 0.0
    # harmonic mean with a 0 leg collapses toward 0 (1e-12 guard)
    assert out["final"]["score"] == pytest.approx(0.0, abs=0.01)


def test_gridsearch_ignores_stale_storage_trials(tmp_path):
    """Round-3 review: best-trial argmax must be restricted to the CURRENT
    grid (a reused storage file carries old combos) and skip NaN values."""
    storage = tmp_path / "trials.json"
    stale = {json.dumps({"b": 9.9}, sort_keys=True): 1e9,
             json.dumps({"b": 0.2}, sort_keys=True): float("nan")}
    storage.write_text(json.dumps(stale))
    search = hp.GridSearch({"b": [0.2, 0.4]}, storage=str(storage))
    result = search.run(lambda p: p["b"])
    assert result["best_params"] == {"b": 0.4}

    bad = hp.GridSearch({"b": [0.2]}, storage=str(storage))
    with pytest.raises(ValueError, match="finite"):
        bad.run(lambda p: float("nan"))


def test_interactive_system_does_not_mutate_fusion():
    """System.__call__ used to overwrite the shared fitted Fusion's
    runs/qrels (and rewrite its output dir) on every query."""
    from viquae_tpu.ir.fuse import Fusion
    from viquae_tpu.interact.system import System

    qrels = Qrels({"q0": {"3": 1}})
    run_a = Run({"q0": {"3": 1.0, "5": 0.5}}, name="a")
    run_b = Run({"q0": {"3": 0.7, "7": 0.4}}, name="b")
    fusion = Fusion(qrels=qrels, runs=[run_a, run_b], norm=None,
                    method="wsum")

    class _Searcher:
        reference_key = "passage"

        def __init__(self):
            self.runs = {"a": {}, "b": {}}
            self.qrels, self.qnonrels = {}, {}

        def __call__(self, batch):
            self.runs["a"]["interactive"] = {"3": 1.0, "5": 0.5}
            self.runs["b"]["interactive"] = {"3": 0.7, "7": 0.4}

    class _Embedder:
        save_as, key = "emb", "input"

        def embed_texts(self, texts):
            return np.zeros((len(texts), 4), np.float32)

    system = System(_Embedder(), _Searcher(), fusion=fusion,
                    fusion_params={"weights": [0.5, 0.5]})
    out = system("who?")
    assert out["results"][0][0] == "3"
    # the shared fusion kept its offline state
    assert fusion.qrels is qrels
    assert [r.name for r in fusion.runs] == ["a", "b"]
