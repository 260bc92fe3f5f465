import json

import numpy as np
import pytest

from viquae_tpu.rankeval import (
    Qrels,
    Run,
    compare,
    default_minimum,
    evaluate,
    fuse,
    normalize_run,
    optimize_fusion,
)


@pytest.fixture
def qrels():
    return Qrels({"q1": {"d1": 1, "d3": 1}, "q2": {"d2": 1}, "q3": {"d9": 1}})


@pytest.fixture
def run():
    return Run(
        {
            "q1": {"d1": 0.9, "d2": 0.8, "d3": 0.7},
            "q2": {"d1": 0.9, "d2": 0.8},
            "q3": {"d1": 0.5},
        },
        name="dense",
    )


def test_evaluate_basics(qrels, run):
    out = evaluate(qrels, run, ["mrr@100", "precision@1", "precision@2", "hit_rate@2", "recall@2"])
    # q1: first relevant at rank1 -> rr 1; q2: rank2 -> 0.5; q3: none -> 0
    assert out["mrr@100"] == pytest.approx((1 + 0.5 + 0) / 3)
    assert out["precision@1"] == pytest.approx((1 + 0 + 0) / 3)
    assert out["precision@2"] == pytest.approx((1 / 2 + 1 / 2 + 0) / 3)
    assert out["hit_rate@2"] == pytest.approx(2 / 3)
    assert out["recall@2"] == pytest.approx((1 / 2 + 1 + 0) / 3)


def test_evaluate_single_metric_scalar(qrels, run):
    assert isinstance(evaluate(qrels, run, "mrr@10"), float)


def test_map_and_ndcg(qrels):
    run = Run({"q1": {"d1": 3.0, "d2": 2.0, "d3": 1.0}})
    out = evaluate(Qrels({"q1": {"d1": 1, "d3": 1}}), run, ["map@3", "ndcg@3"])
    # AP = (1/1 + 2/3)/2
    assert out["map@3"] == pytest.approx((1 + 2 / 3) / 2)
    dcg = 1 / np.log2(2) + 1 / np.log2(4)
    idcg = 1 / np.log2(2) + 1 / np.log2(3)
    assert out["ndcg@3"] == pytest.approx(dcg / idcg)


def test_json_roundtrip(tmp_path, qrels, run):
    qp, rp = tmp_path / "qrels.json", tmp_path / "run.json"
    qrels.save(qp)
    run.save(rp)
    q2, r2 = Qrels.from_file(qp), Run.from_file(rp)
    assert q2.to_dict() == qrels.to_dict()
    assert r2.to_dict() == run.to_dict()
    # plain ranx-style JSON on disk
    assert json.loads(qp.read_text())["q1"]["d1"] == 1


def test_trec_roundtrip(tmp_path, run):
    p = tmp_path / "run.trec"
    run.save(p)
    r2 = Run.from_file(p)
    assert set(r2["q1"]) == {"d1", "d2", "d3"}
    assert r2.name == "dense"


def test_padded_stable_ties():
    run = Run({"q": {"a": 1.0, "b": 1.0, "c": 2.0}})
    _, docs, scores = run.to_padded(["q"])
    assert list(docs[0]) == ["c", "a", "b"]  # ties keep insertion order


def test_zmuv_and_gzmuv_norms():
    run = Run({"q1": {"a": 1.0, "b": 3.0}, "q2": {"a": 10.0, "b": 30.0}})
    z = normalize_run(run, "zmuv")
    assert z["q1"]["a"] == pytest.approx(-1.0)
    assert z["q2"]["b"] == pytest.approx(1.0)
    g = normalize_run(run, "gzmuv")
    all_scores = np.array([1.0, 3.0, 10.0, 30.0])
    expect = (1.0 - all_scores.mean()) / all_scores.std()
    assert g["q1"]["a"] == pytest.approx(expect)


def test_default_minimum():
    r1 = Run({"q": {"a": 0.5, "b": 0.2}}, name="r1")
    r2 = Run({"q": {"c": 0.7}}, name="r2")
    out = default_minimum([r1, r2])
    assert out[0]["q"]["c"] == pytest.approx(0.2)  # imputed with r1's min
    assert out[1]["q"]["a"] == pytest.approx(0.7)
    assert out[1]["q"]["b"] == pytest.approx(0.7)


def test_wsum_fusion_and_optimize(qrels):
    # r1 alone is wrong, r2 alone is right; optimum puts all weight on r2
    r1 = Run({"q1": {"d2": 1.0, "d1": 0.1}, "q2": {"d1": 1.0, "d2": 0.1},
              "q3": {"d1": 1.0, "d9": 0.1}}, name="bad")
    r2 = Run({"q1": {"d1": 1.0, "d2": 0.1}, "q2": {"d2": 1.0, "d1": 0.1},
              "q3": {"d9": 1.0, "d1": 0.1}}, name="good")
    best = optimize_fusion(qrels, [r1, r2], norm="min-max", method="wsum", metric="mrr@10")
    fused = fuse([r1, r2], norm="min-max", method="wsum", params=best)
    assert evaluate(qrels, fused, "mrr@10") == pytest.approx(1.0)


def test_compare_significance(qrels):
    good = Run({"q1": {"d1": 1.0}, "q2": {"d2": 1.0}, "q3": {"d9": 1.0}}, name="good")
    bad = Run({"q1": {"d7": 1.0}, "q2": {"d7": 1.0}, "q3": {"d7": 1.0}}, name="bad")
    report = compare(qrels, [good, bad], metrics=["mrr@10"], max_p=0.5)
    assert report.scores["good"]["mrr@10"] == pytest.approx(1.0)
    assert report.scores["bad"]["mrr@10"] == pytest.approx(0.0)
    assert "good" in report.to_table()


def test_ndcg_matches_sklearn_graded():
    """Graded-relevance NDCG cross-checked against sklearn's oracle."""
    from sklearn.metrics import ndcg_score

    rng = np.random.default_rng(0)
    n_docs = 12
    qrels_data, run_data, y_true, y_score = {}, {}, [], []
    for q in range(5):
        grades = rng.integers(0, 4, n_docs)
        scores = rng.standard_normal(n_docs)
        qrels_data[f"q{q}"] = {
            f"d{d}": int(g) for d, g in enumerate(grades) if g > 0
        }
        run_data[f"q{q}"] = {f"d{d}": float(s) for d, s in enumerate(scores)}
        y_true.append(grades)
        y_score.append(scores)
    ours = evaluate(Qrels(qrels_data), Run(run_data), f"ndcg@{n_docs}")
    ref = ndcg_score(np.array(y_true), np.array(y_score), k=n_docs)
    assert ours == pytest.approx(ref, rel=1e-6)


def test_fuse_rejects_mismatched_weights():
    """zip() would silently drop runs when the weights length is wrong
    (e.g. reusing best_params from a different run set)."""
    import pytest

    from viquae_tpu.rankeval import Run, fuse

    runs = [Run({"q": {"1": 1.0}}, name=str(i)) for i in range(3)]
    with pytest.raises(ValueError, match="2 weights for 3 runs"):
        fuse(runs, norm=None, method="wsum",
             params={"weights": [0.5, 0.5]})


def test_f1_metric_parses_and_scores():
    """Round-3 review: the metric-name regex couldn't match 'f1' (digit),
    making the implemented f1 branch unreachable."""
    from viquae_tpu.rankeval import Qrels, Run, evaluate

    qrels = Qrels({"q1": {"d1": 1, "d2": 1}})
    run = Run({"q1": {"d1": 3.0, "dX": 2.0}})
    out = evaluate(qrels, run, "f1@2")
    p, r = 1 / 2, 1 / 2
    assert out == pytest.approx(2 * p * r / (p + r))


def test_map_divides_by_total_relevant():
    """trec_eval/ranx AP@k denominator is the TOTAL judged-relevant count,
    not min(n_rel, k) — the capped version inflates map@k when n_rel > k."""
    from viquae_tpu.rankeval import Qrels, Run, evaluate

    qrels = Qrels({"q1": {f"d{i}": 1 for i in range(5)}})
    run = Run({"q1": {"d0": 9.0, "x1": 8.0}})
    assert evaluate(qrels, run, "map@2") == pytest.approx(1 / 5)


def test_compare_rejects_duplicate_run_names():
    """Duplicate names silently collapsed per_query/scores rows (trivially
    produced by Run.from_file on same-named files in different dirs)."""
    import pytest as _pytest

    from viquae_tpu.rankeval import Qrels, Run, compare

    qrels = Qrels({"q1": {"d1": 1}})
    runs = [Run({"q1": {"d1": 1.0}}, name="bm25"),
            Run({"q1": {"dX": 1.0}}, name="bm25")]
    with _pytest.raises(ValueError, match="duplicate run names"):
        compare(qrels, runs, metrics=["mrr@10"])


def test_cutoffless_precision_uses_per_query_depth():
    """Cutoff-less precision/f1 divide by each query's OWN retrieved count
    (ranx semantics) — the padded global max under-scored ragged runs."""
    qrels = Qrels({"q1": {"d0": 1, "d1": 1}, "q2": {"e0": 1, "e1": 1}})
    run = Run({
        # q1 retrieved 10 docs (2 relevant), q2 retrieved 2 (2 relevant)
        "q1": {f"d{i}": 10.0 - i for i in range(10)},
        "q2": {"e0": 2.0, "e1": 1.0},
    })
    out = evaluate(qrels, run, ["precision", "f1"])
    # q1: 2/10, q2: 2/2 -> mean 0.6 (global-max depth gave (0.2+0.2)/2)
    assert out["precision"] == pytest.approx((2 / 10 + 2 / 2) / 2)
    r_q1, r_q2 = 1.0, 1.0
    p_q1, p_q2 = 0.2, 1.0
    f1 = (2 * p_q1 * r_q1 / (p_q1 + r_q1) + 2 * p_q2 * r_q2 / (p_q2 + r_q2)) / 2
    assert out["f1"] == pytest.approx(f1)
    # @k metrics are unchanged by the fix (q1's top-2 are d0,d1 — both
    # relevant — so precision@2 is 1.0 for both queries)
    assert evaluate(qrels, run, "precision@2") == pytest.approx(1.0)
    assert evaluate(qrels, run, "precision@4") == pytest.approx(
        (2 / 4 + 2 / 4) / 2)
