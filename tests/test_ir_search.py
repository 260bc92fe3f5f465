"""End-to-end vertical slice: embed -> search -> judge -> metrics -> fuse."""
import numpy as np
import pytest

from viquae_tpu.ir import metrics as ir_metrics
from viquae_tpu.ir import search as ir_search
from viquae_tpu.rankeval import Qrels, Run


def make_kb(n=50, d=16, seed=0):
    rng = np.random.default_rng(seed)
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    passages = [f"passage about entity{i} with answer{i} inside" for i in range(n)]
    return vectors, passages


class DictDataset:
    """Minimal stand-in for an HF dataset (column + int indexing)."""

    def __init__(self, columns):
        self.columns = columns
        self.column_names = list(columns)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.columns[key]
        return {c: v[key] for c, v in self.columns.items()}

    def remove_columns(self, cols):
        return DictDataset(
            {c: v for c, v in self.columns.items() if c not in cols}
        )

    def __len__(self):
        return len(next(iter(self.columns.values())))


@pytest.fixture
def setup(devices):
    vectors, passages = make_kb()
    kb = DictDataset({"embedding": list(vectors), "passage": passages})
    # queries: question i looks for entity i -> its vector is close to row i
    q_vec = vectors[:10] + 0.01 * np.random.default_rng(1).standard_normal((10, 16)).astype(np.float32)
    batch = {
        "id": [f"q{i}" for i in range(10)],
        "dense_query": [q_vec[i] for i in range(10)],
        "output": [
            {"original_answer": f"answer{i}", "answer": [f"answer{i}"]}
            for i in range(10)
        ],
    }
    return kb, batch


def test_find_relevant():
    kb = [{"passage": "the sky is blue"}, {"passage": "grass is green"}]
    orig, rel = ir_metrics.find_relevant([0, 1], "Blue", ["green!"], kb)
    assert orig == [0]
    assert rel == [0, 1]


def test_find_relevant_word_boundary():
    kb = [{"passage": "bluebird is a bird"}]
    orig, rel = ir_metrics.find_relevant([0], "blue", [], kb)
    assert rel == []  # 'blue' must match as a whole word


def test_searcher_end_to_end(setup, tmp_path):
    kb, batch = setup
    report, runs, qrels = ir_search.dataset_search(
        dict(batch),
        k=5,
        metric_save_path=tmp_path / "out",
        kb_kwargs={
            "kb0": dict(
                kb_path=kb,
                index_kwargs={
                    "dense": dict(column="embedding", key="dense_query",
                                  chunk_size=512)
                },
            )
        },
        reference_kb_path=kb,
        do_fusion=False,
    )
    # every query should retrieve its matching passage at rank 1
    assert report.scores["dense"]["precision@1"] == 1.0
    assert report.scores["dense"]["mrr@100"] == 1.0
    # artifacts persisted
    assert (tmp_path / "out" / "dense.json").exists()
    assert (tmp_path / "out" / "qrels.json").exists()
    assert (tmp_path / "out" / "metrics.json").exists()
    # qrels built on the fly from answer matching
    assert qrels["q0"]["0"] == 1


def test_searcher_none_queries(setup):
    kb, batch = setup
    batch["dense_query"][3] = None
    report, runs, _ = ir_search.dataset_search(
        dict(batch), k=5,
        kb_kwargs={"kb0": dict(kb_path=kb, index_kwargs={
            "dense": dict(column="embedding", key="dense_query", chunk_size=512)
        })},
        reference_kb_path=kb, do_fusion=False,
    )
    assert "q3" not in runs["dense"] or runs["dense"]["q3"] == {}
    assert report.scores["dense"]["precision@1"] == pytest.approx(0.9)


def test_article_passage_mapping_one2many(setup, tmp_path):
    """Search an article-level index, expand to passages with 1e-8 penalty."""
    import json

    kb, batch = setup
    mapping = {i: [2 * i, 2 * i + 1] for i in range(50)}
    mpath = tmp_path / "mapping.json"
    mpath.write_text(json.dumps(mapping))
    passages = DictDataset({
        "passage": [
            f"text with answer{i // 2} inside" for i in range(100)
        ]
    })
    report, runs, _ = ir_search.dataset_search(
        dict(batch), k=6,
        kb_kwargs={"kb0": dict(
            kb_path=kb,
            index_mapping_path=str(mpath),
            index_kwargs={"dense": dict(column="embedding", key="dense_query",
                                        chunk_size=512)},
        )},
        reference_kb_path=passages, do_fusion=False,
    )
    run_q0 = runs["dense"]["q0"]
    # article 0 expanded to passages 0 and 1, second has the penalty
    assert "0" in run_q0 and "1" in run_q0
    assert run_q0["0"] > run_q0["1"]
    assert run_q0["0"] - run_q0["1"] == pytest.approx(1e-8)


def test_many2one_max(setup, tmp_path):
    """Passage-level index mapped back to articles, keeping max score."""
    import json

    kb, batch = setup
    # two passages per article: passage p -> article p // 2
    mapping = {i: [i // 2] for i in range(50)}
    mpath = tmp_path / "mapping.json"
    mpath.write_text(json.dumps(mapping))
    articles = DictDataset({
        "passage": [f"article with answer{i} inside" for i in range(25)]
    })
    report, runs, _ = ir_search.dataset_search(
        dict(batch), k=5,
        kb_kwargs={"kb0": dict(
            kb_path=kb,
            index_mapping_path=str(mpath),
            many2one="max",
            index_kwargs={"dense": dict(column="embedding", key="dense_query",
                                        chunk_size=512)},
        )},
        reference_kb_path=articles, do_fusion=False,
    )
    assert len(runs["dense"]["q0"]) <= 5


def test_hybrid_dense_plus_bm25(setup, tmp_path):
    kb, batch = setup
    batch["text_query"] = [f"tell me about entity{i}" for i in range(10)]
    report, runs, qrels = ir_search.dataset_search(
        dict(batch), k=5,
        metric_save_path=tmp_path / "out",
        kb_kwargs={"kb0": dict(kb_path=kb, index_kwargs={
            "dense": dict(column="embedding", key="dense_query", chunk_size=512),
            "bm25": dict(column="passage", key="text_query", kind="BM25"),
        })},
        reference_kb_path=kb,
        fusion_kwargs={"subcommand": "fit", "norm": "min-max"},
    )
    assert report.scores["bm25"]["precision@1"] == 1.0
    assert (tmp_path / "out" / "min-max_wsum_best_params.json").exists()


def test_mm_embedder(devices):
    """MMEmbedder drives an ECA encoder over a column batch."""
    import jax

    from viquae_tpu.ir.embedding import MMEmbedder
    from viquae_tpu.models import bert, mm
    from viquae_tpu.train.data import PreComputedImageFeatures

    cfg = mm.MMConfig(
        bert=bert.BertConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, add_pooler=False,
        ),
        n_faces=2, face_dim=4, bbox_dim=7, image_dims=(("clip", 5),),
    )
    params = mm.eca_init(jax.random.key(0), cfg)

    def apply_fn(p, text_inputs, face_inputs, image_inputs, **kw):
        return mm.eca_apply(p, cfg, text_inputs, face_inputs, image_inputs, **kw)

    class Tok:
        def __call__(self, texts, **kw):
            import numpy as np

            n = len(texts)
            L = kw["max_length"]
            return {
                "input_ids": np.ones((n, L), np.int64),
                "attention_mask": np.ones((n, L), np.int64),
            }

    feats = PreComputedImageFeatures(
        n_faces=2, face_dim=4, bbox_dim=7, image_dims={"clip": 5}
    )
    emb = MMEmbedder(apply_fn, params, Tok(), feats, key="input",
                     max_length=8, batch_size=4)
    batch = {
        "input": ["q0", "q1", "q2"],
        "face_embedding": [[[1.0] * 4], None, [[2.0] * 4]],
        "face_box": [[[0.1] * 7], None, [[0.2] * 7]],
        "clip": [[1.0] * 5, None, [3.0] * 5],
    }
    out = emb(dict(batch))
    assert out["mm_embedding"].shape == (3, 16)
    assert np.isfinite(out["mm_embedding"]).all()


def test_text_embedder_layers(devices):
    """Per-layer CLS extraction writes {save_as}_layer_{i} columns."""
    import jax

    from viquae_tpu.ir.embedding import TextEmbedder
    from viquae_tpu.models import bert

    cfg = bert.BertConfig(
        vocab_size=40, hidden_size=8, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=16,
        max_position_embeddings=16, add_pooler=False,
    )
    params = bert.init(jax.random.key(0), cfg)

    class Tok:
        def __call__(self, texts, **kw):
            n, L = len(texts), kw["max_length"]
            return {
                "input_ids": np.ones((n, L), np.int64),
                "attention_mask": np.ones((n, L), np.int64),
            }

    def apply_fn(p, **kw):
        return bert.apply(p, cfg, kw.pop("input_ids"),
                          kw.pop("attention_mask"),
                          kw.pop("token_type_ids"), **kw)

    emb = TextEmbedder(apply_fn, params, Tok(), key="t", save_as="e",
                       max_length=8, batch_size=2, layers=[0, 2])
    batch = emb({"t": ["a", "b", "c"]})
    assert batch["e_layer_0"].shape == (3, 8)
    assert batch["e_layer_2"].shape == (3, 8)
    assert not np.allclose(batch["e_layer_0"], batch["e_layer_2"])


def test_retrieval_pipeline_streaming(devices):
    from viquae_tpu.ir.serving import RetrievalPipeline
    from viquae_tpu.ops import mips

    rng = np.random.default_rng(0)
    kb = rng.standard_normal((200, 16)).astype(np.float32)
    # cosine mode: a row is its own nearest neighbor (plain IP favors norms)
    index = mips.DenseIndex(kb, do_l2norm=True, chunk_size=256)

    def embed_fn(texts):
        # fake embedder: query "qN" -> kb row N + noise
        rows = [int(t[1:]) if t else 0 for t in texts]
        return kb[rows] + 0.01

    ids = [f"q{i}" for i in range(10)]
    pipeline = RetrievalPipeline(embed_fn, index, batch_size=4, k=3)
    run = pipeline.run(ids, ids)
    assert len(run) == 10
    for i in range(10):
        top = max(run[f"q{i}"].items(), key=lambda kv: kv[1])[0]
        assert top == str(i)
    report = pipeline.report()
    assert report["search_dispatch"]["count"] == 3  # ceil(10/4) batches


def test_mm_embedder_packed_matches_padded(devices):
    """MMEmbedder(packed_bundle=...) embeds via the packed mm forward and
    matches the padded column for both ECA and ILF."""
    import jax

    from viquae_tpu.ir.embedding import MMEmbedder
    from viquae_tpu.models import bert, mm
    from viquae_tpu.train.data import PreComputedImageFeatures

    class Tok:
        def __call__(self, texts, **kw):
            rng = np.random.default_rng(0)
            n = len(texts)
            L = kw["max_length"]
            ids = np.zeros((n, L), np.int64)
            mask = np.zeros((n, L), np.int64)
            for i, t in enumerate(texts):
                l = max(2, min(L, len(str(t)) % L + 2))
                ids[i, :l] = rng.integers(1, 60, l)
                mask[i, :l] = 1
            return {"input_ids": ids, "attention_mask": mask}

    feats = PreComputedImageFeatures(
        n_faces=2, face_dim=4, bbox_dim=7, image_dims={"clip": 5}
    )
    batch = {
        "input": [f"question number {i} {'x' * (i % 7)}" for i in range(6)],
        "face_embedding": [
            [[1.0] * 4] if i % 3 else None for i in range(6)
        ],
        "face_box": [[[0.1] * 7] if i % 3 else None for i in range(6)],
        "clip": [[float(i)] * 5 for i in range(6)],
    }
    mm_cfg = dict(
        bert=bert.BertConfig(
            vocab_size=64, hidden_size=16, num_hidden_layers=1,
            num_attention_heads=2, intermediate_size=32,
            max_position_embeddings=32, add_pooler=False,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        ),
        n_faces=2, face_dim=4, bbox_dim=7, image_dims=(("clip", 5),),
    )
    for cls in (mm.ECAEncoder, mm.IntermediateLinearFusion):
        bundle = cls(cfg=mm.MMConfig(**mm_cfg), seed=2)
        padded = MMEmbedder(bundle.apply_fn, bundle.params, Tok(), feats,
                            key="input", max_length=12, batch_size=4)
        packed = MMEmbedder(bundle.apply_fn, bundle.params, Tok(), feats,
                            key="input", max_length=12, batch_size=4,
                            packed_bundle=bundle)
        out_pad = padded(dict(batch))["mm_embedding"]
        out_packed = packed(dict(batch))["mm_embedding"]
        np.testing.assert_allclose(out_packed, out_pad, rtol=2e-5,
                                   atol=2e-5)


def _write_qrels(tmp_path, qrels):
    import json as _json

    path = tmp_path / "qrels.json"
    path.write_text(_json.dumps(qrels))
    return path


def test_searcher_qrels_only_mode_without_output_column(tmp_path):
    """reference_kb=None + precomputed qrels must work on datasets WITHOUT
    an `output` column (gt is only consumed by relevance judging)."""
    from viquae_tpu.ir.search import Searcher

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(20, 8)).astype(np.float32)
    searcher = Searcher(
        kb_kwargs={
            "kb": dict(
                kb_path={"emb": emb.tolist()},
                index_kwargs={"dense": dict(column="emb", key="emb",
                                            chunk_size=64)},
            )
        },
        k=5,
        reference_kb_path=None,
        qrels=str(_write_qrels(tmp_path, {"0": {"1": 1}})),
    )
    batch = {"id": ["0", "1"], "emb": emb[:2].tolist()}
    searcher(batch)
    assert len(searcher.runs["dense"]) == 2


def test_searcher_stringifies_integer_ids(tmp_path):
    """Integer dataset ids must merge with file-loaded (string-keyed)
    qrels instead of creating parallel int-keyed entries that later
    clobber the file judgments."""
    from viquae_tpu.ir.search import Searcher

    rng = np.random.default_rng(1)
    emb = rng.normal(size=(10, 4)).astype(np.float32)
    passages = [f"fact{i}" for i in range(10)]
    searcher = Searcher(
        kb_kwargs={
            "kb": dict(
                kb_path={"emb": emb.tolist(), "passage": passages},
                index_kwargs={"dense": dict(column="emb", key="emb",
                                            chunk_size=64)},
            )
        },
        k=3,
        reference_kb_path=[{"passage": t} for t in passages],
        qrels=str(_write_qrels(tmp_path, {"0": {"9": 1}})),
    )
    batch = {
        "id": [0, 1],  # INTEGER ids
        "emb": emb[:2].tolist(),
        "output": [{"original_answer": "fact0", "answer": ["fact0"]},
                   {"original_answer": "fact1", "answer": ["fact1"]}],
    }
    searcher(batch)
    assert set(searcher.runs["dense"]) <= {"0", "1"}
    # the file judgment for q "0" survived (not clobbered by an int key)
    assert searcher.qrels["0"].get("9") == 1


def test_streaming_index_through_kb_seam(setup, tmp_path):
    """`streaming: true` in index_kwargs routes the dense column to
    StreamingDenseIndex (host-RAM KB streamed through the chip) with
    identical search results to the device-resident index."""
    import jax.numpy as jnp

    kb, batch = setup
    common = dict(
        kb_path=kb,
        index_kwargs={
            "dense": dict(column="embedding", key="dense_query",
                          streaming=True, chunk_rows=16,
                          dtype=jnp.float32),
        },
    )
    report, runs, _ = ir_search.dataset_search(
        dict(batch), k=5, metric_save_path=tmp_path / "out_stream",
        kb_kwargs={"kb0": common}, reference_kb_path=kb, do_fusion=False,
    )
    assert report.scores["dense"]["precision@1"] == 1.0
    assert report.scores["dense"]["mrr@100"] == 1.0
