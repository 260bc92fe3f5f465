"""Dataset-builder logic (offline-testable parts)."""
import json

import numpy as np
import pytest

from viquae_tpu.data import evqa, kilt2vqa, labelstudio, mscelebs, wiki, wikidump, wit


# ---- wiki -----------------------------------------------------------------
def test_thumbnail_roundtrip():
    url = wiki.file_name_to_thumbnail("Barack Obama.jpg", image_width=512)
    assert url.startswith("https://upload.wikimedia.org/wikipedia/commons/thumb/")
    assert url.endswith("/512px-Barack_Obama.jpg")
    assert wiki.thumbnail_to_file_name(url) == "Barack_Obama.jpg"
    # special formats get converted extensions
    url = wiki.file_name_to_thumbnail("map.svg", image_width=300)
    assert url.endswith("/300px-map.svg.png")
    url = wiki.file_name_to_thumbnail("scan.tif", image_width=400)
    assert "lossy-page1-400px-scan.tif.jpg" in url


def test_license_score():
    assert wiki.license_score(
        {"extmetadata": {"LicenseShortName": {"value": "CC BY-SA 4.0"}}}
    ) == 5
    assert wiki.license_score(
        {"extmetadata": {"LicenseShortName": {"value": "cc0"}}}
    ) == 8
    assert wiki.license_score({}) == 0


def test_image_heuristic_and_best_image():
    entities = {
        "Q1": {
            "entityLabel": {"value": "Ada Lovelace"},
            "images": {
                "File:Ada Lovelace portrait.jpg": {
                    "categories": ["Ada Lovelace images"],
                    "description": "portrait of ada lovelace",
                },
                "File:Random.jpg": {"categories": ["Unrelated"]},
            },
        }
    }
    wiki.image_heuristic(entities)
    images = entities["Q1"]["images"]
    assert len(images["File:Ada Lovelace portrait.jpg"]["heuristics"]) == 3
    assert len(images["File:Random.jpg"]["heuristics"]) == 0
    assert wiki.best_image(entities["Q1"]) == "File:Ada Lovelace portrait.jpg"


def test_class_filtering():
    entities = {
        "Q1": {"instanceof": {"Q5": {}}},      # human
        "Q2": {"instanceof": {"Q11424": {}}},  # film
    }
    assert set(wiki.keep_classes(entities, {"Q5"})) == {"Q1"}
    assert set(wiki.exclude_classes(entities, {"Q5"})) == {"Q2"}
    # superclass expansion
    superclasses = {"Q11424": {"Q386724"}}  # film -> work
    assert set(wiki.keep_classes(entities, {"Q386724"}, superclasses)) == {"Q2"}


def test_remove_alive_humans():
    entities = {
        "dead": {"date_of_death": {"value": "1852-11-27"}},
        "alive": {"date_of_birth": {"value": "1990-01-01"}},
        "old": {"date_of_birth": {"value": "1700-01-01"}},
    }
    out = wiki.remove_alive_humans(entities, year_threshold=1900)
    assert set(out) == {"dead", "old"}


# ---- kilt2vqa -------------------------------------------------------------
def test_word_error_rate():
    assert kilt2vqa.word_error_rate(["the", "cat"], ["the", "cat"]) == 0.0
    assert kilt2vqa.word_error_rate(["the", "cat"], ["the", "dog"]) == 0.5
    assert kilt2vqa.word_error_rate([], ["x"]) == 1.0


def test_item2placeholder():
    item = {"input": "Who wrote the opera Carmen Suite?"}
    kilt2vqa.item2placeholder(item)
    assert item["placeholder"]
    assert "{mention}" in item["placeholder"][0]["input"]
    assert "Carmen" in item["placeholder"][0]["entity"]["text"]


def test_disambiguate_picks_min_wer():
    item = {
        "input": "q",
        "placeholder": [{"entity": {"text": "Albert Einstein"}, "dependency": ""}],
        "output": {"provenance": [
            {"wikipedia_id": ["1"], "title": ["Albert Einstein"]},
            {"wikipedia_id": ["2"], "title": ["Relativity"]},
        ]},
    }
    wiki_items = {
        "1": {"wikipedia_id": "1", "wikidata_info": {
            "wikidata_id": "Q937", "aliases": {"alias": ["einstein"]}}},
        "2": {"wikipedia_id": "2", "wikidata_info": {
            "wikidata_id": "Q11455", "aliases": {"alias": []}}},
    }
    kilt2vqa.disambiguate(item, lambda wid: wiki_items[wid])
    entity = item["placeholder"][0]["entity"]
    assert entity["wikidata_info"]["wikidata_id"] == "Q937"
    assert entity["wer"] == 0.0


def test_generate_mention_and_vq():
    item = {
        "id": "x", "input": "Who married Ada Lovelace?",
        "output": {"original_answer": "William King",
                   "provenance": []},
        "placeholder": [{
            "input": "Who married {mention}?",
            "dependency": "dobj",
            "entity": {"text": "Ada Lovelace", "wer": 0.0,
                       "wikidata_info": {"wikidata_id": "Q7259"}},
        }],
    }
    entities = {
        "Q7259": {
            "gender": {"value": "http://www.wikidata.org/entity/Q6581072"},
            "instanceof": {"http://www.wikidata.org/entity/Q5": {}},
            "occupation": {"Q121594": {"label": {"value": "mathematician"}}},
            "entityLabel": {"value": "Ada Lovelace"},
            "images": {"File:Ada.jpg": {"heuristics": {"title": True}}},
        }
    }
    kilt2vqa.generate_mention(item, entities)
    mentions = item["placeholder"][0]["ambiguous_mentions"]
    assert "this woman" in mentions["man_woman"]
    assert "her" in mentions["pronouns"]
    assert "this mathematician" in mentions["occupation"]
    assert mentions["instanceof"] == []  # humans skip instance-of mentions

    kilt2vqa.generate_vq(item, entities)
    assert item["vq"]
    generated = {vq["input"] for vq in item["vq"]}
    assert "Who married this woman?" in generated
    assert "Who married her?" in generated
    assert item["vq"][0]["image"] == "Ada.jpg"
    tasks = kilt2vqa.labelstudio_export([item])
    assert tasks[0]["data"]["answer"] == "William King"


# ---- wikidump -------------------------------------------------------------
def test_wikidump_parse(tmp_path):
    xml = """<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.10/">
<page><ns>6</ns><title>File:Ada.jpg</title><revision><text>
{{Information
|description = Portrait of Ada
|author = someone
|date = 1840
}}
[[Category:Ada Lovelace]]
[[Category:1840 portraits]]
</text></revision></page>
<page><ns>0</ns><title>Not a file</title><revision><text>x</text></revision></page>
</mediawiki>"""
    path = tmp_path / "dump.xml"
    path.write_text(xml)
    out = wikidump.process_dump(path, {"Ada Lovelace": "Q7259"})
    assert "Q7259" in out
    image = out["Q7259"][0]
    assert image["title"] == "File:Ada.jpg"
    assert image["description"] == "Portrait of Ada"
    assert "1840 portraits" in image["categories"]


# ---- wit ------------------------------------------------------------------
def test_wit_build_and_split():
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
    rows.append({"language": "fr", "page_title": "French",
                 "image_url": "http://x/f.jpg",
                 "context_section_description": "t"})
    rows.append({"language": "en", "page_title": "BadExt",
                 "image_url": "http://x/file.exe",
                 "context_section_description": "t"})
    articles = wit.fill_for_mict(rows)
    assert len(articles) == 10  # fr + bad extension filtered
    splits = wit.split_by_article(articles, val_frac=0.2, test_frac=0.2)
    train_articles = {s["article"] for s in splits["train"]}
    val_articles = {s["article"] for s in splits["validation"]}
    assert not train_articles & val_articles  # article-disjoint
    deduped = wit.dedup_captions(
        [{"image": "a", "caption": "c"}, {"image": "a", "caption": "c"},
         {"image": "a", "caption": "d"}]
    )
    assert len(deduped) == 2


# ---- labelstudio ----------------------------------------------------------
def test_labelstudio_merge_and_agreement(tmp_path):
    t1 = [{"id": 1, "data": {"question": "q1"},
           "annotations": [{"result": [
               {"from_name": "discard", "value": {"choices": ["keep"]}}]}]}]
    t2 = [{"id": 1, "data": {"question": "q1"},
           "annotations": [{"result": [
               {"from_name": "discard", "value": {"choices": ["keep"]}}]}]},
          {"id": 2, "data": {"question": "q2"}, "annotations": []}]
    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    p1.write_text(json.dumps(t1))
    p2.write_text(json.dumps(t2))
    merged = labelstudio.merge_completions([p1, p2])
    assert len(merged) == 2
    task1 = next(t for t in merged if t["id"] == 1)
    assert len(task1["annotations"]) == 2
    agreement = labelstudio.annotator_agreement(merged)
    assert agreement["n_double_annotated"] == 1
    assert agreement["raw_agreement"] == 1.0

    vqa = labelstudio.retrieve_vqa(task1)
    assert vqa["question"] == "q1"
    assert vqa["discard"] is False

    assignments = labelstudio.assign_annotations(list(range(10)), 2, overlap=2)
    assert len(assignments) == 2
    assert assignments[0][:2] == assignments[1][:2]  # shared overlap
    assert len(set(map(tuple, [assignments[0][2:], assignments[1][2:]]))) == 2


# ---- mscelebs -------------------------------------------------------------
def test_mscelebs(tmp_path):
    import base64

    tsv = tmp_path / "faces.tsv"
    face = base64.b64encode(b"JPEGDATA")
    tsv.write_bytes(b"m.0abc\timg1\t" + face + b"\nm.0def\timg2\t" + face + b"\n")
    assert mscelebs.wikidata2freebase("/m/0abc") == "m.0abc"
    assert mscelebs.freebase2wikidata_key("m.0abc") == "/m/0abc"
    counts = mscelebs.count_entities({"m.0abc"}, tsv)
    assert counts == {"m.0abc": 1}
    n = mscelebs.extract_faces(tsv, tmp_path / "out", {"m.0abc"})
    assert n == 1
    assert (tmp_path / "out" / "m.0abc" / "img1.jpg").read_bytes() == b"JPEGDATA"


# ---- evqa -----------------------------------------------------------------
def test_evqa_preprocess():
    assert evqa.preprocess_answer("The answer is Two!") == "2"
    assert evqa.preprocess_answer("dont") == "don't"


def test_evqa_matching():
    assert evqa.singleanswer_exact_match("two", "2")
    assert not evqa.singleanswer_exact_match("three", "2")
    assert evqa.multianswer_exact_match("red&&blue&&green", "blue, red, green")
    assert not evqa.multianswer_exact_match("red&&blue&&green", "blue")
    # alternatives
    assert evqa.evaluate_example(
        {"reference": "UK|United Kingdom", "candidate": "united kingdom"}
    )
    out = evqa.evaluate(
        {"q1": "2", "q2": "paris"},
        {"q1": {"reference": "two"}, "q2": {"reference": "london"}},
    )
    assert out["accuracy"] == 0.5


@pytest.fixture(scope="module")
def bert_tokenizer(tmp_path_factory):
    from transformers import BertTokenizerFast

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + ["who", "is", "this", "alpha", "beta", "gamma", "two", "q"]
             + [f"w{i}" for i in range(50)])
    d = tmp_path_factory.mktemp("bemtok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"),
                             do_lower_case=True)


def test_bem_combine_segments():
    from viquae_tpu.models import bem as bem_lib

    out = bem_lib.combine_segments([10, 11], [20], [30, 31, 32],
                                   cls_id=2, sep_id=3, max_length=16)
    np.testing.assert_array_equal(
        out["input_ids"][:10], [2, 10, 11, 3, 20, 3, 30, 31, 32, 3]
    )
    np.testing.assert_array_equal(
        out["segment_ids"][:10], [0, 0, 0, 0, 1, 1, 2, 2, 2, 2]
    )
    np.testing.assert_array_equal(out["attention_mask"][:10], 1)
    assert out["input_ids"][10:].sum() == 0
    assert out["attention_mask"][10:].sum() == 0


def test_bem_scoring_offline(bert_tokenizer):
    """EVQA protocol runs offline with the in-repo BEM scorer: EM
    short-circuits, BEM decides EM-failures, multi-answer '&&' -> ','."""
    import jax
    from viquae_tpu.models import bem as bem_lib
    from viquae_tpu.models import bert as bert_lib

    cfg = bem_lib.BEMConfig(
        bert=bert_lib.BertConfig(
            vocab_size=bert_tokenizer.vocab_size + 10, hidden_size=16,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=32, type_vocab_size=3, add_pooler=True,
        ),
        max_length=64,
    )
    scorer = bem_lib.BEMScorer(cfg=cfg, tokenizer=bert_tokenizer,
                               max_length=64)
    fn = evqa.initialize_bem_scoring_function(scorer=scorer)
    ex = {"question": "who is this", "reference": "alpha beta",
          "candidate": "gamma", "question_type": "single_answer"}
    score = fn(ex, threshold_score=False)
    assert 0.0 <= score <= 1.0
    assert fn(ex) in (0.0, 1.0)
    # batched scoring agrees with single scoring
    s2 = scorer.score([ex, ex])
    np.testing.assert_allclose(s2[0], s2[1], rtol=1e-5)
    np.testing.assert_allclose(s2[0], score, rtol=1e-4, atol=1e-5)
    # multi-answer reference is comma-joined before scoring
    ex_m = {**ex, "question_type": "multi_answer",
            "reference": "alpha&&beta"}
    assert 0.0 <= fn(ex_m, threshold_score=False) <= 1.0

    # EM-then-BEM: exact match short-circuits to 1.0 regardless of BEM
    em_ex = {"question": "q", "reference": "two", "candidate": "2",
             "question_type": "single_answer"}
    assert evqa.encyclopedic_vqa_evaluation_function(em_ex, fn) == 1.0
    # EM failure falls through to (thresholded) BEM
    out = evqa.encyclopedic_vqa_evaluation_function(ex, fn)
    assert out in (0.0, 1.0)

    # weight-port roundtrip: synthesize a classification state_dict with
    # REAL layout and check the port reproduces the head
    import torch
    sd = {}
    hf_sd = bert_lib.params_to_hf_state_dict(
        scorer.params["bert"], cfg.bert, prefix="bert."
    )
    sd.update(hf_sd)
    sd["bert.pooler.dense.weight"] = torch.from_numpy(
        np.asarray(scorer.params["bert"]["pooler"]["kernel"]).T.copy()
    )
    sd["bert.pooler.dense.bias"] = torch.from_numpy(
        np.asarray(scorer.params["bert"]["pooler"]["bias"]).copy()
    )
    sd["classifier.weight"] = torch.from_numpy(
        np.asarray(scorer.params["head"]["kernel"]).T.copy()
    )
    sd["classifier.bias"] = torch.from_numpy(
        np.asarray(scorer.params["head"]["bias"]).copy()
    )
    ported = bem_lib.params_from_state_dict(sd, cfg)
    ref_leaves = jax.tree_util.tree_leaves(scorer.params)
    got_leaves = jax.tree_util.tree_leaves(ported)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---- kilt2vqa gazetteer NER -------------------------------------------------
# reference-style TriviaQA questions with the gold placeholder span the
# spaCy pipeline would replace (entity mention + determiner-phrase children,
# meerqat/data/kilt2vqa.py:157-227)
NER_FIXTURE = [
    ("Who wrote the opera Carmen?", "the opera Carmen"),
    # the reference's own pobj-leaf example (meerqat/data/kilt2vqa.py:205)
    # — quotes must balance in the extracted span
    ("Who wrote the poem \u2018The Lady of the Lake\u2019?",
     "the poem \u2018The Lady of the Lake\u2019"),
    ("In which country is the Great Barrier Reef?", "the Great Barrier Reef"),
    ("Who painted the Mona Lisa?", "the Mona Lisa"),
    ("What is the capital of Portugal?", "Portugal"),
    ("Which actor starred in Casablanca?", "Casablanca"),
    ("Who founded Microsoft?", "Microsoft"),
    ("In what year did Elvis Presley die?", "Elvis Presley"),
    ("Which river flows through Paris?", "Paris"),
    ("Who directed the film Jaws?", "the film Jaws"),
    ("What instrument did Louis Armstrong play?", "Louis Armstrong"),
    ("Which team won the Super Bowl in 1990?", "the Super Bowl"),
    ("Who is the author of War and Peace?", "War and Peace"),
    ("What mountain range contains Mount Everest?", "Mount Everest"),
    ("Which queen ruled England in 1588?", "England"),
    ("Who composed the ballet Swan Lake?", "the ballet Swan Lake"),
]
GAZ_TITLES = [
    "Carmen", "The Lady of the Lake",
    "Great Barrier Reef", "Mona Lisa", "Portugal", "Casablanca",
    "Microsoft", "Elvis Presley", "Paris", "Jaws", "Louis Armstrong",
    "Super Bowl", "War and Peace", "Mount Everest", "England", "Swan Lake",
    "The Beatles", "Albert Einstein",  # distractors
]


def _ner_recall(ner_fn):
    hits = 0
    for question, gold in NER_FIXTURE:
        spans = kilt2vqa.keep_biggest_spans(ner_fn(question))
        if any(t == gold for t, *_ in spans):
            hits += 1
    return hits / len(NER_FIXTURE)


def test_gazetteer_ner_beats_capitalized_fallback():
    gaz = kilt2vqa.GazetteerNER(GAZ_TITLES)
    recall_gaz = _ner_recall(gaz)
    recall_cap = _ner_recall(kilt2vqa.capitalized_span_ner)
    # quantified in PARITY.md; the gazetteer must dominate
    assert recall_gaz >= 0.9, recall_gaz
    assert recall_gaz > recall_cap, (recall_gaz, recall_cap)


def test_gazetteer_ner_spans_and_backoff():
    gaz = kilt2vqa.GazetteerNER(["Mona Lisa"], backoff_capitalized=True)
    spans = gaz("Who painted the Mona Lisa in Florence?")
    texts = [s[0] for s in spans]
    assert "the Mona Lisa" in texts          # determiner-phrase expansion
    assert "Florence" in texts               # capitalized backoff
    # label of a gazetteer hit is the matched KB title
    hit = [s for s in spans if s[0] == "the Mona Lisa"][0]
    assert hit[3] == "Mona Lisa"
    # unigram gazetteer entries only fire on capitalized non-initial tokens
    gaz2 = kilt2vqa.GazetteerNER(["It"], backoff_capitalized=False)
    assert gaz2("It is what it is") == []


def test_gazetteer_placeholder_integration():
    gaz = kilt2vqa.GazetteerNER(GAZ_TITLES)
    item = {"input": "Who wrote the opera Carmen?"}
    kilt2vqa.item2placeholder(item, ner_fn=gaz)
    assert item["placeholder"][0]["input"] == "Who wrote {mention}?"
    # the placeholder cuts the expanded span, but the stored entity is the
    # core MENTION (reference: entity = e.as_doc()) — NED computes WER
    # against it, and "the opera Carmen" vs the title "Carmen" would be
    # WER 2/3 > the 0.5 filter
    assert item["placeholder"][0]["entity"]["text"] == "Carmen"
    start = item["placeholder"][0]["entity"]["start"]
    end = item["placeholder"][0]["entity"]["end"]
    assert item["input"][start:end] == "Carmen"


def test_gazetteer_sentence_initial_determiner():
    gaz = kilt2vqa.GazetteerNER(["Carmen"], backoff_capitalized=False)
    spans = gaz("The opera Carmen premiered in 1875?")
    assert [s[0] for s in spans] == ["The opera Carmen"]


def test_bem_scoring_function_rejects_non_callable():
    with pytest.raises(TypeError, match="callable"):
        evqa.initialize_bem_scoring_function("https://tfhub.dev/bem")


def test_wikidump_single_line_template_and_nested_values(tmp_path):
    """Round-3 review: fields on ONE line leaked following |field=... into
    the captured value; pipes inside nested [[links|..]]/{{templates}} must
    NOT terminate it."""
    assert wikidump.get_field(
        "{{Information|description=A portrait of X|author=John Doe|date=1900}}",
        "description") == "A portrait of X"
    assert wikidump.get_field(
        "{{Information|description=A portrait of X|author=John Doe|date=1900}}",
        "author") == "John Doe"
    assert wikidump.get_field(
        "{{Information|description=A portrait of X|author=John Doe|date=1900}}",
        "date") == "1900"
    # nested link/template pipes stay inside the value
    assert wikidump.get_field(
        "{{Information\n|description = {{en|1=[[Ada Lovelace|Ada]] in 1840}}\n"
        "|author = someone\n}}", "description"
    ) == "{{en|1=[[Ada Lovelace|Ada]] in 1840}}"
    # multiline values still span lines up to the next field
    assert wikidump.get_field(
        "{{Information\n|description = line one\nline two\n|date=1900\n}}",
        "description") == "line one\nline two"
    # 'update=' must not match the date field (pipe anchor)
    assert wikidump.get_field("{{Info|update=2001|date=1900}}",
                              "date") == "1900"


def test_mscelebs_skips_truncated_rows(tmp_path):
    """A 2-field row aliases face_b64 onto the image-id column — it must be
    skipped, not base64-decoded as image data."""
    import base64

    tsv = tmp_path / "faces.tsv"
    face = base64.b64encode(b"JPEGDATA")
    tsv.write_bytes(b"m.0abc\timgONLY\n" + b"m.0abc\timg1\t" + face + b"\n")
    n = mscelebs.extract_faces(tsv, tmp_path / "out", {"m.0abc"})
    assert n == 1
    assert (tmp_path / "out" / "m.0abc" / "img1.jpg").exists()
