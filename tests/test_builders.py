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
