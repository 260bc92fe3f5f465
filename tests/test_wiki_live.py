"""Mocked-HTTP tests for the network-gated wiki/kilt2vqa paths.

This VM has zero egress, so the live SPARQL/REST/download code
(`data/wiki.py` network layer, `data/kilt2vqa.download_images`) cannot hit
real endpoints; these tests drive the retry/backoff, batching, and
error-tolerance semantics through injected fake sessions instead —
the behaviors the reference implements at meerqat/data/wiki.py:562-588
and kilt2vqa.py:671-695.
"""
import json
import warnings

import pytest
import requests

from viquae_tpu.data import kilt2vqa, wiki


class FakeResponse:
    def __init__(self, status_code=200, json_data=None, content=b"",
                 url="http://fake"):
        self.status_code = status_code
        self._json = json_data or {}
        self.content = content
        self.url = url

    def json(self):
        return self._json

    def raise_for_status(self):
        if self.status_code >= 400:
            raise requests.HTTPError(f"{self.status_code}",
                                     response=self)


class FakeSession:
    """Scripted responses: each .get() pops the next item; an Exception
    instance is raised instead of returned."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []

    def get(self, url, **kwargs):
        self.calls.append((url, kwargs))
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


@pytest.fixture(autouse=True)
def no_sleep(monkeypatch):
    monkeypatch.setattr(wiki.time, "sleep", lambda s: None)


def test_request_retries_transient_statuses_then_succeeds():
    session = FakeSession([FakeResponse(429), FakeResponse(503),
                           FakeResponse(200, {"ok": True})])
    response = wiki.request("http://fake/x", session)
    assert response.json() == {"ok": True}
    assert len(session.calls) == 3


def test_request_429_honors_retry_after(monkeypatch):
    """429 sleeps the server's Retry-After when sent, else the Wikidata
    60s compute-limit cool-down (reference wiki.py:581-583)."""
    sleeps = []
    monkeypatch.setattr(wiki.time, "sleep", sleeps.append)
    with_header = FakeResponse(429)
    with_header.headers = {"Retry-After": "7"}
    session = FakeSession([with_header, FakeResponse(429),
                           FakeResponse(200, {"ok": True})])
    response = wiki.request("http://fake/sparql", session, max_tries=3)
    assert response.json() == {"ok": True}
    assert sleeps == [7, wiki.WIKIDATA_COMPUTE_LIMIT]


def test_request_gives_up_after_max_tries():
    session = FakeSession([FakeResponse(500)] * 3)
    with pytest.raises(requests.HTTPError):
        wiki.request("http://fake/x", session, max_tries=2)
    assert len(session.calls) == 3  # initial + 2 retries -> then raises


def test_request_permanent_status_raises_without_retry():
    session = FakeSession([FakeResponse(404)])
    with pytest.raises(requests.HTTPError):
        wiki.request("http://fake/gone", session)
    assert len(session.calls) == 1


def test_request_connection_error_retry_then_runtime_error():
    session = FakeSession([requests.exceptions.ConnectionError("down")] * 3)
    with pytest.raises(RuntimeError, match="egress"):
        wiki.request("http://fake/x", session, max_tries=2)
    assert len(session.calls) == 3


def test_request_connection_error_then_recovery():
    session = FakeSession([requests.exceptions.ConnectionError("blip"),
                           FakeResponse(200, {"ok": 1})])
    assert wiki.request("http://fake/x", session).json() == {"ok": 1}


def test_request_429_http_date_retry_after(monkeypatch):
    """RFC 7231 allows an HTTP-date Retry-After; fall back to the Wikidata
    cool-down instead of crashing on int()."""
    sleeps = []
    monkeypatch.setattr(wiki.time, "sleep", sleeps.append)
    with_date = FakeResponse(429)
    with_date.headers = {"Retry-After": "Wed, 21 Oct 2026 07:28:00 GMT"}
    session = FakeSession([with_date, FakeResponse(200, {"ok": True})])
    assert wiki.request("http://fake/sparql", session).json() == {"ok": True}
    assert sleeps == [wiki.WIKIDATA_COMPUTE_LIMIT]


def test_query_sparql_entities_raises_when_every_batch_fails():
    """A totally failed harvest must NOT return [] — cmd_wiki would
    rewrite entities.json as a silent no-op reported as success."""
    session = FakeSession([requests.exceptions.ConnectionError("down")] * 9)
    with pytest.raises(RuntimeError, match="refusing"):
        wiki.query_sparql_entities("SELECT %s", "http://fake/sparql",
                                   ["Q1", "Q2", "Q3"], batch_size=1,
                                   session=session)


def test_query_sparql_entities_batches_and_concatenates():
    q = "SELECT ?x WHERE { VALUES ?e { %s } }"
    session = FakeSession([
        FakeResponse(200, {"results": {"bindings": [{"x": 1}, {"x": 2}]}}),
        FakeResponse(200, {"results": {"bindings": [{"x": 3}]}}),
    ])
    out = wiki.query_sparql_entities(
        q, "http://fake/sparql", ["Q1", "Q2", "Q3"], batch_size=2,
        session=session)
    assert out == [{"x": 1}, {"x": 2}, {"x": 3}]
    assert len(session.calls) == 2
    first_query = session.calls[0][1]["params"]["query"]
    assert "wd:Q1 wd:Q2" in first_query and "Q3" not in first_query
    second_query = session.calls[1][1]["params"]["query"]
    assert "wd:Q3" in second_query


def test_download_images_sharded_and_error_tolerant(tmp_path, monkeypatch):
    """One 404 file must warn and continue; shards split by item index;
    existing files are skipped (restartability)."""
    items = [
        {"vq": [{"image": "A.jpg", "url": "http://fake/A"}]},
        {"vq": [{"image": "B.jpg", "url": "http://fake/B"},
                {"image": "C 1.jpg", "url": "http://fake/C"}]},
    ]
    # shard 0 of 2 -> only items[0]
    session = FakeSession([FakeResponse(200, content=b"imgA")])
    monkeypatch.setattr(wiki, "request",
                        lambda url, s=None, **kw: session.get(url))
    import viquae_tpu.data.kilt2vqa as k2v
    monkeypatch.setattr(
        "requests.Session", lambda: session, raising=False)
    n = k2v.download_images(items, tmp_path, num_shards=2, shard_index=0)
    assert n == 1 and (tmp_path / "A.jpg").read_bytes() == b"imgA"

    # shard 1 -> items[1]; B 404s (warn, continue), C succeeds with the
    # space -> underscore rename
    session.script = [
        requests.HTTPError("404", response=FakeResponse(404)),
        FakeResponse(200, content=b"imgC"),
    ]
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n = k2v.download_images(items, tmp_path, num_shards=2,
                                shard_index=1)
    assert n == 1
    assert (tmp_path / "C_1.jpg").read_bytes() == b"imgC"
    assert not (tmp_path / "B.jpg").exists()
    assert any("fake/B" in str(w.message) for w in caught)

    # restart: A.jpg exists -> skipped without a request
    session.script = []
    n = k2v.download_images(items, tmp_path, num_shards=2, shard_index=0)
    assert n == 0


# --------------------------------------------------------------------------
# Wikidata / Commons update pipeline (round-4 session 2: full live logic
# with injected transport — parity meerqat/data/wiki.py:432-926)
# --------------------------------------------------------------------------
def _sparql_response(bindings):
    return FakeResponse(200, {"results": {"bindings": bindings}})


def test_query_sparql_entities_skips_failed_batches():
    session = FakeSession([
        FakeResponse(404),
        _sparql_response([{"x": 1}]),
    ])
    with pytest.warns(UserWarning, match="skipping"):
        out = wiki.query_sparql_entities(
            "q %s", "http://fake/sparql", ["Q1", "Q2"], batch_size=1,
            session=session)
    assert out == [{"x": 1}]


def test_update_from_data_unique_and_multiple_keys():
    entities = {"Q1": {"n_questions": 3}, "Q2": {}}
    bindings = [
        {  # first instanceof + attributes of Q1
            "entity": {"value": "http://www.wikidata.org/entity/Q1"},
            "entityLabel": {"value": "Ada Lovelace"},
            "date_of_death": {"value": "1852-11-27T00:00:00Z"},
            "instanceof": {"value": "http://www.wikidata.org/entity/Q5"},
            "instanceofLabel": {"value": "human"},
            "image": {"value": "Ada.jpg"},
        },
        {  # a second instanceof binding for Q1 accumulates, not overwrites
            "entity": {"value": "http://www.wikidata.org/entity/Q1"},
            "entityLabel": {"value": "Ada Lovelace"},
            "instanceof": {"value": "http://www.wikidata.org/entity/Q937857"},
            "instanceofLabel": {"value": "mathematician"},
        },
        {  # unknown QID in the response must not crash the merge
            "entity": {"value": "http://www.wikidata.org/entity/Q999"},
            "entityLabel": {"value": "ghost"},
        },
    ]
    session = FakeSession([_sparql_response(bindings)])
    out = wiki.update_from_data(entities, session=session)
    assert out["Q1"]["entityLabel"]["value"] == "Ada Lovelace"
    assert out["Q1"]["date_of_death"]["value"].startswith("1852")
    iof = out["Q1"]["instanceof"]
    assert set(iof) == {"http://www.wikidata.org/entity/Q5",
                        "http://www.wikidata.org/entity/Q937857"}
    assert (iof["http://www.wikidata.org/entity/Q5"]["label"]["value"]
            == "human")
    assert out["Q1"]["image"]["Ada.jpg"]["value"] == "Ada.jpg"
    # the original fields survive the merge
    assert out["Q1"]["n_questions"] == 3


def test_update_from_data_skip_queries_only_missing():
    entities = {"Q1": {"entityLabel": {"value": "done"}}, "Q2": {}}
    session = FakeSession([_sparql_response([])])
    wiki.update_from_data(entities, skip="entityLabel", session=session)
    query = session.calls[0][1]["params"]["query"]
    assert "wd:Q2" in query and "wd:Q1" not in query


def test_set_reference_images_preference_and_encoding():
    entities = {
        # no illustrative image -> falls through to the logo
        "Q1": {"logo": {"L.jpg": {"value": "L.jpg"}}},
        # image attr exists but only an invalid encoding -> flag wins
        "Q2": {"image": {"X.ogv": {"value": "X.ogv"}},
               "flag": {"F.png": {"value": "F.png"}}},
        # image beats logo when both are valid (RESERVED_IMAGES order)
        "Q3": {"logo": {"L.png": {"value": "L.png"}},
               "image": {"type": "uri", "value": "legacy",
                         "I.jpg": {"value": "I.jpg"}}},
        "Q4": {},
    }
    out = wiki.set_reference_images(entities)
    assert out["Q1"]["reference_image"] == "L.jpg"
    assert out["Q2"]["reference_image"] == "F.png"
    assert out["Q3"]["reference_image"] == "I.jpg"
    # the legacy scalar fields were dropped from the multi-valued dict
    assert set(out["Q3"]["image"]) == {"I.jpg"}
    assert "reference_image" not in out["Q4"]


def test_update_from_commons_sparql_builds_depictions():
    entities = {"Q1": {}}
    bindings = [{
        "depicted_entity": {"value": "http://www.wikidata.org/entity/Q1"},
        "commons_entity": {"value": "https://commons.wikimedia.org/entity/M7"},
        "url": {"value": "https://upload.wikimedia.org/x/A.jpg"},
        "special_path": {"value": "http://commons.wikimedia.org/wiki/"
                                  "Special:FilePath/A.jpg"},
    }]
    session = FakeSession([_sparql_response(bindings)])
    out = wiki.update_from_commons_sparql(entities, session=session)
    dep = out["Q1"]["depictions"]["https://commons.wikimedia.org/entity/M7"]
    assert dep["url"]["value"].endswith("A.jpg")
    assert "special_path" in dep


def test_query_depicted_entities_uses_sdc_prefix():
    depictions = {"M7": [], "M8": []}
    bindings = [
        {"commons_entity": {"value": "https://commons.wikimedia.org/entity/M7"},
         "depicted_entity": {"value": "http://www.wikidata.org/entity/Q1"}},
        {"commons_entity": {"value": "https://commons.wikimedia.org/entity/M7"},
         "depicted_entity": {"value": "http://www.wikidata.org/entity/Q2"}},
    ]
    session = FakeSession([_sparql_response(bindings)])
    out = wiki.query_depicted_entities(depictions, session=session)
    assert out["M7"] == ["http://www.wikidata.org/entity/Q1",
                         "http://www.wikidata.org/entity/Q2"]
    assert out["M8"] == []
    assert "sdc:M7" in session.calls[0][1]["params"]["query"]


def test_depiction_instanceof_heuristic_and_prominent_filter():
    Q = "http://www.wikidata.org/entity/"
    M = "https://commons.wikimedia.org/entity/"
    entities = {
        "Q1": {"instanceof": {Q + "Q5": {}},            # human
               "depictions": {M + "M1": {}, M + "M2": {}}},
        "Q2": {"instanceof": {Q + "Q5": {}}},           # another human
        "Q3": {"instanceof": {Q + "Q570116": {}}},      # a monument
    }
    depictions = {
        "M1": [Q + "Q1", Q + "Q2"],  # two humans -> prominent for neither
        "M2": [Q + "Q1", Q + "Q3"],  # human + monument -> prominent
    }
    out = wiki.depiction_instanceof_heuristic(depictions, entities)
    d = out["Q1"]["depictions"]
    assert d[M + "M1"]["prominent_instanceof_heuristic"] is False
    assert d[M + "M2"]["prominent_instanceof_heuristic"] is True
    filtered = wiki.keep_prominent_depictions(out)
    assert set(filtered["Q1"]["depictions"]) == {M + "M2"}


def test_query_superclasses_levels_and_aggregation():
    entities = {"Q1": {"instanceof": {
        "http://www.wikidata.org/entity/Q5": {}}}}
    bindings = [
        {"class": {"value": "http://www.wikidata.org/entity/Q5"},
         "subclassof": {"value": "http://www.wikidata.org/entity/Q154954"},
         "subclassofLabel": {"value": "natural person"}},
        {"class": {"value": "http://www.wikidata.org/entity/Q5"},
         "subclassof": {"value": "http://www.wikidata.org/entity/Q215627"},
         "subclassofLabel": {"value": "person"}},
    ]
    session = FakeSession([_sparql_response(bindings)])
    out = wiki.query_superclasses(entities, n_levels=2, session=session)
    query = session.calls[0][1]["params"]["query"]
    assert "wdt:P279|wdt:P279/wdt:P279" in query
    supers = out["http://www.wikidata.org/entity/Q5"]
    assert (supers["http://www.wikidata.org/entity/Q215627"]["label"]["value"]
            == "person")
    # the output plugs straight into the class filters
    kept = wiki.keep_classes(
        entities, {"http://www.wikidata.org/entity/Q215627"},
        superclasses=out)
    assert set(kept) == {"Q1"}


def test_query_feminine_labels_collects_classes_and_occupations():
    Q = "http://www.wikidata.org/entity/"
    entities = {"Q1": {"instanceof": {Q + "Q5": {}},
                       "occupation": {Q + "Q36180": {}}}}
    bindings = [{"entity": {"value": Q + "Q36180"},
                 "entity_female_label": {"value": "writer (f)"}}]
    session = FakeSession([_sparql_response(bindings)])
    out = wiki.query_feminine_labels(entities, session=session)
    assert out == {Q + "Q36180": "writer (f)"}
    query = session.calls[0][1]["params"]["query"]
    assert "wd:Q36180" in query and "wd:Q5" in query


def _rest_response(payload):
    import json as _json
    return FakeResponse(200, content=_json.dumps(payload).encode())


def _members(*items):
    return _rest_response({"query": {"categorymembers": list(items)}})


def _image_page(title, categories=("Category:Cats",), license_name="CC0"):
    return _rest_response({"query": {"pages": {"1": {
        "title": title,
        "categories": [{"title": c} for c in categories],
        "imageinfo": [{
            "url": f"https://upload.wikimedia.org/x/{title[5:]}",
            "extmetadata": {
                "LicenseShortName": {"value": license_name},
                "ImageDescription": {"value": f"desc of {title}"},
                "Categories": {"value": "dropped"},
            },
        }],
    }}}})


def test_query_image_parses_and_pops_metadata():
    session = FakeSession([_image_page("File:A.jpg")])
    image = wiki.query_image("File:A.jpg", session)
    assert image["url"].endswith("A.jpg")
    assert image["categories"] == ["Category:Cats"]
    assert image["description"]["value"] == "desc of File:A.jpg"
    assert "ImageDescription" not in image["extmetadata"]
    assert "Categories" not in image["extmetadata"]
    assert wiki.license_score(image) == 8


def test_query_commons_subcategories_walk_dedup_and_filters():
    session = FakeSession([
        _members({"title": "File:A.jpg", "type": "file"},
                 {"title": "File:V.ogv", "type": "file"},  # invalid encoding
                 {"title": "Category:Child", "type": "subcat"}),
        _image_page("File:A.jpg"),
        _members({"title": "File:A.jpg", "type": "file"},   # dup: not refetched
                 {"title": "File:B.png", "type": "file"},
                 {"title": "Category:Root", "type": "subcat"}),  # loop guard
        _image_page("File:B.png"),
    ])
    categories, images = {}, {}
    wiki.query_commons_subcategories("Category:Root", categories, images,
                                     session=session)
    assert set(images) == {"File:A.jpg", "File:B.png"}
    assert categories["Category:Root"] is True
    assert categories["Category:Child"] is True
    assert len(session.calls) == 4  # 2 listings + 2 image fetches, no relist


def test_query_commons_subcategories_sibling_order():
    """Siblings must be walked in listing order (the reference's in-order
    recursion, wiki.py:590-668) — under capped budgets the harvested SET
    depends on visit order."""
    session = FakeSession([
        _members({"title": "Category:A", "type": "subcat"},
                 {"title": "Category:B", "type": "subcat"},
                 {"title": "Category:C", "type": "subcat"}),
        _members(),  # A listed first
        _members(),  # then B
        _members(),  # then C
    ])
    categories, images = {}, {}
    wiki.query_commons_subcategories("Category:Root", categories, images,
                                     session=session)
    listed = [kwargs_url for kwargs_url, _ in session.calls[1:]]
    assert [("Category:A" in u, "Category:B" in u, "Category:C" in u)
            for u in listed] == [(True, False, False),
                                 (False, True, False),
                                 (False, False, True)]


def test_query_commons_subcategories_image_budget():
    session = FakeSession([
        _members({"title": "File:A.jpg", "type": "file"},
                 {"title": "File:B.jpg", "type": "file"},
                 {"title": "Category:Child", "type": "subcat"}),
        _image_page("File:A.jpg"),
        _image_page("File:B.jpg"),
    ])
    categories, images = {}, {}
    wiki.query_commons_subcategories("Category:Root", categories, images,
                                     max_images=1, session=session)
    assert len(images) == 2  # budget checked per category, like the reference
    assert categories["Category:Child"] is False  # never listed


def test_query_commons_subcategories_categories_only_mode():
    session = FakeSession([
        _members({"title": "File:A.jpg", "type": "file"},
                 {"title": "Category:Child", "type": "subcat"}),
        _members(),
    ])
    categories, images = {}, {}
    wiki.query_commons_subcategories("Category:Root", categories, images,
                                     max_images=0, session=session)
    assert images == {}  # files skipped entirely
    assert categories == {"Category:Root": True, "Category:Child": True}


def test_update_from_commons_rest_gates_entities(capsys):
    session = FakeSession([
        _members({"title": "File:A.jpg", "type": "file"}),
        _image_page("File:A.jpg"),
    ])
    entities = {
        "Q1": {"n_questions": 2, "commons": {"value": "Ada Lovelace"}},
        "Q2": {"n_questions": 0, "commons": {"value": "Skipped"}},
        "Q3": {"n_questions": 5},  # no commons category
    }
    out = wiki.update_from_commons_rest(entities, session=session)
    assert set(out["Q1"]["images"]) == {"File:A.jpg"}
    assert out["Q1"]["categories"] == {"Category:Ada Lovelace": True}
    assert "images" not in out["Q2"] and "images" not in out["Q3"]
    assert "1 entities out of 3" in capsys.readouterr().out
    assert "Category:Ada Lovelace" in session.calls[0][0]


# --------------------------------------------------------------------------
# `wiki` CLI (parity reference wiki.py docopt dispatch :940-1042)
# --------------------------------------------------------------------------
def _cli(argv):
    from viquae_tpu.cli import main as cli_main
    cli_main(argv)


def test_cli_wiki_heuristics_and_filter(tmp_path, capsys):
    subset = tmp_path / "meerqat_test"
    subset.mkdir()
    Q = "http://www.wikidata.org/entity/"
    entities = {
        "Q1": {"entityLabel": {"value": "Ada"}, "instanceof": {Q + "Q5": {}},
               "gender": {"value": "f"},
               "date_of_death": {"value": "1852-11-27T00:00:00Z"},
               "images": {"File:Ada portrait.jpg":
                          {"categories": ["Category:Ada things"]}}},
        "Q2": {"instanceof": {Q + "Q11424": {}}},  # film (abstract here)
        "Q3": {"instanceof": {Q + "Q5": {}}},      # alive human
    }
    (subset / "entities.json").write_text(json.dumps(entities))

    _cli(["wiki", "heuristics", str(subset), "--heuristics", "title"])
    out = json.loads((subset / "entities.json").read_text())
    image = out["Q1"]["images"]["File:Ada portrait.jpg"]
    assert image["heuristics"] == {"title": True}

    abstract = tmp_path / "abstract_entities.csv"
    abstract.write_text("uri,label\n" + Q + "Q11424,film\n")
    _cli(["wiki", "filter", str(subset), "--abstract", str(abstract),
          "--deceased", "1900"])
    out = json.loads((subset / "entities.json").read_text())
    # Q2 dropped by the negative filter, Q3 by the deceased filter
    assert set(out) == {"Q1"}
    assert "entities" in capsys.readouterr().out


def test_cli_wiki_positive_filter_keeps_people(tmp_path):
    subset = tmp_path / "s"
    subset.mkdir()
    Q = "http://www.wikidata.org/entity/"
    entities = {
        "Q1": {"instanceof": {Q + "Q99": {}}, "occupation": {Q + "Q36180": {}}},
        "Q2": {"instanceof": {Q + "Q811979": {}}},  # concrete class
        "Q3": {"instanceof": {Q + "Q99": {}}},      # neither -> dropped
    }
    (subset / "entities.json").write_text(json.dumps(entities))
    concrete = tmp_path / "concrete_entities.csv"
    concrete.write_text("uri,label\n" + Q + "Q811979,structure\n")
    _cli(["wiki", "filter", str(subset), "--concrete", str(concrete)])
    out = json.loads((subset / "entities.json").read_text())
    assert set(out) == {"Q1", "Q2"}


def test_cli_wiki_live_action_through_injected_transport(tmp_path,
                                                         monkeypatch):
    """`wiki entities` drives update_from_data + set_reference_images and
    writes back entities.json (reference wiki.py:958-961)."""
    subset = tmp_path / "s"
    subset.mkdir()
    (subset / "entities.json").write_text(json.dumps(
        {"Q1": {"n_questions": 1}}))
    bindings = [{
        "entity": {"value": "http://www.wikidata.org/entity/Q1"},
        "entityLabel": {"value": "Ada Lovelace"},
        "instanceof": {"value": "http://www.wikidata.org/entity/Q5"},
        "instanceofLabel": {"value": "human"},
        "image": {"value": "Ada.jpg"},
    }]
    session = FakeSession([
        _sparql_response(bindings)])
    monkeypatch.setattr(wiki, "request",
                        lambda url, s=None, **kw: session.get(url, **kw))
    _cli(["wiki", "entities", str(subset)])
    out = json.loads((subset / "entities.json").read_text())
    assert out["Q1"]["entityLabel"]["value"] == "Ada Lovelace"
    assert out["Q1"]["reference_image"] == "Ada.jpg"


def test_save_image_writes_skips_and_caps(tmp_path):
    url = wiki.UPLOAD_URI_PREFIX + "a/a8/A.jpg"
    session = FakeSession([FakeResponse(200, content=b"img")])
    path = wiki.save_image(url, tmp_path, session)
    assert path.read_bytes() == b"img"
    # existing file -> no second request
    assert wiki.save_image(url, tmp_path, session) == path
    assert len(session.calls) == 1
    # over-long names are refused (filesystem limit)
    long_url = wiki.UPLOAD_URI_PREFIX + "a/a8/" + "x" * 300 + ".jpg"
    assert wiki.save_image(long_url, tmp_path, session) is None
