"""Mocked-HTTP tests for the network-gated wiki/kilt2vqa paths.

This VM has zero egress, so the live SPARQL/REST/download code
(`data/wiki.py` network layer, `data/kilt2vqa.download_images`) cannot hit
real endpoints; these tests drive the retry/backoff, batching, and
error-tolerance semantics through injected fake sessions instead —
the behaviors the reference implements at meerqat/data/wiki.py:562-588
and kilt2vqa.py:671-695.
"""
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
