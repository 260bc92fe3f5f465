"""Entity data collection from Wikidata/Wikimedia Commons
(parity meerqat/data/wiki.py).

Offline-deterministic logic (thumbnail URL construction, license scoring,
image heuristics, class filtering, stats) is implemented directly; every
network interaction (SPARQL, Commons REST) goes through :func:`request`
with retry/backoff and raises a clear error when the environment has no
egress — this framework's runtime has none, so these builders are meant for
data-prep hosts.
"""
from __future__ import annotations

import json
import re
import time
import warnings
from typing import Dict, Iterable, Optional, Set

from viquae_tpu.data.utils import md5

UPLOAD_URI_PREFIX = "https://upload.wikimedia.org/wikipedia/commons/"
SPECIAL_FILE_PATH_URI_PREFIX = "http://commons.wikimedia.org/wiki/Special:FilePath/"
SPECIAL_PATH_URI_PREFIX = "https://commons.wikimedia.org/wiki/Special:FilePath/"
WIKIDATA_ENDPOINT = "https://query.wikidata.org/sparql"
COMMONS_SPARQL_ENDPOINT = "https://commons-query.wikimedia.org/sparql"

VALID_ENCODING = {"png", "jpg", "jpeg", "gif", "svg", "tiff", "tif", "pdf",
                  "djvu", "webp", "xcf", "bmp"}
VALID_IMAGE_HEURISTICS = {"categories", "description", "depictions", "title"}

# thumbnails of special formats get converted (prefix, suffix per extension)
EXTENSIONS_PRE_AND_SUFFIXES = {
    "svg": ("", ".png"),
    "tif": ("lossy-page1-", ".jpg"),
    "tiff": ("lossy-page1-", ".jpg"),
    "pdf": ("page1-", ".jpg"),
    "djvu": ("page1-", ".jpg"),
}

# license preference scores; higher is freer (0 = missing/other)
LICENSES = {
    "CC0": 8,
    "PUBLIC DOMAIN MARK": 7,
    "PUBLIC DOMAIN": 7,
    "PDM": 7,
    "BY": 6,
    "BY-SA": 5,
    "BY-NC": 4,
    "BY-ND": 3,
    "BY-NC-SA": 2,
    "BY-NC-ND": 1,
}


# --------------------------------------------------------------------------
# URL helpers
# --------------------------------------------------------------------------
def file_name_to_thumbnail(file_name: str, image_width: Optional[int] = None
                           ) -> str:
    """Commons file name -> upload.wikimedia.org (thumbnail) URL.

    Commons shards files by the md5 of the underscored name; thumbnails of
    special formats (svg/tif/pdf/djvu) get converted extensions.
    """
    file_name = file_name.replace(" ", "_")
    file_hash = md5(file_name)
    if image_width is None:
        thumb, sized_name = "", ""
    else:
        thumb = "thumb/"
        extension = file_name.split(".")[-1].lower()
        prefix, suffix = EXTENSIONS_PRE_AND_SUFFIXES.get(extension, ("", ""))
        sized_name = f"/{prefix}{image_width:d}px-{file_name}{suffix}"
    return (
        f"{UPLOAD_URI_PREFIX}{thumb}{file_hash[0]}/{file_hash[:2]}/"
        f"{file_name}{sized_name}"
    )


def thumbnail_to_file_name(url: str, original: bool = True) -> str:
    """Inverse of file_name_to_thumbnail (also handles Special:FilePath)."""
    for prefix in (SPECIAL_FILE_PATH_URI_PREFIX, SPECIAL_PATH_URI_PREFIX):
        if url.startswith(prefix):
            return url[len(prefix):]
    if url.startswith(UPLOAD_URI_PREFIX):
        rest = url[len(UPLOAD_URI_PREFIX):]
        if rest.startswith("thumb/"):
            parts = rest[len("thumb/a/a8/"):].split("/")
            return parts[0] if original else parts[-1]
        return rest[len("a/a8/"):]
    return url.split("/")[-1]


def special_path_to_file_name(special_path: str) -> str:
    return "File:" + special_path.split("/")[-1].replace("_", " ")


# --------------------------------------------------------------------------
# license scoring
# --------------------------------------------------------------------------
def get_license(image: dict) -> str:
    return (
        image.get("extmetadata", {})
        .get("LicenseShortName", {})
        .get("value", "")
        .upper()
    )


def license_score(image: dict) -> int:
    license_ = get_license(image)
    cc = re.match(r"CC[ -](BY\S*)[ -]\d\.\d", license_)
    if cc is not None:
        license_ = cc.group(1)
    return LICENSES.get(license_, 0)


# --------------------------------------------------------------------------
# image heuristics (which image best illustrates the entity)
# --------------------------------------------------------------------------
def image_heuristic(entities: Dict[str, dict],
                    heuristics: Set[str] = VALID_IMAGE_HEURISTICS
                    ) -> Dict[str, dict]:
    """Score each candidate image of each entity by how many heuristics fire:
    label in all categories / in description / tagged as depiction / in
    title (parity wiki.py:740-796)."""
    invalid = set(heuristics) - VALID_IMAGE_HEURISTICS
    if invalid:
        raise NotImplementedError(
            f"No heuristic implemented for {invalid}; use {VALID_IMAGE_HEURISTICS}"
        )
    for entity in entities.values():
        label = entity.get("entityLabel", {}).get("value")
        if not label or "images" not in entity:
            continue
        label = label.lower()
        depictions = set()
        if "depictions" in heuristics:
            depictions = {
                special_path_to_file_name(d["special_path"]["value"])
                for d in entity.get("depictions", {}).values()
            }
        for title, image in entity["images"].items():
            image.setdefault("heuristics", {})
            if "categories" in heuristics and image.get("categories"):
                if all(label in c.lower() for c in image["categories"]):
                    image["heuristics"]["categories"] = True
            if "description" in heuristics:
                description = image.get("description", "")
                if isinstance(description, dict):
                    description = description.get("value")
                if description and label in description.lower():
                    image["heuristics"]["description"] = True
            if "depictions" in heuristics and title in depictions:
                image["heuristics"]["depictions"] = True
            if "title" in heuristics and label in title.lower():
                image["heuristics"]["title"] = True
    return entities


def best_image(entity: dict) -> Optional[str]:
    """Pick the image with most heuristics, ties by license score."""
    images = entity.get("images", {})
    if not images:
        return None
    return max(
        images,
        key=lambda t: (
            len(images[t].get("heuristics", {})),
            license_score(images[t]),
        ),
    )


def keep_prominent_depictions(entities: Dict[str, dict]) -> Dict[str, dict]:
    """Keep only depictions marked prominent (P180 qualifier)."""
    for entity in entities.values():
        depictions = entity.get("depictions")
        if not depictions:
            continue
        prominent = {
            k: d for k, d in depictions.items()
            if d.get("prominent", {}).get("value") in ("true", True, "1", 1)
        }
        if prominent:
            entity["depictions"] = prominent
    return entities


# --------------------------------------------------------------------------
# class filtering
# --------------------------------------------------------------------------
def _entity_classes(entity) -> Set[str]:
    instanceof = entity.get("instanceof", {})
    if isinstance(instanceof, dict):
        return set(instanceof.keys())
    return set(instanceof or [])


def exclude_classes(entities: Dict[str, dict], classes_to_exclude: Set[str],
                    superclasses: Optional[Dict[str, Set[str]]] = None
                    ) -> Dict[str, dict]:
    superclasses = superclasses or {}
    out = {}
    for qid, entity in entities.items():
        classes = _entity_classes(entity)
        expanded = set(classes)
        for c in classes:
            expanded |= set(superclasses.get(c, ()))
        if expanded & set(classes_to_exclude):
            continue
        out[qid] = entity
    return out


def keep_classes(entities: Dict[str, dict], classes_to_keep: Set[str],
                 superclasses: Optional[Dict[str, Set[str]]] = None
                 ) -> Dict[str, dict]:
    superclasses = superclasses or {}
    out = {}
    for qid, entity in entities.items():
        classes = _entity_classes(entity)
        expanded = set(classes)
        for c in classes:
            expanded |= set(superclasses.get(c, ()))
        if expanded & set(classes_to_keep):
            out[qid] = entity
    return out


def iso2year(iso: str) -> int:
    """ISO date -> year, handling negative (BC) years."""
    if iso.startswith("-"):
        return -int(iso[1:].split("-")[0])
    return int(iso.split("-")[0])


def remove_alive_humans(entities: Dict[str, dict],
                        year_threshold: float = float("inf")
                        ) -> Dict[str, dict]:
    """Keep only humans with a death date (or born before threshold)."""
    out = {}
    for qid, entity in entities.items():
        if "date_of_death" in entity:
            out[qid] = entity
            continue
        birth = entity.get("date_of_birth", {}).get("value")
        if birth and iso2year(birth) < year_threshold:
            out[qid] = entity
    return out


def stats(entities: Dict[str, dict]) -> Dict[str, int]:
    counts: Dict[str, int] = {"entities": len(entities)}
    for entity in entities.values():
        for key in entity:
            counts[key] = counts.get(key, 0) + 1
    return counts


# --------------------------------------------------------------------------
# network layer (gated)
# --------------------------------------------------------------------------
def request(url: str, session=None, tries: int = 0, max_tries: int = 2,
            backoff: float = 2.0, **kwargs):
    """HTTP GET with retry/backoff (parity wiki.py:562-588). Raises
    RuntimeError with a clear message when the host has no egress."""
    import requests

    session = session or requests.Session()
    try:
        response = session.get(url, **kwargs)
        if response.status_code in (429, 500, 502, 503) and tries < max_tries:
            time.sleep(backoff ** (tries + 1))
            return request(url, session, tries + 1, max_tries, backoff, **kwargs)
        response.raise_for_status()
        return response
    except requests.exceptions.ConnectionError as e:
        if tries < max_tries:
            time.sleep(backoff ** (tries + 1))
            return request(url, session, tries + 1, max_tries, backoff, **kwargs)
        raise RuntimeError(
            f"Network unavailable for {url!r} — the wiki builders require an "
            "egress-enabled data-prep host"
        ) from e


def query_sparql_entities(query: str, endpoint: str, wikidata_ids,
                          prefix: str = "wd:", batch_size: int = 100,
                          session=None) -> list:
    """Run a SPARQL query over batches of entity QIDs."""
    results = []
    ids = list(wikidata_ids)
    for start in range(0, len(ids), batch_size):
        batch = " ".join(prefix + q for q in ids[start: start + batch_size])
        response = request(
            endpoint, session,
            params={"query": query % batch, "format": "json"},
            headers={"User-Agent": "viquae-tpu/0.1"},
        )
        results.extend(
            response.json().get("results", {}).get("bindings", [])
        )
    return results
