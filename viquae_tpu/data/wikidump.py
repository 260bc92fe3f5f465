"""Stream-parse a Wikimedia Commons XML dump for per-category image metadata
(parity meerqat/data/wikidump.py:24-126)."""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Dict, Iterable, Optional

NAMESPACE = "{http://www.mediawiki.org/xml/export-0.10/}"
FILE_NS = "6"  # MediaWiki namespace id for File: pages

_FIELD_RE = {
    "description": re.compile(
        r"description\s*=\s*(.*?)(?:\n\s*\|[a-z_]+\s*=|\}\})",
        re.IGNORECASE | re.DOTALL,
    ),
    "author": re.compile(
        r"author\s*=\s*(.*?)(?:\n\s*\|[a-z_]+\s*=|\}\})",
        re.IGNORECASE | re.DOTALL,
    ),
    "date": re.compile(
        r"\bdate\s*=\s*(.*?)(?:\n\s*\|[a-z_]+\s*=|\}\})",
        re.IGNORECASE | re.DOTALL,
    ),
}
_CATEGORY_RE = re.compile(r"\[\[Category:([^\]\|]+)", re.IGNORECASE)


def iter_pages(path) -> Iterable[ET.Element]:
    """Stream <page> elements, clearing memory as we go (dump-scale safe)."""
    for _, element in ET.iterparse(str(path), events=("end",)):
        if element.tag == f"{NAMESPACE}page":
            yield element
            element.clear()


def find_text(element: ET.Element, tag: str) -> Optional[str]:
    child = element.find(f"{NAMESPACE}{tag}")
    return child.text if child is not None else None


def get_field(wikitext: str, field: str) -> Optional[str]:
    match = _FIELD_RE[field].search(wikitext or "")
    return match.group(1).strip() if match else None


def get_categories(wikitext: str) -> list:
    return [c.strip() for c in _CATEGORY_RE.findall(wikitext or "")]


def process_page(page: ET.Element) -> Optional[dict]:
    """One File: page -> {title, categories, description, author, date}."""
    if find_text(page, "ns") != FILE_NS:
        return None
    title = find_text(page, "title")
    revision = page.find(f"{NAMESPACE}revision")
    wikitext = (
        find_text(revision, "text") if revision is not None else None
    ) or ""
    return {
        "title": title,
        "categories": get_categories(wikitext),
        "description": get_field(wikitext, "description"),
        "author": get_field(wikitext, "author"),
        "date": get_field(wikitext, "date"),
    }


def process_dump(dump_path, entity_categories: Dict[str, str]) -> Dict[str, list]:
    """Collect image metadata for every category mapped to an entity.

    entity_categories: {category_name: entity_qid}. Returns
    {qid: [image dicts]}.
    """
    out: Dict[str, list] = {}
    for page in iter_pages(dump_path):
        image = process_page(page)
        if image is None:
            continue
        for category in image["categories"]:
            qid = entity_categories.get(category)
            if qid is not None:
                out.setdefault(qid, []).append(image)
    return out
