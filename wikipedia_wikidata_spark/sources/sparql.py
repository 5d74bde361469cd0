"""S7 — SPARQL place-type source (steps/wikidata_api_fetch_placetypes.sh).

The reference shells out to ``wdtaxonomy QID --instances`` (a node wrapper
around the Wikidata SPARQL endpoint) once per ~300 place types, keeps the
rows whose sitelink count is 0 (instances; rows with sites>0 are
subcategory items, :103-117), prefixes each with the place-type QID, and
lands ``wikidata_place_dump.csv.gz`` after ``grep '^Q' | uniq``
(:130-134).

This module re-expresses that as a pure-Python source with an INJECTED
transport: ``fetch`` is any callable ``(sparql_query: str) -> dict`` giving
the standard SPARQL 1.1 JSON results document. Tests (and this sandbox)
inject canned JSON; a real deployment passes :func:`http_fetch`, the
urllib transport against query.wikidata.org. Parsing, filtering, ordering
and the final uniq are all here and fully tested offline.

Scale note: like S1 this is EDGE work — ~300 serial queries against a
rate-limited public endpoint (the reference takes ~30 min). The cluster
only ever sees the landed (item, instance_of) rows, which enter the
importance plan through the broadcast place-taxonomy join (J6).
"""

from __future__ import annotations

import gzip
import json
import os
import urllib.request

from .download import USER_AGENT

WIKIDATA_SPARQL_ENDPOINT = "https://query.wikidata.org/sparql"


def place_instances_query(qid: str) -> str:
    """SPARQL for one place type: every item that is an instance (P31) of
    the type or of any transitive subclass (P279*), with its sitelink
    count — the same item set wdtaxonomy's ``--instances`` walk yields
    (its P279* taxonomy query is quoted at :43-55; instances attach via
    P31). ``sites`` lets the caller drop subcategory rows exactly like the
    reference's ``grep "[[:space:]]0$"``."""
    return f"""SELECT ?item (COUNT(DISTINCT ?site) AS ?sites) WHERE {{
  ?item wdt:P31/wdt:P279* wd:{qid} .
  OPTIONAL {{ ?site schema:about ?item }}
}} GROUP BY ?item"""


def http_fetch(query: str, endpoint: str = WIKIDATA_SPARQL_ENDPOINT,
               timeout_s: float = 60.0) -> dict:
    """Real transport (NOT used in tests/sandbox — no network here): POST
    the query, request SPARQL JSON. The endpoint's 60 s limit (:57-59) is
    mirrored as the client timeout."""
    req = urllib.request.Request(
        endpoint,
        data=urllib.parse.urlencode({"query": query, "format": "json"}).encode(),
        headers={"User-Agent": USER_AGENT, "Accept": "application/sparql-results+json"},
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return json.load(resp)


def parse_instances(doc: dict) -> list[tuple[str, int]]:
    """SPARQL JSON results -> [(item_qid, sites)]. Item IRIs reduce to the
    trailing id segment; literals pass through (wdtaxonomy's TSV id col)."""
    out = []
    for b in doc.get("results", {}).get("bindings", []):
        item = b.get("item", {}).get("value", "")
        item = item.rsplit("/", 1)[-1]
        sites = int(b.get("sites", {}).get("value", 0) or 0)
        out.append((item, sites))
    return out


def place_dump_rows(
    place_types: list[str],
    fetch,
) -> list[tuple[str, str]]:
    """The full fetch loop (:76-124) -> [(item, instance_of)] rows in the
    reference's landed order: place types in input-file order, items sorted
    within each type (its per-type ``sort``), then the final
    ``grep '^Q' | uniq`` — Q-rows only, ADJACENT duplicates collapsed
    (uniq, not a global distinct: the reference leaves cross-type
    duplicates like an item instancing two fetched types in place; P8's
    extractor dedups globally later)."""
    rows: list[tuple[str, str]] = []
    for qid in place_types:
        doc = fetch(place_instances_query(qid))
        items = sorted(item for item, sites in parse_instances(doc) if sites == 0)
        rows.extend((item, qid) for item in items)
    out: list[tuple[str, str]] = []
    for r in rows:
        if not r[0].startswith("Q"):
            continue
        if out and out[-1] == r:
            continue
        out.append(r)
    return out


def write_place_dump_csv(rows: list[tuple[str, str]], out_path: str) -> str:
    """Land the gzip CSV artifact (``wikidata_place_dump.csv.gz``, :130-134);
    skip-if-exists like the script's top guard (:14-17)."""
    if os.path.exists(out_path):
        return out_path
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".part"
    with gzip.open(tmp, "wt", newline="") as f:
        for item, qid in rows:
            f.write(f"{item},{qid}\n")
    os.replace(tmp, out_path)
    return out_path


def place_dump_df(spark, rows: list[tuple[str, str]]):
    """(item, instance_of) DataFrame from landed rows — the same shape
    places_view (P8) extracts from the synthesized corpus, so the
    importance plan can consume either source unchanged."""
    return spark.createDataFrame(rows, "item string, instance_of string")
