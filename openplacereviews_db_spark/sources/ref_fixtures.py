"""Reference ground-truth fixture extraction (merge pair corpora).

The reference ships two executable merge corpora
(``openplacereviews-core/src/test/resources/merge/places.json`` — 10
pairs its bot MUST merge — and ``places_not_merge.json`` — pairs whose
main names must NOT name-match; ``MergePlaceBotTest.java:39-72``).
This module extracts the cascade-relevant fields per pair so both the
Spark plan and its DuckDB oracle can run the match cascade over the
reference's own corpus (``plans/merge_plans.py:m12_fixture_verdicts``).

Extraction mirrors ``MergeUtil.getMainOsmFromList``
(``MergeUtil.java:210-228``: first osm entry with lat/lon/osm_value and
no tombstone, else the first tombstoned one) and
``MergeUtil.getOtherPlaceName`` (``MergeUtil.java:127-135``: every
``name*`` tag plus ``old_name``).  In each fixture pair, element ``i``
is the active place and ``i+1`` the closed one, per ``mergePlaces``'s
``(oldObj=places[i+1], placesToMerge=[places[i]])`` call shape.
"""

from __future__ import annotations

import json
import os

REF_DIR = os.environ.get("OPR_REFERENCE_DIR", "/root/reference")
MERGE_DIR = os.path.join(
    REF_DIR, "openplacereviews-core/src/test/resources/merge")


def _main_osm(obj: dict) -> dict | None:
    main = None
    for m in obj.get("source", {}).get("osm", []):
        if "lat" in m and "lon" in m and "osm_value" in m:
            if "deleted" not in m:
                return m
            if main is None:
                main = m
    return main


def _tags(obj: dict) -> dict:
    m = _main_osm(obj)
    return (m or {}).get("tags") or {}


def _alt_names(tags: dict, include_old_name: bool = True) -> list[str]:
    return [v for k, v in tags.items()
            if k.startswith("name")
            or (include_old_name and k == "old_name")]


def fixtures_available() -> bool:
    return os.path.isdir(MERGE_DIR)


def merge_pair_rows() -> list[tuple]:
    """One row per fixture pair, both corpora: (fixture, idx, c_name,
    a_name, c_wikidata, a_wikidata, c_website, a_website, c_alt, a_alt,
    c_alt_core, a_alt_core) — ``*_alt_core`` excludes ``old_name``,
    isolating the tier-3 old_name collision the negative corpus has."""
    rows: list[tuple] = []
    for fixture, fname in (("merge", "places.json"),
                           ("not_merge", "places_not_merge.json")):
        arr = json.load(open(os.path.join(MERGE_DIR, fname)))
        assert len(arr) % 2 == 0
        for idx in range(0, len(arr), 2):
            active, closed = arr[idx], arr[idx + 1]
            ta, tc = _tags(active), _tags(closed)
            rows.append((
                fixture, idx // 2,
                tc.get("name"), ta.get("name"),
                tc.get("wikidata"), ta.get("wikidata"),
                tc.get("website"), ta.get("website"),
                _alt_names(tc), _alt_names(ta),
                _alt_names(tc, include_old_name=False),
                _alt_names(ta, include_old_name=False),
            ))
    return rows


PAIR_SCHEMA = (
    "fixture string, idx int, c_name string, a_name string, "
    "c_wikidata string, a_wikidata string, c_website string, "
    "a_website string, c_alt array<string>, a_alt array<string>, "
    "c_alt_core array<string>, a_alt_core array<string>")


def _sql_str(s: str | None) -> str:
    return "NULL" if s is None else "'" + s.replace("'", "''") + "'"


def _sql_arr(xs: list[str]) -> str:
    return ("CAST([" + ", ".join(_sql_str(x) for x in xs)
            + "] AS VARCHAR[])")


def pairs_values_cte() -> str:
    """The same rows as :func:`merge_pair_rows`, as a DuckDB VALUES CTE
    named ``pairs`` — the oracle side of the fixture corpus."""
    body = ",\n        ".join(
        "(" + ", ".join([
            _sql_str(fx), str(i),
            _sql_str(cn), _sql_str(an),
            _sql_str(cw), _sql_str(aw),
            _sql_str(cs), _sql_str(as_),
            _sql_arr(ca), _sql_arr(aa),
            _sql_arr(cac), _sql_arr(aac),
        ]) + ")"
        for (fx, i, cn, an, cw, aw, cs, as_, ca, aa, cac, aac)
        in merge_pair_rows())
    return (f"pairs(fixture, idx, c_name, a_name, c_wikidata, "
            f"a_wikidata, c_website, a_website, c_alt, a_alt, "
            f"c_alt_core, a_alt_core) AS (VALUES\n        {body})")
