"""M10 TripAdvisor enrichment: path grammar, emission shape, and the
fold of the emitted edits back through apply_operations (M9) —
mirroring the reference loop TripAdvisorBot.java:57-83 where the edit
op would be added to the operation and applied by the blockchain."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from openplacereviews_db_spark.operators import changelog as C
from openplacereviews_db_spark.operators.tripadvisor import (
    URL_PREFIX, tripadvisor_enrich_ops)
from openplacereviews_db_spark.sources import places as P


def test_path_grammar_roundtrip():
    for i in (0, 1, 17):
        for leaf in ("stars", "reviews"):
            path = C.format_path(["source", "tripAdvisor", i, leaf])
            assert path == f"source.tripAdvisor[{i}].{leaf}"
            assert C.parse_path(path) == ["source", "tripAdvisor", i, leaf]


@pytest.fixture(scope="module")
def ops_rows(spark, sf_dir):
    pl = P.synthetic_places(spark, sf_dir)
    return tripadvisor_enrich_ops(pl).collect()


def test_emission_shape(ops_rows):
    assert ops_rows, "slice must be non-empty"
    saw_two, saw_current = False, False
    for r in ops_rows:
        assert r["fetch_urls"].startswith(URL_PREFIX)
        change = json.loads(r["change_json"])
        current = json.loads(r["current_json"])
        # two entries per tripadvisor source index: reviews + stars
        assert len(change) == 2 * r["n_trip"]
        assert list(change) == sorted(change), "TreeMap key order"
        for path, op in change.items():
            assert set(op) == {"set"}
            parts = C.parse_path(path)
            assert parts[:2] == ["source", "tripAdvisor"]
            assert parts[3] in ("stars", "reviews")
        assert set(current) <= set(change)
        saw_two = saw_two or r["n_trip"] == 2
        saw_current = saw_current or bool(current)
    assert saw_two and saw_current


def test_fold_back_through_apply_operations(spark, sf_dir):
    """Apply the emitted edits with the M9 fold; every tripAdvisor entry
    must end with the deterministic rating, and the current map must
    equal the pre-edit values where they existed."""
    pl = P.synthetic_places(spark, sf_dir)
    docs = pl.where(F.col("source.tripAdvisor").isNotNull()).select(
        F.concat_ws(",", "tile_id", "suffix").alias("obj_id"),
        F.to_json(F.struct("source")).alias("doc"))
    ops = tripadvisor_enrich_ops(pl).select(
        F.col("opr_id").alias("obj_id"),
        F.lit(1).cast("long").alias("block_id"),
        F.lit(0).cast("long").alias("op_seq"),
        F.lit(C.ACTION_EDIT).alias("action"),
        F.lit(None).cast("string").alias("doc"),
        F.col("change_json").alias("change"))
    before = {r["obj_id"]: json.loads(r["doc"]) for r in docs.collect()}
    current = {r["opr_id"]: json.loads(r["current_json"])
               for r in tripadvisor_enrich_ops(pl).collect()}
    folded = C.apply_operations(docs, ops).collect()
    assert len(folded) == len(before)
    for r in folded:
        doc = json.loads(r["doc"])
        old = before[r["obj_id"]]["source"]["tripAdvisor"]
        cur = current[r["obj_id"]]
        for i, entry in enumerate(doc["source"]["tripAdvisor"]):
            d = int(entry["id"][1][1:])
            assert entry["stars"] == (d % 9 + 1) / 2.0
            assert entry["reviews"] == d % 500 + 1
            prefix = f"source.tripAdvisor[{i}]."
            if old[i].get("stars") is not None:
                assert cur[prefix + "stars"] == old[i]["stars"]
                assert cur[prefix + "reviews"] == old[i]["reviews"]
            else:
                assert prefix + "stars" not in cur
