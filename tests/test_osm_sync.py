"""OSM sync pipeline tests (J1 lookup, M1-M4 op generation, S14 packing,
M7/M8 bot passes) on hand-built fixtures."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from openplacereviews_db_spark.functions import geo
from openplacereviews_db_spark.operators import changelog as C
from openplacereviews_db_spark.operators import osm_sync as S
from openplacereviews_db_spark.sources.places import PLACE_SCHEMA

LAT, LON = 48.85, 2.29
TILE = geo.olc_encode_py(LAT, LON, 6)


def _ref(osm_id, value="cafe", name="Blue Cafe", version="2", deleted=None,
         lat=LAT, lon=LON):
    return {"id": osm_id, "type": "node", "osm_tag": "amenity",
            "osm_value": value, "tags": {"name": name, "amenity": value},
            "lat": lat, "lon": lon, "version": version, "changeset": None,
            "timestamp": "2021-01-01T00:00:00", "deleted": deleted}


def _places(spark, refs_per_place):
    rows = [
        {"tile_id": TILE, "suffix": f"s{i}", "lat": LAT, "lon": LON,
         "placetype": refs[0]["osm_value"], "deleted": None,
         "source": {"osm": refs}, "images": {}}
        for i, refs in enumerate(refs_per_place)
    ]
    return spark.createDataFrame(rows, PLACE_SCHEMA)


def _entities(spark, rows):
    return spark.createDataFrame(
        rows, "entity_type string, id long, lat double, lon double, "
              "tags map<string,string>, version int, timestamp string")


def test_lookup_max_version(spark):
    # two places both referencing osm id 7 → max ref version wins (A6)
    places = _places(spark, [[_ref(7, version="2")], [_ref(7, version="5")]])
    ents = _entities(spark, [("node", 7, LAT, LON,
                              {"name": "Blue Cafe", "amenity": "cafe"},
                              6, "2021-02-01T00:00:00")])
    got = S.osm_id_lookup(ents, places).collect()
    assert len(got) == 1 and got[0]["suffix"] == "s1"


def test_sync_ops_m1_m2_m4(spark):
    places = _places(spark, [
        [_ref(1)],                      # will match entity 1 unchanged
        [_ref(2)],                      # entity 2 edits a tag
        [_ref(3, name="Old Name")],     # entity 3 changes match-id
    ])
    ents = _entities(spark, [
        ("node", 1, LAT, LON, {"name": "Blue Cafe", "amenity": "cafe"},
         2, "2021-01-01T00:00:00"),
        ("node", 2, LAT, LON, {"name": "Blue Cafe", "amenity": "cafe",
                               "wifi": "yes"}, 3, "2021-02-01T00:00:00"),
        ("node", 3, LAT, LON, {"name": "Fresh Name", "amenity": "cafe"},
         4, "2021-02-01T00:00:00"),
        ("node", 9, LAT, LON, {"name": "Brand New", "amenity": "bar"},
         1, "2021-02-01T00:00:00"),
    ])
    ops = S.generate_sync_ops(ents, places).collect()
    by_action: dict = {}
    for r in ops:
        by_action.setdefault(r["action"], []).append(r)

    # entity 1: identical except version/timestamp -> version+timestamp edit
    edits = {r["obj_id"]: json.loads(r["change"]) for r in by_action["edit"]}
    assert f"{TILE},s1" in edits
    e2 = edits[f"{TILE},s1"]
    assert e2["source.osm[0].tags.wifi"] == {"set": "yes"}
    assert e2["source.osm[0].version"] == {"set": "3"}
    # entity 3: match-id change -> tombstone on old place + create
    e3 = edits[f"{TILE},s2"]
    assert "source.osm[0].deleted" in e3
    creates = {r["obj_id"]: json.loads(r["doc"]) for r in by_action["create"]}
    assert any(d["source"]["osm"][0]["id"] == 3 for d in creates.values())
    assert any(d["source"]["osm"][0]["id"] == 9 for d in creates.values())
    # ops replay cleanly through the changelog fold
    docs = spark.createDataFrame(
        [(f"{TILE},s{i}", json.dumps({"source": {"osm": [_ref(i + 1)]}}))
         for i in range(3)], "obj_id string, doc string")
    ops_df = S.generate_sync_ops(ents, places)
    folded = C.apply_operations(docs, ops_df).collect()
    assert len(folded) == 5  # 3 originals + 2 creations


def test_pack_operations(spark):
    ops = spark.createDataFrame(
        [(f"id{i:04d}", 0, i, "edit", None, "{}") for i in range(1000)],
        "obj_id string, block_id long, op_seq long, action string, "
        "doc string, change string")
    packed = S.pack_operations(ops, places_per_op=250, ops_per_block=2)
    agg = (packed.groupBy("block_no", "op_no").count()
           .orderBy("block_no", "op_no").collect())
    assert [(r["block_no"], r["op_no"], r["count"]) for r in agg] == [
        (0, 0, 250), (0, 1, 250), (1, 2, 250), (1, 3, 250)]


def test_placetype_ops(spark):
    places = _places(spark, [
        [_ref(1, value="bar")],                       # placetype says bar
        [_ref(2, value="cafe")],                      # unchanged
        [_ref(3, deleted="2021-01-01"), _ref(4, value="pub")],  # main = 2nd
    ])
    # force placetype column mismatches
    places = places.withColumn("placetype", F.lit("cafe"))
    got = {r["obj_id"]: json.loads(r["change"])
           for r in S.placetype_ops(places).collect()}
    assert got[f"{TILE},s0"] == {"placetype": {"set": "bar"}}
    assert got[f"{TILE},s2"] == {"placetype": {"set": "pub"}}
    assert f"{TILE},s1" not in got


def test_migrate_old_ids_roundtrip(spark):
    doc = {"source": {"osm": [_ref(1)],
                      "old-osm-ids": [{"id": 99, "type": "node"}]}}
    docs = spark.createDataFrame([("p1", json.dumps(doc))],
                                 "obj_id string, doc string")
    ops = S.migrate_old_ids_ops(docs, now_iso="2021-06-01T00:00:00")
    folded = {r["obj_id"]: json.loads(r["doc"])
              for r in C.apply_operations(docs, ops).collect()}
    out = folded["p1"]["source"]
    assert "old-osm-ids" not in out
    assert out["osm"][1] == {"id": 99, "type": "node",
                             "deleted": "2021-06-01T00:00:00"}
