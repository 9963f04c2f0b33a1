"""Merge-pipeline query plans (J3/J4/J5, J8/M6, G2) with DuckDB oracles.

The match cascade runs over the deterministic flat snapshots
(`sources.places.synthetic_active_flat` / `synthetic_closed_flat`)
whose SQL mirror plus the `functions.text.check_names_sql` cascade
makes the fuzzy join value-checkable end to end — tile blocking,
haversine threshold, Levenshtein tiers and all.

``g2_proximity_groups`` (greedy clustering) is genuinely non-SQL
(order-dependent greedy loop), so its contract row checks INVARIANTS:
the query runs the real kernel and emits per-tile partition mirrors +
zero-pinned violation counters that DuckDB recomputes independently;
the exact greedy assignment stays pinned by tests/test_merge.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from ..functions import text as TX
from ..functions.geo import haversine_m_sql
from ..operators import cluster, place_merge
from ..sources import places as P

CLOSE_NOW_ISO = "2021-06-01T00:00:00"


def j4_match_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 distance join + J4 cascade over the flat snapshots."""
    closed = P.synthetic_closed_flat(spark, sf_dir)
    active = P.synthetic_active_flat(spark, sf_dir)
    cands = place_merge.merge_candidates(closed, active)
    return cands.select(
        "c_id", "a_id", "match_type",
        F.round("dist_m", 2).alias("dist_m"),
    )


def j5_pick_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 ambiguity guard + best-candidate pick on top of the cascade."""
    closed = P.synthetic_closed_flat(spark, sf_dir)
    active = P.synthetic_active_flat(spark, sf_dir)
    picks = place_merge.pick_merges(
        place_merge.merge_candidates(closed, active))
    return picks.select("c_id", "a_id", "match_type",
                        F.round("dist_m", 2).alias("dist_m"))


def m6_close_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 safety anti-join + age gate: which closed places get the
    permanent-close op (M6)."""
    closed = P.synthetic_closed_flat(spark, sf_dir)
    active = P.synthetic_active_flat(spark, sf_dir)
    cands = place_merge.merge_candidates(closed, active)
    ops = place_merge.close_ops(closed, cands, CLOSE_NOW_ISO)
    return ops.select("obj_id", "action", "change")


def _g2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    closed = P.synthetic_closed_flat(spark, sf_dir).select(
        F.substring("tile_id", 1, 4).alias("tile"),
        F.col("id"), "lat", "lon", F.lit("deleted").alias("status"))
    created = P.synthetic_active_flat(spark, sf_dir).select(
        F.substring("tile_id", 1, 4).alias("tile"),
        F.col("id"), "lat", "lon", F.lit("created").alias("status"))
    return closed.unionByName(created)


def g2_proximity_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 greedy 150 m clustering per 4-char tile, reported as a
    per-tile INVARIANT check.

    The exact group assignment is order-dependent greedy (not
    SQL-expressible; pinned by unit goldens in tests/test_merge.py and
    the per-feature property test in test_merge.py::test_g2_invariants),
    but the invariants every correct greedy run satisfies ARE
    deterministic, so this query runs the real kernel and emits, per
    tile: the input partition mirror (n_deleted / n_created / n_rows —
    the groups must partition the input) and five violation counters
    that must all be zero (duplicated members, ungrouped deleted
    features, groups whose seq-0 member is not the deleted seed,
    created-before-deleted seq ordering — the reference's
    [deleted…, created…] invariant, OprHistoryChangesProvider.java:205 —
    non-dense seq, and members ≥150 m from their group seed).  The
    DuckDB oracle recomputes the mirror from the flat snapshots and
    pins the violation counters at literal zero — a greedy-kernel
    regression flips a counter and fails the driver hash."""
    g = cluster.greedy_proximity_groups(
        _g2_features(spark, sf_dir), dist_m=150.0)
    return cluster.invariant_report(g, dist_m=150.0)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "j4_match_cascade": j4_match_cascade,
    "j5_pick_merges": j5_pick_merges,
    "m6_close_report": m6_close_report,
    "g2_proximity_groups": g2_proximity_groups,
}


def _cascade_sql(c: str, a: str) -> str:
    """match_type CASE mirroring operators.place_merge.match_type_col."""
    c_name, a_name = f"{c}.name", f"{a}.name"
    c_empty = f"({c_name} IS NULL OR trim({c_name}) = '')"
    a_empty = f"({a_name} IS NULL OR trim({a_name}) = '')"
    tier1 = (f"(NOT {c_empty} AND NOT {a_empty} AND "
             f"{TX.check_names_sql(c_name, a_name)})")
    tier2 = (f"({TX.tag_equal_non_empty_sql(f'{c}.wikidata', f'{a}.wikidata')}"
             f" OR {TX.tag_equal_non_empty_sql(f'{c}.website', f'{a}.website')})")
    tier3 = (f"(len(list_filter({c}.alt_names, cn -> len(list_filter("
             f"{a}.alt_names, an -> {TX.check_names_sql('cn', 'an')})) > 0)) > 0)")
    # EMPTY_NAME_MATCH: both nameless OR only the closed side nameless
    # (MergeUtil.java:69-77)
    tier4 = f"{c_empty}"
    return (f"(CASE WHEN {tier1} THEN 1 WHEN {tier2} THEN 2 "
            f"WHEN {tier3} THEN 3 WHEN {tier4} THEN 4 END)")


_DIST = haversine_m_sql("c.lat", "c.lon", "a.lat", "a.lon")

_CANDS_SQL = f"""
    cands AS (
        SELECT c.id AS c_id, a.id AS a_id,
               {_cascade_sql('c', 'a')} AS match_type,
               {_DIST} AS dist_m
        FROM closed c JOIN active a
          ON substr(c.tile_id, 1, 4) = substr(a.tile_id, 1, 4)
         AND c.id != a.id
        WHERE {_DIST} <= 100.0
          AND {_cascade_sql('c', 'a')} IS NOT NULL
    )"""

ORACLES: dict[str, str] = {
    "j4_match_cascade": f"""
        WITH {P.flat_snapshots_sql_ctes()},
        {_CANDS_SQL}
        SELECT c_id, a_id, match_type, round(dist_m, 2) AS dist_m
        FROM cands
    """,
    "j5_pick_merges": f"""
        WITH {P.flat_snapshots_sql_ctes()},
        {_CANDS_SQL},
        best AS (
            SELECT *, MIN(match_type) OVER (PARTITION BY c_id) AS best_type
            FROM cands
        ),
        at_best AS (
            SELECT *, COUNT(*) OVER (PARTITION BY c_id) AS n_at_best
            FROM best WHERE match_type = best_type
        )
        SELECT c_id, a_id, match_type, round(dist_m, 2) AS dist_m
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_id ORDER BY dist_m, a_id) AS rk
            FROM at_best
            WHERE NOT (best_type = 4 AND n_at_best > 1)
        ) WHERE rk = 1
    """,
    "m6_close_report": f"""
        WITH {P.flat_snapshots_sql_ctes()},
        {_CANDS_SQL}
        SELECT c.id AS obj_id, 'edit' AS action,
               '{{"deleted":{{"set":"{CLOSE_NOW_ISO}"}}}}' AS change
        FROM closed c
        WHERE date_diff('day', CAST(replace(c.deleted_ts, 'T', ' ') AS TIMESTAMP),
                        CAST('{CLOSE_NOW_ISO.replace("T", " ")}' AS TIMESTAMP)) >= 10
          AND NOT EXISTS (SELECT 1 FROM cands WHERE cands.c_id = c.id)
    """,
    # invariant oracle: the input partition mirror recomputed from the
    # flat snapshots; every violation counter pinned at literal zero
    "g2_proximity_groups": f"""
        WITH {P.flat_snapshots_sql_ctes()},
        del_t AS (SELECT substr(tile_id, 1, 4) AS tile,
                         COUNT(*) AS n_deleted FROM closed GROUP BY 1),
        new_t AS (SELECT substr(tile_id, 1, 4) AS tile,
                         COUNT(*) AS n_created FROM active GROUP BY 1)
        SELECT COALESCE(del_t.tile, new_t.tile) AS tile,
               COALESCE(n_deleted, 0) AS n_deleted,
               COALESCE(n_created, 0) AS n_created,
               COALESCE(n_deleted, 0) + COALESCE(n_created, 0) AS n_rows,
               CAST(0 AS BIGINT) AS n_dup_ids,
               CAST(0 AS BIGINT) AS n_ungrouped_deleted,
               CAST(0 AS BIGINT) AS n_seed_violations,
               CAST(0 AS BIGINT) AS n_order_violations,
               CAST(0 AS BIGINT) AS n_seq_violations,
               CAST(0 AS BIGINT) AS n_dist_violations
        FROM del_t FULL OUTER JOIN new_t ON del_t.tile = new_t.tile
    """,
}


def j3_border_correct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrected-mode candidate join (SURVEY §4 custom item 1): the
    closed side explodes its 3×3 cell neighborhood, so pairs straddling
    a cell boundary are found.  The ORACLE is the brute-force
    (unblocked) distance join — equality proves the blocking loses
    nothing."""
    closed = P.synthetic_closed_flat(spark, sf_dir)
    active = P.synthetic_active_flat(spark, sf_dir)
    cands = place_merge.merge_candidates(closed, active,
                                         neighbor_blocking=True)
    return cands.select("c_id", "a_id", "match_type",
                        F.round("dist_m", 2).alias("dist_m"))


QUERIES["j3_border_correct"] = j3_border_correct

ORACLES["j3_border_correct"] = f"""
    WITH {P.flat_snapshots_sql_ctes()}
    SELECT c.id AS c_id, a.id AS a_id,
           {_cascade_sql('c', 'a')} AS match_type,
           round({_DIST}, 2) AS dist_m
    FROM closed c JOIN active a ON c.id != a.id
    WHERE {_DIST} <= 100.0
      AND {_cascade_sql('c', 'a')} IS NOT NULL
"""


def a5_merge_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 run counters (MergePlaceBot.java:89-98): candidate pairs,
    picked merges, and permanent closes of one bot run, as one row."""
    closed = P.synthetic_closed_flat(spark, sf_dir)
    active = P.synthetic_active_flat(spark, sf_dir)
    # The three counters all derive from the cascade join; left lazy it
    # executes 3x (count / picks window / closes anti-join).  One eager
    # checkpoint of the projected pairs runs it once (the g2 pattern;
    # whitelisted in the plan audit's EAGER_BUILD_OK with the r14
    # measurement).
    cands = (place_merge.merge_candidates(closed, active)
             .select("c_id", "a_id", "match_type", "dist_m")
             .localCheckpoint(eager=True))
    picks = place_merge.pick_merges(cands)
    closes = place_merge.close_ops(closed, cands, CLOSE_NOW_ISO)
    return (
        cands.agg(F.count(F.lit(1)).alias("similar_places_cnt"))
        .crossJoin(picks.agg(F.count(F.lit(1)).alias("merged_places_cnt")))
        .crossJoin(closes.agg(F.count(F.lit(1)).alias("closed_places_cnt")))
    )


QUERIES["a5_merge_counters"] = a5_merge_counters

ORACLES["a5_merge_counters"] = f"""
    WITH {P.flat_snapshots_sql_ctes()},
    {_CANDS_SQL},
    best AS (
        SELECT *, MIN(match_type) OVER (PARTITION BY c_id) AS best_type
        FROM cands
    ),
    at_best AS (
        SELECT *, COUNT(*) OVER (PARTITION BY c_id) AS n_at_best
        FROM best WHERE match_type = best_type
    ),
    picks AS (
        SELECT c_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_id ORDER BY dist_m, a_id) AS rk
            FROM at_best WHERE NOT (best_type = 4 AND n_at_best > 1)
        ) WHERE rk = 1
    ),
    closes AS (
        SELECT c.id FROM closed c
        WHERE date_diff('day',
                        CAST(replace(c.deleted_ts, 'T', ' ') AS TIMESTAMP),
                        CAST('{CLOSE_NOW_ISO.replace("T", " ")}' AS TIMESTAMP)) >= 10
          AND NOT EXISTS (SELECT 1 FROM cands WHERE cands.c_id = c.id)
    )
    SELECT (SELECT COUNT(*) FROM cands)  AS similar_places_cnt,
           (SELECT COUNT(*) FROM picks)  AS merged_places_cnt,
           (SELECT COUNT(*) FROM closes) AS closed_places_cnt
"""


# ---------------------------------------------------------------------------
# Op-generator queries (M5 / M7 / S14) — deterministic JSON/count shapes,
# each with a value-exact DuckDB oracle over the same string building.
# ---------------------------------------------------------------------------

_PICKS_SQL = """
    best AS (
        SELECT *, MIN(match_type) OVER (PARTITION BY c_id) AS best_type
        FROM cands
    ),
    at_best AS (
        SELECT *, COUNT(*) OVER (PARTITION BY c_id) AS n_at_best
        FROM best WHERE match_type = best_type
    ),
    picks AS (
        SELECT c_id, a_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY c_id ORDER BY dist_m, a_id) AS rk
            FROM at_best WHERE NOT (best_type = 4 AND n_at_best > 1)
        ) WHERE rk = 1
    )"""


def m5_merge_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 merge-op generation (MergePlaceBot.java:420-482,
    mergeFields): per picked merge, the survivor gets a
    ``source.osm appendmany`` of the closed place's osm refs and the
    closed place gets a delete row.  The closed docs here carry one
    osm ref (id=key, name) so the emitted change JSON is exactly
    reproducible as SQL string concatenation."""
    closed = P.synthetic_closed_flat(spark, sf_dir)
    active = P.synthetic_active_flat(spark, sf_dir)
    picks = place_merge.pick_merges(
        place_merge.merge_candidates(closed, active))
    closed_docs = closed.select(
        F.col("id"),
        F.to_json(F.struct(F.struct(F.array(F.struct(
            F.col("key").cast("long").alias("id"),
            F.col("name").alias("name"),
        )).alias("osm")).alias("source"))).alias("doc"))
    ops = place_merge.merge_ops(picks, closed_docs)
    return ops.select("obj_id", "op_seq", "action", "change")


QUERIES["m5_merge_ops"] = m5_merge_ops

ORACLES["m5_merge_ops"] = (
    "WITH " + P.flat_snapshots_sql_ctes() + ", " + _CANDS_SQL + ", "
    + _PICKS_SQL + """
    SELECT p.a_id AS obj_id, CAST(0 AS BIGINT) AS op_seq,
           'edit' AS action,
           '{"source.osm": {"appendmany": [{"id": ' ||
               CAST(c.key AS VARCHAR) || ', "name": "' || c.name ||
               '"}]}}' AS change
    FROM picks p JOIN closed c ON c.id = p.c_id
    UNION ALL
    SELECT p.c_id AS obj_id, CAST(1 AS BIGINT) AS op_seq,
           'delete' AS action, CAST(NULL AS VARCHAR) AS change
    FROM picks p
""")


def m7_migrate_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 id migration (MigrateOldOsmPlaceIdsBot.java:40-70): every
    ``source.old-osm-ids`` ref moves into ``source.osm`` with a
    tombstone, and the legacy field is deleted via the ``{}``-quoted
    path ``source.{old-osm-ids}``.  Docs synthesized per customer
    k % 9 == 0 with one legacy ref (id = k + 9000000)."""
    from ..operators import osm_sync
    from ..sources.testdata import load_table

    c = load_table(spark, "customer", sf_dir)
    k = F.col("c_custkey")
    docs = c.where(k % 9 == 0).select(
        F.concat(F.lit("c"), k.cast("string")).alias("obj_id"),
        F.to_json(F.struct(F.struct(F.array(F.struct(
            (k + 9000000).cast("long").alias("id"),
        )).alias("old-osm-ids")).alias("source"))).alias("doc"))
    ops = osm_sync.migrate_old_ids_ops(docs, CLOSE_NOW_ISO)
    return ops.select("obj_id", "action", "change")


QUERIES["m7_migrate_ids"] = m7_migrate_ids

ORACLES["m7_migrate_ids"] = """
    SELECT 'c' || CAST(c_custkey AS VARCHAR) AS obj_id,
           'edit' AS action,
           '{"source.osm": {"appendmany": [{"id": ' ||
               CAST(c_custkey + 9000000 AS VARCHAR) ||
               ', "deleted": "__NOW__"}]}, ' ||
               '"source.{old-osm-ids}": "delete"}' AS change
    FROM customer WHERE c_custkey % 9 = 0
""".replace("__NOW__", CLOSE_NOW_ISO)


def s14_pack_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 op/block packing (OsmSyncBot.java:644-687): changelog rows
    packed 250-per-operation, 16-operations-per-block in (obj_id,
    op_seq) order — pure window arithmetic over a deterministic log
    derived from the events table."""
    from ..operators import osm_sync
    from ..sources.testdata import load_table

    ev = load_table(spark, "events", sf_dir)
    ops = ev.select(
        F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("obj_id"),
        F.lit(0).cast("long").alias("op_seq"))
    packed = osm_sync.pack_operations(ops)
    return packed.select("obj_id", "op_no", "block_no")


QUERIES["s14_pack_ops"] = s14_pack_ops

ORACLES["s14_pack_ops"] = """
    SELECT obj_id,
           CAST((rn - 1) // 250 AS BIGINT) AS op_no,
           CAST(((rn - 1) // 250) // 16 AS BIGINT) AS block_no
    FROM (
        SELECT 'e' || CAST(event_id AS VARCHAR) AS obj_id,
               ROW_NUMBER() OVER (
                   ORDER BY 'e' || CAST(event_id AS VARCHAR)) AS rn
        FROM events
    )
"""


# ---------------------------------------------------------------------------
# M12: the reference's OWN merge corpora through the cascade
# ---------------------------------------------------------------------------

def _cascade_cols_sql(c_name: str, a_name: str, c_wd: str, a_wd: str,
                      c_web: str, a_web: str, c_alt: str,
                      a_alt: str) -> str:
    """:func:`_cascade_sql` over explicit column names (no table
    aliases), for corpora that arrive as flat pair rows."""
    c_empty = f"({c_name} IS NULL OR trim({c_name}) = '')"
    a_empty = f"({a_name} IS NULL OR trim({a_name}) = '')"
    tier1 = (f"(NOT {c_empty} AND NOT {a_empty} AND "
             f"{TX.check_names_sql(c_name, a_name)})")
    tier2 = (f"({TX.tag_equal_non_empty_sql(c_wd, a_wd)}"
             f" OR {TX.tag_equal_non_empty_sql(c_web, a_web)})")
    tier3 = (f"(len(list_filter({c_alt}, cn -> len(list_filter("
             f"{a_alt}, an -> {TX.check_names_sql('cn', 'an')})) > 0))"
             f" > 0)")
    return (f"(CASE WHEN {tier1} THEN 1 WHEN {tier2} THEN 2 "
            f"WHEN {tier3} THEN 3 WHEN {c_empty} THEN 4 END)")


def m12_fixture_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12: the reference's executable merge ground truth
    (``merge/places.json`` MUST-merge pairs and
    ``merge/places_not_merge.json`` negatives,
    ``MergePlaceBotTest.java:39-72``) replayed through the real cascade
    (``operators/place_merge.py:match_type_col``), per pair:

    - ``match_type`` — the cascade verdict on the full alt-name lists
      (``getOtherPlaceName`` includes ``old_name``,
      MergeUtil.java:127-135);
    - ``match_type_core`` — the verdict with ``old_name`` excluded from
      tier 3, isolating the negatives' deliberate old_name collision
      (both negative pairs share old_name 'La Gauchita': tier 3 with it,
      NO_MATCH without — the executable behavior
      ``testNotMergeByName`` pins);
    - ``false_merge`` / ``missed_merge`` — violation counters the
      ORACLE pins at literal zero: a negative pair must never
      NAME_MATCH (tier 1), a positive pair must never fall through the
      whole cascade.

    The corpus is 12 rows of driver-side data (reference test
    resources), so the plan is a pure local projection; the oracle
    recomputes every verdict through the independent SQL mirror of the
    cascade over the identical VALUES rows — Levenshtein tiers, token
    normalization and all.
    """
    from ..sources import ref_fixtures as RF

    df = spark.createDataFrame(RF.merge_pair_rows(), RF.PAIR_SCHEMA)
    mt = F.expr(place_merge.match_type_expr(
        "c_name", "a_name", "c_wikidata", "a_wikidata",
        "c_website", "a_website", "c_alt", "a_alt"))
    mt_core = F.expr(place_merge.match_type_expr(
        "c_name", "a_name", "c_wikidata", "a_wikidata",
        "c_website", "a_website", "c_alt_core", "a_alt_core"))
    out = df.select("fixture", "idx", "c_name", "a_name",
                    mt.alias("match_type"), mt_core.alias("match_type_core"))
    return out.select(
        "*",
        F.when((F.col("fixture") == "not_merge")
               & (F.col("match_type") == place_merge.MATCH_NAME),
               F.lit(1)).otherwise(F.lit(0)).alias("false_merge"),
        F.when((F.col("fixture") == "merge")
               & F.col("match_type").isNull(),
               F.lit(1)).otherwise(F.lit(0)).alias("missed_merge"))


def _m12_oracle() -> str:
    from ..sources import ref_fixtures as RF

    full = _cascade_cols_sql(
        "c_name", "a_name", "c_wikidata", "a_wikidata",
        "c_website", "a_website", "c_alt", "a_alt")
    core = _cascade_cols_sql(
        "c_name", "a_name", "c_wikidata", "a_wikidata",
        "c_website", "a_website", "c_alt_core", "a_alt_core")
    # false_merge / missed_merge are LITERAL zero on the oracle side:
    # the reference's ground truth, not a recomputation — a cascade
    # regression that merges a negative or misses a positive
    # hash-fails even if both engines regress identically.
    return f"""
        WITH {RF.pairs_values_cte()}
        SELECT fixture, idx, c_name, a_name,
               {full} AS match_type,
               {core} AS match_type_core,
               0 AS false_merge, 0 AS missed_merge
        FROM pairs
    """


try:  # reference checkout optional: the engine stays self-contained
    from ..sources import ref_fixtures as _RF

    if _RF.fixtures_available():
        QUERIES["m12_fixture_verdicts"] = m12_fixture_verdicts
        ORACLES["m12_fixture_verdicts"] = _m12_oracle()
except Exception:  # pragma: no cover - missing/corrupt fixture files
    pass
