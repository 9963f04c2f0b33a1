"""Temporal join operators Spark has no native form of: as-of join and
range (interval) join, both expressed as shuffle-bounded compositions of
built-in DataFrame ops (SURVEY.md §2.4 scale-path extensions).

The reference's sync bots repeatedly need "state as of T" lookups
(OsmSyncBot.java aligns sync timestamps; the history bot replays the
changelog up to a block date) — the as-of join is that access pattern as
a relational operator.  The range join is the windowed variant ("all
events within the last N minutes of X"), the shape behind its
proximity/recency checks.

Scale notes (100 TB):

- ``j11_asof_join`` is the union-and-window form: tag both streams,
  union, ONE shuffle on the join key, and a running ``last(...,
  ignorenulls)`` carries the most recent right-side row forward.  This
  beats the naive range-join form (which explodes candidates) and the
  per-key ``applyInPandas`` form (Python in the hot path); state per
  task is O(1) per key, no row amplification at all.
- ``j12_range_join`` buckets time into interval-width bins so the
  inequality join becomes an equi-join on (key, bin) with a constant
  2x probe-side amplification, then filters the exact range.  Catalyst
  alone would pick a broadcast-nested-loop or a cartesian for the raw
  inequality predicate — the bin key makes it a plain hash shuffle that
  AQE can skew-split.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.testdata import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir)


def _clicks_dedup(ev: DataFrame) -> DataFrame:
    """One click row per (user_id, ts): ASOF picks *a* row at the
    greatest ts <= t, which is ambiguous when two clicks share that ts —
    both engines must pre-pick the same survivor (max event_id) or the
    tie is a nondeterminism bug (CLAUDE.md rule)."""
    return (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"),
             F.max_by("value", "event_id").alias("click_value"))
    )


def j11_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each ``error`` event, the same user's latest ``click`` at or
    before it (as-of join, ``<=`` semantics), with the gap in
    microseconds; errors with no prior click keep NULL columns.

    Plan: union the tagged streams, window per user ordered by
    (ts, src) — clicks sort before errors at equal ts, so a same-instant
    click matches — and carry the click columns forward with
    ``last(..., ignorenulls=True)``.  Single shuffle on user_id; the
    window frame is rows-unbounded-preceding, which Spark evaluates in
    one streaming pass per partition.  Timestamps are emitted as BIGINT
    epoch micros (the repo window-oracle convention — naive vs TZ
    timestamp classes hash-differently at the driver).
    """
    ev = _events(spark, sf_dir)
    clicks = _clicks_dedup(ev).select(
        "user_id", "ts", F.lit(0).alias("src"),
        F.lit(None).cast("long").alias("event_id"),
        "click_id", "click_value",
        F.unix_micros("ts").alias("click_us"),
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.lit(1).alias("src"), "event_id",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(None).cast("long").alias("click_us"),
    )
    u = clicks.unionByName(errors)
    w = (Window.partitionBy("user_id").orderBy("ts", "src")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "src", "event_id", "user_id",
        F.unix_micros("ts").alias("err_us"),
        F.last("click_id", ignorenulls=True).over(w).alias("m_click_id"),
        F.last("click_value", ignorenulls=True).over(w).alias("m_click_value"),
        F.last("click_us", ignorenulls=True).over(w).alias("m_click_us"),
    )
    return (
        carried.where(F.col("src") == 1)
        .select(
            "event_id", "user_id", "err_us",
            F.col("m_click_id").alias("click_id"),
            F.col("m_click_value").alias("click_value"),
            (F.col("err_us") - F.col("m_click_us")).alias("gap_us"),
        )
    )


#: Interval width of the range join, in whole seconds / microseconds.
_RANGE_S = 600
_RANGE_US = _RANGE_S * 1_000_000


def j12_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ``error`` event: how many of the same user's ``click`` events
    fall in the preceding 10 minutes ``[ts - 600s, ts)``, and their
    value sum (a range/interval join aggregated per probe row).

    Plan: both sides get a 600-second time bin from integer epoch-micros
    arithmetic; an interval of width W can only overlap bins b-1 and b,
    so the probe side explodes exactly 2 bin keys and the join is a pure
    equi-join on (user_id, bin) — a hash shuffle, never the
    BroadcastNestedLoop Catalyst picks for a raw inequality.  The exact
    range filter then prunes the candidates, and a final aggregation
    restores one row per error (left semantics via join-back, so
    zero-click errors keep n=0).
    """
    ev = _events(spark, sf_dir)
    # `div` is 64-bit integer division — floor(x / W) would round-trip
    # through a double and can misplace values at bin boundaries
    bin_of = lambda c: F.expr(f"{c} div {_RANGE_US}")  # noqa: E731
    clicks = (ev.where(F.col("event_type") == "click")
              .select("user_id", F.unix_micros("ts").alias("c_us"), "value")
              .withColumn("bin", bin_of("c_us")))
    errors = (ev.where(F.col("event_type") == "error")
              .select("event_id", "user_id",
                      F.unix_micros("ts").alias("err_us")))
    probes = errors.select(
        "event_id", "user_id", "err_us",
        F.explode(F.array(bin_of("err_us") - 1,
                          bin_of("err_us"))).alias("bin"),
    )
    hits = (
        probes.join(clicks, on=["user_id", "bin"])
        .where((F.col("c_us") >= F.col("err_us") - _RANGE_US)
               & (F.col("c_us") < F.col("err_us")))
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"),
             F.round(F.sum("value"), 2).alias("sum_click"))
    )
    return (
        errors.join(hits, on="event_id", how="left")
        .select(
            "event_id", "user_id", "err_us",
            F.coalesce("n_clicks", F.lit(0).cast("long")).alias("n_clicks"),
            F.coalesce("sum_click", F.lit(0.0)).alias("sum_click"),
        )
    )


#: interval width AND bin width for the interval-overlap join (30 min)
_IV_US = 1_800_000_000


def j13_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X55 interval-OVERLAP join (interval × interval — distinct from
    j12's point-in-interval): each error and each click of a user opens
    a 30-minute window; emit every overlapping (error, click) window
    pair with the exact overlap in microseconds.

    Plan: a width-W interval starting in width-W bin b covers only bins
    {b, b+1}, and two overlapping intervals share at least one covered
    bin (any instant of the intersection lies in a bin covered by
    both) — so each side explodes its ≤2 covered bins and the join is a
    pure equi-join on (user_id, bin) with a pair-level dedup, never the
    BroadcastNestedLoop Catalyst picks for the raw inequality.  The
    ORACLE is the brute-force inequality join, so hash equality proves
    the bin blocking loses no pair (the j3_border_correct pattern).
    Bins come from `div` (64-bit integer division; floor(x/W) would
    round-trip through a double and can misplace boundary values).
    """
    ev = _events(spark, sf_dir)
    bin_of = lambda c: F.expr(f"{c} div {_IV_US}")  # noqa: E731

    def side(event_type: str, tag: str) -> DataFrame:
        s = (ev.where(F.col("event_type") == event_type)
             .select(F.col("event_id").alias(f"{tag}_id"), "user_id",
                     F.unix_micros("ts").alias(f"{tag}_start"))
             .withColumn(f"{tag}_end", F.col(f"{tag}_start") + _IV_US))
        return s.withColumn("bin", F.explode(F.array_distinct(F.array(
            bin_of(f"{tag}_start"), bin_of(f"{tag}_start") + 1))))

    pairs = (side("error", "a").join(side("click", "b"),
                                     on=["user_id", "bin"])
             .where((F.col("a_start") < F.col("b_end"))
                    & (F.col("b_start") < F.col("a_end"))))
    return (pairs.select(
        "a_id", "b_id", "user_id",
        (F.least("a_end", "b_end")
         - F.greatest("a_start", "b_start")).alias("overlap_us"))
        .dropDuplicates(["a_id", "b_id"]))


def d5_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly AND daily rollups of
    the event stream in ONE pass via GROUPING SETS — the multi-resolution
    materialization a time-series store maintains per hypertable,
    computed without scanning the fact table once per grain.

    Partial aggregation covers every grouping set map-side (same
    property as rollup/cube in a8/a9), so the shuffle carries one
    partial row per (set, bucket) per task.  Buckets are BIGINT epoch
    seconds by the repo window-oracle convention; ``grouping()``
    disambiguates the grain, never NULL-sentinel guessing.
    """
    ev = _events(spark, sf_dir)
    base = ev.select(
        (F.expr("unix_timestamp(ts) div 3600") * 3600).alias("hour_b"),
        (F.expr("unix_timestamp(ts) div 86400") * 86400).alias("day_b"),
        "value",
    )
    return (
        base.groupingSets([["day_b"], ["hour_b"]], "day_b", "hour_b")
        .agg(F.grouping("hour_b").alias("_g_hour"),
             F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.when(F.col("_g_hour") == 1, F.lit("day"))
            .otherwise(F.lit("hour")).alias("grain"),
            F.coalesce("hour_b", "day_b").alias("bucket"),
            "n", "sum_value",
        )
    )


def x71_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X71: slowly-changing-dimension type-2 build — turn each user's
    event-type stream into versioned validity ranges ``(user_id,
    version, event_type, eff_from_us, eff_to_us, n_events,
    is_current)``: consecutive equal values collapse into one version,
    ``eff_to_us`` is the next version's start (NULL while current).

    This is the warehouse-side complement of ``m11_asof_snapshot``
    (which *reads* state as of T; SCD2 *materializes* every T at once)
    and the dimension shape the reference's history tables imply
    (``PlaceOpObjectHistory``: each op supersedes the previous state of
    its place — see ``HistoryManager.java`` saveObjects).

    Plan: one shuffle on user_id serves the change-flag lag window, the
    running-sum version stamp, and (after a same-key partial agg) the
    lead window for range ends — Spark keeps the exchange because all
    three stages share the partition key.  State per task is O(1) rows
    (streaming window frames, no buffering beyond the frame row).
    Ordering is total — (ts_us, event_id) — so version stamps can never
    depend on shuffle order (CLAUDE.md tiebreak rule); timestamps are
    BIGINT epoch micros per the repo window-oracle convention.
    """
    ev = _events(spark, sf_dir)
    rows = ev.select("user_id", "event_id", "event_type",
                     F.unix_micros("ts").alias("ts_us"))
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("event_type").over(w_ord)
    flagged = rows.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("event_type")),
                      F.lit(1)).otherwise(F.lit(0)))
    versioned = flagged.withColumn(
        "version", F.sum("chg").over(
            w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)))
    grouped = (versioned.groupBy("user_id", "version", "event_type")
               .agg(F.min("ts_us").alias("eff_from_us"),
                    F.count(F.lit(1)).alias("n_events")))
    w_v = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("eff_from_us").over(w_v)
    return grouped.select(
        "user_id", "version", "event_type", "eff_from_us",
        nxt.alias("eff_to_us"), "n_events",
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0))
        .alias("is_current"),
    )


def x81_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X81: the SCD2 dimension USED — every event looks up the version
    active at its timestamp (the classic fact × type-2-dimension as-of
    join) and the active version's value must equal the event's own
    value, because x71's versions derive from these very events:
    ``n_mismatch`` is pinned 0 by the oracle, which makes the driver
    hash a boundary-semantics proof (an event AT ``eff_from`` belongs
    to the NEW version — one off-by-one in the frame and thousands of
    rows flip).

    Plan: the j11 union-and-window as-of form, not a range join —
    version starts (the lag-change rows) union with the fact rows, ONE
    user_id shuffle, and ``last(..., ignorenulls)`` carries the active
    value forward; at equal (ts, event_id) the start sorts before its
    own event's lookup (src tiebreak), which IS the eff_from-inclusive
    boundary rule.
    """
    ev = _events(spark, sf_dir)
    rows = ev.select("user_id", "event_id", "event_type",
                     F.unix_micros("ts").alias("ts_us"))
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("event_type").over(w_ord)
    starts = (rows.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("event_type")),
                      F.lit(1)).otherwise(F.lit(0)))
        .where(F.col("chg") == 1)
        .select("user_id", "ts_us", "event_id", F.lit(0).alias("src"),
                F.col("event_type").alias("ver_value"),
                F.lit(None).cast("string").alias("event_type")))
    facts = rows.select("user_id", "ts_us", "event_id",
                        F.lit(1).alias("src"),
                        F.lit(None).cast("string").alias("ver_value"),
                        "event_type")
    u = starts.unionByName(facts)
    w = (Window.partitionBy("user_id").orderBy("ts_us", "event_id", "src")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = u.select(
        "user_id", "src", "event_type",
        F.last("ver_value", ignorenulls=True).over(w).alias("active"))
    looked = carried.where(F.col("src") == 1)
    return (looked.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count_if(F.col("active") == F.col("event_type"))
                 .alias("n_match"),
                 F.count_if((F.col("active") != F.col("event_type"))
                            | F.col("active").isNull())
                 .alias("n_mismatch"))
            .join(starts.groupBy("user_id")
                  .agg(F.count(F.lit(1)).alias("n_versions")),
                  on="user_id"))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "j11_asof_join": j11_asof_join,
    "j12_range_join": j12_range_join,
    "j13_interval_join": j13_interval_join,
    "d5_multires_rollup": d5_multires_rollup,
    "x71_scd2_build": x71_scd2_build,
    "x81_scd2_asof": x81_scd2_asof,
}

# DuckDB has a native ASOF JOIN — the oracle uses it directly, so the
# union-and-window plan is checked against an independent implementation
# of the operator, not a SQL transliteration of itself.
ORACLES: dict[str, str] = {
    "j11_asof_join": """
        WITH clicks AS (
            SELECT user_id, ts, MAX(event_id) AS click_id,
                   arg_max(value, event_id) AS click_value
            FROM events WHERE event_type = 'click'
            GROUP BY user_id, ts
        ), errors AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'error'
        )
        SELECT e.event_id, e.user_id,
               epoch_us(e.ts) AS err_us,
               c.click_id, c.click_value,
               epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
        FROM errors e ASOF LEFT JOIN clicks c
          ON e.user_id = c.user_id AND c.ts <= e.ts
    """,
    "d5_multires_rollup": """
        WITH base AS (
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600
                       AS hour_b,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                       AS day_b,
                   value
            FROM events
        )
        SELECT CASE WHEN GROUPING(hour_b) = 1 THEN 'day'
                    ELSE 'hour' END AS grain,
               COALESCE(hour_b, day_b) AS bucket,
               COUNT(*) AS n,
               round(SUM(value), 2) AS sum_value
        FROM base
        GROUP BY GROUPING SETS ((day_b), (hour_b))
    """,
    # brute-force inequality join — hash equality proves the 2-bin
    # blocking loses no overlapping pair
    "j13_interval_join": """
        SELECT e.event_id AS a_id, c.event_id AS b_id, e.user_id,
               LEAST(epoch_us(e.ts) + 1800000000,
                     epoch_us(c.ts) + 1800000000)
               - GREATEST(epoch_us(e.ts), epoch_us(c.ts)) AS overlap_us
        FROM events e JOIN events c
          ON c.user_id = e.user_id
         AND c.event_type = 'click'
         AND epoch_us(e.ts) < epoch_us(c.ts) + 1800000000
         AND epoch_us(c.ts) < epoch_us(e.ts) + 1800000000
        WHERE e.event_type = 'error'
    """,
    "j12_range_join": """
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS err_us,
               COUNT(c.user_id) AS n_clicks,
               round(COALESCE(SUM(c.value), 0), 2) AS sum_click
        FROM events e
        LEFT JOIN events c
          ON c.event_type = 'click'
         AND c.user_id = e.user_id
         AND epoch_us(c.ts) >= epoch_us(e.ts) - 600000000
         AND epoch_us(c.ts) < epoch_us(e.ts)
        WHERE e.event_type = 'error'
        GROUP BY e.event_id, e.user_id, epoch_us(e.ts)
    """,
    # DuckDB window-SUM over INTEGER yields HUGEINT — cast the version
    # stamp back to BIGINT (CLAUDE.md Arrow-type rule).
    "x71_scd2_build": """
        WITH ordered AS (
            SELECT user_id, event_id, event_type,
                   epoch_us(ts) AS ts_us,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS prev_type
            FROM events
        ), flagged AS (
            SELECT user_id, event_id, event_type, ts_us,
                   CASE WHEN prev_type IS NULL
                             OR prev_type <> event_type
                        THEN 1 ELSE 0 END AS chg
            FROM ordered
        ), versioned AS (
            SELECT user_id, event_type, ts_us,
                   CAST(SUM(chg) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS version
            FROM flagged
        ), grouped AS (
            SELECT user_id, version, event_type,
                   MIN(ts_us) AS eff_from_us, COUNT(*) AS n_events
            FROM versioned GROUP BY user_id, version, event_type
        )
        SELECT user_id, version, event_type, eff_from_us,
               lead(eff_from_us) OVER (
                   PARTITION BY user_id ORDER BY version) AS eff_to_us,
               n_events,
               CASE WHEN lead(eff_from_us) OVER (
                        PARTITION BY user_id ORDER BY version) IS NULL
                    THEN 1 ELSE 0 END AS is_current
        FROM grouped
    """,

    # the invariant IS the oracle: versions derive from the events, so
    # every event must match its active version; n_versions recomputed
    # independently from the lag change-flags
    "x81_scd2_asof": """
        WITH ordered AS (
            SELECT user_id, event_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS prev
            FROM events
        )
        SELECT user_id, COUNT(*) AS n_events,
               COUNT(*) AS n_match,
               CAST(0 AS BIGINT) AS n_mismatch,
               CAST(SUM(CASE WHEN prev IS NULL OR prev <> event_type
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_versions
        FROM ordered GROUP BY user_id
    """,
}
