"""Event-funnel and retention-cohort analytics over the events stream
(SURVEY.md §2.13 X44/X45) — the product-analytics queries an events
store serves next to its sync/report workload.

Timestamps never cross the driver boundary as timestamps: every time
value is projected to BIGINT epoch microseconds / integer week indexes
on BOTH engines (the r4 d3_aligned_windows lesson — DuckDB
TIMESTAMPTZ vs Spark naive is a driver schema FAIL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table

#: ordered funnel stages
_FUNNEL = ("view", "click", "purchase")
#: seconds per retention week
_WEEK = 604800


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (X44): per user, the first ``view``,
    the first ``click`` strictly after it, and the first ``purchase``
    strictly after that — the classic sessionless funnel, plus the
    reached-stage count.

    Scale shape: each stage is a (user)-keyed partial aggregate joined
    to the previous stage's per-user row — three bounded shuffles on
    user_id, no collect_list of a hot user's whole history (a per-user
    array fold would OOM on power users at 100 TB), no window over raw
    events.
    """
    ev = (load_table(spark, "events", sf_dir)
          .where(F.col("event_type").isin(*_FUNNEL))
          .select("user_id", "event_type",
                  F.unix_micros("ts").alias("tus")))
    t1 = (ev.where(F.col("event_type") == _FUNNEL[0])
          .groupBy("user_id").agg(F.min("tus").alias("t1")))
    t2 = (ev.where(F.col("event_type") == _FUNNEL[1])
          .join(t1, "user_id").where(F.col("tus") > F.col("t1"))
          .groupBy("user_id", "t1").agg(F.min("tus").alias("t2")))
    t3 = (ev.where(F.col("event_type") == _FUNNEL[2])
          .join(t2.select("user_id", "t2"), "user_id")
          .where(F.col("tus") > F.col("t2"))
          .groupBy("user_id", "t2").agg(F.min("tus").alias("t3")))
    return (t1.join(t2, ["user_id", "t1"], "left")
            .join(t3, ["user_id", "t2"], "left")
            .select("user_id", "t1", "t2", "t3",
                    (F.lit(1)
                     + F.col("t2").isNotNull().cast("int")
                     + F.col("t3").isNotNull().cast("int"))
                    .alias("reached")))


def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts (X45): users grouped by their signup
    week; for each (cohort week, week offset ≥ 0), the count of
    cohort members active that week.  Week indexes are pure integer
    arithmetic on epoch seconds — no calendar/timezone functions, so
    both engines bucket identically.

    Scale shape: one distinct on (user, week) — the activity matrix is
    users×weeks, far smaller than events — joined to the per-user
    cohort aggregate, then one rollup shuffle."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type",
        F.expr(f"(unix_micros(ts) div 1000000) div {_WEEK}").alias("wk"))
    cohort = (ev.where(F.col("event_type") == "signup")
              .groupBy("user_id").agg(F.min("wk").alias("cw")))
    active = ev.select("user_id", "wk").distinct()
    return (active.join(cohort, "user_id")
            .where(F.col("wk") >= F.col("cw"))
            .groupBy(F.col("cw").alias("cohort_week"),
                     (F.col("wk") - F.col("cw")).alias("offset"))
            .agg(F.countDistinct("user_id").alias("n_users")))


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ev_funnel": ev_funnel,
    "ev_retention": ev_retention,
}

ORACLES: dict[str, str] = {}

ORACLES["ev_funnel"] = f"""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
                FROM events
                WHERE event_type IN ('{_FUNNEL[0]}', '{_FUNNEL[1]}',
                                     '{_FUNNEL[2]}')),
    t1 AS (SELECT user_id, MIN(tus) AS t1 FROM ev
           WHERE event_type = '{_FUNNEL[0]}' GROUP BY 1),
    t2 AS (SELECT ev.user_id, t1.t1, MIN(tus) AS t2
           FROM ev JOIN t1 USING (user_id)
           WHERE event_type = '{_FUNNEL[1]}' AND tus > t1.t1
           GROUP BY 1, 2),
    t3 AS (SELECT ev.user_id, t2.t2, MIN(tus) AS t3
           FROM ev JOIN t2 USING (user_id)
           WHERE event_type = '{_FUNNEL[2]}' AND tus > t2.t2
           GROUP BY 1, 2)
    SELECT t1.user_id, t1.t1, t2.t2, t3.t3,
           CAST(1 + CAST(t2.t2 IS NOT NULL AS INTEGER)
                  + CAST(t3.t3 IS NOT NULL AS INTEGER) AS INTEGER)
               AS reached
    FROM t1
    LEFT JOIN t2 ON t2.user_id = t1.user_id AND t2.t1 = t1.t1
    LEFT JOIN t3 ON t3.user_id = t1.user_id AND t3.t2 = t2.t2
"""

ORACLES["ev_retention"] = f"""
    WITH ev AS (SELECT user_id, event_type,
                       (epoch_us(ts) // 1000000) // {_WEEK} AS wk
                FROM events),
    cohort AS (SELECT user_id, MIN(wk) AS cw FROM ev
               WHERE event_type = 'signup' GROUP BY 1),
    active AS (SELECT DISTINCT user_id, wk FROM ev)
    SELECT cw AS cohort_week, wk - cw AS "offset",
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM active JOIN cohort USING (user_id)
    WHERE wk >= cw
    GROUP BY 1, 2
"""


def ev_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-rate anomaly detection (X46): per event type, each
    hour's count is z-scored against the trailing 24 hourly counts —
    the operational monitor an ingest pipeline runs on its own feed.

    Cross-engine variance without stddev_samp: Spark (Welford) and
    DuckDB disagree in the last ulp, so the window carries INTEGER
    sums (Σx, Σx², n — exact at any scale) and the variance is one
    deterministic double expression.  The window input is hourly
    aggregates — bounded rows per type, so the per-type partition can
    never hold more than hours-of-history rows no matter the corpus
    size.
    """
    from pyspark.sql.window import Window

    hb = F.expr("(unix_micros(ts) div 1000000) div 3600")
    hourly = (load_table(spark, "events", sf_dir)
              .groupBy("event_type", hb.alias("hb"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.partitionBy("event_type").orderBy("hb")
         .rowsBetween(-24, -1))
    stats = hourly.select(
        "event_type", "hb", "cnt",
        F.sum("cnt").over(w).alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).alias("n"))
    mean = F.col("s1").cast("double") / F.col("n")
    var = ((F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1") / F.col("n"))
           / (F.col("n") - 1))
    z = (F.col("cnt") - mean) / F.sqrt(var)
    good = (F.col("n") >= 12) & (var > 0.0)
    return stats.select(
        "event_type", "hb", "cnt",
        F.when(good, F.round(z, 4)).alias("z"),
        F.when(good, z > 3.0).otherwise(F.lit(False)).alias("is_anomaly"))


QUERIES["ev_anomaly"] = ev_anomaly

ORACLES["ev_anomaly"] = """
    WITH hourly AS (
        SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS hb,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
    stats AS (
        SELECT event_type, hb, cnt,
               SUM(cnt) OVER w AS s1,
               SUM(cnt * cnt) OVER w AS s2,
               COUNT(*) OVER w AS n
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hb
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, hb, CAST(cnt AS BIGINT) AS cnt,
           CASE WHEN n >= 12 AND
                     (CAST(s2 AS DOUBLE)
                      - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1) > 0.0e0
                THEN round((cnt - CAST(s1 AS DOUBLE) / n)
                           / sqrt((CAST(s2 AS DOUBLE)
                                   - CAST(s1 AS DOUBLE) * s1 / n)
                                  / (n - 1)), 4)
           END AS z,
           COALESCE(CASE WHEN n >= 12 AND
                              (CAST(s2 AS DOUBLE)
                               - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
                              > 0.0e0
                         THEN (cnt - CAST(s1 AS DOUBLE) / n)
                              / sqrt((CAST(s2 AS DOUBLE)
                                      - CAST(s1 AS DOUBLE) * s1 / n)
                                     / (n - 1)) > 3.0e0
                    END, FALSE) AS is_anomaly
    FROM stats
"""


#: first day index that belongs to the incremental delta (the base
#: rollup covers days strictly before this)
_ROLLUP_SPLIT_DAY = 19750


def d6_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance (X49): the daily
    (event_type, day) aggregate is maintained as BASE ⊕ DELTA — the
    base rollup (days before the split) is merged with the delta batch's
    partial aggregate by a full-outer coalescing join, never
    recomputing base facts.  The ORACLE is the single-pass full
    recompute, so the driver hash proves the incremental maintenance
    identity ``rollup(base ∪ delta) = merge(rollup(base),
    rollup(delta))`` value-for-value.

    Float discipline: per-event values are rounded to 6 digits and
    summed as DECIMAL(18,6), so partial-aggregate merge order can never
    diverge from the one-pass sum.  Scale shape: both partials are
    map-side combining groupBys; the merge joins two already-aggregated
    (type × day) frames — the whole point is the base facts are never
    rescanned.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr("(unix_micros(ts) div 1000000) div 86400").alias("day"),
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"))

    def rollup(df):
        return df.groupBy("event_type", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").alias("sum_v"))

    base = rollup(ev.where(F.col("day") < _ROLLUP_SPLIT_DAY))
    delta = rollup(ev.where(F.col("day") >= _ROLLUP_SPLIT_DAY))
    b = base.select("event_type", "day",
                    F.col("n_events").alias("bn"), F.col("sum_v").alias("bs"))
    d = delta.select("event_type", "day",
                     F.col("n_events").alias("dn"), F.col("sum_v").alias("ds"))
    merged = b.join(d, ["event_type", "day"], "full_outer")
    zero = F.lit(0).cast("decimal(18,6)")
    return merged.select(
        "event_type", "day",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .alias("n_events"),
        (F.coalesce("bs", zero) + F.coalesce("ds", zero))
        .cast("double").alias("sum_value"))


QUERIES["d6_incremental_rollup"] = d6_incremental_rollup

# the full single-pass recompute — equality with the incremental merge
# above IS the maintenance-identity proof
ORACLES["d6_incremental_rollup"] = """
    SELECT event_type,
           (epoch_us(ts) // 1000000) // 86400 AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY 1, 2
"""


def x66_ewma_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed user features (X66): each user's exponentially
    weighted average over their last 8 events (newest weighted 1,
    halving per step back) — the classic feature-engineering aggregate
    a ranking/serving pipeline maintains per entity.

    Engine-exactness by construction: the measure is floor-quantized
    integer millis, the decay is a=1/2 so every weight is a POWER OF
    TWO (1/2^j is exact in binary; millis·2⁻ʲ is exact; all partial
    sums fit the 53-bit mantissa, so summation order cannot round) and
    the single final division is performed on bit-identical doubles in
    both engines — no rounding anywhere, per the never-re-round rule.
    Scale shape: one shuffle on user_id for the rank window, then a
    partial-agg groupBy."""
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id"))
    ranked = (ev.select(
        "user_id", "event_id", "ts",
        F.floor(F.col("value") * 1000).cast("long").alias("millis"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 8))
    weight_den = F.expr("CAST(shiftleft(CAST(1 AS BIGINT), rk - 1) "
                        "AS DOUBLE)")
    term = F.col("millis").cast("double") / weight_den
    wgt = F.lit(1.0) / weight_den
    return (ranked.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_recent"),
                 (F.sum(term) / F.sum(wgt) / F.lit(1000.0))
                 .alias("ewma_value")))


QUERIES["x66_ewma_features"] = x66_ewma_features

ORACLES["x66_ewma_features"] = """
    WITH ranked AS (
        SELECT user_id,
               CAST(floor(value * 1000) AS BIGINT) AS millis,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events)
    SELECT user_id, COUNT(*) AS n_recent,
           (SUM(CAST(millis AS DOUBLE)
                / CAST((CAST(1 AS BIGINT) << (rk - 1)) AS DOUBLE))
            / SUM(1.0e0 / CAST((CAST(1 AS BIGINT) << (rk - 1))
                               AS DOUBLE))
            / 1000.0e0) AS ewma_value
    FROM ranked WHERE rk <= 8
    GROUP BY user_id
"""


def x68_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix (X68): per (prev_type, next_type) pair,
    transition counts and the row-normalized probability — the Markov
    user-journey model product analytics fits over a clickstream
    (and the n-gram transition shape of sequence-data prep).

    One lag window per user (ts, event_id tiebreak — the repo's
    nondeterminism rule), then a partial-agg groupBy on the pair; the
    probability divides by the prev-type total via a tiny broadcast
    join.  Counts are exact integers; the single division happens on
    bit-identical inputs in both engines (never-re-round rule)."""
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "ts", "event_id", "event_type")
             .withColumn("next_type", F.lead("event_type").over(w))
             .where(F.col("next_type").isNotNull())
             .groupBy(F.col("event_type").alias("prev_type"),
                      "next_type")
             .agg(F.count(F.lit(1)).alias("n")))
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (pairs.join(F.broadcast(totals), "prev_type")
            .select("prev_type", "next_type", "n",
                    (F.col("n").cast("double")
                     / F.col("row_n").cast("double")).alias("p")))


QUERIES["x68_event_transitions"] = x68_event_transitions

ORACLES["x68_event_transitions"] = """
    WITH seq AS (
        SELECT event_type AS prev_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events),
    pairs AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    totals AS (SELECT prev_type, SUM(n) AS row_n FROM pairs GROUP BY 1)
    SELECT p.prev_type, p.next_type, p.n,
           (CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE)) AS p
    FROM pairs p JOIN totals t ON t.prev_type = p.prev_type
"""


#: pivot column set — pinned (Spark's pivot with explicit values skips
#: the extra distinct-scan job AND keeps the output schema static, the
#: form a production pipeline wants; the oracle mirrors with
#: conditional aggregation)
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def a11_pivot_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (A11): per-user wide event-type count matrix via
    ``groupBy().pivot(values=...)`` — the long→wide reshape
    (feature-matrix assembly).  Explicit pivot values keep the plan a
    single partial-agg shuffle with a static schema; without them
    Spark runs a distinct job first and the schema becomes
    data-dependent (schema drift between driver runs = a hash FAIL
    waiting to happen).  The oracle is conditional aggregation — what
    pivot compiles to underneath."""
    ev = load_table(spark, "events", sf_dir)
    wide = (ev.groupBy("user_id")
            .pivot("event_type", list(_EVENT_TYPES))
            .agg(F.count(F.lit(1))))
    out = wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}")
          for t in _EVENT_TYPES])
    total = None
    for t in _EVENT_TYPES:
        c = F.col(f"n_{t}")
        total = c if total is None else total + c
    return out.withColumn("n_total", total)


QUERIES["a11_pivot_matrix"] = a11_pivot_matrix

ORACLES["a11_pivot_matrix"] = """
    SELECT user_id,
           """ + ",\n           ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
    f"AS BIGINT) AS n_{t}" for t in _EVENT_TYPES) + """,
           CAST(SUM(CASE WHEN event_type IN
               ('click','error','purchase','signup','view')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_total
    FROM events GROUP BY user_id
"""


def a12_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (A12): the wide per-user matrix of ``a11_pivot_matrix``
    melted BACK to long form with ``DataFrame.unpivot`` (SQL ``stack``)
    — the wide→long reshape, here as a pivot→unpivot roundtrip so the
    oracle is simply the long-form counts (zero cells dropped, as a
    melt of a sparse matrix should).  Same single-shuffle profile as
    the pivot; the unpivot itself is a row-local generator."""
    wide = a11_pivot_matrix(spark, sf_dir).drop("n_total")
    long = wide.unpivot(
        "user_id",
        [f"n_{t}" for t in _EVENT_TYPES],
        "event_type", "n")
    return (long.where(F.col("n") > 0)
            .select("user_id",
                    F.expr("substring(event_type, 3)").alias("event_type"),
                    "n"))


QUERIES["a12_unpivot_roundtrip"] = a12_unpivot_roundtrip

ORACLES["a12_unpivot_roundtrip"] = """
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events
    WHERE event_type IN ('click','error','purchase','signup','view')
    GROUP BY 1, 2
"""


def x72_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X72: hypertable gap-filling with last-observation-carried-forward
    — each user's daily activity series densified to EVERY day between
    their first and last event (``time_bucket_gapfill`` + ``locf`` in
    TimescaleDB terms): ``(user_id, day_b, n_events, sum_millis_locf,
    is_gap)`` where gap days carry ``n_events = 0`` and the previous
    observed day's exact-integer value sum.

    Daily sums use the x63 floor-millis integer trick so LOCF carries a
    value summation order can't perturb; day buckets are BIGINT epoch
    seconds (window-oracle convention).

    Plan: the daily rollup and the per-user span share one user_id
    shuffle; the grid is a ``sequence``/``explode`` over the span (no
    driver-side loop, no cross join with a calendar table), the
    observed rollup left-joins back on (user, day), and a streaming
    rows-unbounded window carries values forward.  At 100 TB grid size
    is output-bounded (users x span-days), never input-bounded.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy(
        "user_id",
        (F.expr("unix_timestamp(ts) div 86400") * 86400).alias("day_b"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
             .alias("sum_millis")))
    grid = (daily.groupBy("user_id")
            .agg(F.min("day_b").alias("lo"), F.max("day_b").alias("hi"))
            .select("user_id",
                    F.explode(F.sequence(
                        F.col("lo"), F.col("hi"),
                        F.lit(86400).cast("long"))).alias("day_b")))
    filled = grid.join(daily, on=["user_id", "day_b"], how="left")
    w = (Window.partitionBy("user_id").orderBy("day_b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return filled.select(
        "user_id", "day_b",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.last("sum_millis", ignorenulls=True).over(w)
        .alias("sum_millis_locf"),
        F.when(F.col("n_events").isNull(), F.lit(1)).otherwise(F.lit(0))
        .alias("is_gap"),
    )


QUERIES["x72_gapfill_locf"] = x72_gapfill_locf

# DuckDB generate_series is list-valued in a SELECT, so the per-user
# calendar unnests without a lateral join; last_value IGNORE NULLS over
# rows-unbounded is the LOCF mirror.
ORACLES["x72_gapfill_locf"] = """
    WITH daily AS (
        SELECT user_id,
               (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400
                   AS day_b,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                   AS sum_millis
        FROM events GROUP BY 1, 2
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(MIN(day_b), MAX(day_b), 86400))
                   AS day_b
        FROM daily GROUP BY user_id
    )
    SELECT g.user_id, g.day_b,
           COALESCE(d.n_events, 0) AS n_events,
           last_value(d.sum_millis IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.day_b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sum_millis_locf,
           CASE WHEN d.n_events IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM grid g LEFT JOIN daily d
      ON d.user_id = g.user_id AND d.day_b = g.day_b
"""


def x82_bitmap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X82: bitmap-index set algebra — each user's activity days packed
    into ONE 64-bit mask (day index relative to the corpus's first day;
    the span is ~31 days, bit_or is the aggregate), with a second mask
    per event class, so audience questions ("active days", "days with
    clicks AND errors", "days with either") become bit_count over
    AND/OR of two BIGINTs — the roaring-bitmap access pattern an OLAP
    engine uses for segment membership, in its word-sized special case.

    Everything is integer bit arithmetic (shift, or, and, popcount) —
    bit-identical on any engine; the corpus min-day is a 1-row bounded
    broadcast (the tx_mix_weights pattern).  One partial-aggregating
    shuffle on user_id; masks pack server-side, so the exchange carries
    three BIGINTs per (user, task) no matter how many events.
    """
    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "user_id", "event_type",
        F.expr("unix_timestamp(ts) div 86400").alias("day"))
    min_day = base.agg(F.min("day").alias("min_day"))
    idx = (base.crossJoin(F.broadcast(min_day))
           .select("user_id", "event_type",
                   (F.col("day") - F.col("min_day")).alias("idx"))
           .where(F.col("idx") < 64))
    bit = F.expr("shiftleft(cast(1 as bigint), cast(idx as int))")
    masks = (idx.groupBy("user_id")
             .agg(F.bit_or(bit).alias("mask_all"),
                  F.bit_or(F.when(F.col("event_type") == "click", bit))
                  .alias("mask_click"),
                  F.bit_or(F.when(F.col("event_type") == "error", bit))
                  .alias("mask_error")))
    m_click = F.coalesce("mask_click", F.lit(0).cast("long"))
    m_error = F.coalesce("mask_error", F.lit(0).cast("long"))
    return masks.select(
        "user_id", "mask_all",
        F.bit_count("mask_all").cast("int").alias("n_days"),
        F.bit_count(m_click).cast("int").alias("n_click_days"),
        F.bit_count(m_error).cast("int").alias("n_error_days"),
        F.bit_count(m_click.bitwiseAND(m_error)).cast("int")
        .alias("n_both_days"),
        F.bit_count(m_click.bitwiseOR(m_error)).cast("int")
        .alias("n_either_days"),
    )


QUERIES["x82_bitmap_days"] = x82_bitmap_days

ORACLES["x82_bitmap_days"] = """
    WITH base AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
        FROM events
    ), rel AS (
        SELECT user_id, event_type,
               day - (SELECT MIN(day) FROM base) AS idx
        FROM base
    ), masks AS (
        SELECT user_id,
               bit_or(CAST(1 AS BIGINT) << CAST(idx AS INT))
                   AS mask_all,
               bit_or(CASE WHEN event_type = 'click'
                      THEN CAST(1 AS BIGINT) << CAST(idx AS INT) END)
                   AS mask_click,
               bit_or(CASE WHEN event_type = 'error'
                      THEN CAST(1 AS BIGINT) << CAST(idx AS INT) END)
                   AS mask_error
        FROM rel WHERE idx < 64
        GROUP BY user_id
    )
    SELECT user_id, mask_all,
           CAST(bit_count(mask_all) AS INT) AS n_days,
           CAST(bit_count(COALESCE(mask_click, 0)) AS INT)
               AS n_click_days,
           CAST(bit_count(COALESCE(mask_error, 0)) AS INT)
               AS n_error_days,
           CAST(bit_count(COALESCE(mask_click, 0)
                          & COALESCE(mask_error, 0)) AS INT)
               AS n_both_days,
           CAST(bit_count(COALESCE(mask_click, 0)
                          | COALESCE(mask_error, 0)) AS INT)
               AS n_either_days
    FROM masks
"""


def x84_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X84: time-weighted average (TWAP) per user — the financial/
    sensor-series aggregate where each value counts for how LONG it
    held, not how often it was sampled: trapezoidal integration between
    consecutive events divided by the observed span.

    Integer-exact end to end: values quantize to floor-millis, gaps to
    whole seconds, each trapezoid is ``(vm_i + vm_{i+1}) * dt`` in
    BIGINT, and the final division is the rounded-quotient identity
    ``(2p + q) div 2q`` (the CLAUDE.md decimal-trap discipline) — no
    float ever enters, so summation order cannot exist as a concept.
    Same-second runs contribute zero-width trapezoids (deterministic
    under the (sec, event_id) total order); zero-span users fall back
    to their first value.  One user_id shuffle serves the lead window
    and the aggregate.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "user_id", "event_id",
        F.expr("unix_timestamp(ts)").alias("sec"),
        F.floor(F.col("value") * 1000).cast("long").alias("vm"))
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    nxt_vm = F.lead("vm").over(w)
    nxt_sec = F.lead("sec").over(w)
    trap = (F.col("vm") + nxt_vm) * (nxt_sec - F.col("sec"))
    agg = (base.withColumn("trap", trap)
           .groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum("trap").alias("sum_trap"),
                (F.max("sec") - F.min("sec")).alias("span_s"),
                F.min_by("vm", F.struct("sec", "event_id"))
                .alias("first_vm")))
    # Sign-safe rounded quotient: (2|p|+q) div 2q is round-half-up only
    # for p >= 0, so apply it to abs(sum_trap) and restore the sign —
    # correct for signed measures, identical to the unsigned form on
    # today's value >= 0 data.
    rounded = ("(CASE WHEN sum_trap < 0 THEN -1 ELSE 1 END)"
               " * ((2 * abs(sum_trap) + 2 * span_s) div (4 * span_s))")
    return agg.select(
        "user_id", "n_events", "span_s",
        F.when(F.col("span_s") > 0, F.expr(rounded))
        .otherwise(F.col("first_vm")).alias("twap_milli"))


QUERIES["x84_twap"] = x84_twap

ORACLES["x84_twap"] = """
    WITH base AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(floor(value * 1000) AS BIGINT) AS vm
        FROM events
    ), stepped AS (
        SELECT user_id, event_id, sec, vm,
               (vm + lead(vm) OVER w) * (lead(sec) OVER w - sec) AS trap
        FROM base
        WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ), agg AS (
        -- first_vm only matters for span_s = 0 groups, where every sec
        -- is equal — there min-event_id IS the (sec, event_id) min, so
        -- this matches Spark's min_by(vm, struct(sec, event_id))
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(trap) AS BIGINT) AS sum_trap,
               MAX(sec) - MIN(sec) AS span_s,
               arg_min(vm, event_id) AS first_vm
        FROM stepped GROUP BY user_id
    )
    SELECT user_id, n_events, span_s,
           CASE WHEN span_s > 0
                THEN (CASE WHEN sum_trap < 0 THEN -1 ELSE 1 END)
                     * ((2 * abs(sum_trap) + 2 * span_s) // (4 * span_s))
                ELSE first_vm END AS twap_milli
    FROM agg
"""


def x85_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X85: user-journey PATH mining — the 25 most common 3-step event
    sequences across all users (x68's transition matrix extended from
    bigrams to path n-grams, the "what do users do next-next" question
    funnels are built from).

    One user_id shuffle feeds both lead windows (same (ts_us, event_id)
    total order as every event window in the repo); paths crossing a
    user boundary are discarded by the leads' NULLs.  Top-k is ORDER BY
    (n DESC, path) LIMIT — TakeOrderedAndProject with a deterministic
    tiebreak, not a global sort.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id")
    e2 = F.lead("event_type", 1).over(w)
    e3 = F.lead("event_type", 2).over(w)
    paths = (ev.select(
        F.when(e2.isNotNull() & e3.isNotNull(),
               F.concat_ws(">", "event_type", e2, e3)).alias("path"))
        .where(F.col("path").isNotNull()))
    return (paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "path").limit(25))


QUERIES["x85_event_paths"] = x85_event_paths

ORACLES["x85_event_paths"] = """
    WITH stepped AS (
        SELECT event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           COUNT(*) AS n
    FROM stepped WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 25
"""


def x87_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X87: watermark-expiry dedup in batch — per (user, event_type),
    keep an event iff it is >= 10 minutes after the last KEPT event
    (operators/dedup.py ``chained_window_dedup``; the batch analog of
    ``dropDuplicatesWithinWatermark``'s state expiry, and a different
    semantic from sessionization's gap rule, which this corpus's steady
    drip would collapse entirely).

    The kept-set is a sequential recurrence no window function
    expresses; the ORACLE is DuckDB's recursive CTE walking the same
    recurrence row by row — an independent implementation (the
    x65/WITH RECURSIVE pattern), so hash equality proves the
    Arrow-batched kernel's chain semantics exactly.
    """
    from ..operators.dedup import chained_window_dedup

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"),
        "event_id")
    return chained_window_dedup(
        ev, ["user_id", "event_type"], "ts_us", "event_id",
        window_us=600_000_000)


QUERIES["x87_window_dedup"] = x87_window_dedup

ORACLES["x87_window_dedup"] = """
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts), event_id)
                   AS rn
        FROM events
    ), walk(user_id, event_type, rn, ts_us, event_id, last_kept,
            kept) AS (
        SELECT user_id, event_type, rn, ts_us, event_id, ts_us, TRUE
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_type, o.rn, o.ts_us, o.event_id,
               CASE WHEN o.ts_us >= w.last_kept + 600000000
                    THEN o.ts_us ELSE w.last_kept END,
               o.ts_us >= w.last_kept + 600000000
        FROM walk w JOIN ordered o
          ON o.user_id = w.user_id AND o.event_type = w.event_type
         AND o.rn = w.rn + 1
    )
    SELECT user_id, event_type, ts_us, event_id
    FROM walk WHERE kept
"""
