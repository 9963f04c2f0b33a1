"""Sketch queries: deterministic approximate aggregates with exact
oracles (operators/sketches.py — KMV distinct count, Count-Min
frequency).  Each query returns the sketch estimate NEXT TO the exact
aggregate, so the driver hash pins both the sketch arithmetic and its
calibration against ground truth."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketches
from ..sources.testdata import load_table


def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct parts per lineitem return flag: KMV(k=64) estimate vs
    exact.  One distinct shuffle feeds both."""
    li = load_table(spark, "lineitem", sf_dir)
    return sketches.kmv_distinct(li, "l_returnflag", "l_partkey", k=64)


def sk_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event frequencies from a 4x128 Count-Min grid vs exact;
    the grid is a fixed-size aggregate (512 cells) however large the
    event stream grows."""
    ev = load_table(spark, "events", sf_dir)
    return sketches.countmin_freq(ev, "user_id", depth=4, width=128)


def sk_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median account balance per market segment estimated from a
    deterministic 256-row bottom-k hash sample, vs exact — fixed sample
    size per group no matter how skewed the segment sizes get."""
    c = load_table(spark, "customer", sf_dir)
    return sketches.bottomk_quantile(
        c, "c_mktsegment", "c_custkey", "c_acctbal", k=256, q=0.5)


def sk_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: 512-register HyperLogLog estimate
    vs exact — the fixed-size mergeable answer to COUNT(DISTINCT) at
    100 TB, reproduced bit-for-bit by the SQL oracle (the JVM-private
    ``approx_count_distinct`` can't be)."""
    ev = load_table(spark, "events", sf_dir)
    return sketches.hll_distinct(ev, "event_type", "user_id")


def sk_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users who clicked vs users who errored: union and
    intersection cardinality estimated from ONE 64-value KMV sample of
    the union (theta-sketch set algebra), vs exact — the
    "segment A AND segment B" audience question answered from
    fixed-size mergeable state."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    return sketches.kmv_setops(clicks, errors, "user_id", k=64)


def sk_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sk_hll_distinct recomputed the rollup way: per-DAY register sets
    max-merged into the per-type estimate.  The oracle is the direct
    (unsliced) build — hash equality IS the mergeability proof, the
    property that lets 100 TB distinct-count rollups pre-aggregate."""
    ev = load_table(spark, "events", sf_dir)
    day = (F.expr("unix_timestamp(ts) div 86400") * 86400)
    return sketches.hll_merge_rollup(ev, "event_type", day, "user_id")


def sk_bottomk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sk_bottomk_quantiles recomputed the rollup way: per-nation
    bottom-256 samples merged into the per-segment sample.  The oracle
    is the direct (unsliced) build — hash equality proves the bottom-k
    of a union is the bottom-k of the parts (sample mergeability)."""
    c = load_table(spark, "customer", sf_dir)
    return sketches.bottomk_quantile_rollup(
        c, "c_mktsegment", F.col("c_nationkey"), "c_custkey",
        "c_acctbal", k=256, q=0.5)


def sk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent bigrams (collocations) at >= 1/750 of the stream, found
    sketch-first: the Count-Min estimate gates which keys get exact
    counting — CMS never underestimates, so no true heavy hitter can be
    dropped, and the exact filter kills the sketch's false admits."""
    d = load_table(spark, "documents", sf_dir)
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != F.lit(""))
    # A zero-word doc makes the slice length -1 (runtime error); such a
    # doc contributes no bigrams either way, so dropping it is exact and
    # matches the oracle's empty-list slice, which yields zero rows.
    base = d.select(ws.alias("ws")).where(F.size("ws") >= 1)
    n = F.size("ws")
    bigrams = F.zip_with(
        F.slice("ws", F.lit(1), n - 1), F.slice("ws", F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    tokens = base.select(F.explode(bigrams).alias("key"))
    return sketches.heavy_hitters(tokens, denom=750, depth=4, width=1024)


_HH_TOKENS_CTE = """
    SELECT unnest(ws[1:len(ws) - 1]) || ' ' || unnest(ws[2:len(ws)])
               AS key
    FROM (SELECT list_filter(string_split(text, ' '),
                             w -> w <> '') AS ws
          FROM documents)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sk_kmv_distinct": sk_kmv_distinct,
    "sk_countmin": sk_countmin,
    "sk_bottomk_quantiles": sk_bottomk_quantiles,
    "sk_hll_distinct": sk_hll_distinct,
    "sk_kmv_setops": sk_kmv_setops,
    "sk_hll_rollup": sk_hll_rollup,
    "sk_heavy_hitters": sk_heavy_hitters,
    "sk_bottomk_rollup": sk_bottomk_rollup,
}

ORACLES: dict[str, str] = {
    "sk_kmv_distinct": sketches.kmv_distinct_sql(
        "lineitem", "l_returnflag", "l_partkey", k=64),
    "sk_countmin": sketches.countmin_freq_sql(
        "events", "user_id", depth=4, width=128),
    "sk_bottomk_quantiles": sketches.bottomk_quantile_sql(
        "customer", "c_mktsegment", "c_custkey", "c_acctbal",
        k=256, q=0.5),
    "sk_hll_distinct": sketches.hll_distinct_sql(
        "events", "event_type", "user_id"),
    "sk_kmv_setops": sketches.kmv_setops_sql(
        "(SELECT * FROM events WHERE event_type = 'click')",
        "(SELECT * FROM events WHERE event_type = 'error')",
        "user_id", k=64),
    # deliberately the DIRECT build's SQL: slice-and-merge must land on
    # the identical registers, so equality proves mergeability
    "sk_hll_rollup": sketches.hll_distinct_sql(
        "events", "event_type", "user_id"),
    "sk_heavy_hitters": sketches.heavy_hitters_sql(
        _HH_TOKENS_CTE, denom=750, depth=4, width=1024),
    # deliberately the DIRECT build's SQL (the sk_hll_rollup pattern)
    "sk_bottomk_rollup": sketches.bottomk_quantile_sql(
        "customer", "c_mktsegment", "c_custkey", "c_acctbal",
        k=256, q=0.5),
}
