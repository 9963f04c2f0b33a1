"""Changelog (operation-log) query plans with DuckDB oracles.

These differentially test the M9 fold (`operators.changelog.apply_operations`)
and the E1 CDC extractor (`operators.changelog.extract_diff`) — the core
write-side machinery of the reference (SURVEY.md §2.10) — by building a
changelog whose *net effect* is expressible as plain SQL over the driver
tables:

- ``m9_apply_changelog``: orders become ``create`` ops, each lineitem an
  ``edit`` setting ``lines.{linenumber}``, 'F'-status orders a ``delete``;
  the folded snapshot must equal the orders⟕lineitem SQL aggregate.
- ``e9_extract_diff``: two SQL-derivable snapshots of orders → diff rows
  (action + change map) matched against a CASE-based oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import changelog as C
from ..sources.testdata import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def m9_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold a synthetic changelog (create/edit/delete) and project the
    snapshot; differential for apply_operations (M9).

    block 0: every order creates ``{"status": ..., "lines": {}}``;
    block 1: every lineitem edits ``lines.{linenumber} := quantity``;
    block 2: 'F'-status orders are deleted.
    """
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    oid = F.col("o_orderkey").cast("string").alias("obj_id")
    creates = orders.select(
        oid, F.lit(0).alias("block_id"), F.lit(0).alias("op_seq"),
        F.lit("create").alias("action"),
        F.to_json(F.struct(F.col("o_orderstatus").alias("status"))).alias("doc"),
        F.lit(None).cast("string").alias("change"),
    )
    # In-batch edit dedup (operator A7: the reference dedups edits per
    # operation before publishing) — the synthetic data has duplicate
    # (orderkey, linenumber) pairs, and last-wins between identical
    # (block, seq) keys would be shuffle-order-dependent.
    edits = (
        lineitem.groupBy("l_orderkey", "l_linenumber")
        .agg(F.max("l_quantity").alias("qty"))
        .select(
            F.col("l_orderkey").cast("string").alias("obj_id"),
            F.lit(1).alias("block_id"),
            F.col("l_linenumber").cast("long").alias("op_seq"),
            F.lit("edit").alias("action"),
            F.lit(None).cast("string").alias("doc"),
            F.format_string('{"lines.{%d}": {"set": %d}}',
                            F.col("l_linenumber"),
                            F.col("qty").cast("int")).alias("change"),
        )
    )
    deletes = orders.where(F.col("o_orderstatus") == "F").select(
        oid, F.lit(2).alias("block_id"), F.lit(0).alias("op_seq"),
        F.lit("delete").alias("action"),
        F.lit(None).cast("string").alias("doc"),
        F.lit(None).cast("string").alias("change"),
    )
    ops = creates.unionByName(edits).unionByName(deletes)
    empty = spark.createDataFrame([], "obj_id string, doc string")
    snapshot = C.apply_operations(empty, ops)
    parsed = snapshot.select(
        "obj_id",
        F.from_json("doc", "struct<status:string, lines:map<string,long>>").alias("d"),
    )
    return parsed.select(
        "obj_id",
        F.col("d.status").alias("status"),
        F.coalesce(F.size("d.lines"), F.lit(0)).cast("long").alias("n_lines"),
        F.coalesce(
            F.aggregate(F.map_values("d.lines"), F.lit(0).cast("long"),
                        lambda acc, x: acc + x),
            F.lit(0).cast("long"),
        ).alias("sum_qty"),
    )


def e9_extract_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-extract between two SQL-derivable order snapshots (E1).

    old = all orders as ``{"status": s}``; new = orders over 100k, with
    status forced to 'X' over 400k, plus synthetic 'n<key>' creations
    over 480k.  Expected actions are a pure CASE expression.
    """
    orders = _t(spark, sf_dir, "orders")
    doc = F.to_json(F.struct(F.col("o_orderstatus").alias("status")))
    old = orders.select(F.col("o_orderkey").cast("string").alias("obj_id"),
                        doc.alias("doc"))
    kept = orders.where(F.col("o_totalprice") > 100000).select(
        F.col("o_orderkey").cast("string").alias("obj_id"),
        F.to_json(F.struct(
            F.when(F.col("o_totalprice") > 400000, F.lit("X"))
            .otherwise(F.col("o_orderstatus")).alias("status"))).alias("doc"),
    )
    created = orders.where(F.col("o_totalprice") > 480000).select(
        F.concat(F.lit("n"), F.col("o_orderkey").cast("string")).alias("obj_id"),
        F.to_json(F.struct(F.lit("NEW").alias("status"))).alias("doc"),
    )
    new = kept.unionByName(created)
    return C.extract_diff(old, new).select("obj_id", "action", "change")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "m9_apply_changelog": m9_apply_changelog,
    "e9_extract_diff": e9_extract_diff,
}

ORACLES: dict[str, str] = {
    "m9_apply_changelog": """
        WITH dedup AS (
            SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS qty
            FROM lineitem GROUP BY l_orderkey, l_linenumber
        )
        SELECT CAST(o.o_orderkey AS VARCHAR) AS obj_id,
               o.o_orderstatus AS status,
               COUNT(l.l_linenumber) AS n_lines,
               COALESCE(CAST(SUM(l.qty) AS BIGINT), 0) AS sum_qty
        FROM orders o LEFT JOIN dedup l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus <> 'F'
        GROUP BY o.o_orderkey, o.o_orderstatus
    """,
    "e9_extract_diff": """
        SELECT CAST(o_orderkey AS VARCHAR) AS obj_id,
               'delete' AS action, CAST(NULL AS VARCHAR) AS change
        FROM orders WHERE o_totalprice <= 100000
        UNION ALL
        SELECT CAST(o_orderkey AS VARCHAR), 'edit',
               '{"status": {"set": "X"}}'
        FROM orders WHERE o_totalprice > 400000 AND o_orderstatus <> 'X'
        UNION ALL
        SELECT 'n' || CAST(o_orderkey AS VARCHAR), 'create',
               CAST(NULL AS VARCHAR)
        FROM orders WHERE o_totalprice > 480000
    """,
}
