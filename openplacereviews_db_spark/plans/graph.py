"""Graph-centrality plan: fixed-iteration PageRank over the
customer↔supplier interaction graph (SURVEY.md §2.13 X40).

PageRank is the canonical "iterative algorithm on Spark" shape — the
kind of link-quality signal a crawl-curation pipeline computes over a
page graph.  Three damped iterations as a STATIC lazy plan (no
convergence probe, so no driver action and no lineage growth — the
checkpoint-per-round rule applies only to unbounded loops), with an
unrolled-CTE DuckDB oracle.

Cross-engine float discipline: ranks are carried as BIGINT pico-ranks
(fixed-point, scale 1e12) and every rounded division uses the exact
HALF_UP integer scheme ``(2p + q) div (2q)`` — never ``round(double)``,
whose Spark shortest-repr vs DuckDB binary-value semantics split on the
.5 grid (see CLAUDE.md).  The only float op is the final
``CAST(pr_fp AS DOUBLE) / 1e12``, bit-identical on identical integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table

_DAMP = 0.85
_ITERS = 3
#: fixed-point scale for integer-carried ranks (pico-ranks)
_SCALE = 10 ** 12
#: (1 - _DAMP) * _SCALE, exact in integers
_BASE_NUM = 150_000_000_000


def g9_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the bipartite customer↔supplier graph
    (distinct (o_custkey, l_suppkey) pairs, both directions, so every
    node has out-degree ≥ 1 and there are no dangling nodes).

    Scale shape: the edge build is one equi-join + distinct; each
    iteration is [edges ⋈ ranks on src] (AQE broadcasts the rank side —
    |V| rows — under the fact-side edge table) → groupBy(dst) partial
    sum → join back to the degree table.  Three iterations = a bounded
    static plan; the node count is a 1-row broadcast (audit-whitelisted).
    """
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey",
                                                      "l_suppkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey",
                                                        "o_custkey")
    # distinct on the INTEGER key pair, node strings built after — the
    # dedup shuffle carries 16 bytes/row instead of two strings (A/B'd
    # ~2x faster at sf0.1); bijective, so the edge set is identical
    pairs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select("o_custkey", "l_suppkey").distinct()
             .select(F.concat(F.lit("c:"),
                              F.col("o_custkey").cast("string")).alias("c"),
                     F.concat(F.lit("s:"),
                              F.col("l_suppkey").cast("string")).alias("s")))
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .union(pairs.select(F.col("s").alias("src"),
                                 F.col("c").alias("dst"))))
    # The edge and degree relations are referenced ~4x each across the
    # three iterations; materialize them once (plus the per-iteration
    # rank checkpoints below, together 13.9 → ~6 s steady-state at
    # sf0.1).  Run-once queries use eager localCheckpoint per the repo
    # rule (audit-whitelisted in EAGER_BUILD_OK).
    edges = edges.localCheckpoint(eager=True)
    deg = (edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
           .localCheckpoint(eager=True))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    # pr_fp = HALF_UP(SCALE / n) via the (2p + q) div (2q) integer scheme
    ranks = (deg.crossJoin(F.broadcast(n))
             .select(F.col("src").alias("node"), "deg", "n",
                     F.expr(f"(2 * CAST({_SCALE} AS BIGINT) + n)"
                            " div (2 * n)").alias("pr_fp")))
    for _ in range(_ITERS):
        # per-edge contribution HALF_UP(pr_fp / deg), still integer
        contrib = (
            edges.join(ranks.select(F.col("node").alias("src"),
                                    F.expr("(2 * pr_fp + deg) div (2 * deg)")
                                    .alias("c")),
                       "src")
            .groupBy("dst").agg(F.sum("c").alias("s")))
        # pr' = HALF_UP((1-d)*SCALE / n) + HALF_UP(d * s)  with d = 85/100
        ranks = (
            deg.crossJoin(F.broadcast(n))
            .join(contrib, deg.src == contrib.dst, "left")
            .select(F.col("src").alias("node"), "deg", "n",
                    (F.expr(f"(2 * CAST({_BASE_NUM} AS BIGINT) + n)"
                            " div (2 * n)")
                     + F.expr("(2 * 85 * coalesce(s, CAST(0 AS BIGINT))"
                              " + 100) div 200")).alias("pr_fp"))
            # checkpoint the tiny |V|-row rank frame each round — the
            # fully-lazy 3-iteration chain re-plans a 30-node DAG under
            # AQE and measured 2.4x slower than stepwise materialization
            .localCheckpoint(eager=True))
    return ranks.select(
        "node", "deg",
        (F.col("pr_fp").cast("double") / F.lit(float(_SCALE))).alias("pr"))


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration CTE mirror of :func:`g9_pagerank`."""
    sql = f"""
    WITH ip AS (
        SELECT DISTINCT o_custkey, l_suppkey
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    pairs AS (
        SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS c,
               's:' || CAST(l_suppkey AS VARCHAR) AS s
        FROM ip),
    edges AS (SELECT c AS src, s AS dst FROM pairs
              UNION ALL SELECT s, c FROM pairs),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr0 AS (SELECT src AS node, deg,
                   (2 * {_SCALE} + n) // (2 * n) AS pr_fp
            FROM deg CROSS JOIN nn)"""
    prev = "pr0"
    for i in range(1, _ITERS + 1):
        sql += f""",
    it{i} AS (SELECT e.dst AS node,
                     SUM((2 * p.pr_fp + p.deg) // (2 * p.deg)) AS s
              FROM edges e JOIN {prev} p ON e.src = p.node GROUP BY 1),
    pr{i} AS (SELECT d.src AS node, d.deg,
                     (2 * {_BASE_NUM} + n) // (2 * n)
                         + (2 * 85 * COALESCE(it{i}.s, 0) + 100) // 200
                         AS pr_fp
              FROM deg d CROSS JOIN nn LEFT JOIN it{i} ON it{i}.node = d.src)"""
        prev = f"pr{i}"
    sql += f"""
    SELECT node, deg, CAST(pr_fp AS DOUBLE) / 1.0e12 AS pr FROM {prev}
    """
    return sql


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "g9_pagerank": g9_pagerank,
}

ORACLES: dict[str, str] = {
    "g9_pagerank": _pagerank_oracle(),
}
