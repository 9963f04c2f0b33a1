"""r14 A/B: g9_pagerank checkpoint cadence.

HEAD materializes 5 eager frames (edges, deg, ranks x3) = 5 jobs; the
phase probe puts ALL of g9's wall in build (5.97 s) with 0.05 s
execution.  Variant B checkpoints edges + one mid-chain rank frame
only (2 eager jobs; deg/n folded into the carried rank frame so the
per-round crossJoin broadcast disappears), leaving <=2 lazy iterations
per executed job.  Values must be identical (same integer fixed-point
arithmetic).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"
_SCALE = 10 ** 12
_BASE_NUM = 150_000_000_000
_ITERS = 3


def variant_b(spark, sf_dir, ckpt_every=2):
    from openplacereviews_db_spark.sources.testdata import load_table

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey",
                                                      "l_suppkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey",
                                                        "o_custkey")
    pairs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
             .select("o_custkey", "l_suppkey").distinct()
             .select(F.concat(F.lit("c:"),
                              F.col("o_custkey").cast("string")).alias("c"),
                     F.concat(F.lit("s:"),
                              F.col("l_suppkey").cast("string")).alias("s")))
    edges = (pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
             .union(pairs.select(F.col("s").alias("src"),
                                 F.col("c").alias("dst"))))
    edges = edges.localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = (deg.crossJoin(F.broadcast(n))
             .select(F.col("src").alias("node"), "deg", "n",
                     F.expr(f"(2 * CAST({_SCALE} AS BIGINT) + n)"
                            " div (2 * n)").alias("pr_fp")))
    for it in range(_ITERS):
        contrib = (
            edges.join(ranks.select(F.col("node").alias("src"),
                                    F.expr("(2 * pr_fp + deg) div (2 * deg)")
                                    .alias("c")),
                       "src")
            .groupBy("dst").agg(F.sum("c").alias("s")))
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select("node", "deg", "n",
                    (F.expr(f"(2 * CAST({_BASE_NUM} AS BIGINT) + n)"
                            " div (2 * n)")
                     + F.expr("(2 * 85 * coalesce(s, CAST(0 AS BIGINT))"
                              " + 100) div 200")).alias("pr_fp")))
        if (it + 1) % ckpt_every == 0 and it != _ITERS - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", "deg",
        (F.col("pr_fp").cast("double") / F.lit(float(_SCALE))).alias("pr"))


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14pr", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    head = entrymod.queries()["g9_pagerank"]
    import gc

    def drop_blocks() -> None:
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    # warm codegen at the smallest sf
    head(spark, "/root/testdata/sf0.001").collect()
    variant_b(spark, "/root/testdata/sf0.001").collect()
    drop_blocks()

    res: dict[str, list[float]] = {}
    for rnd in range(3):
        for name, fn in (("A_head", lambda: head(spark, SF)),
                         ("B_ckpt2", lambda: variant_b(spark, SF))):
            t0 = time.time()
            rows = fn().collect()
            dt = round(time.time() - t0, 3)
            drop_blocks()
            res.setdefault(name, []).append(dt)
            print(f"# {name} r{rnd}: {dt}s rows={len(rows)} "
                  f"load={[round(x, 2) for x in os.getloadavg()]}",
                  flush=True)
    a = sorted(map(tuple, head(spark, SF).collect()))
    b = sorted(map(tuple, variant_b(spark, SF).collect()))
    print("values_equal:", a == b, "n:", len(a))
    print(res)
    spark.stop()


if __name__ == "__main__":
    main()
