"""r14 A/B: s4_adaptive_split with the finest-cell aggregation
localCheckpointed once vs the lazy HEAD shape.

Why: the frontier walk references each level's ``children`` frame
twice (leaves union + next frontier), so the plan tree instantiates
the finest aggregation over the FULL input ~2**MAX_LEVEL times; all
downstream frames are tiny cell-count tables, so one eager checkpoint
of ``finest`` turns every duplicate subtree into an ExistingRDD scan
(the g2/a5 pattern).  Timed from plan construction through the noop
sink (the checkpoint moves execution into build, so build+exec is the
fair unit); values collected once per variant and compared exactly.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.operators import adaptive_split as AS
    from openplacereviews_db_spark.plans.sync_plans import _points, S4_LIMIT
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14s4", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def ckpt_cells(pts, limit, max_level=AS.MAX_LEVEL, diff=False):
        dims = AS.level_dims(max_level, diff)
        fw, fh = dims[max_level]
        finest = pts.select(
            F.floor((F.col("lon") + F.lit(180.0)) / F.lit(fw)).alias("ix"),
            F.floor((F.col("lat") + F.lit(90.0)) / F.lit(fh)).alias("iy"),
        ).groupBy("ix", "iy").agg(F.count(F.lit(1)).alias("cnt"))
        finest = finest.localCheckpoint(eager=True)  # <- the variant
        counts = [None] * (max_level + 1)
        counts[max_level] = finest
        for lv in range(max_level - 1, -1, -1):
            sx, sy = AS.split_factors(lv, *dims[lv], diff)
            counts[lv] = (
                counts[lv + 1]
                .groupBy(F.floor(F.col("ix") / sx).cast("long").alias("ix"),
                         F.floor(F.col("iy") / sy).cast("long").alias("iy"))
                .agg(F.sum("cnt").alias("cnt")))
        leaves = counts[0].where(F.lit(False)).withColumn(
            "level", F.lit(0))
        frontier = counts[0]
        for lv in range(1, max_level + 1):
            sx, sy = AS.split_factors(lv - 1, *dims[lv - 1], diff)
            parents = frontier.select(F.col("ix").alias("pix"),
                                      F.col("iy").alias("piy"))
            children = counts[lv].join(
                parents,
                (F.floor(F.col("ix") / sx).cast("long") == F.col("pix"))
                & (F.floor(F.col("iy") / sy).cast("long") == F.col("piy")),
            ).select("ix", "iy", "cnt")
            if lv == max_level:
                leaves = leaves.unionByName(
                    children.withColumn("level", F.lit(lv)))
                break
            leaves = leaves.unionByName(
                children.where(F.col("cnt") < limit)
                .withColumn("level", F.lit(lv)))
            frontier = children.where(F.col("cnt") >= limit)
        return leaves.select("level", "ix", "iy", "cnt")

    def new_q(spark, sf_dir):
        return ckpt_cells(_points(spark, sf_dir), S4_LIMIT)

    cases = {"head": qs["s4_adaptive_split"], "ckpt": new_q}
    for fn in cases.values():
        fn(spark, SF).write.format("noop").mode("overwrite").save()
    gc.collect()

    res: dict[str, list[float]] = {}
    vals: dict[str, list] = {}
    for rnd in range(ROUNDS):
        for label, fn in cases.items():
            spark.sparkContext.setJobDescription(f"s4 {label} r{rnd}")
            t0 = time.time()
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            res.setdefault(label, []).append(round(dt, 2))
            if rnd == 0:
                vals[label] = sorted(tuple(r) for r in df.collect())
            print(f"# s4 {label} r{rnd}: {dt:.2f}s "
                  f"load={os.getloadavg()[0]:.1f}", file=sys.stderr)
            spark.catalog.clearCache()
    assert vals["head"] == vals["ckpt"], "s4: VALUES DIFFER"
    print(f"# s4: values identical ({len(vals['head'])} rows)",
          file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
