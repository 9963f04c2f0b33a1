"""r14 A/B: g5 single-kernel n_vertices (no size()-join back) and g4
counts-only kernel output (with_coords=False) vs the pre-r14 shapes —
both old shapes reconstructed inline with the NEW operators, so the
variants interleave in ONE session.  noop-timed (guide §1.4); values
collected once per variant and compared exactly.
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
    from openplacereviews_db_spark.functions import geometry as GM
    from openplacereviews_db_spark.plans.relational2 import _ways
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14geom", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def old_g5(spark, sf_dir):
        ways = _ways(spark, sf_dir)
        open_ways = ways.where(
            (F.size("coords") <= 3)
            | (F.element_at("coords", 1) != F.element_at("coords", -1)))
        stats = GM.way_stats(open_ways, mean_round=9).drop("n_vertices")
        n = open_ways.select("way_id", F.size("coords").alias("n_vertices"))
        return (stats.join(n, on="way_id")
                .select("way_id", "n_vertices",
                        F.round("centroid_lat", 6).alias("centroid_lat"),
                        F.round("centroid_lon", 6).alias("centroid_lon")))

    def old_g4(spark, sf_dir):
        return (GM.simplify_ways(_ways(spark, sf_dir), epsilon_deg=0.5,
                                 with_coords=True)
                .select("way_id", "n_in", "n_out"))

    cases = {
        "g5_way_stats": {"new": qs["g5_way_stats"], "old": old_g5},
        "g4_simplify_ways": {"new": qs["g4_simplify_ways"], "old": old_g4},
    }
    # warm codegen + python workers once per shape
    for c in cases.values():
        for fn in c.values():
            fn(spark, SF).write.format("noop").mode("overwrite").save()
    gc.collect()

    res: dict[str, dict[str, list[float]]] = {}
    vals: dict[str, dict[str, list]] = {}
    for rnd in range(ROUNDS):
        for label in ("new", "old"):
            for q, c in cases.items():
                spark.sparkContext.setJobDescription(f"{q} {label} r{rnd}")
                df = c[label](spark, SF)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                res.setdefault(q, {}).setdefault(label, []).append(
                    round(dt, 2))
                if rnd == 0:
                    vals.setdefault(q, {})[label] = sorted(
                        tuple(r) for r in df.collect())
                print(f"# {q} {label} r{rnd}: {dt:.2f}s "
                      f"load={os.getloadavg()[0]:.1f}", file=sys.stderr)
                spark.catalog.clearCache()
    for q, v in vals.items():
        assert v["new"] == v["old"], f"{q}: VALUES DIFFER"
        print(f"# {q}: values identical ({len(v['new'])} rows)",
              file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
