"""r14 A/B: spark.sql.join.preferSortMergeJoin=false (guide §9) —
lets the planner pick shuffled-hash joins where its size conditions
hold, skipping both sort passes.  Runtime-togglable, so A/B'd
interleaved in ONE session over a join-heavy query subset, with value
fingerprints.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
QUERIES = ["q3_segment_topk", "q5_region_revenue", "j1_argmax_join",
           "j2_proximity_pairs", "j4_match_cascade", "m6_close_report",
           "g11_triangle_count", "m9_apply_changelog", "x69_ri_audit",
           "j10_latest_event", "history_report", "m5_merge_ops",
           "dd_ngram_jaccard", "dd_containment", "tx_bm25",
           "g9_pagerank"]


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14shj", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def _echo(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(_echo, "id long").count()
    import gc

    def drop_blocks() -> None:
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").collect()
        spark.catalog.clearCache()
    drop_blocks()

    out: dict = {"samples": {}, "fingerprints": {}}
    for r in range(3):
        for variant, conf in (("A_smj", "true"), ("B_shj", "false")):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", conf)
            for q in QUERIES:
                t0 = time.time()
                rows = qs[q](spark, SF).collect()
                dt = round(time.time() - t0, 3)
                drop_blocks()
                out["samples"].setdefault(f"{q}:{variant}", []).append(dt)
                fp = (len(rows), hash(tuple(sorted(map(str, rows))[:40])))
                prev = out["fingerprints"].setdefault(q, fp)
                if prev != fp:
                    out["fingerprints"][q] = ("MISMATCH", prev, fp)
                print(f"# {q} {variant} r{r}: {dt}s "
                      f"load={[round(x, 2) for x in os.getloadavg()]}",
                      file=sys.stderr, flush=True)
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
