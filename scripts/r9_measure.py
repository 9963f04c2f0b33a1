"""Round-9 measurement session (one Spark JVM, interleaved samples):

1. dd_ngram_jaccard steady-state re-pin at sf0.1 (r8 verdict item 5):
   4 samples interleaved with the other workloads, loadavg recorded —
   the band drifted upward two rounds (r7 local 5.1/5.6, r8 driver
   retime 7.1/3.8) vs the r6 interleaved pin of ~3.1 s, code unchanged.
2. Merge-cascade replay at 10x (verdict item 7): the reference's
   MergePlaceBotOtherTest yield assertion (>2,100 merges at sf0.1)
   re-run against /tmp/opr_sf1 (10x customers), yield + wall, 2 reps.
3. mm_phash_groups at sf0.1 and sf1 (1 rep): the new LINEAR groups
   surface next to the quadratic pairs (BASELINE r8: 167k->6.79M pairs
   at 10x; groups rows should stay ~linear in media items).

Prints one JSON blob at the end; progress lines to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/opr_sf1"


def log(msg: str) -> None:
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]}",
          file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from openplacereviews_db_spark.operators import place_merge
    from openplacereviews_db_spark.plans import corpus
    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.sources import places as P

    spark = get_spark("r9measure")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"load_start": [round(x, 2) for x in os.getloadavg()]}

    def drop_blocks() -> None:
        import gc
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    # warm: python worker pool + the tables both workloads touch
    def _echo(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(_echo, "id long").count()
    for sf in (SF01, SF1):
        spark.read.parquet(os.path.join(sf, "documents.parquet")).count()
        spark.read.parquet(os.path.join(sf, "customer.parquet")).count()

    def ngram_sample() -> float:
        t0 = time.time()
        corpus.QUERIES["dd_ngram_jaccard"](spark, SF01).collect()
        dt = round(time.time() - t0, 2)
        drop_blocks()
        log(f"dd_ngram_jaccard {dt}s")
        return dt

    def merge_rep(sf: str) -> dict:
        t0 = time.time()
        closed = P.synthetic_closed_flat(spark, sf)
        active = P.synthetic_active_flat(spark, sf)
        merges, closes = place_merge.merge_and_close(
            closed, active,
            closed_docs=closed.select(
                "id", F.to_json(F.struct(F.struct(F.array().cast(
                    "array<struct<id:long>>").alias("osm"))
                    .alias("source"))).alias("doc")),
            now_iso="2021-06-01T00:00:00")
        n_merge = merges.where(F.col("action") == "edit").count()
        n_close = closes.count()
        dt = round(time.time() - t0, 2)
        drop_blocks()
        log(f"merge {sf} {dt}s merges={n_merge} closes={n_close}")
        return {"wall_s": dt, "merge_edits": n_merge, "closes": n_close}

    def phash_groups(sf: str) -> dict:
        t0 = time.time()
        rows = corpus.QUERIES["mm_phash_groups"](spark, sf).count()
        dt = round(time.time() - t0, 2)
        drop_blocks()
        log(f"mm_phash_groups {sf} {dt}s rows={rows}")
        return {"wall_s": dt, "group_rows": rows}

    # warm codegen for both workloads at the smallest sf
    corpus.QUERIES["dd_ngram_jaccard"](spark, "/root/testdata/sf0.001").collect()
    drop_blocks()

    # interleaved protocol
    out["ngram"] = [ngram_sample()]
    out["merge_sf01"] = [merge_rep(SF01)]
    out["merge_sf1"] = [merge_rep(SF1)]
    out["ngram"].append(ngram_sample())
    out["merge_sf01"].append(merge_rep(SF01))
    out["merge_sf1"].append(merge_rep(SF1))
    out["ngram"].append(ngram_sample())
    out["phash_groups_sf01"] = phash_groups(SF01)
    out["ngram"].append(ngram_sample())
    out["phash_groups_sf1"] = phash_groups(SF1)
    out["ngram"].append(ngram_sample())

    out["load_end"] = [round(x, 2) for x in os.getloadavg()]
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
