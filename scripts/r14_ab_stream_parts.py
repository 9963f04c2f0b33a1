"""r14 A/B: shuffle-partition scoping for the foreachBatch streaming
runners (st_neardup_pairs / st_exact_dedup / st_scd2_upsert /
st_hll_distinct) at sf0.1.

The stateful runners already size their state-store shuffle to 8
(_run_to_memory state_partitions, the r9 finding); the foreachBatch
bodies still plan every per-batch join/groupBy at the session's 32
shuffle partitions.  This probe interleaves A (HEAD, 32) and B
(spark.sql.shuffle.partitions=8 scoped around the stream) samples in
ONE session, with value fingerprints to prove partition-count
invariance.

Usage: python scripts/r14_ab_stream_parts.py [rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
QUERIES = ["st_neardup_pairs", "st_exact_dedup", "st_scd2_upsert",
           "st_hll_distinct"]


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("r14ab", sf_dir=SF)
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

    # warm both variants once (codegen, staged splits)
    for q in QUERIES:
        qs[q](spark, "/root/testdata/sf0.001").collect()
        drop_blocks()

    out: dict = {"sf": 0.1, "rounds": rounds, "samples": {},
                 "fingerprints": {}}

    def fingerprint(rows) -> tuple:
        return (len(rows), hash(tuple(sorted(map(str, rows))[:50])),
                hash(tuple(sorted(map(str, rows))[-50:])))

    for r in range(rounds):
        for variant in ("A32", "B8"):
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"{q} {variant} r{r}")
                before = spark.conf.get("spark.sql.shuffle.partitions")
                if variant == "B8":
                    spark.conf.set("spark.sql.shuffle.partitions", "8")
                t0 = time.time()
                try:
                    rows = qs[q](spark, SF).collect()
                finally:
                    spark.conf.set("spark.sql.shuffle.partitions", before)
                dt = round(time.time() - t0, 3)
                drop_blocks()
                key = f"{q}:{variant}"
                out["samples"].setdefault(key, []).append(dt)
                fp = fingerprint(rows)
                prev = out["fingerprints"].setdefault(q, fp)
                if prev != fp:
                    out["fingerprints"][q] = ("MISMATCH", prev, fp)
                print(f"# {q} {variant} r{r}: {dt}s rows={len(rows)} "
                      f"load={[round(x,2) for x in os.getloadavg()]}",
                      file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
