"""r14 A/B: spark.sql.adaptive.coalescePartitions.parallelismFirst.

The shuffle-partitions isolation probe (r14_ab_shuffle_parts.py) showed
the heavy queries pay 1-1.7 s of per-partition task constants at 32
initial partitions on sf0.1-sized shuffles.  AQE's coalescing should
collapse those to the 64 MB advisory target, but parallelismFirst=true
(the default) makes it target default parallelism INSTEAD of bytes —
the Spark docs themselves recommend false on busy clusters.  This A/B
toggles the conf per sample, interleaved in one session at the contract
core count, values fingerprinted.

Usage: python scripts/r14_ab_parallelism_first.py [rounds] [q1,q2,...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
CONF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
DEFAULT_QUERIES = ["dd_ngram_jaccard", "dd_containment",
                   "g2_proximity_groups", "dd_dup_groups",
                   "j2_proximity_pairs", "g11_triangle_count"]


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    queries = (sys.argv[2].split(",") if len(sys.argv) > 2
               else DEFAULT_QUERIES)
    spark = get_spark("r14abpf", sf_dir=SF)
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

    def fingerprint(rows) -> tuple:
        return (len(rows),
                hash(tuple(sorted(tuple(str(v) for v in r) for r in rows))))

    for q in queries:  # warm codegen + staged artifacts
        qs[q](spark, "/root/testdata/sf0.001").collect()
        drop_blocks()

    out: dict = {"sf": 0.1, "rounds": rounds, "cores": n, "conf": CONF,
                 "samples": {}, "fingerprints": {}, "load": []}
    for q in queries:
        out["samples"][q] = {"true": [], "false": []}
    try:
        for rnd in range(rounds):
            out["load"].append(os.getloadavg())
            for q in queries:
                order = ("true", "false") if rnd % 2 == 0 else \
                        ("false", "true")
                for val in order:
                    spark.conf.set(CONF, val)
                    t0 = time.time()
                    rows = qs[q](spark, SF).collect()
                    dt = round(time.time() - t0, 3)
                    drop_blocks()
                    out["samples"][q][val].append(dt)
                    fp = fingerprint(rows)
                    prev = out["fingerprints"].get(q)
                    if prev is None:
                        out["fingerprints"][q] = {"fp": list(fp),
                                                  "equal": True}
                    elif list(fp) != prev["fp"]:
                        prev["equal"] = False
                        prev[f"{q}:{val}"] = list(fp)
                    print(f"r{rnd} {q} pf={val}: {dt}s rows={fp[0]}",
                          flush=True)
    finally:
        spark.conf.set(CONF, "true")
    out["load"].append(os.getloadavg())
    with open("r14_ab_parallelism_first.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["samples"]))
    print("VALUES_EQUAL:",
          all(v.get("equal") for v in out["fingerprints"].values()))


if __name__ == "__main__":
    main()
