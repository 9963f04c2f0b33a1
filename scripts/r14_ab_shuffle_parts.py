"""r14 probe: isolate the per-partition task-constant component of the
core-scaling observation (heavy queries faster at 8 shuffle partitions
than 32 at sf0.1) from co-tenant steal attraction.

One session at the contract core count (local[32]); alternate
spark.sql.shuffle.partitions between 32 (HEAD default = cores) and an
input-derived small value between samples of the same query, so both
variants see the same capacity weather.  Values fingerprinted — every
query must be partition-count invariant (repo rule).

Usage: python scripts/r14_ab_shuffle_parts.py [rounds] [small_parts]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
QUERIES = ["dd_ngram_jaccard", "dd_containment", "g2_proximity_groups",
           "dd_dup_groups", "j2_proximity_pairs", "g11_triangle_count"]


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("r14abparts", sf_dir=SF)
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

    for q in QUERIES:  # warm codegen + staged artifacts
        qs[q](spark, "/root/testdata/sf0.001").collect()
        drop_blocks()

    base = spark.conf.get("spark.sql.shuffle.partitions")
    out: dict = {"sf": 0.1, "rounds": rounds, "cores": n,
                 "variants": [int(base), small], "samples": {},
                 "fingerprints": {}, "load": []}
    for q in QUERIES:
        out["samples"][q] = {base: [], str(small): []}
    try:
        for rnd in range(rounds):
            out["load"].append(os.getloadavg())
            for q in QUERIES:
                order = (base, str(small)) if rnd % 2 == 0 else \
                        (str(small), base)
                for sp in order:
                    spark.conf.set("spark.sql.shuffle.partitions", sp)
                    t0 = time.time()
                    rows = qs[q](spark, SF).collect()
                    dt = round(time.time() - t0, 3)
                    drop_blocks()
                    out["samples"][q][sp].append(dt)
                    fp = fingerprint(rows)
                    prev = out["fingerprints"].get(q)
                    if prev is None:
                        out["fingerprints"][q] = {"fp": list(fp),
                                                  "equal": True}
                    elif list(fp) != prev["fp"]:
                        prev["equal"] = False
                        prev[f"{q}:{sp}"] = list(fp)
                    print(f"r{rnd} {q} parts={sp}: {dt}s rows={fp[0]}",
                          flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    out["load"].append(os.getloadavg())
    with open("r14_ab_shuffle_parts.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["samples"]))
    print("VALUES_EQUAL:",
          all(v.get("equal") for v in out["fingerprints"].values()))


if __name__ == "__main__":
    main()
