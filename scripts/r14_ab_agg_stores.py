"""r14 A/B: state-store count for the availableNow AGGREGATE runners
(st_event_rollup / st_sessionize / st_user_totals / st_enrich_join)
at sf0.1.

Item 5 cut st_stream_join's stores 8 -> 4 (the symmetric join holds two
per-partition stores, so each micro-batch pays the open/commit constant
twice per partition).  The aggregate runners still run at the r9 sizing
of 8; this probe interleaves A (8, HEAD) and B (4) samples in ONE
session with value fingerprints to prove store-count invariance.

Usage: python scripts/r14_ab_agg_stores.py [rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
QUERIES = ["st_event_rollup", "st_sessionize", "st_user_totals",
           "st_enrich_join"]


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.streaming import pipelines as P

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("r14abstores", sf_dir=SF)
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

    # override knob threaded through the module-level helper: the
    # *_once runners call P._run_to_memory by module attribute, so a
    # wrapper can re-size their hardcoded state_partitions per sample
    orig = P._run_to_memory
    override: list = [None]

    def patched(agg, output_mode, state_partitions=None):
        sp = override[0] if override[0] is not None else state_partitions
        return orig(agg, output_mode, state_partitions=sp)

    P._run_to_memory = patched

    def fingerprint(rows) -> tuple:
        return (len(rows),
                hash(tuple(sorted(tuple(str(v) for v in r) for r in rows))))

    # warm both variants once at sf0.001 (codegen, staged splits)
    for q in QUERIES:
        for sp in (8, 4):
            override[0] = sp
            qs[q](spark, "/root/testdata/sf0.001").collect()
            drop_blocks()

    out: dict = {"sf": 0.1, "rounds": rounds, "samples": {},
                 "fingerprints": {}, "load": []}
    for q in QUERIES:
        out["samples"][q] = {"8": [], "4": []}
    for rnd in range(rounds):
        out["load"].append(os.getloadavg())
        for q in QUERIES:
            for sp in (8, 4) if rnd % 2 == 0 else (4, 8):
                override[0] = sp
                t0 = time.time()
                rows = qs[q](spark, SF).collect()
                dt = round(time.time() - t0, 3)
                drop_blocks()
                out["samples"][q][str(sp)].append(dt)
                fp = fingerprint(rows)
                key = f"{q}:{sp}"
                prev = out["fingerprints"].get(q)
                if prev is None:
                    out["fingerprints"][q] = {"fp": list(fp), "equal": True}
                elif list(fp) != prev["fp"]:
                    prev["equal"] = False
                    prev[key] = list(fp)
                print(f"r{rnd} {q} sp={sp}: {dt}s rows={fp[0]}",
                      flush=True)
    out["load"].append(os.getloadavg())
    with open("r14_ab_agg_stores.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({q: out["samples"][q] for q in QUERIES}))
    eq = all(v.get("equal") for v in out["fingerprints"].values())
    print("VALUES_EQUAL:", eq)


if __name__ == "__main__":
    main()
