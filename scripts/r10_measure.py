"""Round-10 measurement session (one Spark JVM, interleaved samples):

1. Steady-band re-pin of the three r9 bench movers (verdict item 2):
   dd_containment, dd_blocks, tx_decontaminate at sf0.1 — all three
   code-unchanged since r6/r8, each drifted >1.5x in the r9 definitive
   run under loadavg 6.7.  Five samples each, round-robin interleaved,
   loadavg logged per sample per the co-tenant protocol.

2. Second measured decade (verdict item 3): the five heaviest kernels
   — dd_minhash_lsh, dd_dup_groups, st_neardup_pairs, mm_phash_groups,
   m9_apply_changelog — at sf1 (10x) AND sf10 (100x, built by
   ``make_sf1.py /root/testdata/sf0.1 /tmp/opr_sf10 100``), 2 reps
   each at sf10 (rep 2 = steady, past at-scale JIT), 1 rep at sf1
   (band already pinned r6-r9).  A plan with a superlinear term shows
   a decade-over-decade wall ratio well above the first decade's.

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
SF10 = "/tmp/opr_sf10"


def log(msg: str) -> None:
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]}",
          file=sys.stderr, flush=True)


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r10measure", sf_dir=SF10)  # largest decade it reads
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out: dict = {"load_start": [round(x, 2) for x in os.getloadavg()]}

    def drop_blocks() -> None:
        import gc
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    def _echo(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(_echo, "id long").count()
    for sf in (SF01, SF1, SF10):
        for t in ("documents", "orders", "lineitem"):
            spark.read.parquet(os.path.join(sf, f"{t}.parquet")).count()

    def sample(name: str, sf: str) -> tuple[float, int]:
        t0 = time.time()
        rows = len(qs[name](spark, sf).collect())
        dt = round(time.time() - t0, 2)
        drop_blocks()
        log(f"{name}@{os.path.basename(sf)}: {dt}s rows={rows}")
        return dt, rows

    # ---- part 1: interleaved re-pin of the three r9 movers ----------
    movers = ["dd_containment", "dd_blocks", "tx_decontaminate"]
    for m in movers:  # codegen warm (small sf)
        qs[m](spark, "/root/testdata/sf0.001").collect()
        drop_blocks()
    pins: dict[str, list[float]] = {m: [] for m in movers}
    for rep in range(5):
        for m in movers:
            dt, _ = sample(m, SF01)
            pins[m].append(dt)
    out["mover_pins_sf01"] = pins
    out["load_after_pins"] = [round(x, 2) for x in os.getloadavg()]

    # ---- part 2: the second decade -----------------------------------
    heavies = ["dd_minhash_lsh", "dd_dup_groups", "st_neardup_pairs",
               "mm_phash_groups", "m9_apply_changelog"]
    decade: dict[str, dict] = {h: {} for h in heavies}
    for h in heavies:
        dt, rows = sample(h, SF1)
        decade[h]["sf1"] = {"sec": dt, "rows": rows}
    for rep in range(2):
        for h in heavies:
            dt, rows = sample(h, SF10)
            decade[h].setdefault("sf10", []).append(
                {"sec": dt, "rows": rows})
    out["decade"] = decade
    out["load_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
