"""Round-13 measurement session (one Spark JVM, interleaved samples).

Steady-band re-pin of the three code-unchanged r12 local bench movers
(r12 verdict item 3): p11_json_extraction (0.39→1.08),
p4_history_features (0.52→1.14), p7_review_candidates (0.79→1.29) at
sf0.1.  None of their source files (plans/relational.py,
plans/history.py) changed in r12 (`git diff eb17d25..HEAD`), so the
prior is co-tenant noise; the protocol is the repo's standard one:
five samples each, round-robin interleaved within ONE session,
loadavg logged per sample, codegen pre-warmed at sf0.001.

Prints one JSON blob at the end; progress lines to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"


def log(msg: str) -> None:
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]}",
          file=sys.stderr, flush=True)


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r13measure", sf_dir=SF01)
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
    for t in ("events", "documents", "orders", "lineitem", "customer"):
        spark.read.parquet(os.path.join(SF01, f"{t}.parquet")).count()

    def sample(name: str, sf: str) -> tuple[float, int]:
        t0 = time.time()
        rows = len(qs[name](spark, sf).collect())
        dt = round(time.time() - t0, 2)
        drop_blocks()
        log(f"{name}@{os.path.basename(sf)}: {dt}s rows={rows}")
        return dt, rows

    movers = ["p11_json_extraction", "p4_history_features",
              "p7_review_candidates"]
    for m in movers:  # codegen warm (small sf)
        qs[m](spark, "/root/testdata/sf0.001").collect()
        drop_blocks()
    pins: dict[str, list[float]] = {m: [] for m in movers}
    for rep in range(5):
        for m in movers:
            dt, _ = sample(m, SF01)
            pins[m].append(dt)
    out["mover_pins_sf01"] = pins
    out["load_end"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
