"""Round-12 measurement session (one Spark JVM, interleaved samples).

Steady-band re-pin of the four r11 driver-bench movers (r11 verdict
item 2): g11_triangle_count (2.44→3.63), w2_event_deltas (0.78→1.72),
g9_pagerank (2.74→3.55), tx_bpe_vocab (1.87→2.38) at sf0.1.  w2's code
did not change in r11 at all; g11/g9 changed only the synthetic grid
constant; tx_bpe_vocab is code-unchanged since r9 — so the prior is
co-tenant noise (driver loadavg was 5-6.7 during the r11 run), and the
protocol is the repo's standard one: five samples each, round-robin
interleaved within ONE session, loadavg logged per sample, codegen
pre-warmed at sf0.001.

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

    spark = get_spark("r12measure", sf_dir=SF01)
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

    movers = ["g11_triangle_count", "w2_event_deltas", "g9_pagerank",
              "tx_bpe_vocab"]
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
