"""r14 phase attribution: for each named query, split wall time into
(build = DataFrame construction incl. eager staging, plan = first
explain, exec = noop-sink execution x2) in ONE warm session.

The noop sink times the computation without the collect/driver
transfer (guide §1.4); two exec samples expose first-run JIT vs
steady state.  Usage:

    python scripts/r14_phase_probe.py q1,q2,... [sf_dir] [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14phase", sf_dir=sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def _echo(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(_echo, "id long").count()
    from openplacereviews_db_spark.sources.testdata import TABLES, load_table
    for t in TABLES:
        load_table(spark, t, sf_dir).count()
    import gc

    def drop_blocks() -> None:
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    # codegen warmup at the smallest sf (bench.py parity)
    warm = "/root/testdata/sf0.001"
    for q in names:
        try:
            qs[q](spark, warm).collect()
        except Exception as ex:
            print(f"# warm {q}: {ex}", file=sys.stderr)
        spark.catalog.clearCache()
    drop_blocks()

    out: dict = {"sf_dir": sf_dir, "phases": {}}
    for q in names:
        spark.sparkContext.setJobDescription(f"phase:{q}")
        t0 = time.time()
        df = qs[q](spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df.explain("formatted")
        t_plan = time.time() - t0
        execs = []
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            execs.append(round(time.time() - t0, 3))
        # rebuild + collect once: the bench-shaped end-to-end number
        drop_blocks()
        t0 = time.time()
        n_rows = len(qs[q](spark, sf_dir).collect())
        t_e2e = time.time() - t0
        drop_blocks()
        out["phases"][q] = {
            "build_s": round(t_build, 3), "plan_s": round(t_plan, 3),
            "noop_s": execs, "e2e_collect_s": round(t_e2e, 3),
            "rows": n_rows,
            "load": [round(x, 2) for x in os.getloadavg()]}
        print(f"# {q}: build={t_build:.2f} plan={t_plan:.2f} "
              f"noop={execs} e2e={t_e2e:.2f} rows={n_rows}",
              file=sys.stderr, flush=True)
    spark.stop()
    blob = json.dumps(out)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(blob)
    print(blob)


if __name__ == "__main__":
    main()
