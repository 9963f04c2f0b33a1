"""r14: DataFrame-CONSTRUCTION time sweep over every contract query.

Times qs[name](spark, sf_dir) alone (no action) — for lazy plans this
is py4j + eager analysis cost; for eager builders it includes their
staging jobs.  Second sample per query exposes one-time vs steady
construction cost.  Output: JSON {name: [t1, t2]} sorted desc.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14build", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    import gc

    def drop_blocks() -> None:
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    out: dict[str, list[float]] = {}
    for name, fn in qs.items():
        ts = []
        for _ in range(2):
            t0 = time.time()
            try:
                fn(spark, SF)
            except Exception as ex:
                print(f"# {name} FAILED: {ex}", file=sys.stderr)
                break
            ts.append(round(time.time() - t0, 3))
            drop_blocks()
        out[name] = ts
        print(f"# {name}: {ts}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps(dict(sorted(out.items(),
                                 key=lambda kv: -min(kv[1] or [0])))))


if __name__ == "__main__":
    main()
