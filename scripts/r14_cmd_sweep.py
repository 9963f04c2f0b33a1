"""r14: py4j COMMAND-COUNT sweep over every contract query's builder.

On this box the py4j round trip is ~5 ms (Firecracker guest), so plan
construction is RTT-bound and the command count is the deterministic,
load-independent proxy for build cost (item 11's metric).  Counts
commands issued while qs[name](spark, sf_dir) runs (no action); two
samples per query — sample 1 may include one-time staging, sample 2 is
the steady per-bench-build count.

Usage: python scripts/r14_cmd_sweep.py [sf_dir] [out.json]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "r14_cmd_sweep.json"

COUNTER = {"n": 0}


def _patch_send_command() -> None:
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    for cls in (cs.ClientServerConnection, jg.GatewayConnection):
        orig = cls.send_command

        def patched(self, *a, _orig=orig, **k):
            COUNTER["n"] += 1
            return _orig(self, *a, **k)

        cls.send_command = patched


def main() -> None:
    _patch_send_command()
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14cmd", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def drop_blocks() -> None:
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    out: dict[str, dict] = {}
    for name, fn in qs.items():
        counts, walls = [], []
        for _ in range(2):
            drop_blocks()
            n0, t0 = COUNTER["n"], time.time()
            try:
                fn(spark, SF)
            except Exception as ex:
                out[name] = {"error": f"{type(ex).__name__}: {ex}"[:200]}
                break
            walls.append(round(time.time() - t0, 3))
            counts.append(COUNTER["n"] - n0)
        else:
            out[name] = {"cmds": counts, "wall": walls}
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)

    ranked = dict(sorted(
        ((k, v) for k, v in out.items() if "cmds" in v),
        key=lambda kv: -kv[1]["cmds"][-1]))
    ranked.update({k: v for k, v in out.items() if "cmds" not in v})
    with open(OUT, "w") as fh:
        json.dump(ranked, fh, indent=1)
    top = list(ranked.items())[:25]
    for k, v in top:
        print(k, v)


if __name__ == "__main__":
    main()
