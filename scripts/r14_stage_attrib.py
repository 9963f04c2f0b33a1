"""r14 probe: per-stage attribution of the 32-vs-12 shuffle-partition
delta on one query (default dd_ngram_jaccard).

Runs the query alternately at the two partition counts in ONE session
with the UI on, snapshots the status REST API's stage list after each
run, and reports per-run stage anatomy: count, total duration (wall
between submission and completion), total executorRunTime, and
scheduler overhead (duration - runTime/parallelism), grouped by call
site.  This tells round 2 WHERE the task-constant tail lives — stage
launch constants, exchange write/read, or AQE re-planning gaps.

Usage: python scripts/r14_stage_attrib.py [query] [rounds] [small]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "1")


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    name = sys.argv[1] if len(sys.argv) > 1 else "dd_ngram_jaccard"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    small = sys.argv[3] if len(sys.argv) > 3 else "12"
    SF = "/root/testdata/sf0.1"
    spark = get_spark("r14attrib", sf_dir=SF)
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

    qs[name](spark, "/root/testdata/sf0.001").collect()  # warm
    drop_blocks()

    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]

    def stage_ids() -> set:
        return {(s["stageId"], s["attemptId"])
                for s in _get(f"{ui}/api/v1/applications/{app}/stages")}

    base = spark.conf.get("spark.sql.shuffle.partitions")
    out = {"query": name, "variants": {base: [], small: []}}
    try:
        for rnd in range(rounds):
            order = (base, small) if rnd % 2 == 0 else (small, base)
            for sp in order:
                spark.conf.set("spark.sql.shuffle.partitions", sp)
                seen = stage_ids()
                t0 = time.time()
                qs[name](spark, SF).collect()
                wall = round(time.time() - t0, 3)
                drop_blocks()
                stages = [s for s in _get(
                    f"{ui}/api/v1/applications/{app}/stages?status=complete")
                    if (s["stageId"], s["attemptId"]) not in seen]
                by_site: dict = {}
                tot_run = tot_tasks = 0
                for s in stages:
                    site = (s.get("description") or s["name"]).split("\n")[0]
                    site = site.split(" at ")[-1][:48]
                    d = by_site.setdefault(site, [0, 0.0, 0])
                    d[0] += 1
                    d[1] += s.get("executorRunTime", 0) / 1000.0
                    d[2] += s.get("numCompleteTasks", 0)
                    tot_run += s.get("executorRunTime", 0) / 1000.0
                    tot_tasks += s.get("numCompleteTasks", 0)
                rec = {"wall": wall, "n_stages": len(stages),
                       "n_tasks": tot_tasks,
                       "executor_run_s_total": round(tot_run, 2),
                       "by_site": {k: {"stages": v[0],
                                       "run_s": round(v[1], 2),
                                       "tasks": v[2]}
                                   for k, v in sorted(
                                       by_site.items(),
                                       key=lambda kv: -kv[1][1])}}
                out["variants"][sp].append(rec)
                print(f"r{rnd} parts={sp}: wall={wall}s "
                      f"stages={len(stages)} tasks={tot_tasks} "
                      f"run={rec['executor_run_s_total']}s", flush=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    with open(f"r14_stage_attrib_{name}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("written", f"r14_stage_attrib_{name}.json")


if __name__ == "__main__":
    main()
