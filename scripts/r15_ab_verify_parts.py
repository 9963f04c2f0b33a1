"""r15 item 1 A/B: bytes-derived per-exchange pinning on the dedup
verifies (dd_ngram_jaccard / dd_containment / dd_incremental).

One session, contract core count; variants interleaved per round so
both see the same capacity weather:
  - "off":  SPARK_GRAFT_VERIFY_SHUFFLE=0  -> pinning disabled (the r14
            session-partitioned plans, byte-identical to HEAD-1)
  - "on":   env unset -> sizing.small_exchange_parts derives the count
            (8 at sf0.1)

Records wall, rows, a STABLE sha256 value fingerprint (r14 ADVICE: no
salted hash()), and per-run stage anatomy (stages / tasks / summed
executorRunTime) from the UI REST API — the load-independent
instrument the r14 verdict asks for.

Usage: python scripts/r15_ab_verify_parts.py [rounds]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_UI", "1")

SF = "/root/testdata/sf0.1"
QUERIES = ["dd_ngram_jaccard", "dd_containment", "dd_incremental"]


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def fingerprint(rows) -> tuple[int, str]:
    blob = "\n".join(sorted(",".join(str(v) for v in r) for r in rows))
    return len(rows), hashlib.sha256(blob.encode()).hexdigest()[:16]


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("r15abverify", sf_dir=SF)
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

    for q in QUERIES:  # warm codegen + staged artifacts, both variants
        for env in ("0", None):
            if env is None:
                os.environ.pop("SPARK_GRAFT_VERIFY_SHUFFLE", None)
            else:
                os.environ["SPARK_GRAFT_VERIFY_SHUFFLE"] = env
            qs[q](spark, "/root/testdata/sf0.001").collect()
            drop_blocks()

    ui = spark.sparkContext.uiWebUrl
    app = _get(f"{ui}/api/v1/applications")[0]["id"]

    def stage_ids() -> set:
        return {(s["stageId"], s["attemptId"])
                for s in _get(f"{ui}/api/v1/applications/{app}/stages")}

    out: dict = {"sf": 0.1, "rounds": rounds, "cores": n,
                 "samples": {q: {"off": [], "on": []} for q in QUERIES},
                 "stages": {q: {"off": [], "on": []} for q in QUERIES},
                 "fingerprints": {}, "load": []}
    try:
        for rnd in range(rounds):
            out["load"].append(os.getloadavg())
            for q in QUERIES:
                order = ("off", "on") if rnd % 2 == 0 else ("on", "off")
                for variant in order:
                    if variant == "off":
                        os.environ["SPARK_GRAFT_VERIFY_SHUFFLE"] = "0"
                    else:
                        os.environ.pop("SPARK_GRAFT_VERIFY_SHUFFLE", None)
                    seen = stage_ids()
                    t0 = time.time()
                    rows = qs[q](spark, SF).collect()
                    dt = round(time.time() - t0, 3)
                    drop_blocks()
                    stages = [s for s in _get(
                        f"{ui}/api/v1/applications/{app}/stages"
                        f"?status=complete")
                        if (s["stageId"], s["attemptId"]) not in seen]
                    anat = {
                        "n_stages": len(stages),
                        "n_tasks": sum(s.get("numCompleteTasks", 0)
                                       for s in stages),
                        "run_s": round(sum(s.get("executorRunTime", 0)
                                           for s in stages) / 1000.0, 2),
                        "cpu_s": round(sum(s.get("executorCpuTime", 0)
                                           for s in stages) / 1e9, 2),
                    }
                    out["samples"][q][variant].append(dt)
                    out["stages"][q][variant].append(anat)
                    fp = fingerprint(rows)
                    prev = out["fingerprints"].get(q)
                    if prev is None:
                        out["fingerprints"][q] = {
                            "rows": fp[0], "sha": fp[1], "equal": True}
                    elif fp[1] != prev["sha"] or fp[0] != prev["rows"]:
                        prev["equal"] = False
                        prev[f"r{rnd}:{variant}"] = list(fp)
                    print(f"r{rnd} {q} {variant}: {dt}s rows={fp[0]} "
                          f"tasks={anat['n_tasks']} run={anat['run_s']}s "
                          f"cpu={anat['cpu_s']}s", flush=True)
    finally:
        os.environ.pop("SPARK_GRAFT_VERIFY_SHUFFLE", None)
    out["load"].append(os.getloadavg())
    with open("r15_ab_verify_parts.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("VALUES_EQUAL:",
          all(v.get("equal") for v in out["fingerprints"].values()))


if __name__ == "__main__":
    main()
