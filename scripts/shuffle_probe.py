"""Run one contract query and report its shuffle anatomy.

Usage: python scripts/shuffle_probe.py <query> [sf_dir] [out.json]

Measures, for a single query run in a fresh session:
- peak LIVE bytes in the session's blockmgr dirs (2 Hz du watch) —
  the single-box disk footprint the sf100 decade is bounded by;
- per-stage shuffle write / read bytes from the status REST API,
  sorted by write bytes, with the stage's first non-framework call
  site so the term maps back to a plan operator.

This is the measurement behind BASELINE.md's dd_minhash_lsh
disk-wall arithmetic (r11: 25.3 GB live at sf10 with string verify
sets, 16.5 GB with xxhash64 ids).
"""
from __future__ import annotations

import json
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _du_bytes(paths: list[str]) -> int:
    if not paths:
        return 0
    out = subprocess.run(["du", "-sb", "--", *paths],
                         capture_output=True, text=True).stdout
    return sum(int(line.split("\t")[0]) for line in out.splitlines() if line)


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    import os
    # the per-stage REST metrics ARE this script's output — force the
    # UI on unless the caller explicitly disabled it; at-scale probes
    # run disk-bound, so default the shuffle codec to zstd (bytes beat
    # the compress-wall the bench-scale lz4 default avoids)
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    # at sf100 the banded SHJ build sides want more, smaller partitions
    # (32 x 440 MB concurrent builds crowd even the 48 g auto heap)
    nparts = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    # snapshot the blockmgr dirs that already exist: stale dirs from
    # crashed sessions must not count toward THIS query's live peak
    local_root = Path("/tmp")
    pre_existing = {str(p) for p in local_root.glob("blockmgr-*")}
    spark = get_spark("shuffle_probe", shuffle_partitions=nparts,
                      sf_dir=sf_dir)
    sc = spark.sparkContext

    peak = {"bytes": 0, "t": 0.0}
    stop = threading.Event()
    t0 = time.time()

    def watch() -> None:
        while not stop.is_set():
            dirs = [str(p) for p in local_root.glob("blockmgr-*")
                    if str(p) not in pre_existing]
            b = _du_bytes(dirs)
            if b > peak["bytes"]:
                peak.update(bytes=b, t=time.time() - t0)
            stop.wait(0.5)

    th = threading.Thread(target=watch, daemon=True)
    th.start()

    qs = entrymod.queries()
    t_run = time.time()
    n_rows = qs[name](spark, sf_dir).count()
    wall = time.time() - t_run
    stop.set()
    th.join(timeout=3)

    ui = sc.uiWebUrl
    stages = []
    app_id = None  # bound only if the /applications fetch succeeds
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages") as r:
            for s in json.load(r):
                if s.get("shuffleWriteBytes", 0) or s.get(
                        "shuffleReadBytes", 0):
                    site = s.get("details", "").splitlines()
                    site = next((ln.strip() for ln in site
                                 if "openplacereviews_db_spark" in ln
                                 or "shuffle_probe" in ln), "")
                    stages.append({
                        "stage": s["stageId"],
                        "name": s.get("name", "")[:80],
                        "run_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                        "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
                        "write_mb": round(s["shuffleWriteBytes"] / 2**20, 1),
                        "write_rec": s.get("shuffleWriteRecords", 0),
                        "read_mb": round(s["shuffleReadBytes"] / 2**20, 1),
                        "read_rec": s.get("shuffleReadRecords", 0),
                        "spill_disk_mb": round(
                            s.get("diskBytesSpilled", 0) / 2**20, 1),
                        "site": site,
                    })
    except Exception as e:  # REST UI may be disabled; the du watch stands
        stages = [{"error": str(e)}]
    stages.sort(key=lambda s: -(s.get("write_mb", 0) or 0))

    # per-plan-node metrics from the SQL tab: maps the byte terms back
    # to named operators (Exchange inputs, join probe rows, ...)
    sql_nodes = []
    try:
        if app_id is None:
            # the /applications fetch failed above; report THAT, not a
            # misleading NameError from an unbound app_id (r11 ADVICE)
            raise RuntimeError("skipped: stage fetch failed, app id unknown")
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/sql?details=true"
                "&planDescription=false&length=50") as r:
            execs = json.load(r)
        ex = max(execs, key=lambda e: e.get("duration", 0))
        for node in ex.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            keep = {}
            for k in ("shuffle bytes written", "number of output rows",
                      "data size", "spill size"):
                if k in mets:
                    keep[k] = mets[k]
            if keep.get("shuffle bytes written") or (
                    "number of output rows" in keep):
                sql_nodes.append({
                    "node": f'{node.get("nodeId")}:{node.get("nodeName")}',
                    **keep})
    except Exception as e:
        sql_nodes = [{"error": str(e)}]

    # freed-bytes check (r11 verdict item 4): after the query, the
    # session must be able to hand its shuffle files back — this is
    # what makes multi-query at-scale sessions disk-safe
    from openplacereviews_db_spark.session import (blockmgr_bytes,
                                                   release_shuffles)
    resident_mb = round(blockmgr_bytes(spark) / 2**20, 1)
    freed_mb = round(release_shuffles(spark) / 2**20, 1)

    result = {
        "query": name, "sf_dir": sf_dir, "rows": n_rows,
        "wall_s": round(wall, 1),
        "peak_live_shuffle_mb": round(peak["bytes"] / 2**20, 1),
        "peak_at_s": round(peak["t"], 1),
        "total_write_mb": round(
            sum(s.get("write_mb", 0) or 0 for s in stages), 1),
        "resident_after_mb": resident_mb,
        "freed_mb": freed_mb,
        "resident_final_mb": round(blockmgr_bytes(spark) / 2**20, 1),
        "stages": stages[:20],
        "sql_nodes": sql_nodes,
    }
    print(json.dumps(result, indent=1))
    if out_path:
        Path(out_path).write_text(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
