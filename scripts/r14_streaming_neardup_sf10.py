"""r14: re-prove the at-scale streaming-dedup property on THIS round's
code — the r13 "per-batch cost tracks the batch" evidence
(62.8/69.1/66.1/39.2 s per batch, r13_sf100_session.json) was measured
on the pre-r14 twin bands/+sets index layout with the inline verify;
r14 replaced that with ONE epoch-partitioned state table, the shared
tiered int16 verify, and batch-derived foreachBatch shuffle
partitions.  Same harness as r13 (scripts/r13_sf100.py): the sf10
documents corpus (500k docs) split into four doc_id%4 micro-batches
through the real ``neardup_dedup_stream`` / ``exact_dedup_stream``;
per-batch walls from the progress log, index growth from du.

Usage: python scripts/r14_streaming_neardup_sf10.py [sf10_dir] [out.json]
(sf10_dir defaults to /tmp/opr_sf10 — regenerate with
``make_sf1.py /root/testdata/sf0.1 /tmp/opr_sf10 100`` first.)
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else None


def _load_r13():
    spec = importlib.util.spec_from_file_location(
        "r13_sf100", os.path.join(REPO, "scripts", "r13_sf100.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    r13 = _load_r13()
    from openplacereviews_db_spark import session as S
    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.streaming.pipelines import (
        _batch_shuffle_partitions)

    spark = get_spark("r14ndsf10", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf_dir": SF, "load_start":
                     [round(x, 2) for x in os.getloadavg()]}
    root, src = r13._stage_doc_4split(SF)
    results["stage_root"] = root
    # the production runner's conf discipline (neardup_once): size the
    # foreachBatch shuffles to the BATCH, restore after the stream
    before = spark.conf.get("spark.sql.shuffle.partitions")
    parts = _batch_shuffle_partitions(spark, src)
    results["batch_shuffle_partitions"] = parts
    runs = []
    for fam, runner in (("st_neardup_pairs", r13._run_neardup_4batch),
                        ("st_exact_dedup", r13._run_exactdd_4batch)):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        t0 = time.time()
        try:
            entry = {"family": fam, **runner(spark, SF)}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", before)
        entry["load"] = [round(x, 2) for x in os.getloadavg()]
        runs.append(entry)
        print(f"# {fam}: {json.dumps(entry)}", file=sys.stderr, flush=True)
        S.release_shuffles(spark)
        print(f"# release_shuffles done ({time.time() - t0:.0f}s total)",
              file=sys.stderr, flush=True)
    results["streaming"] = runs
    blob = json.dumps(results)
    print(blob)
    if OUT:
        with open(OUT, "w") as fh:
            fh.write(blob)


if __name__ == "__main__":
    main()
