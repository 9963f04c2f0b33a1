"""sf10 proof of the watermark-bounded sessionize harness (r10 verdict
item 5): the one-shot complete-mode run GC-killed an 8 GiB JVM at sf10
(~10M session rows through the state stores in ONE availableNow batch;
BASELINE r10).  This script runs ``sessionize_bounded_once`` over the
same corpus in N chronological micro-batches on a DEFAULT 8 GiB heap
(no SPARK_GRAFT_DRIVER_MEM), parquet sink, and value-digests the result
against the batch lag/cumsum sessionization in the same session.

Usage: python scripts/r11_sessionize_bounded.py [sf_dir] [n_batches]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.streaming import pipelines as SP

    assert not os.environ.get("SPARK_GRAFT_DRIVER_MEM"), \
        "unset SPARK_GRAFT_DRIVER_MEM — this proof runs on the default heap"
    spark = get_spark("r11sessbnd")  # no sf_dir: default 8g heap
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {
        "sf_dir": sf_dir, "n_batches": n_batches,
        "driver_memory": spark.conf.get("spark.driver.memory"),
        "load_start": [round(x, 2) for x in os.getloadavg()],
    }

    def digest(df):
        d = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_events").alias("sum_events"),
            F.sum(F.xxhash64(
                "user_id",
                F.unix_micros("session_start"),
                F.unix_micros("session_end"),
                "n_events").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return {"n": d["n"], "sum_events": d["sum_events"], "h": str(d["h"])}

    sink = os.path.join("/tmp", "opr_sessbnd_sink")
    t0 = time.time()
    stream_df = SP.sessionize_bounded_once(spark, sf_dir, n_batches,
                                           sink_dir=sink)
    out["stream_digest"] = digest(stream_df)
    out["stream_wall_s"] = round(time.time() - t0, 1)
    prog = SP._LAST_STREAM_PROGRESS[0]
    out["last_batch_id"] = prog["batchId"]
    out["final_state_rows"] = prog["stateOperators"][0]["numRowsTotal"]

    # batch equivalent: lag/cumsum islands, end = max ts + 30 min
    t0 = time.time()
    ev = (spark.read.parquet(os.path.join(sf_dir, "events.parquet")))
    from openplacereviews_db_spark.sources.testdata import normalize_events_ts
    ev = normalize_events_ts(ev).select(
        "user_id", F.unix_micros("ts").alias("ts_us"))
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us")
    isl = (ev.withColumn("new_s", (F.col("ts_us") - F.lag("ts_us").over(w)
                                   > gap_us).cast("int"))
           .withColumn("island", F.sum(F.coalesce("new_s", F.lit(0)))
                       .over(w)))
    sess = (isl.groupBy("user_id", "island")
            .agg(F.timestamp_micros(F.min("ts_us")).alias("session_start"),
                 F.timestamp_micros(F.max("ts_us") + gap_us)
                 .alias("session_end"),
                 F.count(F.lit(1)).alias("n_events")))
    out["batch_digest"] = digest(sess)
    out["batch_wall_s"] = round(time.time() - t0, 1)
    out["match"] = out["stream_digest"] == out["batch_digest"]
    out["load_end"] = [round(x, 2) for x in os.getloadavg()]
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
