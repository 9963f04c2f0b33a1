"""Round-14 at-scale streaming evidence (r13 verdict item 6):
st_scd2_upsert and st_stream_join over an sf10-scale MULTI-batch feed.

- scd2: the sf10 events table (10M rows) staged as EIGHT time-octile
  micro-batches through the real ``scd2_upsert_batch`` foreachBatch
  MERGE; per-batch walls from the progress log show cost tracking
  (open versions ∪ batch), and the final snapshot is proven equal to
  the one-shot batch build (x71_scd2_build) by count + per-column
  fingerprint in the same session.
- stream-join: the same 8 chronological slices fed to BOTH sides of
  the watermarked interval join (views = even event_ids, clicks = odd)
  with a TIGHT 1-hour watermark delay (vs the contract query's
  span-exceeding 40 days) — delay > the 10-min join window, so the
  result still equals the batch join exactly while per-batch
  stateOperators rows stay ~constant instead of accumulating the
  corpus: the watermark-bounded-state evidence.

Usage: python scripts/r14_streaming_sf10.py [sf10_dir] [out.json]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]}",
          file=sys.stderr, flush=True)


def _stage_events_octiles(sf_dir: str) -> tuple[str, str]:
    """Write-once staging of events as 8 time-octile parquet files
    (ts pre-normalized to epoch-micros BIGINT), sequence-prefixed and
    mtime-pinned; cache keyed on source mtime+size."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from openplacereviews_db_spark.streaming.pipelines import (
        _mark_stage_complete, _pin_batch_order, _prune_stale_stage,
        _stage_is_complete)

    src_parquet = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src_parquet)
    tag = (f"v1_{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{int(st.st_mtime)}_{st.st_size}")
    root = os.path.join(tempfile.gettempdir(), "opr_spark_stage",
                        f"oct8_{tag}")
    src = os.path.join(root, "src")
    if not _stage_is_complete(root):
        shutil.rmtree(src, ignore_errors=True)
        t = pq.read_table(src_parquet, columns=[
            "event_id", "user_id", "event_type", "ts"])
        ts_us = pc.cast(pc.cast(t["ts"], pa.timestamp("us"), safe=False),
                        pa.int64())
        t = t.drop_columns(["ts"]).append_column("ts_us", ts_us)
        lo = pc.min(t["ts_us"]).as_py()
        hi = pc.max(t["ts_us"]).as_py() + 1
        os.makedirs(src, exist_ok=True)
        paths = []
        for i in range(8):
            a = lo + (hi - lo) * i // 8
            b = lo + (hi - lo) * (i + 1) // 8
            mask = pc.and_(pc.greater_equal(t["ts_us"], a),
                           pc.less(t["ts_us"], b))
            p = os.path.join(src, f"{i:05d}_batch.parquet")
            pq.write_table(t.filter(mask), p)
            paths.append(p)
        _pin_batch_order(*paths)
        _mark_stage_complete(root, tag)
    else:
        _prune_stale_stage(root, tag)
    return root, src


def _batch_progress(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        row = {"batch": p["batchId"], "rows": p["numInputRows"],
               "wall_s": round(p["durationMs"]["triggerExecution"] / 1e3,
                               1)}
        ops = p.get("stateOperators") or []
        if ops:
            row["state_rows"] = sum(o.get("numRowsTotal", 0) for o in ops)
            row["state_mb"] = round(sum(
                o.get("memoryUsedBytes", 0) for o in ops) / 2**20, 1)
        out.append(row)
    return out


def run_scd2(spark, sf_dir: str) -> dict:
    import glob

    from pyspark.sql import functions as F

    from openplacereviews_db_spark.streaming.pipelines import (
        scd2_upsert_batch)

    root, src = _stage_events_octiles(sf_dir)
    snap_dir = os.path.join(root, "snapshot")
    chk_dir = os.path.join(root, "chk")
    stale = [snap_dir, chk_dir, snap_dir + ".old"]
    stale += glob.glob(snap_dir + ".epoch-*")
    for d in stale:
        shutil.rmtree(d, ignore_errors=True)

    events = (spark.readStream.format("parquet")
              .schema("event_id long, user_id long, event_type string, "
                      "ts_us long")
              .option("maxFilesPerTrigger", 1).load(src))
    t0 = time.time()
    q = (events.writeStream.foreachBatch(scd2_upsert_batch(snap_dir))
         .option("checkpointLocation", chk_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = round(time.time() - t0, 1)
    snap = spark.read.parquet(snap_dir)
    def fingerprint(dim):
        # modular terms: an ANSI SUM of raw epoch-micros over ~5M
        # versions overflows BIGINT
        return dim.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_events").alias("sum_ev"),
            F.sum(F.col("user_id") * F.col("version")).alias("sum_uv"),
            F.sum(F.col("eff_from_us") % 1_000_003).alias("sum_from_mod"),
            F.sum(F.coalesce(F.col("eff_to_us"), F.lit(0)) % 1_000_003)
            .alias("sum_to_mod"),
            F.sum(F.when(F.col("is_current") == 1, 1).otherwise(0))
            .alias("n_open")).collect()[0].asDict()

    fp_stream = fingerprint(snap)

    # one-shot batch build over the SAME normalized feed — the x71
    # collapse (plans/temporal.py:x71_scd2_build) applied to the staged
    # octiles read as a single batch
    from pyspark.sql.window import Window
    rows = (spark.read.parquet(src)
            .select("user_id", "event_id", "event_type", "ts_us"))
    w_ord = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("event_type").over(w_ord)
    flagged = rows.withColumn(
        "chg", F.when(prev.isNull() | (prev != F.col("event_type")),
                      F.lit(1)).otherwise(F.lit(0)))
    versioned = flagged.withColumn(
        "version", F.sum("chg").over(
            w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)))
    grouped = (versioned.groupBy("user_id", "version", "event_type")
               .agg(F.min("ts_us").alias("eff_from_us"),
                    F.count(F.lit(1)).alias("n_events")))
    w_v = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("eff_from_us").over(w_v)
    batch_dim = grouped.select(
        "user_id", "version", "event_type", "eff_from_us",
        nxt.alias("eff_to_us"), "n_events",
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0))
        .alias("is_current"))
    fp_batch = fingerprint(batch_dim)
    return {"wall_s": wall, "batches": _batch_progress(q),
            "snapshot_rows": fp_stream["n"],
            "fingerprint_equal": fp_stream == fp_batch,
            "fp_stream": {k: int(v) for k, v in fp_stream.items()},
            "fp_batch": {k: int(v) for k, v in fp_batch.items()}}


def run_stream_join(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    root, src = _stage_events_octiles(sf_dir)
    schema = "event_id long, user_id long, event_type string, ts_us long"

    def side(parity: int, id_alias: str, ts_alias: str,
             user_alias: str):
        s = (spark.readStream.format("parquet").schema(schema)
             .option("maxFilesPerTrigger", 1).load(src))
        return (s.where(F.col("event_id") % 2 == parity)
                .select(F.col("user_id").alias(user_alias),
                        F.col("event_id").alias(id_alias),
                        F.timestamp_micros(F.col("ts_us"))
                        .alias(ts_alias))
                # TIGHT watermark: 1 h > the 10-min join window, and
                # the octile feed is chronologically ordered, so the
                # result is still EXACT while state stays ~1 h deep
                .withWatermark(ts_alias, "1 hour"))

    views = side(0, "view_id", "view_ts", "v_user")
    clicks = side(1, "click_id", "click_ts", "c_user")
    joined = views.join(
        clicks,
        F.expr("v_user = c_user AND click_ts >= view_ts "
               "AND click_ts <= view_ts + interval 10 minutes"))
    out = joined.select("v_user", "view_id", "click_id")

    chk = os.path.join(root, "sj_chk")
    sink = os.path.join(root, "sj_out")
    for d in (chk, sink):
        shutil.rmtree(d, ignore_errors=True)
    # few state stores for the availableNow harness (the r9 st_stream
    # join lesson: shuffle partitions = state-store count)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        t0 = time.time()
        q = (out.writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", chk)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = round(time.time() - t0, 1)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    n_stream = spark.read.parquet(sink).count()
    # batch reference join in the same session
    ev = spark.read.parquet(src)
    v = (ev.where(F.col("event_id") % 2 == 0)
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts_us").alias("v_us")))
    c = (ev.where(F.col("event_id") % 2 == 1)
         .select(F.col("user_id").alias("c_user"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts_us").alias("c_us")))
    n_batch = (v.join(c, (F.col("v_user") == F.col("c_user"))
                      & (F.col("c_us") >= F.col("v_us"))
                      & (F.col("c_us") <= F.col("v_us") + 600_000_000))
               .count())
    return {"wall_s": wall, "batches": _batch_progress(q),
            "n_stream": n_stream, "n_batch": n_batch,
            "exact": n_stream == n_batch}


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf10"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")

    from openplacereviews_db_spark.session import get_spark, release_shuffles

    spark = get_spark("r14_streaming", shuffle_partitions=32,
                      sf_dir=sf10)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf_dir": sf10,
                     "load_start": [round(x, 2) for x in os.getloadavg()]}
    for fam, runner in (("st_scd2_upsert", run_scd2),
                        ("st_stream_join", run_stream_join)):
        try:
            entry = runner(spark, sf10)
        except Exception as ex:
            entry = {"error": f"{type(ex).__name__}: {ex}"[:300]}
        freed = release_shuffles(spark, settle_s=30.0)
        entry["freed_mb"] = round(freed / 2**20, 1)
        results[fam] = entry
        log(f"{fam}: {json.dumps(entry)[:300]}")
    results["load_end"] = [round(x, 2) for x in os.getloadavg()]
    blob = json.dumps(results)
    print(blob)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(blob)


if __name__ == "__main__":
    main()
