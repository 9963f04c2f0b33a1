"""Round-13 sf100 (1000x) session — ONE JVM, disk-safe, three verdict
items in one measured run:

- item 2: dd_containment INSIDE the session via the staged-rank-frame
  path (``containment_pairs(stage_dir=...)``) + the int16 tier-1
  projection — the r12 one-box wall was a single 45.9 GB verify
  exchange against 58 GB of /tmp; the session logs /tmp free space
  before/after every kernel so "returns to start" is visible.
- item 4: first sf100 rows for dd_ngram_jaccard, dd_simhash_pairs,
  dd_blocks, mm_phash_groups, tx_tfidf_topk and the curate_corpus
  end-to-end pipeline (each with an sf10 row in the same session for
  the decade ratio / exactly-linear check).
- item 5: at-scale streaming — the sf10 documents corpus split into
  FOUR chronology-pinned micro-batches and run through
  ``neardup_dedup_stream`` and ``exact_dedup_stream``; per-batch
  durations from ``q.recentProgress`` show batch cost tracking the
  BATCH while the persistent index grows 4x (plus final index bytes).

Usage: python scripts/r13_sf100.py [sf_dir] [out.json]
(default /tmp/opr_sf100; the sf10 wave reads /tmp/opr_sf10).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.environ.get("SPARK_GRAFT_SF10", "/tmp/opr_sf10")


def log(msg: str) -> None:
    free_gb = shutil.disk_usage("/tmp").free / 2**30
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]} "
          f"tmp_free={free_gb:.1f}G", file=sys.stderr, flush=True)


def _du_gb(path: str) -> float:
    total = 0
    for base, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(base, f))
            except OSError:
                pass
    return round(total / 2**30, 2)


def main() -> None:
    sf100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf100"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    # sf100 heavies: more, smaller shuffle partitions + zstd codec
    # (disk-bound regime — bytes beat the compress wall), same knobs
    # the r12 session validated
    os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")
    nparts = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.operators import dedup as dd
    from openplacereviews_db_spark.plans.corpus import _docs
    from openplacereviews_db_spark.session import (blockmgr_bytes,
                                                   get_spark,
                                                   release_shuffles)

    spark = get_spark("r13_sf100", shuffle_partitions=nparts,
                      sf_dir=sf100)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    results: dict = {"sf_dir": sf100, "shuffle_partitions": nparts,
                     "load_start": [round(x, 2) for x in os.getloadavg()],
                     "tmp_free_start_gb": round(
                         shutil.disk_usage("/tmp").free / 2**30, 1),
                     "kernels": []}

    cont_stage = os.path.join(tempfile.gettempdir(),
                              "opr_stage_containment_rank")

    def containment_staged(s, sf):
        """dd_containment via the staged-rank-frame path: the rank
        frame lands as zstd parquet at call time, then the upstream
        shingle/freq/rank shuffles are released BEFORE the
        candidate/verify phase allocates its exchanges — peak live is
        max(phase1, phase2), not the sum (r12 verdict item 2)."""
        shutil.rmtree(cont_stage, ignore_errors=True)
        df = dd.containment_pairs(_docs(s, sf), shingle_words=3,
                                  tau_num=4, tau_den=5,
                                  stage_dir=cont_stage)
        freed = release_shuffles(s, settle_s=60.0)
        log(f"containment phase-1 staged ({_du_gb(cont_stage)}G), "
            f"freed {round(freed / 2**20)}MB")
        return df

    def run(name: str, fn, sf: str) -> None:
        t0 = time.time()
        entry: dict = {"kernel": name, "sf": os.path.basename(sf),
                       "tmp_free_before_gb": round(
                           shutil.disk_usage("/tmp").free / 2**30, 1)}
        try:
            rows = fn(spark, sf).count()
            entry.update(wall_s=round(time.time() - t0, 1), rows=rows)
        except Exception as ex:  # record and continue — the session
            entry.update(wall_s=round(time.time() - t0, 1),
                         error=f"{type(ex).__name__}: {ex}"[:300])
        resident = blockmgr_bytes(spark)
        freed = release_shuffles(spark, settle_s=60.0)
        if name == "dd_containment":
            # staged rank frame is the kernel's scratch — return /tmp
            entry["rank_stage_gb"] = _du_gb(cont_stage)
            shutil.rmtree(cont_stage, ignore_errors=True)
        entry.update(
            resident_mb=round(resident / 2**20, 1),
            freed_mb=round(freed / 2**20, 1),
            resident_after_mb=round(blockmgr_bytes(spark) / 2**20, 1),
            tmp_free_gb=round(shutil.disk_usage("/tmp").free / 2**30, 1),
        )
        results["kernels"].append(entry)
        log(f"{name}@{entry['sf']}: {entry.get('wall_s')}s "
            f"rows={entry.get('rows')} err={entry.get('error')} "
            f"freed={entry['freed_mb']}MB")

    # ---- item-4 kernels: sf10 rows first (decade ratios), then sf100
    new_wave = [
        ("dd_simhash_pairs", qs["dd_simhash_pairs"]),
        ("dd_blocks", qs["dd_blocks"]),
        ("tx_tfidf_topk", qs["tx_tfidf_topk"]),
        ("curate_corpus", qs["curate_corpus"]),
        ("mm_phash_groups", qs["mm_phash_groups"]),
        ("dd_ngram_jaccard", qs["dd_ngram_jaccard"]),
    ]
    for name, fn in new_wave:
        run(name, fn, SF10)
    run("dd_containment", containment_staged, SF10)

    # ---- sf100 wave: cheap smoke kernels bracket the heavies so the
    # disk-safety story (tmp returns to start between kernels) is
    # visible in one JSON
    run("dd_exact", qs["dd_exact"], sf100)
    run("tx_fingerprints", qs["tx_fingerprints"], sf100)
    for name, fn in new_wave:
        run(name, fn, sf100)
    run("dd_containment", containment_staged, sf100)
    run("dd_simhash", qs["dd_simhash"], sf100)  # post-containment smoke

    # ---- item 5: at-scale streaming (sf10 docs, four micro-batches) --
    results["streaming"] = []
    for fam, runner in (("st_neardup_pairs", _run_neardup_4batch),
                        ("st_exact_dedup", _run_exactdd_4batch)):
        try:
            entry = runner(spark, SF10)
        except Exception as ex:
            entry = {"error": f"{type(ex).__name__}: {ex}"[:300]}
        entry["family"] = fam
        freed = release_shuffles(spark, settle_s=60.0)
        entry["freed_mb"] = round(freed / 2**20, 1)
        entry["tmp_free_gb"] = round(
            shutil.disk_usage("/tmp").free / 2**30, 1)
        results["streaming"].append(entry)
        log(f"{fam}: {json.dumps(entry)[:220]}")

    results["load_end"] = [round(x, 2) for x in os.getloadavg()]
    results["tmp_free_end_gb"] = round(
        shutil.disk_usage("/tmp").free / 2**30, 1)
    blob = json.dumps(results)
    print(blob)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(blob)


def _stage_doc_4split(sf_dir: str) -> tuple[str, str]:
    """Stage the documents corpus as FOUR sequence-prefixed parquet
    files (doc_id % 4) with pinned mtimes — the at-scale streaming
    feed.  Write-once, keyed on the source parquet's mtime+size (the
    CLAUDE.md stale-cache rule)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from openplacereviews_db_spark.streaming.pipelines import (
        _pin_batch_order, _prune_stale_stage)

    src_parquet = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_parquet)
    tag = (f"v1_{os.path.basename(os.path.normpath(sf_dir))}"
           f"_{int(st.st_mtime)}_{st.st_size}")
    root = os.path.join(tempfile.gettempdir(), "opr_spark_stage",
                        f"doc4split_{tag}")
    src = os.path.join(root, "src")
    marker = os.path.join(root, "_staged_ok")
    # completion marker, not a file-count check: this script runs at
    # the /tmp disk limit, and a torn 4th parquet (ENOSPC mid-write)
    # would otherwise read as a complete stage forever (r13 review)
    if not os.path.isfile(marker):
        shutil.rmtree(src, ignore_errors=True)
        t = pq.read_table(src_parquet)
        os.makedirs(src, exist_ok=True)
        paths = []
        for i in range(4):
            p = os.path.join(src, f"{i:05d}_batch.parquet")
            pq.write_table(
                t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 3), i)), p)
            paths.append(p)
        _pin_batch_order(*paths)
        with open(marker, "w") as fh:
            fh.write("ok")
        _prune_stale_stage(root, tag)
    return root, src


def _batch_progress(q) -> list[dict]:
    """Per-micro-batch rows + wall from the streaming query's progress
    log — the evidence that batch cost tracks the BATCH, not the
    accumulated index."""
    out = []
    for p in q.recentProgress:
        out.append({
            "batch": p["batchId"],
            "rows": p["numInputRows"],
            "wall_s": round(p["durationMs"]["triggerExecution"] / 1e3, 1),
        })
    return out


def _run_neardup_4batch(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from openplacereviews_db_spark.streaming.pipelines import (
        neardup_dedup_stream)

    root, src = _stage_doc_4split(sf_dir)
    index_dir = os.path.join(root, "nd_index")
    chk_dir = os.path.join(root, "nd_chk")
    pairs_dir = os.path.join(root, "nd_pairs")
    for d in (index_dir, chk_dir, pairs_dir):
        shutil.rmtree(d, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    docs = (spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(src)
            .where(F.length("text") > 0))
    t0 = time.time()
    q = neardup_dedup_stream(docs, index_dir, chk_dir, pairs_dir,
                             shingle_words=2, num_hashes=16, bands=8,
                             min_jaccard=0.1).start()
    q.awaitTermination()
    pairs = spark.read.parquet(pairs_dir)
    n_pairs = (pairs.select(F.least("id_a", "id_b").alias("a"),
                            F.greatest("id_a", "id_b").alias("b"))
               .dropDuplicates().count())
    return {"wall_s": round(time.time() - t0, 1), "pairs": n_pairs,
            "batches": _batch_progress(q),
            "index_gb": _du_gb(index_dir)}


def _run_exactdd_4batch(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from openplacereviews_db_spark.streaming.pipelines import (
        exact_dedup_stream)

    root, src = _stage_doc_4split(sf_dir)
    index_dir = os.path.join(root, "xd_index")
    counts_dir = os.path.join(root, "xd_counts")
    chk_dir = os.path.join(root, "xd_chk")
    for d in (index_dir, counts_dir, chk_dir):
        shutil.rmtree(d, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    docs = (spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(src)
            .where(F.length("text") > 0))
    t0 = time.time()
    q = exact_dedup_stream(docs, index_dir, chk_dir, counts_dir).start()
    q.awaitTermination()
    n_kept = spark.read.parquet(index_dir).count()
    return {"wall_s": round(time.time() - t0, 1), "kept": n_kept,
            "batches": _batch_progress(q),
            "index_gb": _du_gb(index_dir)}


if __name__ == "__main__":
    main()
