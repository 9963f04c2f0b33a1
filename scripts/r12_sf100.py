"""Round-12 sf100 (1000x) session — ONE JVM, many kernels, disk-safe.

Three r11 verdict items in one measured session:

- item 4: a >=14-kernel sf100 run in a single JVM, with
  ``session.release_shuffles`` between kernels — the r11 wave-2
  equivalent died of ENOSPC after 14 kernels because finished queries'
  shuffle files accumulate until a JVM GC lets the ContextCleaner
  unregister them.  Per-kernel freed bytes and /tmp free space are
  logged so the disk-boundedness is visible, not asserted.
- item 6: first sf100 rows for dd_containment, dd_dup_spans(+apply),
  tx_bpe_encode, m9_apply_changelog, g2_proximity_groups (each with
  output counts for the exactly-linear check against sf10).
- items 3+5: emb near-dup at the production threshold over the planted
  corpus (LSH kernel at cos>=0.90; expected (copies-1)*20 pairs), and
  the m11 as-of fold (block-partition-pruned) against m9's unpruned
  fold on the same staged op log.

Usage: python scripts/r12_sf100.py [sf_dir] [out.json]
(default /tmp/opr_sf100; also runs a small sf10 wave first for the
decade ratios of the NEW/changed kernels).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = "/tmp/opr_sf10"


def log(msg: str) -> None:
    free_gb = shutil.disk_usage("/tmp").free / 2**30
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]} "
          f"tmp_free={free_gb:.1f}G", file=sys.stderr, flush=True)


def main() -> None:
    sf100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf100"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.operators import similarity
    from openplacereviews_db_spark.session import (blockmgr_bytes,
                                                   get_spark,
                                                   release_shuffles)
    from openplacereviews_db_spark.sources.testdata import load_table

    # sf100 heavies want more, smaller shuffle partitions (r11 probe
    # finding: 32 concurrent 440 MB SHJ builds crowd the 48 g heap)
    # and the zstd codec (disk-bound regime: bytes beat the 20-40%
    # compress-wall the bench-scale default avoids)
    os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")
    nparts = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
    spark = get_spark("r12_sf100", shuffle_partitions=nparts,
                      sf_dir=sf100)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    results: dict = {"sf_dir": sf100, "shuffle_partitions": nparts,
                     "load_start": [round(x, 2) for x in os.getloadavg()],
                     "kernels": []}

    from openplacereviews_db_spark.plans.corpus import _parquet_num_rows

    def lsh90(sf: str):
        embs = load_table(spark, "embeddings", sf)
        # design_sim = the planted-duplicate similarity: bands grow
        # with the auto signature to HOLD ~98% recall at every decade
        return similarity.cosine_pairs_lsh(
            embs, threshold=0.90,
            n_hint=_parquet_num_rows(sf, "embeddings"),
            design_sim=0.95)

    def run(name: str, fn, sf: str, first_row: bool = False) -> None:
        t0 = time.time()
        entry: dict = {"kernel": name, "sf": os.path.basename(sf)}
        try:
            if first_row:  # 1-row census queries: keep the VALUES
                row = fn(spark, sf).first().asDict()
                entry.update(wall_s=round(time.time() - t0, 1), rows=1,
                             values={k: (round(v, 6)
                                         if isinstance(v, float) else v)
                                     for k, v in row.items()})
            else:
                rows = fn(spark, sf).count()
                entry.update(wall_s=round(time.time() - t0, 1), rows=rows)
        except Exception as ex:  # record and continue — the session
            entry.update(wall_s=round(time.time() - t0, 1),
                         error=f"{type(ex).__name__}: {ex}"[:300])
        resident = blockmgr_bytes(spark)
        freed = release_shuffles(spark, settle_s=60.0)
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

    # ---- staged op-log builds timed apart from the folds ------------
    from openplacereviews_db_spark.plans import oplog
    for sf in (SF10, sf100):
        t0 = time.time()
        oplog._oplog_stage(spark, sf)
        results[f"oplog_stage_{os.path.basename(sf)}_s"] = round(
            time.time() - t0, 1)
        release_shuffles(spark, settle_s=60.0)
        log(f"oplog stage {sf}: "
            f"{results[f'oplog_stage_{os.path.basename(sf)}_s']}s")

    # ---- sf10 wave: decade-ratio rows for the NEW/changed kernels ----
    run("emb_neardup_hi", qs["emb_neardup_hi"], SF10,
        first_row=True)                                    # exact, planted
    run("emb_lsh90",
        lambda s, sf: lsh90(sf), SF10)                     # scale path
    run("m9_apply_changelog", qs["m9_apply_changelog"], SF10)
    run("m11_asof_snapshot", qs["m11_asof_snapshot"], SF10)

    # ---- sf100 wave: one JVM, >=14 kernels --------------------------
    wave = [
        ("dd_exact", qs["dd_exact"]),
        ("dd_simhash", qs["dd_simhash"]),
        ("tx_fingerprints", qs["tx_fingerprints"]),
        ("tx_pack_sequences", qs["tx_pack_sequences"]),
        ("mm_decode_stats", qs["mm_decode_stats"]),
        ("mm_resize", qs["mm_resize"]),
        ("emb_scalar_quant", qs["emb_scalar_quant"]),
        ("emb_kmeans", qs["emb_kmeans"]),
        ("emb_lsh90", lambda s, sf: lsh90(sf)),
        ("g2_proximity_groups", qs["g2_proximity_groups"]),
        ("tx_bpe_encode", qs["tx_bpe_encode"]),
        ("dd_dup_spans", qs["dd_dup_spans"]),
        ("dd_dup_spans_apply", qs["dd_dup_spans_apply"]),
        ("m9_apply_changelog", qs["m9_apply_changelog"]),
        ("m11_asof_snapshot", qs["m11_asof_snapshot"]),
        ("dd_containment", qs["dd_containment"]),
    ]
    for name, fn in wave:
        run(name, fn, sf100)

    results["load_end"] = [round(x, 2) for x in os.getloadavg()]
    blob = json.dumps(results)
    print(blob)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(blob)


if __name__ == "__main__":
    main()
