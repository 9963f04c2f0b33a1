"""sf10 (100x sf0.1) completion smoke across the heavy family.

The first sf10 run of dd_minhash_lsh exposed a scale-dependent AQE
broadcast OOM that no smaller sf could show.  This script runs the
rest of the dedup / embedding / text-heavy contract at sf10 — one rep,
count() only (pair outputs reach 10^8 rows; collecting them to the
driver would itself be the anti-pattern) — recording wall + rows, so
any other mid-scale pathology (broadcast builds, driver collects,
skew stalls) surfaces as a crash or an outlier wall.

Usage: python scripts/r10_sf10_smoke.py [names_csv]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/tmp/opr_sf10")

DEFAULT = [
    # dedup family (LSH'd/blocked — pair growth linear by construction)
    "dd_exact", "dd_simhash", "dd_simhash_pairs", "dd_ngram_jaccard",
    "dd_containment", "dd_blocks", "dd_dup_spans", "dd_incremental",
    "x87_window_dedup",
    # embeddings
    "emb_neardup_lsh", "emb_neardup_pairs", "emb_semdedup",
    "ann_ivf_topk", "emb_kmeans",
    # text heavies / pipelines
    "tx_fingerprints", "tx_bpe_vocab", "tx_pack_sequences",
    "curate_corpus",
    # graph / history / merge heavies over the 100x relational tables
    "g9_pagerank", "history_report", "m11_asof_snapshot",
    "x71_scd2_build",
]


def log(msg: str) -> None:
    print(f"# {msg} loadavg={[round(x, 2) for x in os.getloadavg()]}",
          file=sys.stderr, flush=True)


def main() -> None:
    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    names = (sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT)
    # decade-sized heap; SPARK_GRAFT_SHUFFLE overrides the partition
    # count (sf100 SHJ builds want 128 x ~160 MB, not 32 x ~625 MB)
    spark = get_spark("r10sf10smoke", sf_dir=SF10,
                      shuffle_partitions=int(
                          os.environ.get("SPARK_GRAFT_SHUFFLE", "0")) or None)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def drop_blocks() -> None:
        import gc
        spark.catalog.clearCache()
        it = (spark.sparkContext._jsc.sc()
              .getPersistentRDDs().values().iterator())
        while it.hasNext():
            it.next().unpersist(False)
        gc.collect()

    def _echo(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        yield from batches
    n = spark.sparkContext.defaultParallelism
    spark.range(0, n * 4, 1, n).mapInPandas(_echo, "id long").count()

    out: dict = {}
    for name in names:
        t0 = time.time()
        try:
            rows = qs[name](spark, SF10).count()
            dt = round(time.time() - t0, 2)
            out[name] = {"sec": dt, "rows": rows}
            log(f"{name}: {dt}s rows={rows}")
        except Exception as ex:
            dt = round(time.time() - t0, 2)
            out[name] = {"sec": dt, "error": str(ex)[:400]}
            log(f"{name}: FAILED after {dt}s: {str(ex)[:200]}")
        drop_blocks()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
