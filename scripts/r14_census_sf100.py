"""Round-14 sf100 exact planted census (r13 verdict item 4, sf100
half) — the ONE kernel the interrupted wave session did not reach:
``emb_neardup_hi`` (exact chunk-pair GEMM at the production threshold)
over /tmp/opr_sf100.  Expected n_pairs == 19,980 (999 planted groups x
20 directed-pair arithmetic), closing the decade against an exact
count instead of the LSH reading (18,906 = 94.6%).

Usage: python scripts/r14_census_sf100.py [sf100_dir] [out.json]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf100"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "r14_census_sf100.json"

    os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")
    nparts = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark, release_shuffles

    spark = get_spark("r14_census_sf100", shuffle_partitions=nparts,
                      sf_dir=sf100)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    entry: dict = {"kernel": "emb_neardup_hi", "sf": os.path.basename(sf100),
                   "load": [round(x, 2) for x in os.getloadavg()],
                   "tmp_free_before_gb": round(
                       shutil.disk_usage("/tmp").free / 2**30, 1)}
    t0 = time.time()
    out = qs["emb_neardup_hi"](spark, sf100).collect()
    entry.update(wall_s=round(time.time() - t0, 1), rows=len(out),
                 values={k: (v if isinstance(v, (int, bool)) else float(v))
                         for k, v in out[0].asDict().items()} if out else {})
    freed = release_shuffles(spark, settle_s=60.0)
    entry.update(freed_mb=round(freed / 2**20, 1),
                 load_end=[round(x, 2) for x in os.getloadavg()],
                 tmp_free_gb=round(shutil.disk_usage("/tmp").free / 2**30, 1))
    blob = json.dumps(entry)
    print(blob)
    with open(out_path, "w") as fh:
        fh.write(blob)


if __name__ == "__main__":
    main()
