"""r14 probe: per-phase anatomy of one streaming near-dup micro-batch.

Drives the exposed ``_neardup_batch`` pieces manually (no streaming
engine) over the staged parity-split files so the ~3 s/batch constant
can be attributed: minhash_state persist-materialize vs candidate join
vs tiered verify + pairs write vs state write vs stream machinery
(measured separately as neardup_once e2e minus body time).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from openplacereviews_db_spark.functions import hashing as H
    from openplacereviews_db_spark.operators.dedup import (
        minhash_state, tiered_jaccard_verify)
    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.streaming import pipelines as P

    spark = get_spark("r14ndprobe", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")

    root, src = P._stage_parity_split(SF, "neardup")
    files = sorted(os.path.join(src, f) for f in os.listdir(src)
                   if f.endswith(".parquet") or not f.startswith(("_", ".")))
    parts = P._batch_shuffle_partitions(spark, src)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))

    shingle_words, num_hashes, bands, min_jaccard = 2, 16, 8, 0.1
    res = {"parts": parts, "rounds": []}
    try:
        for rnd in range(ROUNDS):
            index_dir = f"/tmp/r14_nd_probe/{rnd}/index"
            pairs_dir = f"/tmp/r14_nd_probe/{rnd}/pairs"
            shutil.rmtree(f"/tmp/r14_nd_probe/{rnd}", ignore_errors=True)
            state_dir = os.path.join(index_dir, "state")
            batches = []
            for epoch, f in enumerate(files):
                t = {}
                t0 = time.time()
                batch = (spark.read.parquet(f)
                         .where(F.length("text") > 0))
                per_doc = minhash_state(batch, "text", "doc_id",
                                        shingle_words, num_hashes,
                                        with_sids=True).persist()
                n = per_doc.count()  # materialize the persist
                t["persist_build"] = round(time.time() - t0, 2)
                t0 = time.time()
                sig = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
                new_state = per_doc.select(
                    "id", H.lsh_bands(sig, bands,
                                      num_hashes // bands).alias("bands"),
                    "sids")
                new_bands = new_state.select(
                    "id", F.explode("bands").alias("band"))
                new_sets = per_doc.select("id", "sids")
                if os.path.isdir(state_dir):
                    old = (spark.read.parquet(state_dir)
                           .where(F.col("epoch") < F.lit(epoch)))
                    old_bands = old.select(
                        "id", F.explode("bands").alias("band"))
                    old_sets = old.select("id", "sids")
                else:
                    old_bands = spark.createDataFrame(
                        [], "id long, band string")
                    old_sets = spark.createDataFrame(
                        [], "id long, sids array<bigint>")
                a = new_bands.select(F.col("id").alias("id_a"), "band")
                vs_old = a.join(
                    old_bands.select(F.col("id").alias("id_b"), "band"),
                    "band")
                vs_new = (a.join(
                    new_bands.select(F.col("id").alias("id_b"), "band"),
                    "band").where(F.col("id_a") < F.col("id_b")))
                cand = (vs_old.unionByName(vs_new)
                        .select("id_a", "id_b").dropDuplicates())
                pairs = tiered_jaccard_verify(
                    cand, old_sets.unionByName(new_sets),
                    old_sets.unionByName(new_sets), min_jaccard)
                t["plan_build"] = round(time.time() - t0, 2)
                t0 = time.time()
                pairs.coalesce(4).write.mode("overwrite").parquet(
                    os.path.join(pairs_dir, f"epoch={epoch}"))
                t["pairs_write"] = round(time.time() - t0, 2)
                t0 = time.time()
                new_state.coalesce(4).write.mode("overwrite").parquet(
                    os.path.join(state_dir, f"epoch={epoch}"))
                t["state_write"] = round(time.time() - t0, 2)
                per_doc.unpersist()
                t["rows"] = n
                batches.append(t)
            res["rounds"].append(batches)
            print(f"# round {rnd}: {batches} load={os.getloadavg()[0]:.1f}",
                  file=sys.stderr)
        # e2e harness for the stream-machinery delta
        t0 = time.time()
        n_pairs = P.neardup_once(spark, SF).count()
        res["neardup_once_e2e"] = round(time.time() - t0, 2)
        res["n_pairs"] = n_pairs
        print(f"# neardup_once e2e: {res['neardup_once_e2e']}s "
              f"pairs={n_pairs}", file=sys.stderr)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        shutil.rmtree("/tmp/r14_nd_probe", ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
