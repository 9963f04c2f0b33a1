"""r14: sf10 A/B of the STREAMING per-batch verify — tiered int16
(HEAD) vs the pre-r14 single-tier inline join — at a fixed shuffle
partition count.  The single-tier variant is tiered_jaccard_verify's
tier 2 alone (the prebound tier 1 only prefilters), so values are
identical by construction; pair counts are asserted equal to the
harness's known 146,160.

Usage: python scripts/r14_streaming_tier_ab_sf10.py [sf10_dir] [parts]
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opr_sf10"
PARTS = sys.argv[2] if len(sys.argv) > 2 else "32"


def _load_r13():
    spec = importlib.util.spec_from_file_location(
        "r13_sf100", os.path.join(REPO, "scripts", "r13_sf100.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import functions as F

    from openplacereviews_db_spark import session as S
    from openplacereviews_db_spark.functions import hashing as H
    from openplacereviews_db_spark.operators import dedup as dd
    from openplacereviews_db_spark.session import get_spark

    os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = PARTS
    r13 = _load_r13()
    spark = get_spark("r14tierab", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")

    tiered = dd.tiered_jaccard_verify

    def single_tier(cand, sets_a, sets_b, min_jaccard,
                    a_col="id_a", b_col="id_b"):
        # tier 2 alone == the pre-r14 inline verify (2 joins, full
        # int64 sets, bound-then-exact predicate)
        return (cand
                .join(sets_a.select(F.col("id").alias(a_col),
                                    F.col("sids").alias("s_a"))
                      .hint("shuffle_hash"), a_col)
                .join(sets_b.select(F.col("id").alias(b_col),
                                    F.col("sids").alias("s_b"))
                      .hint("shuffle_hash"), b_col)
                .where(H.jaccard_ge(F.col("s_a"), F.col("s_b"),
                                    min_jaccard))
                .withColumn("jaccard",
                            F.round(H.jaccard(F.col("s_a"),
                                              F.col("s_b")), 6))
                .select(a_col, b_col, "jaccard"))

    spark.conf.set("spark.sql.shuffle.partitions", PARTS)
    out = {"parts": int(PARTS), "runs": []}
    for label, fn in (("tiered", tiered), ("single", single_tier),
                      ("tiered2", tiered), ("single2", single_tier)):
        dd.tiered_jaccard_verify = fn
        entry = {"label": label,
                 **r13._run_neardup_4batch(spark, SF),
                 "load": [round(x, 2) for x in os.getloadavg()]}
        assert entry["pairs"] == 146160, entry
        out["runs"].append(entry)
        print(f"# {label}: {json.dumps(entry)}", file=sys.stderr,
              flush=True)
        S.release_shuffles(spark)
    dd.tiered_jaccard_verify = tiered
    print(json.dumps(out))


if __name__ == "__main__":
    main()
