"""r14 A/B (negative result, kept as evidence): semi-join prune of the
corpus-sized sets side in the dd_incremental / streaming-neardup tiered
verifies, vs the shipped unpruned shape.

Hypothesis (guide §3.2/§8): candidates are bounded per batch/ingest, so
broadcasting their DISTINCT ids and left-semi pruning the (id, sids)
index before ``tiered_jaccard_verify``'s four set-payload joins turns
the per-batch sets exchange from O(index) into O(candidates).

Measured at sf0.1, interleaved P,N,P,N,P,N in ONE session (loadavg
~3): st_neardup_pairs 9.87/10.13/11.45 s pruned vs 6.30/6.65/7.53 s
unpruned (+3.5 s — two broadcast builds + a cand persist job per
micro-batch); dd_incremental 1.83/2.22/2.57 vs 1.68/2.01/2.23
(+0.2 s).  Values identical both queries (1,473 / 257 rows).  NOT
adopted: the O(index) exchange the prune removes is empirically
invisible at every measured depth (the r13 sf10 4-batch run shows
per-batch cost tracks the batch — 62.8/69.1/66.1/39.2 s with the index
growing 0→3 batches), while the prune's fixed per-batch overhead is
visible at bench scale.  Revisit only with a measured deep-index
regime (hundreds of batches) where the sets exchange actually
dominates.

The pruned variant lives HERE (wrapping the shipped helper) so the
experiment stays reproducible without carrying dead code in the
operators.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def drop_blocks(spark) -> None:
    spark.catalog.clearCache()
    it = (spark.sparkContext._jsc.sc()
          .getPersistentRDDs().values().iterator())
    while it.hasNext():
        it.next().unpersist(False)
    gc.collect()


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.operators import dedup as dd
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14semiprune", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    orig_verify = dd.tiered_jaccard_verify

    def pruned_verify(cand, sets_a, sets_b, min_jaccard,
                      a_col="id_a", b_col="id_b"):
        # one execution of the candidate subtree for both the ids
        # broadcast and the verify probe (persist; dropped between
        # runs by drop_blocks)
        cand = cand.persist()
        ids_a = cand.select(F.col(a_col).alias("id"))
        ids_b = cand.select(F.col(b_col).alias("id"))

        def prune(sets, ids):
            return sets.join(F.broadcast(ids.distinct()), "id",
                             "left_semi")

        if sets_a is sets_b:
            pruned = prune(sets_a, ids_a.unionByName(ids_b))
            return orig_verify(cand, pruned, pruned, min_jaccard,
                               a_col, b_col)
        return orig_verify(cand, prune(sets_a, ids_a),
                           prune(sets_b, ids_b), min_jaccard,
                           a_col, b_col)

    # warm: staged artifacts + codegen for both queries once
    for q in ("dd_incremental", "st_neardup_pairs"):
        qs[q](spark, SF).write.format("noop").mode("overwrite").save()
        drop_blocks(spark)

    res: dict[str, dict[str, list[float]]] = {}
    vals: dict[str, dict[str, list]] = {}
    for rnd in range(ROUNDS):
        for label, fn in (("prune", pruned_verify),
                          ("noprune", orig_verify)):
            dd.tiered_jaccard_verify = fn
            for q in ("dd_incremental", "st_neardup_pairs"):
                spark.sparkContext.setJobDescription(
                    f"{q} {label} r{rnd}")
                t0 = time.time()
                rows = qs[q](spark, SF).collect()
                dt = time.time() - t0
                res.setdefault(q, {}).setdefault(label, []).append(
                    round(dt, 2))
                key = sorted(tuple(r) for r in rows)
                vals.setdefault(q, {})[label] = key
                print(f"# {q} {label} r{rnd}: {dt:.2f}s rows={len(rows)}"
                      f" load={os.getloadavg()[0]:.1f}",
                      file=sys.stderr)
                drop_blocks(spark)
    dd.tiered_jaccard_verify = orig_verify
    for q, v in vals.items():
        assert v["prune"] == v["noprune"], f"{q}: VALUES DIFFER"
        print(f"# {q}: values identical ({len(v['prune'])} rows)",
              file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
