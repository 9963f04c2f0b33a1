"""r14: interleaved A/B for a5_merge_counters — lazy cands (cascade
join executes 3x: count / picks / closes) vs one eager localCheckpoint
of the projected pairs.  Both variants built inline so the comparison
runs in ONE session; values asserted identical.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from openplacereviews_db_spark.operators import place_merge
    from openplacereviews_db_spark.plans.merge_plans import CLOSE_NOW_ISO
    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.sources import places as P

    spark = get_spark("r14aba5", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")

    def build(eager: bool):
        closed = P.synthetic_closed_flat(spark, SF)
        active = P.synthetic_active_flat(spark, SF)
        cands = place_merge.merge_candidates(closed, active)
        if eager:
            cands = (cands.select("c_id", "a_id", "match_type", "dist_m")
                     .localCheckpoint(eager=True))
        picks = place_merge.pick_merges(cands)
        closes = place_merge.close_ops(closed, cands, CLOSE_NOW_ISO)
        return (
            cands.agg(F.count(F.lit(1)).alias("similar_places_cnt"))
            .crossJoin(picks.agg(F.count(F.lit(1)).alias("merged_places_cnt")))
            .crossJoin(closes.agg(F.count(F.lit(1)).alias("closed_places_cnt")))
        )

    def run(eager: bool):
        t0 = time.time()
        rows = build(eager).collect()
        return time.time() - t0, [tuple(r) for r in rows]

    # warm both paths once
    run(False), run(True)
    lazy_ts, eager_ts, vals = [], [], set()
    for _ in range(4):
        t, v = run(False)
        lazy_ts.append(round(t, 2)); vals.add(tuple(v))
        t, v = run(True)
        eager_ts.append(round(t, 2)); vals.add(tuple(v))
    assert len(vals) == 1, vals
    print(json.dumps({"loadavg": os.getloadavg(), "values": list(vals)[0],
                      "lazy_e2e_s": lazy_ts, "eager_ckpt_e2e_s": eager_ts}))


if __name__ == "__main__":
    main()
