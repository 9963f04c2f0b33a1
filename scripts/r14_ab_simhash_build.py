"""r14 A/B: plan-CONSTRUCTION cost of simhash_table.

The phase probe attributed dd_simhash's wall to DataFrame construction
(5.1 s build vs 1.2 s noop exec at sf0.1): the 64 nibble-vote
aggregates + the 64-term weight chain are built as thousands of
individual Column py4j calls, each analyzed eagerly.  Variant B builds
the SAME expressions as SQL strings (one parse per projection).  This
probe interleaves construction+execution of both variants and
value-compares them row-for-row.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = "/root/testdata/sf0.1"


def simhash_expr_variant(df, text_col="text", id_col="doc_id", bits=64):
    from openplacereviews_db_spark.functions import hashing as H

    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(H.norm_text(F.col(text_col)), " "),
                         lambda w: w != ""))
        ).alias("w"),
    ).withColumn("h", F.md5("w"))
    words = words.selectExpr(
        "id", *[f"(instr('0123456789abcdef', substring(h, {n + 1}, 1)) - 1)"
                f" AS nib{n}" for n in range(bits // 4)])
    votes = words.groupBy("id").agg(
        *[F.expr(f"sum(((shiftright(nib{b // 4}, {3 - (b % 4)}) & 1)"
                 f" * 2) - 1)").alias(f"v{b}") for b in range(bits)])
    terms = []
    for b in range(bits):
        w = -(2 ** 63) if (bits - 1 - b) == 63 else 2 ** (bits - 1 - b)
        lit = ("(-9223372036854775807 - 1)" if w == -(2 ** 63)
               else f"CAST({w} AS BIGINT)")
        terms.append(f"(CASE WHEN v{b} > 0 THEN {lit}"
                     f" ELSE CAST(0 AS BIGINT) END)")
    return votes.selectExpr("id", " + ".join(terms) + " AS simhash")


def main() -> None:
    from openplacereviews_db_spark.operators.dedup import simhash_table
    from openplacereviews_db_spark.session import get_spark
    from openplacereviews_db_spark.sources.testdata import load_table

    spark = get_spark("r14simhash", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", SF).where(F.length("text") > 0)
    docs.count()

    results = {}
    for rnd in range(3):
        for name, builder in (("A_column", simhash_table),
                              ("B_expr", simhash_expr_variant)):
            t0 = time.time()
            df = builder(docs)
            t_build = time.time() - t0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.time() - t0
            results.setdefault(name, []).append(
                (round(t_build, 3), round(t_exec, 3)))
            print(f"# {name} r{rnd}: build={t_build:.3f} exec={t_exec:.3f} "
                  f"load={[round(x, 2) for x in os.getloadavg()]}",
                  flush=True)
    a = sorted(map(tuple, simhash_table(docs).collect()))
    b = sorted(map(tuple, simhash_expr_variant(docs).collect()))
    print("values_equal:", a == b, "n:", len(a))
    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
