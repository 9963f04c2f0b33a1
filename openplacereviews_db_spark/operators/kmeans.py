"""X52 — integer-exact k-means (Lloyd's algorithm) over an embedding
column, engine-reproducible bit for bit.

The reference clusters places greedily by proximity
(``MergePlaceBot.java:144-209`` → ``operators/cluster.py``); this is the
embedding-space analog a training-data pipeline needs (corpus
partitioning for curriculum mixing, SemDeDup-style per-cluster pruning,
IVF coarse quantizers).  Everything runs in BIGINT arithmetic so a
DuckDB oracle can replay it exactly:

- vectors are quantized once: ``floor(double(x) * scale)`` per
  dimension (floor of the same IEEE product on both engines — never
  ``round``, whose shortest-repr vs binary-value semantics diverge on
  the .5 grid, see CLAUDE.md);
- distances are exact integer squared-L2; argmin tiebreaks on
  ``(d2, cid)``;
- centroid update is the exact truncating integer mean
  (``sum div count`` — Spark ``div`` and DuckDB ``//`` both truncate
  toward zero, verified on negatives);
- seeds are the ``k`` smallest ids (deterministic; k-means++ would add
  a sampling RNG the oracle can't replay).

Scale shape (100 TB): per-iteration cost is one broadcast of k·d
BIGINTs to every executor (the classic k-means broadcast-join), one
narrow map computing k distances per row, and one partial-agg shuffle
of at most k·d (cluster, dim) sum/count cells — map-side combine
collapses each partition to ≤ k·d rows before the exchange, so the
shuffle is bounded by k·d·partitions, independent of row count.  The
only driver-side data is the k centroid rows per round (the bounded
1-row-argmax-collect precedent of ``operators/bpe.py``); assignments
never leave the cluster.  The quantized input is eager-localCheckpointed
once and reused by every pass (EAGER_BUILD_OK, the g9_pagerank
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: quantization scale: floats in (-1, 1) → ±1e6, so a 64-dim squared
#: distance is ≤ 64·(2e6)² ≈ 2.6e14 — far inside BIGINT.
DEFAULT_SCALE = 1_000_000


def quantize(emb: DataFrame, vec_col: str = "embedding",
             id_col: str = "vec_id",
             scale: int = DEFAULT_SCALE) -> DataFrame:
    """(id, qv array<bigint>) — floor-quantized copy of the vectors."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
               f" * {scale}) AS BIGINT))").alias("qv"),
    )


def _assign(q: DataFrame, cdf: DataFrame) -> DataFrame:
    """Nearest centroid per row: (id, qv, cid, d2), exact integer L2²,
    ties broken by centroid id via min(struct(d2, cid))."""
    d2 = F.expr("aggregate(zip_with(qv, cv, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    return (q.crossJoin(F.broadcast(cdf))
            .withColumn("d2", d2)
            .groupBy("id", "qv")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select("id", "qv",
                    F.col("m.cid").alias("cid"),
                    F.col("m.d2").alias("d2")))


def kmeans_assign(emb: DataFrame, k: int = 8, iters: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  scale: int = DEFAULT_SCALE) -> DataFrame:
    """Run ``iters`` Lloyd rounds; return the LAST round's assignment
    ``(vec_id, cluster, d2)`` (so round i's centroids come from round
    i-1's update — iters=1 is assignment against the seeds).

    Clusters that lose every member simply stop existing (no
    re-seeding) — deterministic, and mirrored by the oracle's joins.
    """
    spark = emb.sparkSession
    q = quantize(emb, vec_col, id_col, scale).localCheckpoint(eager=True)
    seeds = (q.orderBy("id").limit(k)
             .select(F.col("id").alias("cid"), F.col("qv").alias("cv")))
    cents = [(r["cid"], list(r["cv"])) for r in seeds.collect()]
    for it in range(iters):
        cdf = spark.createDataFrame(cents, "cid bigint, cv array<bigint>")
        assigned = _assign(q, cdf)
        if it == iters - 1:
            return assigned.select(
                F.col("id").alias(id_col),
                F.col("cid").alias("cluster"),
                "d2")
        upd = (assigned
               .select("cid", F.posexplode("qv").alias("dim", "v"))
               .groupBy("cid", "dim")
               .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
               .withColumn("m", F.expr("s div c"))
               .groupBy("cid")
               .agg(F.expr("transform(array_sort(collect_list("
                           "struct(dim, m))), p -> p.m)").alias("cv")))
        cents = [(r["cid"], list(r["cv"])) for r in upd.collect()]
    raise AssertionError("iters must be >= 1")
