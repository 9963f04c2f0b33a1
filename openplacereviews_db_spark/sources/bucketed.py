"""Bucketed storage for co-located (shuffle-free) joins.

The reference's ``osmid`` GIN index (OpenPlaceReviewsDbBoot.java:167-178)
answers "which place contains OSM id X" without scanning places.  The
100 TB Spark analog (SURVEY.md §1.6) is an exploded side table
``(osm_id, tile_id, place_suffix)`` stored BUCKETED by ``osm_id``: a
lookup batch bucketed the same way joins bucket-to-bucket with no
exchange on either side — the join that runs on every sync-bot batch
(J1, ``OsmSyncBot.java:413-449``) stops paying a fact-table shuffle.

Bucketing is Spark's hash-partitioned table layout (``bucketBy`` +
``saveAsTable``): files are pre-split by ``hash(key) % buckets`` and the
optimizer proves both sides share the partitioning, so SortMergeJoin
runs directly over the scans (``tests/test_bucketed.py`` asserts the
plan has ZERO Exchange nodes).  At scale, pick buckets ≈ cluster cores
× small multiple; both tables must use the same count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str,
                   buckets: int = 16) -> None:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``key`` — the write-once step that buys every later join its
    shuffle."""
    (df.write.mode("overwrite").format("parquet")
     .bucketBy(buckets, key).sortBy(key).saveAsTable(table))


def cobucketed_join(spark: SparkSession, left_table: str,
                    right_table: str, key: str,
                    how: str = "inner") -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed`
    on the same key and bucket count; the plan contains no Exchange —
    each task reads bucket i of both sides."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=key, how=how)
