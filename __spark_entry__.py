"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2 + corpus-curation extensions) to
a ``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` holds the
DuckDB-equivalent SQL for each, hash-compared by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openplacereviews_db_spark.plans import (corpus, history, merge_plans,
                                             oplog, pipeline, places_reports,
                                             relational, relational2,
                                             sync_plans)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(corpus.QUERIES)
    out.update(oplog.QUERIES)
    out.update(places_reports.QUERIES)
    out.update(merge_plans.QUERIES)
    out.update(relational2.QUERIES)
    out.update(history.QUERIES)
    out.update(sync_plans.QUERIES)
    out.update(pipeline.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(corpus.ORACLES)
    out.update(oplog.ORACLES)
    out.update(places_reports.ORACLES)
    out.update(merge_plans.ORACLES)
    out.update(relational2.ORACLES)
    out.update(history.ORACLES)
    out.update(sync_plans.ORACLES)
    out.update(pipeline.ORACLES)
    return out
