"""SparkSession factory.

Defaults are chosen for the driver harness (local[$SPARK_GRAFT_CPUS],
single JVM) but every setting is the one you would also want on a
1000-executor cluster reading 100 TB:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to the cluster (here: the local core count)
- Arrow enabled so the few Pandas-UDF operators use vectorized transfer
- UTC session timezone so timestamp semantics are deterministic and match
  the DuckDB oracle
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "openplacereviews-db-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Generated plans here can be enormous (closed-form OLC / name
        # cascade expression trees); retained-execution metadata and
        # plan pretty-printing must be capped or a long many-query
        # session OOMs the driver while *formatting strings*.
        .config("spark.sql.maxPlanStringLength", "100000")
        .config("spark.sql.ui.retainedExecutions", "8")
        .config("spark.ui.retainedJobs", "50")
        .config("spark.ui.retainedStages", "50")
        # The default whole-stage-codegen class cache holds 100 entries;
        # a 100+-query session generates several codegen units per query
        # and thrashes it — recompiling 1-5 s of Janino work per heavy
        # query at unpredictable points (measured: same dedup query
        # 3 s ↔ 18 s across runs).  Compiled classes are small; cache
        # them all.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
    )
    return builder.getOrCreate()
