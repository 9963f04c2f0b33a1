"""Keyed snapshot upsert (S15) and sync-config delta (E2).

The reference's relational side writes users/oauth rows with
INSERT … ON CONFLICT UPDATE semantics (``UserSchemaManager.java:160-208``)
and computes which source requests are new by diffing bot config
against persisted state (``OsmSyncBot.calculateRequests:254-300``).

Spark-first forms:

- ``merge_upsert`` — MERGE INTO semantics as a full-outer join +
  column-wise coalesce (new row wins), optionally with delete keys.
  On Delta/Iceberg this becomes a real transactional MERGE; the plan
  shape (one shuffle per side on the key) is identical.
- ``config_delta`` — set difference of (key, value) request pairs:
  additions need a full first fetch, survivors an incremental diff
  fetch (E2).  Small frames, but expressed relationally so it scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str,
                 deletes: DataFrame | None = None) -> DataFrame:
    """UPSERT: rows of ``updates`` replace same-key rows of ``target``,
    new keys append; ``deletes`` (a frame with the key column) removes.

    Column set is the union of both sides; a column missing from one
    side reads as null there.  One hash shuffle per side on the key.
    """
    t_cols = set(target.columns)
    u_cols = set(updates.columns)
    if key not in t_cols or key not in u_cols:
        raise KeyError(f"key {key!r} must exist on both sides")
    all_cols = [c for c in target.columns + updates.columns
                if c != key]
    seen: set[str] = set()
    payload = [c for c in all_cols if not (c in seen or seen.add(c))]

    t = target.select(
        F.col(key),
        *[(F.col(c) if c in t_cols else F.lit(None)).alias(f"_t_{c}")
          for c in payload])
    u = updates.select(
        F.col(key),
        *[(F.col(c) if c in u_cols else F.lit(None)).alias(f"_u_{c}")
          for c in payload],
        F.lit(True).alias("_from_update"))
    merged = t.join(u, on=key, how="full_outer").select(
        F.col(key),
        *[
            F.when(F.col("_from_update").isNotNull(), F.col(f"_u_{c}"))
            .otherwise(F.col(f"_t_{c}")).alias(c)
            for c in payload
        ])
    if deletes is not None:
        merged = merged.join(deletes.select(key).distinct(),
                             on=key, how="left_anti")
    return merged


def config_delta(config: DataFrame, state: DataFrame,
                 key_cols: list[str]) -> DataFrame:
    """E2: classify config rows as 'new' (full fetch needed) or
    'existing' (incremental diff fetch); state rows gone from config
    come back as 'removed'."""
    c = config.select(*key_cols).withColumn("_c", F.lit(1))
    s = state.select(*key_cols).withColumn("_s", F.lit(1))
    j = c.join(s, on=key_cols, how="full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("_s").isNull(), "new")
        .when(F.col("_c").isNull(), "removed")
        .otherwise("existing").alias("status"),
    )
