"""Skew-mitigation joins.

The reference handles source-side skew by recursively splitting
overloaded bboxes (``OsmSyncBot.java:503-535`` — its count-probe analog
is ``operators/adaptive_split.py``).  Join-side skew on a cluster has
two standard answers, both here:

1. **AQE skew-join splitting** (on by default in ``session.py``):
   Spark splits oversized shuffle partitions at runtime.  Covers
   sort-merge joins automatically — nothing to write.
2. **Salting** for the cases AQE cannot fix (skewed *broadcast-less*
   aggregations, or engines/paths without AQE): explode the small side
   ``salt_factor`` times and scatter the big side's hot keys across the
   salt space.  ``salted_join`` packages the pattern with result
   equality to the plain join (asserted in ``tests/test_skew.py``).

At 100 TB the decision rule: AQE first; salt only keys whose single
partition exceeds executor memory even after AQE's split (power-law
join keys — a billion-document language, a mega-city tile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_factor: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big ⨝ small`` on ``key`` with the big side's rows
    scattered over ``salt_factor`` sub-keys and the small side
    replicated once per sub-key — a hot key's rows land in
    ``salt_factor`` partitions instead of one.

    The salt is derived from a hash of the whole big-side row id space
    (xxhash64 of all columns), so it is deterministic without needing a
    unique column.  Result is exactly the plain join (salt columns are
    internal).  Replication cost: ``|small| × salt_factor`` rows through
    the shuffle — keep the small side genuinely small or salt only the
    known-hot keys.

    Only ``inner``/``left`` (big-side-preserving) joins are legal: an
    outer-preserved SMALL side would emit its unmatched rows once per
    salt replica.
    """
    if how not in ("inner", "left", "leftouter", "left_outer",
                   "leftsemi", "left_semi", "leftanti", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            f"small-side rows across salt replicas; use inner/left "
            f"variants or salt the other side")
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                        F.lit(salt_factor)).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))))
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
