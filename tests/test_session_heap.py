"""driver_mem_for sizes the single-JVM harness heap to the data decade
(r10: 8 GiB dies at sf10, 32 GiB completes — BASELINE.md decade→heap).
Sparse files keep the big-decade case cheap: getsize reports apparent
size, which is what a parquet dir reports too.
"""
from __future__ import annotations

import os

from openplacereviews_db_spark.session import driver_mem_for


def _mk(dirpath, name, mb):
    p = os.path.join(dirpath, name)
    with open(p, "wb") as f:
        f.truncate(mb * 2**20)


def test_small_decades_stay_at_8g(tmp_path):
    _mk(tmp_path, "a.parquet", 17)  # ~sf0.1
    assert driver_mem_for(str(tmp_path)) == "8g"
    assert driver_mem_for(None) == "8g"
    assert driver_mem_for(str(tmp_path / "missing")) == "8g"


def test_decade_scaling_and_clamp(tmp_path):
    _mk(tmp_path, "a.parquet", 150)  # ~sf1 → still 8g (r10: ran at 8g)
    assert driver_mem_for(str(tmp_path)) == "8g"
    _mk(tmp_path, "b.parquet", 1300)  # ~sf10 total ≈ 1.45 GB → 32g
    assert driver_mem_for(str(tmp_path)) == "32g"
    _mk(tmp_path, "c.parquet", 14000)  # ~sf100 → clamped at 48g
    assert driver_mem_for(str(tmp_path)) == "48g"


def test_env_override_wins(tmp_path, monkeypatch):
    _mk(tmp_path, "a.parquet", 5000)
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "12g")
    assert driver_mem_for(str(tmp_path)) == "12g"


def test_release_shuffles_frees_finished_query_files(spark):
    """Shuffle files of finished queries must be reclaimable inside a
    live JVM: unpersist/clearCache leave them on /tmp until a GC lets
    the ContextCleaner unregister the ShuffleDependency, and a
    multi-query at-scale session otherwise accumulates to ENOSPC
    (r11: sf100 wave-2 died after 14 kernels).  release_shuffles runs
    the GC rounds and polls the block-manager dirs; at least 70% of the
    finished query's shuffle bytes must come back."""
    from openplacereviews_db_spark.session import (blockmgr_bytes,
                                                   release_shuffles)

    base = blockmgr_bytes(spark)
    df = (spark.range(0, 2_000_000)
          .selectExpr("id % 1000 AS k", "id AS v")
          .repartition(8, "k"))
    assert df.groupBy("k").count().count() == 1000
    peak = blockmgr_bytes(spark)
    assert peak > base, "test query produced no shuffle files"
    df = None
    freed = release_shuffles(spark)
    after = blockmgr_bytes(spark)
    assert freed >= 0.7 * (peak - base), (base, peak, freed, after)
