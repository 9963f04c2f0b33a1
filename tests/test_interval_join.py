"""X55 interval-overlap join: randomized differential vs brute force,
with timestamps engineered to sit ON bin boundaries and at exact
width-W separations — the edges where covered-bin blocking and the
end-exclusive overlap predicate can silently lose pairs."""

from __future__ import annotations

import random

import pandas as pd

from openplacereviews_db_spark.plans.temporal import _IV_US, j13_interval_join

_BASE_US = 1_600_000_000_000_000  # 2020-09-13, arbitrary epoch anchor


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id",
                                      "event_type", "ts_us"])
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_us"), unit="us")
    pdf["value"] = 1.0
    pdf["props"] = ""
    d = tmp_path / "ev"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def _brute(rows):
    errs = [(i, u, t) for i, u, k, t in rows if k == "error"]
    clks = [(i, u, t) for i, u, k, t in rows if k == "click"]
    out = set()
    for a_id, au, a_s in errs:
        for b_id, bu, b_s in clks:
            if au == bu and a_s < b_s + _IV_US and b_s < a_s + _IV_US:
                out.add((a_id, b_id,
                         min(a_s, b_s) + _IV_US - max(a_s, b_s)))
    return out


def test_interval_join_random_boundary_heavy(spark, tmp_path):
    rng = random.Random(99)
    rows = []
    eid = 0
    for _ in range(120):
        u = rng.randint(0, 4)
        kind = rng.choice(["error", "click", "view"])
        mode = rng.random()
        if mode < 0.3:
            # exactly on a bin boundary
            t = _BASE_US + rng.randint(0, 12) * _IV_US
        elif mode < 0.5:
            # exactly W apart from the base (end-exclusive edge: two
            # intervals [t, t+W) and [t+W, t+2W) must NOT pair)
            t = _BASE_US + rng.randint(0, 12) * _IV_US - 1
        else:
            t = _BASE_US + rng.randint(0, 12 * _IV_US)
        rows.append((eid, u, kind, t))
        eid += 1
    src = _write_events(tmp_path, rows)
    got = {(r["a_id"], r["b_id"], r["overlap_us"])
           for r in j13_interval_join(spark, src).collect()}
    want = _brute(rows)
    assert got == want
    assert len(want) > 20, "boundary-heavy corpus should produce pairs"


def test_scd2_ranges_partition_the_timeline(spark):
    """X71 invariants beyond oracle parity: per user, versions are
    contiguous from 1, ranges chain exactly (eff_to == next eff_from),
    exactly one open (current) range per user, consecutive versions
    never share a value (the collapse actually collapsed), and the
    n_events total equals the user's event count."""
    from pyspark.sql import functions as F

    from openplacereviews_db_spark.plans.temporal import x71_scd2_build
    from openplacereviews_db_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    out = x71_scd2_build(spark, sf).cache()
    try:
        per_user = (out.groupBy("user_id")
                    .agg(F.count(F.lit(1)).alias("n_ver"),
                         F.min("version").alias("v_min"),
                         F.max("version").alias("v_max"),
                         F.sum("is_current").alias("n_open"),
                         F.sum("n_events").alias("n_ev")))
        bad = per_user.where(
            (F.col("v_min") != 1)
            | (F.col("v_max") != F.col("n_ver"))
            | (F.col("n_open") != 1)).count()
        assert bad == 0
        ev_counts = (load_table(spark, "events", sf)
                     .groupBy("user_id").count())
        drift = (per_user.join(ev_counts, "user_id", "full")
                 .where(F.col("n_ev") != F.col("count")).count())
        assert drift == 0
        nxt = out.select("user_id",
                         (F.col("version") - 1).alias("version"),
                         F.col("eff_from_us").alias("next_from"),
                         F.col("event_type").alias("next_type"))
        chain = out.join(nxt, ["user_id", "version"])
        assert chain.where(
            (F.col("eff_to_us") != F.col("next_from"))
            | (F.col("event_type") == F.col("next_type"))).count() == 0
    finally:
        out.unpersist()
