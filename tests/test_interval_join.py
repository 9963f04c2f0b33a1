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
