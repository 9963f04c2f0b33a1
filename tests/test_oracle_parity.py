"""Differential test: every queries() entry must match its oracle_sql()
on row count, column names, and (order-insensitively) values — the same
comparison shape the driver's correctness gate performs at sf0.01.

Runs at sf0.001 to stay fast; the logic is scale-free.
"""

from __future__ import annotations

import datetime
import math

import pytest

import __spark_entry__ as entrymod

QUERY_NAMES = sorted(entrymod.queries().keys())


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and fp noise beyond test tolerance
        return round(v + 0.0, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(spark_rows) >= 0  # weaker rows-only check, like the driver
        return

    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mism = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mism, f"{name}: first mismatches {mism[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
