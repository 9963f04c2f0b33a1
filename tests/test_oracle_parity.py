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


def _type_class(t):
    """Collapse an Arrow type to a comparison class.  A driver that
    hashes typed (Arrow/pandas) values sees DuckDB HUGEINT (int128 →
    decimal128/float64) differently from Spark BIGINT even when every
    value is equal — the round-1 `curate_corpus` failure mode.  Int
    widths ≤64 are one class (drivers widen those consistently);
    decimals/hugeint/floats/ints are NOT interchangeable."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        # tz-aware vs naive is a DRIVER schema mismatch (r4
        # d3_aligned_windows: DuckDB to_timestamp → timestamp[us,
        # tz=Etc/UTC], Spark timestamp_seconds → naive) — never
        # collapse tz-ness here
        return "timestamptz" if t.tz is not None else "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _type_class(t.value_type))
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    return str(t)


def _assert_type_classes(name, sdf, duck, oracle_sql):
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_arrow = to_arrow_schema(sdf.schema)
    duck_arrow = duck.execute(oracle_sql).fetch_arrow_table().schema
    # Asymmetric tz handling, mirroring the driver: Spark TimestampType
    # reaches the driver's pandas canonicalizer as NAIVE datetimes (even
    # though to_arrow_schema reports the session tz), so collapse tz on
    # the SPARK side only; DuckDB TIMESTAMPTZ stays tz-aware end to end
    # and must be flagged (the r4 d3_aligned_windows driver FAIL).
    s = {f.name: ("timestamp" if _type_class(f.type) == "timestamptz"
                  else _type_class(f.type)) for f in spark_arrow}
    d = {duck_arrow.field(i).name: _type_class(duck_arrow.field(i).type)
         for i in range(len(duck_arrow))}
    mism = {c: (s[c], d[c]) for c in s if c in d and s[c] != d[c]}
    assert not mism, (
        f"{name}: Arrow type-class mismatch (spark, duck): {mism} — "
        f"cast the oracle (e.g. CAST(... AS BIGINT)) or the Spark column"
    )


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
    _assert_type_classes(name, sdf, duck, oracles[name])
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
