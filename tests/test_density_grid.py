"""The j2/g11 synthetic point grid is DENSITY-CONSTANT across decades:
each 100k block of event ids gets its own 2°-wide longitude box
(0.5° gaps ≫ the 150 m radius).  Driver scales sit entirely in block 0
(sf0.1 tops out at id 99 999), so the nonzero-block arm of the lon
expression is never exercised by the sf0.01 gate — these tests pin it:

1. cross-engine VALUE parity of j2 on a multi-block corpus (the same
   comparison shape as test_oracle_parity, on synthetic block copies);
2. box isolation: no pair ever crosses a block boundary;
3. linearity: each block copy reproduces exactly the block-0 pair set
   (ids offset by copy * 100k — 100k ≡ 0 (mod 2000) keeps the relative
   geometry), so N stacked decades mean N× pairs, never N².
"""
from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

_BLOCK = 100_000
#: grid pairs need id diffs that are exact multiples of 2000 (the only
#: residues where BOTH lat and lon land back within 150 m), so sf0.001
#: (ids < 1000) has none — build the block copies from sf0.01.
_BASE = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def grid_dir(spark, tmp_path_factory):
    """sf0.01 events replicated into blocks 0, 1, 7 by id offset."""
    dest = tmp_path_factory.mktemp("density_grid")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT event_id + c * {_BLOCK} AS event_id,
                   * EXCLUDE (event_id)
            FROM '{_BASE}/events.parquet', unnest([0, 1, 7]) AS t(c)
        ) TO '{dest}/events.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return str(dest)


def _j2_rows(spark, d):
    return entrymod.queries()["j2_proximity_pairs"](spark, d).collect()


def test_j2_multiblock_matches_oracle(spark, grid_dir):
    srows = sorted((r["probe_id"], r["match_id"], r["dist_m"])
                   for r in _j2_rows(spark, grid_dir))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM '{grid_dir}/events.parquet'")
    drows = sorted(tuple(r) for r in con.execute(
        entrymod.oracle_sql()["j2_proximity_pairs"]).fetchall())
    con.close()
    assert len(srows) > 0 and srows == drows


def test_j2_blocks_are_isolated_and_linear(spark, grid_dir):
    rows = _j2_rows(spark, grid_dir)
    assert all(r["probe_id"] // _BLOCK == r["match_id"] // _BLOCK
               for r in rows), "a pair crossed a block boundary"
    base = {(r["probe_id"], r["match_id"], r["dist_m"])
            for r in _j2_rows(spark, _BASE)}
    assert len(base) > 0
    for c in (0, 1, 7):
        copy = {(r["probe_id"] - c * _BLOCK, r["match_id"] - c * _BLOCK,
                 r["dist_m"])
                for r in rows if r["probe_id"] // _BLOCK == c}
        assert copy == base, f"block {c} is not a translate of block 0"
