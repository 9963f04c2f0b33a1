"""Run the driver-shaped oracle comparison at an arbitrary SF.

Usage: python scripts/check_sf.py [sf_dir] [name1,name2,...]
Prints one line per query: OK / MISMATCH(kind) / NO_ORACLE / ERROR.
The optional second argument restricts the run to the named queries.
"""
from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from test_oracle_parity import (  # noqa: E402
    _assert_type_classes, _normalize,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("check_sf", shuffle_partitions=32, sf_dir=sf_dir)
    duck = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in sorted(entrymod.queries().items()):
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name:28s} NO_ORACLE rows={len(spark_rows)} "
                      f"({time.time()-t0:.1f}s)")
                continue
            res = duck.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            if sorted(spark_cols) != sorted(duck_cols):
                print(f"{name:28s} MISMATCH(cols) {spark_cols} vs {duck_cols}")
                failures += 1
                continue
            _assert_type_classes(name, sdf, duck, oracles[name])
            if len(spark_rows) != len(duck_rows):
                print(f"{name:28s} MISMATCH(rows) {len(spark_rows)} "
                      f"vs {len(duck_rows)}")
                failures += 1
                continue
            s_norm = _normalize(spark_rows, spark_cols)
            d_norm = _normalize(duck_rows, duck_cols)
            bad = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
            if bad:
                print(f"{name:28s} MISMATCH(values) first={bad[:1]}")
                failures += 1
            else:
                print(f"{name:28s} OK rows={len(spark_rows)} "
                      f"({time.time()-t0:.1f}s)")
        except AssertionError as e:
            print(f"{name:28s} MISMATCH(types) {e}")
            failures += 1
        except Exception:
            print(f"{name:28s} ERROR")
            traceback.print_exc()
            failures += 1
        finally:
            spark.catalog.clearCache()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
