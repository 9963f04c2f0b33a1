"""Run any contract query by name from the command line.

Usage:
    python scripts/run_query.py <query> [sf_dir] [--explain] [--limit N]
    python scripts/run_query.py --list [filter]

Examples:
    python scripts/run_query.py q1_pricing_summary
    python scripts/run_query.py dd_minhash_lsh /root/testdata/sf0.1 --explain
    python scripts/run_query.py --list dedup
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(
        prog="run_query.py",
        description="Run any contract query by name.")
    ap.add_argument("name", nargs="?",
                    help="query name (or filter pattern with --list)")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--list", action="store_true", dest="list_queries",
                    help="list query names matching the filter")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--limit", type=int, default=20,
                    help="rows to show (both --limit N and --limit=N)")
    ns = ap.parse_args()

    import __spark_entry__ as entrymod

    if ns.list_queries:
        pat = (ns.name or "").lower()
        for name in entrymod.queries():
            if pat in name.lower():
                print(name)
        return 0

    if not ns.name:
        print(__doc__)
        return 2
    qs = entrymod.queries()
    if ns.name not in qs:
        close = [n for n in qs if ns.name.lower() in n.lower()]
        print(f"unknown query {ns.name!r}"
              + (f"; close: {close}" if close else ""))
        return 2

    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("run_query", shuffle_partitions=32, sf_dir=ns.sf_dir)
    df = qs[ns.name](spark, ns.sf_dir)
    if ns.explain:
        df.explain("formatted")
    import time
    t0 = time.time()
    rows = df.collect()
    dt = time.time() - t0
    df.limit(ns.limit).show(ns.limit, truncate=40)
    print(f"{ns.name}: {len(rows)} rows in {dt:.2f}s at {ns.sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
