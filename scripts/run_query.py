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

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]

    import __spark_entry__ as entrymod

    if "--list" in flags:
        pat = (args[0] if args else "").lower()
        for name in entrymod.queries():
            if pat in name.lower():
                print(name)
        return 0

    if not args:
        print(__doc__)
        return 2
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    qs = entrymod.queries()
    if name not in qs:
        close = [n for n in qs if name.lower() in n.lower()]
        print(f"unknown query {name!r}" + (f"; close: {close}" if close else ""))
        return 2

    limit = 20
    for f in flags:
        if f.startswith("--limit"):
            limit = int(f.split("=", 1)[1]) if "=" in f else int(sys.argv[
                sys.argv.index(f) + 1])

    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("run_query", shuffle_partitions=32)
    df = qs[name](spark, sf_dir)
    if "--explain" in flags:
        df.explain("formatted")
    import time
    t0 = time.time()
    rows = df.collect()
    dt = time.time() - t0
    df.limit(limit).show(limit, truncate=40)
    print(f"{name}: {len(rows)} rows in {dt:.2f}s at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
