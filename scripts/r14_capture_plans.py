"""Capture .explain("formatted") for named queries into files.

Usage: python scripts/r14_capture_plans.py <outdir> <suffix> q1,q2,...
Writes <outdir>/<query>_<suffix>.txt.  For streaming queries the
returned frame is a sink read; a header note says so (the interesting
structure is the per-batch plan, claimed in OPTIMIZATION_r14.md and
checkable in the code).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from openplacereviews_db_spark.session import get_spark

    spark = get_spark("r14plans", sf_dir=SF)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        header = ""
        if name.startswith("st_"):
            header = (
                "# NOTE: streaming harness query — the returned frame is the\n"
                "# finished run's sink read; the per-micro-batch plan shape\n"
                "# is described in OPTIMIZATION_r14.md and lives in\n"
                "# openplacereviews_db_spark/streaming/pipelines.py.\n\n")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(header + buf.getvalue())
        print(f"# wrote {name}_{suffix}.txt", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
