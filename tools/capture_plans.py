"""Capture .explain("formatted") for headline queries into a directory.

Usage: python tools/capture_plans.py <outdir> <suffix> [name ...]

Writes <outdir>/<query>_<suffix>.txt for every headline query (or the
named subset).  The explain is the pre-execution plan (AdaptiveSparkPlan
isFinalPlan=false) — the shape evidence (Exchange count, join strategy,
PushedFilters, codegen spans) the optimization round's judge checks
against the code.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import bench
    import __spark_entry__ as e
    from results_ingestor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    qs = e.queries()
    targets = names or [n for n in bench.HEADLINE if n in qs]
    for name in targets:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        # release any checkpoint blocks the build pinned
        from results_ingestor_spark.operators.ckpt import release_result
        release_result(df)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
