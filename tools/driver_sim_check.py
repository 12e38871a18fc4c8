"""Adversarial driver-environment simulation (the /verify probe, made
a tool): a plain ``local[8]`` SparkSession with a NON-UTC session
timezone — the externally-built session the grading driver uses —
running any set of queries()/oracle_sql() pairs cell-for-cell.

``tune_session`` (called inside ``load_tables``) must re-pin UTC and
the other portability confs on the foreign session or every
timestamp-derived column shifts; rounds 5 and 6 run this over the
whole active window + staged slate before closing.

Usage: python tools/driver_sim_check.py [sf_dir] [name ...]
       (default: sf0.01, the active 50-entry window + staged slate)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from tools.check_correctness import _rowset
    from results_ingestor_spark.sources.tables import TABLE_NAMES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "America/New_York")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .appName("driver-sim").getOrCreate())

    qs, oracles = e.queries(), e.oracle_sql()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        import results_ingestor_spark.plans as plans
        window = list(qs)[:50]
        staged = [n for n in getattr(plans, "_ROUND7_SLATE", ())
                  if n not in set(window)]
        names = window + staged

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    # the driver smoke-checks entry() first — replicate that
    n_entry = e.entry(spark).count()
    print(f"entry(): {n_entry} rows")

    failures = []
    for name in names:
        if name not in oracles:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            from results_ingestor_spark.operators.ckpt import release_result
            release_result(sdf)
            rel = con.sql(oracles[name])
            d_cols, d_rows = rel.columns, rel.fetchall()
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL {name}: {type(ex).__name__}: {str(ex)[:160]}")
            continue
        if sorted(s_cols) != sorted(d_cols) or len(s_rows) != len(d_rows) \
                or _rowset(s_cols, s_rows) != _rowset(d_cols, d_rows):
            failures.append(name)
            print(f"FAIL {name}: mismatch under non-UTC driver-sim")
        else:
            print(f"ok   {name}: {len(s_rows)} rows")
    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
