"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin on the
same parquet tables and compares row count, column-name set, and values
(order-insensitive, exact).  Stricter than any reasonable hash check:
values are compared cell-for-cell after sorting rows.

Usage:  python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(v):
    # Type-TAGGED canonical values: the driver's value-hash distinguishes
    # an integer 112946 from a double 112946.0 (pandas dtype reaches the
    # hash), so the replica must too — Python's 112946 == 112946.0 would
    # otherwise hide exactly the mismatch that turned math_functions red
    # in round 1.
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("d", "NaN")
        return ("d", repr(v))  # exact double identity
    if isinstance(v, int):
        return ("l", v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, bytes):
        return ("x", v.hex())
    return ("s", str(v))


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def engine_versions() -> dict[str, str]:
    """Versions of every engine that touches a verified value — stamped
    into each check run (and VERSIONS.md) so a driver-vs-local
    divergence is attributable to an environment delta in one diff
    (round-5 verdict item 3: the cohort_ltv_curve red cell was
    undiagnosable because nothing recorded which Spark/DuckDB/pandas
    produced which answer)."""
    import platform

    import duckdb
    import numpy
    import pandas
    import pyarrow
    import pyspark
    out = {
        "python": platform.python_version(),
        "pyspark": pyspark.__version__,
        "duckdb": duckdb.__version__,
        "pandas": pandas.__version__,
        "numpy": numpy.__version__,
        "pyarrow": pyarrow.__version__,
    }
    try:  # JVM: only reachable with a live session
        from pyspark.sql import SparkSession
        active = SparkSession.getActiveSession()
        if active is not None:
            out["java"] = (active.sparkContext._jvm
                           .java.lang.System.getProperty("java.version"))
            out["spark_runtime"] = active.version
    except Exception:
        pass
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from results_ingestor_spark.session import get_spark
    from results_ingestor_spark.sources.tables import TABLE_NAMES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("correctness-check")
    import json
    print("VERSIONS " + json.dumps(engine_versions(), sort_keys=True))
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            # Release any checkpoint blocks the plan scoped to its
            # result (operators/ckpt.py) — a 419-query sweep would
            # otherwise accumulate every plan's materialized frames.
            from results_ingestor_spark.operators.ckpt import (
                release_result)
            release_result(sdf)
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only check, {len(s_rows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue

        # The driver hashes the *pandas* frames, where DuckDB HUGEINT
        # (count_if, sum of hugeint, …) departs from Spark's int64 even
        # when every Python value is equal — fetchall() can't see that.
        # Flag any HUGEINT oracle column so the class never ships again.
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            failures.append(name)
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"CAST to BIGINT in the oracle SQL")
            continue
        # Generalized numeric-type-tag check (the same failure class):
        # a Spark integer column whose oracle twin is DOUBLE (or vice
        # versa) hash-fails at the driver even when values are equal.
        from tools.type_audit import _duck_kind, _spark_kind
        skinds = {f.name: _spark_kind(f.dataType.simpleString())
                  for f in sdf.schema.fields}
        dkinds = dict(zip(rel.columns, (_duck_kind(t) for t in rel.types)))
        kind_bad = [(c, sk, dkinds.get(c)) for c, sk in skinds.items()
                    if sk is not None and dkinds.get(c) is not None
                    and sk != dkinds[c]]
        if kind_bad:
            failures.append(name)
            print(f"FAIL {name}: numeric type-tag mismatch "
                  f"(col, spark, oracle): {kind_bad}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
            continue
        sset, dset = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
        if sset != dset:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(sset, dset) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(sset)} rows differ")
            for a, b in zip(sset, dset):
                if a != b:
                    print(f"  spark: {a}\n  duck : {b}")
                    break
        else:
            print(f"ok   {name}: {len(s_rows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
