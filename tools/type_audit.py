"""Schema-only numeric-type-tag audit across the full registry.

The driver's value-hash reaches pandas dtypes, so a Spark BIGINT column
whose oracle twin comes back as DOUBLE (or HUGEINT → float64) hash-fails
even when every value compares equal — the class that turned
math_functions and the count_if family red in rounds 1-2.  This tool
catches the whole class WITHOUT executing anything: it builds each
query's Spark schema (plan analysis only) and DESCRIBEs its oracle, then
compares numeric kinds column-by-column.

Kinds: i = integer, f = float, b = boolean, d = decimal.  Only
int-vs-float-vs-decimal divergence is flagged; temporal/string/nested
types canonicalize identically in the driver's hash and are left to the
value gate.

Usage: python tools/type_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SPARK_KIND = {
    "byte": "i", "short": "i", "int": "i", "bigint": "i",
    "float": "f", "double": "f", "boolean": "b",
}

_DUCK_KIND = {
    "TINYINT": "i", "SMALLINT": "i", "INTEGER": "i", "BIGINT": "i",
    "UTINYINT": "i", "USMALLINT": "i", "UINTEGER": "i", "UBIGINT": "i",
    "HUGEINT": "f",  # pandas converts HUGEINT to float64 — the r1 bug
    "FLOAT": "f", "DOUBLE": "f", "BOOLEAN": "b",
}


def _spark_kind(dt: str) -> str | None:
    if dt.startswith("decimal"):
        return "d"
    return _SPARK_KIND.get(dt)


def _duck_kind(dt: str) -> str | None:
    u = str(dt).upper()
    if u.startswith("DECIMAL"):
        return "d"
    return _DUCK_KIND.get(u)


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from results_ingestor_spark.session import get_spark
    from results_ingestor_spark.sources.tables import TABLE_NAMES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("type-audit")
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            skinds = {f.name: _spark_kind(f.dataType.simpleString())
                      for f in sdf.schema.fields}
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark build error: {ex}")
            continue
        try:
            rel = con.sql(oracles[name])
            dkinds = dict(zip(rel.columns,
                              (_duck_kind(t) for t in rel.types)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb describe error: {ex}")
            continue
        bad = [
            (c, sk, dkinds.get(c))
            for c, sk in skinds.items()
            if sk is not None and dkinds.get(c) is not None
            and sk != dkinds[c]
        ]
        if bad:
            failures.append(name)
            for c, sk, dk in bad:
                print(f"FAIL {name}: column {c!r} spark kind {sk} "
                      f"vs oracle kind {dk}")
        else:
            print(f"ok   {name}")

    print(f"\n{len(failures)} failures"
          + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
