"""Base-corpus distribution invariants the legacy DECIMAL-cast wires
depend on (ADVICE r8 items 1 and 5).

Two families of money ingestion coexist in the plans package:

1. ``exact.cents()`` / ``rev_e4()`` — ``floor(x*100 + 0.5)``,
   IEEE-identical in Spark and DuckDB for ANY double.  Engine-safe,
   distribution-independent.  Every wire added since round 8.
2. Legacy ``CAST(<money double> AS DECIMAL(p,2))`` sites (tpch_q's
   ``_DEC``/``_REV``, relational revenue sums, …).  These are
   DISTRIBUTION-safe only: a double within ~1e-13 of a 2-dp grid
   point casts to the same DECIMAL in both engines, but an off-grid
   double at large magnitude can cast differently (pinned in
   tests/test_round_semantics.py::test_cast_decimal_column_path_divergence).

This module asserts the distribution precondition the legacy sites
rely on: every raw money column in the base corpus sits ON the 2-dp
grid.  If the driver's generator ever starts emitting full-precision
money, this fails loudly and the DECCAST-INGEST lint inventory in
tools/plan_lint.py becomes the migration worklist — instead of the
failure surfacing as an unexplained hash-red gate cell.

Also asserts the ``exact.rev_e4`` precondition (ADVICE r8 item 5):
discount/tax fractions carry at most 2 decimals, because rev_e4
encodes them as integer PERCENT — a finer-grained discount would be
silently truncated to the percent grid (cross-engine parity would
survive; the revenue SEMANTICS would quietly change).
"""

from __future__ import annotations

import duckdb
import pytest

# (table, column, lower-bound, upper-bound) — every raw DOUBLE money
# column the legacy DECIMAL-cast sites ingest.  Bounds are sanity
# pins, not business rules: acctbal can be negative (TPC-H semantics).
MONEY_COLUMNS = [
    ("events", "value", 0.0, None),
    ("orders", "o_totalprice", 0.0, None),
    ("lineitem", "l_extendedprice", 0.0, None),
    ("part", "p_retailprice", 0.0, None),
    ("supplier", "s_acctbal", None, None),
    ("customer", "c_acctbal", None, None),
]

# Fraction columns rev_e4 encodes as integer percent (<=2 decimals).
FRACTION_COLUMNS = [
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in {t for t, *_ in MONEY_COLUMNS} | {t for t, _ in FRACTION_COLUMNS}:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{sf_dir}/{t}.parquet')")
    yield c
    c.close()


@pytest.mark.parametrize("table,col,lo,hi", MONEY_COLUMNS)
def test_money_on_2dp_grid(con, table, col, lo, hi):
    """abs(x*100 - round(x*100)) below the representation-noise bound
    for EVERY row: the double is the nearest-double of a 2-dp decimal.
    The 1e-6 tolerance is ~1e7 ulps at the corpus's magnitudes —
    generously above representation error, far below the 0.5-cent
    distance of a genuinely off-grid value."""
    off, n, vmin, vmax = con.sql(f"""
        SELECT count_if(abs({col}*100 - round({col}*100)) > 1e-6),
               count(*), min({col}), max({col})
        FROM {table} WHERE {col} IS NOT NULL""").fetchall()[0]
    assert n > 0, f"{table}.{col}: empty column"
    assert off == 0, (f"{table}.{col}: {off}/{n} values off the 2-dp "
                      f"grid — legacy CAST(.. AS DECIMAL) wires are no "
                      f"longer distribution-safe; migrate the "
                      f"DECCAST-INGEST inventory to exact.cents()")
    if lo is not None:
        assert vmin >= lo, (table, col, vmin)
    if hi is not None:
        assert vmax <= hi, (table, col, vmax)


@pytest.mark.parametrize("table,col", FRACTION_COLUMNS)
def test_fractions_on_percent_grid(con, table, col):
    """rev_e4 precondition: discount/tax are exact integer percents
    (<=2 decimals), so cents(fraction) == 100*fraction losslessly."""
    off, n, vmin, vmax = con.sql(f"""
        SELECT count_if(abs({col}*100 - round({col}*100)) > 1e-9),
               count(*), min({col}), max({col})
        FROM {table} WHERE {col} IS NOT NULL""").fetchall()[0]
    assert n > 0
    assert off == 0, (f"{table}.{col}: {off}/{n} values finer than the "
                      f"percent grid — rev_e4's integer-percent "
                      f"encoding would truncate them (exact.py "
                      f"docstring precondition)")
    assert 0.0 <= vmin and vmax <= 1.0, (vmin, vmax)
