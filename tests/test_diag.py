"""Pin the environment-manifest probe's decode contract (plans/diag_q.py).

The probe is only useful if its encoding is stable: a future edit that
shifts the bias or the unit silently breaks the artifact-decoding story
COVERAGE.md documents.  These tests pin (a) the healthy-UTC fixed point
164/164 with hash-equal values, (b) the documented decode at three
non-trivial offsets on BOTH engines, and (c) the analysis-time
session-timezone binding the probe relies on to observe what sibling
queries' calendar expressions saw.
"""

from __future__ import annotations

import duckdb

from results_ingestor_spark.plans import QUERIES, ORACLES


def _decode_offset_seconds(rows: int) -> int:
    units = rows % 10000
    return (units - 164) * 900


def _spark_probe_rows(spark, tz: str) -> int:
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        # plan is BUILT (analyzed) under tz — the binding the probe
        # must observe, because every sibling query's calendar
        # expressions bind the same way (driver_sim_check scenario B)
        return QUERIES["diag_env_manifest"](spark, "unused").count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def _duck_probe_rows(tz: str) -> int:
    con = duckdb.connect()
    try:
        con.execute(f"SET TimeZone='{tz}'")
        return len(con.sql(ORACLES["diag_env_manifest"]).fetchall())
    finally:
        con.close()


def test_probe_utc_fixed_point_164_both_engines(spark):
    """Healthy gate: UTC + pinned engine versions = green 164/164."""
    s = _spark_probe_rows(spark, "UTC")
    d = _duck_probe_rows("UTC")
    assert (s, d) == (164, 164)
    # the VALUES are 1..n on both sides, so a driver hash-compare of a
    # healthy probe is green, not merely row-count-equal
    sdf = QUERIES["diag_env_manifest"](spark, "unused")
    assert [r["i"] for r in sdf.orderBy("i").collect()] == list(range(1, s + 1))


def test_probe_decode_at_documented_offsets(spark):
    """The COVERAGE.md decode table, measured: -11h, +5:30, +13h.

    These expected offsets are IANA tzdata facts at the probe's fixed
    winter instant (e.g. Pacific/Kanton = +13 since 1994-12-31); a
    tzdata update that rezones one of these territories would move the
    expectation — update the case table with the new political offset,
    not the decode."""
    cases = {
        "Pacific/Pago_Pago": -11 * 3600,   # units 120
        "Asia/Kolkata": 5 * 3600 + 1800,   # non-integral hour, units 186
        "Pacific/Kanton": 13 * 3600,       # units 216
    }
    for tz, off in cases.items():
        s = _spark_probe_rows(spark, tz)
        d = _duck_probe_rows(tz)
        assert _decode_offset_seconds(s) == off, (tz, s)
        assert _decode_offset_seconds(d) == off, (tz, d)
        # version tag 0 = locally pinned engines on both sides
        assert s // 10000 == 0 and d // 10000 == 0


def test_probe_binds_at_analysis_not_execution(spark):
    """Build under Kolkata, execute under UTC: the Kolkata offset must
    stick — that is what makes the probe report the zone every other
    query's plan analysis actually experienced."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        df = QUERIES["diag_env_manifest"](spark, "unused")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert _decode_offset_seconds(df.count()) == 5 * 3600 + 1800
