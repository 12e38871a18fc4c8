"""Environment-manifest diagnostic probe (VERDICT r6 item 2).

The external gate's artifact (``CORRECTNESS_r*.json``) exposes only
pass/fail plus ``spark_rows``/``oracle_rows`` per entry, so when a query
is red in the driver but green locally (``cohort_ltv_curve``, rounds 5
and 6) the environment delta is a guessing game.  This entry makes the
gate's environment *readable from the artifact itself* by encoding it
into the row counts:

* ``spark_rows``  = (session-timezone offset at a fixed winter instant,
  in 15-minute units, biased) + a penalty term when the Spark version
  is not the locally-pinned 4.1.x;
* ``oracle_rows`` = the same offset encoding for DuckDB's ``TimeZone``
  setting + a penalty term when the DuckDB version is not the locally-
  pinned 1.0.x.

Decode (documented in COVERAGE.md §diagnostics):

    units          = rows % 10000
    offset_seconds = (units - 100 - 64) * 900      # 164 → UTC
    version_tag    = rows DIV 10000                # 0 → pinned version,
                                                   # else 10*major+minor

Both sides default their zone setting to the host timezone and both
versions match the local pins, so on a healthy gate the two counts are
EQUAL (the row values are 1..n on both sides, so rows/schema/hash all
match and the entry is green) while still carrying the offset: a green
row with counts 164/164 *proves* the gate ran UTC with the pinned
engines.  Any environment delta (a non-UTC side, a different engine
version) makes the counts unequal — a red row whose two counts decode
the exact delta.

The fixed instant 2026-01-15T00:00:00Z (epoch 1768435200) keeps the
measurement DST-stable; every real zone's offset at that instant is a
multiple of 15 minutes, and the +57600 s bias keeps the quotient
positive for all zones (UTC-14 .. UTC+14 → units 108..220, so rows
are always >= 1 and never collide with the 10000-scaled version
term).  Version-tag caveat: 10*major+minor is unambiguous only while
minor < 10 (1.12 and 2.2 would both encode 22) — fine for the pinned
engines, noted so a far-future decode doesn't over-trust the tag.

No tables are read and ``load_tables``/``tune_session`` is deliberately
NOT called: the probe must observe the session timezone exactly as the
surrounding query builds experience it at plan-analysis time (Spark
binds the zone during analysis — measured in tools/driver_sim_check.py
--matrix), not re-pin it first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from results_ingestor_spark.plans.registry import query

_PROBE_INSTANT_EPOCH_S = 1768435200  # 2026-01-15T00:00:00Z, winter

_SPARK_PROBE_SQL = f"""
WITH env AS (
  SELECT CAST({_PROBE_INSTANT_EPOCH_S}
              - unix_seconds(TIMESTAMP'2026-01-15 00:00:00')
         AS BIGINT) AS off,
         CAST(split(version(), '[ .]')[0] AS INT) AS maj,
         CAST(split(version(), '[ .]')[1] AS INT) AS mnr
)
SELECT CAST(n AS BIGINT) AS i
FROM env
LATERAL VIEW explode(sequence(
  1,
  CAST(100 + (off + 57600) DIV 900
       + IF(maj = 4 AND mnr = 1, 0, 10000 * (maj * 10 + mnr))
       AS INT))) AS n
"""

_ORACLE_PROBE_SQL = f"""
WITH env AS (
  SELECT CAST((epoch_us(CAST(TIMESTAMPTZ '2026-01-15 00:00:00+00:00'
                             AS TIMESTAMP)) // 1000000)
              - {_PROBE_INSTANT_EPOCH_S} AS BIGINT) AS off,
         CAST(regexp_extract(version(), 'v(\\d+)\\.(\\d+)', 1) AS INT)
           AS maj,
         CAST(regexp_extract(version(), 'v(\\d+)\\.(\\d+)', 2) AS INT)
           AS mnr
)
SELECT CAST(unnest(generate_series(
         1,
         100 + (off + 57600) // 900
         + CASE WHEN maj = 1 AND mnr = 0 THEN 0
                ELSE 10000 * (maj * 10 + mnr) END)) AS BIGINT) AS i
FROM env
"""


@query("diag_env_manifest", oracle=_ORACLE_PROBE_SQL)
def diag_env_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emit 1..n where n encodes the engine environment (module doc).

    ``sf_dir`` is unused — the probe measures the session, not data.
    """
    return spark.sql(_SPARK_PROBE_SQL)
