"""JVM-vs-DuckDB libm agreement, MEASURED and pinned (round 6) — the
second half of the snap-device risk budget.

Many plans emit transcendental-derived doubles snapped with
``round(x, 9)`` computed independently in both engines (entropy logs,
idf, bloom fpr exp/pow, Rayleigh atan2...).  The snap absorbs an input
discrepancy UNLESS the true value sits within that discrepancy of a
rounding boundary, so the residual flip probability per cell is
  P(libm differs) x P(within 1 ulp of a boundary)
    ~ rate x (2^-52 x |x| / 10^-9).

Measured on a 4096-value grid (pyspark 4.1.2 / JDK 17.0.20 vs duckdb
1.0.0): sqrt is BIT-EXACT (IEEE 754 requires correct rounding);
exp/ln/pow/atan2/sin/cos differ on 0.2%-14% of inputs but NEVER by
more than 1 ulp.  With O(1) magnitudes at 9 dp that bounds the flip
rate at ~3e-8 per cell — consistent with 420 queries passing
cell-for-cell at three SFs.  This test pins the two load-bearing
properties (sqrt exactness; <=1 ulp everywhere else) so an engine or
libm upgrade that widens the gap fails HERE, with VERSIONS.md naming
the build, before the driver gate turns red.
"""

from __future__ import annotations

import struct

import duckdb
from pyspark.sql import functions as F

N = 4096


def _grid():
    vals = [((i * 2654435761) % 2**32) / 2**32 for i in range(1, N + 1)]
    xs = [v * 200 - 100 for v in vals]
    pos = [v * 100 + 1e-6 for v in vals]
    ys = [vals[(i + 7) % N] * 200 - 100 for i in range(N)]
    return xs, pos, ys


def _bits(v: float) -> int:
    return struct.unpack("<q", struct.pack("<d", v))[0]


def test_libm_within_one_ulp_and_sqrt_exact(spark):
    xs, pos, ys = _grid()
    df = spark.createDataFrame(list(zip(xs, pos, ys)),
                               "x double, p double, y double")
    s = df.select(
        F.exp(F.col("x") / 10).alias("e"), F.log(F.col("p")).alias("l"),
        F.sqrt(F.col("p")).alias("s"),
        F.pow(F.col("p"), F.lit(1.5)).alias("pw"),
        F.atan2(F.col("y"), F.col("x")).alias("a"),
        F.sin(F.col("x")).alias("sn"), F.cos(F.col("x")).alias("cs")
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE, p DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", list(zip(xs, pos, ys)))
    d = con.sql("SELECT exp(x/10) AS e, ln(p) AS l, sqrt(p) AS s, "
                "pow(p, 1.5) AS pw, atan2(y, x) AS a, sin(x) AS sn, "
                "cos(x) AS cs FROM t").fetchall()
    names = ["exp", "ln", "sqrt", "pow", "atan2", "sin", "cos"]
    for j, nm in enumerate(names):
        diffs = [abs(_bits(sr[j]) - _bits(dr[j])) for sr, dr in zip(s, d)]
        assert max(diffs) <= 1, \
            f"{nm}: engines differ by {max(diffs)} ulp (>1) — the 9-dp " \
            f"snap residual bound no longer holds"
        if nm == "sqrt":
            assert sum(diffs) == 0, "sqrt must be correctly rounded (IEEE)"
