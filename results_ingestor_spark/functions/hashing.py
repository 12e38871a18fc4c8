"""Deterministic hashing helpers.

Two tiers:

* ``md5_long`` — cross-engine deterministic (identical in Spark, DuckDB,
  Postgres: md5 hex is standardized).  Used wherever an oracle must
  reproduce the exact value (fingerprints, MinHash signatures).  MD5 is
  JVM-side (whole-stage codegen), ~GB/s per core — fine for the hot path.
* ``stable_hash64`` — xxhash64, Spark-only but ~5× faster; the scale path
  for operators whose outputs are verified structurally (rows-only checks)
  rather than value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, seed: str = "") -> Column:
    """First 15 hex digits of md5(seed || col) as a non-negative bigint.

    15 hex digits < 2^60, so the value fits a signed 64-bit int in every
    engine.  DuckDB twin: ``('0x' || substr(md5(seed || x), 1, 15))::bigint``.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(seed), c))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def stable_hash64(col: Column | str, seed: int = 42) -> Column:
    """xxhash64 — fast 64-bit hash for Spark-internal partitioning/sketches."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c, F.lit(seed))
