"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; ``salted_agg`` is the explicit two-phase pattern for aggregations
whose per-key state is itself expensive (huge collect_sets, giant
groups): salt the key to spread one hot key over N reducers, partially
aggregate, then merge the partials.  Works for any algebraic aggregate
(sum/count/min/max) — exactly the decomposition Spark performs
map-side, made explicit so a single pathological key cannot pin one
reducer at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[Column, Column]],
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (phase-1 aggregate over raw rows,
    phase-2 merge aggregate over the ``<name>`` partial column).
    Example: ``{"total": (F.sum("x"), F.sum("total"))}``.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = (df.withColumn("__salt", salt)
              .groupBy(*keys, "__salt")
              .agg(*[a1.alias(name) for name, (a1, _) in aggs.items()]))
    return (phase1.groupBy(*keys)
            .agg(*[a2.alias(name) for name, (_, a2) in aggs.items()]))


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_buckets: int = 8) -> DataFrame:
    """Skew-resistant equi-join: the (large, possibly skewed) left side
    picks a random salt in [0, N); the (smaller) right side replicates
    N ways, one copy per salt value.  The join then hashes on
    (key, salt), spreading one pathological hot key over N reducers
    instead of pinning a single one — the classic remedy when the hot
    side is too big to broadcast and AQE's skew splitting can't help
    (e.g. the skew is in the build side of a sort-merge join).

    Correctness is salt-invariant: every left row meets exactly one
    replica of each matching right row, so the result is bag-equal to
    the plain join (pinned by tests/test_shuffle.py).  Cost: right side
    is shuffled N×; choose N ≈ (hot-key rows / average-key rows).
    """
    salt = (F.rand(seed=7) * salt_buckets).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = (right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))))
    return l_s.join(r_s, [key, "__salt"]).drop("__salt")
