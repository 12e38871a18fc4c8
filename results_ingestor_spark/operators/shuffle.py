"""Deterministic corpus shuffle — the training-data export primitive.

An LLM data pipeline needs a *reproducible* global shuffle: every epoch
reads the corpus in a pseudo-random order that is (a) stable across
reruns, (b) different per seed/epoch, and (c) computable without a
global sort on one machine.  The key is ``md5(seed:doc_id)`` — a
deterministic pseudo-random permutation with no RNG state, reproducible
in any engine.

``global_shuffle_index`` assigns each row its exact position in the
shuffled order with the two-level trick: the first hex byte of the key
is the shard (key-prefix ⇒ shard order is consistent with key order),
rows rank *within* their shard, and per-shard row counts (256 longs)
cumulate into shard offsets that broadcast back.  No stage ever sees
more than one shard's rows in one partition — the global window
row_number() over a 100 TB corpus that this replaces would serialize on
a single task.

``write_shuffled_shards`` is the writer twin: repartitionByRange +
sortWithinPartitions on the key gives globally ordered output files
(disjoint ranges, sorted within) — a distributed sort that spills per
partition, never a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_shuffle_key(df: DataFrame, seed: int,
                     id_col: str = "doc_id") -> DataFrame:
    """Attach the deterministic shuffle key ``md5('<seed>:<id>')``
    (lowercase hex → lexicographic order is the shuffled order)."""
    return df.withColumn(
        "shuffle_key",
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(id_col).cast("string"))))


def global_shuffle_index(df: DataFrame, seed: int,
                         id_col: str = "doc_id") -> DataFrame:
    """Exact 0-based global position of each row in the seed-shuffled
    order, without a global sort.

    shard = first hex byte of the key (256 shards); within-shard rank
    is a (shard)-partitioned window; shard offsets = cumsum of the 256
    shard counts, broadcast back.  Ties are impossible in practice
    (md5 collisions) but ``id_col`` tie-breaks deterministically anyway.
    """
    keyed = with_shuffle_key(df, seed, id_col).withColumn(
        "shard", F.conv(F.substring("shuffle_key", 1, 2), 16, 10).cast("int"))
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    ranked = keyed.withColumn("__rk", F.row_number().over(w))
    counts = keyed.groupBy("shard").agg(F.count("*").alias("__n"))
    wo = (Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "shard", F.coalesce(F.sum("__n").over(wo), F.lit(0)).alias("__off"))
    return (ranked.join(F.broadcast(offsets), "shard")
            .withColumn("global_pos",
                        (F.col("__off") + F.col("__rk") - 1).cast("long"))
            .drop("__rk", "__off"))


def write_shuffled_shards(df: DataFrame, path: str, seed: int,
                          n_files: int, id_col: str = "doc_id") -> None:
    """Materialize the shuffled corpus as ``n_files`` parquet files with
    globally ordered, disjoint shuffle-key ranges — what a training job
    streams sequentially.  repartitionByRange samples range bounds
    (one pass), then each partition sorts independently."""
    keyed = with_shuffle_key(df, seed, id_col)
    (keyed.repartitionByRange(n_files, "shuffle_key")
     .sortWithinPartitions("shuffle_key")
     .write.mode("overwrite").parquet(path))


def _order_consistent_shard(key, lo, hi, n_shards: int):
    """Shard id that is NON-DECREASING in ``key`` — fixed-width buckets
    over the observed [lo, hi] range.  x <= y  ⇒  shard(x) <= shard(y),
    and equal keys always share a shard, so ranking within shards plus
    cumulative shard offsets reconstructs the EXACT global order.  (Edge
    cases: a constant column degenerates to one shard — still correct,
    just unsharded; the max value clamps into the last shard.)"""
    width = (hi - lo) / n_shards
    raw = F.floor((key - lo) / width).cast("int")
    return (F.when(hi <= lo, F.lit(0))
            .otherwise(F.least(F.greatest(raw, F.lit(0)),
                               F.lit(n_shards - 1))))


def hex_prefix_key(col, chars: int = 15):
    """Numeric key monotonic in the lexicographic order of a fixed-width
    lowercase-hex string column (md5 output): the first ``chars`` hex
    digits as a BIGINT.  15 digits = 60 bits < long range.  Rows tying
    on the prefix get equal keys (same shard) — within-shard ordering on
    the full string resolves them."""
    return F.conv(F.substring(col, 1, chars), 16, 10).cast("long")


def two_level_row_number(df: DataFrame, shard_key, order_cols,
                         partition_cols=(), n_shards: int = 256,
                         out_col: str = "__rn",
                         static_shard=None) -> DataFrame:
    """Exact ``row_number() OVER (PARTITION BY partition_cols ORDER BY
    order_cols)`` WITHOUT a single-partition window — the scale form of
    a global ranking.

    ``shard_key`` must be a numeric Column non-decreasing in the first
    order column (the column itself for numerics; ``hex_prefix_key`` for
    hex strings).  Rows shard on an order-consistent bucketing of that
    key, rank within (partition_cols, shard) — every window partition is
    ~1/n_shards of the data — and per-(partition, shard) row counts
    cumulate into offsets that broadcast back.  The only non-sharded
    window runs over the ≤ n_shards×|partition domain| count rows (the
    same bounded combine as ``global_shuffle_index``).  Identical output
    to the single-window form is pinned by
    tests/test_operators_sharded.py against both orderings.

    ``static_shard`` (an int Column in [0, n_shards), order-consistent
    with the first order column BY CONSTRUCTION — e.g. the first hex
    byte of an md5 key) skips the min/max range job entirely: one less
    scan when the shard domain is known a priori."""
    pcols = list(partition_cols)
    if static_shard is not None:
        keyed = df.withColumn("__shard", static_shard.cast("int"))
    else:
        rng = df.agg(F.min(shard_key.cast("double")).alias("__lo"),
                     F.max(shard_key.cast("double")).alias("__hi"))
        keyed = (df.crossJoin(F.broadcast(rng))
                 .withColumn("__shard",
                             _order_consistent_shard(
                                 shard_key.cast("double"), F.col("__lo"),
                                 F.col("__hi"), n_shards))
                 .drop("__lo", "__hi"))
    w_in = Window.partitionBy(*pcols, "__shard").orderBy(*order_cols)
    ranked = keyed.withColumn("__rk", F.row_number().over(w_in))
    # The counts branch deliberately re-aggregates the INPUT rather
    # than deriving from the ranked frame: Catalyst prunes it to the
    # shard-key/partition columns only (a ~1-2% columnar re-scan with a
    # map-side partial agg down to ≤n_shards×|partition domain| rows —
    # pinned narrow in tests/test_operators_sharded.py), which at scale
    # is strictly cheaper than the alternative that avoids the second
    # scan by re-running the full-width shuffle+sort+window under the
    # counts aggregate (exchange reuse doesn't fire across the two
    # branches precisely BECAUSE their pruned schemas differ).
    counts = keyed.groupBy(*pcols, "__shard").agg(F.count("*").alias("__n"))
    w_off = (Window.partitionBy(*pcols).orderBy("__shard")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        *pcols, "__shard",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"))
    return (ranked.join(F.broadcast(offsets), pcols + ["__shard"])
            .withColumn(out_col,
                        (F.col("__off") + F.col("__rk")).cast("long"))
            .drop("__shard", "__rk", "__off"))


def two_level_prefix_sum(df: DataFrame, shard_key, order_cols, weight_col,
                         n_shards: int = 256,
                         out_col: str = "__cum_before") -> DataFrame:
    """Exact EXCLUSIVE prefix sum of ``weight_col`` in ``order_cols``
    order without a single-partition window: within-shard running sum
    (rowsBetween unboundedPreceding, -1) plus broadcast per-shard weight
    offsets.  Rows must be unique under order_cols (distinct-domain
    input) so "preceding rows" is well-defined — the AUC/Mann-Whitney
    cumulative-count shape."""
    rng = df.agg(F.min(shard_key.cast("double")).alias("__lo"),
                 F.max(shard_key.cast("double")).alias("__hi"))
    keyed = (df.crossJoin(F.broadcast(rng))
             .withColumn("__shard",
                         _order_consistent_shard(
                             shard_key.cast("double"), F.col("__lo"),
                             F.col("__hi"), n_shards))
             .drop("__lo", "__hi"))
    w_in = (Window.partitionBy("__shard").orderBy(*order_cols)
            .rowsBetween(Window.unboundedPreceding, -1))
    cum_in = F.coalesce(F.sum(weight_col).over(w_in), F.lit(0))
    # Same deliberate two-branch shape as two_level_row_number: the
    # counts branch is a pruned re-aggregation of the input (see the
    # comment there for why that beats forcing exchange reuse).
    counts = keyed.groupBy("__shard").agg(F.sum(weight_col).alias("__n"))
    w_off = (Window.orderBy("__shard")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "__shard", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
        .alias("__off"))
    return (keyed.withColumn("__cin", cum_in)
            .join(F.broadcast(offsets), "__shard")
            .withColumn(out_col, F.col("__off") + F.col("__cin"))
            .drop("__shard", "__cin", "__off"))


def _idiv(a, b):
    """Exact floor division of non-negative long columns: (a - a%b) is
    an exact multiple of b, so the double division is exact — no
    near-quotient rounding at 2^50-scale counts (plain a/b→cast can
    round UP across a bucket boundary there)."""
    return ((a - a % b) / b).cast("long")


def ntile_from_row_number(rn, n_rows, n: int):
    """Spark's exact ``ntile(n)`` semantics computed arithmetically from
    a row_number and the partition row count: the first (n_rows mod n)
    buckets take ceil(n_rows/n) rows, the rest floor(n_rows/n).  Lets a
    two-level row_number replace a global ntile window."""
    q = _idiv(n_rows, F.lit(n))            # floor bucket size
    r = n_rows - q * n                     # buckets with one extra row
    big_span = r * (q + 1)                 # rows covered by big buckets
    return (F.when(rn <= big_span, _idiv(rn - 1, q + 1) + 1)
            .otherwise(r + _idiv(rn - big_span - 1, q) + 1)
            .cast("int"))
