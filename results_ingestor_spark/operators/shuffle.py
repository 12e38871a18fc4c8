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
