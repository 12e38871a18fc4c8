"""As-of and range joins — operators Spark lacks natively (SURVEY §2.4).

``asof_join_backward`` uses the union + carry-forward-window pattern:
tag both sides, union them, and for each left row take the last
right-side payload at-or-before its timestamp via ``last(ignorenulls)``
over a (key, ts)-sorted window.  One shuffle on the key + one sort —
the distributed equivalent of pandas ``merge_asof``, with no quadratic
pairing and no per-group Python.  Broadcast-ability is irrelevant:
both sides co-partition on the key.

``range_join_bucketed`` equi-joins on (key, time-bucket) with the left
side exploded to adjacent buckets, then filters the exact range — the
standard trick that turns an inequality join (which Catalyst would plan
as a nested-loop) into a hash join with bounded fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       right_payload: dict[str, str]) -> DataFrame:
    """For each left row: the most recent right row with
    ``right.ts <= left.ts`` on the same key (inclusive backward as-of).

    ``right_payload`` maps right-side column → output alias.  Right rows
    are deduplicated to one per (key, ts) by max payload first so tie
    resolution is deterministic in any engine.
    """
    rp_cols = list(right_payload)
    r = (right.groupBy(key, F.col(right_ts).alias("__ts"))
         .agg(*[F.max(c).alias(c) for c in rp_cols]))
    r_tagged = r.select(
        F.col(key), F.col("__ts"), F.lit(0).alias("__is_left"),
        F.lit(None).cast("long").alias("__left_rid"),
        *[F.col(c) for c in rp_cols])
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        F.monotonically_increasing_id().alias("__left_rid"),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(c) for c in rp_cols])
    unioned = r_tagged.unionByName(l_tagged)
    # right rows sort before left rows at equal ts → inclusive semantics
    w = (Window.partitionBy(key).orderBy("__ts", "__is_left")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # Carry ONE struct(ts, payload...) per right row, not per-column
    # last(ignorenulls): per-column carries would skip a NULL payload
    # value in the matched row and resurrect a stale value from an older
    # right row, diverging matched_ts from the payload's source row.
    # The struct is non-NULL for every right row (even all-NULL payloads),
    # so matched_ts and every payload field come from the same row.
    row_struct = F.when(
        F.col("__is_left") == 0,
        F.struct(F.col("__ts").alias("__mts"),
                 *[F.col(c) for c in rp_cols]))
    carried = unioned.select(
        key, "__ts", "__is_left", "__left_rid",
        F.last(row_struct, ignorenulls=True).over(w).alias("__r"))
    out = carried.where(F.col("__is_left") == 1)
    return out.select(
        key,
        F.col("__ts").alias(left_ts),
        F.col("__r.__mts").alias(f"matched_{right_ts}"),
        *[F.col(f"__r.{c}").alias(a) for c, a in right_payload.items()])


def range_join_bucketed(events: DataFrame, key: str, ts: str, id_col: str,
                        max_gap_us: int) -> DataFrame:
    """All ordered pairs (a, b) on the same key with
    ``0 < ts_b - ts_a <= max_gap_us``.

    The left side fans out to its own bucket and the next one; the join
    is a plain hash equi-join on (key, bucket), then the exact predicate
    filters.  Fan-out is exactly 2x, independent of data size or skew.
    """
    bucket = (F.unix_micros(F.col(ts)) / max_gap_us).cast("long")
    a = events.select(F.col(key), F.col(id_col).alias("id_a"),
                      F.unix_micros(F.col(ts)).alias("us_a"),
                      F.explode(F.array(bucket, bucket + 1)).alias("__bkt"))
    b = events.select(F.col(key).alias("__kb"), F.col(id_col).alias("id_b"),
                      F.unix_micros(F.col(ts)).alias("us_b"),
                      bucket.alias("__bkt_b"))
    return (a.join(b, (F.col(key) == F.col("__kb"))
                   & (F.col("__bkt") == F.col("__bkt_b")))
            .where((F.col("us_b") > F.col("us_a"))
                   & (F.col("us_b") - F.col("us_a") <= max_gap_us))
            .select(key, "id_a", "id_b",
                    (F.col("us_b") - F.col("us_a")).alias("gap_us")))


def asof_join_forward(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      right_payload: dict[str, str]) -> DataFrame:
    """For each left row: the EARLIEST right row with
    ``right.ts >= left.ts`` (inclusive forward as-of) — the mirror of
    asof_join_backward: identical union + struct-carry pattern, with the
    window ordered by ts DESCENDING so 'last seen right row' walking
    down is the nearest following one.  Same cost shape: one shuffle on
    the key, one sort, no pairing join."""
    rp_cols = list(right_payload)
    r = (right.groupBy(key, F.col(right_ts).alias("__ts"))
         .agg(*[F.max(c).alias(c) for c in rp_cols]))
    r_tagged = r.select(
        F.col(key), F.col("__ts"), F.lit(0).alias("__is_left"),
        *[F.col(c) for c in rp_cols])
    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("__ts"), F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(r.dtypes)[c]).alias(c) for c in rp_cols])
    unioned = r_tagged.unionByName(l_tagged)
    # DESC ts; right rows (0) sort before left rows (1) at equal ts →
    # an equal-ts right row is visible to the left row (inclusive).
    w = (Window.partitionBy(key).orderBy(F.desc("__ts"), F.asc("__is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    row_struct = F.when(
        F.col("__is_left") == 0,
        F.struct(F.col("__ts").alias("__mts"),
                 *[F.col(c) for c in rp_cols]))
    carried = unioned.select(
        key, "__ts", "__is_left",
        F.last(row_struct, ignorenulls=True).over(w).alias("__r"))
    out = carried.where(F.col("__is_left") == 1)
    return out.select(
        key,
        F.col("__ts").alias(left_ts),
        F.col("__r.__mts").alias(f"matched_{right_ts}"),
        *[F.col(f"__r.{c}").alias(a) for c, a in right_payload.items()])
