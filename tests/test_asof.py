"""As-of / range join edge cases."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from results_ingestor_spark.operators.asof import (
    asof_join_backward, range_join_bucketed)

TS = datetime.datetime


def test_asof_no_right_match_yields_nulls(spark):
    left = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10)), (2, TS(2024, 1, 1, 11))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 12), 99)], ["k", "ts", "payload"])  # after left ts
    out = {r["k"]: r for r in asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload={"payload": "payload"}).collect()}
    assert out[1]["payload"] is None        # right row is in the future
    assert out[2]["payload"] is None        # no right rows for key 2
    assert out[1]["matched_ts"] is None


def test_asof_inclusive_and_latest_wins(spark):
    left = spark.createDataFrame([(1, TS(2024, 1, 1, 10))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9), 1), (1, TS(2024, 1, 1, 10), 2),
         (1, TS(2024, 1, 1, 11), 3)], ["k", "ts", "payload"])
    row = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload={"payload": "payload"}).collect()[0]
    assert row["payload"] == 2              # equal-ts right row matches (inclusive)
    assert row["matched_ts"] == TS(2024, 1, 1, 10)


def test_asof_null_payload_in_matched_row_is_kept(spark):
    # The matched (most recent at-or-before) right row carries a NULL
    # payload: true ASOF semantics return that NULL, not a stale value
    # resurrected from an older right row.  Regression for the
    # per-column last(ignorenulls) carry bug.
    left = spark.createDataFrame([(1, TS(2024, 1, 1, 12))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9), 7), (1, TS(2024, 1, 1, 11), None)],
        "k int, ts timestamp, payload int")
    row = asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload={"payload": "payload"}).collect()[0]
    assert row["matched_ts"] == TS(2024, 1, 1, 11)
    assert row["payload"] is None           # NOT the stale 7


def test_range_join_bucket_boundary(spark):
    # gap exactly == max_gap lands in the adjacent bucket → the 2x
    # fan-out must still find it; gap just over must not appear
    base = TS(2024, 1, 1, 0, 0, 0)
    rows = [(1, 10, base),
            (1, 11, base + datetime.timedelta(seconds=300)),       # == 5 min
            (1, 12, base + datetime.timedelta(seconds=300, microseconds=1))]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    pairs = {(r["id_a"], r["id_b"]): r["gap_us"] for r in
             range_join_bucketed(df, key="user_id", ts="ts",
                                 id_col="event_id",
                                 max_gap_us=300_000_000).collect()}
    assert pairs[(10, 11)] == 300_000_000   # inclusive upper bound
    assert (10, 12) not in pairs            # 1 µs over
    assert (11, 12) in pairs                # tiny gap within bucket


def test_asof_forward_inclusive_and_earliest_wins(spark):
    from results_ingestor_spark.operators.asof import asof_join_forward
    left = spark.createDataFrame([(1, TS(2024, 1, 1, 10))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9), 1), (1, TS(2024, 1, 1, 10), 2),
         (1, TS(2024, 1, 1, 11), 3)], ["k", "ts", "payload"])
    row = asof_join_forward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload={"payload": "payload"}).collect()[0]
    assert row["payload"] == 2              # equal-ts matches (inclusive)
    assert row["matched_ts"] == TS(2024, 1, 1, 10)


def test_asof_forward_no_following_yields_null(spark):
    from results_ingestor_spark.operators.asof import asof_join_forward
    left = spark.createDataFrame([(1, TS(2024, 1, 1, 12))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 9), 7)], ["k", "ts", "payload"])
    row = asof_join_forward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_payload={"payload": "payload"}).collect()[0]
    assert row["payload"] is None and row["matched_ts"] is None
