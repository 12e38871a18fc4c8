"""Pin the wire boundary in plans/registry.py::_ntz_wire.

Round-7 review finding: the original wrapper cast only TOP-LEVEL
TimestampType columns, while its docstring promised no LTZ column can
reach the gate — a query returning an unflattened ``F.window`` struct
(or an array/map of timestamps) would have leaked OS-timezone-sensitive
wall clocks.  The wire is now recursive; these tests pin that.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from results_ingestor_spark.plans.registry import _ntz_wire


def _types(df):
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def test_top_level_timestamp_cast(spark):
    df = spark.sql("SELECT TIMESTAMP'2024-01-01 12:00:00' AS ts, 1 AS n")
    out = _ntz_wire(df)
    assert _types(out) == {"ts": "timestamp_ntz", "n": "int"}


def test_nested_struct_array_map_timestamps_cast(spark):
    df = spark.sql("""
        SELECT named_struct('start', TIMESTAMP'2024-01-01 00:00:00',
                            'label', 'x') AS w,
               array(TIMESTAMP'2024-01-02 00:00:00') AS arr,
               map('k', TIMESTAMP'2024-01-03 00:00:00') AS m
    """)
    out = _ntz_wire(df)
    t = _types(out)
    assert t["w"] == "struct<start:timestamp_ntz,label:string>"
    assert t["arr"] == "array<timestamp_ntz>"
    assert t["m"] == "map<string,timestamp_ntz>"
    # values survive as the same wall clock
    r = out.first()
    assert r["w"]["start"].isoformat() == "2024-01-01T00:00:00"
    assert r["arr"][0].isoformat() == "2024-01-02T00:00:00"
    assert r["m"]["k"].isoformat() == "2024-01-03T00:00:00"


def test_window_struct_is_covered(spark):
    """The concrete leak shape from the review: groupBy(F.window(...))
    returned without flattening."""
    df = (spark.sql("SELECT TIMESTAMP'2024-01-01 00:30:00' AS ts")
          .groupBy(F.window("ts", "1 hour").alias("w"))
          .agg(F.count("*").alias("n")))
    out = _ntz_wire(df)
    wt = dict(_types(out))["w"]
    assert wt == "struct<start:timestamp_ntz,end:timestamp_ntz>"


def test_no_timestamp_is_passthrough(spark):
    df = spark.range(3).select(F.col("id"), F.lit("a").alias("s"))
    assert _ntz_wire(df) is df


def test_ntz_input_untouched(spark):
    df = spark.sql("SELECT TIMESTAMP_NTZ'2024-01-01 00:00:00' AS ts")
    out = _ntz_wire(df)
    assert out is df  # already NTZ — nothing to replace
