"""Parquet table loading for the driver's synthetic test corpus.

Parquet is the engine's native at-rest format (columnar, vectorized
reader, predicate/column pushdown) — the Spark-first replacement for the
reference's row-oriented Postgres store (ingestor_precinct.py:54,192).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from results_ingestor_spark.session import tune_session

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLE_NAMES) -> dict[str, DataFrame]:
    """Load the synthetic tables as lazy DataFrames.

    Also pins runtime confs (UTC session timezone, AQE) on the session —
    the driver hands us an externally-created one.
    """
    tune_session(spark)
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        if n == "events":
            df = _normalize_events(df)
        out[n] = df
    return out


def ensure_min_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition only when the upstream scan yields fewer splits than
    cores (small files / few parquet row groups — a local-testdata
    artifact).  At production scale the scan has far more splits than
    cores and this is a no-op, so no gratuitous shuffle is added.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores * factor)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet.  Spark reads it as long
    nanoseconds (legacy.parquet.nanosAsLong); convert to a microsecond
    timestamp — the same truncation DuckDB applies when it coerces
    TIMESTAMP_NS to its native TIMESTAMP."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    ts_field = next((f for f in df.schema.fields if f.name == "ts"), None)
    if ts_field is not None and isinstance(ts_field.dataType, T.LongType):
        # integer division — double division would lose precision on
        # 19-digit nanosecond values and drift by ±1 µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() plans over them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
