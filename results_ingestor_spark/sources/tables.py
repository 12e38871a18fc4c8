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
    return {n: spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
            for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() plans over them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
