"""The full ingest pipeline — the reference's fetch→map→ingest flow
(ingestor_precinct.py:70-225) as one composable, lazy Spark plan.

    stage(url)  →  read_result_files  →  suggest_mapping (driver-side)
      →  apply_mapping  →  extract_district  →  align_schema  →  sink

The human-in-the-loop confirmation of the reference becomes an optional
``mapping`` override: callers inspect ``suggest_mapping``'s result and
pass back corrections, keeping the plan itself uninterrupted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from results_ingestor_spark.operators.align import align_schema
from results_ingestor_spark.operators.district import extract_district
from results_ingestor_spark.operators.mapping import apply_mapping, suggest_mapping
from results_ingestor_spark.schemas import CONTEST_PRECINCT_SCHEMA
from results_ingestor_spark.sources.csv_source import read_result_files


def ingest_result_files(spark: SparkSession, paths: list[str] | str,
                        mapping: dict[str, str] | None = None,
                        schema: T.StructType = CONTEST_PRECINCT_SCHEMA,
                        ) -> DataFrame:
    """Read staged result files → canonical, typed DataFrame.

    ``mapping`` (source header → canonical name) defaults to the fuzzy
    suggestion; pass an edited dict to mirror the reference's UI step.
    """
    df = read_result_files(spark, paths)
    if mapping is None:
        mapping = suggest_mapping(df.columns, [f.name for f in schema.fields])
    df = apply_mapping(df, mapping)
    if "contest_name" in df.columns:
        df = extract_district(df)
    return align_schema(df, schema)
