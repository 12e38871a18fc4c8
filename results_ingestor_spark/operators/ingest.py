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


def canonicalize_result_frame(df: DataFrame,
                              mapping: dict[str, str] | None = None,
                              schema: T.StructType = CONTEST_PRECINCT_SCHEMA,
                              streaming: bool = False) -> DataFrame:
    """Raw result rows → canonical, typed frame (map → extract → align).

    Works on batch AND streaming DataFrames: the fuzzy mapping is a
    driver-side metadata step (column names only), and ``streaming=True``
    forces the extraction (its trigger predicate is an eager ``take(1)``,
    which an unbounded plan cannot run — the stream case knows district
    is absent from raw files, so forcing is semantically identical)."""
    if mapping is None:
        mapping = suggest_mapping(df.columns, [f.name for f in schema.fields])
    df = apply_mapping(df, mapping)
    if "contest_name" in df.columns:
        df = extract_district(df, force=streaming)
    return align_schema(df, schema)


def ingest_result_files(spark: SparkSession, paths: list[str] | str,
                        mapping: dict[str, str] | None = None,
                        schema: T.StructType = CONTEST_PRECINCT_SCHEMA,
                        ) -> DataFrame:
    """Read staged result files → canonical, typed DataFrame.

    ``mapping`` (source header → canonical name) defaults to the fuzzy
    suggestion; pass an edited dict to mirror the reference's UI step.

    Reads untyped (``infer_schema=False``): ``align_schema`` casts every
    kept column to the canonical type anyway, so the inference pass —
    a full eager scan of the input per plan build — would only compute
    types this pipeline immediately discards.  String→type casts are
    exactly the inference coercions (ints, dates, booleans parse the
    same), and the ``Not Found``→NULL sentinel applies at read either
    way.
    """
    return canonicalize_result_frame(
        read_result_files(spark, paths, infer_schema=False),
        mapping=mapping, schema=schema)
