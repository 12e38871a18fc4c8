"""Flagship election pipeline queries (reference parity, SURVEY §2.2-2.3).

``rollup_contest_county`` is the end-to-end flagship: synthesize
contest_precinct from the TPC-H-ish corpus, run the three-pass district
extraction (ingestor_precinct.py:165-183), then the county rollup
(README.md:59-91).  ``district_extraction`` checks the extraction passes
in isolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from results_ingestor_spark.operators.district import extract_district
from results_ingestor_spark.operators.election import (
    CONTEST_PRECINCT_SQL, contest_precinct_frame)
from results_ingestor_spark.operators.rollup import county_rollup
from results_ingestor_spark.plans.oracles import (
    county_rollup_sql, district_extract_sql)
from results_ingestor_spark.plans.registry import query

_EXTRACTED_SQL = district_extract_sql(CONTEST_PRECINCT_SQL)


@query("contest_precinct_synth", oracle=CONTEST_PRECINCT_SQL)
def contest_precinct_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized precinct frame itself — validates the projection +
    broadcast-join derivation before any downstream operator."""
    return contest_precinct_frame(spark, sf_dir)


@query("district_extraction", oracle=_EXTRACTED_SQL)
def district_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-pass district extraction with §2.2.1 sequential-mutation
    semantics (uppercase+truncate on match, leading-space district,
    last-occurrence split)."""
    return extract_district(contest_precinct_frame(spark, sf_dir), force=True)


@query("rollup_contest_county", oracle=county_rollup_sql(_EXTRACTED_SQL))
def rollup_contest_county(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full ingest → extract → county rollup pipeline."""
    precinct = extract_district(contest_precinct_frame(spark, sf_dir), force=True)
    return county_rollup(precinct)
