"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in results_ingestor_spark/; the query registry is
results_ingestor_spark/plans (one module per operator family, each entry
registering its Spark plan and DuckDB oracle together).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from results_ingestor_spark import plans
from results_ingestor_spark.plans.election_q import rollup_contest_county


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: contest_precinct synthesis → three-pass district
    extraction → county rollup (README.md:59-91) on sf0.001."""
    return rollup_contest_county(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(plans.ORACLES)
