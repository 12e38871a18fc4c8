"""Query library exported through __spark_entry__.py.

Each module registers (name → Spark callable, name → DuckDB oracle SQL)
pairs via the decorator in registry.py.  Importing this package pulls in
every module so the registries are fully populated.
"""

from results_ingestor_spark.plans.registry import ORACLES, QUERIES, query

# Import for registration side effects — order defines judge-facing listing.
from results_ingestor_spark.plans import election_q  # noqa: E402,F401
from results_ingestor_spark.plans import relational  # noqa: E402,F401
from results_ingestor_spark.plans import tpch_q  # noqa: E402,F401
from results_ingestor_spark.plans import windows  # noqa: E402,F401
from results_ingestor_spark.plans import events_q  # noqa: E402,F401
from results_ingestor_spark.plans import functions_q  # noqa: E402,F401
from results_ingestor_spark.plans import joins_q  # noqa: E402,F401
from results_ingestor_spark.plans import advanced_q  # noqa: E402,F401
from results_ingestor_spark.plans import text_q  # noqa: E402,F401
from results_ingestor_spark.plans import dedup_q  # noqa: E402,F401
from results_ingestor_spark.plans import similarity_q  # noqa: E402,F401
from results_ingestor_spark.plans import multimodal_q  # noqa: E402,F401
from results_ingestor_spark.plans import pipeline_q  # noqa: E402,F401
from results_ingestor_spark.plans import graph_q  # noqa: E402,F401
from results_ingestor_spark.plans import spatial_q  # noqa: E402,F401
from results_ingestor_spark.plans import stats_q  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
