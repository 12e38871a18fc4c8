"""Cross-entry consistency: identities that must hold BETWEEN
independently-implemented registry entries.  Each assertion ties two
plans that compute overlapping quantities through different pipelines,
so a regression in either one (or a silent semantic drift in a shared
helper) trips even if both entries stay individually oracle-green."""

from __future__ import annotations

import math

from results_ingestor_spark.plans import QUERIES


def test_token_totals_agree_across_three_entries(spark, sf_dir):
    """Corpus token counts: the per-doc census (text_tokens), the
    per-source concentration table, and the corpus-level richness
    report must all see the same token population."""
    per_doc = sum(r.n_tokens for r in
                  QUERIES["text_tokens"](spark, sf_dir).collect())
    per_source = sum(r.n_tokens for r in
                     QUERIES["text_vocab_concentration"](spark, sf_dir)
                     .collect())
    corpus = QUERIES["text_vocabulary_richness"](spark, sf_dir) \
        .collect()[0]
    assert per_doc == per_source == corpus.n_tokens


def test_hapax_and_vocab_source_vs_corpus_inequalities(spark, sf_dir):
    """A term unique corpus-wide is unique within its source, but not
    vice versa: corpus hapax count <= sum of per-source hapax counts;
    likewise corpus vocabulary <= sum of per-source vocabularies, with
    equality only if no term crosses sources."""
    conc = QUERIES["text_vocab_concentration"](spark, sf_dir).collect()
    rich = QUERIES["text_vocabulary_richness"](spark, sf_dir) \
        .collect()[0]
    assert rich.n1 <= sum(r.n_hapax for r in conc)
    assert rich.v_obs <= sum(r.vocab for r in conc)


def test_triangle_counts_agree_across_graph_entries(spark, sf_dir):
    """graph_triangle_count and graph_global_transitivity enumerate
    triangles through separately-written plans — identical counts."""
    tri = QUERIES["graph_triangle_count"](spark, sf_dir).collect()[0]
    trans = QUERIES["graph_global_transitivity"](spark, sf_dir) \
        .collect()[0]
    assert tri.n_triangles == trans.n_triangles


def test_isotropy_agrees_with_whitening_before_side(spark, sf_dir):
    """embedding_isotropy_score and embedding_whitening_effect compute
    the same 'before' average pairwise cosine through different plan
    shapes — identical at the snap precision."""
    iso = QUERIES["embedding_isotropy_score"](spark, sf_dir).collect()[0]
    wh = QUERIES["embedding_whitening_effect"](spark, sf_dir).collect()[0]
    assert math.isclose(iso.avg_pairwise_cosine, wh.avg_cos_before,
                        abs_tol=2e-6)
    assert iso.n_vecs == wh.n_vecs


def test_burstiness_df_bounded_by_novelty_population(spark, sf_dir):
    """Every term's document frequency (burstiness table) is bounded
    by the document population the novelty census aggregates over."""
    n_docs = sum(r.n_docs for r in
                 QUERIES["text_novelty_unique_ngrams"](spark, sf_dir)
                 .collect())
    burst = QUERIES["text_term_burstiness"](spark, sf_dir).collect()
    assert all(0 < r.df <= n_docs for r in burst)


def test_gap_curve_agrees_with_sessionize_and_reliability(spark, sf_dir):
    """Three independent sessionization consumers must agree on the
    30-minute session count: the gap-threshold curve's identity
    (#users + #boundary gaps), the reliability report's per-session
    census, and events_sessionize's actual session table."""
    curve = {r.threshold_min: r.n_sessions for r in
             QUERIES["events_session_gap_curve"](spark, sf_dir)
             .collect()}
    rel = QUERIES["events_reliability_report"](spark, sf_dir).collect()[0]
    n_sessionize = QUERIES["events_sessionize"](spark, sf_dir).count()
    assert curve[30] == rel.n_sessions == n_sessionize
