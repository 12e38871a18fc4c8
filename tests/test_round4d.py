"""Semantic invariants for the round-4d additions (DP noisy counts,
Fellegi-Sunter scoring, LOO target encoding, local clustering, RAKE,
dimension-truncation recall, kNN label agreement, langid confusion,
join-view IVM, grid hotspots).  The oracle gate already checks
cross-engine equality cell-for-cell; these pin the MEANING of the
numbers (bounds, identities, monotonicities) so a future edit that
changes semantics while staying self-consistent across engines still
trips a test."""

from __future__ import annotations

import math

import pandas as pd

from results_ingestor_spark.operators.text import STOPWORDS
from results_ingestor_spark.plans import QUERIES


def test_dp_noise_is_bounded_and_nonzero(spark, sf_dir):
    """Laplace(b=1) noise: finite, not identically zero across cells,
    and |noise| < 26 with overwhelming margin (P[|x|>26] ~ 5e-12 per
    cell — a failure means the draw broke, not bad luck)."""
    rows = QUERIES["privacy_dp_noisy_counts"](spark, sf_dir).collect()
    assert rows, "no cells"
    devs = []
    for r in rows:
        assert math.isfinite(r.noisy_count)
        frac = abs(r.noisy_count - round(r.noisy_count))
        devs.append(frac)
        assert abs(r.noisy_count) < 10**9
    assert max(devs) > 0, "every cell landed on an integer: noise absent"


def test_fs_scores_rank_agreement_above_disagreement(spark, sf_dir):
    out = QUERIES["er_fellegi_sunter_scores"](spark, sf_dir).collect()
    assert out
    pats = {r.pattern for r in out}
    assert pats <= {a + b for a in "Ff" for b in "Mm."}
    by_pat = {}
    for r in out:
        by_pat.setdefault(r.pattern, []).append(r.fs_score)
    # full agreement outranks full disagreement wherever both appear
    if "FM" in by_pat and "fm" in by_pat:
        assert min(by_pat["FM"]) > max(by_pat["fm"])
    # adding a middle-name agreement never lowers the score
    if "FM" in by_pat and "F." in by_pat:
        assert min(by_pat["FM"]) > max(by_pat["F."]) - 1e-9


def test_target_encoding_matches_pandas_model(spark, sf_dir):
    """Brute-force pandas recompute of the LOO encoding on the full
    sf0.001 slice — independent of both engines in the gate."""
    from results_ingestor_spark.sources.tables import load_tables
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = t["orders"].toPandas()
    c = t["customer"].toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["y"] = df["o_totalprice"].round(2)
    gm = df["y"].sum() / len(df)
    g = df.groupby("c_mktsegment")["y"].agg(["sum", "count"])
    df = df.join(g, on="c_mktsegment")
    expected = ((df["sum"] - df["y"] + 10.0 * gm)
                / (df["count"] - 1 + 10.0)).round(2)
    got = (QUERIES["feature_target_encoding_loo"](spark, sf_dir)
           .toPandas().set_index("o_orderkey")["te_loo"])
    exp = pd.Series(expected.values, index=df["o_orderkey"]).sort_index()
    assert (got.sort_index() - exp).abs().max() <= 0.011


def test_local_clustering_bounds(spark, sf_dir):
    for r in QUERIES["graph_local_clustering"](spark, sf_dir).collect():
        assert r.degree >= 2
        assert 0.0 <= r.lcc <= 1.0
        assert r.n_triangles <= r.degree * (r.degree - 1) // 2
        assert abs(r.lcc - round(2.0 * r.n_triangles
                                 / (r.degree * (r.degree - 1.0)), 9)) < 1e-12


def test_rake_keywords_are_stopword_free(spark, sf_dir):
    rows = QUERIES["text_rake_keywords"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        words = r.keyword.split(" ")
        assert 1 <= len(words) <= 4 and len(words) == r.plen
        assert not (set(words) & set(STOPWORDS))
        assert r.rake_score > 0 and r.n_occ >= 1


def test_dim_truncation_recall_bounds(spark, sf_dir):
    rows = QUERIES["ann_dim_truncation_recall"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert abs(r.recall_at_10 - r.n_hits / 10.0) < 1e-9


def test_knn_vote_consistency(spark, sf_dir):
    rows = QUERIES["knn_label_accuracy"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r.n_votes <= 10
        assert r.correct == (r.pred_label == r.true_label)


def test_langid_confusion_rows_sum_to_one(spark, sf_dir):
    df = QUERIES["text_langid_confusion"](spark, sf_dir).toPandas()
    assert (df.groupby("lang")["n"].sum() == df.groupby("lang")["support"]
            .first()).all()
    shares = df.groupby("lang")["row_share"].sum()
    assert ((shares - 1.0).abs() < 1e-4).all()


def test_join_view_merge_is_exact(spark, sf_dir):
    rows = QUERIES["incremental_join_view_merge"](spark, sf_dir).collect()
    assert rows and all(r.matches_direct for r in rows)


def test_hotspot_smoothing_dominates_center(spark, sf_dir):
    rows = QUERIES["spatial_grid_density_hotspots"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.cx <= 99 and 0 <= r.cy <= 99
        assert r.smoothed >= r.n_points >= 0


def test_gradient_match_scores_sorted_and_bounded(spark, sf_dir):
    rows = QUERIES["data_selection_gradient_match"](spark, sf_dir).collect()
    assert len(rows) == 50
    scores = [r.influence for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(math.isfinite(s) for s in scores)
    assert all(r.label in (0.0, 1.0) for r in rows)


def test_sample_size_formula_properties(spark, sf_dir):
    rows = QUERIES["stats_sample_size_two_proportions"](spark, sf_dir) \
        .collect()
    assert rows
    for r in rows:
        assert 0.0 < r.p1 < 1.0 and r.p1 < r.p2 <= 0.999999
        assert r.n_per_arm > 0
        # closed-form recompute with the same literals
        pbar = (r.p1 + r.p2) / 2.0
        num = (1.959963985 * math.sqrt(2.0 * pbar * (1.0 - pbar))
               + 0.8416212336 * math.sqrt(r.p1 * (1.0 - r.p1)
                                          + r.p2 * (1.0 - r.p2))) ** 2
        assert abs(r.n_per_arm - num / (r.p2 - r.p1) ** 2) < 0.02


def test_haversine_nearest_within_block_bound(spark, sf_dir):
    rows = QUERIES["spatial_haversine_nearest"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 3x3 one-degree block at |lat| <= 60: diagonal < 360 km
        assert 0.0 <= r.dist_km < 360.0
        assert r.cand_id != r.probe_id


def test_sprt_decision_consistency(spark, sf_dir):
    rows = QUERIES["stats_sprt_monitoring"](spark, sf_dir).collect()
    assert rows
    a = 2.9444389791664403
    for r in rows:
        assert 0 <= r.s_at <= r.n_at
        if r.decision == "accept_h1":
            assert r.llr >= a
        elif r.decision == "accept_h0":
            assert r.llr <= -a
        else:
            assert r.decision == "continue" and -a < r.llr < a


def test_ivf_index_stats_identities(spark, sf_dir):
    rows = QUERIES["ann_ivf_index_stats"](spark, sf_dir).collect()
    assert len(rows) == 10
    total = sum(r.n_vecs for r in rows)
    lam = rows[0].imbalance_factor
    assert all(abs(r.imbalance_factor - lam) < 1e-12 for r in rows)
    assert lam >= 0.999999  # Cauchy-Schwarz: lambda >= 1
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert abs(lam - round(10 * sum(r.n_vecs**2 for r in rows)
                           / total**2, 6)) < 1e-9
