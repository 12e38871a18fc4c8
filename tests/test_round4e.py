"""Semantic invariants for the round-4e stats additions (one-way
ANOVA, Kruskal-Wallis, Spearman/Pearson, permutation test).  The
oracle gate already checks cross-engine equality cell-for-cell; these
recompute each statistic with an independent pandas model so an edit
that changes the math identically in both engines still trips."""

from __future__ import annotations

import math

from results_ingestor_spark.plans import QUERIES
from results_ingestor_spark.sources.tables import load_tables


def _events_pdf(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("events",))
    pdf = t["events"].toPandas()
    pdf["v"] = pdf["value"].round(2)
    return pdf


def test_anova_f_matches_pandas_model(spark, sf_dir):
    row = QUERIES["stats_anova_oneway_f"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    g = pdf.groupby("event_type")["v"]
    nn, k = len(pdf), g.ngroups
    grand = pdf["v"].sum()
    ssb = sum(s * s / n for s, n in zip(g.sum(), g.count())) \
        - grand * grand / nn
    ssw = (pdf["v"] ** 2).sum() - sum(
        s * s / n for s, n in zip(g.sum(), g.count()))
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert row.k == k and row.n_total == nn
    assert math.isclose(row.ss_between, ssb, rel_tol=1e-6)
    assert math.isclose(row.ss_within, ssw, rel_tol=1e-6)
    assert math.isclose(row.f_stat, f, rel_tol=1e-6)
    # decomposition identity: SSB + SSW == total sum of squares
    sst = (pdf["v"] ** 2).sum() - grand * grand / nn
    assert math.isclose(row.ss_between + row.ss_within, sst, rel_tol=1e-9)


def test_kruskal_wallis_matches_pandas_model(spark, sf_dir):
    row = QUERIES["stats_kruskal_wallis"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    pdf["rk"] = pdf["v"].rank(method="average")
    nn = len(pdf)
    h = 12.0 / (nn * (nn + 1)) * sum(
        rs * rs / n for rs, n in zip(
            pdf.groupby("event_type")["rk"].sum(),
            pdf.groupby("event_type")["rk"].count())) - 3.0 * (nn + 1)
    counts = pdf.groupby("v")["v"].count()
    c = 1.0 - float((counts ** 3 - counts).sum()) / (nn ** 3 - nn)
    assert row.n_total == nn
    assert math.isclose(row.h_tie_adj, h / c, rel_tol=1e-6)
    assert row.h_tie_adj >= 0


def test_spearman_matches_pandas(spark, sf_dir):
    row = QUERIES["stats_spearman_rho"](spark, sf_dir).collect()[0]
    t = load_tables(spark, sf_dir, ("lineitem",))
    pdf = t["lineitem"].select("l_quantity", "l_discount").toPandas()
    pdf["x"] = pdf["l_quantity"].astype("int64")
    pdf["y"] = (pdf["l_discount"] * 100).round().astype("int64")
    rho = (pdf["x"].rank(method="average")
           .corr(pdf["y"].rank(method="average"), method="pearson"))
    r = pdf["x"].corr(pdf["y"], method="pearson")
    assert row.n == len(pdf)
    assert math.isclose(row.spearman_rho, rho, abs_tol=1e-9)
    assert math.isclose(row.pearson_r, r, abs_tol=1e-9)


def test_permutation_test_p_and_observed_stat(spark, sf_dir):
    row = QUERIES["stats_permutation_test_mean"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    pdf = pdf[pdf["event_type"].isin(["click", "view"])]
    d = abs(pdf[pdf.event_type == "click"]["v"].mean()
            - pdf[pdf.event_type == "view"]["v"].mean())
    assert row.n_click == int((pdf.event_type == "click").sum())
    assert row.n_view == int((pdf.event_type == "view").sum())
    assert math.isclose(row.abs_mean_diff, d, rel_tol=1e-6)
    # add-one smoothing bounds and internal consistency
    assert math.isclose(row.p_value, (1 + row.n_extreme) / 65.0,
                        rel_tol=1e-9)
    assert 1 / 65.0 <= row.p_value <= 1.0
