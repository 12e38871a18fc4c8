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


def test_source_unigram_kl_shape_and_sign(spark, sf_dir):
    rows = QUERIES["source_unigram_kl"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        assert 0 < r.p <= 1 and 0 < r.q <= 1
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert len(rs) == 10, src
        # the top contributor is an over-represented token: p > q
        top = max(rs, key=lambda r: r.kl_contrib)
        assert top.kl_contrib > 0 and top.p > top.q


def test_monthly_streaks_matches_pandas_model(spark, sf_dir):
    rows = QUERIES["orders_monthly_streaks"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("orders",))
    pdf = t["orders"].select("o_custkey", "o_orderdate").toPandas()
    pdf["mi"] = (pdf["o_orderdate"].map(lambda d: d.year * 12 + d.month))
    hist = {}
    for _, months in pdf.groupby("o_custkey")["mi"]:
        ms = sorted(set(months))
        best = run = 1
        for a, b in zip(ms, ms[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        hist[best] = hist.get(best, 0) + 1
    assert {(r.streak_months, r.n_customers) for r in rows} == set(hist.items())
    assert sum(r.n_customers for r in rows) == pdf["o_custkey"].nunique()


def test_jaccard_topk_matches_neighbor_sets(spark, sf_dir):
    from results_ingestor_spark.operators.graph import copurchase_edges
    rows = QUERIES["graph_jaccard_topk"](spark, sf_dir).collect()
    assert rows
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    edges = {(r.u, r.v) for r in copurchase_edges(li, min_weight=2)
             .select("u", "v").collect()}
    nbr = {}
    for u, v in edges:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    for r in rows:
        assert (r.a, r.b) not in edges and (r.b, r.a) not in edges
        inter = nbr[r.a] & nbr[r.b]
        union = nbr[r.a] | nbr[r.b]
        assert r.cn == len(inter)
        assert math.isclose(r.jaccard, len(inter) / len(union),
                            abs_tol=1e-9)
        assert 0 < r.jaccard <= 1


def test_ndcg_matches_numpy_model(spark, sf_dir):
    import numpy as np
    rows = QUERIES["search_ndcg_at_k"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("embeddings",))
    pdf = t["embeddings"].toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    labels = dict(zip(pdf["vec_id"], pdf["label"]))
    disc = 1.0 / np.log2(np.arange(2, 12))
    by_q = {r.query_id: r for r in rows}
    assert len(by_q) == 20
    for q in range(20):
        qi = int(np.where(ids == q)[0][0])
        sims = np.round(mat @ mat[qi], 9)
        order = sorted((i for i in range(len(ids)) if ids[i] != q),
                       key=lambda i: (-sims[i], ids[i]))[:10]
        rel = np.array([1 if labels[ids[i]] == labels[q] else 0
                        for i in order], dtype=float)
        dcg = float((rel * disc).sum())
        n_rel_corpus = sum(1 for v, l in labels.items()
                           if l == labels[q] and v != q)
        idcg = float(disc[:min(n_rel_corpus, 10)].sum())
        want = dcg / idcg if idcg else 0.0
        got = by_q[q]
        assert got.n_rel_at_k == int(rel.sum())
        assert math.isclose(got.ndcg_at_k, want, abs_tol=1e-6), (q, want)
        assert 0.0 <= got.ndcg_at_k <= 1.0
