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


def test_hits_matches_python_model(spark, sf_dir):
    rows = QUERIES["graph_hits_bipartite_topk"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].select("o_custkey", "o_orderkey").toPandas()
    li = t["lineitem"].select("l_orderkey", "l_partkey").toPandas()
    e = (o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
         [["o_custkey", "l_partkey"]].drop_duplicates())
    pairs = list(zip(e["o_custkey"], e["l_partkey"]))
    h1, a1, h2, a2 = {}, {}, {}, {}
    for c, _ in pairs:
        h1[c] = h1.get(c, 0) + 1
    for c, p in pairs:
        a1[p] = a1.get(p, 0) + h1[c]
    for c, p in pairs:
        h2[c] = h2.get(c, 0) + a1[p]
    for c, p in pairs:
        a2[p] = a2.get(p, 0) + h2[c]
    hubs = sorted(h2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    auths = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got_h = [(r.node, r.score) for r in rows if r.side == "hub"]
    got_a = [(r.node, r.score) for r in rows if r.side == "authority"]
    assert got_h == hubs and got_a == auths
    for r in rows:
        assert 0 < r.norm_score <= 1.0


def test_bh_adjustment_is_stepup_monotone(spark, sf_dir):
    rows = sorted(QUERIES["stats_benjamini_hochberg"](spark, sf_dir)
                  .collect(), key=lambda r: r.p_rank)
    m = len(rows)
    assert sorted(r.p_rank for r in rows) == list(range(1, m + 1))
    # recompute the step-up adjustment from the raw p-values
    tail_min = 1.0
    want = {}
    for r in sorted(rows, key=lambda r: -r.p_rank):
        tail_min = min(tail_min, r.p_raw * m / r.p_rank)
        want[r.event_type] = min(1.0, tail_min)
    for r in rows:
        assert math.isclose(r.p_bh, want[r.event_type], abs_tol=1e-9)
        assert r.p_raw <= r.p_bh + 1e-12
        assert r.reject_fdr10 == (r.p_bh <= 0.10)
    # adjusted p is monotone in rank order
    for a, b in zip(rows, rows[1:]):
        assert a.p_bh <= b.p_bh + 1e-12


def test_kneser_ney_matches_python_model(spark, sf_dir):
    rows = {r.doc_id: r for r in
            QUERIES["lm_bigram_kneser_ney"](spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("doc_id", "text").toPandas()
    cb, c1, nfol, npre = {}, {}, {}, {}
    docs = {}
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        toks = text.split(" ")
        bgs = list(zip(toks, toks[1:]))
        docs[did] = bgs
        for b in bgs:
            cb[b] = cb.get(b, 0) + 1
    for (w1, w2), c in cb.items():
        c1[w1] = c1.get(w1, 0) + c
        nfol[w1] = nfol.get(w1, 0) + 1
        npre[w2] = npre.get(w2, 0) + 1
    nbt = len(cb)
    for did, bgs in list(docs.items())[:50]:
        lps = []
        for w1, w2 in bgs:
            p = (max(cb[(w1, w2)] - 0.75, 0.0) / c1[w1]
                 + (0.75 * nfol[w1] / c1[w1]) * (npre[w2] / nbt))
            lps.append(round(math.log(p), 9))
        want = sum(lps) / len(lps)
        got = rows[did]
        assert got.n_bigrams == len(bgs)
        assert math.isclose(got.avg_logprob_kn, want, abs_tol=1e-5), did


def test_kneser_ney_probabilities_sum_to_one(spark, sf_dir):
    """KN is a proper conditional distribution: for a fixed context w1,
    Σ_w2 P(w2|w1) over the full vocabulary == 1 (the discount mass
    exactly funds the continuation back-off).  Checked in pure Python
    for the highest-frequency context."""
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("text").toPandas()
    cb, c1, nfol, npre = {}, {}, {}, {}
    vocab = set()
    for text in pdf["text"]:
        toks = text.split(" ")
        vocab.update(toks)
        for b in zip(toks, toks[1:]):
            cb[b] = cb.get(b, 0) + 1
    for (w1, w2), c in cb.items():
        c1[w1] = c1.get(w1, 0) + c
        nfol[w1] = nfol.get(w1, 0) + 1
        npre[w2] = npre.get(w2, 0) + 1
    nbt = len(cb)
    w1 = max(c1, key=c1.get)
    total = sum(
        max(cb.get((w1, w2), 0) - 0.75, 0.0) / c1[w1]
        + (0.75 * nfol[w1] / c1[w1]) * (npre.get(w2, 0) / nbt)
        for w2 in vocab)
    # continuation mass sums to Σ npre / nbt == 1 over the vocabulary
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_rfm_migration_marginals(spark, sf_dir):
    rows = QUERIES["rfm_segment_migration"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("orders",))
    pdf = t["orders"].select("o_custkey", "o_orderdate").toPandas()
    mid = (pdf["o_orderdate"].map(lambda d: d.timestamp()).min()
           + pdf["o_orderdate"].map(lambda d: d.timestamp()).max()) / 2
    h1 = set(pdf[pdf["o_orderdate"].map(lambda d: d.timestamp()) < mid]
             ["o_custkey"])
    h2 = set(pdf[pdf["o_orderdate"].map(lambda d: d.timestamp()) >= mid]
             ["o_custkey"])
    both = len(h1 & h2)
    assert sum(r.n_customers for r in rows) == both
    # quintile marginals: each h1 segment holds ~1/5 of the h1-active
    # customers that survived into h2 — bounded by the ntile remainder
    for s in range(1, 6):
        m = sum(r.n_customers for r in rows if r.seg_h1 == s)
        assert m <= len(h1) // 5 + 1


def test_kmv_matches_hashlib_model(spark, sf_dir):
    import hashlib
    rows = QUERIES["sketch_kmv_distinct"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("events",))
    pdf = t["events"].select("event_type", "value").toPandas()
    # r11 DECCAST migration: the hash key is the BIGINT cents string
    # (shared IEEE floor-snap), not the DECIMAL(12,2) canonical form
    pdf["dec"] = pdf["value"].map(
        lambda v: str(int(math.floor(v * 100 + 0.5))))
    for r in rows:
        vals = set(pdf[pdf.event_type == r.event_type]["dec"])
        assert r.n_exact == len(vals)
        hs = sorted(int(hashlib.md5(f"kmv:{v}".encode())
                        .hexdigest()[:15], 16) for v in vals)
        if len(hs) < 64:
            want = float(len(hs))
        else:
            want = 63 * 2**60 / hs[63]
        assert math.isclose(r.kmv_est, want, rel_tol=1e-6)
        assert math.isclose(r.rel_err, abs(want - len(vals)) / len(vals),
                            abs_tol=1e-5)


def test_cochran_armitage_matches_pandas_model(spark, sf_dir):
    row = QUERIES["stats_cochran_armitage_trend"](spark, sf_dir).collect()[0]
    t = load_tables(spark, sf_dir, ("lineitem",))
    pdf = t["lineitem"].select("l_discount", "l_returnflag").toPandas()
    pdf["w"] = (pdf["l_discount"] * 100).round().astype("int64")
    pdf["r"] = (pdf["l_returnflag"] == "R").astype("int64")
    g = pdf.groupby("w").agg(n=("r", "size"), r=("r", "sum"))
    nn, rr = len(pdf), int(pdf["r"].sum())
    num = nn * (g.index * g["r"]).sum() - rr * (g.index * g["n"]).sum()
    vker = nn * (g.index**2 * g["n"]).sum() - (g.index * g["n"]).sum()**2
    z = num / math.sqrt(rr * (nn - rr) * vker / nn)
    assert row.n_total == nn and row.n_success == rr
    assert math.isclose(row.z, z, rel_tol=1e-6)


def test_dbscan_roles_match_bruteforce(spark, sf_dir):
    rows = {r.role: r for r in
            QUERIES["spatial_dbscan_roles"](spark, sf_dir).collect()}
    from results_ingestor_spark.operators.spatial import synth_points
    from pyspark.sql import functions as F
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    pts = synth_points(ev.select(F.col("event_id").alias("point_id"))
                       ).toPandas()
    xy = list(zip(pts["point_id"], pts["x"], pts["y"]))
    eps2 = 250 * 250
    nsize, coreset = {}, set()
    for i, (pid, x, y) in enumerate(xy):
        c = 1 + sum(1 for (qid, qx, qy) in xy
                    if qid != pid and (x - qx) ** 2 + (y - qy) ** 2 <= eps2)
        nsize[pid] = c
        if c >= 5:
            coreset.add((x, y, pid))
    border = noise = 0
    for pid, x, y in xy:
        if nsize[pid] >= 5:
            continue
        if any((x - cx) ** 2 + (y - cy) ** 2 <= eps2
               for (cx, cy, cid) in coreset if cid != pid):
            border += 1
        else:
            noise += 1
    want = {"core": sum(1 for v in nsize.values() if v >= 5),
            "border": border, "noise": noise}
    got = {k: rows[k].n_points if k in rows else 0 for k in want}
    assert got == {k: v for k, v in want.items()}
    assert sum(got.values()) == len(xy)


def test_dp_median_accuracy_and_determinism(spark, sf_dir):
    q = QUERIES["privacy_dp_median_expmech"]
    r1 = q(spark, sf_dir).collect()[0]
    r2 = q(spark, sf_dir).collect()[0]
    assert r1 == r2, "mechanism must be replay-deterministic"
    # utility guarantee sanity: the exponential mechanism concentrates
    # near the true median; at eps=1 the doubled rank offset should be
    # far below the worst case n
    assert 0 <= r1.rank_offset_x2 < r1.n
    assert r1.dp_median_cents > 0


def test_wilson_ci_brackets_phat_and_matches_formula(spark, sf_dir):
    rows = QUERIES["stats_wilson_ci_proportion"](spark, sf_dir).collect()
    z = 1.959963984540054
    for r in rows:
        p, n = r.s / r.n, r.n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert math.isclose(r.ci_lo, center - half, abs_tol=1e-9)
        assert math.isclose(r.ci_hi, center + half, abs_tol=1e-9)
        assert r.ci_lo <= p <= r.ci_hi
        assert 0.0 <= r.ci_lo <= r.ci_hi <= 1.0


def test_knn_graph_edges_verified_brute_force(spark, sf_dir):
    import numpy as np
    rows = QUERIES["ann_knn_graph_banded"](spark, sf_dir).collect()
    assert rows
    t = load_tables(spark, sf_dir, ("embeddings",))
    pdf = t["embeddings"].toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(float)
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    idx = {int(v): i for i, v in enumerate(pdf["vec_id"])}
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r)
        got = float(nrm[idx[r.src]] @ nrm[idx[r.nbr]])
        assert math.isclose(r.cosine, round(got, 9), abs_tol=2e-9)
        assert r.src != r.nbr
    for src, nbrs in by_src.items():
        assert len(nbrs) <= 3
        ranked = sorted(nbrs, key=lambda r: r.rn)
        cos = [r.cosine for r in ranked]
        assert cos == sorted(cos, reverse=True)


def test_iqr_fences_match_pandas_model(spark, sf_dir):
    # r8 wire: quartiles in integer cents (floor(v*100+0.5)), fences
    # as exact half-cent multiples rescaled to dollars.
    rows = QUERIES["dq_outlier_iqr_fences"](spark, sf_dir).collect()
    pdf = _events_pdf(spark, sf_dir)
    for r in rows:
        vs = sorted(int(math.floor(v * 100 + 0.5))
                    for v in pdf[pdf.event_type == r.event_type]["value"])
        n = len(vs)
        q1 = vs[math.ceil(n / 4) - 1]
        q3 = vs[math.ceil(3 * n / 4) - 1]
        assert r.q1_cents == q1 and r.q3_cents == q3
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert math.isclose(r.fence_lo, lo / 100.0, abs_tol=1e-6)
        assert math.isclose(r.fence_hi, hi / 100.0, abs_tol=1e-6)
        assert r.n_outliers == sum(1 for v in vs if v < lo or v > hi)


def test_wordpiece_golden_prefers_cohesive_pair(spark):
    """Hand-checked corpus where BPE and WordPiece disagree: (x, y</w>)
    is the most FREQUENT pair (count 5), but its symbols are common, so
    the likelihood ratio prefers the perfectly-cohesive singleton pair
    (y, b</w>) with score 1/(1·1) = 1 — the known WordPiece bias toward
    rare-but-exclusive pairs that production trainers temper with a
    min-frequency floor."""
    from results_ingestor_spark.operators.wordpiece import (
        train_wordpiece_merges)
    docs = spark.createDataFrame(
        [(0, "xy xy xy xy qz"), (1, "xy xa yb qz")], ["doc_id", "text"])
    out = train_wordpiece_merges(docs, n_merges=1).collect()[0]
    assert (out.left, out.right) == ("y", "b</w>")
    assert math.isclose(out.score, 1.0, abs_tol=1e-12)
    # hand-check the runner-up algebra: (q, z</w>) = 2/(2·2) = 0.5
    # outranks the frequent (x, y</w>) = 5/(6·5) ≈ 0.167


def test_wordpiece_matches_python_model(spark, sf_dir):
    """Replay the trainer in pure Python on the corpus and compare the
    full 8-merge trajectory."""
    from results_ingestor_spark.plans import QUERIES as Q
    rows = sorted(Q["wordpiece_train_merges"](spark, sf_dir).collect(),
                  key=lambda r: r.merge_rank)
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("text").toPandas()
    vocab = {}
    for text in pdf["text"]:
        for w in text.split(" "):
            if w:
                vocab[w] = vocab.get(w, 0) + 1
    segs = {w: [*w[:-1], w[-1] + "</w>"] for w in vocab}
    for r in rows:
        pc, sc = {}, {}
        for w, cnt in vocab.items():
            s = segs[w]
            for x in s:
                sc[x] = sc.get(x, 0) + cnt
            for aa, bb in zip(s, s[1:]):
                pc[(aa, bb)] = pc.get((aa, bb), 0) + cnt
        # deterministic argmax with (score desc, a asc, b asc)
        best = min(pc, key=lambda p: (-(pc[p] / (sc[p[0]] * sc[p[1]])),
                                      p[0], p[1]))
        assert (r.left, r.right) == best, r.merge_rank
        assert r.pair_count == pc[best]
        # apply greedy non-overlapping merge
        a, b = best
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out


def test_wordpiece_tokenize_conserves_words(spark, sf_dir):
    rows = QUERIES["wordpiece_tokenize_docs"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("doc_id", "text").toPandas()
    words = {d: len([w for w in tx.split(" ") if w])
             for d, tx in zip(pdf["doc_id"], pdf["text"])}
    got = {r.doc_id: r for r in rows}
    assert set(got) == set(words)
    for d, r in got.items():
        assert r.n_words == words[d]
        # merges only ever shrink the symbol count, never below n_words
        assert r.n_words <= r.n_subwords
        assert r.chars_per_subword > 0


def test_g_test_matches_mutual_information(spark, sf_dir):
    rows = QUERIES["stats_g_test_lang_source"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("lang", "source").toPandas()
    n = len(pdf)
    cells = pdf.groupby(["lang", "source"]).size()
    rl = pdf.groupby("lang").size()
    cs = pdf.groupby("source").size()
    g_total = 0.0
    for r in rows:
        o = cells[(r.lang, r.source)]
        assert r.o == o
        e = rl[r.lang] * cs[r.source] / n
        assert math.isclose(r.expected, e, rel_tol=1e-9)
        want = 2.0 * o * math.log(o / e)
        assert math.isclose(r.g_contrib, want, abs_tol=1e-6)
        g_total += want
    # G = 2N * MI in nats: recompute MI directly
    mi = sum((cells[(l, s)] / n)
             * math.log(cells[(l, s)] * n / (rl[l] * cs[s]))
             for (l, s) in cells.index)
    assert math.isclose(g_total, 2.0 * n * mi, rel_tol=1e-9)


def test_poisson_glm_trajectory_matches_python(spark, sf_dir):
    row = QUERIES["events_poisson_glm_hourly"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    pdf["hkey"] = pdf["ts"].map(lambda t: (t.year, t.month, t.day, t.hour))
    pdf["hod"] = pdf["ts"].map(lambda t: t.hour)
    hourly = pdf.groupby(["hkey", "hod"]).size().reset_index(name="y")
    xs = (hourly["hod"] / 23.0).to_numpy()
    ys = hourly["y"].to_numpy(dtype=float)
    w0 = w1 = 0.0
    for _ in range(8):
        lam = [math.exp(w0 + w1 * x) for x in xs]
        g0 = sum(l - y for l, y in zip(lam, ys)) / len(ys)
        g1 = sum((l - y) * x for l, y, x in zip(lam, ys, xs)) / len(ys)
        w0 = round(w0 - 0.05 * g0, 9)
        w1 = round(w1 - 0.05 * g1, 9)
    assert row.n_hours == len(hourly)
    assert math.isclose(row.w0, w0, abs_tol=1e-8)
    assert math.isclose(row.w1, w1, abs_tol=1e-8)
    lam = [math.exp(w0 + w1 * x) for x in xs]
    nll = sum(l - y * math.log(max(l, 1e-300))
              for l, y in zip(lam, ys)) / len(ys)
    assert math.isclose(row.mean_nll, nll, abs_tol=1e-5)


def test_patch_grid_arithmetic(spark, sf_dir):
    rows = QUERIES["multimodal_patch_grid"](spark, sf_dir).collect()
    for r in rows[:200]:
        w, h = r.doc_id % 1920 + 1, r.doc_id % 1080 + 1
        npx, npy = -(-w // 16), -(-h // 16)
        assert (r.width, r.height) == (w, h)
        assert (r.n_patches_x, r.n_patches_y) == (npx, npy)
        assert r.n_patches == npx * npy
        assert r.seq_len_with_cls == npx * npy + 1
        assert r.pad_x == npx * 16 - w and 0 <= r.pad_x < 16
        assert r.pad_y == npy * 16 - h and 0 <= r.pad_y < 16
        assert r.last_patch_byte_offset == \
            ((npy - 1) * 16 * w + (npx - 1) * 16) * 3


def test_brown_forsythe_matches_pandas_model(spark, sf_dir):
    row = QUERIES["stats_levene_brown_forsythe"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    devs, groups = [], []
    for g, vals in pdf.groupby("event_type")["v"]:
        vs = sorted(vals)
        med = vs[math.ceil(len(vs) / 2) - 1]  # inverted-CDF median
        devs += [abs(v - med) for v in vals]
        groups += [g] * len(vals)
    import pandas as pd
    z = pd.DataFrame({"g": groups, "z": devs})
    gg = z.groupby("g")["z"]
    nn, k = len(z), gg.ngroups
    ssb = sum(s * s / n for s, n in zip(gg.sum(), gg.count())) \
        - z["z"].sum() ** 2 / nn
    ssw = (z["z"] ** 2).sum() - sum(
        s * s / n for s, n in zip(gg.sum(), gg.count()))
    w = (ssb / (k - 1)) / (ssw / (nn - k))
    assert row.k == k and row.n_total == nn
    assert math.isclose(row.w_stat, w, rel_tol=1e-6)


def test_fano_matches_pandas_model(spark, sf_dir):
    rows = QUERIES["events_overdispersion_fano"](spark, sf_dir).collect()
    pdf = _events_pdf(spark, sf_dir)
    pdf["h"] = pdf["ts"].map(lambda t: (t.year, t.month, t.day, t.hour))
    for r in rows:
        y = pdf[pdf.event_type == r.event_type].groupby("h").size()
        assert r.n_hours == len(y)
        fano = y.var(ddof=1) / y.mean()
        assert math.isclose(r.mean_per_hour, y.mean(), rel_tol=1e-9)
        assert math.isclose(r.fano, fano, rel_tol=1e-6)
        assert r.overdispersed == (fano > 1.5)


def test_srm_counts_match_hashlib(spark, sf_dir):
    import hashlib
    row = QUERIES["experiment_srm_check"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    arms = [int(hashlib.md5(f"srm:{u}".encode()).hexdigest()[:15], 16) % 2
            for u in set(pdf["user_id"])]
    n0, n1 = arms.count(0), arms.count(1)
    assert (row.n0, row.n1) == (n0, n1)
    chi2 = (n0 - n1) ** 2 / (n0 + n1)
    assert math.isclose(row.chi2, chi2, rel_tol=1e-9)
    assert row.srm_detected == (chi2 > 10.828)


def test_als_matches_python_model(spark, sf_dir):
    rows = QUERIES["als_rank1_factorization"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].select("o_custkey", "o_orderkey").toPandas()
    li = t["lineitem"].select("l_orderkey", "l_partkey").toPandas()
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    r = m.groupby(["o_custkey", "l_partkey"]).size()
    by_c, by_p = {}, {}
    for (c, p), cnt in r.items():
        by_c.setdefault(c, []).append((p, cnt))
        by_p.setdefault(p, []).append((c, cnt))
    v = {p: 1.0 for p in by_p}
    u = {}
    for _ in range(2):
        u = {c: round(sum(cnt * v[p] for p, cnt in items)
                      / sum(v[p] ** 2 for p, _ in items), 9)
             for c, items in by_c.items()}
        v = {p: round(sum(cnt * u[c] for c, cnt in items)
                      / sum(u[c] ** 2 for c, _ in items), 9)
             for p, items in by_p.items()}
    want = sorted(((p, round(val, 6)) for p, val in v.items()),
                  key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.partkey, r.score) for r in rows]
    assert got == want
    # the first factor axis is positive (popularity direction)
    assert all(s > 0 for _, s in got)


def test_lpa_modularity_matches_python_model(spark, sf_dir):
    from results_ingestor_spark.operators.graph import (copurchase_edges,
                                                        lpa_communities)
    rows = QUERIES["graph_lpa_modularity"](spark, sf_dir).collect()
    assert rows
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    edges = copurchase_edges(li, min_weight=2)
    lab = {r.v: r.label for r in lpa_communities(edges, n_iter=3).collect()}
    sym = [(r.u, r.v) for r in edges.select("u", "v").collect()]
    sym = sym + [(v, u) for u, v in sym]
    m2 = len(sym)
    int2, dsum = {}, {}
    for u, v in sym:
        dsum[lab[u]] = dsum.get(lab[u], 0) + 1
        if lab[u] == lab[v]:
            int2[lab[u]] = int2.get(lab[u], 0) + 1
    for r in rows:
        assert r.internal_edges == int2.get(r.community, 0) // 2
        assert r.degree_sum == dsum[r.community]
        q = (int2.get(r.community, 0) / m2
             - (dsum[r.community] / m2) ** 2)
        assert math.isclose(r.q_contrib, q, abs_tol=1e-9)
    # total modularity over ALL communities is within [-0.5, 1]
    qtot = sum(int2.get(c, 0) / m2 - (d / m2) ** 2
               for c, d in dsum.items())
    assert -0.5 <= qtot <= 1.0


def test_order_reconciliation_matches_pandas(spark, sf_dir):
    row = QUERIES["dq_order_total_reconciliation"](spark, sf_dir).collect()[0]
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].select("o_orderkey", "o_totalprice").toPandas()
    li = t["lineitem"].select("l_orderkey", "l_extendedprice",
                              "l_discount", "l_tax").toPandas()
    li["rec"] = (li["l_extendedprice"].round(2)
                 * (1 - li["l_discount"].round(2))
                 * (1 + li["l_tax"].round(2)))
    rec = li.groupby("l_orderkey")["rec"].sum()
    n_no_lines = sum(1 for k in o["o_orderkey"] if k not in rec.index)
    assert row.n_orders == len(o)
    assert row.n_no_lines == n_no_lines
    n_rec = sum(1 for k, tp in zip(o["o_orderkey"], o["o_totalprice"])
                if k in rec.index and abs(round(tp, 2) - rec[k]) <= 0.011)
    # decimal vs float rounding can disagree only within a hair of the
    # 1-cent boundary; assert the census within that tolerance band
    assert abs(row.n_reconciled_1c - n_rec) <= 2
    assert 0 <= row.avg_rel_err <= row.max_rel_err


def test_randomized_response_debiasing(spark, sf_dir):
    import hashlib
    row = QUERIES["privacy_randomized_response"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    users = sorted(set(pdf["user_id"]))
    buyers = set(pdf[pdf.event_type == "purchase"]["user_id"])
    n_yes = 0
    for u in users:
        coin = int(hashlib.md5(f"rr:{u}".encode()).hexdigest()[:15],
                   16) % 4
        y = 1 if u in buyers else 0
        n_yes += y if coin < 2 else (1 if coin == 2 else 0)
    assert row.n == len(users)
    assert row.n_yes == n_yes
    assert row.n_true == len(buyers)
    assert math.isclose(row.estimated_rate,
                        2 * n_yes / len(users) - 0.5, abs_tol=1e-9)
    # the estimator is unbiased; with ~n users the deviation is
    # bounded by a generous 5/sqrt(n)
    assert abs(row.estimated_rate - row.true_rate) \
        <= 5 / math.sqrt(row.n) + 1e-9


def test_capture_recapture_matches_pandas(spark, sf_dir):
    row = QUERIES["stats_capture_recapture"](spark, sf_dir).collect()[0]
    pdf = _events_pdf(spark, sf_dir)
    ts = pdf["ts"].map(lambda t: t.timestamp() * 1_000_000)
    mid = (ts.min() + ts.max()) // 2
    h1 = set(pdf[ts < mid]["user_id"])
    h2 = set(pdf[ts >= mid]["user_id"])
    m = len(h1 & h2)
    assert (row.n1, row.n2, row.m) == (len(h1), len(h2), m)
    assert row.n_observed == len(h1 | h2)
    want = (len(h1) + 1) * (len(h2) + 1) / (m + 1) - 1
    assert math.isclose(row.chapman_estimate, want, rel_tol=1e-9)
    # the estimate can never fall below the observed union
    assert row.chapman_estimate >= row.m


def test_neyman_allocation_matches_pandas(spark, sf_dir):
    rows = QUERIES["sampling_neyman_allocation"](spark, sf_dir).collect()
    pdf = _events_pdf(spark, sf_dir)
    g = pdf.groupby("event_type")["v"]
    sds = {t: round(vals.std(ddof=1), 9) for t, vals in g}
    ns = dict(g.count())
    wtot = sum(ns[t] * sds[t] for t in ns)
    total_alloc = 0
    for r in rows:
        assert r.stratum_size == ns[r.event_type]
        assert math.isclose(r.stratum_sd, sds[r.event_type], abs_tol=2e-9)
        share = ns[r.event_type] * sds[r.event_type] / wtot
        assert math.isclose(r.alloc_share, share, abs_tol=1e-6)
        assert r.n_sampled_of_1000 == math.floor(1000 * share)
        total_alloc += r.n_sampled_of_1000
    # floor rounding loses at most k-1 of the 1000-row budget
    assert 1000 - len(rows) < total_alloc <= 1000
    assert math.isclose(sum(r.alloc_share for r in rows), 1.0,
                        abs_tol=1e-6)


def test_compression_ratio_matches_zlib_exactly(spark, sf_dir):
    """The rows-only entry's compensating gate: recompute every byte
    count with plain-Python zlib — exact, because DEFLATE at a fixed
    level is deterministic."""
    import zlib
    rows = {r.doc_id: r for r in
            QUERIES["quality_compression_ratio"](spark, sf_dir).collect()}
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("doc_id", "text").toPandas()
    assert set(rows) == set(pdf["doc_id"])
    for d, tx in zip(pdf["doc_id"], pdf["text"]):
        r = rows[d]
        comp = len(zlib.compress(tx.encode("utf-8"), 6))
        assert r.n_chars == len(tx)
        assert r.n_compressed == comp
        assert math.isclose(r.compression_ratio,
                            round(len(tx) / comp, 6), abs_tol=1e-9)
        # short docs can EXPAND under DEFLATE (header overhead); the
        # signal still separates — bound per-doc loosely, corpus-mean
        # strictly below
        assert 0.5 < r.compression_ratio < 50.0
    mean_ratio = sum(r.compression_ratio for r in rows.values()) / len(rows)
    assert mean_ratio > 1.0


def test_runs_test_matches_python_model(spark, sf_dir):
    rows = QUERIES["stats_runs_test"](spark, sf_dir).collect()
    pdf = _events_pdf(spark, sf_dir)
    for r in rows:
        sub = pdf[pdf.event_type == r.event_type].sort_values(
            ["ts", "event_id"])
        vs = sorted(sub["v"])
        med = vs[math.ceil(len(vs) / 2) - 1]
        signs = [1 if v > med else 0 for v in sub["v"] if v != med]
        runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        na, nb = signs.count(1), signs.count(0)
        nn = na + nb
        assert (r.n_runs, r.n_above, r.n_below) == (runs, na, nb)
        mu = 2 * na * nb / nn + 1
        var = 2 * na * nb * (2 * na * nb - nn) / (nn * nn * (nn - 1))
        assert math.isclose(r.z, (runs - mu) / math.sqrt(var),
                            rel_tol=1e-6)


def test_gries_dp_matches_python_model(spark, sf_dir):
    rows = QUERIES["text_dispersion_gries_dp"](spark, sf_dir).collect()
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("doc_id", "text").toPandas()
    cnt, dtot, ctot, ndocs = {}, {}, {}, {}
    for d, tx in zip(pdf["doc_id"], pdf["text"]):
        for w in tx.split(" "):
            cnt[(d, w)] = cnt.get((d, w), 0) + 1
    for (d, w), c in cnt.items():
        dtot[d] = dtot.get(d, 0) + c
        ctot[w] = ctot.get(w, 0) + c
        ndocs[w] = ndocs.get(w, 0) + 1
    T = sum(dtot.values())
    for r in rows:
        assert r.n_occurrences == ctot[r.token]
        assert r.n_docs == ndocs[r.token]
        # r8 wire: per-term shared-IEEE snap floor(x*1e9 + 0.5), DP as
        # one exact-integer ratio — the model reproduces it bit-for-bit
        term_n9 = presw_n9 = 0
        for (d, w), c in cnt.items():
            if w != r.token:
                continue
            term_n9 += math.floor(
                abs(c / ctot[w] - dtot[d] / T) * 1000000000.0 + 0.5)
            presw_n9 += math.floor(dtot[d] / T * 1000000000.0 + 0.5)
        want = (term_n9 - presw_n9 + 1_000_000_000) / 2_000_000_000.0
        assert r.dp == want
        assert 0.0 <= r.dp <= 1.0
    # ranked descending: the top-20 are the burstiest tokens
    dps = [r.dp for r in rows]
    assert dps == sorted(dps, reverse=True)
