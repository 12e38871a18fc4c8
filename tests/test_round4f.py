"""Semantic invariants for the round-4f additions (Dirichlet
query-likelihood, RM3 expansion, boundary-stitch dedup, n-gram
novelty census, compaction-bin planning).  The oracle gate checks
cross-engine equality; these recompute each score with an independent
Python IR model so an edit changing the math identically in both
engines still trips."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from results_ingestor_spark.plans import QUERIES
from results_ingestor_spark.sources.tables import load_tables

_Q = ("join", "scan", "merge")
_MU = 2000.0


def _docs(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("doc_id", "text").toPandas()
    return {d: tx.split(" ") for d, tx in zip(pdf["doc_id"], pdf["text"])}


def test_dirichlet_lm_matches_python_model(spark, sf_dir):
    rows = QUERIES["search_dirichlet_lm_topk"](spark, sf_dir).collect()
    docs = _docs(spark, sf_dir)
    T = sum(len(v) for v in docs.values())
    ctf = Counter(w for v in docs.values() for w in v if w in _Q)
    # full (non-sparse) reference: score every doc over all 3 terms
    scores = {}
    for d, toks in docs.items():
        tf = Counter(w for w in toks if w in _Q)
        scores[d] = sum(
            math.log(tf.get(w, 0) + _MU * ctf[w] / T) for w in _Q
        ) - 3 * math.log(len(toks) + _MU)
    want = sorted(docs, key=lambda d: (-round(scores[d], 6), d))[:10]
    assert [r.doc_id for r in rows] == want
    for r in rows:
        assert math.isclose(r.ql_score, scores[r.doc_id], abs_tol=2e-6)
    # query-likelihoods are log-probs of a 3-term query: negative
    assert all(r.ql_score < 0 for r in rows)


def test_rm3_expansion_matches_python_model(spark, sf_dir):
    rows = QUERIES["search_rm3_expansion"](spark, sf_dir).collect()
    docs = _docs(spark, sf_dir)
    # reference BM25 (k1=1.2, b=0.75) over the query terms, doc 0 out
    N = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / N
    tf = {d: Counter(w for w in v if w in _Q)
          for d, v in docs.items() if d != 0}
    df = Counter(w for c in tf.values() for w in c)
    bm = {}
    for d, c in tf.items():
        if not c:
            continue
        dl = len(docs[d])
        bm[d] = round(sum(
            math.log((N - df[w] + 0.5) / (df[w] + 0.5) + 1)
            * (f * 2.2) / (f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
            for w, f in c.items()), 6)
    fb = sorted(bm, key=lambda d: (-bm[d], d))[:10]
    ftf = Counter(w for d in fb for w in docs[d])
    nd = Counter(w for d in fb for w in set(docs[d]))
    ft = sum(len(docs[d]) for d in fb)
    weights = {w: round(0.5 * c / ft + (0.5 / 3 if w in _Q else 0.0), 9)
               for w, c in ftf.items()}
    want = sorted(weights, key=lambda w: (-weights[w], w))[:20]
    assert [r.term for r in rows] == want
    for r in rows:
        assert r.fb_tf == ftf[r.term]
        assert r.n_fb_docs == nd[r.term]
        assert math.isclose(r.rm3_weight, weights[r.term], abs_tol=2e-9)
    # the relevance model is a probability distribution scaled by 1/2:
    # all feedback-term weights (before the query bonus) sum to 0.5
    assert math.isclose(sum(0.5 * c / ft for c in ftf.values()), 0.5,
                        rel_tol=1e-12)


def test_boundary_stitch_matches_python_model(spark, sf_dir):
    rows = QUERIES["dedup_boundary_stitch"](spark, sf_dir).collect()
    docs = _docs(spark, sf_dir)
    heads = {}
    for d, t in docs.items():
        if len(t) >= 6:
            heads.setdefault(" ".join(t[:3]), []).append(d)
    pairs = sorted(
        (ld, rd, " ".join(t[-3:]))
        for ld, t in docs.items() if len(t) >= 6
        for rd in heads.get(" ".join(t[-3:]), []) if rd != ld)
    assert rows, "stitch census should be non-empty at every corpus SF"
    assert all(r.n_pairs_total == len(pairs) for r in rows)
    assert [(r.left_doc, r.right_doc, r.boundary) for r in rows] \
        == pairs[:50]


def test_novelty_micro_average_matches_python_model(spark, sf_dir):
    rows = QUERIES["text_novelty_unique_ngrams"](spark, sf_dir).collect()
    docs = _docs(spark, sf_dir)
    t = load_tables(spark, sf_dir, ("documents",))
    src = dict(t["documents"].select("doc_id", "source")
               .toPandas().itertuples(index=False))
    grams = {d: {" ".join(v[i:i + 4]) for i in range(len(v) - 3)}
             for d, v in docs.items()}
    df = Counter(g for gs in grams.values() for g in gs)
    per_src = {}
    for d, gs in grams.items():
        if not gs:
            continue
        u = sum(1 for g in gs if df[g] == 1)
        a = per_src.setdefault(src[d], [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(gs)
        a[2] += u
        a[3] += u == len(gs)
    assert {r.source for r in rows} == set(per_src)
    for r in rows:
        n, sg, su, fn = per_src[r.source]
        assert (r.n_docs, r.sum_grams, r.sum_unique,
                r.n_fully_novel) == (n, sg, su, fn)
        assert math.isclose(r.novelty_micro, su / sg, abs_tol=1e-9)
        # micro-average is a proper fraction of the exact sums
        assert 0.0 <= r.novelty_micro <= 1.0


def test_compaction_bins_match_python_model(spark, sf_dir):
    rows = sorted(QUERIES["layout_compaction_bins"](spark, sf_dir)
                  .collect(), key=lambda r: r.bin)
    t = load_tables(spark, sf_dir, ("documents",))
    pdf = t["documents"].select("doc_id", "n_chars").toPandas()
    bytes_by_shard = Counter()
    for d, n in zip(pdf["doc_id"], pdf["n_chars"]):
        h = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        bytes_by_shard[h % 64] += int(n)
    tgt = 4 * max(bytes_by_shard.values())
    cum, want = 0, {}
    for s in sorted(bytes_by_shard):
        want.setdefault(cum // tgt, []).append(s)
        cum += bytes_by_shard[s]
    # bins are consecutive from 0 (no shard exceeds the 4x-max target)
    assert [r.bin for r in rows] == list(range(len(rows)))
    assert len(rows) == len(want)
    for r in rows:
        members = want[r.bin]
        assert r.shards == "|".join(str(m) for m in members)
        assert r.n_shards == len(members)
        assert r.total_bytes == sum(bytes_by_shard[m] for m in members)
        # every bin is bounded by target + one shard of overshoot
        assert r.total_bytes <= tgt + max(bytes_by_shard.values())
