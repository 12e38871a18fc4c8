"""Semantic invariants for the round-4f retrieval additions
(Dirichlet query-likelihood, RM3 expansion).  The oracle gate checks
cross-engine equality; these recompute each score with an independent
Python IR model so an edit changing the math identically in both
engines still trips."""

from __future__ import annotations

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
