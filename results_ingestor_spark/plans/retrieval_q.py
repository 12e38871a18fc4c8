"""Retrieval-quality evaluation and hybrid (lexical+vector) search.

The similarity family (plans/similarity_q.py) builds the indexes; this
module answers the two questions a retrieval deployment asks next:

- *how good is the index* — label-supervised precision@k / MRR over the
  ``embeddings`` corpus, whose ``label`` column is the relevance oracle
  (candidate is relevant iff it shares the query's label);
- *how do lexical and semantic rankings combine* — reciprocal-rank
  fusion (RRF, Cormack et al. 2009), the standard score-free fusion
  used by hybrid search engines, composed here from the registry's own
  BM25 and brute-force-cosine rankings.

Both entries are fully value-checked: the Spark plans only use
deterministic ranks (scores rounded BEFORE ranking, id tie-breaks), so
the DuckDB oracles replay the exact ranked lists.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from results_ingestor_spark.operators.similarity import brute_force_topk
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.plans.similarity_q import _NORM_SQL
from results_ingestor_spark.plans.text_q import (
    _BM25_B, _BM25_K1, _BM25_TERMS, _TOKS)
from results_ingestor_spark.sources.tables import load_tables

_N_EVAL_QUERIES = 20
_EVAL_K = 10


@query("retrieval_eval_label_topk", oracle=f"""
WITH n AS ({_NORM_SQL}),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
    round((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
           FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb))
          / (nq.nrm * nc.nrm), 9) AS cosine
  FROM embeddings q
  JOIN embeddings c ON q.vec_id <> c.vec_id
  JOIN n nq ON nq.vec_id = q.vec_id
  JOIN n nc ON nc.vec_id = c.vec_id
  WHERE q.vec_id < {_N_EVAL_QUERIES}),
topk AS (
  SELECT query_id, cand_id, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rn
    FROM s) WHERE rn <= {_EVAL_K}),
j AS (
  SELECT t.query_id, CAST(ql.label AS BIGINT) AS q_label,
    CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END AS rel, t.rn
  FROM topk t
  JOIN embeddings ql ON ql.vec_id = t.query_id
  JOIN embeddings cl ON cl.vec_id = t.cand_id)
SELECT query_id, q_label,
  CAST(SUM(rel) AS BIGINT) AS n_rel_at_k,
  round(CAST(SUM(rel) AS DOUBLE) / {_EVAL_K}, 6) AS precision_at_k,
  round(coalesce(CAST(1 AS DOUBLE)
                 / MIN(CASE WHEN rel = 1 THEN rn END), 0), 9) AS rr
FROM j GROUP BY query_id, q_label""")
def retrieval_eval_label_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-supervised retrieval evaluation: run exact cosine top-10
    for the first 20 vectors as queries, score a candidate as relevant
    iff it carries the query's label, and report per-query
    precision@10 and reciprocal rank (0 when no hit in the top 10 —
    the query's mean over these IS MRR@10).  This is the measurement
    loop every embedding upgrade is judged by, run entirely in-engine.

    Scale shape: the query set is a broadcast (evaluation sets are
    thousands of rows, never corpus-sized); the only corpus-wide work
    is the same broadcast-probe scan `ann_cosine_topk` pays, and
    everything after the top-k window is query-set-sized.  Relevance
    labels join against the top-k table (queries x k rows), not the
    corpus."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"]
    topk = brute_force_topk(
        e, e.where(F.col("vec_id") < _N_EVAL_QUERIES), k=_EVAL_K)
    ql = e.select(F.col("vec_id").alias("query_id"),
                  F.col("label").cast("long").alias("q_label"))
    cl = e.select(F.col("vec_id").alias("cand_id"),
                  F.col("label").alias("c_label"))
    rel = F.when(F.col("c_label") == F.col("q_label"), 1).otherwise(0)
    return (topk.join(F.broadcast(ql), "query_id")
            .join(F.broadcast(cl), "cand_id")
            .withColumn("rel", rel)
            .groupBy("query_id", "q_label")
            .agg(F.sum("rel").cast("long").alias("n_rel_at_k"),
                 F.round(F.sum("rel").cast("double") / _EVAL_K, 6)
                 .alias("precision_at_k"),
                 F.round(F.coalesce(
                     F.lit(1.0) / F.min(F.when(F.col("rel") == 1,
                                               F.col("rn"))),
                     F.lit(0.0)), 9).alias("rr")))


_RRF_K = 60      # Cormack et al. constant
_FUSE_DEPTH = 50  # per-list depth entering the fusion


def _bm25_ranked_sql() -> str:
    """DuckDB twin of the BM25 ranking (same constants/expression order
    as text_q.text_bm25_topk), kept as a full ranked list of depth
    _FUSE_DEPTH instead of a top-10 cut."""
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
  SELECT doc_id, rb FROM (
    SELECT doc_id,
      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
    FROM (
      SELECT tf.doc_id,
        round(SUM(
          ln((n - df + 0.5) / (df + 0.5) + 1)
          * (tf * ({_BM25_K1} + 1))
          / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl))
        ), 6) AS bm25
      FROM (
        SELECT doc_id, tok AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
        WHERE tok IN ({terms}) AND doc_id <> 0
        GROUP BY doc_id, tok) tf
      JOIN (SELECT term, COUNT(*) AS df FROM (
              SELECT doc_id, tok AS term, COUNT(*) AS tf
              FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
              WHERE tok IN ({terms}) AND doc_id <> 0
              GROUP BY doc_id, tok) GROUP BY term) df USING (term)
      JOIN (SELECT doc_id, len({_TOKS}) AS dl FROM documents) dl
        ON dl.doc_id = tf.doc_id
      CROSS JOIN (SELECT CAST(SUM(len({_TOKS})) AS DOUBLE) / COUNT(*)
                    AS avgdl, COUNT(*) AS n FROM documents) avgdl
      GROUP BY tf.doc_id))
  WHERE rb <= {_FUSE_DEPTH}"""


@query("search_rrf_hybrid", oracle=f"""
WITH bm AS ({_bm25_ranked_sql()}),
n AS ({_NORM_SQL}),
cs AS (
  SELECT cand_id, rc FROM (
    SELECT c.vec_id AS cand_id,
      row_number() OVER (
        ORDER BY round((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
                        FROM (SELECT unnest(q.embedding) AS xa,
                                     unnest(c.embedding) AS xb))
                       / (nq.nrm * nc.nrm), 9) DESC, c.vec_id) AS rc
    FROM embeddings q
    JOIN embeddings c ON q.vec_id <> c.vec_id
    JOIN n nq ON nq.vec_id = q.vec_id
    JOIN n nc ON nc.vec_id = c.vec_id
    WHERE q.vec_id = 0)
  WHERE rc <= {_FUSE_DEPTH})
SELECT coalesce(bm.doc_id, cs.cand_id) AS id,
  CAST(bm.rb AS BIGINT) AS r_bm25, CAST(cs.rc AS BIGINT) AS r_cos,
  round(coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + bm.rb), 0)
        + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + cs.rc), 0), 9) AS rrf
FROM bm FULL JOIN cs ON bm.doc_id = cs.cand_id
ORDER BY rrf DESC, id LIMIT 10""")
def search_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search by reciprocal-rank fusion: a BM25 lexical ranking
    (terms join/scan/merge, same constants as `text_bm25_topk`) and a
    cosine
    semantic ranking (query = vector 0, docs keyed by doc_id == vec_id)
    each contribute 1/(60+rank) for their top-50; a document missing
    from one list contributes 0 from it.  RRF is score-free — only
    RANKS cross the fusion, which is why it composes rankings whose raw
    scores live on incomparable scales, and why the whole pipeline
    stays value-checkable (ranks are deterministic: scores rounded
    before ranking, id tie-breaks).

    Scale shape: each side is an already-scale-safe registry ranking
    (query-term-sized BM25 aggregates; broadcast-probe cosine); the
    fusion itself joins two k-bounded lists — at 100 TB it is a
    driver-trivial full-outer join of two 50-row frames, whatever the
    corpus size."""
    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    docs, e = t["documents"], t["embeddings"]

    # Lexical side: BM25 over the fixed term set, ranked to depth 50.
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    avgdl = dl.agg((F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
                   F.count("*").alias("n"))
    tf = (docs.where(F.col("doc_id") != 0)
          .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
          .where(F.col("term").isin(*_BM25_TERMS))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    term_score = (idf * (F.col("tf") * (_BM25_K1 + 1))
                  / (F.col("tf") + _BM25_K1
                     * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(dl, "doc_id")
              .join(F.broadcast(avgdl))
              .groupBy("doc_id")
              .agg(F.round(F.sum(term_score), 6).alias("bm25")))
    # TakeOrderedAndProject bounds the list to 50 rows BEFORE the rank
    # window runs, so the global row_number is k-bounded by construction
    # (the MMR-pool contract), never corpus-sized.
    bm = (scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_FUSE_DEPTH)
          .withColumn("rb", F.row_number().over(
              Window.orderBy(F.desc("bm25"), F.asc("doc_id"))).cast("long"))
          .select("doc_id", "rb"))

    # Semantic side: exact cosine ranking for query vector 0.
    cs = (brute_force_topk(e, e.where(F.col("vec_id") == 0), k=_FUSE_DEPTH)
          .select("cand_id", F.col("rn").cast("long").alias("rc")))

    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rb")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rc")), F.lit(0.0)),
        9)
    return (bm.join(cs, F.col("doc_id") == F.col("cand_id"), "full_outer")
            .select(F.coalesce("doc_id", "cand_id").alias("id"),
                    F.col("rb").alias("r_bm25"), F.col("rc").alias("r_cos"),
                    rrf.alias("rrf"))
            .orderBy(F.desc("rrf"), F.asc("id"))
            .limit(10))


_FILT_K = 10        # result depth
_FILT_OVER = 30     # post-filter over-fetch depth


@query("ann_filtered_topk", oracle=f"""
WITH n AS ({_NORM_SQL}),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
    (c.label % 2 = 0) AS allowed,
    round((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
           FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb))
          / (nq.nrm * nc.nrm), 9) AS cosine
  FROM embeddings q
  JOIN embeddings c ON q.vec_id <> c.vec_id
  JOIN n nq ON nq.vec_id = q.vec_id
  JOIN n nc ON nc.vec_id = c.vec_id
  WHERE q.vec_id < 5),
pre AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, cand_id) AS rn
    FROM s WHERE allowed) WHERE rn <= {_FILT_K}),
over_fetch AS (
  SELECT query_id, cand_id, allowed FROM (
    SELECT query_id, cand_id, allowed,
      row_number() OVER (PARTITION BY query_id
                         ORDER BY cosine DESC, cand_id) AS rn
    FROM s) WHERE rn <= {_FILT_OVER}),
post AS (
  SELECT query_id, cand_id FROM over_fetch WHERE allowed)
SELECT p.query_id,
  CAST(COUNT(po.cand_id) AS BIGINT) AS n_postfilter_hits,
  round(CAST(COUNT(po.cand_id) AS DOUBLE) / {_FILT_K}, 6)
    AS postfilter_recall
FROM pre p
LEFT JOIN post po ON po.query_id = p.query_id AND po.cand_id = p.cand_id
GROUP BY p.query_id""")
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search, both ways production systems do it:
    PRE-filter (restrict candidates to the metadata predicate — here
    even labels — then exact top-10; always correct) vs POST-filter
    (take the unfiltered top-30, then apply the predicate; the
    shortcut engines take when the filter can't push into the index).
    Reports, per query, how many of the TRUE filtered top-10 the
    post-filter shortcut recovered — the recall loss is the classic
    filtered-ANN pitfall: when the predicate is selective, the
    over-fetched list is exhausted before k survivors appear.

    Scale: two broadcast-probe scans (the ann_cosine_topk budget);
    the pre-filter restriction pushes into the candidate scan as a
    data filter — at 100 TB the pre-filter path reads only the
    predicate's partitions, which is exactly why metadata predicates
    belong IN the index scan, the fact this entry measures."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"]
    queries = e.where(F.col("vec_id") < 5)
    allowed = e.where(F.col("label") % 2 == 0)
    pre = brute_force_topk(allowed, queries, k=_FILT_K) \
        .select("query_id", "cand_id")
    over = brute_force_topk(e, queries, k=_FILT_OVER)
    post = (over.join(F.broadcast(
                e.select(F.col("vec_id").alias("cand_id"), "label")),
                "cand_id")
            .where(F.col("label") % 2 == 0)
            .select("query_id", "cand_id"))
    return (pre.join(post.withColumnRenamed("cand_id", "hit_id"),
                     (pre["query_id"] == post["query_id"])
                     & (F.col("cand_id") == F.col("hit_id")), "left")
            .groupBy(pre["query_id"].alias("query_id"))
            .agg(F.count("hit_id").alias("n_postfilter_hits"),
                 F.round(F.count("hit_id").cast("double") / _FILT_K, 6)
                 .alias("postfilter_recall")))


# NDCG discounts 1/log2(i+1) and their prefix sums (the ideal DCG for
# m relevant docs) as full-precision Python literals embedded in BOTH
# engines' SQL — no libm log2 call exists at query time to drift.
_NDCG_DISC = [1.0 / math.log2(i + 1) for i in range(1, _EVAL_K + 1)]
_NDCG_IDCG = [sum(_NDCG_DISC[:m]) for m in range(_EVAL_K + 1)]
_DISC_CASE = ("CASE rn " + " ".join(
    f"WHEN {i + 1} THEN {d!r}" for i, d in enumerate(_NDCG_DISC)) + " END")
_IDCG_CASE = ("CASE least(n_label_rel, 10) " + " ".join(
    f"WHEN {m} THEN {v!r}" for m, v in enumerate(_NDCG_IDCG)) + " END")


@query("search_ndcg_at_k", oracle=f"""
WITH n AS ({_NORM_SQL}),
s AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
    round((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
           FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb))
          / (nq.nrm * nc.nrm), 9) AS cosine
  FROM embeddings q
  JOIN embeddings c ON q.vec_id <> c.vec_id
  JOIN n nq ON nq.vec_id = q.vec_id
  JOIN n nc ON nc.vec_id = c.vec_id
  WHERE q.vec_id < {_N_EVAL_QUERIES}),
topk AS (
  SELECT query_id, cand_id, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id) AS rn
    FROM s) WHERE rn <= {_EVAL_K}),
j AS (
  SELECT t.query_id, CAST(ql.label AS BIGINT) AS q_label,
    CASE WHEN cl.label = ql.label THEN 1 ELSE 0 END AS rel, t.rn
  FROM topk t
  JOIN embeddings ql ON ql.vec_id = t.query_id
  JOIN embeddings cl ON cl.vec_id = t.cand_id),
f AS (
  SELECT query_id, q_label, rn,
    CAST(SUM(rel) OVER w AS BIGINT) AS nrel,
    SUM(CAST(rel AS DOUBLE) * {_DISC_CASE}) OVER w AS dcg
  FROM j
  WINDOW w AS (PARTITION BY query_id ORDER BY rn ROWS UNBOUNDED PRECEDING)),
lc AS (
  SELECT CAST(label AS BIGINT) AS q_label,
    CAST(COUNT(*) - 1 AS BIGINT) AS n_label_rel
  FROM embeddings GROUP BY label)
SELECT query_id, q_label, nrel AS n_rel_at_k,
  round(dcg / {_IDCG_CASE}, 9) AS ndcg_at_k
FROM f JOIN lc USING (q_label) WHERE rn = {_EVAL_K}""")
def search_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 for the label-supervised retrieval setup — the
    position-discounted quality score that separates "found 3 hits at
    ranks 1-3" from "found 3 hits at ranks 8-10", which precision@k
    (retrieval_eval_label_topk) cannot.  Discounts 1/log₂(i+1) and the
    ideal-DCG prefix sums enter BOTH engines as full-precision Python
    literals (no runtime log2 to drift); the per-query DCG folds in
    rank order through a cumulative window (order-fixed IEEE
    addition), and the ideal divisor is a pure table lookup on
    min(corpus-relevant-count, 10).

    Scale: the brute-force leg is the whitelisted broadcast-probe scan
    (ann_cosine_topk contract); everything after the top-k window is
    queries × k rows; the label-count table is label-domain-sized and
    broadcast."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"]
    topk = brute_force_topk(
        e, e.where(F.col("vec_id") < _N_EVAL_QUERIES), k=_EVAL_K)
    ql = e.select(F.col("vec_id").alias("query_id"),
                  F.col("label").cast("long").alias("q_label"))
    cl = e.select(F.col("vec_id").alias("cand_id"),
                  F.col("label").alias("c_label"))
    j = (topk.join(F.broadcast(ql), "query_id")
         .join(F.broadcast(cl), "cand_id")
         .withColumn("rel", F.when(F.col("c_label") == F.col("q_label"),
                                   1).otherwise(0)))
    w = (Window.partitionBy("query_id").orderBy("rn")
         .rowsBetween(Window.unboundedPreceding, 0))
    f = j.select(
        "query_id", "q_label", "rn",
        F.sum("rel").over(w).cast("long").alias("nrel"),
        F.sum(F.col("rel").cast("double") * F.expr(_DISC_CASE)).over(w)
        .alias("dcg"))
    lc = e.groupBy(F.col("label").cast("long").alias("q_label")).agg(
        (F.count("*") - 1).cast("long").alias("n_label_rel"))
    return (f.where(F.col("rn") == _EVAL_K)
            .join(F.broadcast(lc), "q_label")
            .select("query_id", "q_label",
                    F.col("nrel").alias("n_rel_at_k"),
                    F.round(F.col("dcg") / F.expr(_IDCG_CASE), 9)
                    .alias("ndcg_at_k")))
