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
from results_ingestor_spark.plans import exact
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
    CAST(floor(((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE)) FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb)) / (nq.nrm * nc.nrm)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS cosine
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
  CAST(floor((CAST(SUM(rel) AS DOUBLE) / {_EVAL_K}) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS precision_at_k,
  CAST(floor((coalesce(CAST(1 AS DOUBLE) / MIN(CASE WHEN rel = 1 THEN rn END), 0)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS rr
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
                 exact.snap_double_col(F.sum("rel").cast("double") / _EVAL_K, 6)
                 .alias("precision_at_k"),
                 exact.snap_double_col(F.coalesce( F.lit(1.0) / F.min(F.when(F.col("rel") == 1, F.col("rn"))), F.lit(0.0)), 9).alias("rr")))


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
        CAST(floor((SUM( ln((n - df + 0.5) / (df + 0.5) + 1) * (tf * ({_BM25_K1} + 1)) / (tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / avgdl)) )) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS bm25
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
        ORDER BY CAST(floor(((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE)) FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb)) / (nq.nrm * nc.nrm)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) DESC, c.vec_id) AS rc
    FROM embeddings q
    JOIN embeddings c ON q.vec_id <> c.vec_id
    JOIN n nq ON nq.vec_id = q.vec_id
    JOIN n nc ON nc.vec_id = c.vec_id
    WHERE q.vec_id = 0)
  WHERE rc <= {_FUSE_DEPTH})
SELECT coalesce(bm.doc_id, cs.cand_id) AS id,
  CAST(bm.rb AS BIGINT) AS r_bm25, CAST(cs.rc AS BIGINT) AS r_cos,
  CAST(floor((coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + bm.rb), 0) + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + cs.rc), 0)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS rrf
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
              .agg(exact.snap_double_col(F.sum(term_score), 6).alias("bm25")))
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

    rrf = exact.snap_double_col(F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rb")), F.lit(0.0)) + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("rc")), F.lit(0.0)), 9)
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
    CAST(floor(((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE)) FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb)) / (nq.nrm * nc.nrm)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS cosine
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
  CAST(floor((CAST(COUNT(po.cand_id) AS DOUBLE) / {_FILT_K}) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE)
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
                 exact.snap_double_col(F.count("hit_id").cast("double") / _FILT_K, 6)
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
    CAST(floor(((SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE)) FROM (SELECT unnest(q.embedding) AS xa, unnest(c.embedding) AS xb)) / (nq.nrm * nc.nrm)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS cosine
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
  CAST(floor((dcg / {_IDCG_CASE}) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS ndcg_at_k
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
                    exact.snap_double_col(F.col("dcg") / F.expr(_IDCG_CASE), 9)
                    .alias("ndcg_at_k")))


_DIR_MU = 2000.0  # Dirichlet smoothing prior (Zhai & Lafferty 2001)


@query("search_dirichlet_lm_topk", oracle=f"""
WITH dl AS (
  SELECT doc_id, len({_TOKS}) AS dl FROM documents),
coll AS (SELECT CAST(SUM(dl) AS BIGINT) AS t FROM dl),
ctf AS (
  SELECT tok AS term, CAST(COUNT(*) AS BIGINT) AS ctf
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  WHERE tok IN ('join', 'scan', 'merge')
  GROUP BY tok),
pw AS (
  SELECT term, ctf, {_DIR_MU} * (CAST(ctf AS DOUBLE) / t) AS mu_pw
  FROM ctf CROSS JOIN coll),
c AS (SELECT SUM(ln(mu_pw)) AS const FROM pw),
tf AS (
  SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
  WHERE tok IN ('join', 'scan', 'merge')
  GROUP BY doc_id, tok),
adj AS (
  SELECT doc_id, SUM(ln(tf + mu_pw) - ln(mu_pw)) AS adj
  FROM tf JOIN pw USING (term) GROUP BY doc_id),
scored AS (
  SELECT dl.doc_id,
    CAST(floor((coalesce(adj.adj, 0) + c.const - 3 * ln(dl.dl + {_DIR_MU})) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS ql_score
  FROM dl LEFT JOIN adj ON adj.doc_id = dl.doc_id CROSS JOIN c)
SELECT doc_id, ql_score FROM scored
ORDER BY ql_score DESC, doc_id LIMIT 10""")
def search_dirichlet_lm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001, mu=2000) for the fixed query join/scan/merge — the
    language-modeling scoring family BM25's probabilistic one is
    usually benchmarked against: score(d) = sum_w ln(tf + mu*P(w|C))
    - |Q|*ln(|d| + mu).  Computed the way sparse IR engines do:
    rewrite as [sum over PRESENT terms of ln(tf+mu*pw) - ln(mu*pw)]
    + [sum_w ln(mu*pw)] - |Q|*ln(len+mu), so the per-(doc,term) table
    only holds postings (query-term hits), the middle sum is a 1-row
    broadcast constant, and every absent term costs nothing.  Scores
    round to 6 dp BEFORE the top-10 rank with doc_id tie-breaks (the
    tfidf libm-ulp rule).

    Scale: collection stats (ctf, total tokens) are 3-row/1-row
    broadcasts; the postings table is query-term-sized; the final
    score is a map-only projection over per-doc lengths followed by
    TakeOrderedAndProject — no corpus-wide shuffle beyond the postings
    aggregate BM25 already pays."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    dl = docs.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    coll = dl.agg(F.sum("dl").cast("long").alias("t"))
    toks = (docs.select("doc_id",
                        F.explode(F.split("text", " ")).alias("term"))
            .where(F.col("term").isin(*_BM25_TERMS)))
    ctf = toks.groupBy("term").agg(F.count("*").cast("long").alias("ctf"))
    pw = (ctf.crossJoin(F.broadcast(coll))
          .select("term", "ctf",
                  (F.lit(_DIR_MU) * (F.col("ctf").cast("double")
                                     / F.col("t"))).alias("mu_pw")))
    const = pw.agg(F.sum(F.log("mu_pw")).alias("const"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf"))
    adj = (tf.join(F.broadcast(pw), "term")
           .groupBy("doc_id")
           .agg(F.sum(F.log(F.col("tf") + F.col("mu_pw"))
                      - F.log("mu_pw")).alias("adj")))
    return (dl.join(adj, "doc_id", "left")
            .crossJoin(F.broadcast(const))
            .select("doc_id",
                    exact.snap_double_col(F.coalesce("adj", F.lit(0.0)) + F.col("const") - 3 * F.log(F.col("dl") + _DIR_MU), 6)
                    .alias("ql_score"))
            .orderBy(F.desc("ql_score"), F.asc("doc_id"))
            .limit(10))


_RM3_LAMBDA = 0.5   # original-query interpolation weight
_RM3_FB_DOCS = 10   # feedback depth
_RM3_TERMS = 20     # expansion vocabulary cut


@query("search_rm3_expansion", oracle=f"""
WITH bm AS ({_bm25_ranked_sql()}),
fb AS (SELECT doc_id FROM bm WHERE rb <= {_RM3_FB_DOCS}),
ftok AS (
  SELECT d.doc_id, unnest({_TOKS}) AS term
  FROM documents d JOIN fb USING (doc_id)),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ft FROM ftok),
fterm AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS fb_tf,
    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_fb_docs
  FROM ftok GROUP BY term)
SELECT term, fb_tf, n_fb_docs,
  CAST(floor(((1 - {_RM3_LAMBDA}) * (CAST(fb_tf AS DOUBLE) / ft) + CASE WHEN term IN ('join', 'scan', 'merge') THEN {_RM3_LAMBDA} / 3 ELSE 0 END) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS rm3_weight
FROM fterm CROSS JOIN tot
ORDER BY rm3_weight DESC, term LIMIT {_RM3_TERMS}""")
def search_rm3_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback (Lavrenko & Croft relevance
    models + Abdul-Jaleel et al.'s interpolation): take the BM25
    top-10 for join/scan/merge as the feedback set, estimate the
    relevance model P(w|R) as the MLE over the concatenated feedback
    docs (sum of tf / total feedback tokens), and interpolate with the
    uniform original query at lambda=0.5 — the expanded query a search
    engine would re-run.  Reports the top-20 expansion terms with
    their feedback tf, document spread, and RM3 weight (rounded to
    9 dp before ranking, term tie-breaks).

    Scale: the feedback set is k-bounded BY CONSTRUCTION (10 doc ids
    broadcast out of the BM25 ranking, the MMR-pool contract), so the
    explode runs on exactly 10 documents whatever the corpus size;
    the relevance-model estimate is a feedback-vocabulary-sized
    aggregate and the rank cut is TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
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
                     * (1 - _BM25_B
                        + _BM25_B * F.col("dl") / F.col("avgdl"))))
    fb = (tf.join(F.broadcast(dfreq), "term")
          .join(dl, "doc_id")
          .join(F.broadcast(avgdl))
          .groupBy("doc_id")
          .agg(exact.snap_double_col(F.sum(term_score), 6).alias("bm25"))
          .orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_RM3_FB_DOCS)
          .select("doc_id"))
    ftok = (docs.join(F.broadcast(fb), "doc_id")
            .select("doc_id", F.explode(F.split("text", " ")).alias("term")))
    tot = ftok.agg(F.count("*").cast("long").alias("ft"))
    fterm = ftok.groupBy("term").agg(
        F.count("*").cast("long").alias("fb_tf"),
        F.countDistinct("doc_id").cast("long").alias("n_fb_docs"))
    weight = exact.snap_double_col((1 - _RM3_LAMBDA) * (F.col("fb_tf").cast("double") / F.col("ft")) + F.when(F.col("term").isin(*_BM25_TERMS), F.lit(_RM3_LAMBDA / 3)).otherwise(0.0), 9)
    return (fterm.crossJoin(F.broadcast(tot))
            .select("term", "fb_tf", "n_fb_docs",
                    weight.alias("rm3_weight"))
            .orderBy(F.desc("rm3_weight"), F.asc("term"))
            .limit(_RM3_TERMS))
