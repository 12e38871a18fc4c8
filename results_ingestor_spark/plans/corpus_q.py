"""Corpus-preparation queries (north-star M3 round 3): RAG chunking,
n-gram language-model scoring, distribution-drift testing, and BPE merge
training.

These extend the text/curation families with the remaining operators a
training-data pipeline runs between raw documents and a tokenized
dataset.  All hot paths are built-in expressions; the BPE trainer's only
driver traffic is one argmax row per merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from results_ingestor_spark.operators.bpe import train_bpe_merges
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables

_TOKS = "string_split(text, ' ')"

CHUNK = 64    # tokens per chunk
STRIDE = 48   # tokens between chunk starts (CHUNK-STRIDE = 16 overlap)


@query("text_chunk_windows", oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), {STRIDE})) AS start FROM tk)
SELECT doc_id,
  CAST(start // {STRIDE} AS BIGINT) AS chunk_id,
  CAST(least({CHUNK}, len(t) - start) AS BIGINT) AS n_chunk_tokens,
  array_to_string(t[start + 1 : start + {CHUNK}], ' ') AS chunk_text
FROM starts""")
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, stride 48) —
    the RAG / context-window preparation step.  Pure narrow plan: one
    sequence + explode + slice per document, no shuffle; at 100 TB this
    is a map-only stage whose output is ~4/3× the input tokens."""
    t = load_tables(spark, sf_dir, ("documents",))
    tk = F.split("text", " ")
    d = t["documents"].select(
        "doc_id", tk.alias("t"),
        F.explode(F.sequence(
            F.lit(0), F.size(tk) - 1, F.lit(STRIDE))).alias("start"))
    return d.select(
        "doc_id",
        (F.col("start") / STRIDE).cast("long").alias("chunk_id"),
        F.least(F.lit(CHUNK), F.size("t") - F.col("start"))
         .cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.slice("t", F.col("start") + 1, F.lit(CHUNK)))
         .alias("chunk_text"))


@query("lm_bigram_perplexity", oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk),
bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2 FROM idx),
cb AS (SELECT w1, w2, COUNT(*) AS c_bi FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c_ctx FROM bg GROUP BY w1),
v AS (SELECT COUNT(DISTINCT tok) AS vsz
      FROM (SELECT unnest(t) AS tok FROM tk)),
scored AS (
  SELECT bg.doc_id,
    CAST(round(ln(CAST(cb.c_bi + 1 AS DOUBLE) / (c1.c_ctx + v.vsz)), 9)
         AS DECIMAL(18, 9)) AS lp
  FROM bg JOIN cb USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id, COUNT(*) AS n_bigrams,
  round(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM scored GROUP BY doc_id""")
def lm_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained add-one-smoothed bigram LM scoring each document's
    mean token log-probability — the KenLM-perplexity-filter shape
    (CCNet) expressed as two aggregations and two equi-joins.

    Determinism contract: the per-bigram ln() is rounded to 9 dp and
    summed as DECIMAL (order-independent), so Spark and the oracle agree
    exactly despite float addition being non-associative.  Scale: the
    bigram-count join shuffles on (w1, w2) — skew on stop-bigrams is
    AQE's skew-join case; V is a 1-row broadcast."""
    t = load_tables(spark, sf_dir, ("documents",))
    tk = F.split("text", " ")
    n = F.size(tk)
    bg = (t["documents"]
          .select("doc_id", F.explode(F.arrays_zip(
              F.slice(tk, 1, n - 1).alias("w1"),
              F.slice(tk, 2, n - 1).alias("w2"))).alias("p"))
          .select("doc_id", F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2")))
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_bi"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c_ctx"))
    v = (t["documents"]
         .select(F.explode(tk).alias("tok"))
         .agg(F.countDistinct("tok").alias("vsz")))
    lp = F.round(
        F.log(F.col("c_bi").cast("double") + 1)
        - F.log((F.col("c_ctx") + F.col("vsz")).cast("double")), 9
    ).cast("decimal(18,9)")
    scored = (bg.join(cb, ["w1", "w2"]).join(c1, ["w1"])
                .crossJoin(F.broadcast(v))
                .select("doc_id", lp.alias("lp")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.sum("lp").cast("double") / F.count("*"), 6)
                  .alias("avg_logprob")))


@query("stats_ks_two_sample", oracle="""
WITH s AS (
  SELECT value,
    count_if(event_type = 'click') AS c1,
    count_if(event_type = 'view')  AS c2
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY value),
cum AS (
  SELECT
    CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
    CAST(SUM(c2) OVER w AS BIGINT) AS cum2
  FROM s WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)),
tot AS (SELECT MAX(cum1) AS n1, MAX(cum2) AS n2 FROM cum)
SELECT n1 AS n_click, n2 AS n_view,
  (SELECT MAX(abs(cum1 * n2 - cum2 * n1)) FROM cum) AS d_numer,
  round(CAST((SELECT MAX(abs(cum1 * n2 - cum2 * n1)) FROM cum) AS DOUBLE)
        / (n1 * n2), 9) AS d_stat
FROM tot""")
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between the 'click' and 'view'
    value distributions — the distribution-drift test, computed EXACTLY:
    D's numerator max|cum1*n2 - cum2*n1| stays in integers, one division
    at the end.

    The global-order window runs over *distinct values* (pre-aggregated
    counts), not rows — the single-partition window is bounded by the
    value domain, the same contract as the equi-depth histogram."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].where(F.col("event_type").isin("click", "view"))
    s = ev.groupBy("value").agg(
        F.count_if(F.col("event_type") == "click").alias("c1"),
        F.count_if(F.col("event_type") == "view").alias("c2"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wfull = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    cum = s.select(F.sum("c1").over(w).cast("long").alias("cum1"),
                   F.sum("c2").over(w).cast("long").alias("cum2"))
    tot = cum.select(
        "cum1", "cum2",
        F.max("cum1").over(wfull).alias("n1"),
        F.max("cum2").over(wfull).alias("n2"))
    return (tot
            .select("n1", "n2",
                    F.abs(F.col("cum1") * F.col("n2")
                          - F.col("cum2") * F.col("n1")).alias("diff"))
            .agg(F.max("n1").alias("n1"), F.max("n2").alias("n2"),
                 F.max("diff").alias("d_numer"))
            .select(F.col("n1").alias("n_click"),
                    F.col("n2").alias("n_view"), "d_numer",
                    F.round(F.col("d_numer").cast("double")
                            / (F.col("n1") * F.col("n2")), 9)
                     .alias("d_stat")))


@query("bpe_train_merges")  # iterative trainer — no single-statement SQL twin
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 BPE merges learned from the documents corpus (see
    operators/bpe.py for the algorithm and its scale contract).  Verified
    by the published-example golden in tests/test_bpe.py; the driver
    records a rows-only check (iterative argmax is not one SQL
    statement)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return train_bpe_merges(t["documents"], n_merges=8)
