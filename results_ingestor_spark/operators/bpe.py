"""Byte-pair-encoding merge training as a Spark iterative algorithm.

The published BPE trainer (Sennrich et al. 2016) counts adjacent symbol
pairs over the *word vocabulary with frequencies* — not the raw corpus —
so after one corpus-sized group-by the iteration state is vocabulary-
sized and corpus-size-independent.  That is the scale contract here:

- one shuffle over the corpus builds ``(word, count)``;
- each merge iteration is a vocabulary-sized explode + group-by and a
  **single-row** driver collect (the argmax pair), the same driver
  footprint as a k-means centroid step;
- the merge rewrite is a JVM ``aggregate`` fold over the symbol array
  (greedy left-to-right, non-overlapping — standard BPE semantics).

The reference has no tokenizer surface; this extends the north-star
text-pipeline family (token counting: SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"

MERGE_SCHEMA = T.StructType([
    T.StructField("merge_rank", T.IntegerType(), False),
    T.StructField("left", T.StringType(), False),
    T.StructField("right", T.StringType(), False),
    T.StructField("merged", T.StringType(), False),
    T.StructField("pair_count", T.LongType(), False),
])


def _initial_symbols() -> Column:
    """word → [c, h, a, r, s…, last</w>] (end-of-word marker fused onto
    the final character, per the published algorithm)."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END))))


def _merge_fold(left: str, right: str,
                symbols: Column | None = None) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs
    via a JVM aggregate fold — no Python in the rewrite."""
    merged = left + right

    def step(acc: Column, x: Column) -> Column:
        hit = ((F.size(acc) > 0)
               & (F.element_at(acc, -1) == F.lit(left))
               & (x == F.lit(right)))
        return (F.when(hit,
                       F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                F.array(F.lit(merged))))
                .otherwise(F.concat(acc, F.array(x))))

    empty = F.expr("CAST(array() AS array<string>)")
    src = F.col("symbols") if symbols is None else symbols
    return F.aggregate(src, empty, step)


def train_bpe_merges(docs: DataFrame, n_merges: int = 8,
                     text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns a small DataFrame (merge_rank, left, right, merged,
    pair_count), deterministic under the (count DESC, left ASC,
    right ASC) tie-break.
    """
    from results_ingestor_spark.operators.ckpt import CheckpointScope

    spark = docs.sparkSession
    # Storage lifecycle (operators/ckpt.py): the merge result is a
    # driver-side list, so every vocab-sized checkpoint is releasable —
    # superseded ones as soon as their successor's blocks exist (the
    # next merge's .first() materializes the lazy checkpoint, so the
    # parent release is delayed one iteration), all of them at return.
    scope = CheckpointScope(docs)
    words = (docs
             .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
             .where(F.col("word") != "")
             .groupBy("word").agg(F.count("*").alias("cnt"))
             .select(_initial_symbols().alias("symbols"), "cnt"))
    words = scope.checkpoint(words)  # vocab-sized, truncates lineage
    pending_release = None  # parent awaiting its successor's first compute

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        n = F.size("symbols")
        pairs = words.select(
            "cnt",
            F.explode(F.arrays_zip(
                F.slice("symbols", 1, n - 1).alias("a"),
                F.slice("symbols", 2, n - 1).alias("b"))).alias("p"))
        counts = (pairs
                  .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                  .agg(F.sum("cnt").alias("c")))
        top = (counts
               .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
               .first())  # single-row driver collect, centroid-sized
        # that .first() materialized the current `words` checkpoint, so
        # its parent's blocks are no longer reachable from anything live
        if pending_release is not None:
            scope.release(pending_release)
        if top is None:
            break
        merges.append((rank, top["a"], top["b"], top["a"] + top["b"],
                       int(top["c"])))
        # lazy checkpoint: lineage still truncates at first compute,
        # but no extra materialization job per merge (~30% faster at
        # sf0.1 with identical results)
        new_words = scope.checkpoint(
            words.withColumn("symbols", _merge_fold(top["a"], top["b"])),
            eager=False)
        pending_release = words
        words = new_words
    scope.release_all_except()  # result is driver-side: release everything
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def tokenize_with_merges(docs: DataFrame, merges: list[tuple[str, str]],
                         text_col: str = "text") -> DataFrame:
    """Segment documents with a learned merge list → per-doc subword
    counts (doc_id, n_words, n_subwords, compression = chars/subwords).

    Scale shape: the merge-fold chain is applied to the *distinct word
    vocabulary* (one group-by), then joined back — per-word work is done
    once however often the word repeats, and the applied chain is pure
    JVM expression folds (no Python, no per-merge jobs)."""
    from results_ingestor_spark.plans import exact
    words = (docs
             .select("doc_id", F.explode(F.split(F.col(text_col), " "))
                     .alias("word"))
             .where(F.col("word") != ""))
    vocab = words.groupBy("word").agg(F.count("*").alias("_n")).drop("_n")
    sym = _initial_symbols()
    for left, right in merges:
        sym = _merge_fold(left, right, symbols=sym)
    subtok = vocab.select(
        "word", F.size(sym).alias("n_sub"),
        F.length("word").cast("long").alias("n_chr"))
    return (words.join(subtok, "word")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_sub").alias("n_subwords"),
                 exact.snap_double_col(F.sum("n_chr").cast("double") / F.sum("n_sub"), 6)
                  .alias("chars_per_subword")))
