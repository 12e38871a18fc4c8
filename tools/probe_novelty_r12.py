"""Round-12 A/B: text_novelty_unique_ngrams with string-gram shuffle
(r11 shape) vs xxhash64-gram shuffle (r12), same session, alternating,
noop sink, min of 3.  Also asserts both produce identical rows first.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from results_ingestor_spark.plans import exact
from results_ingestor_spark.sources.tables import load_tables
from results_ingestor_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

GRAMS = (
    "CASE WHEN size(split(text, ' ')) >= 4 THEN "
    "array_distinct(transform(sequence(1, size(split(text, ' ')) - 3), "
    "i -> concat_ws(' ', slice(split(text, ' '), i, 4)))) "
    "ELSE CAST(array() AS ARRAY<STRING>) END")


def build(spark, hashed: bool):
    t = load_tables(spark, SF, ("documents",))
    g = t["documents"].select("doc_id", F.explode(F.expr(GRAMS)).alias("gram"))
    if hashed:
        g = g.select("doc_id", F.xxhash64("gram").alias("gram"))
    g = g.repartition("gram")
    per_gram = (g.groupBy("gram")
                .agg(F.count("*").cast("long").alias("df"),
                     F.min("doc_id").alias("doc_id")))
    uniq = (per_gram.where(F.col("df") == 1)
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_unique")))
    nov = (g.groupBy("doc_id")
           .agg(F.count("*").cast("long").alias("n_grams"))
           .join(uniq, "doc_id", "left")
           .withColumn("n_unique", F.coalesce("n_unique",
                                              F.lit(0).cast("long")))
           .join(t["documents"].select("doc_id", "source"), "doc_id"))
    return (nov.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_grams").cast("long").alias("sum_grams"),
                 F.sum("n_unique").cast("long").alias("sum_unique"),
                 F.sum(F.when(F.col("n_unique") == F.col("n_grams"), 1)
                       .otherwise(0)).cast("long").alias("n_fully_novel"))
            .select("source", "n_docs", "sum_grams", "sum_unique",
                    exact.snap_double_col(
                        F.col("sum_unique").cast("double")
                        / F.col("sum_grams"), 9).alias("novelty_micro"),
                    "n_fully_novel")
            .orderBy("source"))


def main():
    spark = get_spark("probe_novelty")
    a, b = build(spark, False), build(spark, True)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"string-vs-hash diff rows: {diff}", flush=True)
    assert diff == 0

    variants = {"string": lambda: build(spark, False),
                "hashed": lambda: build(spark, True)}

    def run(fn):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for fn in variants.values():
        run(fn)
    samples = {n: [] for n in variants}
    for _ in range(3):
        for name, fn in variants.items():
            samples[name].append(run(fn))
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={[round(x, 3) for x in s]}")


if __name__ == "__main__":
    main()
