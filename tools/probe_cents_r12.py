"""Round-12 (VERDICT r11 item 7): quantify the DECIMAL→BIGINT-cents
migration on a non-q1 wire.  Rebuilds q3_shipping_priority's aggregate
both ways over the identical join tree, same session, alternating,
noop sink, min of 3.

DECIMAL variant = the r10 wire shape: sum over DECIMAL(12,2) revenue
terms with the final cast.  BIGINT variant = the shipped r11+ shape
(exact e4 integer cents-of-cents sum, one terminal rescale).
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


def joined(spark):
    t = load_tables(spark, SF, ("customer", "orders", "lineitem"))
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .where(F.col("l_shipdate")
               >= F.lit("1996-03-16 00:00:00").cast("timestamp"))
        .join(t["orders"].where(
            F.col("o_orderdate")
            < F.lit("1998-03-15 00:00:00").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")))


def agg_bigint(j):
    rev_e4 = exact.rev_e4("l_extendedprice", "l_discount")
    return (j.groupBy("l_orderkey",
                      F.col("o_orderdate").cast("date").alias("orderdate"),
                      "o_orderpriority")
            .agg((F.sum(F.expr(rev_e4)).cast("double") / 10000.0)
                 .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
            .select("l_orderkey", "revenue", "orderdate", "o_orderpriority"))


def agg_decimal(j):
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1).cast("decimal(12,2)")
              - F.col("l_discount").cast("decimal(12,2)")))
    return (j.groupBy("l_orderkey",
                      F.col("o_orderdate").cast("date").alias("orderdate"),
                      "o_orderpriority")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)
            .select("l_orderkey", "revenue", "orderdate", "o_orderpriority"))


def main():
    spark = get_spark("probe_cents")
    variants = {"decimal": lambda: agg_decimal(joined(spark)),
                "bigint_cents": lambda: agg_bigint(joined(spark))}

    def run(fn):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for fn in variants.values():
        run(fn)
    samples = {n: [] for n in variants}
    for _ in range(4):
        for name, fn in variants.items():
            samples[name].append(run(fn))
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={[round(x, 3) for x in s]}")


if __name__ == "__main__":
    main()
