"""Bucketing: the co-located-join capability for repeated large joins.

At 100 TB, re-shuffling the fact table for every join on the same key is
the dominant cost; writing it bucketed by that key once makes every
subsequent equi-join shuffle-free.  This test proves the engine's write
path produces genuinely co-located tables: the join plan must contain NO
hash-partition exchange.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from results_ingestor_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    (t["orders"].write.mode("overwrite")
     .bucketBy(8, "o_custkey").sortBy("o_custkey")
     .saveAsTable("orders_bkt"))
    (t["customer"].write.mode("overwrite")
     .bucketBy(8, "c_custkey").sortBy("c_custkey")
     .saveAsTable("customer_bkt"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast so the join must pick sort-merge — which then
    # rides the bucketing instead of exchanging
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table("orders_bkt")
                  .join(spark.table("customer_bkt"),
                        F.col("o_custkey") == F.col("c_custkey"))
                  .groupBy("c_mktsegment").agg(F.count("*").alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        # no exchange below the join: bucketing provides the partitioning
        below = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning(o_custkey" not in below
        assert "Exchange hashpartitioning(c_custkey" not in below
        # and the result is right
        got = {r["c_mktsegment"]: r["n"] for r in joined.collect()}
        want = {r["c_mktsegment"]: r["n"] for r in
                (spark.table("orders_bkt")
                 .join(spark.table("customer_bkt").hint("broadcast"),
                       F.col("o_custkey") == F.col("c_custkey"))
                 .groupBy("c_mktsegment").agg(F.count("*").alias("n"))).collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
