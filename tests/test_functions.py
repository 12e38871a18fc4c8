"""Cross-engine determinism tests for expression helpers."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from results_ingestor_spark.functions.agg import pg_string_agg_distinct
from results_ingestor_spark.functions.hashing import md5_long
from results_ingestor_spark.functions.vector import cosine_similarity
from results_ingestor_spark.plans.oracles import md5_long_sql, sad


def test_md5_long_matches_duckdb(spark):
    vals = ["hello", "world", "", "DISTRICT 9", "ünïcode"]
    sdf = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {r["s"]: r["h"] for r in sdf.select("s", md5_long("s", seed="x").alias("h")).collect()}
    con = duckdb.connect()
    for v in vals:
        want = con.sql(f"select {md5_long_sql('?', seed='x')}".replace("?", f"'{v}'")).fetchone()[0]
        assert got[v] == want, v


def test_pg_string_agg_distinct_matches_duckdb(spark):
    rows = [("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", None),
            ("g2", None), ("g3", "z")]
    sdf = spark.createDataFrame(rows, ["g", "v"])
    got = {r["g"]: r["agg"] for r in
           sdf.groupBy("g").agg(pg_string_agg_distinct("v").alias("agg")).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t (g varchar, v varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.sql(f"select g, {sad('v')} from t group by g").fetchall())
    assert got == want
    assert got["g1"] == "a|b"
    assert got["g2"] is None  # all-NULL group → NULL, not ''


def test_cosine_similarity(spark):
    sdf = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 1.0]), ([1.0, 2.0], [2.0, 4.0]), ([0.0, 0.0], [1.0, 0.0])],
        ["a", "b"])
    got = [r["c"] for r in sdf.select(cosine_similarity("a", "b").alias("c")).collect()]
    assert abs(got[0] - 0.7071067811865475) < 1e-12
    assert abs(got[1] - 1.0) < 1e-12
    assert got[2] is None  # zero-norm → NULL


def test_approx_sketches_error_bounds(spark, sf_dir):
    """HLL++/GK sketches have no oracle; bound their error vs exact."""
    from pyspark.sql import functions as F
    from results_ingestor_spark.sources.tables import load_tables
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    exact = {r["o_orderstatus"]: (r["d"], r["m"]) for r in
             orders.groupBy("o_orderstatus").agg(
                 F.countDistinct("o_custkey").alias("d"),
                 F.percentile("o_totalprice", F.lit(0.5)).alias("m")).collect()}
    approx = {r["o_orderstatus"]: (r["approx_customers"], r["approx_median"])
              for r in __import__("results_ingestor_spark.plans.functions_q",
                                  fromlist=["approx_sketches"])
              .approx_sketches(spark, sf_dir).collect()}
    for k, (d, m) in exact.items():
        ad, am = approx[k]
        assert abs(ad - d) / max(d, 1) < 0.1
        assert abs(am - m) / max(abs(m), 1) < 0.05
