"""Deterministic corpus shuffle (operators/shuffle.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from results_ingestor_spark.operators.shuffle import (
    global_shuffle_index, with_shuffle_key, write_shuffled_shards)
from results_ingestor_spark.sources.tables import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def test_global_index_is_permutation(spark, sf_dir):
    idx = global_shuffle_index(_docs(spark, sf_dir), seed=7)
    n = idx.count()
    stats = idx.agg(F.min("global_pos"), F.max("global_pos"),
                    F.countDistinct("global_pos")).first()
    assert tuple(stats) == (0, n - 1, n)


def test_index_matches_key_order(spark, sf_dir):
    """global_pos must equal the rank in a plain (key, id) sort."""
    idx = global_shuffle_index(_docs(spark, sf_dir), seed=7)
    rows = idx.orderBy("global_pos").select("shuffle_key", "doc_id").collect()
    assert [tuple(r) for r in rows] == sorted(tuple(r) for r in rows)


def test_seeds_give_different_orders_but_stable_reruns(spark, sf_dir):
    d = _docs(spark, sf_dir)
    a = [r["doc_id"] for r in
         global_shuffle_index(d, 1).orderBy("global_pos").collect()]
    a2 = [r["doc_id"] for r in
          global_shuffle_index(d, 1).orderBy("global_pos").collect()]
    b = [r["doc_id"] for r in
         global_shuffle_index(d, 2).orderBy("global_pos").collect()]
    assert a == a2  # reproducible
    assert a != b   # epoch-distinct
    assert sorted(a) == sorted(b)


def test_shard_writer_sorted_disjoint_ranges(spark, sf_dir, tmp_path):
    """Output files must cover disjoint key ranges, each sorted — a
    training job can stream file 0, 1, 2... and see the global order."""
    out = str(tmp_path / "shuffled")
    write_shuffled_shards(_docs(spark, sf_dir), out, seed=7, n_files=4)
    parts = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(parts) == 4
    ranges = []
    for p in parts:
        keys = [r["shuffle_key"] for r in
                spark.read.parquet(os.path.join(out, p)).collect()]
        assert keys == sorted(keys)
        if keys:
            ranges.append((keys[0], keys[-1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint, ordered ranges
    back = spark.read.parquet(out)
    assert back.count() == _docs(spark, sf_dir).count()
    assert with_shuffle_key(_docs(spark, sf_dir), 7).select(
        "shuffle_key").distinct().count() == back.select(
        "shuffle_key").distinct().count()


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join must be bag-equal to the plain equi-join — salting is
    a physical rewrite, never a semantic one."""
    from pyspark.sql import functions as F

    from results_ingestor_spark.operators.skew import salted_join
    from results_ingestor_spark.sources.tables import load_tables

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    left = t["orders"].select("o_orderkey", "o_custkey")
    right = t["customer"].select(F.col("c_custkey").alias("o_custkey"),
                                 "c_mktsegment")
    plain = left.join(right, "o_custkey")
    salted = salted_join(left, right, "o_custkey", salt_buckets=4)
    assert salted.count() == plain.count()
    diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert diff == 0


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling, executed for real: a join where one hot
    key dominates must show `skew=true` on the join node of the FINAL
    adaptive plan — the runtime answer to skew that salting
    (salted_join above) solves statically.  Locally the skew thresholds
    are lowered to make a ~200k-row hot key qualify; on a real cluster
    the defaults (256 MB / 5x median) arm this at data scale.  Pins
    that our session config (AQE + skewJoin enabled, session.py) leaves
    the mechanism armed."""
    from pyspark.sql import functions as F

    keys = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        hot = spark.range(200_000).select(
            F.lit("hot").alias("k"), F.col("id").alias("payload"))
        cold = spark.range(2_000).select(
            F.concat(F.lit("c"), F.col("id")).alias("k"),
            F.col("id").alias("payload"))
        left = hot.unionAll(cold)
        right = (spark.range(50).select(
                     F.lit("hot").alias("k"), F.col("id").alias("r"))
                 .unionAll(spark.range(2_000).select(
                     F.concat(F.lit("c"), F.col("id")).alias("k"),
                     F.col("id").alias("r"))))
        j = left.join(right, "k")
        # Execute THIS Dataset's own QueryExecution (a .count() builds a
        # separate aggregate query and leaves j's adaptive plan
        # unfinalized — isFinalPlan=false shows no skew handling yet).
        n = j._jdf.queryExecution().toRdd().count()
        assert n == 200_000 * 50 + 2_000   # hot fanout + cold 1:1
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:1500]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
