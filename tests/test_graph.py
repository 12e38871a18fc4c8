"""Graph operators on a hand-built graph with known answers.

K4 plus a pendant vertex:

    1 ─ 2
    │ ╳ │      (K4 on {1,2,3,4}: all 6 edges)
    3 ─ 4 ─ 5  (5 is a pendant off 4)

Known facts: 4 triangles, degrees {1:3, 2:3, 3:3, 4:4, 5:1},
common-neighbors of the non-edge candidates, and PageRank must sum to
1 with rank(4) > rank(1..3) > rank(5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from results_ingestor_spark.operators.graph import (
    common_neighbors_topk,
    copurchase_edges,
    degrees,
    pagerank,
    triangle_count,
)

K4_PENDANT = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]


@pytest.fixture(scope="module")
def edges(spark):
    return spark.createDataFrame(
        [(u, v, 1) for u, v in K4_PENDANT], "u int, v int, w int")


def test_degrees(edges):
    got = {r["u"]: r["d"] for r in degrees(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 4, 5: 1}


def test_triangle_count(edges):
    assert triangle_count(edges).collect()[0]["n_triangles"] == 4


def test_common_neighbors(edges):
    rows = common_neighbors_topk(edges, k=10).collect()
    got = {(r["a"], r["b"]): r["cn"] for r in rows}
    # Only non-adjacent pairs appear; (i, 5) shares exactly {4} with
    # each K4 vertex i ∈ {1,2,3}.
    assert got == {(1, 5): 1, (2, 5): 1, (3, 5): 1}


def test_pagerank_mass_and_order(edges):
    ranks = {r["u"]: r["r"]
             for r in pagerank(edges, iterations=10).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # stochastic: mass conserved
    assert ranks[4] > ranks[1] > ranks[5]
    assert abs(ranks[1] - ranks[2]) < 1e-12  # symmetric vertices tie
    assert abs(ranks[1] - ranks[3]) < 1e-12


def test_copurchase_edges_weights(spark):
    li = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20)],
        "l_orderkey int, l_partkey int")
    got = {(r["u"], r["v"]): r["w"]
           for r in copurchase_edges(li).collect()}
    assert got == {(10, 20): 2, (10, 30): 1, (20, 30): 1}
    strong = {(r["u"], r["v"]): r["w"]
              for r in copurchase_edges(li, min_weight=2).collect()}
    assert strong == {(10, 20): 2}


def test_pagerank_result_is_materialized_scan(edges):
    """The iterative work happens ONCE inside pagerank() (edge list
    checkpointed key-partitioned, 3 rank rounds); the returned frame is
    backed by the final rank checkpoint, so re-consuming it is an RDD
    scan — no join or shuffle re-executes per downstream action."""
    df = pagerank(edges, iterations=3)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_iterative_operators_release_intermediate_storage(spark, edges):
    """Round-5 leak fix (operators/ckpt.py): every pagerank call used to
    pin two edge-list-sized checkpoints until JVM GC (+2 persistent RDDs
    per call).  Now each call may leave only its RESULT-sized final
    checkpoint, and release_result() frees that too."""
    from results_ingestor_spark.operators.ckpt import release_result

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    results = []
    base = n_persistent()
    for _ in range(3):
        df = pagerank(edges, iterations=3)
        df.collect()
        results.append(df)
    grown = n_persistent() - base
    assert grown <= 3, f"expected <=1 residual per call, got {grown} for 3"
    for df in results:
        release_result(df)
    assert n_persistent() <= base


def test_lpa_known_answer_path_graph(spark):
    """Path 1-2-3, synchronous LPA, hand-derived: l1={1:2,2:1,3:2},
    l2={1:1,2:2,3:1}, l3={1:2,2:1,3:2} (the classic bipartite
    oscillation — deterministic under synchronous updates)."""
    from results_ingestor_spark.operators.graph import lpa_communities
    edges = spark.createDataFrame([(1, 2, 1), (2, 3, 1)], "u long, v long, w long")
    got = {r["v"]: r["label"]
           for r in lpa_communities(edges, n_iter=3).collect()}
    assert got == {1: 2, 2: 1, 3: 2}
