"""Graph analytics over relational-derived edge tables.

The reference has no graph operators (its pipeline is flat ETL:
ingestor_precinct.py:54-118); this family is part of the §2.4
"beyond-the-reference" surface a large-scale training-data /
analytics engine needs: co-occurrence graphs, degree statistics,
triangle counting, link prediction, and bounded-iteration PageRank —
all expressed as DataFrame joins/aggregations so Catalyst plans them
(shuffle-hash joins on node keys, ReusedExchange across PageRank
iterations), with no driver-side graph materialization.

Scale design:
- Edge construction from co-occurrence is bounded per group: an order
  with k lines yields k·(k-1)/2 pairs, and k is a small constant
  (corpus max 13), so edge generation is linear in fact rows.
- Wedge enumeration (common-neighbors) is Σ deg² — the weight
  threshold (`min_weight`) is the blocking knob that keeps the
  strong graph sparse; at 100 TB you'd also cap per-node degree
  (drop hub nodes) the same way MinHash-LSH caps band bucket sizes.
- PageRank keeps ranks as a DataFrame keyed by node; each iteration
  is one shuffle on node id.  Identical edge/degree subplans across
  iterations collapse to ReusedExchange under AQE, so the edge list
  is shuffled once, not once per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from results_ingestor_spark.operators.ckpt import CheckpointScope


def copurchase_edges(lineitem: DataFrame, min_weight: int = 1) -> DataFrame:
    """Undirected weighted part-co-purchase edges: (u, v, w) with
    u < v, where w = number of orders containing both parts.

    The self-join shuffles both sides on l_orderkey (one exchange,
    co-partitioned), and the u < v predicate halves the pair space
    and canonicalizes edge direction at the source.
    """
    a = lineitem.select(F.col("l_orderkey").alias("__ok"),
                        F.col("l_partkey").alias("u"))
    b = lineitem.select(F.col("l_orderkey").alias("__ok2"),
                        F.col("l_partkey").alias("v"))
    edges = (a.join(b, (F.col("__ok") == F.col("__ok2"))
                    & (F.col("u") < F.col("v")))
             .groupBy("u", "v").agg(F.count("*").alias("w")))
    if min_weight > 1:
        edges = edges.where(F.col("w") >= min_weight)
    return edges.select("u", "v", "w")


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of an undirected (u < v) edge list."""
    return (edges.select("u", "v")
            .union(edges.select(F.col("v").alias("u"),
                                F.col("u").alias("v"))))


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree (u, d) of the undirected graph."""
    return symmetrize(edges).groupBy("u").agg(F.count("*").alias("d"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """1-row global triangle count via the canonical three-edge join
    on u < v < w orientation: e1=(a,b), e2=(b,c), e3=(a,c).

    Each triangle is counted exactly once because every edge is
    stored low→high.  At scale the standard refinement is
    degree-ordered orientation (point edges from low-degree to
    high-degree nodes) which bounds join fan-out by arboricity; the
    id-ordered form here is the same plan shape and is what the SQL
    oracle can mirror exactly.
    """
    e1 = edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = edges.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = edges.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    return (e1.join(e2, F.col("b") == F.col("b2"))
            .join(e3, (F.col("a") == F.col("a3"))
                  & (F.col("c") == F.col("c3")))
            .agg(F.count("*").alias("n_triangles")))


def common_neighbors_topk(edges: DataFrame, k: int = 20) -> DataFrame:
    """Link prediction: top-k NON-adjacent node pairs ranked by
    common-neighbor count.

    Wedges come from the symmetrized edge list self-joined on the
    center node (s1.v < s2.v canonicalizes the candidate pair); the
    anti join removes pairs that are already edges.  Deterministic
    top-k: unique (cn DESC, a, b) ordering.
    """
    sym = symmetrize(edges)
    s1 = sym.select(F.col("u").alias("ctr"), F.col("v").alias("a"))
    s2 = sym.select(F.col("u").alias("ctr2"), F.col("v").alias("b"))
    wedges = (s1.join(s2, (F.col("ctr") == F.col("ctr2"))
                      & (F.col("a") < F.col("b")))
              .groupBy("a", "b").agg(F.count("*").alias("cn")))
    return (wedges.join(edges.select(F.col("u").alias("a"),
                                     F.col("v").alias("b")),
                        ["a", "b"], "left_anti")
            .orderBy(F.desc("cn"), F.asc("a"), F.asc("b"))
            .limit(k))


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Bounded-iteration PageRank on the undirected graph: returns
    (u, r) after `iterations` synchronous updates of
    r = (1-d)/N + d·Σ r_in/deg_in, initialized uniform 1/N.

    Each iteration is a join of the symmetrized edges with the current
    ranks plus one aggregation on the destination node — the same
    per-iteration shape GraphX/Pregel would schedule.  The edge list is
    ``localCheckpoint``ed ONCE before iterating: ``edges`` is usually a
    derived frame (the co-purchase self-join), and a fully lazy loop
    re-derives it per iteration (measured round 4: the sf0.1 plan held
    66 Exchanges / zero ReusedExchange and the query ran 6.1 s; with
    the edge materialization it is one derivation + 3 rank rounds,
    4.3 s).  Materializing the edge list before iterating is exactly
    what a 100 TB deployment does too.  Every node has degree ≥ 1 in a
    symmetrized co-occurrence graph, so there are no dangling-mass
    corrections to distribute.
    """
    # The edge list materializes PARTITIONED AND SORTED on the join key
    # so every iteration's join consumes it in place instead of
    # re-exchanging/re-sorting 2|E| rows per round; deg and the node
    # count are ITERATION-INVARIANT and materialize once too (the
    # count is a 1-value driver read, bounded by contract).  Measured
    # on a 12M-edge corpus (10× spot-check, round 5): fully-lazy loop
    # 30.2 s → invariants pinned 26.9 s → key-partitioned checkpoint
    # 13.2 s, with 5×→10× scaling turning near-flat — the standard
    # Pregel shape (graph partitioned once at build, degrees computed
    # once).
    # Storage lifecycle (operators/ckpt.py): the edge-list-sized
    # checkpoints are RELEASED before returning — only the |V|-row rank
    # table stays persisted.  Without this, every call pinned two full
    # edge-list copies until JVM GC (measured: +2 persistent RDDs per
    # call, 10 after five calls).
    scope = CheckpointScope(edges)
    sym = scope.checkpoint(
        symmetrize(edges).repartition("u").sortWithinPartitions("u"))
    deg = scope.checkpoint(sym.groupBy("u").agg(F.count("*").alias("d"))
                           .sortWithinPartitions("u"))
    n_nodes = float(deg.count())
    ranks = deg.select("u", (F.lit(1.0) / F.lit(n_nodes)).alias("r"))
    for _ in range(iterations):
        contrib = (sym.join(ranks, "u").join(deg, "u")
                   .groupBy("v")
                   .agg(F.sum(F.col("r") / F.col("d")).alias("c")))
        ranks = contrib.select(
            F.col("v").alias("u"),
            (F.lit((1.0 - damping) / n_nodes)
             + F.lit(damping) * F.col("c")).alias("r"))
    final = scope.checkpoint(ranks)
    scope.release_all_except(final)
    final._ckpt_scope = scope  # caller hook: ckpt.release_result(df)
    return final


def lpa_communities(edges: DataFrame, n_iter: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection.

    Each round every node adopts the most frequent label among its
    neighbors (ties → smallest label; isolated nodes keep their own).
    Synchronous updates + total tie order make the trajectory
    deterministic, so the unrolled-SQL oracle can replay it exactly.
    Scale: each round is one (edge ⋈ label) shuffle keyed on node id
    and one per-node argmax — the same budget as a PageRank step;
    localCheckpoint truncates the growing lineage, and the edge list
    is checkpointed once so rounds don't re-derive the co-purchase
    self-join (see pagerank).
    """
    from pyspark.sql import functions as F
    # Key-partitioned + sorted checkpoint, like pagerank: each round's
    # label join consumes the edge list in place instead of
    # re-exchanging/re-sorting 2|E| rows (measured 35.6→30.4 s on the
    # 12M-edge 10× corpus — a smaller win than pagerank's because LPA's
    # per-round cost is dominated by the unavoidable (u,label) message
    # aggregation, which IS the algorithm).
    # Storage lifecycle (operators/ckpt.py): each round's label
    # checkpoint supersedes the previous one, which is released
    # immediately; the edge list is released before returning.  Only
    # the final |V|-row labeling stays persisted.
    scope = CheckpointScope(edges)
    sym = scope.checkpoint(symmetrize(edges).select("u", "v")
                           .repartition("v").sortWithinPartitions("v"))
    nodes = sym.select(F.col("u").alias("v")).distinct()
    labels = scope.checkpoint(nodes.select("v", F.col("v").alias("label")))
    for _ in range(n_iter):
        counts = (sym.join(labels.withColumnRenamed("v", "nb"),
                           F.col("v") == F.col("nb"))
                  .groupBy("u", "label").agg(F.count("*").alias("c")))
        best = (counts.groupBy("u")
                .agg(F.max(F.struct(F.col("c"),
                                    (-F.col("label")).alias("nl")))
                      .alias("m"))
                .select(F.col("u").alias("v"),
                        (-F.col("m.nl")).alias("new_label")))
        new_labels = scope.checkpoint(
            labels.join(best, "v", "left")
            .select("v", F.coalesce("new_label", "label").alias("label")))
        scope.release(labels)
        labels = new_labels
    scope.release_all_except(labels)
    labels._ckpt_scope = scope  # caller hook: ckpt.release_result(df)
    return labels


def k_core(edges: DataFrame, k: int = 3, rounds: int = 6) -> DataFrame:
    """Bounded-round k-core peel: repeatedly drop nodes whose CURRENT
    degree is below k (removing a node lowers its neighbors' degrees,
    which can push them under the bar next round — hence iteration).
    Returns (u, core_degree) for the surviving nodes after ``rounds``
    peels — on a converged graph extra rounds are no-ops, so a fixed
    round count is both deterministic and oracle-unrollable.

    Scale: each round is one degree aggregation plus two semi joins on
    node id; ``localCheckpoint`` truncates lineage the same way the
    connected-components loop does (operators/dedup.py).

    r12: rounds EARLY-EXIT on an unchanged edge count — the fixpoint
    check the docstring had always promised "at real scale".  Peeling
    only ever REMOVES edges, so an unchanged count after a peel means
    the edge SET is unchanged, every degree is unchanged, and all
    remaining rounds are provable no-ops — the returned
    (u, core_degree) frame is bit-identical to the fixed-round
    trajectory the oracle unrolls.  The count reads the round's
    already-materialized (eager-checkpoint) edge blocks, a ~0.1 s scan
    vs ~1 s per skipped peel; measured at sf0.1 the co-purchase graph
    is ALREADY its own 3-core (2.39M symmetric edges, zero nodes
    peeled), so 5 of 6 rounds were pure no-op work.
    """
    # Storage lifecycle (operators/ckpt.py): each peel's surviving edge
    # list supersedes the previous one (released immediately); the
    # returned per-node result is checkpointed so the last edge list
    # can be released too.
    scope = CheckpointScope(edges)
    sym = scope.checkpoint(symmetrize(edges))
    n_edges = sym.count()
    for _ in range(rounds):
        deg = sym.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.where(F.col("d") >= k).select("u")
        new_sym = scope.checkpoint(
            sym.join(keep, "u", "left_semi")
               .join(keep.withColumnRenamed("u", "v"), "v", "left_semi"))
        scope.release(sym)
        sym = new_sym
        new_n = sym.count()
        if new_n == n_edges:
            break  # fixpoint: this peel removed nothing
        n_edges = new_n
    out = scope.checkpoint(
        sym.groupBy("u").agg(F.count("*").alias("core_degree"))
        .where(F.col("core_degree") >= k))
    scope.release_all_except(out)
    out._ckpt_scope = scope  # caller hook: ckpt.release_result(df)
    return out
