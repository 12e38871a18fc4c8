"""Spatial operators: grid-bucketed radius joins and kNN.

The reference has no spatial surface; this family covers the
"operator Spark lacks" case (SURVEY §2.4): a distance join is a
θ-join Spark would otherwise plan as a cartesian product.  The
standard scale-safe strategy — the same one Sedona/GeoSpark use — is
grid blocking: bucket points into cells of side = radius, replicate
each LEFT point into its 3×3 cell neighborhood, equi-join on cell
key, then apply the exact distance predicate as the join residual.
Every candidate pair shares a cell key, so the join is a plain
shuffle-hash join on (cx, cy) and the pair space is bounded by local
density, never n².

Coordinates here are exact INTEGERS (md5-derived from ids, the
cross-engine hash tier from functions/hashing.py — a multiplicative
hash would put every point on a 1-D lattice line mod the grid size
and no close pairs would exist), so the distance predicate d² ≤ r²
is integer arithmetic — bit-identical in any engine, no
floating-point boundary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from results_ingestor_spark.functions.hashing import md5_long


def synth_points(ids: DataFrame) -> DataFrame:
    """Deterministic (point_id, x, y) in a 10000² integer grid from a
    1-column `point_id` DataFrame.  md5-derived per axis (seeds 'x'/'y')
    so both engines scatter identically; DuckDB twin:
    ``('0x' || substr(md5('x' || point_id), 1, 15))::bigint % 10000``."""
    pid = F.col("point_id").cast("string")
    return ids.select("point_id",
                      (md5_long(pid, "x") % 10000).alias("x"),
                      (md5_long(pid, "y") % 10000).alias("y"))


def radius_pairs(points: DataFrame, radius: int) -> DataFrame:
    """All pairs (a < b) within euclidean distance `radius`:
    (a, b, dist_sq).  Left side replicates into the 3×3 neighbor
    cells; right side keeps its home cell; equi-join on the cell key
    carries the exact integer d² ≤ r² residual."""
    cell = lambda c: F.floor(F.col(c) / radius)  # noqa: E731
    left = (points.select(F.col("point_id").alias("a"),
                          F.col("x").alias("ax"), F.col("y").alias("ay"))
            .withColumn("__dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
            .withColumn("__dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
            .withColumn("cx", cell("ax") + F.col("__dx"))
            .withColumn("cy", cell("ay") + F.col("__dy"))
            .drop("__dx", "__dy"))
    right = (points.select(F.col("point_id").alias("b"),
                           F.col("x").alias("bx"), F.col("y").alias("by"))
             .withColumn("cx", cell("bx"))
             .withColumn("cy", cell("by")))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    return (left.join(right, ["cx", "cy"])
            .where((F.col("a") < F.col("b")) & (d2 <= radius * radius))
            .select("a", "b", d2.alias("dist_sq")))


def knn_within(points: DataFrame, probes: DataFrame, radius: int,
               k: int) -> DataFrame:
    """k nearest neighbors of each probe among points within `radius`
    (grid-candidate generation + per-probe top-k): (probe_id,
    neighbor_id, dist_sq, rank).  Deterministic rank order
    (dist_sq, neighbor_id).  Probes outside anyone's radius emit
    nothing — the caller chooses radius ≥ expected kth distance, the
    same contract as an IVF nprobe setting."""
    from pyspark.sql import Window

    cell = lambda c: F.floor(F.col(c) / radius)  # noqa: E731
    pr = (probes.select(F.col("point_id").alias("probe_id"),
                        F.col("x").alias("px"), F.col("y").alias("py"))
          .withColumn("__dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
          .withColumn("__dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
          .withColumn("cx", cell("px") + F.col("__dx"))
          .withColumn("cy", cell("py") + F.col("__dy"))
          .drop("__dx", "__dy"))
    pt = (points.select(F.col("point_id").alias("neighbor_id"),
                        F.col("x").alias("nx"), F.col("y").alias("ny"))
          .withColumn("cx", cell("nx"))
          .withColumn("cy", cell("ny")))
    d2 = ((F.col("px") - F.col("nx")) * (F.col("px") - F.col("nx"))
          + (F.col("py") - F.col("ny")) * (F.col("py") - F.col("ny")))
    w = (Window.partitionBy("probe_id")
         .orderBy(F.asc("dist_sq"), F.asc("neighbor_id")))
    return (pr.join(pt, ["cx", "cy"])
            .where((F.col("probe_id") != F.col("neighbor_id"))
                   & (d2 <= radius * radius))
            .select("probe_id", "neighbor_id", d2.alias("dist_sq"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
