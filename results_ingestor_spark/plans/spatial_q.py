"""Spatial query entries: grid-blocked radius join and kNN.

Points are synthesized deterministically from event ids (md5-derived
scatter onto a 10000² integer grid) so both engines derive
bit-identical coordinates and every distance predicate is exact
bigint arithmetic — no float boundary rows.

The oracle deliberately uses a DIFFERENT join strategy than the
Spark plan: DuckDB evaluates the radius predicate as a range join
(IEJoin) over `x BETWEEN ax±r`, while Spark runs the grid-blocked
3×3-neighborhood equi-join from operators/spatial.py.  Matching
results from two independent algorithms is a stronger check than
mirroring the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from results_ingestor_spark.operators.spatial import (
    knn_within,
    radius_pairs,
    synth_points,
)
from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables

_PTS = """
  SELECT event_id AS point_id,
         ('0x' || substr(md5('x' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 10000 AS x,
         ('0x' || substr(md5('y' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
           % 10000 AS y
  FROM events"""

_RADIUS = 25
# Adaptive-kNN radius target: expected candidates per probe =
# n * pi * r^2 / (10000^2 grid area) ~ 20  =>  r = sqrt(6.4e8 / n).
_KNN_TARGET_AREA = 640_000_000.0


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return synth_points(ev.select(F.col("event_id").alias("point_id")))


@query("spatial_radius_pairs", oracle=f"""
WITH p AS ({_PTS})
SELECT a.point_id AS a, b.point_id AS b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
FROM p a JOIN p b
  ON b.x BETWEEN a.x - {_RADIUS} AND a.x + {_RADIUS}
 AND b.y BETWEEN a.y - {_RADIUS} AND a.y + {_RADIUS}
 AND a.point_id < b.point_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_RADIUS * _RADIUS}""")
def spatial_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance join: all point pairs within radius {25}.  Spark runs
    the grid-blocked equi-join (cell side = radius, 3×3 replication,
    exact integer d² residual) — the plan that stays a hash join at
    100 TB; the oracle cross-checks with DuckDB's interval IEJoin."""
    return radius_pairs(_points(spark, sf_dir), _RADIUS)


@query("spatial_knn", oracle=f"""
WITH p AS ({_PTS}),
rad AS (SELECT GREATEST(8, CAST(ceil(sqrt({_KNN_TARGET_AREA} / count(*)))
                           AS BIGINT)) AS r FROM p),
probes AS (SELECT * FROM p WHERE point_id % 100 = 0),
cand AS (
  SELECT pr.point_id AS probe_id, pt.point_id AS neighbor_id,
         (pr.x - pt.x) * (pr.x - pt.x)
         + (pr.y - pt.y) * (pr.y - pt.y) AS dist_sq
  FROM probes pr CROSS JOIN rad JOIN p pt
    ON pt.x BETWEEN pr.x - rad.r AND pr.x + rad.r
   AND pt.y BETWEEN pr.y - rad.r AND pr.y + rad.r
   AND pr.point_id <> pt.point_id
  WHERE (pr.x - pt.x) * (pr.x - pt.x) + (pr.y - pt.y) * (pr.y - pt.y)
        <= rad.r * rad.r)
SELECT probe_id, neighbor_id, dist_sq, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY dist_sq, neighbor_id) AS rank
  FROM cand)
WHERE rank <= 3""")
def spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-NN for every 100th point within a DENSITY-ADAPTIVE radius:
    r = max(8, ceil(sqrt(target_area / n))) sizes the expected candidate
    count per probe at ~20 REGARDLESS of corpus density (round 5: the
    previous fixed radius 200 admitted ~10x the candidates at 10x the
    points — the same quadratic-drift class as the semantic-dedup k,
    measured 6.3x time at 10x data).  At n=100k points r=80 exactly.
    Both engines derive r from the identical double expression
    ceil(sqrt(6.4e8 / n)) — one driver count here, a scalar subquery in
    the oracle — so the radius can never disagree.  Grid candidate
    generation (cell side = r, probes replicate into 9 cells, points
    stay home) then per-probe top-k (row_number over (d2, id) — fully
    deterministic); fan-out is local density x 9 cells, never
    |probes|x|points|."""
    import math
    pts = _points(spark, sf_dir)
    n = pts.count()
    r = max(8, math.ceil(math.sqrt(_KNN_TARGET_AREA / n)))
    probes = pts.where(F.col("point_id") % 100 == 0)
    return knn_within(pts, probes, r, 3)


_GF_N = 10      # number of geofence rectangles
_GF_SIDE = 2000  # rectangle side
_GF_CELL = 2000  # blocking-grid cell size

_GF_REGIONS = f"""
  SELECT r AS region_id,
    ('0x' || substr(md5('rx' || CAST(r AS VARCHAR)), 1, 15))::BIGINT
      % {10000 - _GF_SIDE} AS rx,
    ('0x' || substr(md5('ry' || CAST(r AS VARCHAR)), 1, 15))::BIGINT
      % {10000 - _GF_SIDE} AS ry
  FROM (SELECT unnest(range(0, {_GF_N})) AS r)"""


@query("spatial_geofence_assign", oracle=f"""
WITH p AS ({_PTS}),
regions AS ({_GF_REGIONS}),
rcells AS (
  SELECT region_id, rx, ry, cx, cy
  FROM regions,
  LATERAL (SELECT unnest(range(rx // {_GF_CELL},
                               (rx + {_GF_SIDE} - 1) // {_GF_CELL} + 1))
             AS cx),
  LATERAL (SELECT unnest(range(ry // {_GF_CELL},
                               (ry + {_GF_SIDE} - 1) // {_GF_CELL} + 1))
             AS cy)),
hits AS (
  SELECT region_id, CAST(COUNT(*) AS BIGINT) AS n_points
  FROM p JOIN rcells
    ON p.x // {_GF_CELL} = rcells.cx AND p.y // {_GF_CELL} = rcells.cy
   AND p.x >= rx AND p.x < rx + {_GF_SIDE}
   AND p.y >= ry AND p.y < ry + {_GF_SIDE}
  GROUP BY region_id)
SELECT region_id, CAST(rx AS BIGINT) AS rx, CAST(ry AS BIGINT) AS ry,
  coalesce(n_points, 0) AS n_points
FROM regions LEFT JOIN hits USING (region_id)""")
def spatial_geofence_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence assignment — count points inside each of 10 md5-derived
    rectangles — via the scale-safe CELL-BLOCKED containment join: each
    region explodes into the grid cells it overlaps (≤4 here), points
    key to their cell, and the join is an EQUI-join on (cx, cy) with an
    exact integer containment residual.  This is how a geofence join
    stays a hash join at any scale; the naive form (broadcast rectangle
    theta-join) degrades to a nested loop whose cost is points×regions.
    Regions with zero points still report (left join from the region
    table) — absence is signal in a geofence dashboard.

    Scale: the region-cell table is tiny and broadcast; points shuffle
    NOWHERE (cell key is computed map-side, the join is broadcast), and
    the count agg is region-domain."""
    from results_ingestor_spark.functions.hashing import md5_long
    pts = _points(spark, sf_dir)
    r = spark.range(_GF_N).select(
        F.col("id").cast("long").alias("region_id"),
        (md5_long(F.concat(F.lit("rx"), F.col("id").cast("string")))
         % (10000 - _GF_SIDE)).alias("rx"),
        (md5_long(F.concat(F.lit("ry"), F.col("id").cast("string")))
         % (10000 - _GF_SIDE)).alias("ry"))
    rcells = (r.select(
        "region_id", "rx", "ry",
        F.explode(F.sequence(
            F.expr(f"rx div {_GF_CELL}"),
            F.expr(f"(rx + {_GF_SIDE} - 1) div {_GF_CELL}"))).alias("cx"))
        .select("region_id", "rx", "ry", "cx",
                F.explode(F.sequence(
                    F.expr(f"ry div {_GF_CELL}"),
                    F.expr(f"(ry + {_GF_SIDE} - 1) div {_GF_CELL}")))
                .alias("cy")))
    pc = pts.select("point_id", "x", "y",
                    F.expr(f"x div {_GF_CELL}").alias("cx"),
                    F.expr(f"y div {_GF_CELL}").alias("cy"))
    hits = (pc.join(F.broadcast(rcells), ["cx", "cy"])
            .where((F.col("x") >= F.col("rx"))
                   & (F.col("x") < F.col("rx") + _GF_SIDE)
                   & (F.col("y") >= F.col("ry"))
                   & (F.col("y") < F.col("ry") + _GF_SIDE))
            .groupBy("region_id").agg(F.count("*").alias("n_points")))
    return (r.join(hits, "region_id", "left")
            .select("region_id", "rx", "ry",
                    F.coalesce("n_points", F.lit(0)).alias("n_points")))


@query("spatial_grid_density_hotspots", oracle=f"""
WITH p AS ({_PTS}),
cell AS (
  SELECT x // 100 AS cx, y // 100 AS cy,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY 1, 2),
smear AS (
  SELECT cell.cx + dx.d AS cx, cell.cy + dy.d AS cy, cell.n
  FROM cell
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dx
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS d) dy
  WHERE cell.cx + dx.d BETWEEN 0 AND 99
    AND cell.cy + dy.d BETWEEN 0 AND 99),
sm AS (
  SELECT cx, cy, CAST(SUM(n) AS BIGINT) AS smoothed
  FROM smear GROUP BY cx, cy)
SELECT sm.cx, sm.cy, COALESCE(cell.n, 0) AS n_points, sm.smoothed
FROM sm LEFT JOIN cell ON sm.cx = cell.cx AND sm.cy = cell.cy
ORDER BY smoothed DESC, sm.cx, sm.cy LIMIT 20""")
def spatial_grid_density_hotspots(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Grid-density hotspot detection (kernel-density-lite): bucket the
    synthetic point cloud into 100x100 cells, then smooth each cell
    with its 3x3 neighborhood sum — the box-kernel convolution that
    turns raw per-cell counts into a hotspot surface robust to cell
    boundaries.  The smear is map-side (each cell emits <= 9 offset
    copies of its COUNT, never its points), so the convolution costs
    9 x |cells|, independent of point count.  Top-20 by (smoothed,
    cx, cy) — unique ordering, exact integers throughout.

    Scale: two hash aggregates, both bounded by the grid (10^4 cells),
    after a map-only cell assignment of the points — the shuffles
    carry cell counts, not points, at any corpus size."""
    pts = _points(spark, sf_dir)
    cell = (pts.select(F.expr("x DIV 100").alias("cx"),
                       F.expr("y DIV 100").alias("cy"))
            .groupBy("cx", "cy").agg(F.count("*").alias("n")))
    offs = F.sequence(F.lit(-1), F.lit(1))
    smear = (cell.select("cx", "cy", "n",
                         F.explode(offs).alias("dx"))
             .select("cx", "cy", "n", "dx", F.explode(offs).alias("dy"))
             .select((F.col("cx") + F.col("dx")).alias("tx"),
                     (F.col("cy") + F.col("dy")).alias("ty"), "n")
             .where(F.col("tx").between(0, 99)
                    & F.col("ty").between(0, 99)))
    sm = (smear.groupBy(F.col("tx").alias("scx"), F.col("ty").alias("scy"))
          .agg(F.sum("n").cast("long").alias("smoothed")))
    return (sm.join(cell, (sm.scx == cell.cx) & (sm.scy == cell.cy),
                    "left")
            .select(F.col("scx").alias("cx"), F.col("scy").alias("cy"),
                    F.coalesce("n", F.lit(0)).cast("long")
                    .alias("n_points"), "smoothed")
            .orderBy(F.desc("smoothed"), "cx", "cy").limit(20))


@query("spatial_haversine_nearest", oracle=f"""
WITH p AS ({_PTS}),
geo AS (
  SELECT point_id,
    x * 120.0 / 10000.0 - 60.0 AS lat,
    y * 360.0 / 10000.0 - 180.0 AS lon,
    CAST(x * 120 // 10000 AS BIGINT) AS clat,
    CAST(y * 360 // 10000 AS BIGINT) AS clon
  FROM p),
probes AS (SELECT * FROM geo WHERE point_id % 997 = 0),
cand AS (
  SELECT pr.point_id AS probe_id, g.point_id AS cand_id,
    CAST(floor((2.0 * 6371.0088 * asin(sqrt( pow(sin(radians(g.lat - pr.lat) / 2.0), 2.0) + cos(radians(pr.lat)) * cos(radians(g.lat)) * pow(sin(radians(g.lon - pr.lon) / 2.0), 2.0)))) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS dist_km
  FROM probes pr
  JOIN geo g ON g.clat BETWEEN pr.clat - 1 AND pr.clat + 1
            AND g.clon BETWEEN pr.clon - 1 AND pr.clon + 1
            AND g.point_id <> pr.point_id)
SELECT probe_id, cand_id, dist_km FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY dist_km, cand_id) AS rn
  FROM cand) WHERE rn = 1 ORDER BY probe_id""")
def spatial_haversine_nearest(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Great-circle nearest neighbor: points scatter onto real
    (lat, lon) ranges, probes (point_id % 997) find their closest
    neighbor WITHIN the 3x3 one-degree cell block by haversine
    distance (R = 6371.0088 km) — the blocked geo-kNN that stays an
    equi-join at planetary scale (candidates come from 9 cells, never
    the globe; same contract as spatial_knn's radius).  Distances
    round to 6 dp BEFORE ranking with a cand_id tie-break, so libm
    trig ulps cannot reorder the pick.

    Scale: cell assignment is map-only; the candidate join is
    cell-keyed; per-probe ranking is k-bounded.  At real scale the
    degree cells become a geohash prefix — identical plan shape."""
    pts = _points(spark, sf_dir)
    geo = pts.select(
        "point_id",
        (F.col("x") * 120.0 / 10000.0 - 60.0).alias("lat"),
        (F.col("y") * 360.0 / 10000.0 - 180.0).alias("lon"),
        F.expr("(x * 120) DIV 10000").alias("clat"),
        F.expr("(y * 360) DIV 10000").alias("clon"))
    probes = (geo.where(F.col("point_id") % 997 == 0)
              .select(F.col("point_id").alias("probe_id"),
                      F.col("lat").alias("plat"),
                      F.col("lon").alias("plon"),
                      F.col("clat").alias("pclat"),
                      F.col("clon").alias("pclon")))
    cells = probes.select(
        "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dlat"))
    cells = cells.select(
        "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dlon"))
    cells = cells.select(
        "probe_id", "plat", "plon",
        (F.col("pclat") + F.col("dlat")).alias("clat"),
        (F.col("pclon") + F.col("dlon")).alias("clon"))
    hav = (2.0 * 6371.0088 * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(F.col("lat") - F.col("plat")) / 2.0), 2.0)
        + F.cos(F.radians("plat")) * F.cos(F.radians("lat"))
        * F.pow(F.sin(F.radians(F.col("lon") - F.col("plon")) / 2.0),
                2.0))))
    cand = (F.broadcast(cells).join(geo, ["clat", "clon"])
            .where(F.col("point_id") != F.col("probe_id"))
            .select("probe_id", F.col("point_id").alias("cand_id"),
                    exact.snap_double_col(hav, 6).alias("dist_km")))
    w = Window.partitionBy("probe_id").orderBy("dist_km", "cand_id")
    return (cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("probe_id", "cand_id", "dist_km")
            .orderBy("probe_id"))


_DB_EPS = 250   # DBSCAN radius
_DB_MINPTS = 5  # neighborhood size INCLUDING the point itself


@query("spatial_dbscan_roles", oracle=f"""
WITH p AS ({_PTS}),
pairs AS (
  SELECT a.point_id AS a, b.point_id AS b
  FROM p a JOIN p b
    ON b.x BETWEEN a.x - {_DB_EPS} AND a.x + {_DB_EPS}
   AND b.y BETWEEN a.y - {_DB_EPS} AND a.y + {_DB_EPS}
   AND a.point_id < b.point_id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
        <= {_DB_EPS * _DB_EPS}),
sym AS (SELECT a AS u, b AS v FROM pairs
        UNION ALL SELECT b AS u, a AS v FROM pairs),
ncnt AS (
  SELECT p.point_id, coalesce(s.c, 0) + 1 AS nsize
  FROM p LEFT JOIN (SELECT u, CAST(COUNT(*) AS BIGINT) AS c
                    FROM sym GROUP BY u) s
    ON s.u = p.point_id),
core AS (SELECT point_id FROM ncnt WHERE nsize >= {_DB_MINPTS}),
border AS (
  SELECT DISTINCT sym.u AS point_id
  FROM sym JOIN core ON core.point_id = sym.v
  WHERE sym.u NOT IN (SELECT point_id FROM core)),
roles AS (
  SELECT n.point_id, n.nsize,
    CASE WHEN c.point_id IS NOT NULL THEN 'core'
         WHEN b.point_id IS NOT NULL THEN 'border'
         ELSE 'noise' END AS role
  FROM ncnt n
  LEFT JOIN core c ON c.point_id = n.point_id
  LEFT JOIN border b ON b.point_id = n.point_id)
SELECT role, CAST(COUNT(*) AS BIGINT) AS n_points,
  CAST(MAX(nsize) AS BIGINT) AS max_neighborhood,
  CAST(floor((CAST(SUM(nsize) AS DOUBLE) / COUNT(*)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS avg_neighborhood
FROM roles GROUP BY role ORDER BY role""")
def spatial_dbscan_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN point-role census (eps = 250, minPts = 5): core points
    (≥ minPts points in their eps-neighborhood, self included), border
    points (non-core within eps of a core), noise — the
    density-clustering classification step, run entirely through the
    grid-blocked radius join (no n² anywhere).  Cluster EXTRACTION is
    connected components over core-core edges — the machinery
    `dedup_clusters` already demonstrates — so this entry reports the
    converged, iteration-free half of DBSCAN exactly.

    Scale: one grid-blocked pair join (cell side = eps, 3×3
    replication, integer d² residual), one node-keyed count, two
    semi-join classifications.  The oracle cross-checks with DuckDB's
    interval IEJoin — a genuinely different algorithm."""
    p = _points(spark, sf_dir)
    pairs = radius_pairs(p, _DB_EPS).select("a", "b")
    sym = (pairs.union(pairs.select(F.col("b").alias("a"),
                                    F.col("a").alias("b")))
           .select(F.col("a").alias("u"), F.col("b").alias("v")))
    cnt = sym.groupBy("u").agg(F.count("*").cast("long").alias("c"))
    ncnt = (p.select("point_id")
            .join(cnt, p.point_id == cnt.u, "left")
            .select("point_id",
                    (F.coalesce("c", F.lit(0)) + 1).alias("nsize")))
    core = ncnt.where(F.col("nsize") >= _DB_MINPTS).select("point_id")
    border = (sym.join(core.withColumnRenamed("point_id", "v"), "v")
              .select(F.col("u").alias("point_id")).distinct()
              .join(core, "point_id", "left_anti"))
    roles = (ncnt
             .join(core.withColumn("is_core", F.lit(1)), "point_id", "left")
             .join(border.withColumn("is_border", F.lit(1)),
                   "point_id", "left")
             .select("nsize",
                     F.when(F.col("is_core") == 1, "core")
                     .when(F.col("is_border") == 1, "border")
                     .otherwise("noise").alias("role")))
    return (roles.groupBy("role")
            .agg(F.count("*").cast("long").alias("n_points"),
                 F.max("nsize").cast("long").alias("max_neighborhood"),
                 exact.snap_double_col(F.sum("nsize").cast("double") / F.count("*"), 9)
                 .alias("avg_neighborhood"))
            .orderBy("role"))
