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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from results_ingestor_spark.operators.spatial import (
    knn_within,
    radius_pairs,
    synth_points,
)
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
_KNN_RADIUS = 200


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
probes AS (SELECT * FROM p WHERE point_id % 100 = 0),
cand AS (
  SELECT pr.point_id AS probe_id, pt.point_id AS neighbor_id,
         (pr.x - pt.x) * (pr.x - pt.x)
         + (pr.y - pt.y) * (pr.y - pt.y) AS dist_sq
  FROM probes pr JOIN p pt
    ON pt.x BETWEEN pr.x - {_KNN_RADIUS} AND pr.x + {_KNN_RADIUS}
   AND pt.y BETWEEN pr.y - {_KNN_RADIUS} AND pr.y + {_KNN_RADIUS}
   AND pr.point_id <> pt.point_id
  WHERE (pr.x - pt.x) * (pr.x - pt.x) + (pr.y - pt.y) * (pr.y - pt.y)
        <= {_KNN_RADIUS * _KNN_RADIUS})
SELECT probe_id, neighbor_id, dist_sq, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY dist_sq, neighbor_id) AS rank
  FROM cand)
WHERE rank <= 3""")
def spatial_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-NN within radius {200} for every 100th point: grid candidate
    generation then per-probe top-k (row_number over (d², id) — fully
    deterministic).  Probes replicate into neighbor cells, points stay
    home, so the candidate join is a hash join whose fan-out is local
    density × 9 cells, never |probes|×|points|."""
    pts = _points(spark, sf_dir)
    probes = pts.where(F.col("point_id") % 100 == 0)
    return knn_within(pts, probes, _KNN_RADIUS, 3)
