"""Grid-blocked spatial join vs brute force on random integer points."""

from __future__ import annotations

import itertools
import random

import pytest

from results_ingestor_spark.operators.spatial import (
    knn_within,
    radius_pairs,
    synth_points,
)

RADIUS = 40


@pytest.fixture(scope="module")
def pts(spark):
    rng = random.Random(7)
    rows = [(i, rng.randrange(1000), rng.randrange(1000))
            for i in range(400)]
    return rows, spark.createDataFrame(rows, "point_id long, x long, y long")


def _brute_pairs(rows, r):
    out = set()
    for (a, ax, ay), (b, bx, by) in itertools.combinations(rows, 2):
        d2 = (ax - bx) ** 2 + (ay - by) ** 2
        if d2 <= r * r:
            out.add((min(a, b), max(a, b), d2))
    return out


def test_radius_pairs_exact(pts):
    rows, df = pts
    got = {(r["a"], r["b"], r["dist_sq"])
           for r in radius_pairs(df, RADIUS).collect()}
    want = _brute_pairs(rows, RADIUS)
    assert got == want and len(want) > 50  # non-trivial fixture


def test_knn_matches_brute_force(pts):
    rows, df = pts
    probes = df.where("point_id % 20 = 0")
    got = {}
    for r in knn_within(df, probes, RADIUS, 3).collect():
        got.setdefault(r["probe_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dist_sq"]))
    coords = {i: (x, y) for i, x, y in rows}
    for pid, (px, py) in coords.items():
        if pid % 20 != 0:
            continue
        cand = sorted(
            ((px - x) ** 2 + (py - y) ** 2, nid)
            for nid, (x, y) in coords.items() if nid != pid)
        want = [(i + 1, nid, d2) for i, (d2, nid) in enumerate(cand)
                if d2 <= RADIUS * RADIUS][:3]
        assert sorted(got.get(pid, [])) == want, pid


def test_synth_points_scatter(spark):
    """md5 scatter must not collapse onto a lattice: a healthy fraction
    of 1000 points lands within radius 100 of another point."""
    ids = spark.range(1000).selectExpr("id AS point_id")
    n = radius_pairs(synth_points(ids), 100).count()
    assert 5 <= n <= 200  # E[pairs] ≈ n²·π·r²/(2·A) ≈ 16
