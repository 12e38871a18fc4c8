"""Round-12 (VERDICT r11 item 6): dedup_semantic_clusters build-cost
split + the one remaining fusion candidate.

Phase split: count job / persist+seed job / per-iteration mean job /
final assignment checkpoint.  Fusion candidate measured: collect the
(cid, pos, m) rows straight from the FIRST aggregation and assemble
centroid arrays in the driver, dropping the second per-iteration
groupBy(cid) (collect_list + array_sort + transform) — same values by
construction (the avg rows are identical; only the array assembly
moves from executors to the driver over ~k*dim rows).
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from results_ingestor_spark.operators.similarity import assign_centroids
from results_ingestor_spark.sources.tables import (
    ensure_min_parallelism, load_tables)
from results_ingestor_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def train(spark, fused: bool, n_iter: int = 2):
    t = load_tables(spark, SF, ("embeddings",))
    e = ensure_min_parallelism(t["embeddings"]).select("vec_id", "embedding")
    ts = {}
    t0 = time.time()
    n = t["embeddings"].count()
    ts["count"] = time.time() - t0
    k = max(2, math.isqrt(n))
    e = e.coalesce(max(8, n // 250))
    v = e.select(F.col("vec_id").alias("vid"),
                 F.col("embedding").cast("array<double>").alias("v")
                 ).persist()
    t0 = time.time()
    seeds = (v.orderBy(F.md5(F.col("vid").cast("string")), "vid")
             .limit(k).collect())
    ts["seed"] = time.time() - t0
    cents = [list(r["v"]) for r in seeds]
    ts["iters"] = []
    for _ in range(n_iter):
        t0 = time.time()
        assigned = assign_centroids(v.select("v"), cents, "v", "cid",
                                    threshold=0)
        base = (assigned.select("cid", F.posexplode("v").alias("pos", "x"))
                .groupBy("cid", "pos").agg(F.avg("x").alias("m")))
        if fused:
            rows = base.collect()
            by_cid: dict[int, dict[int, float]] = {}
            for r in rows:
                by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
            new = {c: [pm[p] for p in sorted(pm)] for c, pm in by_cid.items()}
        else:
            rows = (base.groupBy("cid")
                    .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                         .alias("pm"))
                    .select("cid",
                            F.transform("pm", lambda s: s["m"]).alias("c"))
                    .collect())
            new = {r["cid"]: list(r["c"]) for r in rows}
        cents = [new.get(i, cents[i]) for i in range(k)]
        ts["iters"].append(time.time() - t0)
    v.unpersist()
    return cents, ts


def main():
    spark = get_spark("probe_lloyd")
    # equality first
    c_a, _ = train(spark, fused=False)
    c_b, _ = train(spark, fused=True)
    assert c_a == c_b, "fused centroids differ"
    print("centroids identical", flush=True)

    samples = {"lazy2agg": [], "fused": []}
    splits = {}
    for _ in range(3):
        for name, fused in (("lazy2agg", False), ("fused", True)):
            t0 = time.time()
            _, ts = train(spark, fused)
            samples[name].append(time.time() - t0)
            splits[name] = ts
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={[round(x, 3) for x in s]} "
              f"last_split={ {k: (round(v, 3) if isinstance(v, float) else [round(x, 3) for x in v]) for k, v in splits[name].items()} }")


if __name__ == "__main__":
    main()
