"""Round-12: PQ family plan-build cost — codebooks as broadcast DATA
vs plan literals (the r11 k-means lesson applied to the registry's two
most expensive entries, ann_pq_adc_topk / ann_pq_adc_recall_check:
sf0.01 full-registry sweep measured build 13.5 s / 14.7 s).

Three A/Bs, same session, alternating:
  trainer : _lloyd_iterations literal codebooks vs broadcast-data
            codebooks + fused driver-side assembly (books asserted
            bit-identical first)
  encode  : pq_encode literal fold vs broadcast-data fold (rows equal)
  adc     : full pq_adc_topk literal vs data (rows equal)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from results_ingestor_spark.operators.quantization import (
    _codebook_lit, _dist2, _subspace_view, argmin_code_expr, pq_encode,
    pq_adc_topk, pq_train, subvector)
from results_ingestor_spark.sources.tables import (
    ensure_min_parallelism, load_tables)
from results_ingestor_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIM, M, K = 64, 16, 32  # the ann_pq_adc_* geometry


def books_df(spark, books):
    """The codebooks as ONE broadcastable row:
    __books array<array<struct<code:int,c:array<double>>>>."""
    data = [([[(i, list(c)) for i, c in enumerate(cb)] for cb in books],)]
    return spark.createDataFrame(
        data, "__books array<array<struct<code:int,c:array<double>>>>")


def train_data_path(spark, vectors, dim, m, k, n_iter):
    sub_dim = dim // m
    seeds = (vectors
             .select(F.col("vec_id").alias("vid"),
                     F.transform("embedding", lambda x: x.cast("double"))
                     .alias("v"))
             .orderBy(F.md5(F.col("vid").cast("string")), "vid")
             .limit(k).collect())
    books = [[list(r["v"])[j * sub_dim:(j + 1) * sub_dim] for r in seeds]
             for j in range(m)]
    sub = _subspace_view(vectors, m, sub_dim, "vec_id", "embedding").persist()
    try:
        for _ in range(n_iter):
            bdf = books_df(spark, books)
            cb = F.element_at(F.col("__books"), F.col("sub") + 1)
            code = argmin_code_expr(cb, F.col("sv"))["code"]
            rows = (sub.crossJoin(F.broadcast(bdf))
                    .select("sub", code.alias("cid"),
                            F.posexplode("sv").alias("pos", "x"))
                    .groupBy("sub", "cid", "pos")
                    .agg(F.avg("x").alias("mu"))
                    .collect())
            acc: dict[tuple[int, int], dict[int, float]] = {}
            for r in rows:
                acc.setdefault((r["sub"], r["cid"]), {})[r["pos"]] = r["mu"]
            books = [[
                [pm[p] for p in sorted(pm)]
                if (pm := acc.get((j, i))) is not None else books[j][i]
                for i in range(k)] for j in range(m)]
    finally:
        sub.unpersist()
    return books


def encode_data_path(spark, vectors, books):
    m, sub_dim = len(books), len(books[0][0])
    bdf = books_df(spark, books)
    src = vectors.crossJoin(F.broadcast(bdf))
    assigned = [argmin_code_expr(F.element_at(F.col("__books"), j + 1),
                                 subvector("embedding", j, sub_dim))
                for j in range(m)]
    codes = F.array(*[a["code"] for a in assigned])
    sqerr = sum((a["sqerr"] for a in assigned), F.lit(0.0))
    return src.select(F.col("vec_id"), codes.alias("codes"),
                      sqerr.alias("pq_sqerr"))


def main():
    spark = get_spark("probe_pq")
    t = load_tables(spark, SF, ("embeddings",))
    e = ensure_min_parallelism(t["embeddings"]).select("vec_id", "embedding")

    # equality gates
    b_lit = pq_train(e, dim=DIM, m=M, k=K, n_iter=1)
    b_dat = train_data_path(spark, e, DIM, M, K, 1)
    assert b_lit == b_dat, "data-path books differ"
    print("books identical", flush=True)
    enc_l = pq_encode(e, b_lit)
    enc_d = encode_data_path(spark, e, b_lit)
    d = enc_l.exceptAll(enc_d).count() + enc_d.exceptAll(enc_l).count()
    assert d == 0, f"encode rows differ: {d}"
    print("encode rows identical", flush=True)

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "train_lit": lambda: pq_train(e, dim=DIM, m=M, k=K, n_iter=1),
        "train_data": lambda: train_data_path(spark, e, DIM, M, K, 1),
        "encode_lit": lambda: run_noop(pq_encode(e, b_lit)),
        "encode_data": lambda: run_noop(encode_data_path(spark, e, b_lit)),
        "adc_full_lit": lambda: run_noop(
            pq_adc_topk(e, e.where(F.col("vec_id") < 5), b_lit, k=10)),
    }

    def run(fn):
        t0 = time.time()
        fn()
        return time.time() - t0

    for fn in variants.values():
        run(fn)
    samples = {n: [] for n in variants}
    for _ in range(3):
        for name, fn in variants.items():
            samples[name].append(run(fn))
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={[round(x, 3) for x in s]}")


if __name__ == "__main__":
    main()
