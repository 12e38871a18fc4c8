"""Product quantization (PQ) — the vector-compression layer an ANN
index at 100 TB sits on (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011).

Split each d-dim vector into ``m`` subvectors; per subspace, learn a
``k``-centroid codebook with L2 Lloyd's k-means; encode every subvector
as its nearest-centroid index.  Storage drops from ``4·d`` bytes
(float32) to ``m`` bytes per vector (k ≤ 256), and asymmetric distance
computation scans codes instead of floats.

Scale shape: all ``m`` subspace k-means run JOINTLY — each Lloyd
iteration is ONE job over the (vid, subspace, subvector) exploded view
(one scan of the corpus, assignment as a literal-codebook fold, update
as a (subspace, cluster, position) hash-agg whose full output is
m·k·(d/m) doubles).  Driver traffic per iteration is those few KB of
centroids; encoding is a single narrow map stage with the codebooks as
plan literals — no join, no shuffle of vectors, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def subvector(vec_col: str, j: int, sub_dim: int) -> F.Column:
    """1-based slice of subspace ``j`` (0-indexed) as array<double>."""
    return F.transform(
        F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim),
        lambda x: x.cast("double"))


def _codebook_lit(codebook: list[list[float]]) -> F.Column:
    return F.array(*[
        F.named_struct(F.lit("code"), F.lit(i),
                       F.lit("c"), F.array(*[F.lit(float(x)) for x in c]))
        for i, c in enumerate(codebook)])


def argmin_code_expr(codebook, sub_col: F.Column) -> F.Column:
    """struct(code, sqerr): index of the L2-nearest codebook centroid
    and the squared distance to it — one fold over the codebook (a
    python list of centroids, or an already-literal array<struct>
    Column), strict ``<`` keeps the lowest code on ties
    (deterministic).  named_struct throughout: .alias() on struct
    fields is dropped inside higher-order-function lambdas, which
    would type-mismatch the CASE branches."""
    cb = codebook if isinstance(codebook, F.Column) \
        else _codebook_lit(codebook)

    def merge(acc, entry):
        d2 = F.aggregate(
            F.zip_with(sub_col, entry["c"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda s, x: s + x)
        return (F.when(d2 < acc["sqerr"],
                       F.named_struct(F.lit("code"), entry["code"],
                                      F.lit("sqerr"), d2))
                .otherwise(acc))

    init = F.named_struct(F.lit("code"), F.lit(-1),
                          F.lit("sqerr"), F.lit(float("inf")))
    return F.aggregate(cb, init, merge)


def _subspace_view(vectors: DataFrame, m: int, sub_dim: int,
                   id_col: str, vec_col: str) -> DataFrame:
    """(vid, sub, sv): every vector exploded into its m subvectors —
    one scan produces all subspaces' training rows."""
    arr = F.array(*[
        F.named_struct(F.lit("sub"), F.lit(j),
                       F.lit("sv"), subvector(vec_col, j, sub_dim))
        for j in range(m)])
    return (vectors.select(F.col(id_col).alias("vid"),
                           F.explode(arr).alias("e"))
            .select("vid", F.col("e.sub").alias("sub"),
                    F.col("e.sv").alias("sv")))


def pq_train(vectors: DataFrame, dim: int, m: int = 8, k: int = 16,
             n_iter: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding") -> list[list[list[float]]]:
    """Joint per-subspace codebooks: ``m`` L2 k-means runs fused into
    one job per Lloyd iteration.  Deterministic: seeds are the ``k``
    vectors with smallest md5(id) (their m slices seed all m
    subspaces), assignment ties break on the lowest code, update is
    exact groupBy-avg; an empty cluster keeps its centroid.  Returns
    ``m`` codebooks of ``k`` centroids."""
    assert dim % m == 0, "dim must divide into m equal subspaces"
    sub_dim = dim // m
    seeds = (vectors
             .select(F.col(id_col).alias("vid"),
                     F.transform(vec_col, lambda x: x.cast("double"))
                     .alias("v"))
             .orderBy(F.md5(F.col("vid").cast("string")), "vid")
             .limit(k).collect())
    books = [[list(r["v"])[j * sub_dim:(j + 1) * sub_dim] for r in seeds]
             for j in range(m)]
    # Persist the exploded view: every Lloyd iteration re-reads it, and
    # recomputing means re-scanning + re-exploding the corpus per
    # iteration.  (At 100 TB persist to MEMORY_AND_DISK on executors —
    # still one corpus scan total instead of n_iter scans.)
    sub = _subspace_view(vectors, m, sub_dim, id_col, vec_col).persist()
    try:
        return _lloyd_iterations(sub, books, m, k, n_iter)
    finally:
        sub.unpersist()


def _lloyd_iterations(sub: DataFrame, books: list[list[list[float]]],
                      m: int, k: int, n_iter: int) -> list[list[list[float]]]:
    for _ in range(n_iter):
        books_lit = F.array(*[_codebook_lit(b) for b in books])
        cb = F.element_at(books_lit, F.col("sub") + 1)
        code = argmin_code_expr(cb, F.col("sv"))["code"]
        rows = (sub.select("sub", code.alias("cid"),
                           F.posexplode("sv").alias("pos", "x"))
                .groupBy("sub", "cid", "pos").agg(F.avg("x").alias("mu"))
                .groupBy("sub", "cid")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "mu")))
                     .alias("pm"))
                .select("sub", "cid",
                        F.transform("pm", lambda s: s["mu"]).alias("c"))
                .collect())
        upd = {(r["sub"], r["cid"]): list(r["c"]) for r in rows}
        books = [[upd.get((j, i), books[j][i]) for i in range(k)]
                 for j in range(m)]
    return books


def pq_encode(vectors: DataFrame, codebooks: list[list[list[float]]],
              id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> DataFrame:
    """Encode: per vector, ``codes`` (array<int>, one per subspace) and
    ``pq_sqerr`` (total squared reconstruction error = Σ_j min-dist²).
    Pure literal-fold expressions — no join, no shuffle."""
    sub_dim = len(codebooks[0][0])
    assigned = [argmin_code_expr(cb, subvector(vec_col, j, sub_dim))
                for j, cb in enumerate(codebooks)]
    codes = F.array(*[a["code"] for a in assigned])
    sqerr = sum((a["sqerr"] for a in assigned), F.lit(0.0))
    return vectors.select(F.col(id_col), codes.alias("codes"),
                          sqerr.alias("pq_sqerr"))
