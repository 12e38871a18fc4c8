"""Deduplication operators (north-star M3): exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:
* Exact dedup is a hash-groupBy on a fingerprint — one shuffle whose
  payload is (hash, id), not document bodies.
* MinHash+LSH: signatures are computed map-side (built-in expressions
  only — no Python), candidate generation is an equi-join on band keys
  (shuffle on short band-hash strings), and the expensive exact-Jaccard
  verify runs only on candidates.  This is the textbook
  shingle→minhash→band→bucket-join pipeline; cost is O(docs) + O(pairs
  sharing a band), never O(docs²).
* SimHash: 32-bit signatures from per-token hashes; near-dup = small
  Hamming distance (bit_count(xor)).
* Cross-engine determinism: hashes are md5-derived (functions/hashing)
  so the DuckDB oracle reproduces signatures bit-for-bit.  The scale
  path swaps md5 for xxhash64 (functions.hashing.stable_hash64) behind
  ``fast=True`` — same pipeline shape, Spark-only hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from results_ingestor_spark.functions.hashing import md5_long, stable_hash64
from results_ingestor_spark.operators.text import shingles_expr

N_MINHASH = 16
N_BANDS = 4  # 4 bands x 4 rows: P(candidate) = 1-(1-j^4)^4


def minhash_signature(shingles_col: Column, fast: bool = False) -> list[Column]:
    """K minhash values: lexicographic min over md5('<i>|' || shingle).

    Hex-string min is an order-preserving stand-in for integer minhash
    (md5 is uniform), and is reproducible in any engine with md5().
    """
    # NB: the element lambdas must take exactly ONE argument — a second
    # parameter (even a defaulted one) makes F.transform pass the array
    # index into it, silently corrupting the seed.
    def _md5_fn(seed: int):
        prefix = f"{seed}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    def _xx_fn(seed: int):
        return lambda s: F.xxhash64(s, F.lit(seed))

    mk = _xx_fn if fast else _md5_fn
    return [F.array_min(F.transform(shingles_col, mk(i))).alias(f"mh{i}")
            for i in range(N_MINHASH)]


def band_keys(prefix: str = "mh") -> list[Column]:
    """LSH band keys: md5 over each band's concatenated minhashes."""
    keys = []
    rows = N_MINHASH // N_BANDS
    for b in range(N_BANDS):
        parts = [F.col(f"{prefix}{b * rows + r}") for r in range(rows)]
        keys.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    return keys


def with_minhash(df: DataFrame, text_col: str = "text", n: int = 3,
                 fast: bool = False) -> DataFrame:
    """doc frame → + shingles, mh0..15, band0..3 (all map-side)."""
    df = df.withColumn("__sh", shingles_expr(f"split({text_col}, ' ')", n))
    df = df.select("*", *minhash_signature(F.col("__sh"), fast=fast))
    return df.select("*", *band_keys())


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (a < b) pairs sharing at least one band — the bucket join.

    Explodes to (band_idx, key) and self-joins per band; the shuffle key
    is the band hash, so co-bucketed docs co-locate and nothing else
    does.  At scale, skewed buckets (giant near-dup clusters) are split
    by AQE skew-join handling.
    """
    bands = F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])
    keyed = (sig.select(F.col(id_col), F.posexplode(bands).alias("bidx", "bkey")))
    left = keyed.alias("l")
    right = keyed.alias("r")
    return (left.join(right,
                      (F.col("l.bidx") == F.col("r.bidx"))
                      & (F.col("l.bkey") == F.col("r.bkey"))
                      & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .distinct())


def jaccard(a: Column, b: Column) -> Column:
    """Set Jaccard over two pre-distinct arrays — |∩| and |∪| are exact
    ints, one double division (cross-engine identical)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter.cast("double") / union


def simhash32(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", fast: bool = False) -> DataFrame:
    """32-bit SimHash over distinct tokens: bit j of the signature is the
    sign of Σ_tokens (±1 by bit j of the token hash).  One explode + one
    hash-agg; the 32 per-bit sums fold map-side."""
    hash_fn = stable_hash64 if fast else md5_long
    tok = (df.select(id_col,
                     F.explode(F.array_distinct(F.split(F.col(text_col), " ")))
                     .alias("tok"))
           .withColumn("h", hash_fn(F.col("tok"))))
    sums = [
        F.sum(F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1))
        .alias(f"s{j}")
        for j in range(32)
    ]
    agg = tok.groupBy(id_col).agg(*sums)
    sig = None
    for j in range(32):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return agg.select(id_col, sig.cast("long").alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
