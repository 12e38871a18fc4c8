"""Text-analysis + multimodal plumbing tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from results_ingestor_spark.operators.multimodal import (
    decode_features, sample_frames, with_binary_payload)
from results_ingestor_spark.operators.text import (
    fingerprint_canonical, shingles_expr)
from results_ingestor_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def test_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], ["text"])
    out = [r["sh"] for r in
           df.select(shingles_expr("split(text, ' ')", 3).alias("sh")).collect()]
    assert out[0] == ["a b"]          # shorter than n → whole-doc shingle
    assert out[1] == ["a b c", "b c d"]


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("b a c",), ("c b a",), ("a x y",)], ["text"])
    fps = [r["fp"] for r in df.select(fingerprint_canonical().alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_binary_payload_roundtrip(spark, docs):
    row = (with_binary_payload(docs.limit(1))
           .select("text", "payload").collect()[0])
    assert bytes(row["payload"]) == row["text"].encode("utf-8")


def test_decode_features_matches_python(spark, docs):
    sample = docs.limit(20)
    feats = {r["doc_id"]: r for r in decode_features(sample).collect()}
    for r in sample.collect():
        f = feats[r["doc_id"]]
        raw = r["text"].encode("utf-8")
        assert f["n_bytes"] == len(raw)
        assert f["content_md5"] == hashlib.md5(raw).hexdigest()


def test_frame_sample_fanout(spark, docs):
    sample = docs.limit(20)
    frames = sample_frames(sample).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for r in sample.collect():
        n = len(r["text"].encode()) // 100
        got = by_doc.get(r["doc_id"], [])
        assert len(got) == n
        if got:
            idxs = sorted(f["frame_idx"] for f in got)
            assert idxs == list(range(n))


def test_frame_sample_is_distributed(spark, docs):
    # the mapInPandas stage must run partition-parallel, not collect-based
    df = sample_frames(docs.repartition(8))
    assert df.rdd.getNumPartitions() >= 8


def test_repetition_signals_edges(spark, tmp_path):
    """Gopher repetition signals on hand-computable docs, including the
    short-doc guards (1-token and 2-token docs have no bigrams/trigrams
    → fractions 0.0, not NULL or negative)."""
    import os
    from results_ingestor_spark.plans.text_q import quality_repetition_signals
    docs = spark.createDataFrame(
        [(1, "a a a a", "en", "s", 7),        # one token repeated 4x
         (2, "a b a b a b", "en", "s", 11),   # top bigram 'a b' x3 of 5
         (3, "x", "en", "s", 1),              # 1 token: no bigrams
         (4, "x y", "en", "s", 3)],           # 2 tokens: no trigrams
        "doc_id long, text string, lang string, source string, n_chars long")
    d = str(tmp_path / "sf_docs"); os.makedirs(d, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(d + "/documents.parquet")
    got = {r["doc_id"]: r for r in
           quality_repetition_signals(spark, d).collect()}
    r1 = got[1]
    assert (r1["top_token_frac"], r1["max_token_run"]) == (1.0, 4)
    assert r1["dup_trigram_frac"] == 0.5 and not r1["keep"]  # 'a a a' x2
    r2 = got[2]
    assert r2["top_bigram_frac"] == 0.6 and r2["max_token_run"] == 1
    r3 = got[3]
    assert (r3["top_bigram_frac"], r3["dup_trigram_frac"]) == (0.0, 0.0)
    assert got[4]["dup_trigram_frac"] == 0.0


def test_phash_banded_neardup_equals_brute_force(spark, sf_dir):
    """The 4x16-bit banded candidate join at Hamming<=3 is pigeonhole-
    complete: its result must EQUAL the all-pairs scan.  Also pins
    determinism (recompute → same hashes) and that exact payload dups
    land at hamming 0."""
    from pyspark.sql import functions as F

    from results_ingestor_spark.operators.multimodal import (
        perceptual_hashes, phash_near_dup_pairs)
    from results_ingestor_spark.sources.tables import load_tables
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    h = perceptual_hashes(docs)
    h2 = perceptual_hashes(docs)
    assert sorted(map(tuple, h.collect())) == sorted(map(tuple, h2.collect()))

    banded = {tuple(r[:3]) for r in phash_near_dup_pairs(h).collect()
              if r["is_near_dup"]}
    a = h.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("pa"))
    b = h.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("pb"))
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    brute = {tuple(r) for r in
             (a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
              .where(ham <= 3)
              .select("id_a", "id_b", ham.alias("hamming"))).collect()}
    assert banded == brute


def test_phash_recovers_planted_duplicates(spark):
    """Plant byte-identical and lightly-perturbed payload pairs among
    decoys: identical payloads MUST pair at hamming 0; the banded join
    at d<=3 must flag exactly the planted identical pairs and no decoy
    cross-pairs (decoy hashes are ~32 bits apart on average)."""
    from pyspark.sql import functions as F

    from results_ingestor_spark.operators.multimodal import (
        perceptual_hashes, phash_near_dup_pairs)
    rows = [(1, "the quick brown fox jumps over the lazy dog " * 30),
            (2, "the quick brown fox jumps over the lazy dog " * 30),
            (3, "completely different content about spark engines " * 25),
            (4, "yet another unrelated decoy document body text " * 28)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    h = perceptual_hashes(docs)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in phash_near_dup_pairs(h).collect() if r["is_near_dup"]}
    assert got == {(1, 2): 0}


def test_code_switching_planted_bilingual(spark):
    """A planted half-en/half-zh document is flagged mixed with the
    expected chunk-language split; a monolingual doc is not flagged
    (entropy 0, share 1.0)."""
    from pyspark.sql import functions as F
    from results_ingestor_spark.plans import QUERIES
    import results_ingestor_spark.plans.text_q as tq

    filler = "pad"
    en_chunk = " ".join((["the", "a", "table"] + [filler] * 29))   # 32 toks
    zh_chunk = " ".join((["join", "merge", "line"] + [filler] * 29))
    rows = [
        (1, "en", en_chunk + " " + en_chunk + " " + zh_chunk
              + " " + zh_chunk),                       # 2 en + 2 zh chunks
        (2, "en", en_chunk + " " + en_chunk),          # monolingual
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r["doc_id"]: r
               for r in QUERIES["text_code_switching"](spark, tmp).collect()}
    mixed, mono = out[1], out[2]
    assert mixed["n_chunks"] == 4 and mixed["n_langs"] == 2
    assert mixed["is_mixed"] is True
    assert mixed["dominant_share"] == 0.5
    assert mixed["entropy_bits"] == 1.0          # 2+2 split = exactly 1 bit
    assert mixed["dominant_lang"] == "en"        # tie -> lang ASC
    assert mono["n_langs"] == 1 and mono["is_mixed"] is False
    assert mono["dominant_share"] == 1.0 and mono["entropy_bits"] == 0.0
