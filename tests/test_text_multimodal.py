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
