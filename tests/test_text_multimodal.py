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
