"""Quality-classifier training invariants (operators/classifier.py).

The cross-engine trajectory equality lives in the oracle gate
(quality_classifier_train); these pin the learning behavior itself.
"""

import pytest

from results_ingestor_spark.operators.classifier import (
    QUALITY_GATE_CHARS, score_quality, train_quality_classifier)
from results_ingestor_spark.sources.tables import load_tables


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ("documents",))["documents"]


def test_loss_decreases(docs):
    hist = train_quality_classifier(docs, iterations=8)
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0]          # learned something
    assert losses[0] == pytest.approx(0.6931471805599453, rel=1e-6)  # ln 2 at w=0


def test_scores_beat_majority_baseline(docs, spark):
    from pyspark.sql import functions as F
    hist = train_quality_classifier(docs, iterations=8)
    scored = score_quality(docs, hist[-1]["weights"])
    labels = docs.select(
        "doc_id", (F.length("text") >= QUALITY_GATE_CHARS).alias("y"))
    agg = (scored.join(labels, "doc_id")
           .agg(F.avg((F.col("keep") == F.col("y")).cast("double"))
                 .alias("acc"),
                F.avg(F.col("y").cast("double")).alias("base"))
           .first())
    majority = max(agg["base"], 1 - agg["base"])
    assert agg["acc"] >= majority - 1e-9


def test_weights_rounded_and_reproducible(docs):
    h1 = train_quality_classifier(docs, iterations=3)
    h2 = train_quality_classifier(docs, iterations=3)
    assert h1[-1]["weights"] == h2[-1]["weights"]  # bit-identical trajectory
    assert all(round(w, 9) == w for w in h1[-1]["weights"])
