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


def test_auc_matches_numpy_midrank_golden(spark, sf_dir):
    """The distributed Mann-Whitney AUC equals an independent numpy
    midrank computation over the same collected scores."""
    import numpy as np
    from results_ingestor_spark.plans import QUERIES

    row = QUERIES["quality_classifier_auc"](spark, sf_dir).first()
    # independent recomputation: collect (zs, yi) via the same scoring
    from pyspark.sql import functions as F
    from results_ingestor_spark.operators.classifier import (
        feature_columns)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    hist = train_quality_classifier(docs, iterations=8)
    wts = hist[-1]["weights"]
    feats = feature_columns()
    z = sum(feats[j] * float(wts[j]) for j in range(len(wts)))
    pdf = docs.select(
        F.round(z, 9).alias("zs"),
        (F.length("text") >= QUALITY_GATE_CHARS).cast("long").alias("yi")
    ).toPandas()
    zs, yi = pdf["zs"].to_numpy(), pdf["yi"].to_numpy()
    order = np.argsort(zs, kind="mergesort")
    ranks = np.empty(len(zs))
    sorted_z = zs[order]
    i = 0
    rank_pos = np.empty(len(zs))
    while i < len(sorted_z):
        j = i
        while j < len(sorted_z) and sorted_z[j] == sorted_z[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # midrank (1-based)
        i = j
    npos, nneg = int(yi.sum()), int(len(yi) - yi.sum())
    auc = (ranks[yi == 1].sum() - npos * (npos + 1) / 2.0) / (npos * nneg)
    assert row["n_pos"] == npos and row["n_neg"] == nneg
    assert row["auc"] == pytest.approx(auc, abs=2e-9)
    assert row["gini"] == pytest.approx(2 * auc - 1, abs=4e-9)
    assert 0.5 < row["auc"] <= 1.0  # the distilled rule is learnable


def test_calibration_bins_partition_and_order(spark, sf_dir):
    """Calibration deciles partition the corpus exactly and the
    empirical positive rate is non-decreasing in the score bin (the
    classifier is at least rank-calibrated on its training rule)."""
    from results_ingestor_spark.plans import QUERIES

    rows = sorted(
        QUERIES["quality_classifier_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["bin"])
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert r["p_hi"] == pytest.approx(r["p_lo"] + 0.1)
        assert 0.0 <= r["pos_rate"] <= 1.0
    rates = [r["pos_rate"] for r in rows]
    assert rates == sorted(rates)
