"""Logistic-regression quality classifier trained with DataFrame-only
batch gradient descent — the classifier-based document-quality filter
(the FineWeb / fasttext-filter shape) as a Spark iterative algorithm.

Scale contract (same family as the k-means IVF trainer,
operators/similarity.py):

- features and labels are computed IN-PLAN from the documents table
  (no feature materialization, no Python);
- each GD iteration is ONE aggregation job whose map side computes
  per-partition partial gradient sums (Catalyst partial aggregation),
  so the shuffle payload is d+1 doubles per partition;
- only the weight vector (d+1 doubles) ever reaches the driver, once
  per iteration — centroid-sized traffic, corpus-size-independent;
- scoring with the trained weights is a pure codegen map stage.

Label: whether the document passes a length-based quality gate
(n_chars >= 300) — rule distillation: a hard heuristic teaches a smooth
scorer, the same weak-supervision shape as classifier-based quality
filters (a trusted labeled subset → a filter for the open crawl).  The
synthetic corpus's lang/source columns are statistically independent of
the text, so the gate rule is the only label the corpus makes learnable
— the point here is the distributed-GD mechanics and its cross-engine
value check, not the label semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUALITY_GATE_CHARS = 300  # label: n_chars >= gate (≈ corpus median)


def feature_columns() -> list[Column]:
    """Six deterministic text features + implicit bias handled by the
    caller.  All built-in expressions (codegen)."""
    tk = F.split("text", " ")
    n_tok = F.size(tk).cast("double")
    n_chr = F.length("text").cast("double")
    return [
        F.lit(1.0),                                            # bias
        F.least(n_tok / 200.0, F.lit(1.0)),                    # length prior
        F.size(F.array_distinct(tk)).cast("double") / n_tok,   # TTR
        (n_chr - F.length(F.regexp_replace("text", r"[0-9]", ""))) / n_chr,
        (n_chr - F.length(F.regexp_replace("text", r"[aeiou]", ""))) / n_chr,
        F.least(n_chr / n_tok / 10.0, F.lit(1.0)),             # avg token len
    ]


def _label() -> Column:
    return (F.length("text") >= QUALITY_GATE_CHARS).cast("double")


def feature_base(docs: DataFrame) -> DataFrame:
    """The projected (doc_id, source, x0..x5, y) feature frame.

    r11: consumers that train AND score/evaluate (auc, calibration,
    score, gradient-match) checkpoint this ONCE and hand it to
    ``train_quality_classifier(base=...)``, so the raw-text feature
    expressions (two regexp_replace passes, tokenization) run a single
    time instead of once for training plus once per consumer stage —
    guide §2.4's "don't compute things twice" applied to the Python-
    driver-coordinated GD family.  y is the double 0.0/1.0 label, so
    an integer label is exactly ``y.cast("long")``."""
    feats = feature_columns()
    return docs.select(
        "doc_id", "source",
        *[feats[j].alias(f"x{j}") for j in range(len(feats))],
        _label().alias("y"))


def train_quality_classifier(docs: DataFrame, iterations: int = 10,
                             lr: float = 5.0,
                             base: DataFrame | None = None) -> list[dict]:
    """Batch GD on logistic loss.  Returns per-iteration
    {iteration, loss, weights} with loss measured BEFORE that step's
    update (so loss[0] is the untrained baseline).

    Weights are rounded to 9 dp after every update: double summation
    order across partitions perturbs gradients at ~1e-15 relative, and
    the rounding quantizes that noise away so the trajectory is
    bit-reproducible run-to-run AND matches the DuckDB unrolled-CTE
    oracle exactly (same rounding there).

    r11 note (guide §1 — measure first): the k-means broadcast-data
    lesson was A/B-tested here and REJECTED.  With only d=6 primitive
    double literals per iteration, shipping weights as a broadcast
    1-row relation (identical generated code every iteration) measured
    2.7x SLOWER than inlined literals (same-session alternating A/B at
    sf0.1: 1.09 s vs 2.87 s for 8 iterations) — the per-iteration
    broadcast-stage materialization costs more than the tiny Janino
    compile, and repeated invocations replay the same weight
    trajectory so the literal classes hit the codegen cache anyway.
    The literal form stands; only the checkpoint lifecycle changed
    (scope-released before returning — pre-r11 it leaked until GC).

    ``base``: an optional pre-checkpointed ``feature_base`` frame; when
    given, the trainer aggregates over it directly (extra columns are
    ignored by the aggregation) and its lifecycle stays with the
    caller — consumers that also score/evaluate share one feature
    materialization this way."""
    from results_ingestor_spark.operators.ckpt import CheckpointScope
    d = len(feature_columns())
    # features once, reused per iter; scope-released before returning
    scope = None
    if base is None:
        scope = CheckpointScope(docs)
        base = scope.checkpoint(feature_base(docs))

    w = [0.0] * d
    history: list[dict] = []
    try:
        for it in range(iterations):
            z = sum(F.col(f"x{j}") * float(w[j]) for j in range(d))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = p - F.col("y")
            # logistic loss: -[y ln p + (1-y) ln (1-p)]; clamp for ln(0)
            pc = F.greatest(F.least(p, F.lit(1 - 1e-12)), F.lit(1e-12))
            loss = -(F.col("y") * F.log(pc)
                     + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - pc))
            row = base.agg(
                F.avg(loss).alias("loss"),
                *[F.avg(err * F.col(f"x{j}")).alias(f"g{j}")
                  for j in range(d)]
            ).first()  # one job; d+2 doubles to the driver
            # Shared floor-snap, not Python round() (r10 migration):
            # round() is half-even where the oracle's old SQL round()
            # was half-away — a latent per-step trajectory divergence
            # at exact .5e-9 straddles.  floor(x*1e9 + 0.5)/1e9 is the
            # identical IEEE op chain the unrolled-CTE oracle replays.
            w = [math.floor((w[j] - lr * row[f"g{j}"]) * 1e9 + 0.5) / 1e9
                 for j in range(d)]
            history.append({"iteration": it, "loss": float(row["loss"]),
                            "weights": list(w)})
    finally:
        if scope is not None:
            scope.release_all_except()
    return history


def score_quality(docs: DataFrame, weights: list[float],
                  base: DataFrame | None = None) -> DataFrame:
    """Apply trained weights — pure map stage, no shuffle.  With
    ``base`` (a ``feature_base`` frame, typically the checkpointed one
    training just used) the score reads the materialized x columns
    instead of re-deriving the features from raw text."""
    from results_ingestor_spark.plans import exact
    if base is None:
        feats = feature_columns()
        xs = [feats[j] for j in range(len(weights))]
        src = docs
    else:
        xs = [F.col(f"x{j}") for j in range(len(weights))]
        src = base
    z = sum(xs[j] * float(weights[j]) for j in range(len(weights)))
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return src.select("doc_id", "source",
                      exact.snap_double_col(p, 6).alias("quality_prob"),
                      (p >= 0.5).alias("keep"))


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
