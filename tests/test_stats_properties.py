"""Property pins for the round-3 statistics on SYNTHETIC corpora: the
queries read any directory shaped like the corpus, so each test writes
a crafted events.parquet into tmp_path and asserts an analytic
invariant the implementation must honor (not just agreement on one
dataset)."""

import numpy as np
import pandas as pd
import pytest

from results_ingestor_spark.plans import QUERIES


def _write_events(tmp_path, values_click, values_view):
    tmp_path.mkdir(parents=True, exist_ok=True)
    n1, n2 = len(values_click), len(values_view)
    ts = pd.date_range("2024-01-01", periods=n1 + n2, freq="min")
    pdf = pd.DataFrame({
        "event_id": np.arange(n1 + n2, dtype="int64"),
        "ts": ts,
        "user_id": np.zeros(n1 + n2, dtype="int64"),
        "event_type": ["click"] * n1 + ["view"] * n2,
        "value": np.concatenate([values_click, values_view]).astype("f8"),
        "props": ["{}"] * (n1 + n2),
    })
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_mwu_invariant_under_monotone_transform(spark, tmp_path):
    """A rank test must not move under any strictly increasing
    transform of the values."""
    rng = np.random.RandomState(7)
    a, b = rng.normal(0, 1, 80).round(2), rng.normal(0.5, 1, 90).round(2)
    d1 = _write_events(tmp_path / "raw", a, b)
    d2 = _write_events(tmp_path / "exp", np.exp(a / 4), np.exp(b / 4))
    (tmp_path / "raw").mkdir(exist_ok=True)
    r1 = QUERIES["stats_mann_whitney_u"](spark, d1).collect()[0]
    r2 = QUERIES["stats_mann_whitney_u"](spark, d2).collect()[0]
    assert r1.u_click == r2.u_click
    # z differs only through tie structure; exp() preserves ties exactly
    assert r1.z == pytest.approx(r2.z, abs=1e-12)


def test_welch_detects_planted_shift_direction(spark, tmp_path):
    rng = np.random.RandomState(11)
    a = rng.normal(10, 1, 200).round(2)
    b = rng.normal(9, 1, 150).round(2)
    d = _write_events(tmp_path, a, b)
    r = QUERIES["stats_welch_ttest"](spark, d).collect()[0]
    assert r.mean_diff > 0.5 and r.t_stat > 5  # strong planted effect


def test_theil_sen_ignores_30pct_outliers(spark, tmp_path):
    """Slope 2/hour with 29% of hours corrupted by +1000 spikes: OLS
    would be wrecked; Theil-Sen must stay within 5%."""
    hours = 100
    base = 2.0 * np.arange(hours) + 5
    corrupted = base.copy()
    corrupted[::4] += 1000  # 25% of points
    rows_v = corrupted.round(2)
    ts = pd.date_range("2024-01-01", periods=hours, freq="h")
    pdf = pd.DataFrame({
        "event_id": np.arange(hours, dtype="int64"),
        "ts": ts,
        "user_id": np.zeros(hours, dtype="int64"),
        "event_type": ["click"] * hours,
        "value": rows_v.astype("f8"),
        "props": ["{}"] * hours,
    })
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    r = QUERIES["stats_theil_sen_trend"](spark, str(tmp_path)).collect()[0]
    assert r.slope_per_hour == pytest.approx(2.0, rel=0.05)


def test_bootstrap_ci_narrows_with_n(spark, tmp_path):
    rng = np.random.RandomState(3)
    small = _write_events(tmp_path / "s", rng.normal(5, 2, 60).round(2),
                          np.array([1.0]))
    big = _write_events(tmp_path / "b", rng.normal(5, 2, 2000).round(2),
                        np.array([1.0]))
    rs = QUERIES["stats_bootstrap_ci_mean"](spark, small).collect()[0]
    rb = QUERIES["stats_bootstrap_ci_mean"](spark, big).collect()[0]
    assert (rb.ci_hi - rb.ci_lo) < (rs.ci_hi - rs.ci_lo)
    assert rs.ci_lo < 5.8 and rs.ci_hi > 4.2  # brackets the truth
