"""Property-based tests (hypothesis) — SURVEY §5.2.

Examples are batched into one DataFrame per case to amortize Spark job
overhead; max_examples kept small since each example is a full job.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from results_ingestor_spark.operators.district import extract_district

# Strings likely to stress the extraction regexes: fragments around the
# DISTRICT keyword, numbers, letters, romans, mixed case.
_frag = st.sampled_from([
    "DISTRICT", "District", "district", "COURT", "JUDGE", "NC", "SENATE",
    "9B", "12", "B", "IV", "IX", "iv", "A1", "OF", "COMMISSIONER", " ",
])
_name = st.lists(_frag, min_size=1, max_size=6).map(" ".join).map(
    lambda s: " ".join(s.split()) or "X")


def _pandas_model(names: list[str]) -> list[tuple[str, str | None]]:
    df = pd.DataFrame({"contest_name": names})
    df["district"] = None
    for pat in (r"DISTRICT \d", r"DISTRICT [a-z]\b",
                # non-capturing roman group: str.contains warns on (and
                # pandas plans to change behavior for) capture groups
                r"DISTRICT (?:IX|I?V|V?I{1,3})\b"):
        idx = df["contest_name"].str.contains(pat, case=False, regex=True)
        if idx.any():
            parts = df.loc[idx, "contest_name"].str.upper().str.rsplit(
                "DISTRICT", n=1, expand=True)
            df.loc[idx, "contest_name"] = parts[0]
            df.loc[idx, "district"] = parts[1]
    return [(cn, d if isinstance(d, str) else None)
            for cn, d in zip(df["contest_name"], df["district"])]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(_name, min_size=1, max_size=30))
def test_district_extraction_matches_pandas_model(spark, names):
    sdf = spark.createDataFrame([(n,) for n in names], ["contest_name"])
    got = [(r["contest_name"], r["district"])
           for r in extract_district(sdf, force=True).collect()]
    assert got == _pandas_model(names)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 200)),
    min_size=1, max_size=50))
def test_rollup_preserves_vote_mass_and_group_bounds(spark, rows):
    """sum(total_votes) is invariant under rollup; group count is bounded
    by distinct key count."""
    import datetime

    from results_ingestor_spark.operators.rollup import county_rollup
    from results_ingestor_spark.schemas import CONTEST_PRECINCT_SCHEMA
    base = {c.name: None for c in CONTEST_PRECINCT_SCHEMA}
    data = []
    for county, cand, votes in rows:
        r = dict(base)
        r.update(election_date=datetime.date(2020, 11, 3),
                 contest_group_id="G", contest_name="RACE",
                 county=f"C{county}", candidate=f"K{cand}",
                 precinct="P", total_votes=votes)
        data.append(tuple(r[c.name] for c in CONTEST_PRECINCT_SCHEMA))
    df = spark.createDataFrame(data, CONTEST_PRECINCT_SCHEMA)
    out = county_rollup(df)
    assert out.groupBy().sum("total_votes").collect()[0][0] == \
        sum(v for _, _, v in rows)
    assert out.count() == len({(c, k) for c, k, _ in rows})


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
                min_size=3, max_size=40))
def test_minhash_identical_docs_always_collide(spark, tokens):
    """Two identical token streams must share every band key."""
    from results_ingestor_spark.operators.dedup import with_minhash
    text = " ".join(tokens)
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    sig = with_minhash(df).select("doc_id", "band0", "band1", "band2", "band3")
    a, b = sorted(sig.collect(), key=lambda r: r["doc_id"])
    assert all(a[f"band{i}"] == b[f"band{i}"] for i in range(4))


@given(st.lists(st.integers(min_value=-500, max_value=500),
                min_size=1, max_size=40))
@settings(max_examples=15, deadline=None)
def test_cusum_prefix_scan_closed_form_matches_recursion(spark, xs):
    """The CUSUM prefix-scan identity S_i = cum_i - min(0, min cum_j)
    must equal the textbook recursion S_i = max(0, S_{i-1} + x_i) for
    any integer series (cusum_user_drift relies on it)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "i int, x double")
    w = (Window.orderBy("i")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("x").over(w)
    d = df.select("i", cum.alias("cum"), F.min(cum).over(w).alias("mn"))
    out = d.select(
        "i", (F.col("cum")
              - F.least(F.lit(0.0), F.col("mn"))).alias("s")).collect()
    got = {r["i"]: r["s"] for r in out}
    s = 0.0
    for i, x in enumerate(xs):
        s = max(0.0, s + x)
        assert got[i] == s


def test_attrition_funnel_conserves_documents(spark, sf_dir):
    """The stage-attrition report must tie out exactly per source:
    ingested = chars-fail + tokens-fail + quality-pass, curated =
    quality-pass − dup-dropped, and the global totals must match the
    corpus rowcount."""
    from results_ingestor_spark.plans import QUERIES
    from results_ingestor_spark.sources.tables import load_tables

    rows = QUERIES["pipeline_stage_attrition"](spark, sf_dir).collect()
    for r in rows:
        assert (r["n_fail_chars"] + r["n_fail_tokens"]
                + r["n_quality_pass"] == r["n_ingested"]), r
        assert r["n_curated"] == r["n_quality_pass"] - r["n_dup_dropped"]
        assert 0.0 <= r["yield_pct"] <= 1.0
    total = load_tables(spark, sf_dir, ("documents",))["documents"].count()
    assert sum(r["n_ingested"] for r in rows) == total


def test_code_switching_entropy_bounds(spark, sf_dir):
    """Chunk-language entropy obeys 0 ≤ H ≤ log2(n_langs), dominance is
    a valid share, and chunk counts cover every document."""
    import math
    from results_ingestor_spark.plans import QUERIES
    from results_ingestor_spark.sources.tables import load_tables

    rows = QUERIES["text_code_switching"](spark, sf_dir).collect()
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assert len(rows) == docs.count()
    for r in rows:
        assert r["n_chunks"] >= 1 and 1 <= r["n_langs"] <= 5
        assert -1e-6 <= r["entropy_bits"] <= math.log2(r["n_langs"]) + 1e-6
        assert 0.0 < r["dominant_share"] <= 1.0
        if r["n_langs"] == 1:
            assert r["entropy_bits"] == 0.0 and not r["is_mixed"]
