"""Capstone integration: raw messy CSVs → full reference pipeline →
county rollup, asserting the golden aggregates (FIXTURES.md A4 shape)."""

from __future__ import annotations

import datetime

import pytest

from results_ingestor_spark.operators.ingest import ingest_result_files
from results_ingestor_spark.operators.mapping import suggest_mapping
from results_ingestor_spark.operators.rollup import county_rollup
from results_ingestor_spark.schemas import CONTEST_PRECINCT_SCHEMA

CSV = """\
Contest Name,County Name,Precinct,Choice,Choice Party,Election Day,One Stop,Absentee by Mail,Provisional,Total Votes,Winner
NC SENATE DISTRICT 14,WAKE,P1,Adams,DEM,100,50,20,5,175,1
NC SENATE DISTRICT 14,WAKE,ABSENTEE,Adams,DEM,0,0,30,0,30,1
NC SENATE DISTRICT 14,WAKE,P1,Burke,REP,90,40,10,5,145,0
NC SENATE DISTRICT 14,DURHAM,P9,Adams,DEM,60,30,10,0,100,1
US SENATE,WAKE,P1,Cole,LIB,Not Found,10,5,0,15,0
"""


@pytest.fixture(scope="module")
def rolled(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    (d / "results.csv").write_text(CSV)
    mapping = suggest_mapping(
        CSV.splitlines()[0].split(","),
        [f.name for f in CONTEST_PRECINCT_SCHEMA.fields])
    mapping["11/08/2022"] = "election_date"   # operator constant-fill
    # the reference flow is human-confirmed; 'Choice Party' scores below
    # the 60 threshold, so the operator adds it — exactly the UI edit step
    mapping["Choice Party"] = "party_candidate"
    precinct = ingest_result_files(spark, str(d), mapping)
    county = county_rollup(precinct)
    return {(r["contest_name"], r["county"], r["candidate"]): r
            for r in county.collect()}


def test_rollup_group_structure(rolled):
    # 5 precinct rows → 4 county groups (Adams/WAKE merges two precincts)
    assert len(rolled) == 4
    assert ("NC SENATE ", "WAKE", "Adams") in rolled
    assert ("US SENATE", "WAKE", "Cole") in rolled


def test_district_extracted_and_rolled(rolled):
    adams = rolled[("NC SENATE ", "WAKE", "Adams")]
    assert adams["district"] == " 14"
    cole = rolled[("US SENATE", "WAKE", "Cole")]
    assert cole["district"] is None


def test_vote_sums_across_precincts(rolled):
    adams = rolled[("NC SENATE ", "WAKE", "Adams")]
    assert adams["election_day"] == 100
    assert adams["absentee_by_mail"] == 50        # 20 + 30
    assert adams["total_votes"] == 205            # 175 + 30
    assert adams["winner_flag"] == 2              # summed boolean-as-int


def test_null_sentinel_through_pipeline(rolled):
    cole = rolled[("US SENATE", "WAKE", "Cole")]
    assert cole["election_day"] is None           # 'Not Found' → NULL → sum NULL
    assert cole["total_votes"] == 15


def test_constant_fill_date(rolled):
    assert all(r["election_date"] == datetime.date(2022, 11, 8)
               for r in rolled.values())


def test_party_rollup(rolled):
    assert rolled[("NC SENATE ", "WAKE", "Adams")]["party_candidate"] == "DEM"
    assert rolled[("NC SENATE ", "WAKE", "Burke")]["party_candidate"] == "REP"


def test_non_utc_session_timezone_robustness(sf_dir):
    """The driver builds its OWN SparkSession, possibly in a non-UTC
    zone.  tune_session (called inside load_tables) must re-pin UTC or
    every timestamp-derived column (date_trunc buckets, year(), casts
    to date) shifts relative to the DuckDB oracle.  Pin: a fresh
    session starting in America/New_York must produce the same hourly
    buckets as the UTC conftest session."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from results_ingestor_spark.sources.tables import load_tables

    s2 = (SparkSession.builder.master("local[4]")
          .appName("tz-probe")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.sql.session.timeZone", "America/New_York")
          .getOrCreate())
    try:
        ev = load_tables(s2, sf_dir, ("events",))["events"]
        assert s2.conf.get("spark.sql.session.timeZone") == "UTC"
        got = (ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
               .count().orderBy("h").limit(3).collect())
        # corpus starts 2024-01-01 00:00 UTC: the first bucket must be
        # midnight UTC, not 19:00 EST-shifted
        assert got[0]["h"].hour == 0
    finally:
        pass  # shared JVM: leave the (UTC-repinned) session as-is
