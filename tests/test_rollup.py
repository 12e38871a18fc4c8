"""County rollup golden tests (README.md:59-91 semantics, FIXTURES.md A4)."""

from __future__ import annotations

import datetime

import pytest

from results_ingestor_spark.operators.rollup import county_rollup
from results_ingestor_spark.schemas import CONTEST_PRECINCT_SCHEMA

D = datetime.date


def _row(**kw):
    base = {c.name: None for c in CONTEST_PRECINCT_SCHEMA}
    base.update(kw)
    return tuple(base[c.name] for c in CONTEST_PRECINCT_SCHEMA)


@pytest.fixture(scope="module")
def rolled(spark):
    rows = [
        # two precincts, same group, divergent first_name spellings,
        # all-NULL party_contest, boolean mix for bool_or
        _row(election_date=D(2020, 11, 3), contest_group_id="G1",
             contest_name="GOVERNOR", district=" 1", county="WAKE",
             precinct="P1", candidate="A B", first_name="A",
             vote_for=1, is_partisan=True, has_primary=False,
             is_unexpired=False, election_day=10, one_stop=5,
             absentee_by_mail=2, provisional=1, total_votes=18,
             winner_flag=1, candidacy_date=D(2020, 1, 5)),
        _row(election_date=D(2020, 11, 3), contest_group_id="G1",
             contest_name="GOVERNOR", district=" 1", county="WAKE",
             precinct="ABSENTEE", candidate="A B", first_name="A.",
             vote_for=2, is_partisan=False, has_primary=False,
             is_unexpired=True, election_day=3, one_stop=1,
             absentee_by_mail=7, provisional=0, total_votes=11,
             winner_flag=1, candidacy_date=D(2020, 1, 9)),
        # different county → separate group
        _row(election_date=D(2020, 11, 3), contest_group_id="G1",
             contest_name="GOVERNOR", district=" 1", county="DURHAM",
             precinct="P9", candidate="A B", first_name="A",
             vote_for=1, is_partisan=True, has_primary=True,
             is_unexpired=False, election_day=4, one_stop=4,
             absentee_by_mail=4, provisional=4, total_votes=16,
             winner_flag=0, candidacy_date=D(2020, 1, 5)),
    ]
    df = spark.createDataFrame(rows, CONTEST_PRECINCT_SCHEMA)
    out = county_rollup(df)
    return {(r["county"]): r for r in out.collect()}


def test_group_count(rolled):
    assert set(rolled) == {"WAKE", "DURHAM"}


def test_sums_and_bool_or(rolled):
    w = rolled["WAKE"]
    assert w["election_day"] == 13
    assert w["one_stop"] == 6
    assert w["absentee_by_mail"] == 9
    assert w["provisional"] == 1
    assert w["total_votes"] == 29
    assert w["winner_flag"] == 2          # boolean-as-int, summed (README.md:88)
    assert w["is_unexpired"] is True      # bool_or over (False, True)
    assert w["has_primary"] is False
    assert w["is_partisan"] is True


def test_string_agg_distinct_sorted(rolled):
    # divergent spellings joined sorted with '|'
    assert rolled["WAKE"]["first_name"] == "A|A."
    assert rolled["DURHAM"]["first_name"] == "A"


def test_all_null_group_is_null_not_empty(rolled):
    # PG string_agg over all-NULL group → NULL (not ''): nullif parity
    assert rolled["WAKE"]["party_contest"] is None
    assert rolled["WAKE"]["nick_name"] is None


def test_max_aggregates(rolled):
    assert rolled["WAKE"]["vote_for"] == 2
    assert rolled["WAKE"]["candidacy_date"] == D(2020, 1, 9)


def test_output_schema_matches_county_order(rolled):
    from results_ingestor_spark.schemas import CONTEST_COUNTY_SCHEMA
    got = list(rolled["WAKE"].asDict())
    # reference SQL select-list order (README.md:63-88)
    assert set(got) == {f.name for f in CONTEST_COUNTY_SCHEMA}


def test_vote_preservation_property(spark):
    """Property: precinct→county rollup preserves total vote mass."""
    import random
    rng = random.Random(7)
    rows = [
        _row(election_date=D(2022, 5, 17), contest_group_id=f"G{rng.randint(0, 3)}",
             contest_name="SENATE", district=None,
             county=f"C{rng.randint(0, 5)}", precinct=f"P{i}",
             candidate=f"K{rng.randint(0, 4)}",
             total_votes=rng.randint(0, 100))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, CONTEST_PRECINCT_SCHEMA)
    out = county_rollup(df)
    assert (out.groupBy().sum("total_votes").collect()[0][0]
            == sum(r[24] for r in rows))


def test_rollup_sql_surface_matches_dataframe(spark, sf_dir):
    """SQL-surface parity: the reference's rollup statement
    (README.md:59-91), translated string_agg(distinct x,'|') →
    nullif(concat_ws('|', sort_array(collect_set(x))),''), run through
    spark.sql over a temp view, must equal the DataFrame operator
    row-for-row — a user can bring the SQL they run today."""
    from results_ingestor_spark.operators.district import extract_district
    from results_ingestor_spark.operators.election import (
        contest_precinct_frame)
    from results_ingestor_spark.operators.rollup import county_rollup

    precinct = extract_district(contest_precinct_frame(spark, sf_dir),
                                force=True)
    precinct.createOrReplaceTempView("contest_precinct")

    def sa(c):
        return (f"nullif(concat_ws('|', sort_array(collect_set({c}))), '')"
                f" AS {c}")

    sql = f"""
      SELECT election_date, contest_group_id, contest_name,
        {sa('contest_type')}, {sa('party_contest')}, district, county,
        max(vote_for) AS vote_for, candidate,
        {sa('first_name')}, {sa('middle_name')}, {sa('last_name')},
        {sa('name_suffix_lbl')}, {sa('nick_name')},
        max(candidacy_date) AS candidacy_date, {sa('party_candidate')},
        bool_or(is_unexpired) AS is_unexpired,
        bool_or(has_primary) AS has_primary,
        bool_or(is_partisan) AS is_partisan, {sa('term')},
        sum(CAST(absentee_by_mail AS BIGINT)) AS absentee_by_mail,
        sum(CAST(one_stop AS BIGINT)) AS one_stop,
        sum(CAST(provisional AS BIGINT)) AS provisional,
        sum(CAST(election_day AS BIGINT)) AS election_day,
        sum(CAST(total_votes AS BIGINT)) AS total_votes,
        sum(CAST(winner_flag AS BIGINT)) AS winner_flag
      FROM contest_precinct
      GROUP BY election_date, contest_group_id, contest_name, district,
               county, candidate"""
    via_sql = spark.sql(sql)
    via_df = county_rollup(precinct)
    assert via_sql.columns == via_df.columns
    key = lambda r: tuple((v is None, str(v)) for v in r)  # noqa: E731
    a = sorted(map(tuple, via_sql.collect()), key=key)
    b = sorted(map(tuple, via_df.collect()), key=key)
    assert a == b and len(a) > 100
