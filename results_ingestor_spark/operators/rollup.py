"""County rollup — the reference's flagship aggregation (README.md:59-91).

``contest_precinct`` → ``contest_county``: group by (election_date,
contest_group_id, contest_name, district, county, candidate), with
string_agg(distinct …,'|') on descriptive columns, max on vote_for /
candidacy_date, bool_or on flags, sum on vote counts.

Scale posture:
* One hash-aggregate with partial (map-side) + final stages — Catalyst
  picks this automatically; ``collect_set`` partials merge as sets, so
  the shuffle carries deduplicated values.
* Sums are widened to LongType (PG sum(int)→bigint; an int32 overflows
  at 100 TB).
* AQE coalesces post-shuffle partitions and splits skewed county keys
  (session.py) — no manual salting needed for this key mix because
  election_date+contest+county+candidate is high-cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from results_ingestor_spark.functions.agg import pg_string_agg_distinct

GROUP_KEYS = ("election_date", "contest_group_id", "contest_name",
              "district", "county", "candidate")

_STRING_AGG_COLS = ("contest_type", "party_contest", "first_name",
                    "middle_name", "last_name", "name_suffix_lbl",
                    "nick_name", "party_candidate", "term")
_BOOL_OR_COLS = ("is_unexpired", "has_primary", "is_partisan")
_SUM_COLS = ("absentee_by_mail", "one_stop", "provisional",
             "election_day", "total_votes", "winner_flag")


def county_rollup(precinct: DataFrame) -> DataFrame:
    """README.md:61-90 re-expressed declaratively; output column order
    follows the reference SQL's select list."""
    aggs = [
        pg_string_agg_distinct("contest_type").alias("contest_type"),
        pg_string_agg_distinct("party_contest").alias("party_contest"),
        F.max("vote_for").alias("vote_for"),
        pg_string_agg_distinct("first_name").alias("first_name"),
        pg_string_agg_distinct("middle_name").alias("middle_name"),
        pg_string_agg_distinct("last_name").alias("last_name"),
        pg_string_agg_distinct("name_suffix_lbl").alias("name_suffix_lbl"),
        pg_string_agg_distinct("nick_name").alias("nick_name"),
        F.max("candidacy_date").alias("candidacy_date"),
        pg_string_agg_distinct("party_candidate").alias("party_candidate"),
        F.bool_or("is_unexpired").alias("is_unexpired"),
        F.bool_or("has_primary").alias("has_primary"),
        F.bool_or("is_partisan").alias("is_partisan"),
        pg_string_agg_distinct("term").alias("term"),
    ] + [
        F.sum(F.col(c).cast("long")).alias(c) for c in _SUM_COLS
    ]
    out = precinct.groupBy(*GROUP_KEYS).agg(*aggs)
    # Reference select-list order (README.md:63-88).
    return out.select(
        "election_date", "contest_group_id", "contest_name", "contest_type",
        "party_contest", "district", "county", "vote_for", "candidate",
        "first_name", "middle_name", "last_name", "name_suffix_lbl",
        "nick_name", "candidacy_date", "party_candidate", "is_unexpired",
        "has_primary", "is_partisan", "term", "absentee_by_mail", "one_stop",
        "provisional", "election_day", "total_votes", "winner_flag",
    )
