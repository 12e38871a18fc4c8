"""Canonical election-results schemas.

The reference stores its canonical schema as a header-only CSV read at
startup (ingestor_precinct.py:20, schema_precinct.csv:1) and its types as
a SQLAlchemy dtype map on the sink (ingestor_precinct.py:192-218).  Here
both are one explicit StructType constant — the single source of truth
for alignment, casting, and the JDBC sink.

Type mapping (SURVEY §1.2): Text→StringType, Integer→IntegerType,
Boolean→BooleanType, Date→DateType.  Vote-count sums are widened to
LongType at aggregation time (Postgres sum(int)→bigint; at 100 TB an
int32 sum overflows).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Column order follows schema_precinct.csv:1 exactly.
_PRECINCT_COLS: list[tuple[str, T.DataType]] = [
    ("contest_group_id", T.StringType()),
    ("contest_name", T.StringType()),
    ("election_date", T.DateType()),
    ("contest_type", T.StringType()),
    ("party_contest", T.StringType()),
    ("is_unexpired", T.BooleanType()),
    ("has_primary", T.BooleanType()),
    ("is_partisan", T.BooleanType()),
    ("vote_for", T.IntegerType()),
    ("term", T.StringType()),
    ("district", T.StringType()),
    ("county", T.StringType()),
    ("precinct", T.StringType()),
    ("candidate", T.StringType()),
    ("first_name", T.StringType()),
    ("middle_name", T.StringType()),
    ("last_name", T.StringType()),
    ("name_suffix_lbl", T.StringType()),
    ("nick_name", T.StringType()),
    ("party_candidate", T.StringType()),
    ("election_day", T.IntegerType()),
    ("one_stop", T.IntegerType()),
    ("absentee_by_mail", T.IntegerType()),
    ("provisional", T.IntegerType()),
    ("total_votes", T.IntegerType()),
    ("winner_flag", T.IntegerType()),  # boolean-as-int, summable (README.md:88)
    ("candidacy_date", T.DateType()),
]

CONTEST_PRECINCT_SCHEMA = T.StructType(
    [T.StructField(c, t, nullable=True) for c, t in _PRECINCT_COLS])

# contest_county = contest_precinct minus `precinct`, in schema_county.csv:1
# order (election_date first; README.md:57).
_COUNTY_ORDER = [
    "election_date", "contest_group_id", "contest_name", "contest_type",
    "party_contest", "vote_for", "term", "district", "county", "candidate",
    "first_name", "middle_name", "last_name", "name_suffix_lbl", "nick_name",
    "party_candidate", "is_unexpired", "has_primary", "is_partisan",
    "election_day", "one_stop", "absentee_by_mail", "provisional",
    "total_votes", "winner_flag", "candidacy_date",
]
_PRECINCT_TYPES = dict(_PRECINCT_COLS)

CONTEST_COUNTY_SCHEMA = T.StructType(
    [T.StructField(c, _PRECINCT_TYPES[c], nullable=True) for c in _COUNTY_ORDER])
