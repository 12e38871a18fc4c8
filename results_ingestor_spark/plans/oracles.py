"""Helpers that compose DuckDB oracle SQL mirroring engine operators.

Every helper here has a lock-step twin in operators/ or functions/; the
comments say which.  Keeping the SQL generation in one place makes the
parity contract auditable.
"""

from __future__ import annotations

# Twin of functions/agg.py::pg_string_agg_distinct.
def sad(col: str, sep: str = "|") -> str:
    return ("nullif(array_to_string(list_sort(array_agg(DISTINCT {c}) "
            "FILTER (WHERE {c} IS NOT NULL)), '{s}'), '')").format(c=col, s=sep)


# Twin of functions/hashing.py::md5_long.
def md5_long_sql(expr: str, seed: str = "") -> str:
    return f"('0x' || substr(md5('{seed}' || {expr}), 1, 15))::bigint"


# Twin of operators/district.py (patterns must match DISTRICT_PATTERNS
# minus the (?i) prefix — DuckDB takes the flag as an argument).
_DISTRICT_PASSES = (
    r"DISTRICT \d",
    r"DISTRICT [a-z]\b",
    r"DISTRICT (IX|I?V|V?I{1,3})\b",
)


def district_extract_sql(base_select: str) -> str:
    """Wrap ``base_select`` (must yield contest_name + district columns)
    in the three sequential extraction passes of ingestor_precinct.py:165-183."""
    sql = base_select
    for p in _DISTRICT_PASSES:
        sql = f"""SELECT * REPLACE (
  CASE WHEN regexp_matches(contest_name, '{p}', 'i')
       THEN regexp_extract(upper(contest_name), '^(.*)DISTRICT(.*)$', 1)
       ELSE contest_name END AS contest_name,
  CASE WHEN regexp_matches(contest_name, '{p}', 'i')
       THEN regexp_extract(upper(contest_name), '^(.*)DISTRICT(.*)$', 2)
       ELSE district END AS district
) FROM ({sql})"""
    return sql


# Twin of operators/rollup.py::county_rollup (README.md:61-90).  Sums are
# cast back to bigint because DuckDB widens sum(int) to HUGEINT.
def county_rollup_sql(base_select: str) -> str:
    return f"""SELECT
  election_date, contest_group_id, contest_name,
  {sad('contest_type')} AS contest_type,
  {sad('party_contest')} AS party_contest,
  district, county,
  max(vote_for) AS vote_for,
  candidate,
  {sad('first_name')} AS first_name,
  {sad('middle_name')} AS middle_name,
  {sad('last_name')} AS last_name,
  {sad('name_suffix_lbl')} AS name_suffix_lbl,
  {sad('nick_name')} AS nick_name,
  max(candidacy_date) AS candidacy_date,
  {sad('party_candidate')} AS party_candidate,
  bool_or(is_unexpired) AS is_unexpired,
  bool_or(has_primary) AS has_primary,
  bool_or(is_partisan) AS is_partisan,
  {sad('term')} AS term,
  CAST(sum(absentee_by_mail) AS bigint) AS absentee_by_mail,
  CAST(sum(one_stop) AS bigint) AS one_stop,
  CAST(sum(provisional) AS bigint) AS provisional,
  CAST(sum(election_day) AS bigint) AS election_day,
  CAST(sum(total_votes) AS bigint) AS total_votes,
  CAST(sum(winner_flag) AS bigint) AS winner_flag
FROM ({base_select})
GROUP BY election_date, contest_group_id, contest_name, district, county, candidate"""
