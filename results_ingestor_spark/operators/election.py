"""Deterministic contest_precinct synthesis from the TPC-H-ish corpus.

The driver's test corpus (/root/testdata) has no election-shaped table,
so the flagship pipeline (ingest → district extraction → county rollup,
README.md:59-91) runs over a contest_precinct frame derived 1:1 from
``lineitem ⋈ supplier ⋈ nation`` with pure arithmetic — fully
reproducible in the DuckDB oracle (see CONTEST_PRECINCT_SQL, kept in
lock-step with the DataFrame builder below).

The derivation is designed to exercise every hard parity point:
  * all three district regimes (number / letter / roman) + a
    double-'District' name (rsplit-last) + non-matching names;
  * mixed-case contest names (uppercase-on-match semantics);
  * NULL-heavy columns for string_agg(distinct) NULL-group parity;
  * spelling variants within a rollup group (multi-value string_agg);
  * vote-type values in ``precinct`` (README.md:36).

Both dimension joins broadcast (supplier/nation are tiny); the frame is
a narrow projection over the lineitem scan — no shuffle before the
rollup's single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from results_ingestor_spark.sources.tables import (
    ensure_min_parallelism, load_tables)

_ROMAN = ("I", "II", "III", "IV", "V", "VI", "VII", "VIII", "IX")


def contest_precinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ supplier ⋈ nation → contest_precinct-shaped frame
    (27 canonical columns, ``district`` left NULL for extraction)."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    # local parquet has ~3 row groups → 3 scan splits on 32 cores; widen
    # before the regex-heavy extraction + rollup (no-op at real scale)
    t["lineitem"] = ensure_min_parallelism(t["lineitem"])
    li = (t["lineitem"]
          .join(F.broadcast(t["supplier"]),
                F.col("l_suppkey") == F.col("s_suppkey"))
          .join(F.broadcast(t["nation"]),
                F.col("s_nationkey") == F.col("n_nationkey")))

    pk = F.col("l_partkey")
    ok = F.col("l_orderkey")
    sk = F.col("l_suppkey")
    ln = F.col("l_linenumber")
    regime = ln % 4

    district_no = (pk % 30).cast("string")
    letter = F.substring(F.lit("ABCDEFG"), (pk % 7 + 1).cast("int"), 1)
    roman = F.element_at(F.array(*[F.lit(r) for r in _ROMAN]),
                         (pk % 9 + 1).cast("int"))
    contest_name = (
        F.when(regime == 0, F.lit("US SENATE"))
        .when((regime == 1) & (pk % 5 == 0),
              F.concat(F.lit("District Court Judge District "), district_no))
        .when(regime == 1,
              F.concat(F.lit("Nc House Of Representatives District "), district_no))
        .when(regime == 2,
              F.concat(F.lit("County Commissioner District "), letter))
        .otherwise(F.concat(F.lit("Sanitary District "), roman)))

    is_partisan = pk % 2 == 0
    has_primary = pk % 3 == 0
    party = F.element_at(F.array(F.lit("DEM"), F.lit("REP"), F.lit("LIB")),
                         (pk % 3 + 1).cast("int"))

    election_day = F.floor(F.col("l_quantity")).cast("long")
    one_stop = F.floor(F.col("l_extendedprice")).cast("long") % 100
    absentee = F.floor(F.col("l_discount") * 100).cast("long")
    provisional = F.floor(F.col("l_tax") * 100).cast("long")

    return li.select(
        F.concat(F.lit("CG"), (pk % 20).cast("string")).alias("contest_group_id"),
        contest_name.alias("contest_name"),
        F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("election_date"),
        F.when(regime == 0, F.lit("state")).otherwise(F.lit("county")).alias("contest_type"),
        F.when(is_partisan & has_primary, party).otherwise(F.lit(None)).alias("party_contest"),
        (ok % 5 == 0).alias("is_unexpired"),
        has_primary.alias("has_primary"),
        is_partisan.alias("is_partisan"),
        (pk % 2 + 1).cast("int").alias("vote_for"),
        F.when(pk % 2 == 0, F.lit("4 Year")).otherwise(F.lit("2 Year")).alias("term"),
        F.lit(None).cast("string").alias("district"),
        F.col("n_name").alias("county"),
        F.when(ok % 11 == 0, F.lit("ABSENTEE"))
         .when(ok % 13 == 0, F.lit("PROVISIONAL"))
         .otherwise(F.concat(F.lit("P"), (sk % 5).cast("string"))).alias("precinct"),
        F.concat(F.lit("CAND "), (pk % 50).cast("string")).alias("candidate"),
        # suppkey-dependent suffix → spelling variants across precincts
        F.when(sk % 3 == 0, F.concat(F.lit("F"), (pk % 50).cast("string"), F.lit(".")))
         .otherwise(F.concat(F.lit("F"), (pk % 50).cast("string"))).alias("first_name"),
        F.when(pk % 3 == 0, F.lit(None))
         .otherwise(F.concat(F.lit("M"), (pk % 4).cast("string"))).alias("middle_name"),
        F.concat(F.lit("L"), (pk % 50).cast("string")).alias("last_name"),
        F.when(pk % 7 == 0, F.lit("JR")).otherwise(F.lit(None)).alias("name_suffix_lbl"),
        F.lit(None).cast("string").alias("nick_name"),
        party.alias("party_candidate"),
        election_day.alias("election_day"),
        one_stop.alias("one_stop"),
        absentee.alias("absentee_by_mail"),
        provisional.alias("provisional"),
        (election_day + one_stop + absentee + provisional).alias("total_votes"),
        F.when(pk % 50 < 2, F.lit(1)).otherwise(F.lit(0)).alias("winner_flag"),
        F.date_sub(F.col("l_shipdate").cast("date"), 30).alias("candidacy_date"),
    )


# DuckDB twin of contest_precinct_frame — keep in lock-step with the
# DataFrame builder above.  Composed into oracle SQL by plans/oracles.py.
CONTEST_PRECINCT_SQL = """
SELECT
  'CG' || (l_partkey % 20)::varchar AS contest_group_id,
  CASE
    WHEN l_linenumber % 4 = 0 THEN 'US SENATE'
    WHEN l_linenumber % 4 = 1 AND l_partkey % 5 = 0
      THEN 'District Court Judge District ' || (l_partkey % 30)::varchar
    WHEN l_linenumber % 4 = 1
      THEN 'Nc House Of Representatives District ' || (l_partkey % 30)::varchar
    WHEN l_linenumber % 4 = 2
      THEN 'County Commissioner District ' || substr('ABCDEFG', (l_partkey % 7 + 1)::int, 1)
    ELSE 'Sanitary District ' || (['I','II','III','IV','V','VI','VII','VIII','IX'])[(l_partkey % 9 + 1)::int]
  END AS contest_name,
  CAST(date_trunc('month', l_shipdate) AS date) AS election_date,
  CASE WHEN l_linenumber % 4 = 0 THEN 'state' ELSE 'county' END AS contest_type,
  CASE WHEN l_partkey % 2 = 0 AND l_partkey % 3 = 0
       THEN (['DEM','REP','LIB'])[(l_partkey % 3 + 1)::int] END AS party_contest,
  l_orderkey % 5 = 0 AS is_unexpired,
  l_partkey % 3 = 0 AS has_primary,
  l_partkey % 2 = 0 AS is_partisan,
  (l_partkey % 2 + 1)::int AS vote_for,
  CASE WHEN l_partkey % 2 = 0 THEN '4 Year' ELSE '2 Year' END AS term,
  CAST(NULL AS varchar) AS district,
  n_name AS county,
  CASE WHEN l_orderkey % 11 = 0 THEN 'ABSENTEE'
       WHEN l_orderkey % 13 = 0 THEN 'PROVISIONAL'
       ELSE 'P' || (l_suppkey % 5)::varchar END AS precinct,
  'CAND ' || (l_partkey % 50)::varchar AS candidate,
  CASE WHEN l_suppkey % 3 = 0 THEN 'F' || (l_partkey % 50)::varchar || '.'
       ELSE 'F' || (l_partkey % 50)::varchar END AS first_name,
  CASE WHEN l_partkey % 3 = 0 THEN NULL
       ELSE 'M' || (l_partkey % 4)::varchar END AS middle_name,
  'L' || (l_partkey % 50)::varchar AS last_name,
  CASE WHEN l_partkey % 7 = 0 THEN 'JR' END AS name_suffix_lbl,
  CAST(NULL AS varchar) AS nick_name,
  (['DEM','REP','LIB'])[(l_partkey % 3 + 1)::int] AS party_candidate,
  CAST(floor(l_quantity) AS bigint) AS election_day,
  CAST(floor(l_extendedprice) AS bigint) % 100 AS one_stop,
  CAST(floor(l_discount * 100) AS bigint) AS absentee_by_mail,
  CAST(floor(l_tax * 100) AS bigint) AS provisional,
  CAST(floor(l_quantity) AS bigint) + CAST(floor(l_extendedprice) AS bigint) % 100
    + CAST(floor(l_discount * 100) AS bigint) + CAST(floor(l_tax * 100) AS bigint) AS total_votes,
  CASE WHEN l_partkey % 50 < 2 THEN 1 ELSE 0 END AS winner_flag,
  CAST(l_shipdate AS date) - 30 AS candidacy_date
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""
