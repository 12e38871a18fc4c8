"""TPC-H-shaped relational queries, round 2 breadth (SURVEY §2.4 / M2).

Adapted to the synthetic corpus's columns: the testdata lineitem has no
l_commitdate / l_receiptdate / l_shipmode and there is no partsupp
table, so Q4/Q12/Q2/Q9/Q16 are not expressible; Q6/Q7/Q10/Q14/Q18/Q19
are, with predicates re-anchored to the corpus's value ranges
(shipdates 1995-2001, p_type ∈ {PROMO, ECONOMY, ...}, brands
Brand#1..Brand#25, nations NATION_0..NATION_24).

Determinism rules follow plans/relational.py: exact-decimal sums cast
back to double, unique tie-break keys on every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables

_DEC = "CAST({c} AS DECIMAL(12,2))"


def _dec(c: str) -> F.Column:
    return F.expr(_DEC.format(c=c))


def _sumd(expr: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE)"


_REV = (_DEC.format(c="l_extendedprice")
        + " * (1 - " + _DEC.format(c="l_discount") + ")")


def _rev() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


@query("q6_forecast_revenue", oracle=f"""
SELECT {_sumd(_DEC.format(c='l_extendedprice') + ' * ' + _DEC.format(c='l_discount'))} AS revenue,
  COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure-scan aggregate.  All three predicates
    push to the parquet scan (PushedFilters), the projection prunes to
    3 columns, and the whole query is one WholeStageCodegen map stage
    feeding a 1-row partial+final agg — the minimal-possible plan, and
    the query that most directly measures scan throughput at 100 TB."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount"))
             .cast("double").alias("revenue"),
             F.count("*").alias("n")))


@query("q7_volume_shipping", oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  {_sumd(_REV)} AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by year.  The nation dim
    joins twice under different aliases (supplier side / customer side)
    — both broadcast; the disjunctive pair predicate lands after both
    joins.  Only the lineitem⋈orders fact-fact join shuffles."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "orders", "supplier", "customer", "nation"))
    n1 = t["nation"].select(F.col("n_nationkey").alias("n1_key"),
                            F.col("n_name").alias("supp_nation"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("volume")))


@query("q10_returned_items", oracle=f"""
SELECT c_custkey, c_name, {_sumd(_REV)} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking.  The returnflag
    and orderdate predicates push to their scans; nation broadcasts;
    top-20 goes through TakeOrderedAndProject (no full sort) with
    c_custkey as the unique tie-break."""
    t = load_tables(spark, sf_dir,
                    ("customer", "orders", "lineitem", "nation"))
    return (
        t["lineitem"].where(F.col("l_returnflag") == "R")
        .join(t["orders"].where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"))


@query("q14_promo_revenue", oracle=f"""
SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
    THEN {_DEC.format(c='l_extendedprice')} * (1 - {_DEC.format(c='l_discount')})
    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
  / {_sumd(_REV)}, 9) AS promo_revenue_pct,
  COUNT(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""")
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share for one ship month.  The
    corpus's p_type is a single word (no 'PROMO BURNISHED...' trigram),
    so the predicate is equality rather than LIKE 'PROMO%'.  part
    broadcasts into the filtered lineitem scan; the conditional sum is
    one decimal-exact CASE aggregate — ratio computed as a single
    double division, rounded for cross-engine bit stability."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    promo = F.when(F.col("p_type") == "PROMO", _rev()) \
             .otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        t["lineitem"].where(
            (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp")))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.lit(100.0) * F.sum(promo).cast("double")
                     / F.sum(_rev()).cast("double"), 9)
             .alias("promo_revenue_pct"),
             F.count("*").alias("n")))


@query("q18_large_volume_customer", oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM({_DEC.format(c='l_quantity')}) > 250)
SELECT c_name, c_custkey, o_orderkey,
  CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
  {_sumd(_DEC.format(c='l_quantity'))} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE),
         o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100""")
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose line quantities sum past a
    threshold (250 ≈ corpus p99).  The HAVING pre-aggregate reduces
    lineitem to qualifying orderkeys BEFORE the 3-way join — a
    semi-join on a 1%-selectivity derived set, the plan that matters
    when lineitem is the 100 TB table.  Top-100 via
    TakeOrderedAndProject, o_orderkey tie-break."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (t["lineitem"].groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("__q"))
           .where(F.col("__q") > 250)
           .select("l_orderkey"))
    return (
        t["lineitem"]
        .join(big.withColumnRenamed("l_orderkey", "__bk"),
              F.col("l_orderkey") == F.col("__bk"), "left_semi")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey",
                 F.col("o_orderdate").cast("date").alias("orderdate"),
                 "o_totalprice")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "orderdate",
                "o_totalprice", "total_qty"))


@query("q19_discounted_revenue", oracle=f"""
SELECT {_sumd(_REV)} AS revenue, COUNT(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)""")
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-attribute predicate across
    both join sides (no l_shipmode / p_container in the corpus — the
    brand/size/quantity arms carry the shape).  part broadcasts; the
    OR-of-ANDs lands as the join's residual condition, so each arm
    still prunes via the hash join on partkey rather than a cartesian
    loop."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    q = F.col("l_quantity")
    arm = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b) & (F.col("p_size") >= 1)
        & (F.col("p_size") <= smax) & (q >= qlo) & (q <= qhi))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .where(arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20)
               | arm("Brand#4", 35, 20, 30))
        .agg(F.sum(_rev()).cast("double").alias("revenue"),
             F.count("*").alias("n")))
