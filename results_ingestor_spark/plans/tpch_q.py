"""TPC-H-shaped relational queries, round 2 breadth (SURVEY §2.4 / M2).

Adapted to the synthetic corpus's columns: the testdata lineitem has no
l_commitdate / l_receiptdate / l_shipmode and there is no partsupp
table, so Q12/Q2/Q9/Q16 are not expressible; Q6/Q7/Q10/Q14/Q18/Q19 are,
with predicates re-anchored to the corpus's value ranges (shipdates
1995-2001, p_type ∈ {PROMO, ECONOMY, ...}, brands Brand#1..Brand#25,
nations NATION_0..NATION_24).  Q4/Q13/Q15/Q17/Q22 are adapted with
equivalent plan shapes: Q4's "late commit" EXISTS becomes "shipped
>60 days after order", Q22's phone-prefix becomes custkey mod 10 and
"no orders ever" becomes "no orders since 2000-06-01" (every corpus
customer has early orders).

Cross-engine determinism notes for the adapted five: correlated
threshold predicates (Q17's 0.5·avg(qty), Q22's avg positive acctbal)
are multiplied through to exact-decimal comparisons (qty·2·cnt < Σqty)
so no engine-specific float division sits on a filter boundary.

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


@query("q4_order_priority", oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts for orders with a late line.
    The corpus has no l_commitdate/l_receiptdate, so "commit missed"
    becomes "some line shipped >60 days after the order" — the plan
    shape is identical: a correlated EXISTS that Spark executes as a
    LEFT SEMI hash join on orderkey with the date comparison as the
    join residual, so lineitem is never widened and duplicate matches
    never multiply rows.  The orderdate range prunes orders at the
    scan before the join."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (o.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority"))


@query("q13_customer_distribution", oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts.
    The outer-join predicate (priority filter, standing in for the
    original comment NOT LIKE) lives in the join condition — NOT a
    WHERE after the join, which would silently drop the zero-order
    customers the query exists to count.  Two aggregations: the first
    shuffles on custkey (fact-sized), the second on c_count (tiny).
    COUNT(o_orderkey) counts only matched rows, preserving 0 for
    order-less customers."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (t["customer"].join(
        t["orders"].where(F.col("o_orderpriority") != "1-URGENT"),
        F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query("q15_top_supplier", oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The revenue CTE computes once; the MAX scalar is a 1-row aggregate
    cross-joined back (broadcast, in-plan — no driver-side collect) and
    the equality match runs on the exact DECIMAL sums, so ties are
    bit-exact across engines; the cast to double happens only in the
    output projection.  At 100 TB the CTE is one shuffle on suppkey
    and everything after it is dimension-sized."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem"))
    rev = (t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("__rev_dec")))
    mx = rev.agg(F.max("__rev_dec").alias("__mx"))
    return (rev.join(F.broadcast(mx), F.col("__rev_dec") == F.col("__mx"))
            .join(t["supplier"], F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    F.col("__rev_dec").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey"))


@query("q17_small_quantity_revenue", oracle=f"""
WITH pa AS (
  SELECT l_partkey AS ap,
         SUM({_DEC.format(c='l_quantity')}) AS sq, COUNT(*) AS cq
  FROM lineitem GROUP BY l_partkey)
SELECT round({_sumd(_DEC.format(c='l_extendedprice'))} / 12.0, 4)
         AS avg_yearly,
       COUNT(*) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON ap = l_partkey
WHERE p_brand = 'Brand#12'
  AND {_DEC.format(c='l_quantity')} * 2 * cq < sq""")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand.  The correlated scalar subquery (0.5 · avg qty per part)
    becomes a per-part pre-aggregate joined back to lineitem; the
    threshold comparison is multiplied through to exact decimals
    (qty·2·cnt < Σqty) so no float division sits on the filter
    boundary; the output ratio rounds to 4 decimals because 9 would
    need 16 significant digits at this magnitude — past double
    precision, where the engines' round() implementations diverge by
    one ulp.  The pre-aggregate shuffles on partkey once; the brand
    filter would let Spark semi-prune it at real scale (only ~4% of
    parts are one brand).  /12.0 mirrors the corpus's 12 shipping
    quarters per the date range (original /7.0)."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    pa = (t["lineitem"].groupBy(F.col("l_partkey").alias("ap"))
          .agg(F.sum(_dec("l_quantity")).alias("sq"),
               F.count("*").alias("cq")))
    return (t["lineitem"]
            .join(F.broadcast(t["part"].where(F.col("p_brand") == "Brand#12")),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(pa, F.col("ap") == F.col("l_partkey"))
            .where(_dec("l_quantity") * 2 * F.col("cq") < F.col("sq"))
            .agg(F.round(F.sum(_dec("l_extendedprice")).cast("double")
                         / 12.0, 4).alias("avg_yearly"),
                 F.count("*").alias("n")))


@query("q22_global_sales_opportunity", oracle=f"""
WITH pos AS (
  SELECT SUM({_DEC.format(c='c_acctbal')}) AS sbal, COUNT(*) AS cbal
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_custkey % 10 AS cust_group,
       COUNT(*) AS numcust,
       {_sumd(_DEC.format(c='c_acctbal'))} AS totacctbal
FROM customer, pos
WHERE {_DEC.format(c='c_acctbal')} * cbal > sbal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c_custkey % 10
ORDER BY cust_group""")
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone quiet.  The corpus
    has no c_phone, so the country-code grouping becomes custkey mod
    10, and since every corpus customer has pre-2000 orders, "never
    ordered" becomes "no order since 2000-06-01" — same anti-join plan.
    The global avg-positive-balance threshold is a 1-row aggregate
    broadcast-cross-joined in-plan (no collect), compared multiplied
    through in exact decimals (bal·cnt > Σbal).  The anti join prunes
    the orders side with the date predicate at the scan."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cust = t["customer"].withColumn("__bal", _dec("c_acctbal"))
    pos = (cust.where(F.col("c_acctbal") > 0.0)
           .agg(F.sum("__bal").alias("sbal"), F.count("*").alias("cbal")))
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp"))
    return (cust.join(F.broadcast(pos))
            .where(F.col("__bal") * F.col("cbal") > F.col("sbal"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .groupBy((F.col("c_custkey") % 10).alias("cust_group"))
            .agg(F.count("*").alias("numcust"),
                 F.sum("__bal").cast("double").alias("totacctbal"))
            .orderBy("cust_group"))
