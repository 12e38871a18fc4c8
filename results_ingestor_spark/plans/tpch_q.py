"""TPC-H-shaped relational queries, round 2 breadth (SURVEY §2.4 / M2).

Adapted to the synthetic corpus's columns: the testdata lineitem has no
l_commitdate / l_receiptdate / l_shipmode and there is no partsupp
table.  Q6/Q7/Q10/Q14/Q18/Q19 are directly expressible, with predicates
re-anchored to the corpus's value ranges (shipdates 1995-2001, p_type ∈
{PROMO, ECONOMY, ...}, brands Brand#1..Brand#25, nations
NATION_0..NATION_24).  The rest of the 22 are adapted keeping each
query's plan topology:  Q4's "late commit" EXISTS becomes "shipped >60
days after order"; Q22's phone-prefix becomes custkey mod 10 and "no
orders ever" becomes "no orders since 2000-06-01"; the partsupp
relation (Q2/Q11/Q16/Q20) is derived as the distinct (l_partkey,
l_suppkey) pairs actually traded, with MIN(l_extendedprice) standing in
for ps_supplycost and shipped quantity for ps_availqty; Q9's
ps_supplycost becomes the p_retailprice·quantity cost proxy; Q12's
l_shipmode becomes l_returnflag with "late" as the receipt-lag
stand-in; Q21's "kept orders waiting" uses the same 60-day lateness.

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

from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables

# r10 DECCAST migration (VERDICT r9 "what's wrong" item 1): money
# ingestion is exact.cents()/rev_e4() — floor(x*100 + 0.5) is
# IEEE-identical in both engines for ANY double, where the former
# CAST(x AS DECIMAL(12,2)) was only distribution-safe (2-dp-grid
# corpus) and diverged cross-engine on exact-.xx5-shortest-repr
# doubles (tests/test_round_semantics.py's DECIMAL cast path).  Sums
# run in exact BIGINT 10^-4-dollar units (the supplier_scorecard /
# abc_inventory_classes convention); the emitted dollar double is the
# one terminal rescale CAST(sum AS DOUBLE) / 10000.0, which on-grid
# is bit-identical to the old DECIMAL-sum cast (both are the
# correctly-rounded double of the same exact rational).

_REV_E4 = exact.rev_e4("l_extendedprice", "l_discount")


def _rev_e4() -> F.Column:
    """Discounted line revenue in exact BIGINT 10^-4 dollars."""
    return F.expr(_REV_E4)


def _cents(c: str) -> F.Column:
    """Exact BIGINT cents of a 2-dp money/quantity double column."""
    return F.expr(exact.cents(c))


def _sum_e4_sql(expr: str) -> str:
    """Oracle emission: BIGINT e4 sum rescaled to dollars.  The inner
    BIGINT cast collapses DuckDB's HUGEINT sum widening."""
    return f"CAST(CAST(SUM({expr}) AS BIGINT) AS DOUBLE) / 10000.0"


def _sum_cents_sql(expr: str) -> str:
    """Oracle emission for cents-unit sums (quantities, balances)."""
    return f"CAST(CAST(SUM({expr}) AS BIGINT) AS DOUBLE) / 100.0"


def _sum_e4(col: F.Column) -> F.Column:
    return F.sum(col).cast("long").cast("double") / 10000.0


def _sum_cents(col: F.Column) -> F.Column:
    return F.sum(col).cast("long").cast("double") / 100.0


@query("q6_forecast_revenue", oracle=f"""
SELECT {_sum_e4_sql(exact.cents('l_extendedprice') + ' * ' + exact.cents('l_discount'))} AS revenue,
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
        .agg(_sum_e4(_cents("l_extendedprice") * _cents("l_discount"))
             .alias("revenue"),
             F.count("*").alias("n")))


@query("q7_volume_shipping", oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  year(l_shipdate) AS l_year,
  {_sum_e4_sql(_REV_E4)} AS volume
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
        .agg(_sum_e4(_rev_e4()).alias("volume")))


@query("q10_returned_items", oracle=f"""
SELECT c_custkey, c_name, {_sum_e4_sql(_REV_E4)} AS revenue, c_acctbal, n_name
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
        .agg(_sum_e4(_rev_e4()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"))


@query("q14_promo_revenue", oracle=f"""
SELECT {exact.snap_double(
    "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN " + _REV_E4
    + " ELSE 0 END) AS DOUBLE) / CAST(SUM(" + _REV_E4 + ") AS DOUBLE)",
    9)} AS promo_revenue_pct,
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
    promo = F.when(F.col("p_type") == "PROMO", _rev_e4()) \
             .otherwise(F.lit(0).cast("long"))
    return (
        t["lineitem"].where(
            (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp")))
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(exact.snap_double_col(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(_rev_e4()).cast("double"), 9)
             .alias("promo_revenue_pct"),
             F.count("*").alias("n")))


@query("q18_large_volume_customer", oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM({exact.cents('l_quantity')}) > 25000)
SELECT c_name, c_custkey, o_orderkey,
  CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
  {_sum_cents_sql(exact.cents('l_quantity'))} AS total_qty
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
           .agg(F.sum(_cents("l_quantity")).alias("__q"))
           .where(F.col("__q") > 25000)
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
        .agg(_sum_cents(_cents("l_quantity")).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "orderdate",
                "o_totalprice", "total_qty"))


@query("q19_discounted_revenue", oracle=f"""
SELECT {_sum_e4_sql(_REV_E4)} AS revenue, COUNT(*) AS n
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
        .agg(_sum_e4(_rev_e4()).alias("revenue"),
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
  SELECT l_suppkey AS supplier_no,
    CAST(SUM({_REV_E4}) AS BIGINT) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
  CAST(total_revenue AS DOUBLE) / 10000.0 AS total_revenue
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
        .agg(F.sum(_rev_e4()).cast("long").alias("__rev_e4")))
    mx = rev.agg(F.max("__rev_e4").alias("__mx"))
    return (rev.join(F.broadcast(mx), F.col("__rev_e4") == F.col("__mx"))
            .join(t["supplier"], F.col("s_suppkey") == F.col("supplier_no"))
            .select("s_suppkey", "s_name",
                    (F.col("__rev_e4").cast("double") / 10000.0)
                    .alias("total_revenue"))
            .orderBy("s_suppkey"))


@query("q17_small_quantity_revenue", oracle=f"""
WITH pa AS (
  SELECT l_partkey AS ap,
         CAST(SUM({exact.cents('l_quantity')}) AS BIGINT) AS sq,
         COUNT(*) AS cq
  FROM lineitem GROUP BY l_partkey)
SELECT {exact.snap_double(
    _sum_cents_sql(exact.cents('l_extendedprice')) + " / 12.0", 4)}
         AS avg_yearly,
       COUNT(*) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON ap = l_partkey
WHERE p_brand = 'Brand#12'
  AND {exact.cents('l_quantity')} * 2 * cq < sq""")
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
          .agg(F.sum(_cents("l_quantity")).cast("long").alias("sq"),
               F.count("*").alias("cq")))
    return (t["lineitem"]
            .join(F.broadcast(t["part"].where(F.col("p_brand") == "Brand#12")),
                  F.col("p_partkey") == F.col("l_partkey"))
            .join(pa, F.col("ap") == F.col("l_partkey"))
            .where(_cents("l_quantity") * 2 * F.col("cq") < F.col("sq"))
            .agg(exact.snap_double_col(
                    _sum_cents(_cents("l_extendedprice")) / 12.0, 4)
                 .alias("avg_yearly"),
                 F.count("*").alias("n")))


@query("q22_global_sales_opportunity", oracle=f"""
WITH pos AS (
  SELECT CAST(SUM({exact.cents('c_acctbal')}) AS BIGINT) AS sbal,
         COUNT(*) AS cbal
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_custkey % 10 AS cust_group,
       COUNT(*) AS numcust,
       {_sum_cents_sql(exact.cents('c_acctbal'))} AS totacctbal
FROM customer, pos
WHERE {exact.cents('c_acctbal')} * cbal > sbal
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
    cust = t["customer"].withColumn("__bal", _cents("c_acctbal"))
    pos = (cust.where(F.col("c_acctbal") > 0.0)
           .agg(F.sum("__bal").cast("long").alias("sbal"),
                F.count("*").alias("cbal")))
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("2000-06-01 00:00:00").cast("timestamp"))
    return (cust.join(F.broadcast(pos))
            .where(F.col("__bal") * F.col("cbal") > F.col("sbal"))
            .join(recent, F.col("c_custkey") == F.col("o_custkey"),
                  "left_anti")
            .groupBy((F.col("c_custkey") % 10).alias("cust_group"))
            .agg(F.count("*").alias("numcust"),
                 _sum_cents(F.col("__bal")).alias("totacctbal"))
            .orderBy("cust_group"))


@query("q2_min_cost_supplier", oracle=f"""
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN({exact.cents('l_extendedprice')}) AS cost
  FROM lineitem GROUP BY 1, 2),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
cand AS (
  SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, cost
  FROM part
  JOIN ps ON partkey = p_partkey
  JOIN eu ON suppkey = s_suppkey
  WHERE p_size = 15 AND p_type = 'STANDARD'),
mn AS (SELECT p_partkey AS mk, MIN(cost) AS mincost FROM cand GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(cost AS DOUBLE) / 100.0 AS cost
FROM cand JOIN mn ON p_partkey = mk AND cost = mincost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s)
    offering the minimum cost within one region.  No partsupp table in
    the corpus, so the catalog derives from trade history — cost per
    (part, supplier) = MIN exact-decimal line price — and the
    correlated MIN subquery becomes a per-part pre-aggregate joined
    back on (partkey, cost) with DECIMAL equality (bit-exact tie
    semantics across engines, like q15).  The part filter broadcasts
    into the pre-aggregated catalog; the region-filtered supplier dim
    broadcasts too; the only fact-sized shuffle is the (partkey,
    suppkey) catalog aggregate, which at 100 TB is the table you'd
    materialize once and bucket by partkey."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "part", "supplier", "nation", "region"))
    ps = (t["lineitem"].groupBy(F.col("l_partkey").alias("partkey"),
                                F.col("l_suppkey").alias("suppkey"))
          .agg(F.min(_cents("l_extendedprice")).alias("cost")))
    eu = (t["supplier"]
          .join(F.broadcast(t["nation"]),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    cand = (ps.join(F.broadcast(t["part"].where(
                (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))),
                F.col("partkey") == F.col("p_partkey"))
            .join(F.broadcast(eu), F.col("suppkey") == F.col("s_suppkey"))
            .select("p_partkey", "p_brand", "s_name", "s_acctbal",
                    "n_name", "cost"))
    mn = (cand.groupBy(F.col("p_partkey").alias("mk"))
          .agg(F.min("cost").alias("mincost")))
    return (cand.join(F.broadcast(mn),
                      (F.col("p_partkey") == F.col("mk"))
                      & (F.col("cost") == F.col("mincost")))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                    (F.col("cost").cast("double") / 100.0).alias("cost"))
            .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
                     F.asc("p_partkey"))
            .limit(100))


@query("q8_national_market_share", oracle=f"""
WITH all_nations AS (
  SELECT year(o_orderdate) AS o_year, {_REV_E4} AS volume,
    n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
SELECT o_year,
  {exact.snap_double(
      "CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume"
      " ELSE 0 END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)", 9)}
    AS mkt_share
FROM all_nations GROUP BY o_year ORDER BY o_year""")
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (directly expressible): one nation's share of a
    region's revenue in one part type, by order year.  Supplier,
    customer, part, nation(×2) and region all broadcast; lineitem⋈orders
    is the only shuffled join; the share is a conditional-sum ratio over
    exact decimals with one double division at the end.  The two nation
    roles (customer-side region filter, supplier-side share nation) use
    separate broadcast aliases, as in q7."""
    t = load_tables(spark, sf_dir, ("part", "lineitem", "supplier",
                                    "orders", "customer", "nation", "region"))
    n1 = (t["nation"]
          .join(F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select(F.col("n_nationkey").alias("n1_key")))
    n2 = t["nation"].select(F.col("n_nationkey").alias("n2_key"),
                            F.col("n_name").alias("nation"))
    vol = F.when(F.col("nation") == "NATION_3", _rev_e4()) \
           .otherwise(F.lit(0).cast("long"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_type") == "PROMO")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"].where(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"),
              "inner")
        .join(F.broadcast(t["supplier"]),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(exact.snap_double_col(
                F.sum(vol).cast("double")
                / F.sum(_rev_e4()).cast("double"), 9).alias("mkt_share"))
        .orderBy("o_year"))


@query("q9_product_type_profit", oracle=f"""
SELECT nation, o_year,
  CAST(CAST(SUM(amount) AS BIGINT) AS DOUBLE) / 10000.0 AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
    {_REV_E4} - {exact.cents('p_retailprice')}
      * {exact.cents('l_quantity')} AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC""")
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product family by supplier nation
    and year.  No ps_supplycost in the corpus, so cost = retail price ·
    quantity (part-side proxy) — same expression topology: revenue
    minus a cost term sourced from a joined dim, all exact DECIMAL
    until the final output cast.  part (name-filtered) and supplier /
    nation broadcast; lineitem⋈orders is the one shuffle; the contains-
    match on p_name lands at the part scan, pruning the broadcast."""
    t = load_tables(spark, sf_dir,
                    ("part", "lineitem", "supplier", "orders", "nation"))
    amount = (_rev_e4() - _cents("p_retailprice") * _cents("l_quantity"))
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"].where(F.col("p_name").contains("widget"))),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["supplier"]),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t["nation"]),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(_sum_e4(amount).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year")))


@query("q11_important_stock", oracle=f"""
WITH val AS (
  SELECT l_partkey AS partkey,
    CAST(SUM({exact.cents('l_extendedprice')}) AS BIGINT) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey),
tot AS (SELECT CAST(SUM(value) AS BIGINT) AS total FROM val)
SELECT partkey, CAST(value AS DOUBLE) / 100.0 AS value
FROM val, tot
WHERE value * 1000 > total
ORDER BY value DESC, partkey""")
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through one region's
    suppliers exceeds a fraction of the total.  The HAVING-against-a-
    global-scalar becomes a 1-row aggregate broadcast-cross-joined
    in-plan (no collect), and the 0.1 % threshold is multiplied through
    to exact decimals (value·1000 > total) so no float division sits on
    the filter boundary — the q17/q22 determinism rule.  One shuffle
    (partkey agg); supplier/nation/region broadcast into the scan."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "supplier", "nation", "region"))
    eu = (t["supplier"]
          .join(F.broadcast(t["nation"]),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey"))
    val = (t["lineitem"]
           .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
           .groupBy(F.col("l_partkey").alias("partkey"))
           .agg(F.sum(_cents("l_extendedprice")).cast("long")
                .alias("value")))
    tot = val.agg(F.sum("value").cast("long").alias("total"))
    return (val.join(F.broadcast(tot))
            .where(F.col("value") * 1000 > F.col("total"))
            .select("partkey",
                    (F.col("value").cast("double") / 100.0).alias("value"))
            .orderBy(F.desc("value"), F.asc("partkey")))


@query("q12_late_lines_by_class", oracle="""
SELECT l_returnflag AS line_class,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag ORDER BY l_returnflag""")
def q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of late shipments by line class.
    No l_shipmode / commit-receipt dates in the corpus: l_returnflag
    carries the low-cardinality grouping role and "late" is the 60-day
    ship lag, keeping Q12's signature — a join whose WHERE references
    BOTH sides (ship vs order date), then dual conditional counts.
    The date-range predicate prunes orders at the scan; the lag
    predicate is the join residual; one shuffle for the 3-group agg
    with map-side partials."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"].where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate")
               > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
             .alias("high_line_count"),
             F.sum(F.when(hi, 0).otherwise(1)).cast("long")
             .alias("low_line_count"))
        .orderBy("line_class"))


@query("q16_supplier_part_counts", oracle="""
SELECT p_brand, p_type, p_size,
  CAST(COUNT(DISTINCT suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
      FROM lineitem) ps
JOIN part ON p_partkey = partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND suppkey NOT IN (SELECT s_suppkey FROM supplier
                      WHERE s_suppkey % 17 = 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each part profile,
    excluding a blacklist.  The partsupp relation derives from trade
    history (distinct partkey/suppkey pairs — one fact-sized
    distinct); the complaints NOT IN becomes a key-mod blacklist
    executed as a broadcast anti join (NULL-free key, so NOT IN ≡
    anti).  The triple-negative part filter broadcasts; COUNT(DISTINCT)
    shuffles once on the 3-attr group key."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    ps = (t["lineitem"]
          .select(F.col("l_partkey").alias("partkey"),
                  F.col("l_suppkey").alias("suppkey"))
          .distinct())
    bad = t["supplier"].where(F.col("s_suppkey") % 17 == 0) \
                       .select("s_suppkey")
    pf = t["part"].where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    return (ps.join(F.broadcast(bad),
                    F.col("suppkey") == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(pf), F.col("partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"),
                     F.asc("p_type"), F.asc("p_size")))


@query("q20_part_promotion_suppliers", oracle=f"""
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         CAST(SUM({exact.cents('l_quantity')}) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2),
red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
ptot AS (SELECT partkey, CAST(SUM(qty) AS BIGINT) AS total_qty
        FROM ps GROUP BY 1),
dominant AS (
  SELECT DISTINCT suppkey FROM ps
  JOIN red ON partkey = p_partkey
  JOIN ptot USING (partkey)
  WHERE qty * 4 > total_qty)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND s_suppkey IN (SELECT suppkey FROM dominant)
ORDER BY s_name""")
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant position in a part
    family — the nested IN (IN (...)) query.  ps_availqty doesn't
    exist, so "excess stock" becomes "shipped >25 % of the part's 1996
    volume", multiplied through to exact decimals (qty·4 > total).
    Plan: one (partkey, suppkey) aggregate; its per-part total derives
    from a second tiny rollup OF THE AGGREGATE (not a second fact
    scan); the red-parts filter broadcasts; the dominant-supplier set
    semi-joins into the region-filtered supplier dim."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "part", "supplier", "nation", "region"))
    ps = (t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
        .groupBy(F.col("l_partkey").alias("partkey"),
                 F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(_cents("l_quantity")).cast("long").alias("qty")))
    red = t["part"].where(F.col("p_name").startswith("red")) \
                   .select("p_partkey")
    ptot = ps.groupBy(F.col("partkey").alias("tk")) \
             .agg(F.sum("qty").cast("long").alias("total_qty"))
    dominant = (ps.join(F.broadcast(red),
                        F.col("partkey") == F.col("p_partkey"))
                .join(ptot, F.col("partkey") == F.col("tk"))
                .where(F.col("qty") * 4 > F.col("total_qty"))
                .select("suppkey").distinct())
    return (t["supplier"]
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .join(dominant, F.col("s_suppkey") == F.col("suppkey"),
                  "left_semi")
            .select("s_name", "n_name")
            .orderBy("s_name"))


@query("q21_suppliers_kept_waiting", oracle="""
WITH fl AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F')
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM fl l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND l1.late
  AND EXISTS (SELECT 1 FROM fl l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM fl l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100""")
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier hunt — the hardest
    correlated query in the suite (EXISTS + NOT EXISTS against the same
    fact under different residuals).  "Late" is the 60-day ship lag
    (no commit/receipt dates).  Plan: the F-order line set computes
    once and feeds all three roles; the EXISTS is a LEFT SEMI join on
    orderkey with a suppkey<>suppkey residual, the NOT EXISTS a LEFT
    ANTI with the extra late residual — no row multiplication, two
    co-keyed shuffles on orderkey that AQE can chain without
    re-exchange; supplier/nation/region broadcast."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "orders", "supplier", "nation", "region"))
    fl = (t["lineitem"]
          .join(t["orders"].where(F.col("o_orderstatus") == "F")
                .select("o_orderkey", "o_orderdate"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                  .alias("late")))
    eu = (t["supplier"]
          .join(F.broadcast(t["nation"]),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name"))
    l1 = (fl.where(F.col("late"))
          .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")))
    l2 = fl.select(F.col("l_orderkey").alias("k2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = fl.where(F.col("late")).select(F.col("l_orderkey").alias("k3"),
                                        F.col("l_suppkey").alias("s3"))
    return (l1.join(l2, (F.col("l_orderkey") == F.col("k2"))
                    & (F.col("l_suppkey") != F.col("s2")), "left_semi")
            .join(l3, (F.col("l_orderkey") == F.col("k3"))
                  & (F.col("l_suppkey") != F.col("s3")), "left_anti")
            .groupBy("s_name")
            .agg(F.count("*").cast("long").alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(100))


@query("supplier_scorecard", oracle=f"""
WITH m AS (
  SELECT l_suppkey,
    CAST(SUM({exact.rev_e4('l_extendedprice', 'l_discount')})
         AS BIGINT) AS rev,
    COUNT(DISTINCT l_partkey) AS n_parts,
    COUNT(*) AS n_lines,
    SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS n_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_suppkey)
SELECT s_name, n_name,
  CAST(rev AS DOUBLE) / 10000.0 AS revenue,
  CAST(n_parts AS BIGINT) AS n_parts,
  CAST(floor((CAST(n_late AS DOUBLE) / n_lines) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS late_rate,
  CAST(rank() OVER (ORDER BY rev DESC, s_name) AS INT) AS revenue_rank
FROM m
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
ORDER BY revenue_rank""")
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide KPI scorecard per supplier: revenue, breadth (distinct
    parts), late-shipment rate, global revenue rank — the multi-metric
    dashboard query that joins two facts, aggregates once, decorates
    with dims, and ranks.  One fact shuffle (suppkey agg with
    count-distinct), dims broadcast, and the rank window runs over the
    supplier-sized aggregate (tiny), ordered on the exact DECIMAL
    revenue with s_name tie-break so rank assignment is bit-stable."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier",
                                    "nation"))
    late = F.when(F.col("l_shipdate")
                  > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                  1).otherwise(0)
    m = (t["lineitem"]
         .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("l_suppkey")
         .agg(F.sum(F.expr(exact.rev_e4("l_extendedprice",
                                        "l_discount")))
              .cast("long").alias("rev"),
              F.countDistinct("l_partkey").alias("n_parts"),
              F.count("*").alias("n_lines"),
              F.sum(late).alias("n_late")))
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("rev"), F.asc("s_name"))
    return (m.join(F.broadcast(t["supplier"]),
                   F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(t["nation"]),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_name", "n_name", "rev", "n_parts", "n_late",
                    "n_lines")
            .withColumn("revenue_rank", F.rank().over(w).cast("int"))
            .select("s_name", "n_name",
                    (F.col("rev").cast("double") / 10000.0)
                    .alias("revenue"),
                    F.col("n_parts").cast("long").alias("n_parts"),
                    exact.snap_double_col(F.col("n_late").cast("double") / F.col("n_lines"), 9).alias("late_rate"),
                    "revenue_rank")
            .orderBy("revenue_rank"))
