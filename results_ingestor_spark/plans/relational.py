"""Generic relational operator surface (SURVEY §2.4 / M2).

Every Spark built-in family the engine exposes, each as a queries()
entry with a DuckDB oracle twin.  Cross-engine determinism rules used
throughout (and mirrored in each oracle):

* Money/quantity doubles ingest as exact BIGINT cents via
  exact.cents() — floor(x*100+0.5), IEEE-identical in both engines
  for ANY double — and aggregate as exact integer sums, cast back to
  DOUBLE once at the end.  Never sum raw doubles (partial-sum order
  would make the value nondeterministic).
* avg = CAST(exact decimal sum AS DOUBLE) / count — one double
  division, identical bits in both engines.
* Every top-k / window ordering carries a unique tie-break key.
* Timestamps are grouped/emitted via date_trunc or DATE casts (session
  timezone pinned UTC to match DuckDB's naive timestamps).

Scale notes are on each query: what shuffles, what broadcasts, what
prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables

# r11 DECCAST migration (VERDICT r10 item 1): 2-dp ingestion is
# exact.cents() BIGINT — floor(x*100 + 0.5) is IEEE-identical in both
# engines for ANY double, where the former CAST(x AS DECIMAL(12,2))
# was only distribution-safe (2-dp-grid corpus).  Sums run in exact
# integer cents (e2) / cents-squared (e4) units with one terminal
# CAST(sum AS DOUBLE) rescale, which on-grid is bit-identical to the
# old DECIMAL-sum cast (both are the correctly-rounded double of the
# same exact rational).
_REV_E4 = exact.rev_e4("l_extendedprice", "l_discount")


def _sum_cents_sql(col: str) -> str:
    """Oracle emission: exact cents sum rescaled to base units."""
    return f"CAST(SUM({exact.cents(col)}) AS DOUBLE) / 100.0"


def _sum_cents(col: str) -> F.Column:
    """Spark twin of _sum_cents_sql."""
    return F.sum(F.expr(exact.cents(col))).cast("double") / 100.0


# ---------------------------------------------------------------- scans/aggs

@query("q1_pricing_summary", oracle=f"""
SELECT l_returnflag, l_linestatus,
  {_sum_cents_sql('l_quantity')} AS sum_qty,
  CAST(SUM({exact.cents('l_extendedprice')}) AS DOUBLE) / 100.0
    AS sum_base_price,
  CAST(SUM({exact.rev_e4('l_extendedprice', 'l_discount')}) AS DOUBLE)
    / 10000.0 AS sum_disc_price,
  CAST(SUM({exact.rev_e4('l_extendedprice', 'l_discount')}
           * (100 + {exact.cents('l_tax')})) AS DOUBLE)
    / 1000000.0 AS sum_charge,
  CAST(SUM({exact.cents('l_quantity')}) AS DOUBLE)
    / (100.0 * COUNT(*)) AS avg_qty,
  CAST(SUM({exact.cents('l_extendedprice')}) AS DOUBLE)
    / (100.0 * COUNT(*)) AS avg_price,
  CAST(SUM({exact.cents('l_discount')}) AS DOUBLE)
    / (100.0 * COUNT(*)) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '2000-09-03 00:00:00'
GROUP BY l_returnflag, l_linestatus""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: predicate pushed to the parquet scan, partial+final
    hash agg on two low-cardinality keys — the canonical map-side-combine
    plan; shuffle carries 4 groups × 8 aggregates, not rows."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.where(F.col("l_shipdate") < F.lit("2000-09-03 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_cents("l_quantity").alias("sum_qty"),
            _sum_cents("l_extendedprice").alias("sum_base_price"),
            (F.sum(F.expr(exact.rev_e4("l_extendedprice", "l_discount")))
             .cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(F.expr(
                f"{exact.rev_e4('l_extendedprice', 'l_discount')}"
                f" * (100 + {exact.cents('l_tax')})"))
             .cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(F.expr(exact.cents("l_quantity"))).cast("double")
             / (100.0 * F.count("*"))).alias("avg_qty"),
            (F.sum(F.expr(exact.cents("l_extendedprice"))).cast("double")
             / (100.0 * F.count("*"))).alias("avg_price"),
            (F.sum(F.expr(exact.cents("l_discount"))).cast("double")
             / (100.0 * F.count("*"))).alias("avg_disc"),
            F.count("*").alias("count_order"),
        ))


@query("q3_shipping_priority", oracle=f"""
SELECT l_orderkey,
  CAST(SUM({_REV_E4}) AS DOUBLE) / 10000.0 AS revenue,
  CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate >= TIMESTAMP '1996-03-16 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter (customer) broadcast into the
    fact join, group, then global top-k (revenue DESC, unique tie-break).
    TakeOrderedAndProject keeps the top-k out of a full sort at scale."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .where(F.col("l_shipdate") >= F.lit("1996-03-16 00:00:00").cast("timestamp"))
        .join(t["orders"].where(
            F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey",
                 F.col("o_orderdate").cast("date").alias("orderdate"),
                 "o_orderpriority")
        .agg((F.sum(F.expr(_REV_E4)).cast("double") / 10000.0)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority"))


@query("q5_local_supplier_volume", oracle=f"""
SELECT n_name,
  CAST(SUM({_REV_E4}) AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name""")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with two broadcast dims (supplier,
    nation⋈region) and one shuffled fact-fact join (lineitem⋈orders).
    The c_nationkey = s_nationkey cross-dimension predicate is applied
    post-join; Catalyst reorders the join tree by size."""
    t = load_tables(spark, sf_dir,
                    ("lineitem", "orders", "supplier", "customer",
                     "nation", "region"))
    nr = (t["nation"].join(F.broadcast(t["region"]),
                           F.col("n_regionkey") == F.col("r_regionkey"))
          .where(F.col("r_name") == "ASIA"))
    return (
        t["lineitem"]
        .join(t["orders"].where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["customer"],
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg((F.sum(F.expr(_REV_E4)).cast("double") / 10000.0)
             .alias("revenue")))


# ---------------------------------------------------------------- joins

@query("join_broadcast_dims", oracle="""
SELECT n_nationkey, n_name, r_name
FROM nation JOIN region ON n_regionkey = r_regionkey""")
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join — no shuffle; the pattern every dim join at
    100 TB should take."""
    t = load_tables(spark, sf_dir, ("nation", "region"))
    return (t["nation"]
            .join(F.broadcast(t["region"]),
                  F.col("n_regionkey") == F.col("r_regionkey"))
            .select("n_nationkey", "n_name", "r_name"))


@query("join_left_outer", oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey""")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (COUNT(col) skips
    the NULLs the outer side introduces)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (t["customer"]
            .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("n_orders")))


@query("join_semi", oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderstatus = 'F')""")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): probe side streams, no row duplication —
    the scalable form of 'IN (subquery)'."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (t["customer"]
            .join(t["orders"].where(F.col("o_orderstatus") == "F"),
                  F.col("c_custkey") == F.col("o_custkey"), "left_semi")
            .select("c_custkey", "c_name"))


@query("join_anti", oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 300000)""")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — null-safe by construction, unlike
    NOT IN over a nullable column."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (t["customer"]
            .join(t["orders"].where(F.col("o_totalprice") > 300000),
                  F.col("c_custkey") == F.col("o_custkey"), "left_anti")
            .select("c_custkey", "c_name"))


@query("join_theta_range", oracle="""
SELECT c_custkey, o_orderkey
FROM orders JOIN customer
  ON o_custkey = c_custkey AND o_totalprice > c_acctbal * 10
WHERE o_orderstatus = 'O'""")
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an additional theta (range) predicate — the
    inequality evaluates post-match, keeping the hash join; a pure theta
    join would degrade to BNLJ, which this plan avoids."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (t["orders"].where(F.col("o_orderstatus") == "O")
            .join(t["customer"],
                  (F.col("o_custkey") == F.col("c_custkey"))
                  & (F.col("o_totalprice") > F.col("c_acctbal") * 10))
            .select("c_custkey", "o_orderkey"))


# ---------------------------------------------------------------- sort/set/distinct

@query("topk_expensive_orders", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (t["orders"]
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(25)
            .select("o_orderkey", "o_custkey", "o_totalprice"))


@query("distinct_segments", oracle="SELECT DISTINCT c_mktsegment FROM customer")
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].select("c_mktsegment").distinct()


@query("setop_intersect", oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return (o.where(F.col("o_orderstatus") == "F").select("o_custkey")
            .intersect(o.where(F.col("o_orderstatus") == "O").select("o_custkey")))


@query("setop_except", oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    # subtract = set EXCEPT (exceptAll would keep keys whose left
    # multiplicity exceeds the right — different semantics)
    return (o.where(F.col("o_orderstatus") == "O").select("o_custkey")
            .subtract(o.where(F.col("o_orderstatus") == "F").select("o_custkey")))


@query("union_by_name", oracle="""
SELECT k, src FROM (
  SELECT c_custkey AS k, 'customer' AS src FROM customer
  UNION ALL
  SELECT s_suppkey AS k, 'supplier' AS src FROM supplier)""")
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName — the engine's vertical-concat (#5), zero-shuffle."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].select(F.col("c_custkey").alias("k"),
                             F.lit("customer").alias("src"))
    b = t["supplier"].select(F.lit("supplier").alias("src"),
                             F.col("s_suppkey").alias("k"))
    return a.unionByName(b)


# ---------------------------------------------------------------- grouping sets

@query("rollup_returnflag_status", oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  {_sum_cents_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")
def rollup_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — Catalyst expands to one Expand + hash-agg
    (single shuffle for all grouping levels)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (t["lineitem"].rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 _sum_cents("l_quantity").alias("sum_qty")))


@query("cube_status_priority", oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""")
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (t["orders"].cube("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n")))


@query("grouping_sets_mixed", oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")


# ---------------------------------------------------------------- distinct aggs

@query("count_distinct_nations", oracle="""
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
  COUNT(*) AS n_customers
FROM customer GROUP BY c_mktsegment""")
def count_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation — Catalyst plans the two-phase
    Expand/partial-distinct strategy automatically."""
    t = load_tables(spark, sf_dir, ("customer",))
    return (t["customer"].groupBy("c_mktsegment")
            .agg(F.countDistinct("c_nationkey").alias("n_nations"),
                 F.count("*").alias("n_customers")))


# ---------------------------------------------------------------- scalar funcs

@query("string_functions", oracle="""
SELECT p_partkey,
  upper(p_name) AS name_upper,
  length(p_name) AS name_len,
  substr(p_type, 1, 6) AS type_prefix,
  concat_ws('/', p_brand, p_type) AS brand_type,
  replace(p_name, ' ', '_') AS name_snake,
  levenshtein(p_brand, 'BRAND_1') AS brand_dist,
  regexp_extract(p_type, '^([A-Za-z]+)', 1) AS type_head,
  trim(p_name) AS name_trim,
  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part""")
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface (#upper/#rsplit parity family) — all
    whole-stage-codegen built-ins."""
    t = load_tables(spark, sf_dir, ("part",))
    return t["part"].select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.levenshtein("p_brand", F.lit("BRAND_1")).alias("brand_dist"),
        F.regexp_extract("p_type", r"^([A-Za-z]+)", 1).alias("type_head"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query("date_functions", oracle="""
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) AS d,
  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dom,
  CAST(o_orderdate AS DATE) + 30 AS d_plus30,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
  dayofweek(CAST(o_orderdate AS DATE)) AS dow
FROM orders""")
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    d = F.col("o_orderdate").cast("date")
    return t["orders"].select(
        "o_orderkey",
        d.alias("d"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(d, 30).alias("d_plus30"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
        (F.dayofweek(d) - 1).alias("dow"),  # Spark Sun=1 → DuckDB Sun=0
    )


@query("math_functions", oracle="""
SELECT o_orderkey,
  abs(o_totalprice - 100000) AS abs_diff,
  CAST(floor((o_totalprice) * 10.0 + 0.5) AS BIGINT) / CAST(10.0 AS DOUBLE) AS rounded,
  floor(o_totalprice) AS floored,
  ceil(o_totalprice) AS ceiled,
  CAST(floor(sqrt(o_totalprice) * 100000000.0 + 0.5) AS BIGINT)
    / 100000000.0 AS sq,
  CAST(o_orderkey % 7 AS BIGINT) AS mod7,
  CAST(sign(o_totalprice - 100000) AS INTEGER) AS sgn,
  greatest(o_totalprice, 100000.0) AS gt, least(o_totalprice, 100000.0) AS lt
FROM orders""")
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    p = F.col("o_totalprice")
    return t["orders"].select(
        "o_orderkey",
        F.abs(p - 100000).alias("abs_diff"),
        exact.snap_double_col(p, 1).alias("rounded"),
        # Spark floor/ceil return LONG and signum DOUBLE; DuckDB returns
        # DOUBLE/DOUBLE/TINYINT — cast both sides to one wire type so the
        # driver's value-hash (which distinguishes types) agrees.
        F.floor(p).cast("double").alias("floored"),
        F.ceil(p).cast("double").alias("ceiled"),
        # r9 draw-4 sf0.1 lottery finding (1 row in 150,000): the
        # former CAST(floor((sqrt(p)) * 100000000.0 + 0.5) AS BIGINT) / CAST(100000000.0 AS DOUBLE) hit a .5-boundary straddle on an
        # off-grid price (sqrt ~705.568230895: Spark repr-HALF_UP
        # ...089 vs DuckDB binary-scale ...090 — the pinned
        # round() divergence class).  sqrt itself is bit-exact
        # cross-engine (IEEE correct rounding, test_libm_agreement);
        # the snap device floor(x*1e8 + 0.5)/1e8 is the shared-IEEE
        # round()-free replacement (exact.snap_double semantics,
        # inlined because this oracle predates plans/exact.py).
        (F.floor(F.sqrt(p) * 100000000.0 + F.lit(0.5)).cast("bigint")
         / 100000000.0).alias("sq"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.signum(p - 100000).cast("int").alias("sgn"),
        F.greatest(p, F.lit(100000.0)).alias("gt"),
        F.least(p, F.lit(100000.0)).alias("lt"),
    )


@query("case_when_bucketing", oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS bucket,
  COUNT(*) AS n
FROM orders GROUP BY 1""")
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    bucket = (F.when(F.col("o_totalprice") < 50000, "small")
              .when(F.col("o_totalprice") < 150000, "medium")
              .otherwise("large"))
    return (t["orders"].groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("n")))


@query("pivot_status_by_priority", oracle="""
SELECT o_orderpriority,
  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders GROUP BY o_orderpriority""")
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit values (no extra pass to discover them) —
    compiles to conditional aggregation, single shuffle."""
    t = load_tables(spark, sf_dir, ("orders",))
    out = (t["orders"].groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["F", "O", "P"])
           .agg(F.count(F.lit(1))))
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("status_F"),
        F.coalesce("O", F.lit(0)).alias("status_O"),
        F.coalesce("P", F.lit(0)).alias("status_P"))


@query("setop_intersect_all", oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""")
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics INTERSECT ALL: multiplicity = min of the two sides'
    counts per key (the multiset algebra the set form collapses)."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return (o.where(F.col("o_orderstatus") == "F").select("o_custkey")
            .intersectAll(o.where(F.col("o_orderstatus") == "O")
                          .select("o_custkey")))


@query("setop_except_all", oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""")
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL: left multiplicity minus right
    multiplicity per key, floored at zero."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return (o.where(F.col("o_orderstatus") == "O").select("o_custkey")
            .exceptAll(o.where(F.col("o_orderstatus") == "F")
                       .select("o_custkey")))


@query("events_value_dispersion", oracle=f"""
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
    CAST(SUM({exact.cents('value')}) AS BIGINT) AS s,
    CAST(SUM({exact.cents('value')} * {exact.cents('value')}) AS BIGINT) AS q
  FROM events GROUP BY event_type)
SELECT event_type, n,
  CAST(floor((CAST(s AS DOUBLE) / 100.0 / n) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS mean_value,
  CAST(floor(((CAST(q AS DOUBLE) / 10000.0 - CAST(s AS DOUBLE) / 100.0 * (CAST(s AS DOUBLE) / 100.0) / n) / (n - 1)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS var_samp,
  CAST(floor((sqrt((CAST(q AS DOUBLE) / 10000.0 - CAST(s AS DOUBLE) / 100.0 * (CAST(s AS DOUBLE) / 100.0) / n) / (n - 1))) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS stddev_samp
FROM m""")
def events_value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion statistics with cross-engine determinism: built-in
    var_samp/stddev over doubles is partial-sum-order dependent, so
    the moments Σx and Σx² are accumulated as exact BIGINT cents /
    cents² (r11 DECCAST migration — floor(x*100+0.5) is IEEE-exact for
    ANY double, where the former DECIMAL(12,2) cast was only
    2-dp-grid-safe) and the variance assembled in one fixed-order
    double expression — same map-side-combine plan as any hash agg,
    exact same bits in any engine."""
    t = load_tables(spark, sf_dir, ("events",))
    c = F.expr(exact.cents("value"))
    m = (t["events"].groupBy("event_type")
         .agg(F.count("*").alias("n"), F.sum(c).alias("s"),
              F.sum(c * c).alias("q")))
    sd = F.col("s").cast("double") / 100.0
    qd = F.col("q").cast("double") / 10000.0
    var = (qd - sd * sd / F.col("n")) / (F.col("n") - 1)
    return m.select("event_type", "n",
                    exact.snap_double_col(sd / F.col("n"), 9).alias("mean_value"),
                    exact.snap_double_col(var, 9).alias("var_samp"),
                    exact.snap_double_col(F.sqrt(var), 9).alias("stddev_samp"))


@query("lineitem_price_qty_corr", oracle=f"""
WITH m AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM({exact.cents('l_quantity')}) AS BIGINT) AS sx,
    CAST(SUM({exact.cents('l_extendedprice')}) AS BIGINT) AS sy,
    CAST(SUM({exact.cents('l_quantity')}
        * {exact.cents('l_extendedprice')}) AS BIGINT) AS sxy,
    CAST(SUM({exact.cents('l_quantity')}
        * {exact.cents('l_quantity')}) AS BIGINT) AS sxx,
    CAST(SUM({exact.cents('l_extendedprice')}
        * {exact.cents('l_extendedprice')}) AS BIGINT) AS syy
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n,
  CAST(floor(((n * (CAST(sxy AS DOUBLE) / 10000.0) - CAST(sx AS DOUBLE) / 100.0 * (CAST(sy AS DOUBLE) / 100.0)) / (sqrt(n * (CAST(sxx AS DOUBLE) / 10000.0) - CAST(sx AS DOUBLE) / 100.0 * (CAST(sx AS DOUBLE) / 100.0)) * sqrt(n * (CAST(syy AS DOUBLE) / 10000.0) - CAST(sy AS DOUBLE) / 100.0 * (CAST(sy AS DOUBLE) / 100.0)))) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS corr_qty_price
FROM m""")
def lineitem_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact integer moments (Σx, Σy, Σxy,
    Σx², Σy² in cents / cents² units — r11 DECCAST migration, IEEE-
    exact for any double where the former DECIMAL casts were only
    2-dp-grid-safe) — the five-sum single-pass formulation every
    engine parallelizes as one hash agg; doubles enter only in the
    final fixed-order assembly, so the value is engine-identical to
    the last bit before the 9dp round."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    cx = F.expr(exact.cents("l_quantity"))
    cy = F.expr(exact.cents("l_extendedprice"))
    m = (t["lineitem"].groupBy("l_returnflag")
         .agg(F.count("*").alias("n"), F.sum(cx).alias("sx"),
              F.sum(cy).alias("sy"), F.sum(cx * cy).alias("sxy"),
              F.sum(cx * cx).alias("sxx"), F.sum(cy * cy).alias("syy")))
    n = F.col("n")
    sx = F.col("sx").cast("double") / 100.0
    sy = F.col("sy").cast("double") / 100.0
    sxy = F.col("sxy").cast("double") / 10000.0
    sxx = F.col("sxx").cast("double") / 10000.0
    syy = F.col("syy").cast("double") / 10000.0
    corr = ((n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)))
    return m.select("l_returnflag", "n",
                    exact.snap_double_col(corr, 9).alias("corr_qty_price"))


@query("agg_argminmax_conditional", oracle="""
WITH agg AS (
  SELECT o_orderstatus,
    CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
    CAST(floor((max(o_totalprice)) * 100.0 + 0.5) AS BIGINT) / CAST(100.0 AS DOUBLE) AS max_price,
    CAST(floor((min(o_totalprice)) * 100.0 + 0.5) AS BIGINT) / CAST(100.0 AS DOUBLE) AS min_price
  FROM orders GROUP BY o_orderstatus),
hi AS (
  SELECT o_orderstatus, o_orderkey AS priciest_order FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn FROM orders)
  WHERE rn = 1),
lo AS (
  SELECT o_orderstatus, o_orderkey AS cheapest_order FROM (
    SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn FROM orders)
  WHERE rn = 1)
SELECT agg.o_orderstatus, n_big, priciest_order, cheapest_order,
       max_price, min_price
FROM agg JOIN hi USING (o_orderstatus) JOIN lo USING (o_orderstatus)""")
def agg_argminmax_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max/arg-min and conditional-count aggregates (max_by /
    min_by / count_if): 'which order was the priciest per status' —
    the lookup-free alternative to a groupBy + self-join-back.  The
    struct(price, key) comparator makes ties deterministic (max_by →
    larger key, min_by → smaller key); DuckDB's arg_max takes only
    scalar comparators, so the oracle replays the same rule as
    windowed row_number picks — one hash agg in Spark either way."""
    t = load_tables(spark, sf_dir, ("orders",))
    by = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (t["orders"].groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.max_by("o_orderkey", by).alias("priciest_order"),
        F.min_by("o_orderkey", by).alias("cheapest_order"),
        exact.snap_double_col(F.max("o_totalprice"), 2).alias("max_price"),
        exact.snap_double_col(F.min("o_totalprice"), 2).alias("min_price")))


@query("pct_of_parent_revenue", oracle=f"""
WITH rev AS (
  SELECT r_name AS region, n_name AS nation,
    CAST(SUM({exact.cents('o_totalprice')}) AS DOUBLE) / 100.0 AS revenue
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name)
SELECT region, nation, revenue,
  CAST(floor((revenue / SUM(revenue) OVER (PARTITION BY region)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS pct_of_region,
  CAST(floor((revenue / SUM(revenue) OVER ()) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS pct_of_total
FROM rev""")
def pct_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent along the region→nation hierarchy: one
    fact aggregate, then two window shares (region parent, grand
    total) over the tiny aggregate — the OLAP "contribution" pattern.
    The shares divide doubles both engines derived from the same
    exact-decimal sums, so 9 dp rounding is bit-stable."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation", "region"))
    rev = (t["orders"]
           .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(t["nation"]),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(t["region"]),
                 F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
           .agg((F.sum(F.expr(exact.cents("o_totalprice")))
                 .cast("double") / 100.0).alias("revenue")))
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region", "nation", "revenue",
        exact.snap_double_col(F.col("revenue") / F.sum("revenue").over(w_region), 9)
        .alias("pct_of_region"),
        exact.snap_double_col(F.col("revenue") / F.sum("revenue").over(w_all), 9)
        .alias("pct_of_total"))


@query("revenue_concentration_metrics", oracle=f"""
WITH cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
    CAST(SUM({exact.cents('o.o_totalprice')}) AS BIGINT) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2),
ranked AS (
  SELECT segment, rev,
    CAST(row_number() OVER (PARTITION BY segment
                            ORDER BY rev, o_custkey) AS BIGINT) AS i,
    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n,
    CAST(ntile(10) OVER (PARTITION BY segment
                         ORDER BY rev, o_custkey) AS BIGINT) AS decile
  FROM cust)
SELECT segment,
  CAST(MAX(n) AS BIGINT) AS n_customers,
  CAST(floor(((2.0 * CAST(SUM(i * (CAST(rev AS DOUBLE) / 100.0)) AS DOUBLE)) / (MAX(n) * CAST(SUM(CAST(rev AS DOUBLE) / 100.0) AS DOUBLE)) - (MAX(n) + 1.0) / MAX(n)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS gini,
  CAST(floor((CAST(SUM(CAST(rev AS DOUBLE) / 100.0 * (CAST(rev AS DOUBLE) / 100.0)) AS DOUBLE) / (CAST(SUM(CAST(rev AS DOUBLE) / 100.0) AS DOUBLE) * CAST(SUM(CAST(rev AS DOUBLE) / 100.0) AS DOUBLE))) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS hhi,
  CAST(floor((CAST(SUM(CASE WHEN decile = 10 THEN CAST(rev AS DOUBLE) / 100.0 ELSE 0.0 END) AS DOUBLE) / CAST(SUM(CAST(rev AS DOUBLE) / 100.0) AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS top_decile_share
FROM ranked GROUP BY segment ORDER BY segment""")
def revenue_concentration_metrics(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Customer-revenue concentration per market segment, three
    standard lenses at once: Gini (Lorenz inequality, rank-weighted
    closed form G = 2Σi·xᵢ/(n·Σx) − (n+1)/n over ascending revenue),
    normalized HHI (Σx²/(Σx)² — the antitrust yardstick), and the
    top-decile share.  Ties rank by custkey for a deterministic Lorenz
    order.  Per-customer revenue accumulates as exact BIGINT cents
    (r11 DECCAST migration); doubles enter only in the final
    fixed-order assembly.

    Scale: the customer layer is dimension-sized, so the per-segment
    windows run over an aggregate, not facts (the RFM contract); the
    fact scan contributes one keyed hash-agg."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    cust = (t["orders"]
            .join(F.broadcast(t["customer"]
                              .select("c_custkey", "c_mktsegment")),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
            .agg(F.sum(F.expr(exact.cents("o_totalprice")))
                 .cast("long").alias("rev")))
    ws = Window.partitionBy("segment").orderBy("rev", "o_custkey")
    wn = Window.partitionBy("segment")
    ranked = cust.select(
        "segment", "rev",
        F.row_number().over(ws).cast("long").alias("i"),
        F.count("*").over(wn).cast("long").alias("n"),
        F.ntile(10).over(ws).cast("long").alias("decile"))
    rd = F.col("rev").cast("double") / 100.0
    tot = F.sum(rd).cast("double")
    gini = (2.0 * F.sum(F.col("i") * rd).cast("double")) \
        / (F.max("n") * tot) - (F.max("n") + 1.0) / F.max("n")
    hhi = F.sum(rd * rd).cast("double") / (tot * tot)
    top = F.sum(F.when(F.col("decile") == 10, rd).otherwise(0.0)) \
        .cast("double") / tot
    return (ranked.groupBy("segment")
            .agg(F.max("n").cast("long").alias("n_customers"),
                 exact.snap_double_col(gini, 9).alias("gini"),
                 exact.snap_double_col(hhi, 9).alias("hhi"),
                 exact.snap_double_col(top, 9).alias("top_decile_share"))
            .orderBy("segment"))


@query("abc_inventory_classes", oracle=f"""
WITH part_rev AS (
  SELECT l_partkey,
    CAST(SUM({exact.rev_e4('l_extendedprice', 'l_discount')})
         AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT CAST(SUM(rev_e4) AS BIGINT) AS t FROM part_rev),
ranked AS (
  SELECT l_partkey, rev_e4,
    CAST(SUM(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                           ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS cum_rev
  FROM part_rev),
classed AS (
  SELECT l_partkey, rev_e4,
    CASE WHEN CAST(cum_rev AS DOUBLE) / CAST(t AS DOUBLE) <= 0.80
         THEN 'A'
         WHEN CAST(cum_rev AS DOUBLE) / CAST(t AS DOUBLE) <= 0.95
         THEN 'B' ELSE 'C' END AS abc
  FROM ranked CROSS JOIN tot)
SELECT abc,
  CAST(COUNT(*) AS BIGINT) AS n_parts,
  CAST(SUM(rev_e4) AS BIGINT) AS class_revenue_e4,
  CAST(floor((CAST(SUM(rev_e4) AS DOUBLE) / (SELECT CAST(t AS DOUBLE) FROM tot)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS revenue_share
FROM classed GROUP BY abc ORDER BY abc""")
def abc_inventory_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: A carries the
    first 80% of cumulative revenue, B the next 15%, C the tail — the
    classic inventory-control cut that tells you which few parts
    deserve the expensive attention.  Revenue enters as IEEE-exact
    integer 10^-4-dollar units (cents × integer discount percent) and
    accumulates as BIGINT in a deterministic (rev DESC, partkey)
    order (r8 DECWIRE rule — the r7 version accumulated and emitted
    DECIMAL(38,4)); only the class-boundary comparison and final
    shares go through doubles.

    Scale: one part-keyed hash agg; the ranking window runs over the
    PART aggregate (dim-sized), the grouped-percentile contract."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    rev_e = F.expr(exact.rev_e4("l_extendedprice", "l_discount"))
    part_rev = (t["lineitem"].groupBy("l_partkey")
                .agg(F.sum(rev_e).cast("long").alias("rev_e4")))
    tot = part_rev.agg(F.sum("rev_e4").cast("long").alias("t"))
    w = (Window.orderBy(F.desc("rev_e4"), F.asc("l_partkey"))
         .rowsBetween(Window.unboundedPreceding, 0))
    ranked = part_rev.select(
        "l_partkey", "rev_e4",
        F.sum("rev_e4").over(w).cast("long").alias("cum_rev"))
    share = F.col("cum_rev").cast("double") / F.col("t").cast("double")
    classed = (ranked.crossJoin(F.broadcast(tot))
               .select("rev_e4", F.when(share <= 0.80, "A")
                       .when(share <= 0.95, "B").otherwise("C")
                       .alias("abc")))
    return (classed.groupBy("abc")
            .agg(F.count("*").alias("n_parts"),
                 F.sum("rev_e4").cast("long").alias("class_revenue_e4"))
            .crossJoin(F.broadcast(tot))
            .select("abc", "n_parts", "class_revenue_e4",
                    exact.snap_double_col(F.col("class_revenue_e4").cast("double") / F.col("t").cast("double"), 9)
                    .alias("revenue_share"))
            .orderBy("abc"))


@query("repeat_purchase_rate", oracle=f"""
WITH per_cust AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
    CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM({exact.cents('o.o_totalprice')}) AS BIGINT) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2)
SELECT segment,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(count_if(n_orders >= 2) AS BIGINT) AS n_repeat,
  CAST(floor((CAST(count_if(n_orders >= 2) AS DOUBLE) / COUNT(*)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS repeat_rate,
  CAST(floor((CAST(SUM(CASE WHEN n_orders >= 2 THEN rev END) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS repeat_revenue_share
FROM per_cust GROUP BY segment ORDER BY segment""")
def repeat_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-customer rate and repeat-revenue share per segment — the
    two numbers behind every retention narrative: how many customers
    come back, and how much of the money the returners carry (a high
    second number with a low first is a whale business; both high is a
    habit business).  Exact BIGINT-cents revenue (r11 DECCAST
    migration); two divisions at the end.

    Scale: one fact hash-agg to the customer layer, then a dim-sized
    segment rollup."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    per_cust = (t["orders"]
                .join(F.broadcast(t["customer"]
                                  .select("c_custkey", "c_mktsegment")),
                      F.col("o_custkey") == F.col("c_custkey"))
                .groupBy(F.col("c_mktsegment").alias("segment"),
                         "o_custkey")
                .agg(F.count("*").alias("n_orders"),
                     F.sum(F.expr(exact.cents("o_totalprice")))
                     .cast("long").alias("rev")))
    rpt = F.col("n_orders") >= 2
    return (per_cust.groupBy("segment")
            .agg(F.count("*").alias("n_customers"),
                 F.count_if(rpt).alias("n_repeat"),
                 exact.snap_double_col(F.count_if(rpt).cast("double") / F.count("*"), 9)
                 .alias("repeat_rate"),
                 exact.snap_double_col(F.sum(F.when(rpt, F.col("rev"))).cast("double") / F.sum("rev").cast("double"), 9)
                 .alias("repeat_revenue_share"))
            .orderBy("segment"))


@query("orders_aging_buckets", oracle=f"""
WITH mx AS (SELECT MAX(o_orderdate) AS as_of FROM orders),
o AS (
  SELECT o_orderkey,
    {exact.cents('o_totalprice')} AS vc,
    datediff('day', o_orderdate, as_of) AS age
  FROM orders CROSS JOIN mx
  WHERE o_orderstatus <> 'F'),
b AS (
  SELECT CASE WHEN age <= 30 THEN '0-30'
              WHEN age <= 60 THEN '31-60'
              WHEN age <= 90 THEN '61-90'
              ELSE '90+' END AS bucket,
    vc
  FROM o),
s AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
    CAST(SUM(vc) AS BIGINT) AS open_value_cents
  FROM b GROUP BY bucket),
tot AS (SELECT CAST(SUM(open_value_cents) AS BIGINT) AS t FROM s)
SELECT bucket, n_orders, open_value_cents,
  CAST(floor((CAST(open_value_cents AS DOUBLE) / CAST(t AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS value_share
FROM s CROSS JOIN tot ORDER BY bucket""")
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report (the AR-aging pattern): orders not yet
    finished (o_orderstatus <> 'F') bucketed by days outstanding as of
    the corpus's latest order date — 0-30 / 31-60 / 61-90 / 90+ —
    with exact-decimal open value and each bucket's share.  The
    standard operations dashboard for backlog risk: value piling into
    90+ is the early-warning signal.

    Determinism: ages are integer day differences from a 1-row as-of
    broadcast; money enters as IEEE-exact integer cents and the wire
    is BIGINT until the single share division (r8 DECWIRE rule — the
    r7 version emitted DECIMAL(18,2)).
    Shape: pushed status filter at the scan, map-side bucketing, a
    4-group aggregate + 1-row total — counters only in the shuffle."""
    t = load_tables(spark, sf_dir, ("orders",))
    mx = t["orders"].agg(F.max("o_orderdate").alias("as_of"))
    o = (t["orders"].where(F.col("o_orderstatus") != "F")
         .crossJoin(F.broadcast(mx))
         .select(F.expr(exact.cents("o_totalprice")).alias("vc"),
                 F.datediff("as_of", "o_orderdate").alias("age")))
    bucket = (F.when(F.col("age") <= 30, "0-30")
              .when(F.col("age") <= 60, "31-60")
              .when(F.col("age") <= 90, "61-90")
              .otherwise("90+"))
    s = (o.select(bucket.alias("bucket"), "vc")
         .groupBy("bucket")
         .agg(F.count("*").cast("long").alias("n_orders"),
              F.sum("vc").cast("long").alias("open_value_cents")))
    tot = s.agg(F.sum("open_value_cents").cast("long").alias("t"))
    return (s.crossJoin(F.broadcast(tot))
            .select("bucket", "n_orders", "open_value_cents",
                    exact.snap_double_col(F.col("open_value_cents").cast("double") / F.col("t").cast("double"), 9)
                    .alias("value_share"))
            .orderBy("bucket"))


@query("abc_xyz_matrix", oracle="""
WITH li AS (
  SELECT l.l_partkey AS part,
    CAST(CAST(floor((l.l_extendedprice * (1 - l.l_discount)) * 10000.0 + 0.5) AS BIGINT) / CAST(10000.0 AS DOUBLE)
         AS DECIMAL(18,4)) AS rev,
    CAST(date_trunc('week', o.o_orderdate) AS DATE) AS wk,
    CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
pr AS (
  SELECT part, CAST(SUM(rev) AS DECIMAL(38,4)) AS rev
  FROM li GROUP BY part),
ranked AS (
  SELECT part, rev,
    SUM(rev) OVER (ORDER BY rev DESC, part) AS cum,
    SUM(rev) OVER () AS tot
  FROM pr),
abc AS (
  SELECT part,
    CASE WHEN CAST(cum AS DOUBLE) <= 0.8 * CAST(tot AS DOUBLE) THEN 'A'
         WHEN CAST(cum AS DOUBLE) <= 0.95 * CAST(tot AS DOUBLE) THEN 'B'
         ELSE 'C' END AS abc
  FROM ranked),
wkly AS (
  SELECT part, wk, CAST(SUM(qty) AS BIGINT) AS q
  FROM li GROUP BY part, wk),
mom AS (
  SELECT part, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(q) AS BIGINT) AS s,
    CAST(SUM(q * q) AS BIGINT) AS qq
  FROM wkly GROUP BY part),
xyz AS (
  SELECT part,
    CASE WHEN n < 2 THEN 'Z'
         WHEN n * (n * qq - s * s) * 100
              <= (n - 1) * s * s * 25 THEN 'X'
         WHEN n * (n * qq - s * s) * 100
              <= (n - 1) * s * s * 100 THEN 'Y'
         ELSE 'Z' END AS xyz
  FROM mom)
SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM abc JOIN xyz USING (part)
GROUP BY abc, xyz ORDER BY abc, xyz""")
def abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix — the supply-chain planning grid that
    crosses revenue importance (A = first 80% of cumulative revenue,
    B = next 15%, C = tail) with demand PREDICTABILITY from the
    squared coefficient of variation of weekly quantities (X: CV² <=
    0.25, steady; Y: <= 1.0; Z: erratic or single-week).  AX parts get
    tight service levels and automation; CZ parts get made-to-order —
    the 9-cell census is the policy table.

    Exactness: revenue in exact DECIMAL with the cumulative ranking of
    abc_inventory_classes; CV² thresholds are CROSS-MULTIPLIED exact
    BIGINT comparisons (n(nΣq²−(Σq)²)·100 <= (n−1)(Σq)²·k — the bot
    detector's algebra, zero float thresholds).  Shape: two part-keyed
    aggregates (revenue, weekly moments) sharing the shuffle key, the
    dim-sized cumulative window (abc contract), a 9-cell census."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = (t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("l_partkey").alias("part"),
                exact.snap_double_col(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
                .cast("decimal(18,4)").alias("rev"),
                F.date_trunc("week", "o_orderdate").cast("date")
                .alias("wk"),
                F.col("l_quantity").cast("long").alias("qty")))
    pr = li.groupBy("part").agg(F.sum("rev").cast("decimal(38,4)")
                                .alias("rev"))
    wcum = Window.orderBy(F.desc("rev"), F.asc("part")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    ranked = pr.select(
        "part", "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)).alias("tot"))
    abc = ranked.select(
        "part",
        F.when(F.col("cum").cast("double")
               <= 0.8 * F.col("tot").cast("double"), "A")
        .when(F.col("cum").cast("double")
              <= 0.95 * F.col("tot").cast("double"), "B")
        .otherwise("C").alias("abc"))
    wkly = li.groupBy("part", "wk").agg(F.sum("qty").cast("long")
                                        .alias("q"))
    mom = wkly.groupBy("part").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("qq"))
    n, s, qq = F.col("n"), F.col("s"), F.col("qq")
    num = n * (n * qq - s * s) * 100
    den = (n - 1) * s * s
    xyz = mom.select(
        "part",
        F.when(n < 2, "Z")
        .when(num <= den * 25, "X")
        .when(num <= den * 100, "Y")
        .otherwise("Z").alias("xyz"))
    return (abc.join(xyz, "part")
            .groupBy("abc", "xyz")
            .agg(F.count("*").cast("long").alias("n_parts"))
            .orderBy("abc", "xyz"))
