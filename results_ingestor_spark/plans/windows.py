"""Window-function surface (SURVEY §2.4: ranking / analytic / frames).

Determinism: every ORDER BY inside a window carries a unique tie-break
key (orderkey / custkey), so rank, lag, and frame contents are identical
across engines and runs.  Frame sums go through exact decimals.

Scale: a window = one shuffle on partitionBy + per-partition sort.  All
windows here partition by a key (never a global ORDER BY over the whole
table, which would funnel to one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables

# IEEE-exact integer-cents ingestion (r8: the DECIMAL cast of raw
# money diverges cross-engine on .xx5-repr boundary prices — see
# tests/test_round_semantics.py::test_cast_decimal_column_path_divergence)
_CENTS = exact.cents("o_totalprice")


@query("window_rank_orders", oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  row_number() OVER w AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""")
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
    return t["orders"].select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"))


@query("window_lag_lead", oracle="""
SELECT o_orderkey, o_custkey,
  lag(o_totalprice) OVER w AS prev_price,
  lead(CAST(o_orderdate AS DATE)) OVER w AS next_date,
  lag(o_totalprice, 2, 0.0) OVER w AS prev2_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)""")
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("date"), F.asc("o_orderkey")))
    return t["orders"].select(
        "o_orderkey", "o_custkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead(F.col("o_orderdate").cast("date")).over(w).alias("next_date"),
        F.lag("o_totalprice", 2, 0.0).over(w).alias("prev2_price"))


@query("window_running_sum", oracle=f"""
SELECT o_orderkey, o_custkey,
  CAST(SUM({_CENTS}) OVER (PARTITION BY o_custkey
       ORDER BY CAST(o_orderdate AS DATE), o_orderkey
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    / 100.0 AS running_total
FROM orders""")
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (running total) — exact decimal accumulation."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("date"), F.asc("o_orderkey"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return t["orders"].select(
        "o_orderkey", "o_custkey",
        (F.sum(F.expr(_CENTS)).over(w).cast("double") / 100.0)
        .alias("running_total"))


@query("window_moving_avg", oracle=f"""
SELECT o_orderkey, o_custkey,
  CAST(SUM({_CENTS}) OVER w AS DOUBLE)
    / (100.0 * COUNT(*) OVER w) AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""")
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding frame (3-row moving average) — avg decomposed into exact
    decimal sum / count so both engines produce identical doubles."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("date"), F.asc("o_orderkey"))
         .rowsBetween(-2, Window.currentRow))
    return t["orders"].select(
        "o_orderkey", "o_custkey",
        (F.sum(F.expr(_CENTS)).over(w).cast("double")
         / (100.0 * F.count("*").over(w))).alias("moving_avg"))


@query("window_ntile_quartiles", oracle="""
SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer""")
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile — the one deliberately single-partition window here
    (quartiles are a global statement); at scale use approx quantiles."""
    t = load_tables(spark, sf_dir, ("customer",))
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return t["customer"].select(
        "c_custkey", F.ntile(4).over(w).alias("quartile"))


@query("topk_per_group", oracle="""
SELECT c_nationkey, c_custkey, c_acctbal FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
    row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) WHERE rn <= 3""")
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the row_number ≤ k pattern — one shuffle, and
    Spark pushes a per-partition 'window group limit' so only k rows per
    key survive the sort buffer (rank-limit pushdown)."""
    t = load_tables(spark, sf_dir, ("customer",))
    w = (Window.partitionBy("c_nationkey")
         .orderBy(F.desc("c_acctbal"), F.asc("c_custkey")))
    return (t["customer"]
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("c_nationkey", "c_custkey", "c_acctbal"))


@query("window_first_last", oracle="""
SELECT o_orderkey, o_custkey,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice) OVER w AS last_price_so_far,
  CAST(first_value(CAST(o_orderdate AS DATE)) OVER w AS DATE) AS first_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("date"), F.asc("o_orderkey"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return t["orders"].select(
        "o_orderkey", "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price_so_far"),
        F.first(F.col("o_orderdate").cast("date")).over(w).alias("first_date"))


@query("window_range_frame_trailing", oracle=f"""
SELECT o_orderkey, o_custkey, o_orderdate,
  CAST(SUM({_CENTS}) OVER (
    PARTITION BY o_custkey
    ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / 100.0 AS trailing_5d
FROM orders WHERE o_custkey < 100""")
def window_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE (value-based) frame — trailing 5-DAY revenue per customer.
    Unlike ROWS frames, peers are grouped by the ORDER BY value, so
    same-day orders land in one frame regardless of row order — the
    frame family engines disagree on most, value-checked here.  Ordering
    is epoch-day (numeric RANGE is the portable form of INTERVAL
    frames)."""
    t = load_tables(spark, sf_dir, ("orders",))
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    w = (Window.partitionBy("o_custkey").orderBy(days.cast("long"))
         .rangeBetween(-5, Window.currentRow))
    return (t["orders"].where(F.col("o_custkey") < 100)
            .select("o_orderkey", "o_custkey", "o_orderdate",
                    (F.sum(F.expr(_CENTS)).over(w).cast("double")
                     / 100.0).alias("trailing_5d")))


@query("window_distribution_funcs", oracle="""
SELECT c_custkey, c_mktsegment,
  CAST(floor((percent_rank() OVER w) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS pr,
  CAST(floor((cume_dist() OVER w) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS cd,
  CAST(ntile(10) OVER w AS INTEGER) AS decile
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)""")
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank / cume_dist / ntile)
    — the quantile-bucketing surface used for per-stratum score
    normalization.  One sort per mktsegment partition; the unique
    (c_acctbal, c_custkey) ordering makes ranks engine-identical."""
    t = load_tables(spark, sf_dir, ("customer",))
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey", "c_mktsegment",
        exact.snap_double_col(F.percent_rank().over(w), 9).alias("pr"),
        exact.snap_double_col(F.cume_dist().over(w), 9).alias("cd"),
        F.ntile(10).over(w).alias("decile"))


@query("window_running_distinct", oracle="""
WITH flagged AS (
  SELECT event_id, event_type, ts,
    CASE WHEN row_number() OVER (PARTITION BY event_type, user_id
                                 ORDER BY ts, event_id) = 1
         THEN 1 ELSE 0 END AS first_seen
  FROM events)
SELECT event_id, event_type,
  CAST(SUM(first_seen) OVER (PARTITION BY event_type ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS running_distinct_users
FROM flagged""")
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT user) per event_type — an aggregate SQL
    window frames can't express directly (DISTINCT isn't allowed in a
    running frame).  Rewritten as first-seen flags (row_number = 1 on
    the (type, user) partition) cumulatively summed — two window passes
    whose partitionings nest (type,user → type), so the second reuses
    the first's exchange.  The oracle states the identical rewrite."""
    t = load_tables(spark, sf_dir, ("events",))
    w_first = (Window.partitionBy("event_type", "user_id")
               .orderBy("ts", "event_id"))
    w_run = (Window.partitionBy("event_type").orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    first = (F.row_number().over(w_first) == 1).cast("int")
    return (t["events"]
            .withColumn("__first", first)
            .select("event_id", "event_type",
                    F.sum("__first").over(w_run)
                    .alias("running_distinct_users")))


@query("orders_monthly_streaks", oracle="""
WITH m AS (
  SELECT DISTINCT o_custkey,
    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mi
  FROM orders),
i AS (
  SELECT o_custkey, mi,
    mi - row_number() OVER (PARTITION BY o_custkey ORDER BY mi) AS grp
  FROM m),
st AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS len
  FROM i GROUP BY o_custkey, grp),
lg AS (
  SELECT o_custkey, MAX(len) AS longest FROM st GROUP BY o_custkey)
SELECT longest AS streak_months,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM lg GROUP BY longest ORDER BY longest""")
def orders_monthly_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: the longest run of CONSECUTIVE calendar months
    in which each customer placed at least one order, reported as a
    streak-length histogram — the classic retention question ("how
    many customers sustained an n-month habit?") answered with the
    month_index − row_number island key, the standard O(n log n)
    window device (no self-join, no recursion).

    Scale: everything is keyed by customer — the distinct, the island
    window, and the per-customer max all share one hash partitioning
    (a single exchange); the histogram is a streak-length-domain
    aggregate."""
    t = load_tables(spark, sf_dir, ("orders",))
    m = (t["orders"]
         .select("o_custkey",
                 (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
                 .cast("long").alias("mi"))
         .distinct())
    w = Window.partitionBy("o_custkey").orderBy("mi")
    i = m.select("o_custkey", "mi",
                 (F.col("mi") - F.row_number().over(w)).alias("grp"))
    st = (i.groupBy("o_custkey", "grp")
          .agg(F.count("*").cast("long").alias("len")))
    lg = st.groupBy("o_custkey").agg(F.max("len").alias("longest"))
    return (lg.groupBy(F.col("longest").alias("streak_months"))
            .agg(F.count("*").cast("long").alias("n_customers"))
            .orderBy("streak_months"))
