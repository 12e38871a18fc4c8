"""Advanced relational surface: upsert (MERGE emulation), map functions,
lateral explode, null semantics, scalar subqueries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables


@query("merge_upsert_orders", oracle=f"""
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         {exact.cents('o_totalprice * 1.1')} AS amount_cents
  FROM orders WHERE o_orderkey % 100 = 0),
untouched AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         {exact.cents('o_totalprice')} AS amount_cents FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM updates u
                    WHERE u.o_orderkey = orders.o_orderkey)),
merged AS (SELECT * FROM untouched UNION ALL SELECT * FROM updates)
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(amount_cents) AS DOUBLE) / 100.0 AS total
FROM merged GROUP BY o_orderstatus""")
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (no Delta in this image): target rows not
    matched by the source survive via left-anti join, updates union in —
    the guide's CDC/SCD2 pattern.  One shuffle-free union over an
    anti-join keyed on the merge key."""
    t = load_tables(spark, sf_dir, ("orders",))
    target = t["orders"].select("o_orderkey", "o_custkey",
                                "o_orderstatus", "o_totalprice")
    updates = (target.where(F.col("o_orderkey") % 100 == 0)
               .withColumn("o_orderstatus", F.lit("X"))
               .withColumn("amount_cents",
                           F.expr(exact.cents("o_totalprice * 1.1")))
               .drop("o_totalprice"))
    untouched = (target
                 .join(updates.select("o_orderkey"), "o_orderkey",
                       "left_anti")
                 .withColumn("amount_cents",
                             F.expr(exact.cents("o_totalprice")))
                 .drop("o_totalprice"))
    merged = untouched.unionByName(updates)
    return (merged.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"),
                 (F.sum("amount_cents").cast("double") / 100.0)
                 .alias("total")))


@query("map_functions", oracle="""
SELECT event_id,
  'k' AS prop_keys,
  CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)
    AS prop_values,
  1 AS n_props
FROM events WHERE event_id < 100""")
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse JSON to map<string,long>, then
    map_entries / map_keys / size.  Keys and values are emitted as
    '|'-joined strings (key-sorted, values aligned with their keys) —
    scalar wire types that every engine's canonicalizer can hash."""
    t = load_tables(spark, sf_dir, ("events",))
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    entries = F.sort_array(F.map_entries("m"))  # sorts by struct's 1st field: key
    return (t["events"].where(F.col("event_id") < 100)
            .withColumn("m", m)
            .select("event_id",
                    F.concat_ws("|", F.transform(entries, lambda e: e["key"]))
                    .alias("prop_keys"),
                    F.concat_ws("|", F.transform(
                        entries, lambda e: e["value"].cast("string")))
                    .alias("prop_values"),
                    F.size("m").alias("n_props")))


@query("lateral_explode_tokens", oracle="""
SELECT doc_id, t.pos - 1 AS pos, t.tok
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE doc_id < 20),
  LATERAL (SELECT unnest(toks) AS tok,
                  generate_subscripts(toks, 1) AS pos) AS t""")
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view / posexplode: one output row per (doc, position,
    token) — the table-generating-function surface."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (t["documents"].where(F.col("doc_id") < 20)
            .select("doc_id",
                    F.posexplode(F.split("text", " ")).alias("pos", "tok")))


@query("null_semantics", oracle="""
SELECT o_orderkey,
  coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
  (o_orderstatus IS NOT DISTINCT FROM 'F') AS nullsafe_is_f,
  CASE WHEN o_totalprice > 150000 THEN o_totalprice END AS big_price_or_null,
  (CASE WHEN o_totalprice > 150000 THEN o_totalprice END IS NULL) AS is_small
FROM orders WHERE o_orderkey < 500""")
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: coalesce / nullif / null-safe equality
    (<=>) / CASE-to-NULL — the semantics corner SQL dialects disagree
    on most, value-checked across engines."""
    t = load_tables(spark, sf_dir, ("orders",))
    big = F.when(F.col("o_totalprice") > 150000, F.col("o_totalprice"))
    return (t["orders"].where(F.col("o_orderkey") < 500)
            .select("o_orderkey",
                    F.coalesce(F.nullif("o_orderstatus", F.lit("O")),
                               F.lit("open")).alias("status_or_open"),
                    F.col("o_orderstatus").eqNullSafe("F").alias("nullsafe_is_f"),
                    big.alias("big_price_or_null"),
                    big.isNull().alias("is_small")))


@query("scalar_subquery_above_avg", oracle=f"""
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM({exact.cents('c_acctbal')}) AS DOUBLE)
                          / (100.0 * COUNT(*)) FROM customer)""")
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global average
    balance (exact cents sum, one rescaling division — r11 DECCAST
    migration) — Catalyst evaluates the subquery once and broadcasts
    the scalar into the filter."""
    t = load_tables(spark, sf_dir, ("customer",))
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(f"""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM({exact.cents('c_acctbal')})
                                       AS DOUBLE) / (100.0 * COUNT(*))
                           FROM customer)""")


@query("cohort_retention", oracle="""
WITH firsts AS (
  SELECT o_custkey,
    CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS cohort_month
  FROM orders GROUP BY o_custkey),
activity AS (
  SELECT DISTINCT o_custkey,
    CAST(date_trunc('month', o_orderdate) AS DATE) AS active_month
  FROM orders)
SELECT f.cohort_month,
  CAST((year(a.active_month) - year(f.cohort_month)) * 12
       + (month(a.active_month) - month(f.cohort_month)) AS INT) AS month_offset,
  COUNT(DISTINCT a.o_custkey) AS active_customers
FROM firsts f JOIN activity a ON f.o_custkey = a.o_custkey
GROUP BY 1, 2""")
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: customers bucketed by first-order month, counted
    per month-offset of later activity.  Two aggregations sharing the
    custkey partitioning — Catalyst reuses the exchange for the
    first-order window and the activity dedup."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    firsts = (o.groupBy("o_custkey")
              .agg(F.date_trunc("month", F.min("o_orderdate"))
                   .cast("date").alias("cohort_month")))
    activity = (o.select("o_custkey",
                         F.date_trunc("month", "o_orderdate")
                         .cast("date").alias("active_month"))
                .distinct())
    offset = ((F.year("active_month") - F.year("cohort_month")) * 12
              + (F.month("active_month") - F.month("cohort_month"))).cast("int")
    return (activity.join(firsts, "o_custkey")
            .groupBy("cohort_month", offset.alias("month_offset"))
            .agg(F.countDistinct("o_custkey").alias("active_customers")))


@query("funnel_signup_purchase", oracle="""
WITH s AS (SELECT user_id, min(ts) AS first_signup
           FROM events WHERE event_type = 'signup' GROUP BY user_id),
p AS (SELECT e.user_id, min(e.ts) AS first_purchase_after
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s.first_signup
      GROUP BY e.user_id)
SELECT
  (SELECT COUNT(*) FROM s) AS n_signed_up,
  (SELECT COUNT(*) FROM p) AS n_converted,
  CAST(floor((CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM s)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS conversion_rate,
  CAST((SELECT round(avg(epoch_us(p.first_purchase_after)
                         - epoch_us(s.first_signup)) , 0)
        FROM p JOIN s ON p.user_id = s.user_id) AS BIGINT) AS avg_lag_us""")
def funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: signup → first later purchase, with conversion
    rate and mean time-to-convert.  The ordered-sequence constraint
    (purchase strictly after signup) is the part plain joins get wrong."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    s = (ev.where(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("first_signup")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(s, "user_id")
         .where(F.col("ts") > F.col("first_signup"))
         .groupBy("user_id").agg(F.min("ts").alias("first_purchase_after"),
                                 F.first("first_signup").alias("fs")))
    lag_us = F.unix_micros("first_purchase_after") - F.unix_micros("fs")
    # Both funnel stages reduce to 1-row aggregates; a broadcast cross
    # join combines them IN-plan — fully lazy, single job, no driver-side
    # count() frozen into the plan as a literal.
    s_agg = s.agg(F.count("*").alias("n_signed_up"))
    p_agg = p.agg(F.count("*").alias("n_converted"),
                  F.round(F.avg(lag_us), 0).cast("long").alias("avg_lag_us"))
    return p_agg.crossJoin(s_agg).select(
        "n_signed_up",
        "n_converted",
        exact.snap_double_col(F.col("n_converted").cast("double") / F.col("n_signed_up"), 9)
         .alias("conversion_rate"),
        "avg_lag_us")


_SPINE_SQL = """
WITH RECURSIVE o AS (
  SELECT o_orderdate FROM orders
  WHERE o_orderdate < CAST('1995-07-01' AS DATE)),
spine AS (
  SELECT CAST(date_trunc('month', (SELECT MIN(o_orderdate) FROM o))
              AS DATE) AS m
  UNION ALL
  SELECT CAST(m + INTERVAL {iv} AS DATE) FROM spine
  WHERE m < CAST(date_trunc('month', (SELECT MAX(o_orderdate) FROM o))
                 AS DATE)
)
SELECT m, coalesce(n, 0) AS n_orders
FROM spine LEFT JOIN (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS n
  FROM o GROUP BY 1) c USING (m)"""


@query("recursive_month_spine",
       oracle=_SPINE_SQL.format(iv="1 MONTH"))
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4.x WITH RECURSIVE): generate a gap-free
    month spine over a 6-month window, left-join monthly counts —
    months with zero orders appear explicitly.  Each recursion step is
    a Spark job, so the window is deliberately bounded (depth ~6); for
    long spines prefer sequence()/explode (events_gapfill_hourly shows
    that form).  Same SQL runs on both engines (only the INTERVAL
    literal syntax differs)."""
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(_SPINE_SQL.format(iv="'1' MONTH"))


@query("correlated_exists_orders", oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'P')""")
def correlated_exists_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst decorrelates both into
    a LeftSemi and a LeftAnti hash join on c_custkey (asserted in
    test_plan_shapes), so the subqueries never execute per-row."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    t["customer"].createOrReplaceTempView("customer")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'P')""")


@query("scd2_status_history", oracle="""
SELECT o_custkey,
  o_orderstatus AS status,
  CAST(o_orderdate AS DATE) AS valid_from,
  lead(CAST(o_orderdate AS DATE))
    OVER (PARTITION BY o_custkey
          ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS valid_to,
  (lead(o_orderkey) OVER (PARTITION BY o_custkey
                          ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
   IS NULL) AS is_current
FROM orders WHERE o_custkey < 200""")
def scd2_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each customer's order
    history becomes validity intervals (valid_from / valid_to / current
    flag) via lead() over the change log — the warehouse-dimension shape
    a CDC pipeline materializes.  One window per customer partition,
    orderkey tie-break for deterministic same-day ordering."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("date"), "o_orderkey"))
    d = F.col("o_orderdate").cast("date")
    return (t["orders"].where(F.col("o_custkey") < 200)
            .select("o_custkey",
                    F.col("o_orderstatus").alias("status"),
                    d.alias("valid_from"),
                    F.lead(d).over(w).alias("valid_to"),
                    F.lead("o_orderkey").over(w).isNull()
                    .alias("is_current")))


@query("zorder_cluster_key", oracle="""
WITH b AS (
  SELECT event_id, user_id % 256 AS u,
    hour(CAST(ts AS TIMESTAMP)) * 11 % 256 AS h
  FROM events WHERE event_id < 2000)
SELECT event_id, CAST(u AS INT) AS u, CAST(h AS INT) AS h,
  CAST((
    (((u >> 0) & 1) << 0)  | (((h >> 0) & 1) << 1)  |
    (((u >> 1) & 1) << 2)  | (((h >> 1) & 1) << 3)  |
    (((u >> 2) & 1) << 4)  | (((h >> 2) & 1) << 5)  |
    (((u >> 3) & 1) << 6)  | (((h >> 3) & 1) << 7)  |
    (((u >> 4) & 1) << 8)  | (((h >> 4) & 1) << 9)  |
    (((u >> 5) & 1) << 10) | (((h >> 5) & 1) << 11) |
    (((u >> 6) & 1) << 12) | (((h >> 6) & 1) << 13) |
    (((u >> 7) & 1) << 14) | (((h >> 7) & 1) << 15)
  ) AS INT) AS zvalue
FROM b""")
def zorder_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two
    filter dimensions so sortWithinPartitions(zvalue) co-locates rows
    close in BOTH — the data-layout optimization behind multi-dimension
    data skipping (Delta/Iceberg OPTIMIZE ZORDER).  The key itself is
    pure integer bit arithmetic, identical in any engine; at write time
    you'd repartitionByRange(zvalue).sortWithinPartitions(zvalue)."""
    t = load_tables(spark, sf_dir, ("events",))
    b = (t["events"].where(F.col("event_id") < 2000)
         .select("event_id",
                 (F.col("user_id") % 256).cast("int").alias("u"),
                 (F.hour("ts") * 11 % 256).cast("int").alias("h")))
    z = None
    for i in range(8):
        ub = ((F.col("u").bitwiseAND(F.lit(1 << i))) / (1 << i)).cast("int")
        hb = ((F.col("h").bitwiseAND(F.lit(1 << i))) / (1 << i)).cast("int")
        term = (ub * (1 << (2 * i))) + (hb * (1 << (2 * i + 1)))
        z = term if z is None else z + term
    return b.select("event_id", "u", "h", z.cast("int").alias("zvalue"))


@query("string_similarity_levenshtein", oracle="""
SELECT p_partkey,
  p_name,
  lag(p_name) OVER (ORDER BY p_partkey) AS prev_name,
  levenshtein(p_name, lag(p_name) OVER (ORDER BY p_partkey)) AS edit_dist
FROM part WHERE p_partkey <= 500""")
def string_similarity_levenshtein(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Edit-distance surface (the scalar underlying the reference's
    fuzzy header matching, ingestor_precinct.py:126-129): levenshtein
    between adjacent part names.  NOTE the single-partition window is
    deliberate here (500 rows, a parity demo); the production fuzzy
    matcher (operators/mapping.py) scores candidate pairs map-side."""
    t = load_tables(spark, sf_dir, ("part",))
    w = Window.orderBy("p_partkey")
    prev = F.lag("p_name").over(w)
    return (t["part"].where(F.col("p_partkey") <= 500)
            .select("p_partkey", "p_name",
                    prev.alias("prev_name"),
                    F.levenshtein("p_name", prev).alias("edit_dist")))


@query("part_skyline", oracle="""
SELECT p_partkey, p_size, p_retailprice
FROM part x
WHERE NOT EXISTS (
  SELECT 1 FROM part y
  WHERE y.p_size >= x.p_size AND y.p_retailprice <= x.p_retailprice
    AND (y.p_size > x.p_size OR y.p_retailprice < x.p_retailprice))""")
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier): parts where no other part is at least
    as large AND at least as cheap with one strict improvement.  The
    oracle states the NOT EXISTS dominance definition directly; the
    Spark plan is the sort-based skyline — two windows over one sort
    on p_size: the running min price over strictly-larger sizes
    (value-RANGE frame, integer sizes make "1 preceding" = "size+1")
    and the min price within the same size.  O(n log n) with no
    self-join, the shape that survives 100 TB where the quadratic
    NOT EXISTS would not."""
    t = load_tables(spark, sf_dir, ("part",))
    w_gt = (Window.orderBy(F.col("p_size") * -1)
            .rangeBetween(Window.unboundedPreceding, -1))
    w_eq = Window.partitionBy("p_size")
    dominated = (
        (F.min("p_retailprice").over(w_gt) <= F.col("p_retailprice"))
        | (F.min("p_retailprice").over(w_eq) < F.col("p_retailprice")))
    return (t["part"]
            .select("p_partkey", "p_size", "p_retailprice",
                    dominated.alias("__dom"))
            .where(~F.coalesce(F.col("__dom"), F.lit(False)))
            .drop("__dom"))


@query("customer_rfm_segments", oracle=f"""
WITH base AS (
  SELECT o_custkey AS custkey,
    MAX(o_orderdate) AS last_order,
    COUNT(*) AS frequency,
    CAST(SUM({exact.cents('o_totalprice')}) AS BIGINT) AS monetary
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT custkey,
    ntile(5) OVER (ORDER BY last_order, custkey) AS r,
    ntile(5) OVER (ORDER BY frequency, custkey)  AS f,
    ntile(5) OVER (ORDER BY monetary, custkey)   AS m
  FROM base)
SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
    AS segment,
  COUNT(*) AS n_customers
FROM scored GROUP BY r, f, m""")
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary →
    quintile scores (ntile with custkey tie-break = fully
    deterministic) → segment census.  The three ntiles run over the
    customer-level aggregate (1/10th of orders), unpartitioned by
    design at this cardinality; at 100 TB you'd swap ntile for
    approx-quantile bucket edges (percentile_approx) broadcast as
    literals, keeping the same output contract.  Monetary quintiles
    rank exact BIGINT-cents sums (r11 DECCAST migration), so bucket
    assignment can't drift."""
    t = load_tables(spark, sf_dir, ("orders",))
    base = (t["orders"].groupBy(F.col("o_custkey").alias("custkey"))
            .agg(F.max("o_orderdate").alias("last_order"),
                 F.count("*").alias("frequency"),
                 F.sum(F.expr(exact.cents("o_totalprice")))
                 .cast("long").alias("monetary")))
    scored = base.select(
        "custkey",
        F.ntile(5).over(Window.orderBy("last_order", "custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy("frequency", "custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy("monetary", "custkey")).alias("m"))
    return (scored.groupBy("r", "f", "m")
            .agg(F.count("*").alias("n_customers"))
            .select("r", "f", "m",
                    F.concat(F.col("r").cast("string"),
                             F.col("f").cast("string"),
                             F.col("m").cast("string")).alias("segment"),
                    "n_customers"))


@query("dq_referential_integrity", oracle="""
SELECT 'orders.custkey->customer' AS fk,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       COUNT(*) AS n_orphans
FROM orders WHERE NOT EXISTS
  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
UNION ALL
SELECT 'lineitem.partkey->part',
       (SELECT COUNT(*) FROM lineitem),
       COUNT(*)
FROM lineitem WHERE NOT EXISTS
  (SELECT 1 FROM part WHERE p_partkey = l_partkey)
UNION ALL
SELECT 'lineitem.suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem),
       COUNT(*)
FROM lineitem WHERE NOT EXISTS
  (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
UNION ALL
SELECT 'lineitem.orderkey->orders',
       (SELECT COUNT(*) FROM lineitem),
       COUNT(*)
FROM lineitem WHERE NOT EXISTS
  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)""")
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every foreign
    key in the star schema, one row per FK.  Each check is an anti
    join (broadcast for dimension targets, shuffle for the
    fact-to-fact orderkey check) feeding a 1-row count — the audit a
    warehouse runs after every load.  UNION ALL of four tiny
    aggregates."""
    t = load_tables(spark, sf_dir,
                    ("orders", "lineitem", "customer", "part", "supplier"))

    def orphans(fk, child, parent, ckey, pkey):
        n = child.agg(F.count("*").alias("n_rows"))
        o = (child.join(parent, F.col(ckey) == F.col(pkey), "left_anti")
             .agg(F.count("*").alias("n_orphans")))
        return (n.join(F.broadcast(o))
                .select(F.lit(fk).alias("fk"), "n_rows", "n_orphans"))

    return (orphans("orders.custkey->customer", t["orders"], t["customer"],
                    "o_custkey", "c_custkey")
            .union(orphans("lineitem.partkey->part", t["lineitem"],
                           t["part"], "l_partkey", "p_partkey"))
            .union(orphans("lineitem.suppkey->supplier", t["lineitem"],
                           t["supplier"], "l_suppkey", "s_suppkey"))
            .union(orphans("lineitem.orderkey->orders", t["lineitem"],
                           t["orders"], "l_orderkey", "o_orderkey")))


@query("dq_key_uniqueness", oracle="""
SELECT 'orders.o_orderkey' AS key,
  COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_distinct,
  COUNT(*) = COUNT(DISTINCT o_orderkey) AS is_unique
FROM orders
UNION ALL
SELECT 'customer.c_custkey', COUNT(*), COUNT(DISTINCT c_custkey),
  COUNT(*) = COUNT(DISTINCT c_custkey) FROM customer
UNION ALL
SELECT 'lineitem.(orderkey,linenumber)', COUNT(*),
  COUNT(DISTINCT o_l) , COUNT(*) = COUNT(DISTINCT o_l)
FROM (SELECT CAST(l_orderkey AS VARCHAR) || ':'
             || CAST(l_linenumber AS VARCHAR) AS o_l FROM lineitem)
UNION ALL
SELECT 'events.event_id', COUNT(*), COUNT(DISTINCT event_id),
  COUNT(*) = COUNT(DISTINCT event_id) FROM events""")
def dq_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary/composite-key uniqueness audit across the corpus — the
    other half of the post-load contract check.  Composite keys are
    checked on a canonical string encoding (identical in the oracle)
    so the distinct count is engine-agnostic."""
    t = load_tables(spark, sf_dir,
                    ("orders", "customer", "lineitem", "events"))

    def uniq(label, df, col):
        return df.agg(
            F.lit(label).alias("key"),
            F.count("*").alias("n_rows"),
            F.countDistinct(col).alias("n_distinct"),
            (F.count("*") == F.countDistinct(col)).alias("is_unique"))

    composite = F.concat(F.col("l_orderkey").cast("string"), F.lit(":"),
                         F.col("l_linenumber").cast("string"))
    return (uniq("orders.o_orderkey", t["orders"], F.col("o_orderkey"))
            .union(uniq("customer.c_custkey", t["customer"],
                        F.col("c_custkey")))
            .union(uniq("lineitem.(orderkey,linenumber)", t["lineitem"],
                        composite))
            .union(uniq("events.event_id", t["events"], F.col("event_id"))))


@query("benford_first_digit", oracle=f"""
SELECT CAST(substr(CAST({exact.cents('o_totalprice')} AS VARCHAR),
            1, 1) AS INT) AS digit,
  COUNT(*) AS n,
  CAST(floor((CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM orders WHERE o_totalprice >= 1)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS observed,
  CAST(floor((log10(1.0 + 1.0 / CAST(substr(CAST({exact.cents('o_totalprice')} AS VARCHAR), 1, 1) AS INT))) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS benford
FROM orders WHERE o_totalprice >= 1
GROUP BY 1""")
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit census for fraud/quality screening.
    The first digit comes from the BIGINT cents value's canonical
    string form (r11 DECCAST migration — integer-to-string is
    standardized in both engines and x >= 1 means cents >= 100 shares
    x's leading digit), where a double-to-string would differ (sci
    notation) and floor(log10(x)) would flip on values within an ulp
    of a power of ten.  Expected Benford mass log10(1+1/d) is computed
    per group from the same integer digit."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"].where(F.col("o_totalprice") >= 1)
    digit = F.substring(F.expr(exact.cents("o_totalprice"))
                        .cast("string"), 1, 1).cast("int")
    n_all = o.agg(F.count("*").alias("__n"))
    return (o.groupBy(digit.alias("digit"))
            .agg(F.count("*").alias("n"))
            .join(F.broadcast(n_all))
            .select("digit", "n",
                    exact.snap_double_col(F.col("n").cast("double") / F.col("__n"), 9)
                    .alias("observed"),
                    exact.snap_double_col(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 9)
                    .alias("benford")))


@query("events_longest_daily_streak", oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events),
grp AS (
  SELECT user_id, d,
    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
             AS INT) AS anchor
  FROM days),
runs AS (
  SELECT user_id, COUNT(*) AS run_len
  FROM grp GROUP BY user_id, anchor)
SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak,
  CAST(SUM(run_len) AS BIGINT) AS active_days
FROM runs GROUP BY user_id""")
def events_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — gaps-and-
    islands on the calendar: distinct active days, anchor = day −
    row_number (constant within a consecutive run), run lengths, max.
    One user-keyed window over the distinct-day projection (tiny vs
    raw events) and two hash aggregates."""
    t = load_tables(spark, sf_dir, ("events",))
    days = (t["events"]
            .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
            .distinct())
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id", "d",
        F.date_sub("d", F.row_number().over(w)).alias("anchor"))
    runs = (grp.groupBy("user_id", "anchor")
            .agg(F.count("*").alias("run_len")))
    return (runs.groupBy("user_id")
            .agg(F.max("run_len").alias("longest_streak"),
                 F.sum("run_len").alias("active_days")))


@query("funnel_three_step", oracle="""
WITH s AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.t0 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id)
SELECT
  (SELECT COUNT(*) FROM s) AS n_signup,
  (SELECT COUNT(*) FROM c) AS n_click_after,
  (SELECT COUNT(*) FROM p) AS n_purchase_after,
  CAST(floor((CAST((SELECT COUNT(*) FROM c) AS DOUBLE) / (SELECT COUNT(*) FROM s)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS rate_click,
  CAST(floor((CAST((SELECT COUNT(*) FROM p) AS DOUBLE) / (SELECT COUNT(*) FROM s)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS rate_purchase""")
def funnel_three_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (signup → click → purchase, each step
    STRICTLY after the previous step's first occurrence — the chained
    constraint a naive per-type min-pivot gets wrong when a click
    precedes the signup).  Each stage is a per-user min-aggregate
    semi-constrained by the prior stage; the three 1-row stage counts
    combine via broadcast cross joins, all lazy, one job.  Every stage
    shuffles on user_id, so AQE reuses the co-partitioning down the
    chain."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    s = (ev.where(F.col("event_type") == "signup")
         .groupBy("user_id").agg(F.min("ts").alias("t0")))
    c = (ev.where(F.col("event_type") == "click")
         .join(s, "user_id").where(F.col("ts") > F.col("t0"))
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    p = (ev.where(F.col("event_type") == "purchase")
         .join(c, "user_id").where(F.col("ts") > F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    ns = s.agg(F.count("*").alias("n_signup"))
    nc = c.agg(F.count("*").alias("n_click_after"))
    np_ = p.agg(F.count("*").alias("n_purchase_after"))
    return (ns.crossJoin(nc).crossJoin(np_)
            .select("n_signup", "n_click_after", "n_purchase_after",
                    exact.snap_double_col(F.col("n_click_after").cast("double") / F.col("n_signup"), 9).alias("rate_click"),
                    exact.snap_double_col(F.col("n_purchase_after").cast("double") / F.col("n_signup"), 9).alias("rate_purchase")))


@query("variant_json_typed_extract", oracle="""
SELECT event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS sum_k,
  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS min_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
    AS max_k
FROM events GROUP BY event_type ORDER BY event_type""")
def variant_json_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``try_variant_get`` extractions — the open-schema path that avoids
    both per-query JSON re-parsing (get_json_object re-tokenizes the
    string on every call) and rigid from_json schemas.  At 100 TB the
    variant column is parsed once at ingest, stored shredded, and every
    downstream extraction is a binary field probe.  The oracle reaches
    the same values through DuckDB's JSON extraction — two engines, two
    JSON machineries, identical typed results."""
    t = load_tables(spark, sf_dir, ("events",))
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (t["events"]
            .select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("k").cast("long").alias("sum_k"),
                 F.min("k").cast("long").alias("min_k"),
                 F.max("k").cast("long").alias("max_k"))
            .orderBy("event_type"))


@query("string_collation_ci_grouping", oracle="""
WITH mixed AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END
    AS type_mixed
  FROM part)
SELECT lower(type_mixed) AS type_ci, COUNT(*) AS n
FROM mixed GROUP BY lower(type_mixed) ORDER BY type_ci""")
def string_collation_ci_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATIONS (UTF8_LCASE)
    rather than lower()-normalization: the collated column carries its
    comparison semantics in the TYPE, so every comparison, join, and
    group-by downstream is case-insensitive without the caller
    remembering to normalize — and collation-aware aggregation happens
    JVM-side with no extra projection.  Mixed-case input is
    reconstructed deterministically from partkey parity; the output key
    is lowercased for cross-engine comparison (engines may surface
    different representatives of a collation class).  The oracle uses
    explicit lower() grouping — same classes, same counts."""
    t = load_tables(spark, sf_dir, ("part",))
    mixed = F.when(F.col("p_partkey") % 2 == 0,
                   F.lower("p_type")).otherwise(F.col("p_type"))
    ci = F.collate(mixed, "UTF8_LCASE")
    return (t["part"]
            .groupBy(ci.alias("type_key"))
            .agg(F.count("*").alias("n"))
            .select(F.lower("type_key").alias("type_ci"), "n")
            .orderBy("type_ci"))


@query("dq_join_fanout_audit", oracle="""
WITH lm AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_orderkey),
om AS (
  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY o_orderkey),
j AS (SELECT lm.c AS cl, om.c AS co FROM lm JOIN om ON om.k = lm.k)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM lm) AS n_keys_fact,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM om) AS n_keys_dim,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM j) AS n_shared_keys,
  (SELECT CAST(MAX(c) AS BIGINT) FROM lm) AS max_mult_fact,
  (SELECT CAST(MAX(c) AS BIGINT) FROM om) AS max_mult_dim,
  (SELECT CAST(SUM(cl * co) AS BIGINT) FROM j) AS est_join_rows,
  CAST(floor((CAST((SELECT SUM(cl * co) FROM j) AS DOUBLE) / (SELECT SUM(c) FROM lm)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS fanout_vs_fact""")
def dq_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join cardinality audit — the guard a pipeline runs BEFORE an
    expensive join to catch key-multiplicity explosions: per-side key
    multiplicities, the exact join output cardinality
    (Σ_shared cnt_fact × cnt_dim, computed from two key-level aggregates
    without executing the join), and the fan-out ratio vs the fact side.
    A fanout_vs_fact near 1.0 certifies the dim side is unique on the
    key; >> 1.0 means the join would multiply rows.

    Scale: both multiplicity tables shuffle only (key, count) with
    map-side combine — the audit costs two aggregations and a key-level
    join of the aggregates, never materializing the joined rows.  All
    arithmetic is integer-exact; one division at the end."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    lm = (t["lineitem"].groupBy(F.col("l_orderkey").alias("k"))
          .agg(F.count("*").alias("cl")))
    om = (t["orders"].groupBy(F.col("o_orderkey").alias("k"))
          .agg(F.count("*").alias("co")))
    j = lm.join(om, "k")
    stats_lm = lm.agg(F.count("*").alias("n_keys_fact"),
                      F.max("cl").alias("max_mult_fact"),
                      F.sum("cl").alias("tot_fact"))
    stats_om = om.agg(F.count("*").alias("n_keys_dim"),
                      F.max("co").alias("max_mult_dim"))
    stats_j = j.agg(F.count("*").alias("n_shared_keys"),
                    F.sum(F.col("cl") * F.col("co"))
                    .cast("long").alias("est_join_rows"))
    return (stats_lm.crossJoin(F.broadcast(stats_om))
            .crossJoin(F.broadcast(stats_j))
            .select(
                "n_keys_fact", "n_keys_dim", "n_shared_keys",
                F.col("max_mult_fact").cast("long").alias("max_mult_fact"),
                F.col("max_mult_dim").cast("long").alias("max_mult_dim"),
                "est_join_rows",
                exact.snap_double_col(F.col("est_join_rows").cast("double") / F.col("tot_fact"), 9).alias("fanout_vs_fact")))


@query("scd2_point_in_time_join", oracle="""
WITH dim AS (
  SELECT o_custkey AS custkey,
    o_orderstatus AS status,
    CAST(o_orderdate AS DATE) AS valid_from,
    lead(CAST(o_orderdate AS DATE))
      OVER (PARTITION BY o_custkey
            ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS valid_to
  FROM orders WHERE o_custkey < 200),
fact AS (
  SELECT l.l_orderkey, o.o_custkey AS custkey,
    CAST(l.l_shipdate AS DATE) AS ship, l.l_quantity
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_custkey < 200)
SELECT f.custkey, d.status AS status_at_ship,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems,
  CAST(SUM(CAST(floor(f.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
    AS total_qty
FROM fact f
JOIN dim d ON d.custkey = f.custkey
          AND d.valid_from <= f.ship
          AND (d.valid_to IS NULL OR f.ship < d.valid_to)
GROUP BY 1, 2""")
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension — the warehouse
    query the scd2_status_history build EXISTS FOR: each shipment fact
    picks up the customer status that was VALID ON ITS SHIP DATE
    (joining on the current status instead is the classic time-travel
    bug this shape prevents).  Validity intervals are half-open
    [valid_from, valid_to); the open current row matches everything
    after its start.

    Scale: the SCD2 dimension is dimension-sized (one row per entity
    per change) → broadcast; the interval predicate evaluates map-side
    against the broadcast build, so the fact table never shuffles.
    With an unbroadcastable dimension this becomes the as-of
    union+window shape (operators/asof.py) — same semantics."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].where(F.col("o_custkey") < 200)
    w = (Window.partitionBy("o_custkey")
         .orderBy(F.col("o_orderdate").cast("date"), "o_orderkey"))
    d = F.col("o_orderdate").cast("date")
    dim = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        d.alias("valid_from"),
        F.lead(d).over(w).alias("valid_to"))
    fact = (t["lineitem"]
            .join(F.broadcast(orders.select("o_orderkey", "o_custkey")),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .select(F.col("o_custkey").alias("custkey"),
                    F.col("l_shipdate").cast("date").alias("ship"),
                    "l_quantity"))
    cond = ((F.col("d.custkey") == F.col("f.custkey"))
            & (F.col("valid_from") <= F.col("ship"))
            & (F.col("valid_to").isNull()
               | (F.col("ship") < F.col("valid_to"))))
    return (fact.alias("f")
            .join(F.broadcast(dim.alias("d")), cond)
            .groupBy(F.col("f.custkey").alias("custkey"),
                     F.col("status").alias("status_at_ship"))
            .agg(F.count("*").alias("n_lineitems"),
                 # quantities are integral (1..50); floor(x+0.5) is the
                 # IEEE-exact integer ingestion, and the summed wire is
                 # BIGINT (r8 DECWIRE rule — the r7 version emitted
                 # DECIMAL(38,2))
                 F.sum(F.expr("CAST(floor(l_quantity + 0.5) AS BIGINT)"))
                 .cast("long").alias("total_qty")))


@query("dq_value_domain_check", oracle="""
WITH checks AS (
  SELECT 'o_orderstatus' AS col, o_orderstatus AS v FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders),
dom AS (
  SELECT 'o_orderstatus' AS col, unnest(['F', 'O', 'P']) AS allowed
  UNION ALL
  SELECT 'o_orderpriority',
    unnest(['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'])),
j AS (
  SELECT c.col, c.v,
    EXISTS (SELECT 1 FROM dom d
            WHERE d.col = c.col AND d.allowed = c.v) AS ok
  FROM checks c)
SELECT col,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(count_if(NOT ok) AS BIGINT) AS n_out_of_domain,
  CAST(count_if(v IS NULL) AS BIGINT) AS n_null,
  min(CASE WHEN NOT ok THEN v END) AS sample_offender
FROM j GROUP BY col ORDER BY col""")
def dq_value_domain_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum-domain conformance audit — the DQ rule beside referential
    integrity and key uniqueness: every value of a constrained column
    must come from its declared domain; out-of-domain counts plus the
    smallest offender for actionability (a clean corpus reports 0 and
    NULL here, and the check is what KEEPS it true after the next
    load).  Domains are broadcast literals; the scan is one pass with
    a map-side membership test per rule."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    rules = {
        "o_orderstatus": ["F", "O", "P"],
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM",
                            "4-NOT SPECIFIED", "5-LOW"],
    }
    parts = []
    for col, allowed in rules.items():
        ok = F.col(col).isin(allowed)
        parts.append(o.select(
            F.lit(col).alias("col"), F.col(col).alias("v"),
            ok.alias("ok")))
    u = parts[0].unionByName(parts[1])
    return (u.groupBy("col")
            .agg(F.count("*").alias("n_rows"),
                 F.count_if(~F.col("ok")).alias("n_out_of_domain"),
                 F.count_if(F.col("v").isNull()).alias("n_null"),
                 F.min(F.when(~F.col("ok"), F.col("v")))
                 .alias("sample_offender"))
            .orderBy("col"))


@query("customers_at_risk_churn", oracle="""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
gaps AS (
  SELECT o_custkey,
    datediff('day',
             lag(d) OVER (PARTITION BY o_custkey ORDER BY d),
             d) AS gap_days,
    d
  FROM o),
per_cust AS (
  SELECT o_custkey,
    CAST(COUNT(*) + 1 AS BIGINT) AS n_orders,
    quantile_cont(gap_days, 0.5) AS median_gap_days,
    MAX(d) AS last_order
  FROM gaps WHERE gap_days IS NOT NULL
  GROUP BY o_custkey HAVING COUNT(*) >= 4),
horizon AS (SELECT MAX(d) AS corpus_end FROM o)
SELECT o_custkey AS custkey, n_orders,
  CAST(floor((median_gap_days) * 10.0 + 0.5) AS BIGINT) / CAST(10.0 AS DOUBLE) AS median_gap_days,
  last_order,
  CAST(datediff('day', last_order, corpus_end) AS BIGINT)
    AS days_silent,
  CAST(datediff('day', last_order, corpus_end) AS DOUBLE)
    / median_gap_days > 2.0 AS at_risk
FROM per_cust CROSS JOIN horizon
ORDER BY custkey""")
def customers_at_risk_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk flag per customer measured against the customer's OWN
    cadence: someone silent for 2× their median inter-order gap is at
    risk — a global '90 days silent' cutoff mislabels both weekly and
    yearly buyers, which is why the per-entity median is the right
    yardstick.  Requires ≥5 orders so the median is meaningful.

    Scale: gaps from a customer-partitioned lag window, one grouped
    exact-percentile agg (percentile_approx at 100 TB, same plan), a
    1-row horizon broadcast, and pure date arithmetic."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"].select("o_custkey",
                           F.col("o_orderdate").cast("date").alias("d"))
    w = Window.partitionBy("o_custkey").orderBy("d")
    gaps = o.select("o_custkey", "d",
                    F.datediff("d", F.lag("d").over(w)).alias("gap_days"))
    per_cust = (gaps.where(F.col("gap_days").isNotNull())
                .groupBy("o_custkey")
                .agg((F.count("*") + 1).cast("long").alias("n_orders"),
                     F.percentile("gap_days", F.lit(0.5))
                     .alias("median_gap"),
                     F.max("d").alias("last_order"))
                .where(F.col("n_orders") >= 5))
    horizon = o.agg(F.max("d").alias("corpus_end"))
    silent = F.datediff("corpus_end", "last_order")
    return (per_cust.crossJoin(F.broadcast(horizon))
            .select(F.col("o_custkey").alias("custkey"), "n_orders",
                    exact.snap_double_col("median_gap", 1).alias("median_gap_days"),
                    "last_order",
                    silent.cast("long").alias("days_silent"),
                    (silent.cast("double") / F.col("median_gap") > 2.0)
                    .alias("at_risk"))
            .orderBy("custkey"))


@query("feature_target_encoding_loo", oracle=f"""
WITH o AS (
  SELECT o.o_orderkey, c.c_mktsegment AS segment,
    {exact.cents('o.o_totalprice')} AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
seg AS (
  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_g,
    CAST(SUM(y) AS BIGINT) AS s_g
  FROM o GROUP BY segment),
gstat AS (
  SELECT CAST(SUM(s_g) AS DOUBLE) / SUM(n_g) AS gm
  FROM seg)
SELECT o.o_orderkey, o.segment,
  {exact.snap_double(
      "(CAST(seg.s_g - o.y AS DOUBLE) + 10.0 * gstat.gm)"
      " / (seg.n_g - 1 + 10.0) / 100.0", 2)} AS te_loo
FROM o JOIN seg ON o.segment = seg.segment CROSS JOIN gstat
ORDER BY o.o_orderkey""")
def feature_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature — the
    tabular-ML preprocessing staple: replace each order's customer
    segment with the mean target (o_totalprice) of all OTHER orders in
    that segment, smoothed toward the global mean with prior strength
    10 (te = (sum_g - y + 10*gm) / (n_g - 1 + 10)).  Excluding the
    row's own target is what prevents the leakage that plain mean
    encoding injects into training data.  Targets enter as IEEE-exact
    integer cents and sums accumulate as BIGINT (r8 DECWIRE posture);
    doubles enter in one fixed-order final expression; the output
    snaps to the cent via the shared floor(x*100+0.5) device (round()
    itself is the pinned cross-engine divergence class — this entry
    was caught by the sf0.1 draw-3 lottery sweep on exactly that).

    Scale: one shuffle join to fetch the segment (orders x customer on
    custkey), then a hash aggregate whose output is bounded by the
    category domain (5 segments) and broadcast back onto the fact —
    the encode itself is map-only.  No per-row window, no second
    shuffle of the fact table."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = (t["orders"].join(t["customer"],
                          t["orders"].o_custkey == t["customer"].c_custkey)
         .select("o_orderkey", F.col("c_mktsegment").alias("segment"),
                 F.expr(exact.cents("o_totalprice")).alias("y")))
    seg = (o.groupBy("segment")
           .agg(F.count("*").alias("n_g"),
                F.sum("y").cast("long").alias("s_g")))
    glob = seg.agg(
        (F.sum("s_g").cast("double") / F.sum("n_g")).alias("gm"))
    te = (((F.col("s_g") - F.col("y")).cast("double")
           + 10.0 * F.col("gm")) / (F.col("n_g") - 1 + 10.0) / 100.0)
    return (o.join(F.broadcast(seg), "segment")
            .crossJoin(F.broadcast(glob))
            .select("o_orderkey", "segment",
                    (F.floor(te * 100.0 + F.lit(0.5)).cast("long")
                     / 100.0).alias("te_loo"))
            .orderBy("o_orderkey"))


@query("rfm_segment_migration", oracle=f"""
WITH span AS (
  SELECT (epoch_us(min(o_orderdate)) + epoch_us(max(o_orderdate))) // 2
           AS mid_us
  FROM orders),
half AS (
  SELECT o_custkey AS custkey,
    CASE WHEN epoch_us(o_orderdate) < mid_us THEN 1 ELSE 2 END AS h,
    {exact.cents('o_totalprice')} AS price
  FROM orders CROSS JOIN span),
base AS (
  SELECT custkey, h, SUM(price) AS monetary
  FROM half GROUP BY custkey, h),
scored AS (
  SELECT custkey, h,
    CAST(ntile(5) OVER (PARTITION BY h ORDER BY monetary, custkey)
         AS INT) AS m
  FROM base)
SELECT a.m AS seg_h1, b.m AS seg_h2,
  CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored a JOIN scored b
  ON a.custkey = b.custkey AND a.h = 1 AND b.h = 2
GROUP BY a.m, b.m ORDER BY seg_h1, seg_h2""")
def rfm_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monetary-quintile migration matrix between the first and second
    halves of the order history: where did each customer's spend tier
    move? — the segment-flow report a growth team reads next after the
    static RFM census (`customer_rfm_segments`).  Quintiles are
    assigned per half with (monetary, custkey) tie-breaks over exact
    BIGINT-cents spend (r11 DECCAST migration), so bucket membership
    is engine-portable; the matrix
    counts customers active in BOTH halves (joiners/churners are the
    complement and belong to growth_accounting_weekly).

    Scale: two customer-keyed aggregations sharing one exchange; the
    per-half quintiles run as the IMPLEMENTED two-level shard-rank —
    exact row_number within 256 order-consistent monetary shards +
    broadcast offsets, then ntile(5) recovered arithmetically from the
    rank and the per-half count
    (`operators/shuffle.py::two_level_row_number` /
    `ntile_from_row_number`), so no half ever sorts in one partition;
    the self-join is customer-keyed."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    span = o.agg(F.expr(
        "(min(unix_micros(cast(o_orderdate as timestamp)))"
        " + max(unix_micros(cast(o_orderdate as timestamp)))) div 2")
        .alias("mid_us"))
    half = (o.join(F.broadcast(span))
            .select(F.col("o_custkey").alias("custkey"),
                    F.when(us < F.col("mid_us"), 1).otherwise(2).alias("h"),
                    F.expr(exact.cents("o_totalprice"))
                    .alias("price")))
    from results_ingestor_spark.operators.shuffle import (
        ntile_from_row_number, two_level_row_number)
    # Materialize the customer-half aggregate once: the two-level
    # rank's branches and the per-half count would otherwise each
    # re-scan orders and re-run the aggregation shuffle.  Scoped so
    # repeated invocations don't pin the blocks forever (ADVICE r5).
    from results_ingestor_spark.operators.ckpt import CheckpointScope
    scope = CheckpointScope(spark)
    base = scope.checkpoint(half.groupBy("custkey", "h").agg(
        F.sum("price").alias("monetary")))
    rn = two_level_row_number(
        base, F.col("monetary"), ["monetary", "custkey"],
        partition_cols=["h"], out_col="__rn")
    cnt = base.groupBy("h").agg(F.count("*").alias("__nh"))
    scored = (rn.join(F.broadcast(cnt), "h")
              .select("custkey", "h",
                      ntile_from_row_number(
                          F.col("__rn"), F.col("__nh"), 5).alias("m")))
    a = scored.where(F.col("h") == 1).select("custkey",
                                             F.col("m").alias("seg_h1"))
    b = scored.where(F.col("h") == 2).select("custkey",
                                             F.col("m").alias("seg_h2"))
    out = (a.join(b, "custkey")
           .groupBy("seg_h1", "seg_h2")
           .agg(F.count("*").cast("long").alias("n_customers"))
           .orderBy("seg_h1", "seg_h2"))
    out._ckpt_scope = scope  # caller hook: ckpt.release_result(df)
    return out


_ALS_ROUNDS = 2  # full alternations


def _als_oracle() -> str:
    """Unrolled-CTE replay of the rank-1 ALS: ratings, v0 = 1, then
    per-half-step closed-form least squares with values rounded to
    9 dp (quantizing cross-partition summation noise, the GD-chain
    device applied to distributed state)."""
    parts = ["""r AS MATERIALIZED (
  SELECT o.o_custkey AS c, l.l_partkey AS p,
    CAST(COUNT(*) AS BIGINT) AS r
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2)""",
             "v0 AS (SELECT DISTINCT p, 1.0 AS v FROM r)"]
    for i in range(_ALS_ROUNDS):
        parts.append(f"""
u{i + 1} AS (
  SELECT r.c, CAST(floor((SUM(r.r * v.v) / SUM(v.v * v.v)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS u
  FROM r JOIN v{i} v USING (p) GROUP BY r.c),
v{i + 1} AS (
  SELECT r.p, CAST(floor((SUM(r.r * u.u) / SUM(u.u * u.u)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS v
  FROM r JOIN u{i + 1} u USING (c) GROUP BY r.p)""")
    return ("WITH " + ",".join(parts) + f"""
SELECT p AS partkey,
  CAST(floor((v) * 1000000.0 + 0.5) AS BIGINT)
    / CAST(1000000.0 AS DOUBLE) AS score
FROM v{_ALS_ROUNDS}
ORDER BY CAST(floor((v) * 1000000.0 + 0.5) AS BIGINT)
    / CAST(1000000.0 AS DOUBLE) DESC, p LIMIT 20""")


@query("als_rank1_factorization", oracle=_als_oracle())
def als_rank1_factorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 alternating least squares on the customer × part
    purchase-count matrix — the collaborative-filtering trainer as a
    Spark iterative algorithm: each half-step is the exact 1-D
    least-squares solution u_c = Σrᵥ/Σv² (resp. v_p), i.e. one
    equi-join of the ratings with the opposite factor plus one keyed
    aggregation — the per-round budget of a PageRank step.  Factor
    values are rounded to 9 dp per half-step (the GD determinism
    device applied to DISTRIBUTED state) so the unrolled-CTE oracle
    replays both alternations; the top-20 parts rank on 6-dp scores
    with id tie-breaks.  Rank-1 ALS is the power iteration of the
    rating matrix — the first singular direction, the "overall
    popularity vs. heavy-buyer" axis a recommender factors out first.

    Scale: ratings materialize once (one fact shuffle); each
    half-step shuffles factor-keyed partial sums, never the matrix."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    from results_ingestor_spark.operators.ckpt import CheckpointScope
    scope = CheckpointScope(spark)
    r = scope.checkpoint(
        t["orders"].select("o_custkey", "o_orderkey")
        .join(t["lineitem"].select("l_orderkey", "l_partkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("o_custkey").alias("c"),
                 F.col("l_partkey").alias("p"))
        .agg(F.count("*").cast("long").alias("r")))
    v = r.select("p").distinct().withColumn("v", F.lit(1.0))
    for _ in range(_ALS_ROUNDS):
        u = (r.join(v, "p")
             .groupBy("c")
             .agg(exact.snap_double_col(F.sum(F.col("r") * F.col("v")) / F.sum(F.col("v") * F.col("v")), 9)
                  .alias("u")))
        v = (r.join(u, "c")
             .groupBy("p")
             .agg(exact.snap_double_col(F.sum(F.col("r") * F.col("u")) / F.sum(F.col("u") * F.col("u")), 9)
                  .alias("v")))
    out = (v.select(F.col("p").alias("partkey"),
                    exact.snap_double_col("v", 6).alias("score"))
           .orderBy(F.desc("score"), F.asc("partkey"))
           .limit(20))
    out._ckpt_scope = scope  # caller hook: ckpt.release_result(df)
    return out


@query("dq_order_total_reconciliation", oracle=f"""
WITH line AS (
  SELECT l_orderkey,
    CAST(SUM({exact.cents('l_extendedprice')}
             * (100 - {exact.cents('l_discount')})
             * (100 + {exact.cents('l_tax')})) AS BIGINT) AS recomputed_e6
  FROM lineitem GROUP BY l_orderkey),
r AS (
  SELECT o.o_orderkey,
    {exact.cents('o.o_totalprice')} * 10000 AS stored_e6,
    line.recomputed_e6,
    CASE WHEN line.l_orderkey IS NULL THEN NULL
      ELSE {exact.snap_n9(
        "abs(" + exact.cents('o.o_totalprice')
        + " * 10000 - line.recomputed_e6)"
        " / (o.o_totalprice * 1000000.0)")}
    END AS rel_err_n9
  FROM orders o LEFT JOIN line ON line.l_orderkey = o.o_orderkey)
SELECT
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(count_if(rel_err_n9 IS NULL) AS BIGINT) AS n_no_lines,
  CAST(count_if(abs(stored_e6 - recomputed_e6) <= 10000) AS BIGINT)
    AS n_reconciled_1c,
  CAST(CAST(SUM(rel_err_n9) AS BIGINT) AS DOUBLE)
    / (CAST(COUNT(rel_err_n9) AS BIGINT) * 1000000000.0) AS avg_rel_err,
  CAST(MAX(rel_err_n9) AS DOUBLE) / 1000000000.0 AS max_rel_err
FROM r""")
def dq_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table value reconciliation: does the order header's
    o_totalprice equal Σ extendedprice·(1−discount)·(1+tax) over its
    lines? — the TPC-H business rule, run as a data-quality audit
    (on this synthetic corpus the invariant does NOT hold, which is
    precisely what the audit exists to surface: headers and lines are
    drawn independently).  Line recomputation is exact INTEGER
    arithmetic in 10^-6-dollar units — cents(price) × integer
    discount/tax percents via the IEEE-exact cents ingestion — and
    the header enters the same way, so the reconciliation census and
    the error numerators carry no double→DECIMAL cast of raw data at
    all (r8 lottery sweeps showed those casts diverge cross-engine on
    .xx5-repr boundary prices — duck rounds the binary at large
    magnitudes while Spark HALF_UPs the shortest repr; this entry was
    caught twice).  The relative error snaps to integer 10^-9 units
    via the shared-IEEE floor(x·1e9 + 0.5) device and sums as BIGINT,
    so the mean and max are exact-integer ratios — order-independent
    and round()-free on the wire.

    Scale: one orderkey-keyed aggregation joined to the header
    (co-partitioned at rest under the documented bucketing); the
    report is one row."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    line = (t["lineitem"]
            .groupBy("l_orderkey")
            .agg(F.sum(F.expr(
                f"{exact.cents('l_extendedprice')}"
                f" * (100 - {exact.cents('l_discount')})"
                f" * (100 + {exact.cents('l_tax')})"))
                 .cast("long").alias("recomputed_e6")))
    # Denominator is the RAW double o_totalprice, exactly as the
    # oracle divides; the numerator is an exact-integer e6 difference
    # (no double→DECIMAL cast of raw data anywhere in this entry).
    o = t["orders"].select(
        "o_orderkey", "o_totalprice",
        F.expr(f"{exact.cents('o_totalprice')} * 10000")
        .alias("stored_e6"))
    r = (o.join(line, o.o_orderkey == line.l_orderkey, "left")
         .select("stored_e6", "recomputed_e6",
                 F.when(F.col("l_orderkey").isNotNull(),
                        F.expr(exact.snap_n9(
                            "abs(stored_e6 - recomputed_e6)"
                            " / (o_totalprice * 1000000.0)")))
                 .alias("rel_err_n9")))
    return r.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.count_if(F.col("rel_err_n9").isNull()).cast("long")
        .alias("n_no_lines"),
        F.count_if(F.abs(F.col("stored_e6") - F.col("recomputed_e6"))
                   <= 10000)
        .cast("long").alias("n_reconciled_1c"),
        (F.sum("rel_err_n9").cast("double")
         / (F.count("rel_err_n9").cast("long") * 1_000_000_000.0))
        .alias("avg_rel_err"),
        (F.max("rel_err_n9").cast("double") / 1_000_000_000.0)
        .alias("max_rel_err"))


@query("dq_duplicate_payment_candidates", oracle=f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
    {exact.cents('o_totalprice')} AS amount_cents,
    o_orderdate
  FROM orders),
p AS (
  SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b,
    a.o_custkey AS custkey, a.amount_cents,
    a.o_orderdate AS date_a, b.o_orderdate AS date_b,
    datediff('day', a.o_orderdate, b.o_orderdate) AS gap_days
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.amount_cents = b.amount_cents
   AND a.o_orderkey < b.o_orderkey
   AND datediff('day', a.o_orderdate, b.o_orderdate) BETWEEN -7 AND 7)
SELECT key_a, key_b, custkey, amount_cents, date_a, date_b, gap_days
FROM p ORDER BY custkey, amount_cents, key_a, key_b LIMIT 50""")
def dq_duplicate_payment_candidates(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Duplicate-payment detection — the forensic-accounting audit:
    two orders by the SAME customer for the IDENTICAL amount within
    ±7 days are double-billing candidates (the classic AP-audit rule;
    exact-amount + short-window is the highest-precision tier before
    fuzzy-amount tiers widen recall).  Emits the candidate pairs with
    their day gap for the review queue.

    Shape: the pair join is BLOCKED on the exact (custkey, amount)
    key — the ER/LSH blocking pattern, so candidates are bounded by
    per-(customer, amount) multiplicity, never a date-range scan of
    the ledger; the ±7-day band is a residual predicate on the
    blocked pairs.  Amounts block at IEEE-exact integer-cent
    granularity (r8 DECWIRE rule — the r7 version blocked and emitted
    CAST(o_totalprice AS DECIMAL(12,2)), a data double→DECIMAL cast
    on a compared, SELECTED value) and day gaps are integers."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"].select(
        "o_orderkey", "o_custkey",
        F.expr(exact.cents("o_totalprice")).alias("amount_cents"),
        "o_orderdate")
    a = o.select(F.col("o_orderkey").alias("key_a"),
                 F.col("o_custkey").alias("custkey"), "amount_cents",
                 F.col("o_orderdate").alias("date_a"))
    b = o.select(F.col("o_orderkey").alias("key_b"),
                 F.col("o_custkey").alias("custkey"), "amount_cents",
                 F.col("o_orderdate").alias("date_b"))
    gap = F.datediff("date_b", "date_a")
    return (a.join(b, ["custkey", "amount_cents"])
            .where((F.col("key_a") < F.col("key_b"))
                   & gap.between(-7, 7))
            .select("key_a", "key_b", "custkey", "amount_cents",
                    "date_a", "date_b", gap.alias("gap_days"))
            .orderBy("custkey", "amount_cents", "key_a", "key_b")
            .limit(50))


_LDU_CRIT_DF9 = 16.9189776046  # chi-square df=9, 5%


@query("dq_last_digit_uniformity", oracle=f"""
WITH d AS (
  SELECT {exact.cents('o_totalprice')} % 10 AS digit
  FROM orders),
c0 AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
c AS (
  SELECT CAST(g AS BIGINT) AS digit, CAST(coalesce(c0.n, 0) AS BIGINT)
    AS n
  FROM (SELECT unnest(range(0, 10)) AS g)
  LEFT JOIN c0 ON c0.digit = g),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM c),
chi AS (
  SELECT SUM((CAST(n AS DOUBLE) - CAST(nn AS DOUBLE) / 10)
             * (n - CAST(nn AS DOUBLE) / 10) / (CAST(nn AS DOUBLE) / 10))
    AS chi2
  FROM c CROSS JOIN tot)
SELECT nn AS n_rows,
  (SELECT CAST(count_if(n > 0) AS BIGINT) FROM c) AS n_digits_seen,
  CAST(floor((chi2) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS chi2,
  CAST(floor((chi2) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) > {_LDU_CRIT_DF9} AS reject_uniform
FROM chi CROSS JOIN tot""")
def dq_last_digit_uniformity(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Last-digit uniformity test — Benford's forensic companion:
    GENUINE transaction amounts have uniformly random final cent
    digits, while fabricated or rounded figures cluster (0/5-heavy
    endings are the classic fraud tell).  Pearson chi-square of the
    terminal cent digit against uniform(10), df = 9, over the FULL
    zero-filled 10-digit domain (an absent digit contributes its whole
    expected mass — the most damning evidence must not vanish from the
    statistic); pairs with
    benford_first_digit (which tests the FIRST digit against the
    log law) to bracket the number from both ends.

    Exact integer digits via the IEEE-exact cents ingestion (r8: the
    previous DECIMAL-cast digit was flipped by a cast-divergent
    boundary price on the adversarial lottery corpus — a SELECTED
    digit is maximally sensitive, so it gets the floor-cents
    treatment); the chi-square sums 10 bounded cell terms (float
    order noise ~1e-15, snapped at 6).  Shape: one map + 10-cell
    aggregate + 1-row test."""
    t = load_tables(spark, sf_dir, ("orders",))
    d = t["orders"].select(
        (F.expr(exact.cents("o_totalprice")) % 10).alias("digit"))
    spine = spark.range(10).select(F.col("id").cast("long")
                                   .alias("digit"))
    c0 = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    c = (spine.join(c0, "digit", "left")
         .select("digit", F.coalesce("n", F.lit(0)).cast("long")
                 .alias("n")))
    tot = c.agg(F.sum("n").cast("long").alias("nn"),
                F.count_if(F.col("n") > 0).cast("long")
                 .alias("n_digits_seen"))
    exp = F.col("nn").cast("double") / 10
    chi = (c.crossJoin(F.broadcast(tot))
           .agg(F.sum((F.col("n") - exp) * (F.col("n") - exp) / exp)
                .alias("chi2"),
                F.max("nn").alias("n_rows"),
                F.max("n_digits_seen").alias("n_digits_seen")))
    return chi.select(
        "n_rows", "n_digits_seen",
        exact.snap_double_col("chi2", 6).alias("chi2"),
        (exact.snap_double_col("chi2", 6) > _LDU_CRIT_DF9).alias("reject_uniform"))


@query("dq_id_sequence_gaps", oracle="""
WITH o AS (
  SELECT o_orderkey AS id,
    lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev
  FROM orders),
g AS (
  SELECT prev + 1 AS gap_start, id - 1 AS gap_end, id - prev - 1 AS missing
  FROM o WHERE prev IS NOT NULL AND id - prev > 1),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
    CAST(coalesce(SUM(missing), 0) AS BIGINT) AS total_missing,
    CAST(coalesce(MAX(missing), 0) AS BIGINT) AS largest_gap
  FROM g),
b AS (
  SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_id,
    CAST(MAX(o_orderkey) AS BIGINT) AS max_id,
    CAST(COUNT(*) AS BIGINT) AS n_ids
  FROM orders)
SELECT min_id, max_id, n_ids, n_gaps, total_missing, largest_gap,
  CAST(floor((CAST(n_ids AS DOUBLE) / (max_id - min_id + 1)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS density
FROM s CROSS JOIN b""")
def dq_id_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ID-sequence continuity audit on the order ledger: gaps in the
    (nominally dense) surrogate key are the fingerprint of dropped
    ingestion batches or hard-deleted rows — n_gaps, total missing
    ids, the largest hole, and overall density.  TPC-H orderkeys are
    FAMOUSLY sparse by construction (only 1 of every 4 key slots is
    used), so this audit's non-trivial output on the synthetic ledger
    doubles as the demonstration that the report says something.

    Exact integer gap arithmetic from one lag over the sorted key (at
    100 TB: per-partition gap scan on range-partitioned ids + boundary
    handoff — the pack_sequences_cumsum contract); 1-row report."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = Window.orderBy("o_orderkey")
    o = t["orders"].select(
        F.col("o_orderkey").alias("id"),
        F.lag("o_orderkey").over(w).alias("prev"))
    g = (o.where(F.col("prev").isNotNull()
                 & (F.col("id") - F.col("prev") > 1))
         .select((F.col("id") - F.col("prev") - 1).alias("missing")))
    s = g.agg(F.count("*").cast("long").alias("n_gaps"),
              F.coalesce(F.sum("missing"), F.lit(0)).cast("long")
               .alias("total_missing"),
              F.coalesce(F.max("missing"), F.lit(0)).cast("long")
               .alias("largest_gap"))
    b = t["orders"].agg(F.min("o_orderkey").cast("long").alias("min_id"),
                        F.max("o_orderkey").cast("long").alias("max_id"),
                        F.count("*").cast("long").alias("n_ids"))
    return (s.crossJoin(F.broadcast(b))
            .select("min_id", "max_id", "n_ids", "n_gaps",
                    "total_missing", "largest_gap",
                    exact.snap_double_col(F.col("n_ids").cast("double") / (F.col("max_id") - F.col("min_id") + 1), 9)
                    .alias("density")))
