"""Advanced relational surface: upsert (MERGE emulation), map functions,
lateral explode, null semantics, scalar subqueries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables


@query("merge_upsert_orders", oracle="""
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         round(o_totalprice * 1.1, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0),
untouched AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
  WHERE NOT EXISTS (SELECT 1 FROM updates u
                    WHERE u.o_orderkey = orders.o_orderkey)),
merged AS (SELECT * FROM untouched UNION ALL SELECT * FROM updates)
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
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
               .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 1.1, 2)))
    untouched = target.join(updates.select("o_orderkey"), "o_orderkey",
                            "left_anti")
    merged = untouched.unionByName(updates)
    return (merged.groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"),
                 F.sum(F.expr("CAST(o_totalprice AS DECIMAL(14,2))"))
                 .cast("double").alias("total")))


@query("map_functions", oracle="""
SELECT event_id,
  ['k'] AS prop_keys,
  [CAST(json_extract_string(props, '$.k') AS BIGINT)] AS prop_values,
  1 AS n_props
FROM events WHERE event_id < 100""")
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse JSON to map<string,long>, then
    map_keys / map_values / size.  Output is array-shaped (sorted keys)
    so the oracle can compare across engines' differing map wire types."""
    t = load_tables(spark, sf_dir, ("events",))
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (t["events"].where(F.col("event_id") < 100)
            .withColumn("m", m)
            .select("event_id",
                    F.sort_array(F.map_keys("m")).alias("prop_keys"),
                    F.map_values("m").alias("prop_values"),
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


@query("scalar_subquery_above_avg", oracle="""
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE)
                          / COUNT(*) FROM customer)""")
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global average
    balance — Catalyst evaluates the subquery once and broadcasts the
    scalar into the filter."""
    t = load_tables(spark, sf_dir, ("customer",))
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2)))
                                       AS DOUBLE) / COUNT(*) FROM customer)""")
