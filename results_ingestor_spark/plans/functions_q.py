"""Additional function-family coverage: typed JSON, array ops, exact
percentiles, approximate sketches (SURVEY §2.4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables


@query("from_json_typed", oracle="""
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  event_type
FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""")
def from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed JSON parsing (from_json → struct, not string
    extraction) with a filter over the parsed field."""
    t = load_tables(spark, sf_dir, ("events",))
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (t["events"]
            .withColumn("p", F.from_json("props", schema))
            .where(F.col("p.k") > 50)
            .select("event_id", F.col("p.k").alias("k"), "event_type"))


@query("array_functions", oracle="""
SELECT vec_id,
  len(embedding) AS dim,
  CAST(floor((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS first_component,
  CAST(floor((CAST(embedding[len(embedding)] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS last_component,
  CAST(floor((CAST(list_max(embedding) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS max_component,
  CAST(floor((CAST(list_min(embedding) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS min_component,
  len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings""")
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column surface over array<float>: size / index / min / max /
    filter — all JVM higher-order functions."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = F.col("embedding")
    return t["embeddings"].select(
        "vec_id",
        F.size(e).alias("dim"),
        exact.snap_double_col(F.element_at(e, 1).cast("double"), 6).alias("first_component"),
        exact.snap_double_col(F.element_at(e, -1).cast("double"), 6).alias("last_component"),
        exact.snap_double_col(F.array_max(e).cast("double"), 6).alias("max_component"),
        exact.snap_double_col(F.array_min(e).cast("double"), 6).alias("min_component"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"))


@query("percentile_exact", oracle="""
SELECT l_returnflag,
  CAST(floor((quantile_cont(l_quantity, 0.5)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS median_qty,
  CAST(floor((quantile_cont(l_extendedprice, 0.9)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS p90_price,
  CAST(floor((quantile_cont(l_extendedprice, 0.99)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS p99_price
FROM lineitem GROUP BY l_returnflag""")
def percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``: same linear-interpolation definition)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (t["lineitem"].groupBy("l_returnflag").agg(
        exact.snap_double_col(F.percentile("l_quantity", F.lit(0.5)), 9).alias("median_qty"),
        exact.snap_double_col(F.percentile("l_extendedprice", F.lit(0.9)), 9).alias("p90_price"),
        exact.snap_double_col(F.percentile("l_extendedprice", F.lit(0.99)), 9).alias("p99_price")))


@query("approx_sketches", oracle="""
SELECT o_orderstatus,
  COUNT(DISTINCT o_custkey) AS exact_customers,
  CAST(floor((quantile_cont(o_totalprice, 0.5)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS exact_median,
  TRUE AS cd_within_bound,
  TRUE AS median_within_bound
FROM orders GROUP BY o_orderstatus""")
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for the 100 TB tier: HLL++ distinct counts
    and GK-sketch quantiles.  Raw sketch outputs are engine-specific, so
    the comparable surface is self-verifying: Spark computes BOTH the
    sketch and the exact value and emits exact + within-bound booleans;
    the oracle computes the exact values and literal TRUEs.  Both sketches
    are deterministic for a fixed dataset, so the booleans are stable."""
    t = load_tables(spark, sf_dir, ("orders",))
    agg = t["orders"].groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__acd"),
        F.countDistinct("o_custkey").alias("exact_customers"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("__amed"),
        exact.snap_double_col(F.percentile("o_totalprice", F.lit(0.5)), 9)
        .alias("exact_median"))
    return agg.select(
        "o_orderstatus", "exact_customers", "exact_median",
        (F.abs(F.col("__acd") - F.col("exact_customers"))
         <= F.lit(0.05) * F.col("exact_customers")).alias("cd_within_bound"),
        (F.abs(F.col("__amed") - F.col("exact_median"))
         <= F.lit(0.05) * F.col("exact_median")).alias("median_within_bound"))


@query("salted_sum_by_flag", oracle=f"""
SELECT l_returnflag,
  CAST(SUM({exact.cents('l_quantity')}) AS DOUBLE) / 100.0 AS total_qty,
  COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag""")
def salted_sum_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted aggregation: 3 hot keys spread over 16 salt
    buckets, partial sums merged in a second (tiny) aggregation.  Same
    answer as the plain GROUP BY the oracle runs — the salting must be
    algebraically invisible."""
    from results_ingestor_spark.operators.skew import salted_agg
    t = load_tables(spark, sf_dir, ("lineitem",))
    return salted_agg(
        t["lineitem"], ["l_returnflag"],
        {"total_qty": (F.sum(F.expr(exact.cents("l_quantity"))),
                       F.sum("total_qty")),
         "n": (F.count(F.lit(1)), F.sum("n"))},
    ).select("l_returnflag",
             (F.col("total_qty").cast("double") / 100.0).alias("total_qty"),
             F.col("n").cast("long").alias("n"))


@query("regexp_functions", oracle="""
SELECT p_partkey,
  regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
  regexp_matches(p_type, 'BRUSHED|POLISHED') AS is_finished,
  regexp_replace(p_brand, 'Brand#', 'B', 'g') AS brand_code
FROM part WHERE p_partkey <= 2000""")
def regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: group extraction, match counting (via extract_all
    — portable to engines without regexp_count), boolean match, global
    replace.  Patterns stay in the RE2-compatible subset (no lookahead /
    backreferences) so Java regex and RE2 agree."""
    t = load_tables(spark, sf_dir, ("part",))
    return (t["part"].where(F.col("p_partkey") <= 2000)
            .select("p_partkey",
                    F.regexp_extract("p_type", "^([A-Z]+)", 1)
                    .alias("type_head"),
                    F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0))
                    .alias("n_vowels"),
                    F.col("p_type").rlike("BRUSHED|POLISHED")
                    .alias("is_finished"),
                    F.regexp_replace("p_brand", "Brand#", "B")
                    .alias("brand_code")))


@query("stats_mad_by_type", oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type)
SELECT e.event_type,
  CAST(floor((m) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS median_value,
  CAST(floor((quantile_cont(abs(e.value - m), 0.5)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS mad,
  COUNT(*) AS n
FROM events e JOIN med USING (event_type)
GROUP BY e.event_type, m""")
def stats_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group — the robust dispersion
    statistic.  Two passes by construction (the second median is of
    residuals against the first): a per-type median aggregate
    broadcast-joined back, then a second exact percentile.  Both
    engines use the same linear-interpolation percentile definition
    on identical doubles, so outputs match bit-for-bit at 9 dp."""
    t = load_tables(spark, sf_dir, ("events",))
    med = (t["events"].groupBy("event_type")
           .agg(F.percentile("value", F.lit(0.5)).alias("m")))
    return (t["events"].join(F.broadcast(med), "event_type")
            .groupBy("event_type", "m")
            .agg(exact.snap_double_col(F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)), 9).alias("mad"),
                 F.count("*").alias("n"))
            .select("event_type", exact.snap_double_col("m", 9).alias("median_value"),
                    "mad", "n"))


@query("histogram_totalprice", oracle="""
WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
           FROM orders)
SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 10.0)), 9)
            AS INT) AS bin,
  COUNT(*) AS n,
  CAST(floor((MIN(o_totalprice)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS bin_min,
  CAST(floor((MAX(o_totalprice)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS bin_max
FROM orders, b
GROUP BY 1""")
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10 bins over the observed range): the
    min/max come from a 1-row aggregate broadcast-cross-joined
    in-plan, the bin index is the same IEEE double expression in both
    engines (identical inputs → identical floor), and the top bin
    absorbs the max via LEAST.  One scan + one tiny-key aggregate."""
    t = load_tables(spark, sf_dir, ("orders",))
    b = t["orders"].agg(F.min("o_totalprice").alias("lo"),
                        F.max("o_totalprice").alias("hi"))
    bin_ = F.least(F.floor((F.col("o_totalprice") - F.col("lo"))
                           / ((F.col("hi") - F.col("lo")) / 10.0)),
                   F.lit(9)).cast("int")
    return (t["orders"].join(F.broadcast(b))
            .groupBy(bin_.alias("bin"))
            .agg(F.count("*").alias("n"),
                 exact.snap_double_col(F.min("o_totalprice"), 9).alias("bin_min"),
                 exact.snap_double_col(F.max("o_totalprice"), 9).alias("bin_max")))


@query("sketch_merge_shards", oracle="""
SELECT CAST(8 AS BIGINT) AS n_shards,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
  CAST(floor((quantile_cont(value, 0.5)) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS exact_median,
  TRUE AS users_within_bound,
  TRUE AS median_within_band
FROM events""")
def sketch_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch pattern that makes approximate aggregation
    work at 100 TB: each shard (stand-in for an executor / partition /
    day of data) builds Apache DataSketches HLL and KLL sketches; the
    global answer comes from UNIONING THE SKETCHES, never re-reading
    rows — the algebraic property that lets a 1000-node cluster or an
    incremental pipeline maintain distinct counts and quantiles with
    O(sketch) state.  Spark computes shard sketches (hll_sketch_agg,
    kll_sketch_agg_double), merges (hll_union_agg, kll_merge_agg),
    estimates, and self-verifies against the exact values computed in
    the same plan: HLL within 5 % of exact distinct (lgK=12 → ~1.6 %
    rse), KLL median inside the exact p45–p55 band (k=200 → ~1.65 %
    rank error).  The oracle replays the exact side and literal TRUEs
    (sketch bytes are engine-specific; the bounds are the contract)."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    sh = (ev.groupBy((F.col("user_id") % 8).alias("shard"))
          .agg(F.hll_sketch_agg("user_id").alias("hs"),
               F.kll_sketch_agg_double("value").alias("ks")))
    merged = sh.agg(
        F.count("*").cast("long").alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("hs")).alias("__hll"),
        F.kll_sketch_get_quantile_double(
            F.kll_merge_agg_double("ks"), F.lit(0.5)).alias("__kmed"))
    # local named `truth` so the module-level plans.exact helper
    # is not shadowed (r10)
    truth = ev.agg(
        F.countDistinct("user_id").alias("exact_users"),
        exact.snap_double_col(F.percentile("value", F.lit(0.5)), 9).alias("exact_median"),
        F.percentile("value", F.lit(0.45)).alias("__p45"),
        F.percentile("value", F.lit(0.55)).alias("__p55"))
    return merged.crossJoin(truth).select(
        "n_shards", "exact_users", "exact_median",
        (F.abs(F.col("__hll") - F.col("exact_users"))
         <= F.lit(0.05) * F.col("exact_users")).alias("users_within_bound"),
        ((F.col("__kmed") >= F.col("__p45"))
         & (F.col("__kmed") <= F.col("__p55"))).alias("median_within_band"))


@query("sketch_theta_set_ops", oracle="""
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
SELECT
  CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS exact_click,
  CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS exact_purchase,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p))
       AS BIGINT) AS exact_union,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p))
       AS BIGINT) AS exact_intersect,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p))
       AS BIGINT) AS exact_diff,
  TRUE AS union_within_bound,
  TRUE AS intersect_within_bound,
  TRUE AS diff_within_bound""")
def sketch_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate SET ALGEBRA on DataSketches theta sketches: build one
    sketch per audience (click users / purchase users), then answer
    union, intersection, and difference cardinalities FROM THE SKETCHES
    — the operation family HLL can't do (HLL unions only; theta's
    sampled-hash-set supports all three).  At 100 TB this is how
    audience-overlap questions get answered without re-shuffling raw
    ids: per-segment sketches are tiny, mergeable, and composable after
    the fact.  Self-verified like sketch_merge_shards: exact values
    compute in the same plan and every estimate must land within 5 %
    (default lgK=12 → ~1.6 % rse); the oracle replays the exact sets
    and literal TRUEs."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    sk = ev.agg(
        F.theta_sketch_agg(F.when(F.col("event_type") == "click",
                                  F.col("user_id"))).alias("sc"),
        F.theta_sketch_agg(F.when(F.col("event_type") == "purchase",
                                  F.col("user_id"))).alias("sp"))
    est = sk.select(
        F.theta_sketch_estimate(F.theta_union("sc", "sp")).alias("__u"),
        F.theta_sketch_estimate(F.theta_intersection("sc", "sp"))
        .alias("__i"),
        F.theta_sketch_estimate(F.theta_difference("sc", "sp")).alias("__d"))
    c = ev.where(F.col("event_type") == "click").select("user_id")
    p = ev.where(F.col("event_type") == "purchase").select("user_id")
    truth = (c.distinct().agg(F.count("*").alias("exact_click"))
             .crossJoin(p.distinct().agg(F.count("*").alias("exact_purchase")))
             .crossJoin(c.union(p).distinct()
                        .agg(F.count("*").alias("exact_union")))
             .crossJoin(c.distinct().intersect(p.distinct())
                        .agg(F.count("*").alias("exact_intersect")))
             .crossJoin(c.distinct().exceptAll(p.distinct()).distinct()
                        .agg(F.count("*").alias("exact_diff"))))
    within = lambda e, x: (F.abs(F.col(e) - F.col(x))  # noqa: E731
                           <= F.lit(0.05) * F.col(x))
    return truth.crossJoin(est).select(
        "exact_click", "exact_purchase", "exact_union", "exact_intersect",
        "exact_diff",
        within("__u", "exact_union").alias("union_within_bound"),
        within("__i", "exact_intersect").alias("intersect_within_bound"),
        within("__d", "exact_diff").alias("diff_within_bound"))


@query("incremental_agg_merge", oracle=f"""
SELECT event_type, COUNT(*) AS n,
  CAST(SUM({exact.cents('value')}) AS DOUBLE) / 100.0 AS total,
  MIN(value) AS mn, MAX(value) AS mx,
  TRUE AS matches_direct
FROM events GROUP BY event_type ORDER BY event_type""")
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-view maintenance by algebraic partial merge: daily
    partial aggregates (the state an incremental pipeline persists per
    ingest batch) MERGE into per-type totals — count by sum, sum by
    sum, min by min, max by max — and the plan itself verifies the
    merged result equals a direct one-pass aggregation
    (``matches_direct``, BIGINT-cents-exact so equality is bit-exact;
    r11 DECCAST migration).
    This is the contract that lets a 100 TB nightly pipeline update
    per-partition stats without re-reading history: state size is
    O(groups × days), merge cost is O(state), history is never
    re-scanned.  The oracle computes the direct aggregation + literal
    TRUE — if Spark's two-level merge ever diverged from the direct
    path, the boolean would flip and the row would go red."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    vc = F.expr(exact.cents("value"))
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
             .agg(F.count("*").alias("pn"),
                  F.sum(vc).cast("long").alias("ps"),
                  F.min("value").alias("pmn"), F.max("value").alias("pmx")))
    merged = (daily.groupBy("event_type")
              .agg(F.sum("pn").cast("long").alias("n"),
                   F.sum("ps").cast("long").alias("total_c"),
                   F.min("pmn").alias("mn"), F.max("pmx").alias("mx")))
    direct = (ev.groupBy(F.col("event_type").alias("et2"))
              .agg(F.count("*").alias("dn"),
                   F.sum(vc).cast("long").alias("ds"),
                   F.min("value").alias("dmn"), F.max("value").alias("dmx")))
    j = merged.join(direct, F.col("event_type") == F.col("et2"))
    same = ((F.col("n") == F.col("dn"))
            & (F.col("total_c") == F.col("ds"))
            & (F.col("mn") == F.col("dmn")) & (F.col("mx") == F.col("dmx")))
    return (j.select("event_type", "n",
                     (F.col("total_c").cast("double") / 100.0)
                     .alias("total"),
                     "mn", "mx", same.alias("matches_direct"))
            .orderBy("event_type"))


@query("incremental_join_view_merge", oracle=f"""
WITH enr AS (
  SELECT n.n_name, o.o_orderdate,
    {exact.cents('o.o_totalprice')} AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey)
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / 100.0 AS revenue,
  TRUE AS matches_direct
FROM enr GROUP BY n_name ORDER BY n_name""")
def incremental_join_view_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN-aggregate view — the step up
    from incremental_agg_merge's single-table case: the materialized
    view revenue-per-nation (orders x customer x nation) is split into
    the state built from history (orderdate < 1997-01-01) and the
    delta from the new batch (>= 1997-01-01); the delta is enriched
    through the SAME dimension joins and algebraically merged
    (count+count, decimal sum+sum).  The plan verifies merged ==
    direct recompute per nation (`matches_direct`, bit-exact because
    sums are DECIMAL) — the IVM contract that lets a nightly 100 TB
    pipeline join-enrich only the new partition, never re-scanning
    order history.

    Scale: both legs broadcast the dims; the delta leg's fact scan is
    partition-pruned by the date predicate (the pushed filter is the
    whole point); merge cost is O(|nation|), not O(history)."""
    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    cust = (t["customer"].join(F.broadcast(t["nation"]),
                               t["customer"].c_nationkey
                               == t["nation"].n_nationkey)
            .select("c_custkey", "n_name"))
    enr = (t["orders"].join(cust,
                            t["orders"].o_custkey == cust.c_custkey)
           .select("n_name", "o_orderdate",
                   F.expr(exact.cents("o_totalprice")).alias("y")))
    cut = F.lit("1997-01-01").cast("date")
    base = (enr.where(F.col("o_orderdate") < cut)
            .groupBy("n_name")
            .agg(F.count("*").alias("bn"), F.sum("y").alias("bs")))
    delta = (enr.where(F.col("o_orderdate") >= cut)
             .groupBy("n_name")
             .agg(F.count("*").alias("dn"), F.sum("y").alias("ds")))
    merged = (base.select("n_name", F.col("bn").alias("pn"),
                          F.col("bs").alias("ps"))
              .unionByName(delta.select("n_name",
                                        F.col("dn").alias("pn"),
                                        F.col("ds").alias("ps")))
              .groupBy("n_name")
              .agg(F.sum("pn").cast("long").alias("n_orders"),
                   F.sum("ps").cast("long").alias("rev_cents")))
    direct = (enr.groupBy(F.col("n_name").alias("nn2"))
              .agg(F.count("*").alias("xn"), F.sum("y").alias("xs")))
    j = merged.join(direct, merged.n_name == direct.nn2)
    same = ((F.col("n_orders") == F.col("xn"))
            & (F.col("rev_cents") == F.col("xs").cast("long")))
    return (j.select("n_name", "n_orders",
                     (F.col("rev_cents").cast("double") / 100.0)
                     .alias("revenue"),
                     same.alias("matches_direct"))
            .orderBy("n_name"))


_KMV_K = 64
_2POW60 = 1152921504606846976  # md5_long draws are uniform on [0, 2^60)


@query("sketch_kmv_distinct", oracle=f"""
WITH d AS (
  SELECT DISTINCT event_type,
    ('0x' || substr(md5('kmv:'
      || CAST({exact.cents('value')} AS VARCHAR)), 1, 15))::BIGINT
      AS h
  FROM events),
r AS (
  SELECT event_type, h,
    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM d),
ex AS (
  SELECT event_type,
    CAST(COUNT(DISTINCT {exact.cents('value')}) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type),
kth AS (
  SELECT event_type, nd, h AS hk FROM r WHERE rn = {_KMV_K})
SELECT ex.event_type, ex.n_exact,
  CAST(floor((CASE WHEN kth.event_type IS NULL THEN CAST(ex.n_exact AS DOUBLE) ELSE ({_KMV_K} - 1) * CAST({_2POW60} AS DOUBLE) / kth.hk END) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE)
    AS kmv_est,
  CAST(floor((abs(CASE WHEN kth.event_type IS NULL THEN CAST(ex.n_exact AS DOUBLE) ELSE ({_KMV_K} - 1) * CAST({_2POW60} AS DOUBLE) / kth.hk END - ex.n_exact) / ex.n_exact) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS rel_err
FROM ex LEFT JOIN kth USING (event_type)
ORDER BY ex.event_type""")
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (k = 64) per event type,
    reported against the exact count — the third member of the
    cardinality-sketch family (HLL merges, theta set-algebra): keep the
    k smallest md5 hash values of the keys; the k-th smallest, as a
    fraction of the hash space, estimates density, so
    est = (k−1)/u_(k).  Because the draw is md5 the whole sketch is
    value-checked, not just its contract; groups with fewer than k
    distinct keys report exactly (the KMV degenerate case).

    Scale: the distinct and the per-group rank window both key on
    event_type; at real scale the rank window is replaced by a
    per-partition top-k merge (TakeOrdered shape) — the estimate only
    ever needs the k smallest, never a full sort."""
    from results_ingestor_spark.functions.hashing import md5_long
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    d = (ev.select("event_type",
                   md5_long(F.expr(exact.cents("value"))
                            .cast("string"), seed="kmv:")
                   .alias("h"))
         .distinct())
    wr = Window.partitionBy("event_type").orderBy("h")
    r = d.select("event_type", "h", F.row_number().over(wr).alias("rn"))
    kth = (r.where(F.col("rn") == _KMV_K)
           .select("event_type", F.col("h").alias("hk")))
    ex = ev.groupBy("event_type").agg(
        F.count_distinct(F.expr(exact.cents("value")))
        .cast("long").alias("n_exact"))
    est = F.when(F.col("hk").isNull(), F.col("n_exact").cast("double")) \
        .otherwise((_KMV_K - 1) * F.lit(float(_2POW60)) / F.col("hk"))
    return (ex.join(F.broadcast(kth), "event_type", "left")
            .select("event_type", "n_exact",
                    exact.snap_double_col(est, 6).alias("kmv_est"),
                    exact.snap_double_col(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"))
            .orderBy("event_type"))


_AMS_K = 16  # independent estimators; median-of-16


def _ams_sql() -> str:
    return f"""
WITH s AS (
  SELECT user_id, CAST(u AS BIGINT) AS j,
    CASE WHEN ('0x' || substr(md5(CAST(u AS VARCHAR) || ':'
               || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
         THEN 1 ELSE -1 END AS sgn
  FROM events CROSS JOIN (SELECT unnest(range(0, {_AMS_K})) AS u) g),
z AS (SELECT j, CAST(SUM(sgn) AS BIGINT) AS z FROM s GROUP BY j),
est AS (
  SELECT z * z AS e, row_number() OVER (ORDER BY z * z, j) AS rn
  FROM z),
med AS (SELECT CAST(e AS BIGINT) AS ams_f2 FROM est
        WHERE rn = {_AMS_K // 2 + 1}),
ex AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2,
    CAST(SUM(c) AS BIGINT) AS n_rows
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events
        GROUP BY user_id))
SELECT n_rows, exact_f2, ams_f2,
  CAST(floor((abs(CAST(ams_f2 AS DOUBLE) - exact_f2) / exact_f2) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE)
    AS rel_error
FROM ex CROSS JOIN med"""


@query("sketch_ams_f2_selfjoin", oracle=_ams_sql())
def sketch_ams_f2_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy):
    estimate F2 = Σ_k f_k² of the user_id column — EXACTLY the output
    size of a self-join on that key, the number a planner needs before
    committing to a per-user pair join (sessional pattern mining,
    audience overlap) — from 16 counters of ±1 signs instead of a full
    per-key census.  Reported beside the exact F2 with the realized
    relative error, so the sketch is value-checked AND its accuracy
    contract is visible.

    Determinism: signs are md5-parity (seeded j:user), each Z_j is an
    exact BIGINT, the estimate is the exact upper median of 16 integer
    Z², and one double division yields the error.  Shape: a ×16
    map-side sign explode → 16-row aggregate (16 BIGINTs of state
    total, any corpus size); the exact side is one user-keyed count —
    present only to grade the sketch, dropped in production."""
    t = load_tables(spark, sf_dir, ("events",))
    seeds = F.explode(F.array(*[F.lit(j) for j in range(_AMS_K)]))
    s = t["events"].select("user_id", seeds.alias("j"))
    sgn = F.when(
        F.conv(F.substring(F.md5(F.concat_ws(
            ":", F.col("j").cast("string"),
            F.col("user_id").cast("string"))), 1, 15), 16, 10)
        .cast("bigint") % 2 == 0, 1).otherwise(-1)
    z = (s.select(F.col("j").cast("long").alias("j"), sgn.alias("sgn"))
         .groupBy("j").agg(F.sum("sgn").cast("long").alias("z")))
    med = (z.select((F.col("z") * F.col("z")).alias("e"), "j")
           .withColumn("rn", F.row_number().over(
               Window.orderBy(F.col("e").asc(), F.col("j").asc())))
           .where(F.col("rn") == _AMS_K // 2 + 1)
           .select(F.col("e").cast("long").alias("ams_f2")))
    ex = (t["events"].groupBy("user_id")
          .agg(F.count("*").cast("long").alias("c"))
          .agg(F.sum(F.col("c") * F.col("c")).cast("long")
                .alias("exact_f2"),
               F.sum("c").cast("long").alias("n_rows")))
    return (ex.crossJoin(F.broadcast(med))
            .select("n_rows", "exact_f2", "ams_f2",
                    exact.snap_double_col(F.abs(F.col("ams_f2").cast("double") - F.col("exact_f2")) / F.col("exact_f2"), 6).alias("rel_error")))
