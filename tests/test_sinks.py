"""Sink parity tests (SURVEY §2.1 #6-#9, #26)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from results_ingestor_spark.sources.jdbc_sink import write_parquet, write_tsv_append
from results_ingestor_spark.sources.tables import load_tables


def test_preview_head_with_fillna(spark, sf_dir):
    """#6: df.head().fillna('.') preview parity — limit + na.fill."""
    docs = load_tables(spark, sf_dir, ("customer",))["customer"]
    preview = docs.limit(5).na.fill(".")
    rows = preview.collect()
    assert len(rows) == 5
    assert all(r["c_name"] is not None for r in rows)


def test_shape_counts(spark, sf_dir):
    """#7: (rows, cols) status-line counts."""
    c = load_tables(spark, sf_dir, ("region",))["region"]
    assert (c.count(), len(c.columns)) == (5, 2)


def test_tsv_append_sink(spark, sf_dir, tmp_path):
    """#9: the reference's commented-out TSV append sink — append twice,
    rows accumulate."""
    out = str(tmp_path / "tsv_out")
    nation = load_tables(spark, sf_dir, ("nation",))["nation"]
    write_tsv_append(nation, out)
    write_tsv_append(nation, out)
    back = spark.read.option("sep", "\t").csv(out)
    assert back.count() == 50


def test_parquet_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    """#26: materialize partitioned by the dominant filter axis; a filter
    on the partition key must prune directories (PartitionFilters)."""
    out = str(tmp_path / "orders_by_status")
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    write_parquet(orders, out, partition_by=("o_orderstatus",))
    assert sorted(d for d in os.listdir(out) if d.startswith("o_orderstatus=")) \
        == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]
    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan \
        or "o_orderstatus#" in plan.split("PartitionFilters")[1].split("]")[0]
    assert back.count() == orders.where("o_orderstatus = 'F'").count()


def test_save_as_table_roundtrip(spark, sf_dir):
    """#26: CREATE TABLE AS (saveAsTable) — metastore-registered.
    warehouse.dir is a static conf, so the default ./spark-warehouse is
    used and cleaned up afterwards."""
    import shutil
    region = load_tables(spark, sf_dir, ("region",))["region"]
    try:
        region.write.mode("overwrite").saveAsTable("contest_county_demo")
        assert spark.table("contest_county_demo").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS contest_county_demo")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_jdbc_sink_roundtrip_embedded_derby(spark):
    """#8: a REAL JDBC round-trip — typed append into an embedded Derby
    database (ships with Spark for the Hive metastore), read back via the
    same JDBC source, rowcount + values asserted.  This is the write path
    the reference drives through SQLAlchemy to_sql (ingestor_precinct.py:
    192-218), exercised end-to-end: batched INSERTs, append-twice
    accumulation, and typed columns surviving the round trip."""
    from results_ingestor_spark.sources.jdbc_sink import write_jdbc_append
    url = "jdbc:derby:memory:rt_sink;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [(1, "WAKE", 120.5), (2, "DURHAM", 33.0)],
        "precinct_id int, county string, total double")
    write_jdbc_append(df, url, "contest_precinct", driver=driver,
                      num_partitions=1)
    write_jdbc_append(df, url, "contest_precinct", driver=driver,
                      num_partitions=1)
    back = (spark.read.format("jdbc").option("url", url)
            .option("dbtable", "contest_precinct")
            .option("driver", driver).load())
    assert back.count() == 4
    got = {(r["PRECINCT_ID"] if "PRECINCT_ID" in back.columns
            else r["precinct_id"],
            r["COUNTY"] if "COUNTY" in back.columns else r["county"])
           for r in back.collect()}
    assert got == {(1, "WAKE"), (2, "DURHAM")}
    assert dict(back.dtypes).get("total", dict(back.dtypes).get("TOTAL")) \
        == "double"


def test_jdbc_sink_wiring(spark):
    """#8: the JDBC sink builds the right writer config; without a live
    database in this container we assert the option plumbing fails with
    a driver/connection error, not an API-misuse error."""
    from results_ingestor_spark.sources.jdbc_sink import write_jdbc_append
    df = spark.range(3).withColumnRenamed("id", "x")
    try:
        write_jdbc_append(df, "jdbc:postgresql://localhost:1/nope", "t",
                          user="u", password="p", num_partitions=1)
        raise AssertionError("expected connection failure")
    except Exception as ex:
        msg = str(ex)
        assert ("No suitable driver" in msg or "Connection" in msg
                or "driver" in msg.lower())


def test_compact_small_files(spark, sf_dir, tmp_path):
    """Compaction: 32 tiny files in, few files out, same rows; output
    count derives from bytes/target so huge inputs still split."""
    from results_ingestor_spark.sources.jdbc_sink import compact_small_files
    src = str(tmp_path / "many"); dst = str(tmp_path / "few")
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    orders.repartition(32).write.mode("overwrite").parquet(src)
    assert sum(1 for f in os.listdir(src) if f.endswith(".parquet")) == 32
    n_out = compact_small_files(spark, src, dst)
    assert n_out == 1  # sf0.001 orders ≈ a few hundred KB < 128 MB target
    assert spark.read.parquet(dst).count() == orders.count()
    # a small target forces a multi-file split
    n_split = compact_small_files(spark, src, str(tmp_path / "split"),
                                  target_file_bytes=64 * 1024)
    assert n_split > 1


def test_sorted_layout_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """Data layout for scan pruning: writing value-sorted parquet (small
    row groups) must produce mostly non-overlapping per-row-group
    min/max ranges, so a selective value predicate can skip most row
    groups via footer stats — the single-column analogue of the Z-order
    entry.  Measured directly from the parquet footers."""
    import pyarrow.parquet as pq

    from results_ingestor_spark.sources.tables import load_tables
    # sf0.01: enough rows (10k) that an 8 KiB block target yields ~20
    # row groups per file
    ev = load_tables(spark, "/root/testdata/sf0.01", ("events",))["events"] \
        .select("event_id", "value")
    base = {"parquet.block.size": str(8 * 1024)}
    un = str(tmp_path / "unsorted")
    so = str(tmp_path / "sorted")
    ev.repartition(1).write.options(**base).mode("overwrite").parquet(un)
    (ev.repartition(1).sortWithinPartitions("value")
     .write.options(**base).mode("overwrite").parquet(so))

    def hit_fraction(path, lo, hi):
        import glob
        hits = total = 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.read_metadata(f)
            names = [md.schema.column(c).name
                     for c in range(len(md.schema))]
            idx = names.index("value")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                total += 1
                if st.max >= lo and st.min <= hi:
                    hits += 1
        assert total >= 5, f"want multiple row groups, got {total}"
        return hits / total

    lo, hi = 10.0, 11.0  # narrow slice of the value domain
    f_un = hit_fraction(un, lo, hi)
    f_so = hit_fraction(so, lo, hi)
    assert f_un == 1.0          # unsorted: every row group overlaps
    assert f_so <= 0.34         # sorted: the slice lives in few groups


def test_compact_small_files_preserves_rows_and_prunes(spark, sf_dir, tmp_path):
    """Small-file compaction: 64 tiny files -> a handful of target-sized
    ones, same rows; range-sorting on the cluster key makes key-filtered
    scans read FEWER files than the fragmented layout (row-group/file
    min-max pruning restored)."""
    from pyspark.sql import functions as F

    from results_ingestor_spark.sources.jdbc_sink import compact_small_files
    from results_ingestor_spark.sources.tables import load_tables
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    frag = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(frag)

    out = str(tmp_path / "compacted")
    # tiny target so even the sf0.001 fixture yields several output
    # files — the point is the file-count collapse + range layout, not
    # the absolute size
    files_after = compact_small_files(spark, frag, out,
                                      target_file_bytes=16 * 1024,
                                      sort_cols=["user_id"])
    assert files_after < 16
    assert spark.read.parquet(out).count() == ev.count()

    # pruning: a user_id-ranged read of the compacted layout touches a
    # strict subset of files; the fragmented layout must touch all 64
    pred = F.col("user_id") < 3
    frag_touched = spark.read.parquet(frag).where(pred)
    comp_touched = spark.read.parquet(out).where(pred)
    n_frag = len({r[0] for r in
                  frag_touched.select(F.input_file_name()).distinct().collect()})
    n_comp = len({r[0] for r in
                  comp_touched.select(F.input_file_name()).distinct().collect()})
    # (a fragment can miss the predicate by luck; the layout claim is
    # "nearly all touched" vs "nearly all skipped")
    assert n_frag >= 48
    assert n_comp < files_after  # disjoint ranges -> file pruning
    assert n_comp <= 2


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: when the partitioned fact is joined
    to a dim whose selective filter is only known at RUNTIME (the
    partition filter is on the dim, not the fact), Spark must inject a
    dynamicpruning subquery into the fact scan so only matching
    partition directories are read — the scan-cost killer for the
    100 TB star-join (static pruning can't help because the fact-side
    predicate doesn't exist until the dim side runs).  Pins the
    `dynamicpruning` expression in the fact's PartitionFilters and
    result parity with the unpartitioned join.

    Two non-obvious preconditions pinned here: the dim's filter must be
    on a column UNRELATED to the join key (a filter on the key itself
    propagates statically and DPP never appears), and it must be a
    shape `isLikelySelective` accepts (EqualTo/IN/LIKE — a bare
    boolean-attribute filter does NOT qualify and silently disables
    the rewrite)."""
    out = str(tmp_path / "orders_by_status_dpp")
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    write_parquet(orders, out, partition_by=("o_orderstatus",))
    fact = spark.read.parquet(out)
    # The dim filter is on a column UNRELATED to the join key, so no
    # static constraint can reach the fact — only DPP can prune it.
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "closed"), ("P", "pending")],
        "o_orderstatus string, status_class string"
    ).where("status_class = 'open'")
    joined = fact.join(dim, "o_orderstatus").drop("status_class")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = orders.where("o_orderstatus = 'O'").count()
    assert joined.count() == expected
