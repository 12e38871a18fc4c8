"""Typed sinks — parity with ingestor_precinct.py:186-218.

The reference appends row-wise through SQLAlchemy ``to_sql`` (its
scalability ceiling — one INSERT per row).  The Spark JDBC sink writes
per-partition batched INSERTs from every executor in parallel; types
are enforced by casting to the canonical StructType *before* the write
(align_schema), replacing the reference's 27-entry dtype map.

Also provided: the reference's commented-out TSV append sink
(ingestor_precinct.py:186-191) and the engine-native partitioned
Parquet sink (the format the 100 TB deployment actually uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jdbc_append(df: DataFrame, url: str, table: str,
                      user: str | None = None, password: str | None = None,
                      batchsize: int = 10_000,
                      num_partitions: int | None = None,
                      driver: str | None = None) -> None:
    """Append to an RDBMS table (contest_precinct / contest_county).

    ``batchsize`` controls rows per INSERT batch — the deliberate
    contrast to the reference's row-wise to_sql.  ``num_partitions``
    caps concurrent connections (coalesce, no shuffle).  ``driver``
    names the JDBC driver class when the URL scheme alone can't
    resolve it (e.g. embedded Derby in tests).
    """
    if num_partitions:
        df = df.coalesce(num_partitions)
    w = (df.write.format("jdbc")
         .option("url", url)
         .option("dbtable", table)
         .option("batchsize", str(batchsize))
         .mode("append"))
    if user is not None:
        w = w.option("user", user)
    if password is not None:
        w = w.option("password", password)
    if driver is not None:
        w = w.option("driver", driver)
    w.save()


def write_tsv_append(df: DataFrame, path: str, header: bool = False) -> None:
    """The reference's alternative file sink (ingestor_precinct.py:186-191)."""
    (df.write.option("sep", "\t").option("header", str(header).lower())
     .mode("append").csv(path))


def write_parquet(df: DataFrame, path: str,
                  partition_by: tuple[str, ...] = ()) -> None:
    """Engine-native sink: partitioned Parquet.  For election data,
    partitioning by election_date gives partition pruning on the
    dominant filter axis."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_small_files(spark, in_path: str, out_path: str,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        sort_cols: list[str] | None = None) -> int:
    """Small-file compaction — the maintenance op every long-running
    ingest pipeline needs (streaming sinks and per-batch appends leave
    thousands of KB-sized files; each costs a task + open at read
    time).  Sizes the output file count from the actual input bytes /
    ``target_file_bytes`` (not row counts — row width varies), then
    coalesce()s — a narrow, shuffle-free repack.  Returns the output
    file count.

    With ``sort_cols`` the repack is ``repartitionByRange`` on those
    columns instead (one shuffle, sampled range boundaries): each
    output file then owns a disjoint key range, so key-filtered scans
    prune whole files via row-group min/max again — the
    OPTIMIZE-with-cluster-key shape.  Pinned in tests/test_sinks.py:
    a ranged read touches ≤2 compacted files where the fragmented
    layout touched ~all 64.

    At 100 TB this runs per-partition-directory (compact yesterday's
    partition while today appends), and the listing comes from the
    metastore, not a filesystem walk."""
    import math
    import os

    df = spark.read.parquet(in_path)
    # input bytes from the scan's own file listing (relation stats =
    # sum of file sizes before any filters)
    total = int(df._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes())
    n = max(1, math.ceil(total / target_file_bytes))
    out = (df.repartitionByRange(n, *sort_cols) if sort_cols
           else df.coalesce(n))
    out.write.mode("overwrite").parquet(out_path)
    return sum(1 for f in os.listdir(out_path) if f.endswith(".parquet"))
