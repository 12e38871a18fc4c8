"""Table-maintenance operators: small-file compaction.

A continuously-ingested corpus accumulates small files (per-micro-batch
bronze appends, per-county CSV conversions, straggler partitions), and
small files are the classic large-cluster scan killer: each costs an
open + footer read (openCostInBytes), listing slows, and row-group
min/max pruning degrades because tiny row groups carry no selectivity.
Periodic compaction rewrites a directory into files near a target size,
optionally range-sorted on a clustering key so the rewritten row groups
regain pruning power (the OPTIMIZE ... ZORDER shape, one dimension).

Scale contract: sizing comes from the file listing (driver metadata
only); the rewrite is one repartition (hash) or repartitionByRange
(sampled range boundaries) — a single shuffle of the data, fully
executor-parallel, no driver data path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def compact_parquet_dir(spark: SparkSession, in_dir: str, out_dir: str,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        sort_cols: list[str] | None = None,
                        ) -> dict[str, int]:
    """Rewrite ``in_dir``'s parquet into ~target-sized files at
    ``out_dir``; returns before/after file counts and byte totals.

    With ``sort_cols`` the rewrite is range-partitioned on those
    columns, so each output file owns a disjoint key range and scans
    filtered on the key prune whole files via row-group min/max.
    """
    df = spark.read.parquet(in_dir)
    files = [f for f in df.inputFiles()]

    def _local(uri: str) -> str:
        return uri.split("://")[-1] if "://" in uri else uri

    total = sum(os.path.getsize(_local(u)) for u in files)
    n_out = max(1, -(-total // max(1, target_file_bytes)))
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols)
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_dir)
    after = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes_before": int(total),
        "rows": df.count(),
    }
