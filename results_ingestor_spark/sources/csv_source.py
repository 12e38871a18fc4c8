"""Result-file reader — parity with ingestor_precinct.py:27-31,109-113.

The reference sniffs each file's delimiter with csv.Sniffer, reads every
file in the staging dir with ``na_values='Not Found'``, and unions by
column name (pandas concat aligns columns, filling missing with NaN).

Spark realization:
* Sniffing stays driver-side (Spark's CSV reader needs ``sep`` up
  front) but reads ONE line per file — O(#files), not O(data).
* Files sharing a delimiter are read in a single ``spark.read.csv``
  call (one distributed scan per delimiter group, not per file).
* The cross-file union is ``unionByName(allowMissingColumns=True)`` —
  a zero-shuffle plan node; Spark concatenates partitions lazily.

At 100 TB the per-file sniff is the only sequential step; it touches
~one 4 KiB block per file and can be parallelized driver-side with a
thread pool if file counts reach millions.
"""

from __future__ import annotations

import csv
import glob
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession

NULL_SENTINEL = "Not Found"  # ingestor_precinct.py:112


def sniff_delimiter(path: str) -> str:
    """csv.Sniffer on the first line — parity with ingestor_precinct.py:27-31."""
    with open(path, newline="") as f:
        return csv.Sniffer().sniff(f.readline()).delimiter


def read_result_files(spark: SparkSession, paths: list[str] | str,
                      header: bool = True,
                      infer_schema: bool = True) -> DataFrame:
    """Read CSV/TSV result files → one DataFrame, aligned by column name.

    ``paths`` may be a glob, a directory, or an explicit list.

    ``infer_schema=False`` reads every column as string and skips the
    inference pass.  Inference costs a FULL eager scan of the input at
    plan-build time — callers that immediately cast to a known target
    schema (the canonicalize pipeline's ``align_schema``) get identical
    typed output without it, which at 100 TB is the difference between
    scanning the corpus once and twice.  The default stays True for
    exploratory parity with the reference's pandas ``read_csv``.
    """
    if isinstance(paths, str):
        if os.path.isdir(paths):
            files = sorted(glob.glob(os.path.join(paths, "*")))
        else:
            files = sorted(glob.glob(paths))
    else:
        files = list(paths)
    if not files:
        raise ValueError(f"no input files under {paths!r}")

    by_sep: dict[str, list[str]] = {}
    for f in files:
        by_sep.setdefault(sniff_delimiter(f), []).append(f)

    frames = [
        spark.read.options(header=str(header).lower(), sep=sep,
                           nullValue=NULL_SENTINEL,
                           inferSchema=str(infer_schema).lower())
        .csv(group)
        for sep, group in sorted(by_sep.items())
    ]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
