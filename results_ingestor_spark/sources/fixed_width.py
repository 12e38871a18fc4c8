"""Fixed-width text source — the other legacy format election/government
feeds arrive in (the reference's CSV path is `ingestor_precinct.py:61-78`;
state boards also publish column-aligned .txt exports).

Implemented as ``spark.read.text`` + substring projections: one narrow
map stage, whole-stage codegen, no Python — the layout spec compiles
into the plan, so pushdown-eligible filters on extracted columns still
prune early and the reader parallelizes by file split like any text
scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fixed_width(spark: SparkSession, path: str,
                     colspecs: dict[str, tuple[int, int]],
                     trim: bool = True,
                     null_sentinels: tuple[str, ...] = ("", "Not Found"),
                     ) -> DataFrame:
    """Read a column-aligned text file.

    ``colspecs`` maps column name → (1-based start offset, length), the
    layout-card convention.  Extracted fields are trimmed and the
    reference's ``Not Found`` sentinel (and empties) become NULL, same
    as the CSV path (`sources/csv_source.py`).
    """
    raw = spark.read.text(path)
    cols = []
    for name, (start, length) in colspecs.items():
        c = F.substring("value", start, length)
        if trim:
            c = F.trim(c)
        for s in null_sentinels:
            c = F.when(c == s, None).otherwise(c)
        cols.append(c.alias(name))
    return raw.select(*cols)
