"""Schema alignment — ingestor_precinct.py:184.

The reference concatenates the header-only schema frame with the data
frame: every canonical column absent from the data appears as all-NaN,
and column order snaps to the canonical order.  Spark realization: one
``select`` emitting every canonical column — present columns cast to
their canonical type, absent ones as typed NULL literals.  A single
narrow projection; Catalyst prunes the source scan to just the
referenced columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from results_ingestor_spark.schemas import CONTEST_PRECINCT_SCHEMA


def align_schema(df: DataFrame,
                 schema: T.StructType = CONTEST_PRECINCT_SCHEMA) -> DataFrame:
    """Project ``df`` onto the canonical schema: missing → typed NULL,
    present → cast to canonical type, canonical column order."""
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
