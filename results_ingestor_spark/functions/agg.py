"""Aggregate expression helpers with cross-engine (Postgres/DuckDB) parity."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pg_string_agg_distinct(col: Column | str, sep: str = "|") -> Column:
    """Postgres ``string_agg(distinct x, sep)`` parity (README.md:66-82).

    PG semantics to preserve (SURVEY §2.3 #22):
      * distinct values only, NULLs dropped;
      * all-NULL group yields NULL (``concat_ws`` alone would give '');
      * PG's order is unspecified without ORDER BY — we sort for
        determinism, and the oracle SQL sorts the same way.

    Stays entirely JVM-side: collect_set partials merge map-side, so the
    shuffle carries deduplicated sets, not raw strings.  Cardinality
    assumption: bounded distinct values per group (true for the election
    domain — a handful of name spellings per candidate per county).
    """
    c = F.col(col) if isinstance(col, str) else col
    joined = F.concat_ws(sep, F.sort_array(F.collect_set(c)))
    return F.nullif(joined, F.lit(""))
