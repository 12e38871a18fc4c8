"""results_ingestor_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of NCVotes/results-ingestor.

The reference (/root/reference) is a pandas/Bokeh ETL app: CSV ingest with
fuzzy schema mapping (ingestor_precinct.py:109-184), district extraction
(ingestor_precinct.py:165-183), a typed Postgres append sink
(ingestor_precinct.py:192-218), and one county-rollup aggregation
(README.md:59-91).  This package re-expresses that surface — plus the
100 TB-scale LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) — as idiomatic, declarative PySpark:
DataFrame/SQL plans optimized by Catalyst, no custom IR, Python UDFs only
where built-ins genuinely cannot express the semantics.

Layout:
  session.py     SparkSession factory + scale-oriented conf
  schemas.py     canonical election StructTypes (schema_precinct.csv:1)
  sources/       CSV sniffing reader, parquet tables, staging, JDBC sink
  operators/     ingest ops, district extraction, rollup, dedup, similarity,
                 text analysis, multimodal plumbing
  functions/     cross-engine deterministic expression helpers
  plans/         the query library exported through __spark_entry__.py
  streaming/     structured-streaming variants over the events table
"""

__version__ = "0.1.0"
