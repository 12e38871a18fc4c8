"""Streaming election-night ingest — the reference's manual loop
(ingestor_precinct.py:70-225: download file, ingest, repeat as counties
report) as a Structured Streaming file-watch pipeline.

Shape: ``readStream`` over the staging directory picks up each newly
landed result file; the canonical mapping/typing pipeline (the same
operators the batch path uses — operators/mapping.py, operators/
align.py) runs on the micro-batch; ``foreachBatch`` appends to a bronze
parquet table idempotently (batch-id subdirectories make replays
overwrite, not duplicate).  The county rollup then runs as a BATCH
query over bronze — the bronze-append / gold-recompute split, because
the rollup's string_agg(distinct) state is cheap to recompute and the
reference's own rollup is a separate out-of-band SQL pass
(README.md:59-91).

At scale: the file source tracks processed files in the checkpoint
(exactly-once per file), maxFilesPerTrigger bounds micro-batch size,
and bronze appends are partition-parallel writes that never pass
through the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from results_ingestor_spark.operators.ingest import canonicalize_result_frame
from results_ingestor_spark.sources.csv_source import NULL_SENTINEL


def staging_schema(spark: SparkSession, staging_dir: str,
                   sep: str = ",") -> T.StructType:
    """Bootstrap the stream's schema from the files already present
    (streaming CSV sources need an explicit schema; one driver-side
    batch inference over the landed files is the standard bootstrap)."""
    return (spark.read.options(header="true", sep=sep,
                               nullValue=NULL_SENTINEL, inferSchema="true")
            .csv(staging_dir).schema)


def watch_result_files(spark: SparkSession, staging_dir: str,
                       schema: T.StructType, sep: str = ",",
                       max_files_per_trigger: int = 8) -> DataFrame:
    """The unbounded table of result rows as counties report."""
    return (spark.readStream
            .schema(schema)
            .option("header", "true")
            .option("sep", sep)
            .option("nullValue", NULL_SENTINEL)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .csv(staging_dir))


def run_ingest_stream(spark: SparkSession, staging_dir: str,
                      bronze_path: str, checkpoint: str,
                      sep: str = ",") -> None:
    """Drain everything currently in staging into bronze parquet
    (Trigger.availableNow: process all pending files, then stop — the
    batch-drain mode; a live deployment would leave the trigger
    continuous)."""
    schema = staging_schema(spark, staging_dir, sep=sep)
    raw = watch_result_files(spark, staging_dir, schema, sep=sep)
    canonical = canonicalize_result_frame(raw, streaming=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent per-batch directory: a replayed batch overwrites
        # its own output instead of appending duplicates
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(bronze_path, f"batch_id={batch_id}")))

    (canonical.writeStream
     .foreachBatch(write_batch)
     .option("checkpointLocation", checkpoint)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())


def read_bronze(spark: SparkSession, bronze_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(bronze_path, "*"))
