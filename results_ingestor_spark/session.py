"""SparkSession factory tuned for the engine's scale posture.

The reference executes single-threaded pandas in a Bokeh callback
(ingestor_precinct.py:70-144) — no parallelism, no spill, no optimizer.
Here every knob is chosen for a 1000-executor / 100 TB deployment and
scaled down for local[32] testing:

* AQE on (runtime partition coalescing + skew-join splitting) so the
  county/group-by shuffles survive skewed keys without manual salting.
* shuffle.partitions sized to cores locally; on a real cluster this is
  superseded by AQE's coalescing from a high initial number.
* Arrow enabled for the few Pandas-UDF extension operators.
* Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (duckdb timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to set at runtime on an externally-created session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS) which Spark's reader rejects;
    # read as raw long ns and convert (tables.py normalizes to micros).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # checkpoint-file checksum writing stalls stateful queries on local
    # FS (writer-thread await per tiny state delta); corruption detection
    # for object-store checkpoints, not needed here.
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
}

# Confs that must be set at session-build time.
BUILD_CONFS: dict[str, str] = {
    # local[32]: one shuffle partition per core; a real cluster would use
    # a large initial count and let AQE coalesce.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # 128 MiB split targets — the parquet-scan sweet spot at scale.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # dims (region/nation/supplier/part at test SFs) always broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Single-JVM local mode does ALL execution in the driver heap; 8g on
    # this 128 GiB host GC-thrashed under the interleaved bench (measured
    # round 5: per-pass anchor spreads of 2-3x with 35-85 s spike passes
    # at 8g vs tight 1.2x spreads at 24g — same min-statistics).  A real
    # cluster sizes executor memory separately; this knob only exists for
    # local mode.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "results-ingestor-spark",
              master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's conf."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]")
    for k, v in {**BUILD_CONFS, **RUNTIME_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune_session(spark)
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not create.

    The driver hands ``queries()`` callables an externally-built session;
    this pins the confs correctness depends on (timezone, AQE).

    Memoized per session object: load_tables calls this on every query
    build, and each conf.set is a JVM round-trip.  The memo is guarded
    by a single probe of the session timezone — the one conf correctness
    depends on — so an externally re-configured session (getOrCreate
    applies new confs to the EXISTING session) still gets re-pinned.
    """
    if (getattr(spark, "_rispark_tuned", False)
            and spark.conf.get("spark.sql.session.timeZone", "") == "UTC"):
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf not runtime-settable on this build — skip
            pass
    try:
        spark._rispark_tuned = True
    except Exception:
        pass
    return spark
