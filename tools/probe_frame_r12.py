"""Round-12 frame decomposition: where does contest_precinct_frame's
~1.35 s go?  Tests the round-robin-sort hypothesis (guide §2.5: keyless
repartition(n) pays a local sort; hash repartition on the PK does not).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from results_ingestor_spark.operators.district import extract_district
from results_ingestor_spark.operators.election import contest_precinct_frame
from results_ingestor_spark.operators.rollup import county_rollup
from results_ingestor_spark.sources.tables import load_tables
from results_ingestor_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = get_spark("probe_frame")
    t = load_tables(spark, SF, ("lineitem", "supplier", "nation"))
    li = t["lineitem"]

    def frame_hash():
        """contest_precinct_frame with hash repartition instead of
        round-robin (monkeypatched ensure_min_parallelism)."""
        import results_ingestor_spark.operators.election as el
        orig = el.ensure_min_parallelism
        el.ensure_min_parallelism = lambda df, factor=2: df.repartition(
            64, F.col("l_orderkey"), F.col("l_linenumber"))
        try:
            return el.contest_precinct_frame(spark, SF)
        finally:
            el.ensure_min_parallelism = orig

    variants = {
        "scan_only": lambda: li,
        "scan_rep_rr": lambda: li.repartition(64),
        "scan_rep_hash": lambda: li.repartition(
            64, F.col("l_orderkey"), F.col("l_linenumber")),
        "frame": lambda: contest_precinct_frame(spark, SF),
        "frame_hash": frame_hash,
        "rollup": lambda: county_rollup(
            extract_district(contest_precinct_frame(spark, SF), force=True)),
        "rollup_hash": lambda: county_rollup(
            extract_district(frame_hash(), force=True)),
    }

    def run(fn):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for fn in variants.values():  # warm
        run(fn)
    samples = {n: [] for n in variants}
    for p in range(3):
        for name, fn in variants.items():
            samples[name].append(run(fn))
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={[round(x,3) for x in s]}",
              flush=True)


if __name__ == "__main__":
    main()
