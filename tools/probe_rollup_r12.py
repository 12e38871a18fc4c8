"""Round-12 rollup decomposition probe (guide §1): where do
rollup_contest_county's ~1.9 s of exec go, and does the VERDICT-r11
pre-distinct two-phase shape help?

Variants, timed alternating (3 passes, min), noop sink:
  frame      : contest_precinct_frame only
  extract    : frame + 3-pass district extraction
  rollup     : full current query (baseline)
  rollup_2ph : two-phase wide-key pre-agg (VERDICT r11 item 1)
  rollup_nocoal : current shape, AQE coalescing off (DIAGNOSTIC only)
  rollup_sortagg: current shape, ObjectHashAggregate off (DIAGNOSTIC)

Prints the final AQE plan of the baseline so the post-shuffle partition
count (AQEShuffleRead) is visible.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from results_ingestor_spark.operators.district import extract_district
from results_ingestor_spark.operators.election import contest_precinct_frame
from results_ingestor_spark.operators.rollup import (
    GROUP_KEYS, _BOOL_OR_COLS, _STRING_AGG_COLS, _SUM_COLS, county_rollup)
from results_ingestor_spark.functions.agg import pg_string_agg_distinct
from results_ingestor_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def two_phase(precinct):
    """Pre-aggregate on (group keys + string cols): primitive-buffer
    codegen HashAggregate first, collect_set over the shrunken frame."""
    wide = list(GROUP_KEYS) + list(_STRING_AGG_COLS)
    p1 = precinct.groupBy(*wide).agg(
        F.max("vote_for").alias("vote_for"),
        F.max("candidacy_date").alias("candidacy_date"),
        *[F.max(c).alias(c) for c in _BOOL_OR_COLS],
        *[F.sum(F.col(c).cast("long")).alias(c) for c in _SUM_COLS])
    out = p1.groupBy(*GROUP_KEYS).agg(
        pg_string_agg_distinct("contest_type").alias("contest_type"),
        pg_string_agg_distinct("party_contest").alias("party_contest"),
        F.max("vote_for").alias("vote_for"),
        pg_string_agg_distinct("first_name").alias("first_name"),
        pg_string_agg_distinct("middle_name").alias("middle_name"),
        pg_string_agg_distinct("last_name").alias("last_name"),
        pg_string_agg_distinct("name_suffix_lbl").alias("name_suffix_lbl"),
        pg_string_agg_distinct("nick_name").alias("nick_name"),
        F.max("candidacy_date").alias("candidacy_date"),
        pg_string_agg_distinct("party_candidate").alias("party_candidate"),
        F.max("is_unexpired").alias("is_unexpired"),
        F.max("has_primary").alias("has_primary"),
        F.max("is_partisan").alias("is_partisan"),
        pg_string_agg_distinct("term").alias("term"),
        *[F.sum(c).alias(c) for c in _SUM_COLS])
    return out.select(
        "election_date", "contest_group_id", "contest_name", "contest_type",
        "party_contest", "district", "county", "vote_for", "candidate",
        "first_name", "middle_name", "last_name", "name_suffix_lbl",
        "nick_name", "candidacy_date", "party_candidate", "is_unexpired",
        "has_primary", "is_partisan", "term", "absentee_by_mail", "one_stop",
        "provisional", "election_day", "total_votes", "winner_flag")


def main():
    spark = get_spark("probe_rollup")

    def frame():
        return contest_precinct_frame(spark, SF)

    def extracted():
        return extract_district(frame(), force=True)

    variants = {
        "frame": lambda: frame(),
        "extract": lambda: extracted(),
        "rollup": lambda: county_rollup(extracted()),
        "rollup_2ph": lambda: two_phase(extracted()),
    }

    def run(name, fn, conf=None):
        old = {}
        for k, v in (conf or {}).items():
            old[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        try:
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            return time.time() - t0
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    confs = {
        "rollup_nocoal": {"spark.sql.adaptive.coalescePartitions.enabled":
                          "false"},
        "rollup_sortagg": {"spark.sql.execution.useObjectHashAggregateExec":
                           "false"},
    }
    variants["rollup_nocoal"] = variants["rollup"]
    variants["rollup_sortagg"] = variants["rollup"]

    # equality check first: 2ph must equal baseline cell-for-cell
    base = county_rollup(extracted())
    alt = two_phase(extracted())
    diff = base.exceptAll(alt).count() + alt.exceptAll(base).count()
    print(f"2ph exceptAll diff rows: {diff}", flush=True)
    assert diff == 0, "two-phase shape is NOT equivalent"

    # warm
    for name, fn in variants.items():
        run(name, fn, confs.get(name))
    samples = {n: [] for n in variants}
    for p in range(3):
        for name, fn in variants.items():
            samples[name].append(run(name, fn, confs.get(name)))
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={[round(x,3) for x in s]}",
              flush=True)

    # final AQE plan of the baseline (post-execution shows AQEShuffleRead)
    df = county_rollup(extracted())
    df.write.format("noop").mode("overwrite").save()
    print(df._jdf.queryExecution().executedPlan().toString()[:4000])


if __name__ == "__main__":
    main()
