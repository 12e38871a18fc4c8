"""Sequence-packing invariants: greedy applyInPandas vs a pure-Python
reference, plus the budget/contiguity contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from results_ingestor_spark.operators.packing import greedy_pack


def _reference_pack(rows, budget):
    """Pure-Python first-fit-in-order replica."""
    out = {}
    for shard in {r[0] for r in rows}:
        docs = sorted((r for r in rows if r[0] == shard), key=lambda r: r[1])
        cur, pid = 0, 0
        for _, doc_id, n in docs:
            if cur > 0 and cur + n > budget:
                pid, cur = pid + 1, 0
            cur += n
            out[(shard, doc_id)] = pid
    return out


def test_greedy_pack_matches_reference(spark):
    rows = [(s, s * 100 + i, 10 + (i * 37) % 90)
            for s in range(4) for i in range(25)]
    df = spark.createDataFrame(rows, "shard long, doc_id long, n_tokens long")
    got = {(r["shard"], r["doc_id"]): r["pack_id"]
           for r in greedy_pack(df, budget=128).collect()}
    assert got == _reference_pack(rows, 128)


def test_greedy_pack_budget_and_contiguity(spark, sf_dir):
    from results_ingestor_spark.plans.pipeline_q import pack_sequences_greedy
    out = pack_sequences_greedy(spark, sf_dir)
    packs = (out.groupBy("shard", "pack_id")
             .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
             .collect())
    for r in packs:
        # a pack only exceeds the budget when it holds one oversized doc
        assert r["tot"] <= 1024 or r["n"] == 1
    by_shard = {}
    for r in packs:
        by_shard.setdefault(r["shard"], set()).add(r["pack_id"])
    for ids in by_shard.values():
        assert ids == set(range(len(ids)))  # contiguous from 0


def test_oversized_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(0, 1, 50), (0, 2, 5000), (0, 3, 60)],
        "shard long, doc_id long, n_tokens long")
    got = {r["doc_id"]: r["pack_id"] for r in
           greedy_pack(df, budget=100).collect()}
    assert got == {1: 0, 2: 1, 3: 2}


def test_greedy_pack_property_random(spark):
    """Property check: for randomized shard/token inputs the Spark
    packing equals the pure-Python reference (hypothesis strategies,
    bounded examples — each example is a Spark job)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**6),
                  st.integers(1, 300)),
        min_size=1, max_size=50, unique_by=lambda t: (t[0], t[1])))
    def check(rows):
        df = spark.createDataFrame(rows,
                                   "shard long, doc_id long, n_tokens long")
        got = {(r["shard"], r["doc_id"]): r["pack_id"]
               for r in greedy_pack(df, budget=256).collect()}
        assert got == _reference_pack(rows, 256)

    check()


def test_length_bucketed_batching_beats_shuffled(spark, sf_dir):
    """The padded-batch accountant's reason to exist: on the corpus,
    length-bucketed batching must waste strictly less padding than the
    md5-shuffled baseline, and the exact token accounting must tie out
    (padded >= real, n_docs conserved)."""
    from results_ingestor_spark.plans import QUERIES

    rows = {r["strategy"]: r
            for r in QUERIES["pack_batches_length_bucketed"](
                spark, sf_dir).collect()}
    lb, sh = rows["length_bucketed"], rows["shuffled"]
    assert lb["n_docs"] == sh["n_docs"]
    assert lb["real_tokens"] == sh["real_tokens"]
    for r in (lb, sh):
        assert r["padded_tokens"] >= r["real_tokens"]
    assert lb["waste_pct"] < sh["waste_pct"]
