"""Python UDTF (Spark 4) — lateral fan-out equivalence with the
pure-expression chunker."""


def test_chunk_udtf_matches_expression_chunker(spark, sf_dir):
    import __spark_entry__ as entry
    from results_ingestor_spark.functions.udtfs import register_udtfs
    from results_ingestor_spark.sources.tables import load_tables

    register_udtfs(spark)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql("""
        SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text
        FROM udtf_docs d, LATERAL chunk_text(d.text, 64, 48) c""")
    via_expr = entry.queries()["text_chunk_windows"](spark, sf_dir)
    cols = ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]
    a = sorted(map(tuple, via_udtf.select(cols).collect()))
    b = sorted(map(tuple, via_expr.select(cols).collect()))
    assert a == b and len(a) > 0
