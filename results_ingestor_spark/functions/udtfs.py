"""Python UDTF surface (Spark 4) — the lateral-join form of row-fan-out.

The engine's stance is built-ins first: the production chunker is the
pure-expression plan in plans/corpus_q.py::text_chunk_windows (map-only,
codegen).  This UDTF is the same operator exposed through the UDTF API
for callers who need imperative per-row fan-out logic SQL can't state —
and the equivalence test (tests/test_udtf.py) pins that both paths
produce identical chunks, so choosing the API is a performance decision,
never a semantic one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK = 64
STRIDE = 48


@udtf(returnType="chunk_id: bigint, n_chunk_tokens: bigint, chunk_text: string")
class ChunkTextUDTF:
    """LATERAL chunk_text(text, window, stride) → overlapping token
    windows, one output row per chunk."""

    def eval(self, text: str, window: int, stride: int):
        toks = text.split(" ")
        for ci, start in enumerate(range(0, len(toks), stride)):
            piece = toks[start:start + window]
            yield ci, len(piece), " ".join(piece)


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("chunk_text", ChunkTextUDTF)
