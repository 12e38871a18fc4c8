"""Sequence packing — the training-data step that concatenates documents
into fixed-token-budget rows (context windows).

Two tiers, both sharded so the sequential part never exceeds one shard:

* ``cumsum_pack_expr`` — pure window arithmetic (value-checked vs SQL):
  a document's pack is ``pre-doc cumulative tokens DIV budget`` within
  its shard.  Packs can overflow the budget by at most one document —
  the cheap, fully-declarative approximation.
* ``greedy_pack`` — exact first-fit-in-order packing: a new pack starts
  whenever adding the next document would exceed the budget.  The
  running-reset state is inherently sequential, so it runs per-shard in
  ``applyInPandas`` (Arrow-batched, one pandas group per shard).  Shards
  are independent — at 100 TB the stage parallelizes by shard and the
  only ordering requirement is within-shard, never global.

Oversized documents (n_tokens > budget) get a pack of their own in both
tiers; splitting them is a tokenizer-level concern, not a packing one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PACK_SCHEMA = "shard bigint, doc_id bigint, n_tokens bigint, pack_id bigint"


def cumsum_pack_expr(budget: int, shard_col: str = "shard",
                     order_col: str = "doc_id",
                     tokens_col: str = "n_tokens") -> F.Column:
    """Approximate pack id: floor(pre-document cumulative tokens /
    budget) within the shard.  One window, no state, SQL-twin-exact."""
    w = (Window.partitionBy(shard_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return F.floor(cum_before / F.lit(budget)).cast("long")


def greedy_pack(df: DataFrame, budget: int) -> DataFrame:
    """Exact first-fit-in-order packing per shard.

    Input columns: shard, doc_id, n_tokens (cast to long).  Output adds
    ``pack_id`` (0-based within shard).  Sequential state lives inside
    one Arrow batch group per shard — no driver involvement, no global
    sort.
    """
    import pandas as pd

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids = []
        cur, pid = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur > 0 and cur + n > budget:
                pid += 1
                cur = 0
            cur += n
            pack_ids.append(pid)
        pdf["pack_id"] = pack_ids
        return pdf

    base = df.select(F.col("shard").cast("long").alias("shard"),
                     F.col("doc_id").cast("long").alias("doc_id"),
                     F.col("n_tokens").cast("long").alias("n_tokens"))
    return base.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)
