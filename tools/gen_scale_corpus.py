"""Materialize the N-x scale-up corpora used by SCALE.md's measured
scaling evidence (rounds 4-5 kept these under /tmp, which is wiped
between rounds — this tool makes the evidence reproducible).

Usage:
    python tools/gen_scale_corpus.py [copies] [base_sf_dir] [out_dir]
    # defaults: 5 /root/testdata/sf0.1 /tmp/scaledata/sf0.5
    python tools/gen_scale_corpus.py 10 /root/testdata/sf0.1 /tmp/scaledata/sf1

Replication is designed so each workload's cost grows LINEARLY with the
copy count instead of inheriting artifacts from naive duplication:

* lineitem / orders — copy c offsets l_orderkey/o_orderkey by
  c * (max_orderkey+1) and l_partkey by c * (max_partkey+1): disjoint
  order AND part key spaces, so the co-purchase graph grows nodes
  linearly (naive duplication would densify the same nodes
  quadratically), while o_custkey is untouched (5x orders per customer
  — the realistic fact-growth axis).
* documents — copy c suffixes every token with "q{c}": cross-copy
  shingles can never match, keeping near-dup work linear in corpus
  size rather than quadratic in copies.
* events — copy c offsets user_id (disjoint user base, same per-user
  activity) and event_id; timestamps unchanged so the event-time
  window/sessionize group domain scales with users.
* embeddings — copy c cyclically shifts the 64 dimensions by c:
  norms and per-dim distributions are preserved but cross-copy cosines
  decorrelate, so kNN/near-dup candidate volume grows linearly.
* region/nation/supplier/part/customer — copied as-is (shared dims:
  the group-by domain stays fixed while fact volume grows).

Caveat: l_partkey copies exceed the part table's key range by design
(see above) — queries that INNER-join part would undercount on copies
1+; none of the measured families does.  Replicate part the same way
if you need it.
"""

from __future__ import annotations

import os
import sys

import duckdb


def generate(copies: int, base: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def rng(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) + 1 FROM '{base}/{table}.parquet'"
        ).fetchone()[0]

    ok_span = rng("orders", "o_orderkey")
    pk_span = rng("part", "p_partkey")
    doc_span = rng("documents", "doc_id")
    usr_span = 100_000
    vec_span = 10_000

    def emit(table: str, select_per_copy) -> None:
        union = " UNION ALL ".join(
            f"SELECT {select_per_copy(c)} FROM '{base}/{table}.parquet'"
            for c in range(copies))
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    emit("lineitem", lambda c: (
        f"* REPLACE (l_orderkey + {c * ok_span} AS l_orderkey, "
        f"l_partkey + {c * pk_span} AS l_partkey)"))
    emit("orders", lambda c: (
        f"* REPLACE (o_orderkey + {c * ok_span} AS o_orderkey)"))
    emit("documents", lambda c: (
        f"* REPLACE (doc_id + {c * doc_span} AS doc_id, "
        + ("text AS text" if c == 0 else
           f"array_to_string(list_transform(string_split(text, ' '), "
           f"w -> w || 'q{c}'), ' ') AS text") + ")"))
    emit("events", lambda c: (
        f"* REPLACE (event_id + {c * 10_000_000} AS event_id, "
        f"user_id + {c * usr_span} AS user_id)"))
    emit("embeddings", lambda c: (
        f"* REPLACE (vec_id + {c * vec_span} AS vec_id, "
        f"(embedding[{1 + c}:64] || embedding[1:{c}]) AS embedding)"))
    for dim in ("region", "nation", "supplier", "part", "customer"):
        con.execute(
            f"COPY (SELECT * FROM '{base}/{dim}.parquet') "
            f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)")
        print(f"{dim}: copied as-is")


if __name__ == "__main__":
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (sys.argv[3] if len(sys.argv) > 3
           else f"/tmp/scaledata/sf{copies / 10:g}")
    generate(copies, base, out)
