"""Materialize a LOTTERY corpus — a deterministic perturbation of a
base sf directory that simulates the grading driver's per-round corpus
regeneration (round 8; VERDICT r7 "corpus lottery" thread).

Every hash-red driver cell since round 4 was green locally and red
only on the driver's own data: the local corpus is one draw from the
generator, the driver's is another, and a query whose cross-engine
parity silently depends on lucky data (clean 2-decimal money values,
no .5-boundary rounds, no float ties at a top-k cut) passes here and
fails there.  This tool manufactures the unlucky draw on purpose:

* events.value, orders.o_totalprice, lineitem.l_extendedprice are
  multiplied by a draw-specific near-1 constant (DRAWS table below),
  so the money columns carry FULL-precision doubles (the local base
  is mostly clean 2-dp) — stressing every floor(x*100+0.5) / cast /
  round(x, k) ingestion path with >2-decimal reprs.
* timestamps/dates shift by a per-key amount (user_id % hour_mod
  hours, orderkey % day_mod days, per DRAWS), moving week/day/hour
  bucket boundaries and session gaps; lineitem shifts by its ORDER's
  key so order→ship relationships survive.
* documents.text gains a per-doc suffix token (' zq<doc_id%doc_mod>'),
  changing vocabulary counts, n-gram sets, and dedup/shingle ties.
* embeddings are component-scaled by a draw-specific constant (norms
  move; cosine ranks mostly survive, top-k tie structure does not).
* dims (region/nation/customer/supplier/part) copy unchanged.

Both engines read the SAME perturbed parquet, so any
tools/check_correctness.py failure on this corpus is a genuine
data-dependent cross-engine divergence that the pinned local corpus
cannot see — the exact class the driver's regenerated corpus probes
every round.

Usage:
    python tools/gen_lottery_corpus.py [base_sf_dir] [out_dir] [draw]
    # defaults: /root/testdata/sf0.01 /tmp/lotterydata/sf0.01 1
    python tools/check_correctness.py /tmp/lotterydata/sf0.01

``draw`` (1-9 — the defined constant sets below; extend DRAWS to add
more) selects a deterministic perturbation, so the layer is a FAMILY
of unlucky corpora — re-running the sweep on another draw probes a
different set of boundary cells.
"""

from __future__ import annotations

import os
import sys

import duckdb

# draw → (value_mult, price_mult, hour_mod, day_mod, doc_mod, emb_mult)
DRAWS = {
    1: ("1.00703", "1.00373", 7, 11, 13, "1.003"),
    2: ("1.01013", "1.00719", 5, 13, 17, "0.99701"),
    3: ("0.99317", "1.01291", 11, 9, 19, "1.00903"),
    # draws 4-5 added round 9 (VERDICT r8 item 3: widen the battery
    # beyond the constants every earlier sweep already passed);
    # draw 5 deliberately shrinks money (sub-1 multipliers) so the
    # floor(x*100+0.5) paths see the down-rounding side too.
    4: ("1.02117", "0.99829", 13, 7, 23, "1.01409"),
    5: ("0.98391", "0.98937", 9, 17, 29, "0.99209"),
    # draws 6-7 added round 10 (VERDICT r9 item 4: the standing
    # regression watch) — fresh constants on both sides of 1 with
    # mods coprime to every earlier draw's, so the boundary cells
    # they probe are disjoint from draws 1-5.
    6: ("1.03271", "0.97613", 6, 19, 31, "0.98417"),
    7: ("0.96847", "1.03939", 10, 21, 37, "1.02711"),
    # draws 8-9 added round 11 (VERDICT r10 item 3): fresh constants
    # on both sides of 1, mods coprime to draws 1-7, aimed at the
    # freshly-migrated integer-cents moment wires — the class whose
    # expected divergence yield the r10 verdict concentrated here.
    8: ("1.04513", "0.96241", 8, 23, 41, "0.97523"),
    9: ("0.95729", "1.04831", 12, 25, 43, "1.03517"),
}

PERTURB = {
    "events": """
        SELECT event_id,
               ts + INTERVAL (user_id % {hour_mod}) HOUR AS ts,
               user_id, event_type,
               value * {value_mult} AS value,
               props
        FROM '{base}/events.parquet'""",
    "orders": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * {price_mult} AS o_totalprice,
               o_orderdate + INTERVAL (o_orderkey % {day_mod}) DAY
                 AS o_orderdate,
               o_orderpriority
        FROM '{base}/orders.parquet'""",
    "lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               l_quantity,
               l_extendedprice * {price_mult} AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus,
               l_shipdate + INTERVAL (l_orderkey % {day_mod}) DAY
                 AS l_shipdate
        FROM '{base}/lineitem.parquet'""",
    "documents": """
        SELECT * REPLACE (
               text || ' zq' || CAST(doc_id % {doc_mod} AS VARCHAR)
                 AS text)
        FROM '{base}/documents.parquet'""",
    "embeddings": """
        SELECT * REPLACE (
               list_transform(embedding, x -> x * {emb_mult})
                 AS embedding)
        FROM '{base}/embeddings.parquet'""",
}

COPY_AS_IS = ("region", "nation", "customer", "supplier", "part")


DRAW_KEYS = ("value_mult", "price_mult", "hour_mod", "day_mod",
             "doc_mod", "emb_mult")


def generate(base: str, out: str, draw: int = 1) -> None:
    if draw not in DRAWS:
        raise ValueError(
            f"draw {draw} not defined; supported draws: "
            f"{sorted(DRAWS)} (extend DRAWS to add more)")
    params = dict(zip(DRAW_KEYS, DRAWS[draw]))
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, sql in PERTURB.items():
        con.execute(
            f"COPY ({sql.format(base=base, **params)}) TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"perturbed {table}")
    for table in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{base}/{table}.parquet') TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)")
        print(f"copied    {table}")
    con.close()


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lotterydata/sf0.01"
    draw = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    generate(base, out, draw)
    print(f"lottery corpus (draw {draw}) at {out}")
