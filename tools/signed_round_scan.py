"""Empirical census of SIGNED round() wires (round-10 migration list).

Round 9 pinned three cross-engine ``round()`` divergence modes
(tests/test_round_semantics.py): the .5-straddle on the double grid,
the DECIMAL cast path, and the negative-zero sign drop.  The first two
are input-grid hazards; the third needs a NEGATIVE value within half a
grid step of zero, so every wire that can go negative is latent risk
until migrated to the sign-free ``exact.snap_double`` floor-snap.

This tool builds the migration target list mechanically instead of by
eyeballing semantics: for every registered entry whose Spark source
emits ``F.round(``, it runs the query and reports which DOUBLE output
columns actually carry negative values on the given corpus.  Run it on
the pinned corpus AND a lottery corpus (tools/gen_lottery_corpus.py) —
a wire negative on either is signed; a wire positive on both is either
positive-by-construction or still latent (the classification is
recorded per-family in COVERAGE.md when the family is adjudicated).

Usage: python tools/signed_round_scan.py [sf_dir] [name ...]
Output: one line per scanned entry —
  SIGNED <name>: col=<min> ...     (negative seen on a double column)
  posonly <name>                   (all double columns >= 0)
  noround <name>                   (no F.round in the Spark source)
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as e
    from results_ingestor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("signed-round-scan")
    qs = e.queries()

    signed: dict[str, dict[str, float]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        src = inspect.getsource(inspect.unwrap(fn))
        if "F.round(" not in src:
            print(f"noround {name}")
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as ex:  # pragma: no cover - scan robustness
            print(f"ERROR  {name}: {ex}")
            continue
        dbl = [f.name for f in sdf.schema.fields
               if f.dataType.simpleString() in ("double", "float")]
        if not dbl:
            print(f"posonly {name} (no double outputs)")
            continue
        from pyspark.sql import functions as F
        mins = sdf.agg(*[F.min(c).alias(c) for c in dbl]).collect()[0]
        from results_ingestor_spark.operators.ckpt import release_result
        release_result(sdf)
        neg = {c: mins[c] for c in dbl
               if mins[c] is not None and mins[c] < 0}
        if neg:
            signed[name] = neg
            print(f"SIGNED {name}: " + " ".join(
                f"{c}={v}" for c, v in neg.items()))
        else:
            print(f"posonly {name}")

    print(f"\n{len(signed)} signed-round entries: {sorted(signed)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
