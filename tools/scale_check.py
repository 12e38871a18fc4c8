"""Warm best-of-3 scaling sweep over the bench headline suite.

Usage: python tools/scale_check.py [scaled_sf_dir]
(default /tmp/scaledata/sf0.5 — generate with tools/gen_scale_corpus.py).

Runs every bench.HEADLINE entry at sf0.1 and at the scaled corpus
through the noop sink (engine throughput, nothing collected), prints
per-entry times, the time ratios sorted descending — anything near or
above the corpus scale factor is a scaling bug to chase — and one JSON
line with the raw numbers.  This sweep is what surfaced (and then
confirmed the fixes for) the round-5 semantic-dedup k and spatial-kNN
radius density drifts; see SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    import __spark_entry__ as entry
    from results_ingestor_spark.session import get_spark

    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata/sf0.5"
    spark = get_spark("scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    results: dict[str, dict[str, object]] = {}
    # INTERLEAVED per entry (round 7): the previous all-x1-then-all-xN
    # order put every xN measurement 40+ plans deep into the session,
    # where accumulated JVM/codegen-cache/GC state inflates times — the
    # round-7 sweep read rollup_contest_county at ratio 10.51 while a
    # fresh-session re-measure gave 2.85.  Measuring each entry's x1
    # and xN back-to-back puts the same session age on both sides of
    # the ratio, which is the number the tripwire actually judges
    # (same honesty rule as bench.py's interleaved anchors).
    for name in bench.HEADLINE:
        for sf_dir, label in [("/root/testdata/sf0.1", "x1"),
                              (scaled, "xN")]:
            try:
                bench._run_noop(spark, qs, name, sf_dir)  # warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    bench._run_noop(spark, qs, name, sf_dir)
                    best = min(best, time.time() - t0)
                results.setdefault(name, {})[label] = round(best, 3)
                print(label, name, round(best, 3), flush=True)
            except Exception as ex:  # noqa: BLE001 — keep sweeping
                results.setdefault(name, {})[label] = \
                    f"ERR {type(ex).__name__}"
                print(label, name, "ERR", str(ex)[:120], flush=True)

    def ratio(r: dict[str, object]) -> float:
        a, b = r.get("x1"), r.get("xN")
        return b / a if isinstance(a, float) and isinstance(b, float) else 0.0

    print("RATIOS")
    for name, r in sorted(results.items(), key=lambda kv: -ratio(kv[1])):
        if ratio(r):
            print(f"{name}: {r['x1']} -> {r['xN']}  ratio {ratio(r):.2f}",
                  flush=True)
        else:
            print(name, r, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
