"""Warm best-of-3 scaling sweep over the bench headline suite.

Usage: python tools/scale_check.py [scaled_sf_dir]
(default /tmp/scaledata/sf0.5 — generate with tools/gen_scale_corpus.py).
Prints per-entry x1/x5 times, ratios sorted descending, and one JSON line.
"""
import sys, time, json
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import bench as B
import __spark_entry__ as E
from results_ingestor_spark.session import get_spark
spark = get_spark("headlinescale")
spark.sparkContext.setLogLevel("ERROR")
qs = E.queries()
results = {}
for sf_dir, label in [("/root/testdata/sf0.1", "x1"),
                      (sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata/sf0.5", "x5")]:
    for name in B.HEADLINE:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            results.setdefault(name, {})[label] = round(best, 3)
            print(label, name, round(best, 3), flush=True)
        except Exception as ex:
            results.setdefault(name, {})[label] = f"ERR {type(ex).__name__}"
            print(label, name, "ERR", str(ex)[:120], flush=True)
print("RATIOS")
for name, r in sorted(results.items(),
                      key=lambda kv: -(kv[1]["x5"]/kv[1]["x1"]
                                       if isinstance(kv[1].get("x5"), float)
                                       and isinstance(kv[1].get("x1"), float) else 0)):
    if isinstance(r.get("x5"), float) and isinstance(r.get("x1"), float):
        print(f"{name}: {r['x1']} -> {r['x5']}  ratio {r['x5']/r['x1']:.2f}", flush=True)
    else:
        print(name, r, flush=True)
print(json.dumps(results))
