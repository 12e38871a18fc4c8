"""Diff two bench result JSONs (BENCH_r{N}.json or raw bench.py lines).

Usage: python tools/bench_compare.py OLD NEW [--warn 1.2]

Prints per-query ratios, flags queries slower than the warn factor, and
summarizes added/removed entries.  Accepts either the driver's wrapper
format ({"parsed": {...}}) or bench.py's raw one-line JSON.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    warn = 1.2
    for a in sys.argv[1:]:
        if a.startswith("--warn"):
            warn = float(a.split("=", 1)[1] if "=" in a
                         else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    flagged = []
    for name in sorted(set(oq) | set(nq)):
        if name not in oq:
            print(f"  NEW      {name:32s}          {nq[name]:8.3f}s")
        elif name not in nq:
            print(f"  REMOVED  {name:32s} {oq[name]:8.3f}s")
        else:
            r = nq[name] / oq[name] if oq[name] else float("inf")
            mark = " <-- SLOWER" if r > warn else ""
            if r > warn:
                flagged.append(name)
            print(f"  {r:5.2f}x   {name:32s} {oq[name]:8.3f}s {nq[name]:8.3f}s{mark}")
    shared = set(oq) & set(nq)
    t_old = sum(oq[n] for n in shared)
    t_new = sum(nq[n] for n in shared)
    print(f"\nshared-entry total: {t_old:.3f}s -> {t_new:.3f}s "
          f"({t_new / t_old:.2f}x) | full totals: "
          f"{old.get('value')}s -> {new.get('value')}s")
    if flagged:
        print(f"flagged (> {warn}x): {', '.join(flagged)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
