"""Static audit for the two cross-engine float idioms that produced
round 5's only driver-red cell (cohort_ltv_curve; VERDICT r5 item 4).

Idiom A — double division then integer cast in a Spark plan
(``(x / y).cast("long")``) where the DuckDB oracle floor-divides with
``//``.  IEEE division is correctly rounded, so for *exactly
representable* integer operands the truncation cannot cross an integer
boundary — but the pattern is one refactor away from unsafe (a
non-representable numerator, a negative quotient, an engine that fuses
multiply-divide), so round 6 rewrote every integer-intent site to
integer ``DIV`` / shiftright arithmetic.  This audit greps the plan
sources and FAILS if a new division-then-int-cast appears outside the
reviewed whitelist below.

Idiom B — ``F.round(expr, k)`` emitted as a result column whose oracle
twin rounds at a DIFFERENT scale (or not at all).  Matching scales keep
both engines snapping the same value to the same grid; a scale mismatch
means the hash compares different grids.  The audit extracts the
multiset of round scales from each @query body and from its oracle SQL
and flags disagreements.  (Identical scales do not *prove* identical
values — the inputs must also be the shared-expression/exact kind the
repo's determinism devices enforce — but a mismatch is always a bug.)

Usage: python tools/float_idiom_audit.py   (exit 1 on findings)
"""

from __future__ import annotations

import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Idiom-A sites reviewed and accepted, with the reason each is exact.
_IDIOM_A_WHITELIST = {
    # bit extraction: numerator is 0 or exactly 2^i → quotient is the
    # exact dyadic 0.0/1.0 (morton interleave)
    "advanced_q.py: ub = ((F.col(\"u\").bitwiseAND(F.lit(1 << i))) / (1 << i)).cast(\"int\")",
    "advanced_q.py: hb = ((F.col(\"h\").bitwiseAND(F.lit(1 << i))) / (1 << i)).cast(\"int\")",
}


def _idiom_a() -> list[str]:
    div_cast = re.compile(
        r"/[^/\n]*\n?[^\n]*\.cast\(\"(?:long|int|bigint)\"\)")
    hits = []
    for f in sorted(glob.glob("results_ingestor_spark/plans/*.py")):
        lines = open(f).read().splitlines()
        for i, ln in enumerate(lines):
            if not re.search(r'\.cast\("(?:long|int|bigint)"\)', ln):
                continue
            window = "\n".join(lines[max(0, i - 1):i + 1])
            # a '/' in the same expression window, excluding comments,
            # string bodies with URLs, and float-divides that feed
            # round() (idiom B's territory)
            code = re.sub(r"#.*", "", window)
            if not re.search(r"/(?![/*])", code):
                continue
            # division must syntactically feed the cast: reject lines
            # where the cast target is a bare column/sum (the common
            # false positive: F.sum("x").cast("long") with an unrelated
            # division nearby)
            stmt = code[code.rfind("\n") + 1:]
            before_cast = code.split('.cast(')[0]
            if "/" not in before_cast.split("(")[-1] and \
               not re.search(r"/\s*[\w.(]+\)?\s*$", before_cast):
                continue
            key = f"{os.path.basename(f)}: {ln.strip()}"
            if key not in _IDIOM_A_WHITELIST:
                hits.append(f"{f}:{i + 1}: {ln.strip()}")
    return hits


def _round_scales(text: str, opener: str) -> set[int]:
    """Scales of every ``opener(...)`` call, found by walking to the
    matching close-paren and reading the LAST top-level argument —
    regex alone mis-captures nested commas (``DECIMAL(12,2)``)."""
    out: set[int] = set()
    i = 0
    while True:
        j = text.find(opener, i)
        if j < 0:
            return out
        depth, k = 1, j + len(opener)
        last_comma = j + len(opener) - 1
        while k < len(text) and depth:
            c = text[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                last_comma = k
            k += 1
        arg = text[last_comma + 1:k - 1].strip()
        if re.fullmatch(r"\d+", arg):
            out.add(int(arg))
        i = j + len(opener)


def _idiom_b() -> list[str]:
    """Per-query round-scale census: the SET of scales used by the
    Spark body must be a subset of the oracle's scales (the oracle may
    round more — e.g. replaying intermediate snaps the Spark side does
    with Python literals)."""
    import results_ingestor_spark.plans as plans
    import inspect
    findings = []
    for name, fn in plans.QUERIES.items():
        oracle = plans.ORACLES.get(name)
        if oracle is None:
            continue
        try:
            src = inspect.getsource(fn)
        except OSError:
            continue
        s_scales = _round_scales(src, "F.round(")
        o_scales = _round_scales(oracle, "round(")
        missing = s_scales - o_scales
        if missing:
            findings.append(
                f"{name}: Spark rounds at scales {sorted(missing)} "
                f"with no matching round(..., k) in the oracle "
                f"(oracle scales: {sorted(o_scales)})")
    return findings


def main() -> int:
    a = _idiom_a()
    b = _idiom_b()
    print(f"idiom A (division->int cast outside whitelist): {len(a)}")
    for h in a:
        print("  " + h)
    print(f"idiom B (Spark round scale absent from oracle): {len(b)}")
    for h in b:
        print("  " + h)
    return 1 if (a or b) else 0


if __name__ == "__main__":
    raise SystemExit(main())
