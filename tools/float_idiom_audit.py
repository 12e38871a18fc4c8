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
import io
import os
import re
import sys
import tokenize

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Idiom-A sites reviewed and accepted, with the reason each is exact.
# The shared-IEEE-expression device: when BOTH engines evaluate the
# textually identical expression over identical exact inputs (integer
# counts, shared double literals), every IEEE op is correctly rounded
# identically, so floor/ceil/round of the result matches bit-for-bit —
# these are genuinely-double computations, not integer intent.
_IDIOM_A_WHITELIST = {
    # SES snap device (r8): floor((x)*10^k + 0.5) yields an exact
    # integer-valued double; the long cast is exact and the division
    # by 10^k is the one shared rescale — the intended round()-free
    # wire snap (exact.snap_double), not integer-intent division
    'stats_q.py: * 1e9 + F.lit(0.5)).cast("long") / 1e9)',
    'stats_q.py: (F.floor((num / den) * 1e6 + F.lit(0.5)).cast("long")',
    # DSIR mean-log-weight snap (r9 draw-5 finding): floor(mean*1e6
    # + 0.5) over the DECIMAL-summed mean — the same snap_double
    # device; the bigint cast is exact and /1e6 is the shared rescale
    'corpus_q.py: * 1000000.0 + F.lit(0.5)).cast("bigint")',

    # bit extraction: numerator is 0 or exactly 2^i → quotient is the
    # exact dyadic 0.0/1.0 (morton interleave)
    "advanced_q.py: ub = ((F.col(\"u\").bitwiseAND(F.lit(1 << i))) / (1 << i)).cast(\"int\")",
    "advanced_q.py: hb = ((F.col(\"h\").bitwiseAND(F.lit(1 << i))) / (1 << i)).cast(\"int\")",
    # bloom sizing: ceil/round over -(n * lnp)/(ln2*ln2) where lnp/ln2
    # are PYTHON literals inlined into BOTH engines (round 6), n is an
    # exact BIGINT→double — shared-IEEE expression; round(x, 0) ties
    # resolve half-away-from-zero in both engines for positive x
    "dedup_q.py: / (ln2 * ln2)).cast(\"long\")",
    "dedup_q.py: .cast(\"long\")).alias(\"k\"),",
    # peak-hour: round(angle*24/2pi, 0) over a 6-dp-snapped (c, s)
    # pair — the snap quantizes summation noise before atan2, and the
    # oracle replays the identical expression; verified at 3 SFs
    "events_q.py: (F.round(ang * 24 / (2 * _math.pi), 0).cast(\"long\") % 24)",
    # equi-width histogram bins: floor of the identical double
    # expression over identical inputs in both engines (documented
    # shared-IEEE device at the @query site)
    "functions_q.py: F.lit(9)).cast(\"int\")",
    "stats_q.py: .cast(\"int\").alias(\"bucket\"),",
    # Neyman allocation: floor(1000 * wt / wtot) of the shared double
    # expression (wt = n_h * sd_h, both sides compute the same way)
    "pipeline_q.py: .cast(\"long\").alias(\"n_sampled_of_1000\"))",
}


def _strip_comments(src: str) -> str:
    """Blank out COMMENT tokens (spaces, same width) so every other
    byte — including ``#`` inside string literals (regex patterns, SQL
    fragments, format strings) — survives with its exact offsets.

    The previous ``re.sub(r"#[^\\n]*", "", src)`` also truncated string
    literals containing '#', which could delete a division-then-cast on
    the same line or corrupt the receiver-span paren walk — silent
    false negatives (ADVICE r6).  The tokenize module knows the
    difference; comments never span lines, so a per-line splice is
    position-exact.

    Line splitting is on ``"\\n"`` ONLY: ``str.splitlines`` also
    breaks on \\f/\\x0b/\\x85/\\u2028, which the Python tokenizer does
    NOT count as line boundaries — one such byte anywhere in the file
    would desynchronize every later comment's (row, col) against the
    list and silently blank real code.
    """
    lines = [ln + "\n" for ln in src.split("\n")]
    lines[-1] = lines[-1][:-1]  # src has no trailing extra newline
    try:
        comments = [
            t for t in tokenize.generate_tokens(io.StringIO(src).readline)
            if t.type == tokenize.COMMENT]
    except (tokenize.TokenError, SyntaxError, IndentationError):
        # un-tokenizable source (shouldn't happen for importable plan
        # modules): keep the audit running on the raw text — a false
        # POSITIVE at worst, never a silent skip
        return src
    for t in comments:
        (srow, scol), (erow, ecol) = t.start, t.end
        line = lines[srow - 1]
        lines[srow - 1] = line[:scol] + " " * (ecol - scol) + line[ecol:]
    return "".join(lines)


def _receiver_span(src: str, cast_pos: int) -> str:
    """The expression text the ``.cast`` at ``cast_pos`` applies to:
    if the preceding char closes a paren, walk back to its matching
    open; otherwise walk back over an attribute/identifier chain
    (which cannot contain a division)."""
    j = cast_pos - 1
    while j >= 0 and src[j] in " \t\n\\":
        j -= 1
    if j < 0 or src[j] != ")":
        return ""
    depth, k = 1, j - 1
    while k >= 0 and depth:
        if src[k] == ")":
            depth += 1
        elif src[k] == "(":
            depth -= 1
        k -= 1
    return src[k + 1:j + 1]


def _idiom_a() -> list[str]:
    hits = []
    for f in sorted(glob.glob("results_ingestor_spark/plans/*.py")):
        src = open(f).read()
        code = _strip_comments(src)  # position-exact; see _strip_comments
        for m in re.finditer(r'\.cast\("(?:long|int|bigint)"\)', code):
            recv = _receiver_span(code, m.start())
            # a real '/' division inside the cast receiver (not '//'
            # inside an embedded SQL string — those are the ORACLE's
            # floor-div, and not division inside string literals)
            bare = re.sub(r"(\"\"\".*?\"\"\"|'[^'\n]*'|\"[^\"\n]*\")",
                          "", recv, flags=re.S)
            if not re.search(r"(?<!/)/(?!/)", bare):
                continue
            line_no = code[:m.start()].count("\n") + 1
            line = src.splitlines()[line_no - 1].strip()
            key = f"{os.path.basename(f)}: {line}"
            if key not in _IDIOM_A_WHITELIST:
                hits.append(f"{f}:{line_no}: {line}")
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


def _idiom_c() -> list[str]:
    """One-sided snap migration (the class the r10 draw-6 sf0.1 sweep
    exposed on quality_classifier_calibration): the Spark side uses
    the exact.snap_double floor-snap while the oracle still calls
    round() — they agree everywhere EXCEPT at .5-grid straddles and
    negative zero, i.e. exactly where the snap exists to differ, so a
    mixed pair is a latent hash-red waiting for an unlucky corpus.
    Flag every oracled entry whose Spark source snaps, has no F.round
    left, yet whose oracle text still rounds — the migration must move
    BOTH sides (helpers built outside the entry's decorator span are
    how one side gets missed)."""
    import inspect

    import results_ingestor_spark.plans as plans
    findings = []
    for name, fn in plans.QUERIES.items():
        oracle = plans.ORACLES.get(name)
        if oracle is None:
            continue
        try:
            src = inspect.getsource(fn)
        except OSError:
            continue
        if ("snap_double" in src and not _round_scales(src, "F.round(")
                and _round_scales(oracle, "round(")):
            findings.append(
                f"{name}: Spark side floor-snaps but the oracle still "
                f"rounds at scales "
                f"{sorted(_round_scales(oracle, 'round('))} — migrate "
                f"the oracle side too")
    return findings


def main() -> int:
    a = _idiom_a()
    b = _idiom_b()
    c = _idiom_c()
    print(f"idiom A (division->int cast outside whitelist): {len(a)}")
    for h in a:
        print("  " + h)
    print(f"idiom B (Spark round scale absent from oracle): {len(b)}")
    for h in b:
        print("  " + h)
    print(f"idiom C (oracle-only round beside a Spark snap): {len(c)}")
    for h in c:
        print("  " + h)
    return 1 if (a or b or c) else 0


if __name__ == "__main__":
    raise SystemExit(main())
