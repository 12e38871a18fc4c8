"""Mechanical round()→floor-snap migration assistant (round 10).

Rewrites, within NAMED @query entries of a plan module, every
``F.round(expr, k)`` (Spark side) to ``exact.snap_double_col(expr, k)``
and every ``round(expr, k)`` (oracle SQL side) to the string twin
``CAST(floor((expr) * 10^k.0 + 0.5) AS BIGINT) / 10^k.0`` — the shared
device of plans/exact.py that closes all three pinned cross-engine
round() divergence modes (tests/test_round_semantics.py).

Paren-aware (the expr argument may contain nested calls and commas);
scale-0 sites are left untouched and listed (they are usually integer
intent with their own reviewed semantics — migrate by hand if needed).
The tool edits the file IN PLACE; review with `git diff`, then
re-verify every touched entry with tools/check_correctness.py at both
SFs and on lottery corpora.  Every rewrite is printed.

Usage: python tools/migrate_round.py <module.py> <entry> [entry ...]
"""

from __future__ import annotations

import os
import re
import sys

_QUERY_RE = re.compile(r'^@query\(\s*"([a-zA-Z0-9_]+)"', re.M)


def _entry_spans(text: str) -> dict[str, tuple[int, int]]:
    """name -> (start, end) character span from its @query decorator to
    the next top-level @query decorator (or EOF)."""
    hits = list(_QUERY_RE.finditer(text))
    spans = {}
    for i, m in enumerate(hits):
        end = hits[i + 1].start() if i + 1 < len(hits) else len(text)
        spans[m.group(1)] = (m.start(), end)
    return spans


def _match_call(text: str, open_paren: int) -> tuple[list[str], int]:
    """Split the args of the call whose '(' is at open_paren into
    top-level pieces; return (args, index just past the ')')."""
    depth, i, args, cur = 1, open_paren + 1, [], []
    quote = None
    while i < len(text):
        ch = text[i]
        if quote:
            cur.append(ch)
            if ch == quote and text[i - 1] != "\\":
                quote = None
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "([{":
            depth += 1
            cur.append(ch)
        elif ch in ")]}":
            depth -= 1
            if depth == 0:
                args.append("".join(cur).strip())
                return args, i + 1
            cur.append(ch)
        elif ch == "," and depth == 1:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    raise ValueError("unbalanced parens")


def _collapse(expr: str) -> str:
    """Collapse a multi-line arg expression to one line (the rewrite
    target is a single call; source newlines/indent inside the arg
    would otherwise survive into odd places)."""
    return re.sub(r"\s+", " ", expr).strip()


def migrate(path: str, names: list[str]) -> int:
    text = open(path).read()
    spans = _entry_spans(text)
    missing = [n for n in names if n not in spans]
    if missing:
        raise SystemExit(f"entries not found in {path}: {missing}")
    n_rewrites = 0
    # Rewrite back-to-front so earlier spans keep their offsets.
    for name in sorted(names, key=lambda n: -spans[n][0]):
        start, end = spans[name]
        seg = text[start:end]
        out, i = [], 0
        while True:
            fs = seg.find("F.round(", i)
            ps = seg.find("round(", i)
            # bare round( that is not F.round( and not part of an
            # identifier like xround(
            while ps != -1 and (
                    (ps >= 2 and seg[ps - 2:ps] == "F.")
                    or (ps >= 1 and (seg[ps - 1].isalnum()
                                     or seg[ps - 1] in "_."))):
                ps = seg.find("round(", ps + 1)
            nxt = min(x for x in (fs, ps) if x != -1) \
                if (fs != -1 or ps != -1) else -1
            if nxt == -1:
                out.append(seg[i:])
                break
            is_spark = (nxt == fs)
            out.append(seg[i:nxt])
            open_paren = nxt + (len("F.round(") if is_spark
                                else len("round(")) - 1
            args, after = _match_call(seg, open_paren)
            if len(args) != 2 or not re.fullmatch(r"\d+", args[1]) \
                    or args[1] == "0":
                kind = "scale-0" if (len(args) == 2 and args[1] == "0") \
                    else "non-literal-scale"
                print(f"SKIP {name}: {kind} "
                      f"{seg[nxt:after][:60]!r}")
                out.append(seg[nxt:after])
                i = after
                continue
            expr, k = _collapse(args[0]), int(args[1])
            if is_spark:
                rep = f"exact.snap_double_col({expr}, {k})"
            else:
                p = 10 ** k
                # rescale divisor CAST to DOUBLE: Spark types a bare
                # decimal literal as DECIMAL and BIGINT/DECIMAL as
                # DECIMAL — a DECWIRE violation when the text is shared
                # via F.expr (exact.snap_double docstring)
                rep = (f"CAST(floor(({expr}) * {p}.0 + 0.5) AS BIGINT)"
                       f" / CAST({p}.0 AS DOUBLE)")
            print(f"REWRITE {name} [{'spark' if is_spark else 'sql'}]"
                  f" scale={k}: {expr[:70]}")
            out.append(rep)
            n_rewrites += 1
            i = after
        text = text[:start] + "".join(out) + text[end:]
        # spans after this one are unaffected (we go back-to-front)
    if n_rewrites and "from results_ingestor_spark.plans import exact" \
            not in text:
        text = text.replace(
            "from results_ingestor_spark.plans.registry import query",
            "from results_ingestor_spark.plans import exact\n"
            "from results_ingestor_spark.plans.registry import query", 1)
        print("ADDED exact import")
    open(path, "w").write(text)
    print(f"{n_rewrites} rewrites in {os.path.basename(path)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(migrate(sys.argv[1], sys.argv[2:]))
