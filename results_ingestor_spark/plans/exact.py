"""Shared exact-ingestion expression builders (round 8, self-review).

The DECWIRE rewrite's cross-engine guarantee rests on every money /
fixed-point ingestion using the BIT-IDENTICAL expression on both sides
of every oracle pair: ``floor(x * 100 + 0.5)`` — IEEE multiply, add,
floor, all correctly rounded and engine-independent.  Before this
module the expression text was re-inlined at ~20 sites across six
plan modules, so one drifted copy (a dropped ``+ 0.5``, a swapped
cast) would silently reintroduce the exact divergence class round 8
eliminated.  These builders are the single definition; plan modules
interpolate them into BOTH the Spark expression and the DuckDB oracle
SQL (the two dialects share this syntax verbatim).

Related pinned facts (tests/test_round_semantics.py): the cents
ingestion and ``CAST(x AS DECIMAL(p,2))`` are each cross-engine
deterministic but are NOT interchangeable with each other (they pick
different cents on exact-.xx5-shortest-repr doubles like 1.005) —
never swap one for the other on a single side of a pair.
"""

from __future__ import annotations


def cents(x: str = "value") -> str:
    """Integer cents of a dollar-valued double column/expression:
    round-half-up, IEEE-identical in Spark SQL and DuckDB.  The
    argument is parenthesized so compound expressions keep their
    meaning under the ``* 100`` precedence."""
    return f"CAST(floor(({x}) * 100 + 0.5) AS BIGINT)"


def microdollars(x: str = "value") -> str:
    """Integer microdollars (cents x 10000) — the attribution wires'
    unit, fine enough for rational credit splits to stay integral."""
    return f"{cents(x)} * 10000"


def rev_e4(price: str, discount: str) -> str:
    """Discounted revenue in exact 10^-4-dollar units: integer cents
    of the price times the integer discount percent complement.

    PRECONDITION (ADVICE r8): the discount/tax fraction must carry at
    most 2 decimals — ``cents(discount)`` encodes it as an integer
    PERCENT, so a finer-grained discount (e.g. 0.055) would be
    silently truncated to the percent grid.  Cross-engine parity is
    unaffected either way (both sides share the expression verbatim),
    but the computed revenue semantics would quietly change if a
    future corpus carried >2-dp discounts.  The ≤2-dp grid is asserted
    per-corpus in tests/test_corpus_invariants.py alongside the money
    grid checks."""
    return (f"{cents(price)}"
            f" * (100 - {cents(discount)})")


def snap_int(x: str, scale: int) -> str:
    """Integer 10^-scale units of a double expression via the
    shared-IEEE floor((x)·10^scale + 0.5) device — both engines
    compute the identical BIGINT for the identical double input;
    summing these integers is exact and order-free where summing the
    raw doubles is not.  Argument parenthesized (see cents)."""
    p = 10 ** scale
    return f"CAST(floor(({x}) * {p}.0 + 0.5) AS BIGINT)"


def snap_n9(x: str) -> str:
    """snap_int at scale 9 — the standard 9-dp wire snap."""
    return snap_int(x, 9)


def snap_double(x: str, scale: int) -> str:
    """A double snapped to `scale` decimals via the shared-IEEE
    floor((x)·10^scale + 0.5) device, rescaled in one division — the
    round()-free replacement for ``round(x, scale)`` on a compared
    wire (round() itself diverges cross-engine near .5 boundaries;
    tests/test_round_semantics.py).  Half rounds toward +inf for
    negatives — identically in both engines.

    The rescale divisor is explicitly CAST to DOUBLE: Spark parses a
    bare ``1000000000.0`` literal as DECIMAL(11,1) and types
    BIGINT/DECIMAL as DECIMAL — a DECWIRE violation when this text is
    shared with the Spark side via F.expr (caught r10 on _ANOVA_F);
    DuckDB types both spellings DOUBLE with identical values."""
    p = 10 ** scale
    return (f"CAST(floor(({x}) * {p}.0 + 0.5) AS BIGINT)"
            f" / CAST({p}.0 AS DOUBLE)")


def snap_double_col(c, scale: int):
    """``snap_double`` as a PySpark Column — the Spark-side twin for
    plans built with DataFrame ops rather than F.expr strings (the
    round-10 signed-round() migration uses it to replace
    ``F.round(c, scale)`` one-for-one).  Shares the exact device of
    :func:`snap_double`: every IEEE op (multiply, add, floor) is
    correctly rounded identically in both engines, the BIGINT cast of
    the integer-valued floor result is exact, and the one rescaling
    division is shared — and BIGINT 0 rescales to +0.0 in both
    engines, closing the negative-zero divergence round() carries
    (tests/test_round_semantics.py::test_round_negative_zero_divergence).

    Domain guard shared with the string twin: |x|·10^scale must stay
    under 2^53 (exact-integer doubles) and x must be finite — NaN/Inf
    cast to BIGINT as 0/extremes in Spark but ERROR in DuckDB, so a
    wire that can go non-finite must be guarded before the snap."""
    from pyspark.sql import functions as F
    if isinstance(c, str):  # accept a column name, as F.round does
        c = F.col(c)
    p = float(10 ** scale)
    return F.floor(c * p + F.lit(0.5)).cast("bigint") / F.lit(p)
