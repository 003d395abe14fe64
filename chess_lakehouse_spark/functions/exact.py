"""Exact cross-engine mean rounding.

``ROUND(double_sum / n, p)`` is NOT portable: when the true quotient lands
exactly on a half at decimal p+1, Spark rounds the nearest double's full
decimal expansion with BigDecimal HALF_UP while DuckDB's floating
``round()`` works through ``x * 10^p`` arithmetic — the two can disagree by
10^-p (first observed on label_centroids at sf0.1 with p=6: 0.616992 / 192
= 0.0032135 exactly; see that operator's docstring). The portable form
keeps the scale-p sum as an INTEGER and rounds half-away-from-zero with
pure integer ops — ``(2*|s| + n) div (2*n)`` — identical in every engine;
the final ``/ 10^p`` double division has exact inputs and one
correctly-rounded result. ``suite/llm.py`` carries the matching SQL
generator for the oracles (``_sum6_sql`` / ``_mean6_sql``).

The scale-6 specializations (``SCALE6`` / ``sum6_long`` / ``mean6``) are
what the suite uses everywhere; the generic forms exist so operators that
expose a ``precision`` parameter honor it exactly (r6 postmortem: the
first integer-rounding sweep hardcoded scale 6 inside bodies that still
accepted ``precision``, silently ignoring non-default values).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 10^6 — the DECIMAL(18,6) scale factor shared with the oracle SQL.
SCALE6 = 1_000_000

#: Largest supported mean precision: the element cast is DECIMAL(18, p),
#: which needs 18 - p integer digits to stay exact.
MAX_PRECISION = 12


def _check_precision(precision: int) -> None:
    if not 0 <= precision <= MAX_PRECISION:
        raise ValueError(
            f"precision must be in [0, {MAX_PRECISION}], got {precision}"
        )


def sum_scaled_long(col: Column, precision: int = 6) -> Column:
    """Aggregate expression: exact scale-``precision`` integer sum of
    ``col``. Each ELEMENT is cast to DECIMAL(18, precision) (exact
    p-decimal value — the scale matches the multiplier, so the long cast
    is exact, never a truncation) and scaled to an integer long.

    The accumulator is the SPLIT-SUM: the long element v is divided in
    two's complement as ``v = (v >> 20)·2^20 + (v & 0xFFFFF)`` (an exact
    identity for negatives too — arithmetic shift is floor division, the
    masked remainder is in [0, 2^20)), each half summed as a PRIMITIVE
    long (Spark's fast vectorized hash-agg path), and the halves
    recombined into DECIMAL(38,0) once per GROUP. This replaces the r12
    first cut that summed DECIMAL(38,0) directly — exact, but 2-4×
    slower on agg-heavy queries (BigDecimal add per row; the non-compact
    accumulator falls off the primitive fast path; measured in
    BENCH_FULL A/B).

    Overflow safety (the r11-ADVICE class — a plain BIGINT sum aborts
    under ANSI past ~9.2e12 summed value units, which avg-chars over a
    ~9 TB source already crosses): the low sum is bounded by
    N·2^20 (aborts only past N = 2^43 ≈ 8.8e12 ROWS per group) and the
    high sum by Σ|v|/2^20 (aborts only past ~9.7e18 summed value units
    ≈ 10 exabytes of char mass per group) — both ~10^6× beyond the
    100 TB regime, loud (ANSI) if ever crossed, and documented here as
    the contract ceiling. The DuckDB oracle twin
    (suite/llm.py:_sum6_sql) accumulates in HUGEINT — both engines stay
    exact integers, so the cross-engine argument is unchanged. Returns
    DECIMAL(38,0) exactly as before (rollup staged-state layout
    unaffected); :func:`mean_scaled` consumes it via SQL integer ops,
    where decimal operands are first-class."""
    _check_precision(precision)
    v = (col.cast(f"decimal(18,{precision})") * (10**precision)).cast("long")
    hi = F.sum(F.shiftright(v, 20))
    lo = F.sum(v.bitwiseAND(F.lit((1 << 20) - 1)))
    return (
        hi.cast("decimal(38,0)") * F.lit(1 << 20).cast("decimal(38,0)")
        + lo.cast("decimal(38,0)")
    ).cast("decimal(38,0)")


def mean_scaled(s: str, n: str, precision: int = 6) -> Column:
    """Half-away-from-zero ``precision``-decimal mean from integer
    sum/count COLUMN NAMES (``DIV`` needs SQL expression form).
    Odd-symmetric, so a negated mean may be built as ``-mean_scaled(...)``."""
    _check_precision(precision)
    scale = float(10**precision)
    return F.expr(
        f"CAST(CASE WHEN {s} >= 0 THEN (2 * {s} + {n}) DIV (2 * {n}) "
        f"ELSE -((2 * (-{s}) + {n}) DIV (2 * {n})) END AS DOUBLE) / {scale!r}"
    )


def sum6_long(col: Column) -> Column:
    """Scale-6 specialization of :func:`sum_scaled_long` (the suite/oracle
    contract precision)."""
    return sum_scaled_long(col, 6)


def mean6(s6: str, n: str) -> Column:
    """Scale-6 specialization of :func:`mean_scaled`."""
    return mean_scaled(s6, n, 6)
