"""Exact cross-engine mean rounding.

``ROUND(double_sum / n, 6)`` is NOT portable: when the true quotient lands
exactly on a half at the 7th decimal, Spark rounds the nearest double's
full decimal expansion with BigDecimal HALF_UP while DuckDB's floating
``round()`` works through ``x * 1e6`` arithmetic — the two can disagree by
1e-6 (first observed on label_centroids at sf0.1: 0.616992 / 192 =
0.0032135 exactly; see that operator's docstring). The portable form keeps
the scale-6 sum as an INTEGER and rounds half-away-from-zero with pure
integer ops — ``(2*|s6| + n) div (2*n)`` — identical in every engine; the
final ``/ 1e6`` double division has exact inputs and one correctly-rounded
result. ``suite/llm.py`` carries the matching SQL generator for the
oracles (``_sum6_sql`` / ``_mean6_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 10^6 — the DECIMAL(18,6) scale factor shared with the oracle SQL.
SCALE6 = 1_000_000


def sum6_long(col: Column) -> Column:
    """Aggregate expression: exact scale-6 integer sum of ``col``. Each
    element is cast to DECIMAL(18,6) (exact 6-decimal value), scaled to an
    integer, and summed as longs — order-free and engine-exact."""
    return F.sum((col.cast("decimal(18,6)") * SCALE6).cast("long"))


def mean6(s6: str, n: str) -> Column:
    """Half-away-from-zero 6-decimal mean from integer sum/count COLUMN
    NAMES (``DIV`` needs SQL expression form). Odd-symmetric, so a negated
    mean may be built as ``-mean6(...)``."""
    return F.expr(
        f"CAST(CASE WHEN {s6} >= 0 THEN (2 * {s6} + {n}) DIV (2 * {n}) "
        f"ELSE -((2 * (-{s6}) + {n}) DIV (2 * {n})) END AS DOUBLE) / 1000000.0"
    )
