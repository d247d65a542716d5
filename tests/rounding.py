"""Exact model of Spark's ``F.round(double, n)`` for python test references.

Why builtin ``round()`` is the wrong reference
----------------------------------------------
Spark's ``Round`` expression on a DoubleType child evaluates
``BigDecimal(double).setScale(n, HALF_UP).toDouble``.  Scala's
``BigDecimal(d: Double)`` delegates to ``java.math.BigDecimal.valueOf(d)``,
which parses ``Double.toString(d)`` — the SHORTEST decimal string that
round-trips to ``d`` — and then rounds that decimal half-UP (ties away
from zero).  DuckDB's ``round(double, n)`` agrees on every case the
driver gate has ever exercised (the engines share half-up tie semantics).

Python's builtin ``round(x, n)`` instead rounds the EXACT BINARY value of
``x`` half-to-EVEN.  The two disagree whenever the value lands on a
half-way tie at the target scale: ``29/128 == 0.2265625`` exactly (a
dyadic rational, so binary == shortest string) rounds to ``0.226563``
half-up (Spark, DuckDB) but ``0.226562`` half-even (builtin) — the
round-13 ``cliffs_delta`` hypothesis failure.  Any integer-quotient
reference (``p/q`` with ``q`` reducing to a power of two ≥ 2**(n+1))
can construct such a tie; quotients with a factor-of-five denominator
can additionally construct shortest-repr ties (e.g. the double nearest
``1/640`` has repr ``'0.0015625'``) where builtin round consults binary
digits below the printed string.

``round_half_up`` below reproduces the JVM chain exactly: shortest repr
(Python's ``repr(float)`` and Java's ``Double.toString`` both emit the
unique shortest round-tripping decimal) -> exact decimal arithmetic ->
HALF_UP -> nearest double.  Off the tie band it agrees with builtin
``round``; on the band it agrees with the engines.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, n: int) -> float:
    """Round ``x`` to ``n`` decimal places exactly as Spark's ``F.round``
    (and DuckDB's ``round``) does on a double: shortest-decimal-string
    parse, then HALF_UP (ties away from zero), with no intermediate
    float re-rounding."""
    if x != x or x in (float("inf"), float("-inf")):
        return x
    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
