"""Exact integer-rational emit helper shared by the statistics family.

The repo's DECIMAL(38,0) accumulators are exact, but the FINAL
microunit emit multiplies the accumulator by 2e6 — the one arithmetic
step that can overflow 38 digits AFTER every caller's own input
validation.  What overflow does depends on the session: under ANSI mode
(the pyspark 4 default, and this repo's test configuration) Spark's own
arithmetic error fires — already loud; under ``spark.sql.ansi.enabled
= false`` (common on large batch clusters precisely because ANSI turns
any bad row into a job failure) the decimal multiply returns NULL — a
SILENT wrong answer.  :func:`e6_signed` makes the emit loud in BOTH
modes (the acf_daily denominator-overflow lesson, applied to the
numerator emit).  Callers are found by grepping ``e6_signed(`` — do not
trust a hand-maintained list here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def e6_signed(num: str, den: str, err_prefix: str) -> Column:
    """Round-half-away-from-zero int64 microunits ``num/den * 1e6`` from
    DECIMAL(38,0) SQL expressions ``num`` / ``den`` (``den > 0``,
    validated by the caller), raising LOUDLY when the ``*2e6`` emit
    overflows 38 digits — non-ANSI decimal arithmetic yields NULL on
    overflow, which a column-attached guard elsewhere would never see.

    ``num`` and ``den`` are SQL expression strings (column names or
    arithmetic over them), so callers with a derived denominator (e.g.
    weekday_profile's ``7 * __n``) pass it verbatim.  The caller is
    responsible for having already validated its inputs non-NULL and
    ``den > 0`` — any NULL result here is therefore an overflow by
    construction.
    """
    raw = F.expr(
        f"CASE WHEN ({num}) >= 0"
        f"  THEN CAST((({num}) * 2000000 + ({den})) div (({den}) * 2) AS BIGINT)"
        f"  ELSE -CAST(((-({num})) * 2000000 + ({den})) div (({den}) * 2) AS BIGINT)"
        f" END"
    )
    return F.when(raw.isNotNull(), raw).otherwise(
        F.raise_error(
            F.lit(
                f"{err_prefix}: DECIMAL(38,0) overflow in the e6 emit"
                f" — or a NULL num/den input: |num|*2e6 exceeding 38"
                f" digits means the series is too large for the exact"
                f" microunit contract; a NULL input means the CALLER"
                f" violated the documented non-NULL num/den contract"
            )
        )
    )
