"""Skew-resistant join/aggregation helpers.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
most runtime skew by splitting oversized shuffle partitions.  Salting is
still the right tool when a single *key* is hot enough that one reduce
task would own it entirely — the classic case for zonal aggregations
where one region covers most of the space, or LSH buckets holding
boilerplate documents.  These helpers make the pattern explicit and
tested rather than ad-hoc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join where hot keys on ``big`` would skew the shuffle.

    ``big`` rows get a deterministic pseudo-random salt in
    ``[0, num_salts)`` hashed from the whole row; ``small`` is exploded
    ``num_salts``× so every (key, salt) bucket finds its match.  The
    shuffle key becomes ``on + [salt]``, spreading each hot key over
    ``num_salts`` reduce tasks.  Only ``inner`` and ``left`` joins are
    supported (the salt never invents or drops matches for these).

    Scale note: explode multiplies the small side — keep
    ``num_salts × |small|`` well under the shuffle-partition budget, or
    broadcast ``small`` instead and skip salting entirely (a broadcast
    join has no shuffle to skew).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = big_s.join(small_s, on + ["__salt"], how)
    return out.drop("__salt")


def two_phase_count(df: DataFrame, keys: list[str], num_salts: int = 32) -> DataFrame:
    """Count-per-key with a salted partial phase for hot keys.

    Spark's hash aggregate already combines map-side, which covers most
    skew; this explicit two-phase form — groupBy(keys + salt) then
    groupBy(keys) — guards the case where a single key dominates a
    whole stage's output (the partial rows are at most
    ``num_salts × |distinct keys|``).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__n").alias("n"))
