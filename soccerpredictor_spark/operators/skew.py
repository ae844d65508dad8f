"""Skew-mitigation helpers: two-stage salted aggregation.

AQE's skew-join splitting handles joins; for AGGREGATIONS over a
pathologically hot key (one key owning a large share of all rows),
the fix is salting: aggregate on (key, salt) first — spreading the
hot key over ``k`` reducers — then merge the partials per key. Both
stages are map-side-combinable, so the extra shuffle carries only
key-count x k rows.

Only decomposable aggregates (sum/count/min/max and their
compositions, e.g. mean = sum/count) can be salted this way; the
helpers here expose the common ones. Results are exactly equal to the
unsalted aggregation — the salt only changes the physical grouping —
which the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    num_salts: int = 16,
    dec: str = "decimal(18,2)",
) -> DataFrame:
    """count(*) + exact-decimal sum(value) per key, salted over
    ``num_salts`` partial groups.

    Returns (keys..., n_rows, sum_value). The salt is random-uniform
    (seeded) — its only job is to spread one hot key across reducers;
    the merge stage removes it from the result entirely.
    """
    salted = df.withColumn("__salt", (F.rand(seed=7) * num_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast(dec)).alias("__s"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        F.sum("__s").cast("double").alias("sum_value"),
    )


def plain_count_sum(
    df: DataFrame, keys: list[str], value_col: str, dec: str = "decimal(18,2)"
) -> DataFrame:
    """The unsalted twin, for equivalence testing."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).cast(dec)).cast("double").alias("sum_value"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 16,
) -> DataFrame:
    """Skew-proof shuffle equi-join: salt the big side, REPLICATE the
    small side across all salt values, join on (key, salt).

    This is the manual fix for a shuffle join whose big side has a
    pathologically hot key (AQE skew-split covers many cases, but not
    a single key too large for one task even after splitting, and not
    stream-stream joins). A hot key's rows land on ``num_salts``
    different reducers instead of one; the small side grows
    ``num_salts``-fold, which is the explicit price — use only when
    the small side is modest but too big (or unwanted) to broadcast.

    The salt is random-uniform per big-side row (seeded) and joins
    against the replicated small side on every value, so the result is
    EXACTLY the plain join — the salt never influences which rows
    match, only where they meet.
    """
    salted_big = big.withColumn("__salt", (F.rand(seed=7) * num_salts).cast("int"))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    return salted_big.join(replicated_small, [key, "__salt"]).drop("__salt")
