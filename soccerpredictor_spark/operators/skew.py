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
