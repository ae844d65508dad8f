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


def skew_profile(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key-skew diagnostics for a prospective groupBy/join key: one row
    (n_keys, n_rows, max_cnt, top_share, p50_cnt, p99_cnt).

    The "do I need to salt?" advisor — run it on the join/agg key
    BEFORE launching the 100 TB job. top_share is the heaviest key's
    fraction of all rows (a broadcast-salting candidate when large);
    p99/p50 spread shows long-tail skew AQE's skew-join splitting will
    have to absorb.

    Shape: one map-side-combinable count per key, then a single-row
    aggregate over the (small) per-key counts — the profile costs one
    shuffle of key cardinality, never row cardinality. Percentiles are
    exact here (the per-key count table is small by definition); swap
    in approx_percentile if key cardinality itself is huge.
    """
    cnt = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    return cnt.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        (
            F.max("cnt").cast("double") / F.sum("cnt").cast("double")
        ).alias("top_share"),
        F.percentile(F.col("cnt"), F.lit(0.5)).cast("double").alias("p50_cnt"),
        F.percentile(F.col("cnt"), F.lit(0.99)).cast("double").alias("p99_cnt"),
    )


def skew_profile_sql(table: str, keys: list[str]) -> str:
    """DuckDB twin of skew_profile (SUM cast to BIGINT per the repo's
    HUGEINT convention; exact percentiles on the per-key counts)."""
    key_list = ", ".join(keys)
    return f"""
WITH cnt AS (SELECT {key_list}, COUNT(*) AS cnt FROM {table} GROUP BY {key_list})
SELECT COUNT(*) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       MAX(cnt) AS max_cnt,
       CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_share,
       CAST(quantile_cont(cnt, 0.5) AS DOUBLE) AS p50_cnt,
       CAST(quantile_cont(cnt, 0.99) AS DOUBLE) AS p99_cnt
FROM cnt
"""
