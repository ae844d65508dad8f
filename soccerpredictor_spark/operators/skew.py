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


# --------------------------------------------------------------------------
# activity concentration (exact Lorenz points)
# --------------------------------------------------------------------------

#: Lorenz points reported: top p% of users by activity.
CONC_PCTS = (1, 5, 10, 50)


def value_concentration(events: DataFrame) -> DataFrame:
    """Exact Lorenz points of per-user activity: what share of all
    events do the top 1 / 5 / 10 / 50 % of users produce — the
    concentration readout that turns ``skew_profile``'s max/p99 into
    the partitioning decision itself (a 1%-of-keys-own-half-the-rows
    table needs salting; a flat one doesn't).

    Exact under TIES, all integers: user counts collapse to the
    (cnt, n_users_at, events_at) value table (distinct-count
    bounded, checkpointed — the cumulative pass and the totals are
    two lazy consumers); cumulating in cnt-DESC order gives, for
    each Lorenz k = ceil(p * n_users / 100), the full value-groups
    above the cutoff plus the PARTIAL tie group (k - users_above) *
    cnt_at_cutoff — so the "top k users" is the exact deterministic
    maximum any tie-breaking order could produce. One double
    division per point.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    by_cnt = _reliable_checkpoint(
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("u_at"))
        .select(
            "cnt",
            "u_at",
            (F.col("cnt").cast("decimal(38,0)") * F.col("u_at")).alias(
                "e_at"
            ),
        )
    )
    w = Window.orderBy(F.col("cnt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = by_cnt.select(
        "cnt",
        "u_at",
        "e_at",
        F.coalesce(F.sum("u_at").over(w), F.lit(0)).alias("u_above"),
        F.coalesce(F.sum("e_at").over(w), F.lit(0).cast("decimal(38,0)")).alias(
            "e_above"
        ),
    )
    totals = by_cnt.agg(
        F.sum("u_at").alias("n_users"), F.sum("e_at").alias("n_events")
    )
    grid = events.sparkSession.createDataFrame(
        [(p,) for p in CONC_PCTS], "pct int"
    )
    staged = (
        cum.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(grid))
        .withColumn(
            "k", F.expr("(n_users * pct + 99) div 100")
        )
        .filter(F.col("u_above") + F.col("u_at") >= F.col("k"))
    )
    # cutoff row per pct = the LARGEST cnt whose inclusive cum reaches k
    top_events = F.col("e_above") + (
        (F.col("k") - F.col("u_above")).cast("decimal(38,0)")
        * F.col("cnt").cast("decimal(38,0)")
    )
    picked = (
        staged.groupBy("pct")
        .agg(
            F.max(F.struct(F.col("cnt"), top_events.alias("te"))).alias("s"),
            F.max("k").alias("k_users"),
            F.max("n_events").alias("n_events"),
        )
        .select(
            "pct",
            "k_users",
            F.col("s.te").alias("top_events_d38"),
            "n_events",
        )
    )
    return picked.select(
        "pct",
        "k_users",
        F.col("top_events_d38").cast("double").alias("top_events"),
        (
            F.col("top_events_d38").cast("double")
            / F.col("n_events").cast("double")
        ).alias("share"),
    ).orderBy("pct")


def value_concentration_sql() -> str:
    pcts = ", ".join(f"({p})" for p in CONC_PCTS)
    return f"""
WITH by_user AS (SELECT user_id, COUNT(*) AS cnt FROM events
                 GROUP BY user_id),
by_cnt AS (
  SELECT cnt, COUNT(*) AS u_at, CAST(cnt AS HUGEINT) * COUNT(*) AS e_at
  FROM by_user GROUP BY cnt
),
cum AS (
  SELECT cnt, u_at, e_at,
         COALESCE(SUM(u_at) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS u_above,
         COALESCE(SUM(e_at) OVER (ORDER BY cnt DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(0 AS HUGEINT)) AS e_above
  FROM by_cnt
),
totals AS (
  SELECT CAST(SUM(u_at) AS BIGINT) AS n_users, SUM(e_at) AS n_events
  FROM by_cnt
),
grid(pct) AS (VALUES {pcts}),
staged AS (
  SELECT pct, cnt, u_at, e_at, u_above, e_above, n_users, n_events,
         (n_users * pct + 99) // 100 AS k
  FROM cum CROSS JOIN totals CROSS JOIN grid
  WHERE u_above + u_at >= (n_users * pct + 99) // 100
),
picked AS (
  SELECT pct, MAX(k) AS k_users, MAX(n_events) AS n_events,
         MAX(struct_pack(cnt := cnt,
             te := e_above + CAST(k - u_above AS HUGEINT) * cnt)) AS s
  FROM staged GROUP BY pct
)
SELECT CAST(pct AS INT) AS pct, CAST(k_users AS BIGINT) AS k_users,
       CAST(CAST(s.te AS VARCHAR) AS DOUBLE) AS top_events,
       CAST(CAST(s.te AS VARCHAR) AS DOUBLE)
         / CAST(CAST(n_events AS VARCHAR) AS DOUBLE) AS share
FROM picked ORDER BY pct
"""


# --------------------------------------------------------------------------
# exact Gini coefficient of per-user activity
# --------------------------------------------------------------------------


def gini_activity(events: DataFrame) -> DataFrame:
    """Exact Gini coefficient of the per-user event-count
    distribution — the single-number inequality summary behind
    ``value_concentration``'s Lorenz points (0 = everyone equally
    active, ->1 = a handful of users own the stream):

        G = (2 * sum_i rank_i * x_i - (n+1) * sum_i x_i)
            / (n * sum_i x_i),   ranks ascending by x.

    Tie-exact and order-independent: within a tie group x is
    constant, so sum(rank * x) = x * sum(consecutive ranks) no
    matter how ties order — and the rank-sum of a group is the
    closed form u_below * u_at + u_at*(u_at+1)/2 in exact integers.
    Everything accumulates over the distinct-COUNT table (bounded,
    checkpointed: the cumulative window and the totals are two lazy
    consumers) in decimal(38,0); G is ONE division of exactly-cast
    operands.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    d38 = "decimal(38,0)"
    by_cnt = _reliable_checkpoint(
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("u_at"))
    )
    w = Window.orderBy(F.col("cnt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = by_cnt.select(
        "cnt",
        "u_at",
        F.coalesce(F.sum("u_at").over(w), F.lit(0)).alias("u_below"),
    )
    # DOUBLED rank-sum of the tie group (2*u_below*u_at +
    # u_at*(u_at+1)) — tracking 2*sum(rank*x) keeps the whole chain
    # division-free (DuckDB's / is float division even on integers;
    # Spark decimal / widens scale), and 2*S_rx feeds the numerator
    # 2*S_rx - (n+1)*S_x directly.
    rank_sum2 = (
        F.lit(2).cast(d38) * F.col("u_below").cast(d38)
        * F.col("u_at").cast(d38)
        + F.col("u_at").cast(d38) * (F.col("u_at").cast(d38) + F.lit(1))
    )
    agg = ranked.select(
        "cnt",
        "u_at",
        (F.col("cnt").cast(d38) * rank_sum2).alias("rx2"),
        (F.col("cnt").cast(d38) * F.col("u_at").cast(d38)).alias("x"),
    ).agg(
        F.sum("u_at").alias("n"),
        F.sum("rx2").alias("s_rx2"),
        F.sum("x").alias("s_x"),
    )
    num = (
        F.col("s_rx2")
        - (F.col("n").cast(d38) + F.lit(1)) * F.col("s_x")
    ).cast("double")
    den = (F.col("n").cast(d38) * F.col("s_x")).cast("double")
    return agg.select(
        F.col("n").alias("n_users"),
        F.col("s_x").cast("double").alias("n_events"),
        F.when(den > 0, num / den).alias("gini"),
    )


def gini_activity_sql() -> str:
    hug = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    num = hug.format(x="s_rx2 - (CAST(n AS HUGEINT) + 1) * s_x")
    den = hug.format(x="CAST(n AS HUGEINT) * s_x")
    return f"""
WITH by_user AS (SELECT user_id, COUNT(*) AS cnt FROM events
                 GROUP BY user_id),
by_cnt AS (SELECT cnt, COUNT(*) AS u_at FROM by_user GROUP BY cnt),
ranked AS (
  SELECT cnt, u_at,
         COALESCE(SUM(u_at) OVER (ORDER BY cnt ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS u_below
  FROM by_cnt
),
agg AS (
  SELECT CAST(SUM(u_at) AS BIGINT) AS n,
         SUM(CAST(cnt AS HUGEINT)
             * (2 * CAST(u_below AS HUGEINT) * u_at
                + CAST(u_at AS HUGEINT) * (CAST(u_at AS HUGEINT) + 1)))
           AS s_rx2,
         SUM(CAST(cnt AS HUGEINT) * u_at) AS s_x
  FROM ranked
)
SELECT n AS n_users, {hug.format(x="s_x")} AS n_events,
       CASE WHEN {den} > 0 THEN {num} / {den} END AS gini
FROM agg
"""
