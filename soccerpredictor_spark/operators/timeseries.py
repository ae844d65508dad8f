"""Time-series diagnostics over the event firehose.

Generalizes the reference's longitudinal game-history queries
(``SoccerPredictor/DAO/ImpalaCon.py:79-106`` — per-team time-ordered
scans) into the series operators a monitoring / feature pipeline
needs: autocorrelation, change-point detection, exponential smoothing,
and seasonal-forecast error.

All four share one shape: a single hourly pre-aggregation of the
event stream (shuffle ∝ types x hours, never the raw events twice),
then window functions over (event_type ORDER BY hour) — at 100 TB the
hourly rollup is the only pass over the fact table and everything
downstream is series-sized.

Cross-engine determinism: series values are integer counts; sums of
products stay in int64 (order-independent); doubles appear only in
final expression trees evaluated identically by Spark and DuckDB
(divisions, sqrt, literal-weighted lag chains with fixed
associativity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: autocorrelation lags reported per series.
AUTOCORR_LAGS = (1, 2, 3)
#: truncated-EWMA smoothing factor and window length.
EWMA_ALPHA = 0.3
EWMA_LAGS = 8
#: seasonal-naive period (hours) — daily seasonality.
SEASONAL_PERIOD = 24


def _hourly_counts(events: DataFrame) -> DataFrame:
    return events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))


_HOURLY_CTE = """
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)"""


def autocorr_lag(events: DataFrame) -> DataFrame:
    """Autocorrelation of each type's hourly-count series at lags
    1..3 — the seasonality/burstiness fingerprint.

    Pearson r over (x_t, x_{t-L}) pairs from the observed series
    (compose with ``date_spine_fill`` upstream for gap-filled
    semantics). All five sufficient statistics are exact int64 sums;
    the correlation is one double expression, NULL-guarded on
    zero-variance series (the ``feature_corr`` zero-denominator
    lesson).
    """
    hourly = _hourly_counts(events)
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type",
        "cnt",
        *[F.lag("cnt", lag).over(w).alias(f"lag{lag}") for lag in AUTOCORR_LAGS],
    )
    # stack the lag columns into (lag, y) rows so ALL lags aggregate in
    # ONE pass over one window projection — a per-lag union would scan
    # the event stream len(AUTOCORR_LAGS) times
    stack_args = ", ".join(f"{lag}, lag{lag}" for lag in AUTOCORR_LAGS)
    pairs = lagged.select(
        "event_type",
        F.col("cnt").alias("x"),
        F.expr(f"stack({len(AUTOCORR_LAGS)}, {stack_args})").alias("lag", "y"),
    ).filter(F.col("y").isNotNull())
    x, y = F.col("x"), F.col("y")
    return (
        pairs.groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("n").alias("n_pairs"),
            _pearson_from_sums().alias("autocorr"),
        )
    )


def _pearson_from_sums():
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return F.when(den > 0, (n * sxy - sx * sy) / den)


def _pearson_sql(prefix: str = "") -> str:
    p = prefix
    return (
        f"CASE WHEN sqrt(CAST({p}n AS DOUBLE) * CAST({p}sxx AS DOUBLE)"
        f" - CAST({p}sx AS DOUBLE) * CAST({p}sx AS DOUBLE))"
        f" * sqrt(CAST({p}n AS DOUBLE) * CAST({p}syy AS DOUBLE)"
        f" - CAST({p}sy AS DOUBLE) * CAST({p}sy AS DOUBLE)) > 0"
        f" THEN (CAST({p}n AS DOUBLE) * CAST({p}sxy AS DOUBLE)"
        f" - CAST({p}sx AS DOUBLE) * CAST({p}sy AS DOUBLE))"
        f" / (sqrt(CAST({p}n AS DOUBLE) * CAST({p}sxx AS DOUBLE)"
        f" - CAST({p}sx AS DOUBLE) * CAST({p}sx AS DOUBLE))"
        f" * sqrt(CAST({p}n AS DOUBLE) * CAST({p}syy AS DOUBLE)"
        f" - CAST({p}sy AS DOUBLE) * CAST({p}sy AS DOUBLE))) END"
    )


def autocorr_lag_sql() -> str:
    lag_cols = ", ".join(
        f"lag(cnt, {lag}) OVER (PARTITION BY event_type ORDER BY hour)"
        f" AS lag{lag}"
        for lag in AUTOCORR_LAGS
    )
    branches = " UNION ALL ".join(
        f"SELECT event_type, CAST({lag} AS INTEGER) AS lag, cnt AS x,"
        f" lag{lag} AS y FROM lagged"
        for lag in AUTOCORR_LAGS
    )
    return f"""
WITH {_HOURLY_CTE},
lagged AS (SELECT event_type, cnt, {lag_cols} FROM hourly),
pairs AS (SELECT * FROM ({branches}) b WHERE y IS NOT NULL)
SELECT event_type, lag, n AS n_pairs, {_pearson_sql()} AS autocorr
FROM (
  SELECT event_type, lag,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY event_type, lag
) s"""


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """Change-point detection per series: the hour maximizing the
    scaled CUSUM statistic |n*S_t - t*T| (prefix sum S_t, prefix count
    t, series total T, length n) — the classic mean-shift locator,
    multiplied through by n so every value stays exact int64 (no
    running double sums, whose accumulation order differs between
    engines).

    One window pass for prefixes, one tiny per-type total, one rank to
    pick the argmax (earliest-hour tie-break). ``score`` is the
    normalized double max |CUSUM| / n.
    """
    hourly = _hourly_counts(events)
    w = Window.partitionBy("event_type").orderBy("hour")
    pref = hourly.select(
        "event_type",
        "hour",
        F.sum("cnt").over(w).alias("s_t"),
        F.row_number().over(w).alias("t"),
    )
    totals = hourly.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_hours")
    )
    scored = pref.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "hour",
        "n_hours",
        F.abs(
            F.col("n_hours") * F.col("s_t") - F.col("t") * F.col("total")
        ).alias("cusum_scaled"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("cusum_scaled").desc(), F.col("hour").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hour").alias("cp_hour"),
            "cusum_scaled",
            "n_hours",
            (
                F.col("cusum_scaled").cast("double")
                / F.col("n_hours").cast("double")
            ).alias("score"),
        )
    )


def cusum_changepoint_sql() -> str:
    return f"""
WITH {_HOURLY_CTE},
pref AS (
  SELECT event_type, hour,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY hour
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_t,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour)
              AS BIGINT) AS t
  FROM hourly
),
totals AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS total,
         COUNT(*) AS n_hours
  FROM hourly GROUP BY event_type
),
scored AS (
  SELECT p.event_type, p.hour, tt.n_hours,
         abs(tt.n_hours * p.s_t - p.t * tt.total) AS cusum_scaled
  FROM pref p JOIN totals tt USING (event_type)
)
SELECT event_type, hour AS cp_hour, cusum_scaled, n_hours,
       CAST(cusum_scaled AS DOUBLE) / CAST(n_hours AS DOUBLE) AS score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY cusum_scaled DESC, hour ASC) AS rk
  FROM scored
) r WHERE rk = 1
"""


def _ewma_weights() -> list[float]:
    return [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** i for i in range(EWMA_LAGS)]


def ewma_window(events: DataFrame) -> DataFrame:
    """Truncated exponentially-weighted moving average of each hourly
    series: ewma_t = sum(w_i * x_{t-i}) / sum(w_i over present lags),
    w_i = a(1-a)^i, i < 8.

    The finite-window form replaces the recursive EWMA (whose infinite
    state defeats both SQL and bounded streaming state) with a
    fixed-depth lag chain — the weights are Python-computed double
    LITERALS, and both engines evaluate the identical left-to-right
    multiply-add chain, so results are bit-equal. One window pass.
    """
    hourly = _hourly_counts(events)
    w = Window.partitionBy("event_type").orderBy("hour")
    weights = _ewma_weights()
    lags = [F.col("cnt").cast("double")] + [
        F.lag("cnt", i).over(w).cast("double") for i in range(1, EWMA_LAGS)
    ]
    lagged = hourly.select(
        "event_type",
        "hour",
        "cnt",
        *[lags[i].alias(f"x{i}") for i in range(EWMA_LAGS)],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i, wt in enumerate(weights):
        xi = F.col(f"x{i}")
        num = num + F.coalesce(xi * F.lit(wt), F.lit(0.0))
        den = den + F.when(xi.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
    return lagged.select(
        "event_type", "hour", "cnt", (num / den).alias("ewma")
    )


def ewma_window_sql() -> str:
    weights = _ewma_weights()
    xs = ["CAST(cnt AS DOUBLE) AS x0"] + [
        f"CAST(lag(cnt, {i}) OVER (PARTITION BY event_type ORDER BY hour)"
        f" AS DOUBLE) AS x{i}"
        for i in range(1, EWMA_LAGS)
    ]
    # CAST every literal to DOUBLE: DuckDB parses bare numeric
    # literals as DECIMAL, and a CASE over decimals sums exactly,
    # diverging 1 ulp from Spark's double accumulation.
    num = "CAST(0.0 AS DOUBLE)"
    den = "CAST(0.0 AS DOUBLE)"
    for i, wt in enumerate(weights):
        num = f"{num} + COALESCE(x{i} * CAST({wt!r} AS DOUBLE), CAST(0.0 AS DOUBLE))"
        den = (
            f"{den} + CASE WHEN x{i} IS NOT NULL THEN CAST({wt!r} AS DOUBLE)"
            f" ELSE CAST(0.0 AS DOUBLE) END"
        )
    return f"""
WITH {_HOURLY_CTE},
lagged AS (SELECT event_type, hour, cnt, {", ".join(xs)} FROM hourly)
SELECT event_type, hour, cnt, ({num}) / ({den}) AS ewma FROM lagged
"""


def seasonal_naive_error(events: DataFrame) -> DataFrame:
    """Error of the seasonal-naive forecast x_t := x_{t-24} per series
    — the canonical forecasting baseline and data-drift probe.

    Reports exact-integer absolute/squared error sums and the derived
    MAE/RMSE doubles. One window pass with a 24-row lag; pairs where
    the seasonal predecessor is missing are excluded (n_pairs counts
    the rest).
    """
    hourly = _hourly_counts(events)
    w = Window.partitionBy("event_type").orderBy("hour")
    lagged = hourly.select(
        "event_type",
        "cnt",
        F.lag("cnt", SEASONAL_PERIOD).over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    err = F.abs(F.col("cnt") - F.col("prev"))
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(err).alias("abs_err_sum"),
            F.sum(err * err).alias("sq_err_sum"),
        )
        .select(
            "event_type",
            "n_pairs",
            "abs_err_sum",
            "sq_err_sum",
            (
                F.col("abs_err_sum").cast("double")
                / F.col("n_pairs").cast("double")
            ).alias("mae"),
            F.sqrt(
                F.col("sq_err_sum").cast("double")
                / F.col("n_pairs").cast("double")
            ).alias("rmse"),
        )
    )


def seasonal_naive_error_sql() -> str:
    return f"""
WITH {_HOURLY_CTE},
lagged AS (
  SELECT event_type, cnt,
         lag(cnt, {SEASONAL_PERIOD}) OVER (PARTITION BY event_type
             ORDER BY hour) AS prev
  FROM hourly
)
SELECT event_type, COUNT(*) AS n_pairs,
       CAST(SUM(abs(cnt - prev)) AS BIGINT) AS abs_err_sum,
       CAST(SUM(abs(cnt - prev) * abs(cnt - prev)) AS BIGINT) AS sq_err_sum,
       CAST(SUM(abs(cnt - prev)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae,
       sqrt(CAST(SUM(abs(cnt - prev) * abs(cnt - prev)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS rmse
FROM lagged WHERE prev IS NOT NULL
GROUP BY event_type
"""


def hourly_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonality profile per event type: event count and
    within-type share for each of the 24 wall-clock hours — the
    baseline diurnal fingerprint that ``hourly_anomaly`` and the
    seasonal-naive forecast implicitly assume.

    One aggregation keyed by (type, hour-of-day) — 24 x types output
    rows; share = n / type total, exact integers plus one double
    division (the type totals ride along via a window over the tiny
    aggregated table, not a second scan).
    """
    prof = events.groupBy(
        "event_type", F.hour(F.col("ts")).cast("int").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n"))
    tw = Window.partitionBy("event_type")
    return prof.select(
        "event_type",
        "hour_of_day",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(tw).cast("double")
        ).alias("share"),
    )


def hourly_profile_sql() -> str:
    return """
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
         COUNT(*) AS n
  FROM events GROUP BY event_type, hour(ts)
)
SELECT event_type, hour_of_day, n,
       CAST(n AS DOUBLE)
         / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
FROM prof
"""


#: trailing window length (days) for rolling_distinct.
ROLLING_DAYS = 7


def rolling_distinct(events: DataFrame) -> DataFrame:
    """Trailing 7-day distinct active users per day — the DAU/WAU
    panel. Exact distinct over a sliding window is notoriously
    unscalable done naively (a distinct per window position re-scans
    the facts); here the fact table collapses ONCE to distinct
    (day, user) rows, each of which then fans out to the <=7 window
    end-days it contributes to (a bounded explode of the small daily
    table), and one aggregation counts distinct users per end-day.

    Work is O(active_pairs x 7) regardless of event volume; the raw
    stream is touched exactly once.
    """
    daily = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    span = daily.agg(F.max("day").alias("d_max"))
    fanned = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1))).alias("off"),
        "day",
        "user_id",
    ).select(
        F.date_add(F.col("day").cast("date"), F.col("off")).alias("end_day"),
        "user_id",
    )
    return (
        fanned.groupBy("end_day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .join(
            daily.groupBy(F.col("day").cast("date").alias("end_day")).agg(
                F.countDistinct("user_id").alias("users_1d")
            ),
            "end_day",
            "left",
        )
        .crossJoin(F.broadcast(span))
        .filter(F.col("end_day") <= F.col("d_max").cast("date"))
        .select(
            # surface as TIMESTAMP: Spark DATE comes back to pandas as
            # python date objects while DuckDB DATE arrives as
            # datetime64 — the driver's type-sensitive hash would
            # diverge (the date_spine_fill convention)
            F.col("end_day").cast("timestamp").alias("end_day"),
            F.coalesce("users_1d", F.lit(0)).alias("users_1d"),
            "users_7d",
        )
    )


def rolling_distinct_sql() -> str:
    return f"""
WITH daily AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
span AS (SELECT MAX(day) AS d_max FROM daily),
fanned AS (
  SELECT day + CAST(o.off AS INTEGER) AS end_day, user_id
  FROM daily, (SELECT unnest(range({ROLLING_DAYS})) AS off) o
),
w7 AS (SELECT end_day, COUNT(DISTINCT user_id) AS users_7d
       FROM fanned GROUP BY end_day),
w1 AS (SELECT day AS end_day, COUNT(DISTINCT user_id) AS users_1d
       FROM daily GROUP BY day)
SELECT CAST(w7.end_day AS TIMESTAMP) AS end_day,
       COALESCE(w1.users_1d, 0) AS users_1d, w7.users_7d
FROM w7 LEFT JOIN w1 USING (end_day) CROSS JOIN span
WHERE w7.end_day <= d_max
"""


def weekly_change(events: DataFrame) -> DataFrame:
    """Week-over-week change per event type: weekly event counts with
    the absolute delta and percent change vs the prior week — the BI
    trend primitive on top of the same single rollup pass as the rest
    of this module (weekly grain instead of hourly).

    Counts and deltas are exact integers; pct_change is one
    NULL-guarded double division (NULL for the first week and for a
    zero prior week, in both engines).
    """
    weekly = events.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("cnt").over(w)
    return weekly.select(
        "event_type",
        "week",
        "cnt",
        prev.alias("prev_cnt"),
        (F.col("cnt") - prev).alias("delta"),
        F.when(
            prev > 0,
            (F.col("cnt") - prev).cast("double") / prev.cast("double"),
        ).alias("pct_change"),
    )


def weekly_change_sql() -> str:
    return """
WITH weekly AS (
  SELECT event_type, date_trunc('week', ts) AS week, COUNT(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('week', ts)
),
lagged AS (
  SELECT event_type, week, cnt,
         lag(cnt) OVER (PARTITION BY event_type ORDER BY week) AS prev_cnt
  FROM weekly
)
SELECT event_type, week, cnt, prev_cnt,
       cnt - prev_cnt AS delta,
       CASE WHEN prev_cnt > 0
            THEN CAST(cnt - prev_cnt AS DOUBLE) / CAST(prev_cnt AS DOUBLE)
       END AS pct_change
FROM lagged
"""


# --------------------------------------------------------------------------
# interval merge (islands & gaps) — total covered time per user
# --------------------------------------------------------------------------

#: an event "covers" this long; overlapping covers merge (seconds).
INTERVAL_COVER_S = 600


def interval_merge(events: DataFrame) -> DataFrame:
    """Merge overlapping per-user activity intervals (each event opens
    a 10-minute cover) into maximal islands — the classic
    islands-and-gaps problem behind uptime/engagement accounting:
    overlapping covers must not double-count.

    The island id is the running count of gap-starts (a new island
    begins when this event's start exceeds the running max end of all
    previous covers), computed with ONE user-keyed ordered window pass
    — never a self-join of intervals. Integer microseconds
    throughout; the per-user rollup reports islands, covered time and
    the largest island. The island aggregation reuses the window's
    user partitioning (no second fact shuffle).
    """
    cover_us = INTERVAL_COVER_S * 1_000_000
    w = Window.partitionBy("user_id").orderBy(
        F.col("s").asc(), F.col("event_id").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, -1)
    base = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("s"),
        (F.unix_micros(F.col("ts")) + cover_us).alias("e"),
    )
    marked = base.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(
            F.coalesce(F.max("e").over(run), F.lit(-(1 << 62))) < F.col("s"), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    islands = marked.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    per_island = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("is_s"),
        F.max("e").alias("is_e"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("is_e") - F.col("is_s")).alias("covered_us"),
            F.max(F.col("is_e") - F.col("is_s")).alias("max_island_us"),
        )
        .orderBy("user_id")
    )


def interval_merge_sql() -> str:
    cover_us = INTERVAL_COVER_S * 1_000_000
    return f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS s,
         epoch_us(ts) + {cover_us} AS e
  FROM events
),
marked AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN COALESCE(MAX(e) OVER (PARTITION BY user_id
                ORDER BY s ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -4611686018427387904) < s THEN 1 ELSE 0 END AS new_island
  FROM base
),
islands AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (PARTITION BY user_id
           ORDER BY s ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
per_island AS (
  SELECT user_id, island, MIN(s) AS is_s, MAX(e) AS is_e,
         COUNT(*) AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(is_e - is_s) AS BIGINT) AS covered_us,
       CAST(MAX(is_e - is_s) AS BIGINT) AS max_island_us
FROM per_island GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# linear interpolation onto a fixed time grid
# --------------------------------------------------------------------------

#: interpolation grid spacing (seconds).
INTERP_GRID_S = 3600


def linear_interpolate(events: DataFrame) -> DataFrame:
    """Linearly interpolate each user's irregular value series onto an
    hourly grid — the resampling step before any fixed-frequency
    model (the standard as-of + interpolate pattern).

    Grid points are generated per user from the user's own observed
    span (sequence(), zero-shuffle explode); the surrounding
    observations attach via ONE ordered union-window pass (the as-of
    trick: union grid points and observations, last/next values ride
    last(ignorenulls) windows) — never a range self-join.
    interp = (v0*(t1-g) + v1*(g-t0)) / (t1-t0) with integer
    cents x microsecond products in decimal(38,0) and ONE double
    division — bit-identical cross-engine. Grid points outside an
    observation pair (before first / after last obs) are NULL.
    """
    d38 = "decimal(38,0)"
    grid_us = INTERP_GRID_S * 1_000_000
    us = F.unix_micros(F.col("ts"))
    cents = F.round(F.col("value") * 100).cast("long")
    obs = events.select(
        "user_id", us.alias("t"), cents.alias("v"), F.lit(0).alias("is_grid")
    )
    span = events.groupBy("user_id").agg(
        F.min(us).alias("t0"), F.max(us).alias("t1")
    )
    # a user whose whole span sits strictly inside one grid cell has no
    # grid point: sequence() would see start > stop with a positive step
    # and raise, while the DuckDB twin's end-exclusive range() returns
    # empty — filter those spans out BEFORE exploding so both engines
    # agree (such users contribute no grid rows).
    grid = (
        span.filter(
            F.expr(f"CAST(ceil(t0 / {grid_us}) AS BIGINT) * {grid_us} <= t1")
        )
        .select(
            "user_id",
            F.explode(
                F.expr(
                    f"sequence(CAST(ceil(t0 / {grid_us}) AS BIGINT) * {grid_us},"
                    f" t1, CAST({grid_us} AS BIGINT))"
                )
            ).alias("t"),
        )
        .select("user_id", "t", F.lit(None).cast("long").alias("v"), F.lit(1).alias("is_grid"))
    )
    unioned = obs.unionByName(grid)
    # observations sort BEFORE a grid point at the same timestamp so
    # an exactly-on-grid observation interpolates to itself
    w = Window.partitionBy("user_id").orderBy(
        F.col("t").asc(), F.col("is_grid").asc()
    )
    prev_w = w.rowsBetween(Window.unboundedPreceding, 0)
    next_w = w.rowsBetween(0, Window.unboundedFollowing)
    enriched = unioned.select(
        "user_id",
        "t",
        "is_grid",
        F.last(F.when(F.col("is_grid") == 0, F.col("t")), ignorenulls=True)
        .over(prev_w)
        .alias("pt"),
        F.last(F.when(F.col("is_grid") == 0, F.col("v")), ignorenulls=True)
        .over(prev_w)
        .alias("pv"),
        F.first(F.when(F.col("is_grid") == 0, F.col("t")), ignorenulls=True)
        .over(next_w)
        .alias("nt"),
        F.first(F.when(F.col("is_grid") == 0, F.col("v")), ignorenulls=True)
        .over(next_w)
        .alias("nv"),
    )
    num = (
        F.col("pv").cast(d38) * (F.col("nt") - F.col("t")).cast(d38)
        + F.col("nv").cast(d38) * (F.col("t") - F.col("pt")).cast(d38)
    )
    den = (F.col("nt") - F.col("pt")).cast(d38)
    # a grid point that coincides with an observation returns that
    # observation even at the series edge (where the one-sided next
    # window no longer sees the same-timestamp row)
    interp = F.when(
        F.col("pt") == F.col("t"), F.col("pv").cast("double") / F.lit(100.0)
    ).when(
        F.col("pt").isNotNull() & F.col("nt").isNotNull(),
        F.when(
            F.col("nt") == F.col("pt"), F.col("pv").cast("double") / F.lit(100.0)
        ).otherwise(
            num.cast("double") / den.cast("double") / F.lit(100.0)
        ),
    )
    return (
        enriched.filter(F.col("is_grid") == 1)
        .select("user_id", "t", interp.alias("value_interp"))
        .orderBy("user_id", "t")
    )


def linear_interpolate_sql() -> str:
    grid_us = INTERP_GRID_S * 1_000_000
    return f"""
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS v, 0 AS is_grid
  FROM events
),
span AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, gs.g AS t, CAST(NULL AS BIGINT) AS v, 1 AS is_grid
  FROM span,
       LATERAL (SELECT unnest(range(
                  CAST(ceil(t0 / {grid_us}) AS BIGINT) * {grid_us},
                  t1 + 1, {grid_us})) AS g) gs
),
unioned AS (SELECT * FROM obs UNION ALL SELECT * FROM grid),
enriched AS (
  SELECT user_id, t, is_grid,
         last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t ASC, is_grid ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
         last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t ASC, is_grid ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t ASC, is_grid ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
         first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t ASC, is_grid ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM unioned
)
SELECT user_id, t,
       CASE WHEN pt = t THEN CAST(pv AS DOUBLE) / 100.0
            WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
         CASE WHEN nt = pt THEN CAST(pv AS DOUBLE) / 100.0
         ELSE CAST(CAST(CAST(pv AS HUGEINT) * CAST(nt - t AS HUGEINT)
                        + CAST(nv AS HUGEINT) * CAST(t - pt AS HUGEINT)
                        AS VARCHAR) AS DOUBLE)
              / CAST(CAST(CAST(nt - pt AS HUGEINT) AS VARCHAR) AS DOUBLE)
              / 100.0
         END
       END AS value_interp
FROM enriched WHERE is_grid = 1
ORDER BY user_id, t
"""


# --------------------------------------------------------------------------
# Kaplan-Meier survival estimation (user retention curve)
# --------------------------------------------------------------------------

#: a user whose last event is at least this long before the corpus
#: horizon (global max ts) is an observed churn; later = censored
#: (still active at the end of the observation window).
KM_CENSOR_HORIZON_H = 168  # 7 days


def kaplan_meier(events: DataFrame) -> DataFrame:
    """Kaplan-Meier retention curve over user lifetimes — the
    survival-analysis estimator every churn/retention analysis runs:
    S(t) = prod_{t_i <= t} (1 - d_i / n_i) over distinct lifetimes
    t_i with d_i observed churns and n_i users still at risk,
    correctly discounting right-censored users (active at the end of
    the window — their lifetime is a lower bound, not a death).

    Lifetime = whole hours from a user's first to last event;
    censoring is horizon-based ON THE HOUR GRID: a user whose
    last-event hour is more than KM_CENSOR_HORIZON_H below the corpus
    max last-event hour is an observed churn, later users are
    censored. Hour-grid censoring lets the whole estimator derive
    from ONE fact scan: the per-user reduction collapses straight to
    an (hour-grid) (life_h, last_h) cell table — span-bounded, not
    user-bounded — which is CHECKPOINTED and feeds the corpus-max
    scalar, the risk sets, and the survival fold without
    re-instantiating the events scan per consumer (the corr_matrix
    single-scan lesson). The at-risk counts n_i are a SUFFIX sum over
    distinct lifetimes, and each survival point is a strict LEFT FOLD
    product of the per-time factors in ascending-time order (Spark
    ``aggregate`` / DuckDB ``list_reduce`` — the double-fold
    convention), each factor one exact-integer division. The per-row
    fold re-folds the prefix slice (O(T^2) over T distinct lifetimes
    — bounded by span-hours).
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    us = F.unix_micros(F.col("ts"))
    hour_us = 3_600_000_000
    cells = _reliable_checkpoint(
        events.groupBy("user_id")
        .agg(F.min(us).alias("t0"), F.max(us).alias("t1"))
        .select(
            F.floor((F.col("t1") - F.col("t0")) / F.lit(hour_us)).alias("life_h"),
            F.floor(F.col("t1") / F.lit(hour_us)).alias("last_h"),
        )
        .groupBy("life_h", "last_h")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    gmax = cells.agg(F.max("last_h").alias("gmax_h"))
    by_t = (
        cells.crossJoin(F.broadcast(gmax))
        .select(
            "life_h",
            F.when(
                F.col("last_h") <= F.col("gmax_h") - KM_CENSOR_HORIZON_H,
                F.col("n_users"),
            )
            .otherwise(0)
            .alias("churned"),
            "n_users",
        )
        .groupBy("life_h")
        .agg(
            F.sum("churned").cast("long").alias("d"),
            F.sum("n_users").cast("long").alias("total"),
        )
    )
    w_suffix = Window.orderBy(F.col("life_h").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = by_t.withColumn("n_risk", F.sum("total").over(w_suffix))
    factor = (F.col("n_risk") - F.col("d")).cast("double") / F.col(
        "n_risk"
    ).cast("double")
    pts = at_risk.select(
        "life_h", "d", (F.col("total") - F.col("d")).alias("c"), "n_risk",
        factor.alias("f"),
    )
    arr = pts.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("life_h").alias("t"), F.col("f")))
        ).alias("fs")
    )
    surv = pts.crossJoin(F.broadcast(arr)).select(
        "life_h",
        F.col("n_risk").alias("n_risk"),
        F.col("d").alias("n_churned"),
        F.col("c").alias("n_censored"),
        F.aggregate(
            F.transform(
                F.filter(F.col("fs"), lambda x: x["t"] <= F.col("life_h")),
                lambda x: x["f"],
            ),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("survival"),
    )
    return surv.orderBy("life_h")


def kaplan_meier_sql() -> str:
    return f"""
WITH cells AS (
  SELECT CAST(floor((t1 - t0) / 3600000000.0) AS BIGINT) AS life_h,
         CAST(floor(t1 / 3600000000.0) AS BIGINT) AS last_h,
         COUNT(*) AS n_users
  FROM (SELECT user_id, MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
        FROM events GROUP BY user_id)
  GROUP BY 1, 2
),
gm AS (SELECT MAX(last_h) AS gmax_h FROM cells),
by_t AS (
  SELECT life_h,
         CAST(SUM(CASE WHEN last_h <= gmax_h - {KM_CENSOR_HORIZON_H}
                       THEN n_users ELSE 0 END) AS BIGINT) AS d,
         CAST(SUM(n_users) AS BIGINT) AS total
  FROM cells, gm GROUP BY life_h
),
at_risk AS (
  SELECT *, CAST(SUM(total) OVER (ORDER BY life_h DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS n_risk
  FROM by_t
),
pts AS (
  SELECT life_h, d, total - d AS c, n_risk,
         CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
  FROM at_risk
),
arr AS (SELECT list(f ORDER BY life_h ASC) AS fs,
               list(life_h ORDER BY life_h ASC) AS ts FROM pts)
SELECT p.life_h, p.n_risk, p.d AS n_churned, p.c AS n_censored,
       list_reduce(
         list_prepend(CAST(1 AS DOUBLE),
           list_transform(
             list_filter(range(1, len(a.fs) + 1), i -> a.ts[i] <= p.life_h),
             i -> a.fs[i])),
         (acc, x) -> acc * x) AS survival
FROM pts p, arr a
ORDER BY p.life_h
"""


# --------------------------------------------------------------------------
# seasonal decomposition (trend / daily-seasonal / remainder)
# --------------------------------------------------------------------------

#: centered moving-average half-width for the trend (full window =
#: 2*12 + 1 = 25 hours, one seasonal period + 1 for an odd center).
DECOMP_HALF_W = 12
DECOMP_W = 2 * DECOMP_HALF_W + 1


def seasonal_decompose(events: DataFrame) -> DataFrame:
    """Classical additive decomposition of each type's hourly-count
    series: cnt = trend + seasonal + remainder — the moving-average
    STL-lite every monitoring pipeline runs before alerting on the
    remainder (``seasonal_naive_error`` scores a forecast; this
    EXPLAINS the series).

    trend = centered 25-hour moving average, kept ONLY where the
    window is full (edge hours have no defined trend — standard
    decomposition behavior and the exactness key: with W constant,
    every seasonal mean is a ratio of exact integers). seasonal
    (per hour-of-day h) = mean of detrended values:
    (W * sum(cnt_h) - sum(S_h)) / (W * n_h) with S the window SUM —
    exact int64 arithmetic, ONE double division; remainder =
    cnt - S/W - seasonal evaluates the identical IEEE tree in both
    engines. Scale: one hourly rollup (the timeseries-family shared
    shape), one series-sized window pass — CHECKPOINTED before its
    two consumers (seasonal agg + remainder join) so the fact scans
    once — and the 24-row-per-type seasonal table broadcasts back.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    hourly = _hourly_counts(events)
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-DECOMP_HALF_W, DECOMP_HALF_W)
    )
    trended = _reliable_checkpoint(
        hourly.select(
            "event_type",
            "hour",
            "cnt",
            F.sum("cnt").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("wn"),
        ).filter(F.col("wn") == DECOMP_W)
    )
    hod = F.hour(F.col("hour"))
    seasonal = (
        trended.groupBy("event_type", hod.alias("hod"))
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.sum("cnt").alias("sc"),
            F.sum("s").alias("ss"),
        )
        .select(
            "event_type",
            "hod",
            (
                (F.lit(DECOMP_W) * F.col("sc") - F.col("ss")).cast("double")
                / (F.lit(DECOMP_W) * F.col("n_h")).cast("double")
            ).alias("seasonal"),
        )
    )
    trend = F.col("s").cast("double") / F.lit(float(DECOMP_W))
    return (
        trended.withColumn("hod", hod)
        .join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour",
            "cnt",
            trend.alias("trend"),
            "seasonal",
            (F.col("cnt").cast("double") - trend - F.col("seasonal")).alias(
                "remainder"
            ),
        )
        .orderBy("event_type", "hour")
    )


def seasonal_decompose_sql() -> str:
    return f"""
WITH {_HOURLY_CTE},
trended AS (
  SELECT * FROM (
    SELECT event_type, hour, cnt,
           CAST(SUM(cnt) OVER win AS BIGINT) AS s,
           COUNT(*) OVER win AS wn
    FROM hourly
    WINDOW win AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN {DECOMP_HALF_W} PRECEDING
                   AND {DECOMP_HALF_W} FOLLOWING)
  ) t WHERE wn = {DECOMP_W}
),
seasonal AS (
  SELECT event_type, CAST(extract(hour FROM hour) AS INT) AS hod,
         CAST({DECOMP_W} * SUM(cnt) - SUM(s) AS DOUBLE)
           / CAST({DECOMP_W} * COUNT(*) AS DOUBLE) AS seasonal
  FROM trended GROUP BY 1, 2
)
SELECT t.event_type, t.hour, t.cnt,
       CAST(t.s AS DOUBLE) / CAST({float(DECOMP_W)!r} AS DOUBLE) AS trend,
       sn.seasonal,
       CAST(t.cnt AS DOUBLE)
         - CAST(t.s AS DOUBLE) / CAST({float(DECOMP_W)!r} AS DOUBLE)
         - sn.seasonal AS remainder
FROM trended t
JOIN seasonal sn
  ON t.event_type = sn.event_type
 AND CAST(extract(hour FROM t.hour) AS INT) = sn.hod
ORDER BY t.event_type, t.hour
"""


#: trailing-window length (hours) the Sen estimator runs over — caps
#: the O(W^2/2) per-series pair fan-out at a corpus-size-independent
#: constant; any series shorter than W gets the full exact estimator.
TS_TREND_WINDOW_H = 1024


def theil_sen_trend(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend per event-type series: the MEDIAN of
    all pairwise slopes (and the median-residual intercept) over the
    hourly counts — the estimator that shrugs off the outlier hours
    that wreck an OLS fit (up to ~29% contamination). STAGED round 9
    for the round-10 driver window.

    Exactness: times are integer epoch-hours, counts exact int64;
    each pairwise slope is ONE double division of exact integers, and
    both medians use the deterministic rank-selection convention
    (ORDER BY value, then the integer keys; row (n+1)//2) — no
    percentile-interpolation semantics, bit-identical across engines.

    Scale: exact Theil-Sen is O(H^2) pairs in the series length, and
    the slope-median rank runs per series — so the estimator is
    computed over the TRAILING ``TS_TREND_WINDOW_H`` hours of each
    series (the capacity-monitoring framing: a trend is a recent-
    window statistic; the round-10 curve caught the unbounded form
    at 380 s on a 7200-hour decade corpus, a per-series 26M-pair
    sort). The window caps the fan-out at W^2/2 pairs per series —
    CONSTANT in corpus size — while every span shorter than W (both
    driver scales included) is byte-identical to the unbounded
    estimator. The hourly rollup is the only pass over the fact
    table; the hours-sized series table is checkpointed before its
    three consumers.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    allh = _hourly_counts(events).select(
        "event_type",
        (F.unix_micros(F.col("hour")) / F.lit(3_600_000_000))
        .cast("long")
        .alias("t"),
        "cnt",
    )
    tmax = allh.groupBy("event_type").agg(F.max("t").alias("t_max"))
    hourly = _reliable_checkpoint(
        allh.join(F.broadcast(tmax), "event_type")
        .filter(F.col("t") > F.col("t_max") - F.lit(TS_TREND_WINDOW_H))
        .select("event_type", "t", "cnt")
    )
    a = hourly.alias("a")
    b = hourly.alias("b")
    slopes = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.col("a.t").alias("ti"),
            F.col("b.t").alias("tj"),
            (
                (F.col("b.cnt") - F.col("a.cnt")).cast("double")
                / (F.col("b.t") - F.col("a.t")).cast("double")
            ).alias("slope"),
        )
    )
    w_s = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("ti").asc(), F.col("tj").asc()
    )
    w_n = Window.partitionBy("event_type")
    med_slope = (
        slopes.select(
            "event_type",
            "slope",
            F.row_number().over(w_s).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n_pairs"),
        )
        .filter(F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
        .select("event_type", F.col("slope").alias("sen_slope"), "n_pairs")
    )
    resid = hourly.join(F.broadcast(med_slope), "event_type").select(
        "event_type",
        "n_pairs",
        "t",
        (
            F.col("cnt").cast("double")
            - F.col("sen_slope") * F.col("t").cast("double")
        ).alias("b0"),
        "sen_slope",
    )
    w_b = Window.partitionBy("event_type").orderBy(
        F.col("b0").asc(), F.col("t").asc()
    )
    return (
        resid.select(
            "event_type",
            "n_pairs",
            "sen_slope",
            "b0",
            F.row_number().over(w_b).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n_points"),
        )
        .filter(F.col("rn") == F.floor((F.col("n_points") + 1) / 2))
        .select(
            "event_type",
            "n_points",
            "n_pairs",
            "sen_slope",
            F.col("b0").alias("sen_intercept"),
        )
        .orderBy("event_type")
    )


def theil_sen_trend_sql() -> str:
    return f"""
WITH {_HOURLY_CTE},
allpts AS (
  SELECT event_type,
         CAST(epoch_us(hour) / 3600000000.0 AS BIGINT) AS t, cnt
  FROM hourly
),
tmax AS (SELECT event_type, MAX(t) AS t_max FROM allpts GROUP BY event_type),
pts AS (
  SELECT p.event_type, p.t, p.cnt
  FROM allpts p JOIN tmax m USING (event_type)
  WHERE p.t > m.t_max - {TS_TREND_WINDOW_H}
),
slopes AS (
  SELECT a.event_type, a.t AS ti, b.t AS tj,
         CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND a.t < b.t
),
med_slope AS (
  SELECT event_type, slope AS sen_slope, n_pairs FROM (
    SELECT event_type, slope, ti, tj,
           ROW_NUMBER() OVER (PARTITION BY event_type
             ORDER BY slope ASC, ti ASC, tj ASC) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM slopes
  ) s WHERE rn = (n_pairs + 1) // 2
),
resid AS (
  SELECT p.event_type, m.n_pairs, p.t, m.sen_slope,
         CAST(p.cnt AS DOUBLE) - m.sen_slope * CAST(p.t AS DOUBLE) AS b0
  FROM pts p JOIN med_slope m USING (event_type)
)
SELECT event_type, n_points, n_pairs, sen_slope, b0 AS sen_intercept
FROM (
  SELECT event_type, n_pairs, sen_slope, b0,
         ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY b0 ASC, t ASC) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_points
  FROM resid
) r WHERE rn = (n_points + 1) // 2
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Holt linear-trend smoothing (double exponential) — ordered fold
# --------------------------------------------------------------------------

#: level/trend smoothing constants — 1/2 is EXACTLY representable, so
#: the whole recursion stays in dyadic rationals and both engines'
#: IEEE folds agree bit-for-bit (a 0.3 here would too, but 1/2 makes
#: the determinism argument trivial).
HOLT_ALPHA = 0.5
HOLT_BETA = 0.5


def holt_winters(events: DataFrame) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing of each
    type's hourly-count series — the level+trend forecaster between
    ``ewma_window`` (level only) and ``seasonal_decompose`` (level +
    season): l_t = a*y_t + (1-a)(l_{t-1}+b_{t-1}),
    b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}, init l=y_1 then
    (l,b)=(y_2, y_2-y_1), smoothing and one-step-ahead errors from
    the third point. Output per series: final level/trend, the
    next-hour forecast l+b, and the RMSE of the one-step forecasts
    (the in-sample accuracy readout). STAGED round 10 for the
    round-11 window.

    The recursion is inherently sequential per series, so it runs as
    ONE strict left fold over the hour-sorted array (Spark
    ``aggregate`` / DuckDB ``list_reduce`` with a struct
    accumulator — the kaplan_meier/EWMA discipline); series length
    is time-bounded (hours, not rows: a decade is <90k elements), the
    canonical bounded-collect shape. One shuffle total (the hourly
    aggregation); everything after is per-series array arithmetic.
    """
    hourly = _hourly_counts(events)
    arr = hourly.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("hour").alias("h"), F.col("cnt")))
        ).alias("ys"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    a = F.lit(HOLT_ALPHA)
    g = F.lit(HOLT_BETA)
    one = F.lit(1.0)

    def step(acc, x):
        y = x["cnt"].cast("double")
        i, l, b, sse = acc["i"], acc["l"], acc["b"], acc["sse"]
        pred = l + b
        err = y - pred
        l_new = a * y + (one - a) * (l + b)
        b_new = g * (l_new - l) + (one - g) * b
        return (
            F.when(
                i == 0,
                F.struct(
                    F.lit(1).alias("i"), y.alias("l"),
                    F.lit(0.0).alias("b"), F.lit(0.0).alias("sse"),
                ),
            )
            .when(
                i == 1,
                F.struct(
                    F.lit(2).alias("i"), y.alias("l"),
                    (y - l).alias("b"), F.lit(0.0).alias("sse"),
                ),
            )
            .otherwise(
                F.struct(
                    (i + 1).alias("i"), l_new.alias("l"),
                    b_new.alias("b"), (sse + err * err).alias("sse"),
                )
            )
        )

    init = F.struct(
        F.lit(0).alias("i"), F.lit(0.0).alias("l"),
        F.lit(0.0).alias("b"), F.lit(0.0).alias("sse"),
    )
    folded = arr.filter(F.col("n_hours") >= 2).select(
        "event_type",
        "n_hours",
        F.aggregate(F.col("ys"), init, step).alias("st"),
    )
    rmse = F.when(
        F.col("n_hours") >= 3,
        F.sqrt(
            F.col("st.sse") / (F.col("n_hours") - 2).cast("double")
        ),
    ).otherwise(F.lit(0.0))
    return folded.select(
        "event_type",
        "n_hours",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        (F.col("st.l") + F.col("st.b")).alias("forecast_next"),
        rmse.alias("rmse_one_step"),
    ).orderBy("event_type")


def holt_winters_sql() -> str:
    a = f"CAST({HOLT_ALPHA!r} AS DOUBLE)"
    g = f"CAST({HOLT_BETA!r} AS DOUBLE)"
    # NOT list_reduce: DuckDB 1.0 mis-evaluates struct-typed fold
    # accumulators (verified: a 4-element Holt fold returns b=2.25
    # where the hand-computed answer is 3.0 — field expressions see stale
    # accumulator state). A recursive CTE carries the (l, b, sse)
    # state through columns instead — the graph_bfs oracle pattern —
    # and matches the Spark struct fold bit-for-bit.
    return f"""
WITH RECURSIVE {_HOURLY_CTE},
seq AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hour)
              AS BIGINT) AS i,
         CAST(cnt AS DOUBLE) AS y
  FROM hourly
),
nn AS (SELECT event_type, CAST(MAX(i) AS BIGINT) AS n_hours
       FROM seq GROUP BY event_type),
rec AS (
  SELECT event_type, i, y AS l, CAST(0.0 AS DOUBLE) AS b,
         CAST(0.0 AS DOUBLE) AS sse
  FROM seq WHERE i = 1
  UNION ALL
  SELECT r.event_type, s.i,
         CASE WHEN r.i = 1 THEN s.y
              ELSE {a} * s.y + (CAST(1.0 AS DOUBLE) - {a}) * (r.l + r.b)
         END,
         CASE WHEN r.i = 1 THEN s.y - r.l
              ELSE {g} * (({a} * s.y + (CAST(1.0 AS DOUBLE) - {a})
                           * (r.l + r.b)) - r.l)
                   + (CAST(1.0 AS DOUBLE) - {g}) * r.b
         END,
         CASE WHEN r.i = 1 THEN CAST(0.0 AS DOUBLE)
              ELSE r.sse + (s.y - (r.l + r.b)) * (s.y - (r.l + r.b))
         END
  FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.i = r.i + 1
)
SELECT r.event_type, n.n_hours, r.l AS level, r.b AS trend,
       r.l + r.b AS forecast_next,
       CASE WHEN n.n_hours >= 3
            THEN sqrt(r.sse / CAST(n.n_hours - 2 AS DOUBLE))
            ELSE CAST(0.0 AS DOUBLE) END AS rmse_one_step
FROM rec r JOIN nn n USING (event_type)
WHERE r.i = n.n_hours AND n.n_hours >= 2
ORDER BY r.event_type
"""


# --------------------------------------------------------------------------
# Mann-Kendall trend test — significance companion to theil_sen_trend
# --------------------------------------------------------------------------


def mann_kendall(events: DataFrame) -> DataFrame:
    """Mann-Kendall monotone-trend test per event-type series — the
    nonparametric significance readout for ``theil_sen_trend``'s
    slope (the standard pairing in hydrology/telemetry monitoring:
    Sen gives the magnitude, MK decides whether a trend exists at
    all): S = sum over hour pairs i<j of sign(y_j - y_i), with the
    tie-corrected variance

        var(S) = [ n(n-1)(2n+5) - sum_t t(t-1)(2t+5) ] / 18

    and the continuity-corrected z = (S -+ 1)/sqrt(var) (0 when
    S = 0, NULL when the variance degenerates — the
    _pearson_from_sums guard convention). Every ingredient is an
    exact int64 (S is a sum of -1/0/+1; the variance numerators are
    integer products); z is ONE double expression evaluated
    identically by both engines. No p-value by convention (erf is
    libm-dependent); threshold |z|.

    Scale: pairs come from the SAME trailing ``TS_TREND_WINDOW_H``
    window as theil_sen_trend, capping the fan-out at W^2/2 per
    series independent of corpus size; the hourly rollup is the only
    pass over facts. STAGED round 10 for the round-11/12 windows.
    """
    allh = _hourly_counts(events).select(
        "event_type",
        (F.unix_micros(F.col("hour")) / F.lit(3_600_000_000))
        .cast("long")
        .alias("t"),
        "cnt",
    )
    tmax = allh.groupBy("event_type").agg(F.max("t").alias("t_max"))
    pts = (
        allh.join(F.broadcast(tmax), "event_type")
        .filter(F.col("t") > F.col("t_max") - F.lit(TS_TREND_WINDOW_H))
        .select("event_type", "t", "cnt")
    )
    a = pts.alias("a")
    b = pts.alias("b")
    s_stat = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.t") < F.col("b.t")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            F.signum(
                (F.col("b.cnt") - F.col("a.cnt")).cast("double")
            ).cast("long").alias("sg"),
        )
        .groupBy("event_type")
        .agg(F.sum("sg").alias("s_stat"))
    )
    ties = (
        pts.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).alias("tt"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tt") * (F.col("tt") - 1) * (2 * F.col("tt") + 5)
            ).alias("tie_term"),
            F.sum("tt").alias("n_points"),
        )
    )
    joined = s_stat.join(ties, "event_type")
    n = F.col("n_points")
    var18 = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    z = F.when(
        var18 > 0,
        F.when(F.col("s_stat") > 0,
               (F.col("s_stat") - 1).cast("double") / F.sqrt(var18))
        .when(F.col("s_stat") < 0,
              (F.col("s_stat") + 1).cast("double") / F.sqrt(var18))
        .otherwise(F.lit(0.0)),
    )
    return joined.select(
        "event_type", "n_points", "s_stat", z.alias("z")
    ).orderBy("event_type")


def mann_kendall_sql() -> str:
    return f"""
WITH {_HOURLY_CTE},
allpts AS (
  SELECT event_type,
         CAST(epoch_us(hour) / 3600000000.0 AS BIGINT) AS t, cnt
  FROM hourly
),
tmax AS (SELECT event_type, MAX(t) AS t_max FROM allpts GROUP BY event_type),
pts AS (
  SELECT p.event_type, p.t, p.cnt
  FROM allpts p JOIN tmax m USING (event_type)
  WHERE p.t > m.t_max - {TS_TREND_WINDOW_H}
),
s_stat AS (
  SELECT a.event_type,
         CAST(SUM(CAST(sign(CAST(b.cnt - a.cnt AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS s_stat
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND a.t < b.t
  GROUP BY a.event_type
),
ties AS (
  SELECT event_type,
         CAST(SUM(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie_term,
         CAST(SUM(tt) AS BIGINT) AS n_points
  FROM (SELECT event_type, cnt, COUNT(*) AS tt
        FROM pts GROUP BY event_type, cnt)
  GROUP BY event_type
)
SELECT s.event_type, t.n_points, s.s_stat,
       CASE WHEN CAST(t.n_points * (t.n_points - 1) * (2 * t.n_points + 5)
                      - t.tie_term AS DOUBLE) / CAST(18.0 AS DOUBLE) > 0
            THEN CASE
              WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                / sqrt(CAST(t.n_points * (t.n_points - 1)
                       * (2 * t.n_points + 5) - t.tie_term AS DOUBLE)
                       / CAST(18.0 AS DOUBLE))
              WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                / sqrt(CAST(t.n_points * (t.n_points - 1)
                       * (2 * t.n_points + 5) - t.tie_term AS DOUBLE)
                       / CAST(18.0 AS DOUBLE))
              ELSE CAST(0.0 AS DOUBLE)
            END
       END AS z
FROM s_stat s JOIN ties t USING (event_type)
ORDER BY s.event_type
"""


# --------------------------------------------------------------------------
# burst episodes (threshold runs over the hourly series)
# --------------------------------------------------------------------------

#: burst gate: hours with cnt > mean + BURST_SIGMAS * sd.
BURST_SIGMAS = 2.0


def burst_episodes(events: DataFrame) -> DataFrame:
    """Burst episodes per event-type series: maximal runs of
    CONSECUTIVE hours whose count exceeds mean + 2*sd of the series
    — what ``hourly_anomaly`` flags hour-by-hour, merged into the
    episode grain an incident reviewer actually reads (start, end,
    duration, peak, volume). The islands shape (interval_merge /
    substring_dedup) applied to the time axis: a gap of more than
    one hour between hot hours breaks the episode.

    Exactness: the mean + 2*sd gate is ONE double expression from
    exact integer sums (n, sum, sum-of-squares in decimal(38,0)) —
    identical on both engines, so the hot set is identical; islands
    arithmetic is pure integers from there. Hot hours are
    anomaly-sparse by construction, so the per-series island window
    runs over a small filtered set (bounded by hours, filtered to
    the tail). One hourly aggregation, one broadcast of the 5-row
    stats table, one bounded window pass. STAGED round 10.
    """
    hourly = _hourly_counts(events).select(
        "event_type",
        (F.unix_micros(F.col("hour")) / F.lit(3_600_000_000))
        .cast("long")
        .alias("t"),
        "cnt",
    )
    d38 = "decimal(38,0)"
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt").cast(d38) * F.col("cnt").cast(d38)).alias("sxx"),
    )
    n = F.col("n").cast("double")
    mean = F.col("sx").cast("double") / n
    var = (
        F.col("sxx").cast("double")
        - (F.col("sx").cast("double") * F.col("sx").cast("double")) / n
    ) / n
    gate = mean + F.lit(BURST_SIGMAS) * F.sqrt(var)
    hot = hourly.join(F.broadcast(stats), "event_type").filter(
        F.col("cnt").cast("double") > gate
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("t")
    brk = hot.select(
        "event_type",
        "t",
        "cnt",
        F.when(F.col("t") - F.lag("t").over(w) <= 1, 0).otherwise(1).alias(
            "b"
        ),
    )
    grp = brk.withColumn(
        "gid", F.sum("b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grp.groupBy("event_type", "gid")
        .agg(
            F.min("t").alias("start_h"),
            F.max("t").alias("end_h"),
            F.count(F.lit(1)).alias("n_hours"),
            F.max("cnt").alias("peak_cnt"),
            F.sum("cnt").alias("total_cnt"),
        )
        .select(
            "event_type", "start_h", "end_h", "n_hours", "peak_cnt",
            "total_cnt",
        )
        .orderBy("event_type", "start_h")
    )


def burst_episodes_sql() -> str:
    gate = (
        "CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"
        f" + CAST({BURST_SIGMAS!r} AS DOUBLE)"
        " * sqrt((CAST(CAST(sxx AS VARCHAR) AS DOUBLE)"
        " - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
        " / CAST(n AS DOUBLE))"
    )
    return f"""
WITH {_HOURLY_CTE},
pts AS (
  SELECT event_type,
         CAST(epoch_us(hour) / 3600000000.0 AS BIGINT) AS t, cnt
  FROM hourly
),
stats AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS sx,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx
  FROM pts GROUP BY event_type
),
hot AS (
  SELECT p.event_type, p.t, p.cnt
  FROM pts p JOIN stats s USING (event_type)
  WHERE CAST(p.cnt AS DOUBLE) > {gate}
),
brk AS (
  SELECT event_type, t, cnt,
         CASE WHEN t - LAG(t) OVER (PARTITION BY event_type ORDER BY t) <= 1
              THEN 0 ELSE 1 END AS b
  FROM hot
),
grp AS (
  SELECT event_type, t, cnt,
         SUM(b) OVER (PARTITION BY event_type ORDER BY t
                      ROWS UNBOUNDED PRECEDING) AS gid
  FROM brk
)
SELECT event_type, MIN(t) AS start_h, MAX(t) AS end_h,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(MAX(cnt) AS BIGINT) AS peak_cnt,
       CAST(SUM(cnt) AS BIGINT) AS total_cnt
FROM grp GROUP BY event_type, gid
ORDER BY event_type, start_h
"""


# --------------------------------------------------------------------------
# overdispersion audit (variance-to-mean of the hourly counts)
# --------------------------------------------------------------------------


def overdispersion_audit(events: DataFrame) -> DataFrame:
    """Index of dispersion per event-type hourly series: the
    variance-to-mean ratio (VMR) and the chi-square dispersion
    statistic n*VMR — the standard "is this count stream Poisson?"
    check run before rate-based alerting or Poisson capacity models
    are trusted (VMR ~ 1 Poisson, >> 1 bursty/clumped, < 1
    under-dispersed/regular). The distribution-model sibling of
    ``hourly_anomaly``'s pointwise gate and ``burst_episodes``'
    run-grain view.

    Exactness discipline: VMR = (n*Sxx - Sx^2) / (n*Sx) is computed
    as ONE division of two exactly-accumulated integers — n, Sx,
    Sxx ride a single grouped pass as int64/decimal(38,0) sums, the
    numerator and denominator build in decimal(38,0), and the only
    doubles are the final mean/vmr/chi2 divisions, identical on both
    engines. One hourly aggregation + one 5-row rollup; nothing in
    the plan scales past the hour grid.
    """
    hourly = _hourly_counts(events)
    d38 = "decimal(38,0)"
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum(F.col("cnt").cast(d38) * F.col("cnt").cast(d38)).alias("sxx"),
    )
    num = (
        F.col("n").cast(d38) * F.col("sxx")
        - F.col("sx").cast(d38) * F.col("sx").cast(d38)
    ).cast("double")
    den = (F.col("n").cast(d38) * F.col("sx").cast(d38)).cast("double")
    vmr = F.when(F.col("sx") > 0, num / den)
    return stats.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("sx").alias("n_events"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "mean_cnt"
        ),
        vmr.alias("vmr"),
        (vmr * F.col("n").cast("double")).alias("chi2_stat"),
    ).orderBy("event_type")


def overdispersion_audit_sql() -> str:
    hug = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    num = hug.format(
        x="CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx"
    )
    den = hug.format(x="CAST(n AS HUGEINT) * sx")
    vmr = f"CASE WHEN sx > 0 THEN {num} / {den} END"
    return f"""
WITH {_HOURLY_CTE},
stats AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(cnt) AS BIGINT) AS sx,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx
  FROM hourly GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours, sx AS n_events,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cnt,
       {vmr} AS vmr,
       ({vmr}) * CAST(n AS DOUBLE) AS chi2_stat
FROM stats ORDER BY event_type
"""


# --------------------------------------------------------------------------
# record highs (running-maximum records in the hourly series)
# --------------------------------------------------------------------------


def record_highs(events: DataFrame) -> DataFrame:
    """Running-maximum records per event-type hourly series: how
    many hours set a new all-time-high count, and when the last one
    happened. For a stationary series records arrive ~log(n) times
    and then stop; records that keep coming (or a recent
    last_record_hour) are a growth/drift signature — the classic
    records-test reading of a time series, complementing
    ``mann_kendall``'s rank trend with an extreme-value lens.

    The first hour counts as a record by convention. Pure integer
    arithmetic: one hourly aggregation, one bounded window pass
    (strict-past running max via rowsBetween(unbounded, -1)), one
    5-row rollup — nothing scales past the hour grid.
    """
    from pyspark.sql import Window

    hourly = _hourly_counts(events).select(
        "event_type",
        (F.unix_micros(F.col("hour")) / F.lit(3_600_000_000))
        .cast("long")
        .alias("t"),
        "cnt",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = hourly.select(
        "event_type",
        "t",
        "cnt",
        (
            F.max("cnt").over(w).isNull()
            | (F.col("cnt") > F.max("cnt").over(w))
        )
        .cast("long")
        .alias("is_rec"),
    )
    return (
        rec.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("is_rec").alias("n_records"),
            F.max(F.when(F.col("is_rec") == 1, F.col("t"))).alias(
                "last_record_hour"
            ),
            F.max("cnt").alias("peak_cnt"),
        )
        .orderBy("event_type")
    )


def record_highs_sql() -> str:
    return f"""
WITH {_HOURLY_CTE},
pts AS (
  SELECT event_type,
         CAST(epoch_us(hour) / 3600000000.0 AS BIGINT) AS t, cnt
  FROM hourly
),
rec AS (
  SELECT event_type, t, cnt,
         CASE WHEN MAX(cnt) OVER (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR cnt > MAX(cnt) OVER (PARTITION BY event_type ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_rec
  FROM pts
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(is_rec) AS BIGINT) AS n_records,
       MAX(CASE WHEN is_rec = 1 THEN t END) AS last_record_hour,
       CAST(MAX(cnt) AS BIGINT) AS peak_cnt
FROM rec GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# top-k churn between the early and late halves of the stream
# --------------------------------------------------------------------------

#: leaderboard size compared between the two time halves.
TOPK_CHURN_K = 20


def topk_churn(events: DataFrame) -> DataFrame:
    """Leaderboard churn: compare the top-K most-active users of the
    stream's EARLY half against its LATE half (split at the exact
    midpoint of the observed time range) — overlap, Jaccard, rank
    displacement of the survivors, and entry/exit counts. The
    "what changed in the top sellers/talkers/abusers this period"
    readout; a near-zero overlap flags regime change the way
    ``cms_heavy_change`` flags per-key deltas, here at the ranked-
    leaderboard grain.

    Determinism: ties break by (count DESC, user_id ASC) — a total
    order, so both engines pick the identical K. The split point is
    exact integer arithmetic on epoch micros. Each half's top-K is a
    TakeOrdered (per-partition heaps, never a global row sort);
    ranks are then assigned on the K-row results. The per-user
    counts table is checkpointed — it feeds both halves' top-K,
    and two lazy consumers would re-instantiate the fact scan.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    span = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    # integer midpoint: floor((hi-lo)/2) — NOT a bare double->long
    # cast (Spark truncates, DuckDB rounds; the twins must both floor)
    mid = F.col("lo") + F.floor(
        (F.col("hi") - F.col("lo")) / F.lit(2)
    ).cast("long")
    counts = _reliable_checkpoint(
        events.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            (F.unix_micros("ts") <= mid).cast("int").alias("late0"),
        )
        .groupBy("user_id", "late0")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "user_id",
            (F.lit(1) - F.col("late0")).alias("late"),
            "cnt",
        )
    )

    def topk(late: int) -> DataFrame:
        w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        return (
            counts.filter(F.col("late") == late)
            .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
            .limit(TOPK_CHURN_K)
            .withColumn("rnk", F.row_number().over(w))
        )

    a = topk(0).select(
        F.col("user_id").alias("u"), F.col("rnk").alias("rnk_a")
    )
    b = topk(1).select(
        F.col("user_id").alias("u"), F.col("rnk").alias("rnk_b")
    )
    j = a.join(b, "u", "full_outer")
    common = (F.col("rnk_a").isNotNull() & F.col("rnk_b").isNotNull()).cast(
        "long"
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return j.agg(
        F.count("rnk_a").alias("n_a"),
        F.count("rnk_b").alias("n_b"),
        F.sum(common).alias("n_common"),
        F.sum((F.lit(1) - common)).alias("n_churned"),
        F.sum(F.when(common == 1, F.abs(F.col("rnk_a") - F.col("rnk_b")))).alias(
            "total_rank_shift"
        ),
    ).select(
        F.lit(TOPK_CHURN_K).alias("k"),
        "n_a",
        "n_b",
        "n_common",
        "n_churned",
        F.when(
            union > 0,
            F.col("n_common").cast("double") / union.cast("double"),
        ).alias("jaccard"),
        F.when(
            F.col("n_common") > 0,
            F.col("total_rank_shift").cast("double")
            / F.col("n_common").cast("double"),
        ).alias("mean_rank_shift"),
    )


def topk_churn_sql() -> str:
    k = TOPK_CHURN_K
    half = """
  SELECT user_id AS u,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk
  FROM (SELECT user_id, COUNT(*) AS cnt FROM flagged
        WHERE late = {late} GROUP BY user_id)
  ORDER BY cnt DESC, u ASC LIMIT {k}
"""
    return f"""
WITH span AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
flagged AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts)
                   <= lo + CAST(floor((hi - lo) / 2) AS BIGINT)
              THEN 0 ELSE 1 END AS late
  FROM events CROSS JOIN span
),
a AS ({half.format(late=0, k=k)}),
b AS ({half.format(late=1, k=k)}),
j AS (
  SELECT COALESCE(a.u, b.u) AS u, a.rnk AS rnk_a, b.rnk AS rnk_b
  FROM a FULL OUTER JOIN b ON a.u = b.u
),
agg AS (
  SELECT COUNT(rnk_a) AS n_a, COUNT(rnk_b) AS n_b,
         SUM(CASE WHEN rnk_a IS NOT NULL AND rnk_b IS NOT NULL
                  THEN 1 ELSE 0 END) AS n_common,
         SUM(CASE WHEN rnk_a IS NOT NULL AND rnk_b IS NOT NULL
                  THEN 0 ELSE 1 END) AS n_churned,
         SUM(CASE WHEN rnk_a IS NOT NULL AND rnk_b IS NOT NULL
                  THEN abs(rnk_a - rnk_b) END) AS total_rank_shift
  FROM j
)
SELECT CAST({k} AS INT) AS k,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(n_churned AS BIGINT) AS n_churned,
       CASE WHEN n_a + n_b - n_common > 0
            THEN CAST(n_common AS DOUBLE)
                 / CAST(n_a + n_b - n_common AS DOUBLE) END AS jaccard,
       CASE WHEN n_common > 0
            THEN CAST(total_rank_shift AS DOUBLE)
                 / CAST(n_common AS DOUBLE) END AS mean_rank_shift
FROM agg
"""


# --------------------------------------------------------------------------
# inter-arrival profile (exact discrete gap quantiles)
# --------------------------------------------------------------------------

#: quantiles reported: name -> (numerator, denominator).
IAP_QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
#: bucket width (seconds) for the two-level gap-rank prefix sum.
IAP_BUCKET_S = 3600


def interarrival_profile(events: DataFrame) -> DataFrame:
    """Per-event-type profile of USER inter-arrival gaps — the exact
    p50/p90/p99 of the seconds between a user's consecutive events
    of each type, the distribution a sessionization threshold or a
    rate limiter is tuned against (``events_sessionize`` hard-codes
    the gap; this measures what the data says it should be).

    Discrete (type-7-free) quantiles, all integer arithmetic: the
    q-quantile is the SMALLEST gap g whose cumulative count reaches
    ceil(q * n), with ceil(q*n) computed as (n*num + den - 1) div
    den on exact integers — no interpolation doubles, so both
    engines select the identical gap. Gaps floor to whole seconds
    (micros div 1e6).

    Scale shape: the lag window partitions by (user, type) — real
    per-user partitions, never a 5-partition sort of the whole
    stream; the quantile selection is the repo's two-level bucketed
    prefix sum over the (type, gap) count table (checkpointed: the
    within-sums, bucket totals, and type totals are three lazy
    consumers of one pass), and the winner per (type, quantile) is
    a distributed min over the threshold-crossing rows.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    w_seq = Window.partitionBy("user_id", "event_type").orderBy("ts")
    gaps = (
        events.select(
            "event_type",
            "user_id",
            "ts",
            F.lag(F.unix_micros(F.col("ts"))).over(w_seq).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .select(
            "event_type",
            F.expr("(unix_micros(ts) - prev) div 1000000").alias("gap_s"),
        )
    )
    by_gap = _reliable_checkpoint(
        gaps.groupBy("event_type", "gap_s")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("bucket", F.expr(f"gap_s div {IAP_BUCKET_S}"))
    )
    w_in = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("gap_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = by_gap.withColumn("cw_in", F.sum("c").over(w_in))
    w_b = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_cum = (
        by_gap.groupBy("event_type", "bucket")
        .agg(F.sum("c").alias("bc"))
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("c_below"),
        )
    )
    totals = by_gap.groupBy("event_type").agg(F.sum("c").alias("n"))
    qgrid = events.sparkSession.createDataFrame(
        [(name, num, den) for name, num, den in IAP_QUANTILES],
        "quantile string, num int, den int",
    )
    cum = (
        within.join(bucket_cum, ["event_type", "bucket"])
        .join(F.broadcast(totals), "event_type")
        .crossJoin(F.broadcast(qgrid))
        .select(
            "event_type",
            "quantile",
            "gap_s",
            (F.col("c_below") + F.col("cw_in")).alias("cw"),
            "n",
            F.expr("(n * num + den - 1) div den").alias("k"),
        )
    )
    return (
        cum.filter(F.col("cw") >= F.col("k"))
        .groupBy("event_type", "quantile")
        .agg(F.min("gap_s").alias("gap_s"), F.max("n").alias("n_gaps"))
        .select("event_type", "quantile", "n_gaps", "gap_s")
        .orderBy("event_type", "quantile")
    )


def interarrival_profile_sql() -> str:
    qrows = ", ".join(
        f"('{name}', {num}, {den})" for name, num, den in IAP_QUANTILES
    )
    return f"""
WITH gaps AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type ORDER BY ts)) // 1000000
           AS gap_s
  FROM events
  QUALIFY gap_s IS NOT NULL
),
by_gap AS (
  SELECT event_type, gap_s, COUNT(*) AS c FROM gaps GROUP BY 1, 2
),
cum AS (
  SELECT event_type, gap_s,
         SUM(c) OVER (PARTITION BY event_type ORDER BY gap_s
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM by_gap
),
qgrid(quantile, num, den) AS (VALUES {qrows})
SELECT event_type, quantile, CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_s) AS BIGINT) AS gap_s
FROM cum CROSS JOIN qgrid
WHERE cw >= (n * num + den - 1) // den
GROUP BY event_type, quantile
ORDER BY event_type, quantile
"""


# --------------------------------------------------------------------------
# hour-of-day uniformity (chi-square seasonality strength)
# --------------------------------------------------------------------------


def hod_uniformity(events: DataFrame) -> DataFrame:
    """Hour-of-day seasonality strength per event type: the
    chi-square statistic of the event distribution over the 24
    hour-of-day cells against uniform — the single-number "how
    diurnal is this stream" score behind ``hourly_profile``'s 24-row
    shape (uniform traffic scores ~ chi2_df=23; a hard day/night
    split scores huge). Plus the peak cell and its share.

    Exactness: chi2_uniform = sum_h (S_h - S/24)^2 / (S/24)
    simplifies ALGEBRAICALLY to (24 * sum_h S_h^2) / S - S, so the
    whole statistic is one division of exactly-accumulated integers
    (sum of squares in decimal(38,0)) minus an exactly-cast double —
    no per-cell double is ever summed across cells in engine-
    dependent order. The peak cell is an exact integer argmax (ties
    to the earliest hour). The (type, hod) count table is
    checkpointed: totals and the peak join are two lazy consumers
    of the one corpus pass.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    d38 = "decimal(38,0)"
    hod = _reliable_checkpoint(
        events.groupBy(
            "event_type", F.hour(F.col("ts")).alias("hod")
        ).agg(F.count(F.lit(1)).alias("sg"))
    )
    stats = hod.groupBy("event_type").agg(
        F.sum("sg").alias("s"),
        F.sum(F.col("sg").cast(d38) * F.col("sg").cast(d38)).alias("ssq"),
        F.count(F.lit(1)).alias("n_hods"),
        F.max("sg").alias("ms"),
    )
    peak = (
        hod.join(stats.select("event_type", "ms"), "event_type")
        .filter(F.col("sg") == F.col("ms"))
        .groupBy("event_type")
        .agg(F.min("hod").alias("peak_hod"))
    )
    sd = F.col("s").cast("double")
    chi2 = (F.lit(24).cast(d38) * F.col("ssq")).cast("double") / sd - sd
    return (
        stats.join(F.broadcast(peak), "event_type")
        .select(
            "event_type",
            F.col("s").alias("n_events"),
            "n_hods",
            "peak_hod",
            (F.col("ms").cast("double") / sd).alias("peak_share"),
            F.when(F.col("s") > 0, chi2).alias("chi2_uniform"),
        )
        .orderBy("event_type")
    )


def hod_uniformity_sql() -> str:
    chi2 = (
        "CAST(CAST(24 * ssq AS VARCHAR) AS DOUBLE) / CAST(s AS DOUBLE)"
        " - CAST(s AS DOUBLE)"
    )
    return f"""
WITH hod AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod, COUNT(*) AS sg
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s,
         SUM(CAST(sg AS HUGEINT) * sg) AS ssq,
         COUNT(*) AS n_hods, CAST(MAX(sg) AS BIGINT) AS ms
  FROM hod GROUP BY event_type
),
peak AS (
  SELECT h.event_type, MIN(h.hod) AS peak_hod
  FROM hod h JOIN stats t USING (event_type)
  WHERE h.sg = t.ms GROUP BY h.event_type
)
SELECT s.event_type, s.s AS n_events,
       CAST(s.n_hods AS BIGINT) AS n_hods,
       CAST(p.peak_hod AS INT) AS peak_hod,
       CAST(s.ms AS DOUBLE) / CAST(s.s AS DOUBLE) AS peak_share,
       CASE WHEN s.s > 0 THEN {chi2} END AS chi2_uniform
FROM stats s JOIN peak p USING (event_type)
ORDER BY s.event_type
"""


# --------------------------------------------------------------------------
# out-of-order arrival audit (watermark tuning readout)
# --------------------------------------------------------------------------

#: ingest-order bucket width for the two-level prefix max.
OOO_BUCKET = 100_000


def out_of_order_audit(events: DataFrame) -> DataFrame:
    """How disordered is the stream? Taking event_id as the ingest
    (arrival) order, count the events whose event time is OLDER than
    some earlier-arrived event, and the worst lateness — exactly the
    numbers that size a Structured Streaming WATERMARK: the
    `withWatermark` slack must cover max (or chosen-quantile)
    lateness or late rows are dropped. The repo's streaming entries
    assume "2 hours"; this measures what the data actually needs.

    Lateness_i = running_max(ts over arrivals before i) - ts_i when
    positive — a global PREFIX MAX in arrival order, computed with
    the two-level bucketed pattern (the prefix-SUM convention of
    roc_auc/weighted_median applied to max): within-bucket strict-
    past running max windows over bucket-bounded partitions, bucket
    maxima prefix-combine over the tiny bucket table, and the
    global predecessor is greatest(within, bucket-prefix) — never a
    single-partition sort of the stream. All integer micros.
    """
    from pyspark.sql import Window

    pts = events.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("t"),
        F.expr(f"event_id div {OOO_BUCKET}").alias("bucket"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = pts.withColumn("max_in", F.max("t").over(w_in))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_prev = (
        pts.groupBy("bucket")
        .agg(F.max("t").alias("bm"))
        .select("bucket", F.max("bm").over(w_b).alias("max_below"))
    )
    scored = within.join(F.broadcast(bucket_prev), "bucket").select(
        F.when(
            F.coalesce(F.greatest("max_in", "max_below"), F.lit(-1))
            > F.col("t"),
            F.greatest("max_in", "max_below") - F.col("t"),
        ).alias("late_us")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("late_us").alias("n_out_of_order"),
        F.coalesce(
            F.expr("max(late_us) div 1000000"), F.lit(0)
        ).alias("max_lateness_s"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.count("late_us").cast("double")
            / F.count(F.lit(1)).cast("double"),
        ).alias("frac_late"),
    )


def out_of_order_audit_sql() -> str:
    return """
WITH pts AS (
  SELECT event_id, epoch_us(ts) AS t FROM events
),
scored AS (
  SELECT t,
         MAX(t) OVER (ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM pts
),
late AS (
  SELECT CASE WHEN prev_max > t THEN prev_max - t END AS late_us
  FROM scored
)
SELECT COUNT(*) AS n_events,
       COUNT(late_us) AS n_out_of_order,
       CAST(COALESCE(MAX(late_us) // 1000000, 0) AS BIGINT)
         AS max_lateness_s,
       CASE WHEN COUNT(*) > 0
            THEN CAST(COUNT(late_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       END AS frac_late
FROM late
"""


# --------------------------------------------------------------------------
# freshness audit (per-series staleness vs the snapshot head)
# --------------------------------------------------------------------------

#: "recent" horizon for the trailing-activity count (micros).
FRESH_HORIZON_US = 24 * 3600 * 1_000_000


def freshness_audit(events: DataFrame) -> DataFrame:
    """Per-event-type freshness: last event time, staleness behind
    the snapshot head (the global max), and activity inside the
    trailing 24 h — the is-this-feed-alive check run before any
    downstream consumer trusts a partition (a type whose staleness
    suddenly exceeds its cadence is a dead producer, hours before a
    volume alert would fire).

    ONE corpus pass: the per-type aggregate carries last_us and the
    trailing count CANNOT know the global head yet, so the trailing
    window is computed against each type's own last event PLUS the
    global head derived from the tiny per-type table itself (a
    5-row window max — no second fact scan, the multi-consumer
    convention). All staleness arithmetic is exact integer micros.
    """
    from pyspark.sql import Window

    per_type = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_micros(F.col("ts"))).alias("last_us"),
    )
    head = Window.partitionBy()
    with_head = per_type.withColumn(
        "head_us", F.max("last_us").over(head)
    )
    # trailing-24h activity needs event rows once more, but only as a
    # conditional count against the head — ride a second aggregate of
    # the SAME grouped pass by pre-joining the head in: count events
    # with ts > head - horizon. The head is a 5-row broadcast.
    heads = with_head.select("event_type", "head_us")
    recent = (
        events.join(F.broadcast(heads), "event_type")
        .filter(
            F.unix_micros(F.col("ts"))
            > F.col("head_us") - F.lit(FRESH_HORIZON_US)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_last_24h"))
    )
    return (
        with_head.join(recent, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.timestamp_micros(F.col("last_us")).alias("last_ts"),
            F.expr("(head_us - last_us) div 1000000").alias("staleness_s"),
            F.coalesce("n_last_24h", F.lit(0)).alias("n_last_24h"),
        )
        .orderBy("event_type")
    )


def freshness_audit_sql() -> str:
    return f"""
WITH per_type AS (
  SELECT event_type, COUNT(*) AS n_events,
         MAX(epoch_us(ts)) AS last_us
  FROM events GROUP BY event_type
),
with_head AS (
  SELECT *, MAX(last_us) OVER () AS head_us FROM per_type
),
recent AS (
  SELECT e.event_type, COUNT(*) AS n_last_24h
  FROM events e JOIN with_head h USING (event_type)
  WHERE epoch_us(e.ts) > h.head_us - {FRESH_HORIZON_US}
  GROUP BY e.event_type
)
SELECT w.event_type, w.n_events,
       make_timestamp(w.last_us) AS last_ts,
       CAST((w.head_us - w.last_us) // 1000000 AS BIGINT) AS staleness_s,
       CAST(COALESCE(r.n_last_24h, 0) AS BIGINT) AS n_last_24h
FROM with_head w LEFT JOIN recent r USING (event_type)
ORDER BY w.event_type
"""


# --------------------------------------------------------------------------
# rank stability (Kendall tau between the time halves' leaderboards)
# --------------------------------------------------------------------------

#: leaderboard depth the tau is computed over.
RANK_TAU_K = 50


def rank_stability_tau(events: DataFrame) -> DataFrame:
    """Kendall tau-a between the early-half and late-half activity
    RANKINGS of the users present in both halves' top-K — the rank-
    correlation companion to ``topk_churn``: churn counts who left
    the leaderboard, tau measures whether the survivors kept their
    ORDER (tau 1 = stable regime, ~0 = reshuffled, negative =
    inverted). Pure integer arithmetic: concordant/discordant pairs
    count over the <= K common members (a K^2-bounded self-join of a
    broadcast-sized table), tau is one guarded double division.

    The halves split at the exact integer midpoint (the
    ``topk_churn`` floor convention) and each half's top-K is a
    TakeOrdered with total (cnt DESC, user ASC) order — both engines
    pick identical sets, so the pair census is deterministic.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    span = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    mid = F.col("lo") + F.floor(
        (F.col("hi") - F.col("lo")) / F.lit(2)
    ).cast("long")
    counts = _reliable_checkpoint(
        events.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            (F.unix_micros("ts") <= mid).cast("int").alias("early"),
        )
        .groupBy("user_id", "early")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def topk(early: int, rname: str) -> DataFrame:
        w = Window.orderBy(F.col("cnt").desc(), F.col("user_id").asc())
        return (
            counts.filter(F.col("early") == early)
            .orderBy(F.col("cnt").desc(), F.col("user_id").asc())
            .limit(RANK_TAU_K)
            .withColumn(rname, F.row_number().over(w))
            .select(F.col("user_id").alias("u"), rname)
        )

    common = topk(1, "ra").join(topk(0, "rb"), "u")
    a = common.select(
        F.col("u").alias("u1"), F.col("ra").alias("ra1"),
        F.col("rb").alias("rb1"),
    )
    b = common.select(
        F.col("u").alias("u2"), F.col("ra").alias("ra2"),
        F.col("rb").alias("rb2"),
    )
    pairs = a.join(F.broadcast(b), F.col("u1") < F.col("u2")).select(
        (
            (F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2")) > 0
        ).cast("long").alias("conc")
    )
    m = common.agg(F.count(F.lit(1)).alias("m"))
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("conc").alias("n_conc"),
    )
    tau = F.when(
        F.col("n_pairs") > 0,
        (F.lit(2) * F.col("n_conc") - F.col("n_pairs")).cast("double")
        / F.col("n_pairs").cast("double"),
    )
    return stats.crossJoin(F.broadcast(m)).select(
        F.lit(RANK_TAU_K).alias("k"),
        F.col("m").alias("n_common"),
        F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        F.coalesce("n_conc", F.lit(0)).alias("n_concordant"),
        tau.alias("tau"),
    )


def rank_stability_tau_sql() -> str:
    k = RANK_TAU_K
    half = """
  SELECT user_id AS u,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS {rname}
  FROM (SELECT user_id, COUNT(*) AS cnt FROM flagged
        WHERE early = {early} GROUP BY user_id)
  ORDER BY cnt DESC, u ASC LIMIT {k}
"""
    return f"""
WITH span AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
flagged AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts)
                   <= lo + CAST(floor((hi - lo) / 2) AS BIGINT)
              THEN 1 ELSE 0 END AS early
  FROM events CROSS JOIN span
),
ha AS ({half.format(early=1, rname="ra", k=k)}),
hb AS ({half.format(early=0, rname="rb", k=k)}),
common AS (SELECT ha.u, ha.ra, hb.rb FROM ha JOIN hb ON ha.u = hb.u),
pairs AS (
  SELECT CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0 THEN 1 ELSE 0 END
           AS conc
  FROM common a JOIN common b ON a.u < b.u
),
m AS (SELECT COUNT(*) AS m FROM common),
stats AS (SELECT COUNT(*) AS n_pairs, SUM(conc) AS n_conc FROM pairs)
SELECT CAST({k} AS INT) AS k, CAST(m AS BIGINT) AS n_common,
       CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(n_conc, 0) AS BIGINT) AS n_concordant,
       CASE WHEN n_pairs > 0
            THEN CAST(2 * n_conc - n_pairs AS DOUBLE)
                 / CAST(n_pairs AS DOUBLE) END AS tau
FROM stats, m
"""


# --------------------------------------------------------------------------
# activity streaks (longest consecutive-day runs per user)
# --------------------------------------------------------------------------


def activity_streaks(events: DataFrame) -> DataFrame:
    """Distribution of each user's LONGEST consecutive-active-day
    streak — the engagement shape behind retention curves (a corpus
    of 1-day streaks and a corpus of 30-day streaks can have the
    same DAU): rows of (streak_len, n_users). The islands shape
    (``burst_episodes``) applied per user on the day grid.

    Integer arithmetic on epoch-day numbers; the islands window
    partitions by user (real partitions, never a global sort); the
    distinct (user, day) grid is the only row-scale shuffle, and the
    result is streak-length bounded.
    """
    from pyspark.sql import Window

    days = events.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.select(
        "user_id",
        "d",
        F.when(F.col("d") - F.lag("d").over(w) == 1, 0)
        .otherwise(1)
        .alias("brk"),
    ).withColumn(
        "gid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    streaks = grp.groupBy("user_id", "gid").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("streak_len"))
    return (
        best.groupBy("streak_len")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("streak_len")
    )


def activity_streaks_sql() -> str:
    return """
WITH days AS (
  SELECT DISTINCT user_id,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
  FROM events
),
brk AS (
  SELECT user_id, d,
         CASE WHEN d - LAG(d) OVER (PARTITION BY user_id ORDER BY d) = 1
              THEN 0 ELSE 1 END AS b
  FROM days
),
grp AS (
  SELECT user_id, d,
         SUM(b) OVER (PARTITION BY user_id ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS gid
  FROM brk
),
streaks AS (SELECT user_id, gid, COUNT(*) AS len FROM grp
            GROUP BY user_id, gid),
best AS (SELECT user_id, MAX(len) AS streak_len FROM streaks
         GROUP BY user_id)
SELECT CAST(streak_len AS BIGINT) AS streak_len, COUNT(*) AS n_users
FROM best GROUP BY streak_len ORDER BY streak_len
"""


# --------------------------------------------------------------------------
# sessionization gap sensitivity sweep
# --------------------------------------------------------------------------

#: inactivity gaps swept (seconds).
SESSION_SWEEP_GAPS = (900, 1800, 3600)


def session_gap_sweep(events: DataFrame) -> DataFrame:
    """Sessionization-threshold sensitivity: the session count (and
    mean events per session) the corpus produces at inactivity gaps
    of 15 / 30 / 60 minutes — the tuning readout BEHIND
    ``events_sessionize``'s hard-coded 30-minute gap (the
    ``dedup_threshold_sweep`` pattern applied to the session
    operator; a cliff between two gaps means the choice matters, a
    plateau means it doesn't).

    No per-gap sessionization runs: a session STARTS at each user's
    first event and at every inter-event gap >= g (exactly
    session_window's half-open semantics), so sessions(g) =
    n_users + #(gaps >= g) — ONE lag pass over user-partitioned
    integer micros and one conditional aggregation answer all three
    gaps. Tied timestamps produce zero-gaps, below every threshold
    regardless of tie order, so the counts are order-independent.
    Mean events/session is one double division per row.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
        ).alias("gap_us"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    ]
    for g in SESSION_SWEEP_GAPS:
        aggs.append(
            F.sum(
                (F.col("gap_us") >= F.lit(g * 1_000_000)).cast("long")
            ).alias(f"brk_{g}")
        )
    one = gaps.agg(*aggs)
    arms = F.array(
        *[
            F.struct(
                F.lit(g).alias("gap_s"),
                (F.col("n_users") + F.coalesce(F.col(f"brk_{g}"), F.lit(0)))
                .alias("n_sessions"),
            )
            for g in SESSION_SWEEP_GAPS
        ]
    )
    return (
        one.select("n_events", F.explode(arms).alias("a"))
        .select(
            F.col("a.gap_s").alias("gap_s"),
            F.col("a.n_sessions").alias("n_sessions"),
            F.when(
                F.col("a.n_sessions") > 0,
                F.col("n_events").cast("double")
                / F.col("a.n_sessions").cast("double"),
            ).alias("mean_events_per_session"),
        )
        .orderBy("gap_s")
    )


def session_gap_sweep_sql() -> str:
    brks = ",\n         ".join(
        f"SUM(CASE WHEN gap_us >= {g * 1_000_000} THEN 1 ELSE 0 END)"
        f" AS brk_{g}"
        for g in SESSION_SWEEP_GAPS
    )
    arms = "\nUNION ALL ".join(
        f"SELECT {g} AS gap_s, n_users + COALESCE(brk_{g}, 0) AS n_sessions,"
        f" n_events FROM one"
        for g in SESSION_SWEEP_GAPS
    )
    return f"""
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
),
one AS (
  SELECT COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
         {brks}
  FROM gaps
),
arms AS ({arms})
SELECT CAST(gap_s AS INT) AS gap_s,
       CAST(n_sessions AS BIGINT) AS n_sessions,
       CASE WHEN n_sessions > 0
            THEN CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE)
       END AS mean_events_per_session
FROM arms ORDER BY gap_s
"""
