"""Window-function and event-time operators over the events table.

The reference has no window functions (SURVEY.md §2.5) — these are the
forward-mapped extensions a time-series/training-data pipeline needs:
per-group top-N, running aggregates, tumbling-window rollups,
session windows, and JSON property extraction. The tumbling/session
shapes are the batch twins of the Structured Streaming module
(streaming/events.py): the same groupBy(window(...)) code runs on a
stream with a watermark.

Determinism: monetary sums use the exact-decimal convention
(plans/tpch.py); running sums quantize to int64 cents so prefix sums
are exact integers in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topn_per_group(
    customer: DataFrame, n: int = 3
) -> DataFrame:
    """Top-N customers by account balance per nation (rank window).

    At scale this is one shuffle on the partition key; the sort is
    per-partition. Deterministic tie-break on the key column.
    """
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


def topn_per_group_sql(n: int = 3) -> str:
    return f"""
SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) t WHERE rn <= {n}
"""


def running_sum(events: DataFrame) -> DataFrame:
    """Per-user running total of event value, ordered by time.

    Values are exact 2-decimal doubles; quantizing to int64 cents makes
    the prefix sums order-independent-exact, then we emit dollars."""
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("running_value"),
    )


def running_sum_sql() -> str:
    return """
SELECT user_id, event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       / 100.0 AS running_value
FROM events
"""


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows: count + exact sum per type.

    Identical code runs on a stream (see streaming/events.py) — in
    batch, ``window()`` is just a projection + hash agg, one shuffle.
    """
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_rollup_sql() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.

    Uses Spark's native ``session_window`` (merges events whose
    timestamps are < gap apart; a gap of exactly 30min starts a new
    session). Output: user session bounds (min/max event time) + count.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select("user_id", "first_ts", "last_ts", "n_events")
    )


def session_windows_sql(gap_seconds: int = 1800) -> str:
    # gaps-and-islands: a new session starts when the previous event of
    # the same user is >= gap away (matching session_window's half-open
    # [start, last+gap) semantics).
    return f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def event_deltas(events: DataFrame) -> DataFrame:
    """lag/lead family: per-user inter-event gap (seconds since the
    user's previous event; NULL on each user's first event) and the
    next event's type. One shuffle on user_id, per-partition sort."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # exact integer microseconds — second-level flooring would disagree
    # across engines on sub-second timestamps
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("micros_since_prev"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


def event_deltas_sql() -> str:
    return """
SELECT user_id, event_id,
       epoch_us(ts)
         - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         AS micros_since_prev,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         AS next_event_type
FROM events
"""


def daily_type_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP aggregation: event counts at (date, type), (date), and
    grand-total levels in one pass — partial aggregation handles all
    grouping sets map-side, one shuffle total. NULL marks the rolled-up
    dimension (normalized to literal 'ALL' for engine-portable
    output)."""
    d = F.to_date("ts").cast("string")
    return (
        events.select(d.alias("day"), "event_type")
        .rollup("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
        )
    )


def daily_type_rollup_sql() -> str:
    return """
SELECT COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY ROLLUP (CAST(CAST(ts AS DATE) AS VARCHAR), event_type)
"""


def clicked_not_purchased(events: DataFrame) -> DataFrame:
    """Set operation family: (user, day) pairs with a click but no
    purchase that day (EXCEPT). Spark plans except-distinct as a
    left-anti hash join — no full sort."""
    day = F.to_date("ts").cast("string").alias("day")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", day)
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.distinct().subtract(purchases.distinct())


def clicked_not_purchased_sql() -> str:
    return """
SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'click'
EXCEPT
SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'purchase'
"""


def distinct_users_per_type(events: DataFrame) -> DataFrame:
    """Distinct aggregation: exact per-type distinct-user counts plus
    each type's event count. Spark plans count(DISTINCT x) as a
    two-phase expand/partial-agg — still one logical pass; for
    cardinality-only needs at extreme scale, approx_count_distinct
    (HLL) is the drop-in (not used here so the oracle stays exact)."""
    return events.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def distinct_users_per_type_sql() -> str:
    return """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def json_props(events: DataFrame) -> DataFrame:
    """Extract the integer property k from the JSON props column —
    semi-structured extraction as a pushed-down column expression."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def json_props_sql() -> str:
    return "SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events"


def monthly_type_cube(events: DataFrame) -> DataFrame:
    """CUBE aggregation: counts + exact-decimal sums for every subset
    of (month, event_type) — the 2^k grouping sets in one pass, one
    shuffle, partial-agg map-side (same machinery as ROLLUP plus the
    (type)-only set). NULL marks rolled-up dims, normalized to 'ALL'."""
    mo = F.date_format("ts", "yyyy-MM")
    return (
        events.select(mo.alias("month"), "event_type", "value")
        .cube("month", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.coalesce("month", F.lit("ALL")).alias("month"),
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def monthly_type_cube_sql() -> str:
    return """
SELECT COALESCE(strftime(ts, '%Y-%m'), 'ALL') AS month,
       COALESCE(event_type, 'ALL') AS event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY CUBE (strftime(ts, '%Y-%m'), event_type)
"""


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-type percentiles of the value column (p50/p90/p99,
    linear interpolation).

    Exact percentile needs the sorted group in one place — fine here
    (five types, each group fits an executor after the shuffle). At
    100 TB the drop-in is approx_percentile (t-digest: mergeable
    sketches, map-side combinable, no full sort); the exact form stays
    the correctness oracle for it. Interpolation arithmetic is the
    same IEEE expression in both engines, so results hash-match.
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.99)").alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def value_percentiles_sql() -> str:
    return """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def clicked_and_purchased(events: DataFrame) -> DataFrame:
    """Set operation family, INTERSECT leg: (user, day) pairs that
    clicked AND purchased that day. Spark plans intersect-distinct as
    a left-semi hash join over the distinct sets — with EXCEPT
    (clicked_not_purchased) this completes union/except/intersect
    (union-by-PK lives in the upsert path, sources/upsert.py)."""
    day = F.to_date("ts").cast("string").alias("day")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", day)
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.intersect(purchases)


def clicked_and_purchased_sql() -> str:
    return """
SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'purchase'
"""


def trailing_window_sum(events: DataFrame, seconds: int = 3600) -> DataFrame:
    """Per-user trailing time-window aggregate at every event: the sum
    of event values in the last ``seconds`` (inclusive of the current
    row), computed with a RANGE window frame over epoch seconds.

    This is the time-RANGE frame the other window operators don't
    cover: the frame is defined by a VALUE interval, not a row count —
    rows with equal timestamps are frame peers in both engines, so the
    result is deterministic without a unique tie-break column. One
    shuffle on user_id; the per-partition sort is shared with any
    other user_id-partitioned window in the stage.

    Exactness: values quantize to int64 cents before the windowed sum
    (the frame is a prefix-difference computation internally — float
    accumulation would drift run-to-run), emitted as dollars.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("__epoch"))
        .rangeBetween(-(seconds - 1), 0)
    )
    return events.select(
        "event_id",
        "user_id",
        cents.alias("__cents"),
        F.col("ts").cast("long").alias("__epoch"),
    ).select(
        "event_id",
        "user_id",
        (F.sum("__cents").over(w).cast("double") / 100.0).alias("trail_sum"),
    )


def trailing_window_sum_sql(seconds: int = 3600) -> str:
    return f"""
SELECT event_id, user_id,
       CAST(SUM(cents) OVER (
         PARTITION BY user_id ORDER BY epoch
         RANGE BETWEEN {seconds - 1} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100.0 AS trail_sum
FROM (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) // 1000000 AS epoch
  FROM events
) t
"""


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(events: DataFrame) -> DataFrame:
    """Ordered-funnel analysis: per user, the deepest stage of
    view -> click -> purchase reached IN ORDER (a click before any
    view does not count), then user counts per stage.

    Single-shuffle shape: one groupBy(user_id) collects the user's
    (ts, event_id, type) events, array_sort makes the order
    deterministic (event_id breaks ts ties), and a per-row LEFT FOLD
    walks the sequence advancing a stage counter — the classic
    sessionless funnel in one pass, no self-joins per step (the
    naive k-step funnel is k-1 self-joins of the event table). The
    fold is per-row array arithmetic, so cost beyond the single
    shuffle is linear in events-per-user.
    """
    ev = events.filter(F.col("event_type").isin(*FUNNEL_STEPS)).select(
        "user_id", "ts", "event_id", "event_type"
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    stage = F.aggregate(
        F.col("seq"),
        F.lit(0),
        lambda acc, e: (
            F.when((acc == 0) & (e["event_type"] == FUNNEL_STEPS[0]), 1)
            .when((acc == 1) & (e["event_type"] == FUNNEL_STEPS[1]), 2)
            .when((acc == 2) & (e["event_type"] == FUNNEL_STEPS[2]), 3)
            .otherwise(acc)
        ),
    )
    return (
        seq.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("stage")
    )


def funnel_stages_sql() -> str:
    steps = FUNNEL_STEPS
    in_list = ", ".join(f"'{s}'" for s in steps)
    return f"""
WITH seq AS (
  SELECT user_id, list(event_type ORDER BY ts, event_id) AS tl
  FROM events WHERE event_type IN ({in_list})
  GROUP BY user_id
),
st AS (
  SELECT user_id,
         CAST(list_reduce(list_prepend('0', tl), (acc, e) ->
           CASE WHEN acc = '0' AND e = '{steps[0]}' THEN '1'
                WHEN acc = '1' AND e = '{steps[1]}' THEN '2'
                WHEN acc = '2' AND e = '{steps[2]}' THEN '3'
                ELSE acc END) AS INT) AS stage
  FROM seq
)
SELECT stage, count(*) AS n_users FROM st GROUP BY stage ORDER BY stage
"""


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    FIRST event; for each (cohort_week, week_offset), the distinct
    users still active that many weeks later.

    Shape: first-event agg keyed user_id, joined back to events on
    the SAME key (the two shuffles share the user_id partitioning, so
    the join itself is exchange-aligned), then a count-distinct per
    (cohort, offset). Offsets are exact integer epoch arithmetic —
    no date-diff rounding ambiguity between engines.
    """
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    offset = F.floor(
        (F.col("ts").cast("long") - F.col("first_ts").cast("long"))
        / F.lit(7 * 86400)
    ).cast("int")
    return (
        events.select("user_id", "ts")
        .join(firsts, "user_id")
        .select(
            F.date_trunc("week", F.col("first_ts")).alias("cohort_week"),
            offset.alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def cohort_retention_sql() -> str:
    return """
WITH firsts AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT date_trunc('week', first_ts) AS cohort_week,
       CAST((epoch_us(ts) // 1000000 - epoch_us(first_ts) // 1000000) // 604800 AS INT) AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN firsts USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def value_ntiles(events: DataFrame, n: int = 4) -> DataFrame:
    """Quartile (NTILE) assignment per event type, rolled up to the
    per-(type, quartile) count and value range — the distribution
    summary that drives outlier caps and binning decisions.

    NTILE is position-based, so the order must be total for the
    assignment to be deterministic: (value, event_id) — event_id
    breaks value ties identically in every engine. One shuffle on
    event_type; the rollup reuses the same partitioning.
    """
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    tiled = events.select(
        "event_type", "value", F.ntile(n).over(w).alias("tile")
    )
    return (
        tiled.groupBy("event_type", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("event_type", "tile")
    )


def value_ntiles_sql(n: int = 4) -> str:
    return f"""
SELECT event_type, tile, COUNT(*) AS n_events,
       MIN(value) AS lo, MAX(value) AS hi
FROM (
  SELECT event_type, value,
         NTILE({n}) OVER (PARTITION BY event_type
                          ORDER BY value ASC, event_id ASC) AS tile
  FROM events
) t
GROUP BY event_type, tile
ORDER BY event_type, tile
"""


def clicked_or_purchased(events: DataFrame) -> DataFrame:
    """Set operation family, UNION leg: distinct (user, day) pairs
    with a click OR a purchase that day — with EXCEPT
    (clicked_not_purchased) and INTERSECT (clicked_and_purchased)
    this completes the relational set-operation trio. UNION DISTINCT
    plans as one hash aggregate over the concatenated inputs: both
    scans feed one exchange, no join at all."""
    day = F.to_date("ts").cast("string").alias("day")
    clicks = events.filter(F.col("event_type") == "click").select("user_id", day)
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", day)
    return clicks.union(purchases).distinct()


def clicked_or_purchased_sql() -> str:
    return """
SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'click'
UNION
SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
FROM events WHERE event_type = 'purchase'
"""


def mad_outliers(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust outlier counts per event type via median/MAD: a value is
    an outlier when |x - median| > k * 1.4826 * MAD (the normal-
    consistent robust z-score — unlike mean/stddev, one huge outlier
    cannot mask others).

    Two percentile passes (median, then median of absolute
    deviations), each a groupBy on the same tiny key domain; the join
    back to rows broadcasts the per-type medians. Exact percentile is
    the correctness oracle; at 100 TB approx_percentile drops in
    (see value_percentiles).
    """
    med = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = events.select("event_type", "value").join(F.broadcast(med), "event_type")
    mad = (
        dev.select("event_type", F.abs(F.col("value") - F.col("med")).alias("ad"))
        .groupBy("event_type")
        .agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    )
    flagged = (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            (
                F.abs(F.col("value") - F.col("med"))
                > F.lit(k) * F.lit(1.4826) * F.col("mad")
            ).cast("int").alias("is_outlier"),
        )
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_outlier").cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def mad_outliers_sql(k: float = 3.0) -> str:
    return f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(abs(value - med), 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN abs(d.value - d.med) > {k} * 1.4826 * m.mad
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


# --------------------------------------------------------------------------
# approximate-aggregate acceptance gate (round 4)
# --------------------------------------------------------------------------

#: relative-error acceptance band for the HLL drop-in check.
APPROX_DISTINCT_RSD = 0.05


def approx_distinct_check(events: DataFrame) -> DataFrame:
    """Exact per-type distinct-user counts PLUS the acceptance flag for
    the at-scale approximate drop-in: (event_type, n_exact, hll_ok).

    ``distinct_agg`` documents approx_count_distinct (HyperLogLog++) as
    the 100 TB replacement for exact count-distinct; this operator IS
    the acceptance gate you run at a small scale factor before making
    that swap: hll_ok asserts the sketch landed within
    ``APPROX_DISTINCT_RSD`` relative error of the exact count. The
    sketch is deterministic for a given input, so the flag is stable
    and oracle-checkable (the oracle asserts the contract — exact
    counts and an all-true flag — not the sketch internals, which are
    engine-specific by design).

    Shape: one expand-style two-phase agg for the exact counts and one
    HLL agg, both map-side combinable; output is |event_type| rows.
    """
    agg = events.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=APPROX_DISTINCT_RSD / 2).alias("n_hll"),
    )
    rel_err = F.abs(F.col("n_hll") - F.col("n_exact")).cast("double") / F.col(
        "n_exact"
    ).cast("double")
    return agg.select(
        "event_type",
        "n_exact",
        (rel_err <= APPROX_DISTINCT_RSD).alias("hll_ok"),
    ).orderBy("event_type")


def approx_distinct_check_sql() -> str:
    """DuckDB twin: the exact counts plus the contract's expected flag.
    (HLL sketches differ across engines by construction; the flag — not
    the sketch value — is the cross-engine contract.)"""
    return """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_exact,
       TRUE AS hll_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension history from an update stream:
    each (user_id, value) update becomes a validity interval
    (user_id, value, ts_from, ts_to), ts_to = next update's timestamp
    for the key (NULL while current) — the standard warehouse layout
    for as-of attribute lookups, built here from the purchase stream.

    One window shuffle on user_id; LEAD is computed in the same pass
    that orders the frame. Epochs are exact microsecond integers so
    the interval bounds hash identically cross-engine.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    upd = events.filter(F.col("event_type") == "purchase")
    return (
        upd.select(
            "user_id",
            "value",
            F.unix_micros("ts").alias("ts_from"),
            F.lead(F.unix_micros("ts")).over(w).alias("ts_to"),
        )
        .orderBy("user_id", "ts_from")
    )


def scd2_intervals_sql() -> str:
    return """
SELECT user_id, value,
       epoch_us(ts) AS ts_from,
       LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS ts_to
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, ts_from
"""


#: acceptance tolerance for the approx_percentile (t-digest) drop-in.
APPROX_QUANTILE_TOL = 0.05


def approx_quantile_check(events: DataFrame) -> DataFrame:
    """Exact per-type p50/p95 of value PLUS acceptance flags for the
    at-scale approximate drop-in: (event_type, p50_exact, p95_exact,
    p50_ok, p95_ok).

    ``value_percentiles`` documents approx_percentile (t-digest:
    mergeable map-side-combinable sketches, no full sort) as the
    100 TB replacement for exact percentile; this is the acceptance
    gate run at a small SF before the swap — each flag asserts the
    sketch landed within ``APPROX_QUANTILE_TOL`` relative error of
    the exact value. The sketch is deterministic for a given input so
    the flags are stable; the oracle asserts the contract (exact
    values + all-true flags), not sketch internals, which are
    engine-specific by design — the same pattern as the HLL gate.
    """
    agg = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50_exact"),
        F.expr("percentile(value, 0.95)").alias("p95_exact"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("p50_approx"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("p95_approx"),
    )

    def ok(approx: str, exact: str):
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= F.lit(APPROX_QUANTILE_TOL) * F.abs(F.col(exact))
        )

    return agg.select(
        "event_type",
        "p50_exact",
        "p95_exact",
        ok("p50_approx", "p50_exact").alias("p50_ok"),
        ok("p95_approx", "p95_exact").alias("p95_ok"),
    ).orderBy("event_type")


def approx_quantile_check_sql() -> str:
    """DuckDB twin: exact quantiles plus the contract's expected flags
    (t-digest internals differ across engines by construction)."""
    return """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50_exact,
       quantile_cont(value, 0.95) AS p95_exact,
       TRUE AS p50_ok,
       TRUE AS p95_ok
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def unpivot_lineitem_metrics(lineitem: DataFrame) -> DataFrame:
    """Wide-to-long reshape (unpivot/melt) + per-metric profile:
    lineitem's four numeric measures become (metric, val) rows, then
    one agg yields count/sum per metric — the normalization step that
    feeds generic per-metric monitoring.

    Scale shape: unpivot plans as an Expand PROJECTION (each input row
    emits 4 tagged rows map-side) — zero shuffle for the reshape
    itself; the only exchange is the 4-group partial agg. Sums follow
    the exact-decimal convention (decimal accumulate, double emit).
    """
    measures = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    long = lineitem.unpivot(
        ids=["l_orderkey"],
        values=list(measures),
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("metric")
    )


def unpivot_lineitem_metrics_sql() -> str:
    # UNION ALL construction — engine-neutral unpivot semantics.
    legs = "\nUNION ALL\n".join(
        f"SELECT l_orderkey, '{m}' AS metric, {m} AS val FROM lineitem"
        for m in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    )
    return f"""
WITH long AS (
{legs}
)
SELECT metric, COUNT(*) AS n,
       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM long
GROUP BY metric
ORDER BY metric
"""


def hourly_anomaly(events: DataFrame) -> DataFrame:
    """Volume-anomaly monitor: hourly event counts per type, flagged
    when they sit more than 3 sigma from the type's mean hour — the
    pipeline-health query you run over the event firehose.

    Cross-engine determinism: mean/variance come from exact integer
    count sums (SUM(cnt), SUM(cnt^2) — population variance via
    (sumsq - sum^2/n)/n) with doubles entering only in the final
    identical expression tree; the per-type stats row (one per type)
    broadcasts back onto the hourly counts, so the only shuffles are
    the two partial-agg counts.
    """
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("cnt").alias("sum_c"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq_c"),
    )
    n_d = F.col("n_hours").cast("double")
    sum_d = F.col("sum_c").cast("double")
    sumsq_d = F.col("sumsq_c").cast("double")
    mean = sum_d / n_d
    # clamp: at huge per-type counts (sum_c^2 > 2^53) float rounding
    # can push a ~0 variance slightly negative — Spark would return
    # NaN while DuckDB errors on sqrt(<0); greatest(0.0, ...) in BOTH
    # engines keeps the twins aligned
    sigma = F.sqrt(F.greatest(F.lit(0.0), (sumsq_d - sum_d * sum_d / n_d) / n_d))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "hour",
            "cnt",
            (F.abs(F.col("cnt").cast("double") - mean) > F.lit(3.0) * sigma).alias(
                "is_anomaly"
            ),
        )
        .orderBy("event_type", "hour")
    )


def hourly_anomaly_sql() -> str:
    return """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
stats AS (
  SELECT event_type,
         COUNT(*) AS n_hours,
         CAST(SUM(cnt) AS BIGINT) AS sum_c,
         CAST(SUM(cnt * cnt) AS BIGINT) AS sumsq_c
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.hour, h.cnt,
       abs(CAST(h.cnt AS DOUBLE) - CAST(sum_c AS DOUBLE) / CAST(n_hours AS DOUBLE))
         > 3.0 * sqrt(greatest(0.0,
                      (CAST(sumsq_c AS DOUBLE)
                       - CAST(sum_c AS DOUBLE) * CAST(sum_c AS DOUBLE) / CAST(n_hours AS DOUBLE))
                      / CAST(n_hours AS DOUBLE))) AS is_anomaly
FROM hourly h JOIN stats s USING (event_type)
ORDER BY event_type, hour
"""


#: first-K events per user considered for the journey path.
PATH_K = 5


def event_paths(events: DataFrame, k: int = PATH_K, top: int = 20) -> DataFrame:
    """Top user-journey paths: each user's first-k events (by time)
    joined into an ordered `a>b>c` path string, then the most common
    paths ranked — the funnel-discovery complement to the fixed-order
    ``funnel_stages``.

    Scale shape: the first-k restriction is a rank filter that plans
    as a map-side Partial WindowGroupLimit (shuffle bounded at
    map_partitions x users x k rows, and path length is bounded by
    construction — unbounded per-user journey strings would not
    survive 100 TB); the path build sorts each user's k-struct array
    in-row (deterministic (ts, event_id) order regardless of shuffle
    arrival), and the final ranking is TakeOrderedAndProject.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    first_k = (
        events.select(
            "user_id", "ts", "event_id", "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= k)
    )
    paths = first_k.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(top)
    )


def event_paths_sql(k: int = PATH_K, top: int = 20) -> str:
    return f"""
WITH first_k AS (
  SELECT user_id, ts, event_id, event_type
  FROM (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM events) t
  WHERE rn <= {k}
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
  FROM first_k GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users
FROM paths GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {top}
"""


def value_rank_stats(events: DataFrame) -> DataFrame:
    """Relative-rank window family (percent_rank + cume_dist): each
    purchase's value position within its event type — the remaining
    SQL window-function group (row_number/rank/ntile/lag/lead/frames
    live in the sibling operators).

    The full (value, event_id) tiebreak makes every row's rank unique,
    so both statistics are exact integer ratios — (rank-1)/(n-1) and
    rn/n — identical across engines. One shuffle on event_type.
    """
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "event_type",
            "value",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("event_id")
    )


def value_rank_stats_sql() -> str:
    return """
SELECT event_id, event_type, value,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM events
WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# forward fill (gap fill)
# --------------------------------------------------------------------------


def forward_fill_purchase_value(events: DataFrame) -> DataFrame:
    """Per-user forward fill: every event carries the value of the
    user's most recent purchase at or before it (NULL until the first
    purchase) — the classic feature-engineering gap-fill, as ONE
    window pass (``last(..., ignorenulls)`` over an unbounded-preceding
    frame), no self-join.

    One shuffle on user_id; deterministic ordering via (ts, event_id)
    — event_id is unique, so equal-timestamp rows resolve identically
    in any engine.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    src = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        events.select("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("filled_purchase_value",
                    F.last(src, ignorenulls=True).over(
                        w))
        .select("event_id", "user_id", "event_type", "filled_purchase_value")
        .orderBy("event_id")
    )


def forward_fill_purchase_value_sql() -> str:
    return """
SELECT event_id, user_id, event_type,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS filled_purchase_value
FROM events
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# per-group mode (most frequent value, deterministic tie-break)
# --------------------------------------------------------------------------


def mode_event_type_per_user(events: DataFrame) -> DataFrame:
    """Per-user modal event type: the most frequent event_type, ties
    broken by the lexicographically smallest type — the deterministic
    mode used for categorical imputation in training pipelines.

    Shape: count aggregation (map-side combinable) then a row_number
    window over the per-user count table — the window input is
    |users| x |event types| rows, already tiny relative to the event
    stream, so the second shuffle is negligible at any scale.
    """
    counts = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_event_type"),
                F.col("cnt").alias("n_events"))
        .orderBy("user_id")
    )


def mode_event_type_per_user_sql() -> str:
    return """
SELECT user_id, event_type AS modal_event_type, COUNT(*) AS n_events
FROM events
GROUP BY user_id, event_type
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY COUNT(*) DESC, event_type ASC) = 1
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# exact-sum feature correlation
# --------------------------------------------------------------------------


def feature_corr(lineitem: DataFrame) -> DataFrame:
    """Per-returnflag Pearson correlation of quantity vs extended
    price — the feature-screening statistic a training pipeline runs
    before assembling correlated columns into one model.

    Determinism: ``corr()`` itself accumulates doubles and is
    partition-order-dependent, so it can't be oracle-checked. Instead
    the five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are
    EXACT integer sums of cent-quantized values (per-term products fit
    int64; the sums accumulate as decimal(38,0) — Σy² reaches ~6e18 at
    sf0.1 and would overflow a bigint accumulator at 100 TB), and the
    correlation is assembled in double arithmetic FROM those exact
    sums — the identical expression tree on identical inputs in both
    engines. One map-side-combinable aggregation, one shuffle of 3
    keys.
    """
    xc = F.round(F.col("l_quantity") * 100).cast("long")
    yc = F.round(F.col("l_extendedprice") * 100).cast("long")
    d38 = "decimal(38,0)"
    agg = (
        lineitem.select(F.col("l_returnflag"), xc.alias("xc"), yc.alias("yc"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("xc").cast(d38)).alias("sx"),
            F.sum(F.col("yc").cast(d38)).alias("sy"),
            F.sum((F.col("xc") * F.col("xc")).cast(d38)).alias("sxx"),
            F.sum((F.col("yc") * F.col("yc")).cast(d38)).alias("syy"),
            F.sum((F.col("xc") * F.col("yc")).cast(d38)).alias("sxy"),
        )
    )
    n = F.col("n_rows").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    # zero-variance guard (round-5 advice): a group whose feature is
    # constant has n*sxx - sx*sx == 0; Spark double division would
    # emit NaN where DuckDB emits NULL, so gate to NULL in BOTH
    # engines (mirrors robust_scale's IQR==0 guard).
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > F.lit(0.0)) & (vy > F.lit(0.0)),
        (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return agg.select(
        "l_returnflag",
        "n_rows",
        (sx / n / F.lit(100.0)).alias("mean_qty"),
        (sy / n / F.lit(100.0)).alias("mean_price"),
        corr.alias("corr_qty_price"),
    ).orderBy("l_returnflag")


def feature_corr_sql() -> str:
    return """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS sx,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy,
         SUM(CAST(round(l_quantity * 100) AS BIGINT)
             * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_rows,
       CAST(sx AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100.0 AS mean_qty,
       CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE) / 100.0 AS mean_price,
       CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
              AND (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
       THEN (CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS corr_qty_price
FROM s ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# robust scaling (median/IQR feature normalization)
# --------------------------------------------------------------------------


def robust_scale(events: DataFrame) -> DataFrame:
    """Per-type robust feature scaling: (value - median) / IQR — the
    outlier-resistant normalization (sklearn RobustScaler) a feature
    pipeline applies before models that assume centered inputs.

    Determinism: median/quartiles use percentile_disc — SELECTION of
    actual data values, no interpolation arithmetic — so the per-group
    stats are bit-identical in any engine and at any partition count;
    the scaling itself is then one identical double expression per
    row. Tiny per-type stats broadcast back onto the row stream
    (mad_outliers' shape); IQR = 0 yields NULL, not a division blowup.
    """
    stats = events.groupBy("event_type").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("q1"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        events.select("event_id", "event_type", "value")
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(iqr > 0, (F.col("value") - F.col("med")) / iqr).alias(
                "scaled_value"
            ),
        )
        .orderBy("event_id")
    )


def robust_scale_sql() -> str:
    return """
WITH stats AS (
  SELECT event_type,
         quantile_disc(value, 0.5) AS med,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       CASE WHEN (q3 - q1) > 0 THEN (value - med) / (q3 - q1) END AS scaled_value
FROM events e JOIN stats s USING (event_type)
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# event-type transition matrix (first-order Markov)
# --------------------------------------------------------------------------


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix of user behavior:
    (from_type, to_type, n_transitions, p) where p is the row-
    normalized transition probability — the sequence-mining summary
    behind "what do users do after X" product questions and synthetic
    session generation.

    One lead() window per user (shuffle on user_id), then a tiny
    (types x types) aggregation; p = exact integer count ratios.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    pairs = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tw = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tw).cast("double")
        ).alias("p"),
    ).orderBy("from_type", "to_type")


def event_transitions_sql() -> str:
    return """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM counts
ORDER BY from_type, to_type
"""


# --------------------------------------------------------------------------
# calendar spine gap fill
# --------------------------------------------------------------------------


def date_spine_fill(events: DataFrame) -> DataFrame:
    """Dense daily series: every calendar day from the corpus min to
    max date appears exactly once per event type, zero-filled where no
    events landed — the gap-fill that makes window/trend arithmetic
    safe (a missing day silently skews any moving average computed
    over sparse rows).

    The spine is ``sequence(min_day, max_day)`` — generated from two
    scalar aggregates, exploded map-side, cross-joined with the tiny
    type dimension, then LEFT-joined with the daily aggregates.
    Nothing in the big table shuffles twice: daily aggregation is the
    only event-stream shuffle; the spine side is dimension-sized.
    """
    days = events.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    types = events.select("event_type").distinct()
    spine = days.crossJoin(types)
    daily = events.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    return (
        spine.join(daily, ["day", "event_type"], "left")
        .select(
            F.col("day").cast("string").alias("day"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("value_cents", F.lit(0)).alias("value_cents"),
        )
        .orderBy("day", "event_type")
    )


def date_spine_fill_sql() -> str:
    return """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
),
spine AS (
  SELECT CAST(u.day AS DATE) AS day
  FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(day)
),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(s.day AS VARCHAR) AS day, t.event_type,
       COALESCE(d.n_events, 0) AS n_events,
       COALESCE(d.value_cents, 0) AS value_cents
FROM spine s CROSS JOIN types t
LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
ORDER BY day, t.event_type
"""


# --------------------------------------------------------------------------
# share-of-total window ratio
# --------------------------------------------------------------------------


def share_of_total(events: DataFrame) -> DataFrame:
    """Per-event share of its type's total value — the percent-of-
    total window ratio (contribution analysis). Numerator and
    denominator are exact integer cents (the partition sum is
    order-independent), so the single divide is bit-identical in any
    engine; one shuffle on event_type."""
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("event_type")
    return (
        events.select("event_id", "event_type", cents.alias("cents"))
        .withColumn(
            "share",
            F.col("cents").cast("double") / F.sum("cents").over(w).cast("double"),
        )
        .select("event_id", "event_type", "share")
        .orderBy("event_id")
    )


def share_of_total_sql() -> str:
    return """
SELECT event_id, event_type,
       CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE)
         / CAST(SUM(CAST(round(value * 100) AS BIGINT))
                OVER (PARTITION BY event_type) AS DOUBLE) AS share
FROM events
ORDER BY event_id
"""


#: session-duration histogram bucket width (minutes).
SESSION_BUCKET_MIN = 10


def session_duration_histogram(events: DataFrame) -> DataFrame:
    """Distribution of session lengths: sessions (30-min inactivity
    gap, the ``session_windows`` operator) bucketed by duration in
    10-minute bins, with event-count statistics per bin — the
    engagement profile a product pipeline derives right after
    sessionization.

    Durations are exact integer microsecond differences; the bucket is
    integer division; per-bin stats are exact counts/sums. Composes
    the existing sessionization pass (one user-keyed shuffle) with one
    tiny-key aggregation.
    """
    sess = session_windows(events)
    return (
        sess.select(
            (
                F.expr(
                    f"((unix_micros(last_ts) - unix_micros(first_ts))"
                    f" div 60000000 div {SESSION_BUCKET_MIN})"
                    f" * {SESSION_BUCKET_MIN}"
                )
            ).alias("bucket_min"),
            "n_events",
        )
        .groupBy("bucket_min")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


def session_duration_histogram_sql(gap_seconds: int = 1800) -> str:
    # compose the sessionization twin instead of restating its CTEs:
    # if the gap semantics ever change, both oracles move together
    sess = session_windows_sql(gap_seconds)
    return f"""
WITH sess AS (SELECT * FROM ({sess}) s)
SELECT (CAST((epoch_us(last_ts) - epoch_us(first_ts)) // 60000000 AS BIGINT)
        // {SESSION_BUCKET_MIN}) * {SESSION_BUCKET_MIN} AS bucket_min,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events
FROM sess
GROUP BY 1
"""


# --------------------------------------------------------------------------
# skyline (Pareto frontier) preference query
# --------------------------------------------------------------------------

#: spend-range bucket width (cents) for the skyline pre-prune.
SKYLINE_BUCKET_CENTS = 10_000_000


def skyline_pareto(orders: DataFrame, bucket_cents: int = SKYLINE_BUCKET_CENTS) -> DataFrame:
    """Pareto frontier of customers over (total spend, order count),
    both maximized: a customer is on the skyline iff no other customer
    has >= spend AND >= orders with at least one strict — the classic
    preference/skyline operator (Borzsony/Kossmann/Stocker, ICDE'01).

    Dominance reduces to two window maxima over the per-customer
    aggregate: p is dominated iff
      max(orders | spend > spend_p)  >= orders_p   (strict-spend branch)
      OR max(orders | spend = spend_p) > orders_p  (tie branch),
    so the whole frontier costs one sort — no quadratic self-join.

    Scale: before the (global-sort) window, a bucket prune drops every
    row whose order count is beaten-or-tied by some strictly-higher
    spend bucket's max — computed from a bucket-count-sized aggregate
    and a broadcast join. The prune is semantics-preserving (any
    dominator it removes is itself dominated by a surviving row with
    even higher spend — the witness chain ascends buckets and must
    terminate at a survivor), and it shrinks the global sort from
    customer-scale to near-frontier-scale, the distributed-skyline
    local-prune-then-merge pattern. The DuckDB twin deliberately uses
    the DIRECT unpruned formulation, so the oracle also checks the
    prune's semantics-preservation on real data.

    Exactness: spend is int64 cents; every comparison is integer.
    """
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "spend_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .withColumn("bucket", F.expr(f"spend_cents div {bucket_cents}"))
    )
    bmax = per_cust.groupBy("bucket").agg(F.max("n_orders").alias("bmax"))
    w_above = Window.orderBy("bucket").rowsBetween(1, Window.unboundedFollowing)
    prune_bound = bmax.select(
        "bucket",
        F.coalesce(F.max("bmax").over(w_above), F.lit(-1)).alias("above_max"),
    )
    survivors = (
        per_cust.join(F.broadcast(prune_bound), "bucket")
        .filter(F.col("above_max") < F.col("n_orders"))
        .select("c_custkey", "spend_cents", "n_orders")
    )
    w_gt = Window.orderBy("spend_cents").rangeBetween(1, Window.unboundedFollowing)
    w_eq = Window.partitionBy("spend_cents")
    flagged = survivors.select(
        "c_custkey",
        "spend_cents",
        "n_orders",
        F.coalesce(F.max("n_orders").over(w_gt), F.lit(-1)).alias("gt_max"),
        F.max("n_orders").over(w_eq).alias("eq_max"),
    )
    return (
        flagged.filter(
            ~((F.col("gt_max") >= F.col("n_orders")) | (F.col("eq_max") > F.col("n_orders")))
        )
        .select("c_custkey", "spend_cents", "n_orders")
        .orderBy(F.col("spend_cents").desc(), F.col("c_custkey").asc())
    )


def skyline_pareto_sql() -> str:
    """Direct (unpruned) dominance formulation — an independent
    algorithm from the Spark side's bucket-pruned plan, so agreement
    checks both the arithmetic and the prune proof."""
    return """
WITH per_cust AS (
  SELECT o_custkey AS c_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS spend_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
flagged AS (
  SELECT c_custkey, spend_cents, n_orders,
         COALESCE(MAX(n_orders) OVER (ORDER BY spend_cents
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), -1) AS gt_max,
         MAX(n_orders) OVER (PARTITION BY spend_cents) AS eq_max
  FROM per_cust
)
SELECT c_custkey, spend_cents, n_orders
FROM flagged
WHERE NOT (gt_max >= n_orders OR eq_max > n_orders)
ORDER BY spend_cents DESC, c_custkey ASC
"""


# --------------------------------------------------------------------------
# staged round-8 additions: marketing attribution + correlation matrix
# --------------------------------------------------------------------------

#: attribution lookback window (microseconds): 7 days.
ATTR_WINDOW_US = 7 * 24 * 3600 * 1_000_000
#: event types that can receive attribution credit.
ATTR_SOURCES = ("click", "view")
#: the conversion event.
ATTR_CONVERSION = "purchase"


def attribution(events: DataFrame) -> DataFrame:
    """Last-touch attribution: credit each purchase to the user's most
    recent click/view within a 7-day lookback — the standard
    marketing/growth attribution readout, grouped by credited source
    (with 'none' for purchases that had no source in window).

    Per user, one ordered window pass: the last preceding source
    event's timestamp and type ride two last(..., ignorenulls) columns
    over ROWS UNBOUNDED PRECEDING..1 PRECEDING (both pick the same
    row because they null out together and the ordering is made total
    by event_id). Delays are exact integer microseconds. One shuffle
    on user_id, then a tiny-key aggregation.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = F.unix_micros(F.col("ts"))
    is_src = F.col("event_type").isin(*ATTR_SOURCES)
    enriched = events.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("us"),
        F.last(F.when(is_src, us), ignorenulls=True).over(w).alias("src_us"),
        F.last(F.when(is_src, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("src_type"),
    )
    purchases = enriched.filter(F.col("event_type") == ATTR_CONVERSION)
    credited = purchases.select(
        F.when(
            F.col("src_us").isNotNull()
            & (F.col("us") - F.col("src_us") <= ATTR_WINDOW_US),
            F.col("src_type"),
        )
        .otherwise(F.lit("none"))
        .alias("credited_source"),
        F.when(
            F.col("src_us").isNotNull()
            & (F.col("us") - F.col("src_us") <= ATTR_WINDOW_US),
            F.col("us") - F.col("src_us"),
        ).alias("delay_us"),
    )
    return (
        credited.groupBy("credited_source")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("delay_us").alias("total_delay_us"),
            (
                F.sum("delay_us").cast("double")
                / F.count("delay_us").cast("double")
                / F.lit(1_000_000.0)
            ).alias("avg_delay_s"),
        )
        .orderBy("credited_source")
    )


def attribution_sql() -> str:
    srcs = ", ".join(f"'{s}'" for s in ATTR_SOURCES)
    return f"""
WITH enriched AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         last_value(CASE WHEN event_type IN ({srcs}) THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_us,
         last_value(CASE WHEN event_type IN ({srcs}) THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS src_type
  FROM events
),
credited AS (
  SELECT CASE WHEN src_us IS NOT NULL AND us - src_us <= {ATTR_WINDOW_US}
              THEN src_type ELSE 'none' END AS credited_source,
         CASE WHEN src_us IS NOT NULL AND us - src_us <= {ATTR_WINDOW_US}
              THEN us - src_us END AS delay_us
  FROM enriched WHERE event_type = '{ATTR_CONVERSION}'
)
SELECT credited_source, COUNT(*) AS n_purchases,
       CAST(SUM(delay_us) AS BIGINT) AS total_delay_us,
       CAST(SUM(delay_us) AS DOUBLE) / CAST(COUNT(delay_us) AS DOUBLE)
         / 1000000.0 AS avg_delay_s
FROM credited GROUP BY credited_source ORDER BY credited_source
"""


#: corr_matrix columns and their integer quantization factors (chosen
#: so each per-term product of two quantized values fits int64).
CORR_MATRIX_COLS = (
    ("l_quantity", 100),
    ("l_extendedprice", 100),
    ("l_discount", 10_000),
    ("l_tax", 10_000),
)


def corr_matrix(lineitem: DataFrame) -> DataFrame:
    """Full pairwise Pearson correlation matrix over the lineitem
    numeric features — the feature-redundancy screen run before
    assembling a training matrix (generalizes ``feature_corr`` from
    one pair to the full upper triangle).

    ONE scan computes every sufficient statistic (each column's exact
    integer-quantized sum/sum-of-squares and each pair's cross sum,
    accumulating as decimal(38,0) — the ``feature_corr`` convention);
    the 6 upper-triangle cells are then assembled as literal-projected
    rows from that single aggregate row. Correlation is a double
    expression over exact sums (sqrt is IEEE-exact), identical in
    both engines. Zero-variance columns yield NULL cells.
    """
    d38 = "decimal(38,0)"
    cols = CORR_MATRIX_COLS
    qcol = {
        c: F.round(F.col(c) * q).cast("long").alias(f"q_{c}") for c, q in cols
    }
    base = lineitem.select(*qcol.values())
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, _ in cols:
        aggs.append(F.sum(F.col(f"q_{c}").cast(d38)).alias(f"s_{c}"))
        aggs.append(
            F.sum((F.col(f"q_{c}") * F.col(f"q_{c}")).cast(d38)).alias(
                f"ss_{c}"
            )
        )
    names = [c for c, _ in cols]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(
                F.sum((F.col(f"q_{a}") * F.col(f"q_{b}")).cast(d38)).alias(
                    f"sp_{a}_{b}"
                )
            )
    stats = base.agg(*aggs)

    def corr_cell(a: str, b: str):
        n = F.col("n_rows").cast(d38)
        vx = n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vy = n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        num = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        return F.when(
            (vx > 0) & (vy > 0),
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        )

    # ONE select + inline(array<struct>) materializes all 6 cells from
    # the single stats row — a union of per-cell selects would
    # re-instantiate the scan+aggregate subtree per cell (6 full scans
    # of the fact table at 100 TB; verified in the physical plan).
    cells = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cells.append(
                F.struct(
                    F.lit(a).alias("col_x"),
                    F.lit(b).alias("col_y"),
                    corr_cell(a, b).alias("corr"),
                )
            )
    return (
        stats.select(F.col("n_rows"), F.inline(F.array(*cells)))
        .select("col_x", "col_y", "n_rows", "corr")
        .orderBy("col_x", "col_y")
    )


def corr_matrix_sql() -> str:
    cols = CORR_MATRIX_COLS
    names = [c for c, _ in cols]
    terms = ["COUNT(*) AS n_rows"]
    for c, q in cols:
        t = f"CAST(round({c} * {q}) AS BIGINT)"
        terms.append(f"SUM(CAST({t} AS HUGEINT)) AS s_{c}")
        terms.append(
            f"SUM(CAST({t} AS HUGEINT) * CAST({t} AS HUGEINT)) AS ss_{c}"
        )
    qexpr = {c: f"CAST(round({c} * {q}) AS BIGINT)" for c, q in cols}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            terms.append(
                f"SUM(CAST({qexpr[a]} AS HUGEINT)"
                f" * CAST({qexpr[b]} AS HUGEINT)) AS sp_{a}_{b}"
            )
    cells = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            vx = f"(n_rows * ss_{a} - s_{a} * s_{a})"
            vy = f"(n_rows * ss_{b} - s_{b} * s_{b})"
            num = f"(n_rows * sp_{a}_{b} - s_{a} * s_{b})"
            # hugeint -> double via VARCHAR: DuckDB's direct cast is
            # not correctly rounded past 2^53 (see grouped_ols_sql)
            cells.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, n_rows,"
                f" CASE WHEN {vx} > 0 AND {vy} > 0 THEN"
                f" CAST(CAST({num} AS VARCHAR) AS DOUBLE)"
                f" / (sqrt(CAST(CAST({vx} AS VARCHAR) AS DOUBLE))"
                f" * sqrt(CAST(CAST({vy} AS VARCHAR) AS DOUBLE)))"
                f" END AS corr FROM stats"
            )
    union = "\nUNION ALL\n".join(cells)
    return f"""
WITH stats AS (
  SELECT {', '.join(terms)} FROM lineitem
)
SELECT * FROM ({union}) ORDER BY col_x, col_y
"""


# --------------------------------------------------------------------------
# time-weighted average (TWAP) per user
# --------------------------------------------------------------------------


def time_weighted_average(events: DataFrame) -> DataFrame:
    """Per-user time-weighted average of ``value`` — the TWAP every
    monitoring/trading/metering pipeline computes when observations
    arrive irregularly: each value is weighted by how long it was
    current (until the next event), so a burst of cheap readings
    cannot drown a long-lived expensive one.

    Exactness: weights are integer microseconds (lead - ts), values
    integer cents, and each cents * dt term multiplies as
    decimal(38,0) x decimal(38,0) — two int64 factors always fit the
    38-digit product (<= 8.5e37), so there is NO per-term gap bound
    and no silent int64 wrap; twap is one double division of two
    exact sums. The last event of a user
    has no duration and contributes nothing (standard left-open
    TWAP); single-event users surface NULL. Scale: one user-keyed
    window pass (the lead), then a user-keyed aggregation on the SAME
    partitioning — Spark reuses the exchange, so the fact table
    shuffles once.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros(F.col("ts"))
    cents = F.round(F.col("value") * 100).cast("long")
    seq = events.select(
        "user_id",
        cents.alias("cents"),
        us.alias("us"),
        F.lead(us).over(w).alias("next_us"),
    )
    dt = F.col("next_us") - F.col("us")
    agg = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                dt.isNotNull(),
                F.col("cents").cast("decimal(38,0)") * dt.cast("decimal(38,0)"),
            ).otherwise(None)
        ).alias("vw"),
        F.sum(dt.cast("decimal(38,0)")).alias("tw"),
    )
    twap = F.when(
        F.col("tw") > 0,
        F.col("vw").cast("double") / F.col("tw").cast("double") / F.lit(100.0),
    )
    return agg.select(
        "user_id",
        "n_events",
        F.col("tw").cast("long").alias("total_us"),
        twap.alias("twap"),
    ).orderBy("user_id")


def time_weighted_average_sql() -> str:
    return """
WITH seq AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC) AS next_us
  FROM events
),
agg AS (
  SELECT user_id, COUNT(*) AS n_events,
         SUM(CAST(cents AS HUGEINT) * (next_us - us)) AS vw,
         SUM(CAST(next_us - us AS HUGEINT)) AS tw
  FROM seq GROUP BY user_id
)
SELECT user_id, n_events, CAST(tw AS BIGINT) AS total_us,
       CASE WHEN tw > 0 THEN
         CAST(CAST(vw AS VARCHAR) AS DOUBLE)
           / CAST(CAST(tw AS VARCHAR) AS DOUBLE) / 100.0
       END AS twap
FROM agg ORDER BY user_id
"""


# --------------------------------------------------------------------------
# RFM (recency / frequency / monetary) customer segmentation
# --------------------------------------------------------------------------


def rfm_segments(orders: DataFrame) -> DataFrame:
    """RFM segmentation — the classic marketing/CRM customer scoring:
    each customer's Recency (last order date), Frequency (order
    count) and Monetary (total spend) dimension is scored into
    quartiles 1..4 and customers roll up per 3-digit segment code
    (rfm = r*100 + f*10 + m, 4 = best).

    Recency quartiles are computed on the last-order date directly
    (as integer epoch days — Spark's percentile_disc takes numerics
    only; more recent = higher quartile), so no global "today" anchor
    is needed. Quartile edges are percentile_disc SELECTIONS (actual
    attained values) of the per-customer table, broadcast as one row;
    scoring is pure comparisons, so everything is integer/date-exact
    and engine-portable — no interpolated quantiles, no RNG.

    Scale: orders aggregate once by customer (one key shuffle); the
    edges are ONE tiny aggregation over that per-customer table; the
    scored rollup is a <= 64-key aggregation. Quartile boundary
    semantics: score q means value > edge_{q-1} (strict), edges at
    the 25/50/75 percentile_disc selections.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
        ).alias("last_date"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("cents"),
    )
    edges = per_cust.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"{c}_{int(q * 100)}")
            for c in ("last_date", "freq", "cents")
            for q in (0.25, 0.5, 0.75)
        ]
    )

    def score(c: str):
        return (
            F.when(F.col(c) > F.col(f"{c}_75"), 4)
            .when(F.col(c) > F.col(f"{c}_50"), 3)
            .when(F.col(c) > F.col(f"{c}_25"), 2)
            .otherwise(1)
        )

    scored = per_cust.crossJoin(F.broadcast(edges)).select(
        (
            score("last_date") * 100 + score("freq") * 10 + score("cents")
        ).alias("rfm"),
        "cents",
    )
    return (
        scored.groupBy("rfm")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum("cents").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(100.0)
            ).alias("avg_monetary"),
        )
        .orderBy("rfm")
    )


def rfm_segments_sql() -> str:
    edge_sel = ", ".join(
        f"quantile_disc({c}, {q}) AS {c}_{int(q * 100)}"
        for c in ("last_date", "freq", "cents")
        for q in (0.25, 0.5, 0.75)
    )

    def score(c: str) -> str:
        return (
            f"CASE WHEN {c} > {c}_75 THEN 4"
            f" WHEN {c} > {c}_50 THEN 3"
            f" WHEN {c} > {c}_25 THEN 2 ELSE 1 END"
        )

    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                  AS INTEGER)) AS last_date,
         COUNT(*) AS freq,
         SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
           AS cents
  FROM orders GROUP BY o_custkey
),
edges AS (SELECT {edge_sel} FROM per_cust),
scored AS (
  SELECT {score('last_date')} * 100 + {score('freq')} * 10
           + {score('cents')} AS rfm,
         cents
  FROM per_cust CROSS JOIN edges
)
SELECT rfm, COUNT(*) AS n_customers,
       CAST(CAST(SUM(cents) AS VARCHAR) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_monetary
FROM scored GROUP BY rfm ORDER BY rfm
"""


# --------------------------------------------------------------------------
# period-over-period delta attribution by segment
# --------------------------------------------------------------------------


def delta_attribution(events: DataFrame) -> DataFrame:
    """Which segment explains the change? Split the event stream into
    two deterministic fortnight-parity periods and attribute the
    total count delta to event types — the root-cause decomposition
    ("sessions dropped 8%; checkout -12pp, search +4pp") every
    metrics/ops review runs on a moved topline.

    Exact: period = epoch-day mod 14 < 7 (pure integer arithmetic on
    the timestamp), per-type counts and deltas are exact integers,
    and share_of_delta = delta / total_delta is ONE double division
    (NULL when the topline didn't move). One scan, one tiny-key
    aggregation; the topline total attaches as a window over the
    per-type rows (no second scan)."""
    day = F.expr("unix_micros(ts) div 86400000000")
    in_a = ((day % 14) < 7).cast("int")
    per = events.groupBy("event_type").agg(
        F.sum(in_a).alias("cnt_a"),
        F.sum(1 - in_a).alias("cnt_b"),
    )
    w_all = Window.partitionBy()
    enriched = per.select(
        "event_type",
        "cnt_a",
        "cnt_b",
        (F.col("cnt_b") - F.col("cnt_a")).alias("delta"),
        F.sum(F.col("cnt_b") - F.col("cnt_a")).over(w_all).alias("total_delta"),
    )
    share = F.when(
        F.col("total_delta") != 0,
        F.col("delta").cast("double") / F.col("total_delta").cast("double"),
    )
    return enriched.select(
        "event_type",
        "cnt_a",
        "cnt_b",
        "delta",
        "total_delta",
        share.alias("share_of_delta"),
    ).orderBy("event_type")


def delta_attribution_sql() -> str:
    return """
WITH per AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 14 < 7
                       THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(SUM(CASE WHEN (epoch_us(ts) // 86400000000) % 14 < 7
                       THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
  FROM events GROUP BY event_type
),
enriched AS (
  SELECT event_type, cnt_a, cnt_b, cnt_b - cnt_a AS delta,
         CAST(SUM(cnt_b - cnt_a) OVER () AS BIGINT) AS total_delta
  FROM per
)
SELECT event_type, cnt_a, cnt_b, delta, total_delta,
       CASE WHEN total_delta <> 0 THEN
         CAST(delta AS DOUBLE) / CAST(total_delta AS DOUBLE)
       END AS share_of_delta
FROM enriched ORDER BY event_type
"""


# --------------------------------------------------------------------------
# concurrency profile: sweep-line over session intervals
# --------------------------------------------------------------------------

#: concurrency prefix-sum bucket width (microseconds) — one hour.
CONC_BUCKET_US = 3_600_000_000


def concurrency_profile(events: DataFrame) -> DataFrame:
    """Peak concurrent sessions per hour — the capacity-planning
    sweep-line every serving/infra team runs: sessionize, emit +1 at
    each session start and -1 at its end, and the running sum of
    deltas in time order IS the concurrency; per hour, report the
    delta counts and the maximum concurrency reached.

    The classic algorithm needs one GLOBAL ordered prefix sum — a
    single reducer at 100 TB — so the running sum is assembled with
    the two-level bucketed pattern (the roc_auc shape): deltas
    prefix-sum WITHIN their hour bucket (parallel windows), only the
    per-hour delta totals cross the tiny global window, and each
    row's concurrency = its bucket's carry-in + its within-bucket
    prefix. Tie order is pinned (t ASC, delta ASC): an end meeting a
    start at the same microsecond processes first, so touching
    sessions never double-count. Documented consequence of that tie
    order (round-9 ADVICE): a ZERO-DURATION session (single-event,
    first_ts == last_ts) emits its -1 before its own +1, so it
    contributes 0 to peak concurrency and the running sum can dip
    transiently negative at its instant — instantaneous sessions are
    deliberately NOT counted as capacity load (they hold no resource
    for any positive duration); both engines implement the identical
    ordering, so parity is exact. Consumers that want point sessions
    to register should pre-extend last_ts by one microsecond before
    sessionizing. All arithmetic is exact integers.
    Hours with no session boundary carry constant concurrency and
    emit no row (the delta stream is empty there) — the consumer
    forward-fills, exactly like ``date_spine_fill`` composes with
    sparse rollups.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    sess = session_windows(events)
    # one pass over sessions: each emits its +1/-1 boundary rows; the
    # delta stream feeds both the within-bucket windows and the bucket
    # totals, so it is checkpointed (sessions-sized, one events scan)
    deltas = _reliable_checkpoint(
        sess.select(
            F.explode(
                F.array(
                    F.struct(
                        F.unix_micros(F.col("first_ts")).alias("t"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        F.unix_micros(F.col("last_ts")).alias("t"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("d")
        ).select(
            F.col("d.t").alias("t"),
            F.col("d.delta").alias("delta"),
            F.expr(f"d.t div {CONC_BUCKET_US}").alias("bkt"),
        )
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = deltas.withColumn("run_in", F.sum("delta").over(w_in))
    btot = deltas.groupBy("bkt").agg(F.sum("delta").alias("bsum"))
    w_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bcum = btot.select(
        "bkt", F.coalesce(F.sum("bsum").over(w_b), F.lit(0)).alias("carry")
    )
    conc = within.join(F.broadcast(bcum), "bkt").select(
        "bkt",
        "delta",
        (F.col("carry") + F.col("run_in")).alias("conc"),
    )
    return (
        conc.groupBy("bkt")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("starts"),
            F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
            .cast("long")
            .alias("ends"),
            F.max("conc").cast("long").alias("max_concurrency"),
        )
        .select(
            F.timestamp_micros(F.col("bkt") * CONC_BUCKET_US).alias("hour"),
            "starts",
            "ends",
            "max_concurrency",
        )
        .orderBy("hour")
    )


def concurrency_profile_sql(gap_seconds: int = 1800) -> str:
    return f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
sess AS (
  SELECT MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
  FROM sessions GROUP BY user_id, sid
),
deltas AS (
  SELECT d.t, d.delta, d.t // {CONC_BUCKET_US} AS bkt
  FROM sess, LATERAL (VALUES (s, 1), (e, -1)) AS d(t, delta)
),
within AS (
  SELECT *, CAST(SUM(delta) OVER (PARTITION BY bkt
              ORDER BY t ASC, delta ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS run_in
  FROM deltas
),
bcum AS (
  SELECT bkt, COALESCE(CAST(SUM(bsum) OVER (ORDER BY bkt
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
              AS carry
  FROM (SELECT bkt, SUM(delta) AS bsum FROM deltas GROUP BY bkt)
)
SELECT make_timestamp(w.bkt * {CONC_BUCKET_US}) AS hour,
       CAST(SUM(CASE WHEN w.delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS starts,
       CAST(SUM(CASE WHEN w.delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS ends,
       CAST(MAX(b.carry + w.run_in) AS BIGINT) AS max_concurrency
FROM within w JOIN bcum b USING (bkt)
GROUP BY w.bkt ORDER BY hour
"""


def conversion_lag(events: DataFrame) -> DataFrame:
    """Click-to-purchase latency histogram — the conversion-lag
    readout behind attribution windows and funnel SLAs: for every
    purchase, the time since that user's MOST RECENT prior click (the
    as-of pattern as a window, like ``attribution``'s last-touch),
    bucketed into whole minutes with each bucket's share of all
    conversions.

    One user-keyed window pass computes the as-of click per purchase
    (strictly-preceding frame: a click at the purchase's own
    microsecond does not convert to itself); lags are exact integer
    microseconds; the histogram is a tiny-key aggregation and the
    share divides by a window total over the (minute-bounded) bucket
    table — never the event stream. Purchases with no prior click
    (organic/direct) are counted in the lag_min = -1 bucket rather
    than dropped, so the histogram partitions ALL purchases.
    """
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = events.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        us.alias("us"),
        F.last(
            F.when(F.col("event_type") == "click", us), ignorenulls=True
        )
        .over(w)
        .alias("prev_click_us"),
    )
    lags = seq.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("prev_click_us").isNotNull(),
            F.floor((F.col("us") - F.col("prev_click_us")) / F.lit(60_000_000)),
        )
        .otherwise(F.lit(-1))
        .alias("lag_min")
    )
    hist = lags.groupBy("lag_min").agg(F.count(F.lit(1)).alias("n_conversions"))
    total_w = Window.partitionBy()
    return (
        hist.select(
            "lag_min",
            "n_conversions",
            (
                F.col("n_conversions").cast("double")
                / F.sum("n_conversions").over(total_w).cast("double")
            ).alias("share"),
        )
        .orderBy("lag_min")
    )


def conversion_lag_sql() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         LAST_VALUE(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_click_us
  FROM events WHERE event_type IN ('click', 'purchase')
),
lags AS (
  SELECT CASE WHEN prev_click_us IS NOT NULL
              THEN CAST(floor((us - prev_click_us) / 60000000.0) AS BIGINT)
              ELSE -1 END AS lag_min
  FROM seq WHERE event_type = 'purchase'
),
hist AS (SELECT lag_min, COUNT(*) AS n_conversions FROM lags GROUP BY lag_min)
SELECT lag_min, n_conversions,
       CAST(n_conversions AS DOUBLE)
         / CAST(SUM(n_conversions) OVER () AS DOUBLE) AS share
FROM hist ORDER BY lag_min
"""


def attribution_compare(events: DataFrame) -> DataFrame:
    """First-touch vs last-touch attribution, side by side — the
    model-sensitivity readout a growth team checks before trusting
    either number: per source channel, how many purchases each model
    credits it with (and the delta). A channel that wins under
    last-touch but loses under first-touch is closing, not
    originating, demand.

    Both models read ONE ordered pass: a time-bounded RANGE window
    (rangeBetween(-lookback, -1) over integer micros — the lookback
    is enforced by the FRAME, no post-filter) carries min/max over
    source events packed into fixed-width sortable strings
    (zero-padded micros || event_id || type), so the first/last
    pick is a total lexicographic order — deterministic on ties in
    both engines, the ``doc_fingerprint`` string-packing trick. One
    shuffle on user_id, then a channel-count-sized aggregation.
    """
    us = F.unix_micros(F.col("ts"))
    is_src = F.col("event_type").isin(*ATTR_SOURCES)
    packed = F.when(
        is_src,
        F.concat(
            F.lpad(us.cast("string"), 16, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.col("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-ATTR_WINDOW_US, -1)
    )
    enriched = events.select(
        "event_type",
        F.min(packed).over(w).alias("first_p"),
        F.max(packed).over(w).alias("last_p"),
    )
    purchases = enriched.filter(F.col("event_type") == ATTR_CONVERSION)
    src = lambda c: F.coalesce(F.substring(F.col(c), 29, 64), F.lit("none"))
    credited = purchases.select(
        src("first_p").alias("first_source"), src("last_p").alias("last_source")
    )
    firsts = credited.groupBy(F.col("first_source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_first_touch")
    )
    lasts = credited.groupBy(F.col("last_source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_last_touch")
    )
    return (
        firsts.join(lasts, "source", "full_outer")
        .select(
            "source",
            F.coalesce("n_first_touch", F.lit(0)).alias("n_first_touch"),
            F.coalesce("n_last_touch", F.lit(0)).alias("n_last_touch"),
            (
                F.coalesce("n_first_touch", F.lit(0))
                - F.coalesce("n_last_touch", F.lit(0))
            ).alias("first_minus_last"),
        )
        .orderBy("source")
    )


def attribution_compare_sql() -> str:
    srcs = ", ".join(f"'{s}'" for s in ATTR_SOURCES)
    packed = (
        "CASE WHEN event_type IN ({srcs}) THEN"
        " lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0')"
        " || lpad(CAST(event_id AS VARCHAR), 12, '0') || event_type END"
    ).format(srcs=srcs)
    return f"""
WITH enriched AS (
  SELECT event_type,
         MIN({packed}) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {ATTR_WINDOW_US} PRECEDING AND 1 PRECEDING)
           AS first_p,
         MAX({packed}) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN {ATTR_WINDOW_US} PRECEDING AND 1 PRECEDING)
           AS last_p
  FROM events
),
credited AS (
  SELECT COALESCE(substr(first_p, 29), 'none') AS first_source,
         COALESCE(substr(last_p, 29), 'none') AS last_source
  FROM enriched WHERE event_type = '{ATTR_CONVERSION}'
),
firsts AS (SELECT first_source AS source, COUNT(*) AS n_first_touch
           FROM credited GROUP BY 1),
lasts AS (SELECT last_source AS source, COUNT(*) AS n_last_touch
          FROM credited GROUP BY 1)
SELECT COALESCE(f.source, l.source) AS source,
       CAST(COALESCE(f.n_first_touch, 0) AS BIGINT) AS n_first_touch,
       CAST(COALESCE(l.n_last_touch, 0) AS BIGINT) AS n_last_touch,
       CAST(COALESCE(f.n_first_touch, 0) - COALESCE(l.n_last_touch, 0)
            AS BIGINT) AS first_minus_last
FROM firsts f FULL OUTER JOIN lasts l ON f.source = l.source
ORDER BY source
"""
