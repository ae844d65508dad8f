"""Temporal / range join operators.

Spark has no native as-of join (the staple of event-stream feature
engineering: "the latest right-side value at or before each left-side
timestamp"). Rather than a per-key Python loop, ``asof_join`` is a
union + window composition — one shuffle on the join key, sorted once,
whole-stage-codegen throughout — which is the shape that survives
100 TB (no per-row lookups, no driver involvement, AQE handles skewed
keys).

``range_tier_agg`` is the broadcast band-join: classify a fact column
into literal tiers via a tiny broadcast side. The reference has
neither operator (its only joins are pandas index equi-joins,
XGBoost/Predictor.py:47,74,157); these extend SURVEY.md §2.3's J-family
for the training-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# scratch databases created by bucketed_join_totals in this process,
# mapped to the mkdtemp parent dir holding them (None when the caller
# supplied its own database_dir — then the caller owns the directory);
# reclaimed explicitly via drop_scratch_databases once the caller has
# consumed every returned DataFrame (dropping earlier would delete the
# managed-table files out from under a still-lazy reader)
_SCRATCH_DBS: dict = {}


def drop_scratch_databases(spark) -> int:
    """Drop every scratch database this process's
    ``bucketed_join_totals`` calls created, including the mkdtemp
    parent directory when this module created it (DROP DATABASE
    CASCADE removes only the bx_*.db subdirectory). Call ONLY after
    all DataFrames returned by those calls have been consumed — their
    plans read the scratch managed tables lazily. Returns the number
    of databases dropped."""
    import shutil

    n = 0
    for db, parent_dir in list(_SCRATCH_DBS.items()):
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
        if parent_dir is not None:
            shutil.rmtree(parent_dir, ignore_errors=True)
        _SCRATCH_DBS.pop(db, None)
        n += 1
    return n


def _reap_scratch_dirs() -> None:
    """Last-resort disk reclaim at interpreter exit for callers that
    never call drop_scratch_databases (driver correctness runs): the
    JVM is going away with the process, so only the mkdtemp'd
    directories this module itself created are removed."""
    import shutil

    for db, parent_dir in list(_SCRATCH_DBS.items()):
        if parent_dir is not None:
            shutil.rmtree(parent_dir, ignore_errors=True)
        _SCRATCH_DBS.pop(db, None)


import atexit  # noqa: E402  (registered next to the registry it reaps)

atexit.register(_reap_scratch_dirs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    out_col: str = "asof_value",
    tiebreak: str | None = None,
    tolerance_sec: float | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``value_col`` of
    the last ``right`` row with the same ``key`` and ``right_ts`` <=
    ``left_ts`` (NULL when no such row).

    ``tolerance_sec`` bounds the lookback (pandas ``merge_asof``
    tolerance): a match older than ``left_ts - tolerance_sec`` is
    nulled out. Implemented as a second windowed ``last`` carrying the
    matched right row's timestamp — same single shuffle, no extra
    join.

    Implementation: tag both inputs, union them, and take
    ``last(value, ignorenulls)`` over (key) ordered by
    (ts, tag, tiebreak) with an unbounded-preceding frame — right rows
    sort before left rows at equal timestamps, so "at or before" holds
    exactly. One shuffle on ``key``; no range self-join blowup.

    ``tiebreak`` (a right-side column, e.g. its event id) makes the
    winner among equal-timestamp right rows deterministic.
    """
    lcols = left.columns
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tb.alias("__tb"),
        F.col(value_col).alias("__val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).alias("__tb"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("__val"),
        *[F.col(c) for c in lcols if c != key],
    )
    w = (
        W.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = r.unionByName(l).withColumn(
        out_col, F.last("__val", ignorenulls=True).over(w)
    )
    if tolerance_sec is not None:
        # carry the timestamp of the MATCHED row: only right rows whose
        # value is non-null can be the match (last(__val, ignorenulls)
        # skips null-valued rows), so a newer right row with a NULL
        # value must not advance the tolerance clock past a stale match
        rts = F.when(
            (F.col("__tag") == 0) & F.col("__val").isNotNull(), F.col("__ts")
        )
        out = out.withColumn("__rts", F.last(rts, ignorenulls=True).over(w))
        out = out.withColumn(
            out_col,
            F.when(
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__rts"))
                <= F.lit(int(tolerance_sec * 1_000_000)),
                F.col(out_col),
            ),
        )
    return out.filter(F.col("__tag") == 1).select(*lcols, out_col)


def asof_last_purchase(events: DataFrame) -> DataFrame:
    """For every 'click' event: the value of the user's most recent
    'purchase' at or before the click (NULL when none yet)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), "value"
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="value",
        out_col="last_purchase_value",
        tiebreak="p_event_id",
    ).select("event_id", "user_id", "last_purchase_value")


def asof_last_purchase_sql() -> str:
    """DuckDB twin (same union+window plan, spelled in SQL)."""
    return """
WITH u AS (
  SELECT user_id, ts AS __ts, 0 AS __tag, event_id AS __tb, value AS __val,
         NULL::BIGINT AS event_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts AS __ts, 1 AS __tag, 0 AS __tb, NULL::DOUBLE AS __val,
         event_id
  FROM events WHERE event_type = 'click'
),
w AS (
  SELECT *, last_value(__val IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY __ts ASC, __tag ASC, __tb ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_purchase_value
  FROM u
)
SELECT event_id, user_id, last_purchase_value FROM w WHERE __tag = 1
"""


#: tolerance for the bounded as-of entry: one hour.
ASOF_TOLERANCE_SEC = 3600.0


def asof_last_purchase_tolerance(events: DataFrame) -> DataFrame:
    """Bounded as-of: for every 'click', the user's most recent
    'purchase' value ONLY if it happened within the last hour —
    pandas ``merge_asof(tolerance=...)`` semantics, same single-shuffle
    union+window plan (the matched row's timestamp rides along in a
    second windowed ``last``)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), "value"
    )
    return asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_col="value",
        out_col="recent_purchase_value",
        tiebreak="p_event_id",
        tolerance_sec=ASOF_TOLERANCE_SEC,
    ).select("event_id", "user_id", "recent_purchase_value")


def asof_last_purchase_tolerance_sql() -> str:
    tol_us = int(ASOF_TOLERANCE_SEC * 1_000_000)
    return f"""
WITH u AS (
  SELECT user_id, ts AS __ts, 0 AS __tag, event_id AS __tb, value AS __val,
         NULL::BIGINT AS event_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts AS __ts, 1 AS __tag, 0 AS __tb, NULL::DOUBLE AS __val,
         event_id
  FROM events WHERE event_type = 'click'
),
w AS (
  SELECT *,
         last_value(__val IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY __ts ASC, __tag ASC, __tb ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS rv,
         last_value(CASE WHEN __tag = 0 AND __val IS NOT NULL THEN __ts END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY __ts ASC, __tag ASC, __tb ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS rts
  FROM u
)
SELECT event_id, user_id,
       CASE WHEN epoch_us(__ts) - epoch_us(rts) <= {tol_us} THEN rv END
         AS recent_purchase_value
FROM w WHERE __tag = 1
"""


#: literal quantity tiers for the band join (lo inclusive, hi exclusive).
QTY_TIERS: tuple[tuple[str, int, int], ...] = (
    ("scant", 0, 10),
    ("light", 10, 20),
    ("medium", 20, 35),
    ("heavy", 35, 1_000_000),
)


def range_tier_agg(lineitem: DataFrame) -> DataFrame:
    """Literal-tier classification as a shuffle-free CASE projection.

    When the tiers are compile-time literals (the common case), a
    band JOIN — even a broadcast one — is the wrong tool: the CASE
    chain classifies each row inside the scan's projection, whole-
    stage-codegen'd, with zero extra plan nodes; the only exchange in
    the whole query is the final 4-key aggregation. Use
    ``range_tier_agg_bands`` when the tiers live in a real table.

    Exact-decimal sum convention for the cross-engine float identity
    (plans/tpch.py docstring).
    """
    q = F.col("l_quantity").cast("double")
    tier = F.lit(None).cast("string")
    for t, lo, hi in reversed(QTY_TIERS):
        tier = F.when((q >= lo) & (q < hi), t).otherwise(tier)
    return (
        lineitem.select(tier.alias("tier"), "l_extendedprice")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def range_tier_agg_sql() -> str:
    cases = " ".join(
        f"WHEN CAST(l_quantity AS DOUBLE) >= {lo} AND CAST(l_quantity AS DOUBLE) < {hi} THEN '{t}'"
        for t, lo, hi in QTY_TIERS
    )
    return f"""
SELECT CASE {cases} END AS tier, count(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY 1
"""


def range_tier_agg_bands(lineitem: DataFrame, tiers: DataFrame | None = None) -> DataFrame:
    """Band join: classify l_quantity against a tier TABLE (broadcast
    nested-loop against the small side — the fact table never shuffles
    for the join) and aggregate per tier.

    This is the general-tier-table operator: when tier boundaries are
    data (per-tenant pricing bands, config tables), the broadcast band
    join is the right shape. For literal tiers use ``range_tier_agg``
    (a pure projection — strictly cheaper).
    """
    if tiers is None:
        tiers = lineitem.sparkSession.createDataFrame(
            list(QTY_TIERS), ["tier", "lo", "hi"]
        )
    q = F.col("l_quantity").cast("double")
    joined = lineitem.join(
        F.broadcast(tiers), (q >= F.col("lo")) & (q < F.col("hi"))
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


def range_tier_agg_bands_sql() -> str:
    tiers = " UNION ALL ".join(
        f"SELECT '{t}' AS tier, {lo} AS lo, {hi} AS hi" for t, lo, hi in QTY_TIERS
    )
    return f"""
WITH tiers AS ({tiers})
SELECT tier, count(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN tiers
  ON CAST(l_quantity AS DOUBLE) >= lo AND CAST(l_quantity AS DOUBLE) < hi
GROUP BY tier
"""


def bucketed_join_totals(
    spark,
    lineitem: DataFrame,
    orders: DataFrame,
    buckets: int = 8,
    database_dir: str | None = None,
) -> DataFrame:
    """Shuffle-free big-big equi-join via BUCKETING: both tables are
    written bucketed (and sort-merged) on the join key, so the join
    reads co-located buckets with NO exchange on either side — the
    standard technique for a fact table joined repeatedly on the same
    key at 100 TB, where paying one bucketed write amortizes every
    subsequent join's shuffle away.

    Returns per-orderpriority totals over the joined stream:
    (o_orderpriority, n_items, total_qty). The bucketed copies land in
    a scratch warehouse (``database_dir``/spark-warehouse) as managed
    tables ``bx_lineitem``/``bx_orders`` — at scale these ARE the
    production layout, written once at ingest.

    Plan contract (asserted in tests/test_plans.py): the join is a
    SortMergeJoin with ZERO shuffle exchanges below it — bucket
    pruning replaces both Exchange nodes. The aggregation above it
    still shuffles its (tiny) partial-agg output, as it must.
    """
    import os
    import tempfile
    import uuid

    own_dir = database_dir is None
    if own_dir:
        database_dir = tempfile.mkdtemp(prefix="bucketed_wh_")
    # unique db per invocation: CREATE DATABASE IF NOT EXISTS would
    # silently keep a previous call's LOCATION, ignoring the caller's
    # database_dir on reuse of the same session. The scratch db cannot
    # be dropped inside this function — the RETURNED DataFrame lazily
    # reads the managed tables, and an auto-drop on the next call
    # would invalidate a still-unconsumed earlier result. Callers that
    # are done with every returned DataFrame reclaim the scratch space
    # with ``drop_scratch_databases(spark)``.
    db = f"bx_{uuid.uuid4().hex[:12]}"
    _SCRATCH_DBS[db] = database_dir if own_dir else None
    spark.sql(
        f"CREATE DATABASE {db} "
        f"LOCATION '{os.path.join(database_dir, db + '.db')}'"
    )
    (
        lineitem.select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{db}.bx_lineitem")
    )
    (
        orders.select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{db}.bx_orders")
    )
    li = spark.table(f"{db}.bx_lineitem")
    od = spark.table(f"{db}.bx_orders")
    # merge hint: at fixture scale AQE would broadcast the small side,
    # which hides the technique being demonstrated — at 100 TB neither
    # side of a fact-fact join broadcasts, and SMJ over co-located
    # sorted buckets is exactly the plan this layout buys.
    joined = li.hint("merge").join(od, li.l_orderkey == od.o_orderkey)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("o_orderpriority")
    )


def bucketed_join_totals_sql() -> str:
    """DuckDB twin: bucketing changes the physical layout, never the
    result — the oracle is the plain join+agg."""
    return """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def shuffle_hash_totals(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Big-big equi-join under an explicit SHUFFLE_HASH hint — the
    remaining physical join strategy in the matrix (broadcast / SMJ /
    bucketed-SMJ / salted / BNLJ band / shuffled-hash). When both
    sides are too big to broadcast but one PARTITION of the build side
    fits memory, hash-join beats sort-merge by skipping both sides'
    sorts — the right pick for a skewless fact-fact join whose build
    side is the smaller table. Result = per-orderstatus totals (the
    hint changes the algorithm, never the rows).

    Plan contract (tests/test_plans.py): ShuffledHashJoin, no sort
    below the join.
    """
    li = lineitem.select("l_orderkey", "l_quantity")
    od = orders.select("o_orderkey", "o_orderstatus")
    joined = li.join(od.hint("SHUFFLE_HASH"), li.l_orderkey == od.o_orderkey)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


def shuffle_hash_totals_sql() -> str:
    return """
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# interval-overlap join (temporal join: interval x interval)
# --------------------------------------------------------------------------

#: busy-hour rule: an hour is "busy" when its event count exceeds
#: 1.2x the all-hours average — compared in exact integers as
#: n_hour * n_hours * 5 > total_events * 6.
BUSY_NUM, BUSY_DEN = 6, 5


def interval_overlap_join(events: DataFrame) -> DataFrame:
    """Interval x interval temporal join: per-user SESSIONS (30-min
    inactivity gap) overlapped against BUSY HOURS (hour buckets whose
    event count exceeds 1.2x the hourly average), with the exact
    overlap duration per (session, busy hour).

    This is the interval-overlap class (incident attribution, SLA
    windows, campaign exposure) — distinct from the point-in-interval
    ``range_join`` family. Expressed in the shape that SCALES: because
    busy windows are hour-aligned, each session explodes to the hour
    buckets it covers (bounded by session length — sessions are
    gap-bounded, so the fan-out is small) and the overlap join becomes
    a plain EQUI-join on the hour key — no inequality-pair join, no
    broadcast nested loop, shuffle keyed on the hour at any scale. The
    general lesson is in the docstring deliberately: bucketize both
    interval sides to a common grain and the O(n*m) comparison
    disappears.

    Exactness: bounds and overlaps are integer microseconds
    (unix_micros); the busy-hour rule is an integer
    cross-multiplication; session bounds come from the same
    session_window construction the green events_sessionize entry
    proves against the gaps-and-islands SQL.
    """
    from soccerpredictor_spark.operators.windows import session_windows

    sessions = session_windows(events)
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("busy_hour")
    ).agg(F.count(F.lit(1)).alias("n_hour"))
    tot = hourly.agg(
        F.sum("n_hour").alias("total_events"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    busy = (
        hourly.crossJoin(F.broadcast(tot))
        .filter(
            F.col("n_hour") * F.col("n_hours") * F.lit(BUSY_DEN)
            > F.col("total_events") * F.lit(BUSY_NUM)
        )
        .select("busy_hour", "n_hour")
    )
    covered = sessions.select(
        "user_id",
        "first_ts",
        "last_ts",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("first_ts")),
                F.date_trunc("hour", F.col("last_ts")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("busy_hour"),
    )
    first_us = F.unix_micros(F.col("first_ts"))
    last_us = F.unix_micros(F.col("last_ts"))
    h_us = F.unix_micros(F.col("busy_hour"))
    h_end_us = h_us + F.lit(3_600_000_000)
    overlap = F.least(last_us, h_end_us) - F.greatest(first_us, h_us)
    return (
        covered.join(busy, "busy_hour")
        .select(
            "user_id",
            "first_ts",
            "last_ts",
            "busy_hour",
            "n_hour",
            overlap.alias("overlap_micros"),
        )
        .orderBy("user_id", "first_ts", "busy_hour")
    )


def interval_overlap_join_sql(gap_seconds: int = 1800) -> str:
    return f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   >= {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
sessions AS (
  SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts
  FROM numbered GROUP BY user_id, sid
),
hourly AS (
  SELECT date_trunc('hour', ts) AS busy_hour, COUNT(*) AS n_hour
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_hour) AS BIGINT) AS total_events,
               COUNT(*) AS n_hours FROM hourly),
busy AS (
  SELECT busy_hour, n_hour FROM hourly CROSS JOIN tot
  WHERE n_hour * n_hours * {BUSY_DEN} > total_events * {BUSY_NUM}
),
covered AS (
  SELECT user_id, first_ts, last_ts,
         UNNEST(generate_series(date_trunc('hour', first_ts),
                                date_trunc('hour', last_ts),
                                INTERVAL 1 HOUR)) AS busy_hour
  FROM sessions
)
SELECT user_id, first_ts, last_ts, c.busy_hour, n_hour,
       LEAST(epoch_us(last_ts), epoch_us(c.busy_hour) + 3600000000)
       - GREATEST(epoch_us(first_ts), epoch_us(c.busy_hour)) AS overlap_micros
FROM covered c JOIN busy b ON c.busy_hour = b.busy_hour
ORDER BY user_id, first_ts, c.busy_hour
"""


# --------------------------------------------------------------------------
# fuzzy (edit-distance) token join via deletion-neighborhood blocking
# --------------------------------------------------------------------------

#: maximum edit distance accepted by fuzzy_token_pairs.
FUZZY_MAX_DIST = 1


def fuzzy_token_pairs(part: DataFrame) -> DataFrame:
    """Typo/variant pairs in the part-name vocabulary: all token pairs
    within levenshtein distance 1, found WITHOUT an all-pairs join.

    Blocking is the SymSpell deletion-neighborhood trick: every word
    emits itself plus its single-character deletions (len+1 variants);
    two words within edit distance 1 are GUARANTEED to share a
    variant, so the candidate set is the variant-keyed self-join —
    complete by construction, unlike first-letter or length blocking
    (which miss first-char substitutions). Candidates are then
    verified with the exact levenshtein (shared variants can arise at
    distance 2, e.g. transpositions).

    Scale: work is O(vocab x word_len) variants and O(bucket^2) per
    variant bucket — vocabulary-sized, sublinear in the corpus; the
    fact table is touched once for the distinct-token projection.
    """
    vocab = part.select(
        F.explode(F.split(F.trim(F.lower(F.col("p_name"))), r"\s+")).alias("w")
    ).distinct()
    variants = vocab.select(
        "w",
        F.explode(
            F.expr(
                "array_distinct(concat(array(w),"
                " transform(sequence(1, length(w)),"
                " i -> concat(substr(w, 1, i-1), substr(w, i+1)))))"
            )
        ).alias("v"),
    )
    a = variants.select(F.col("w").alias("a"), "v")
    b = variants.select(F.col("w").alias("b"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return cand.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).filter(F.col("dist") <= FUZZY_MAX_DIST)


def fuzzy_token_pairs_sql() -> str:
    return f"""
WITH vocab AS (
  SELECT DISTINCT unnest(string_split_regex(trim(lower(p_name)), '\\s+')) AS w
  FROM part
),
variants AS (
  SELECT w, unnest(list_distinct(list_concat([w],
           list_transform(range(1, length(w) + 1),
                          i -> substr(w, 1, i-1) || substr(w, i+1))))) AS v
  FROM vocab
),
cand AS (
  SELECT DISTINCT a.w AS a, b.w AS b
  FROM variants a JOIN variants b USING (v)
  WHERE a.w < b.w
)
SELECT a, b, CAST(levenshtein(a, b) AS INTEGER) AS dist
FROM cand WHERE levenshtein(a, b) <= {FUZZY_MAX_DIST}
"""


# --------------------------------------------------------------------------
# market-basket association rules (support / confidence / lift)
# --------------------------------------------------------------------------

#: rules reported (by pair count, deterministic tie-break).
BASKET_TOP_K = 20


def basket_rules(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Top-K pairwise association rules over order baskets — the
    classic market-basket readout (support / confidence / lift,
    Agrawal & Srikant 1994) a feature pipeline mines for co-purchase
    features.

    Scale shape (the load-bearing choices): the pair generation is a
    self-join keyed on the ORDER (baskets are small and bounded — the
    fan-out per order is < |basket|²/2, never corpus-quadratic), and
    both sides of that self-join are the identical distinct-items
    subtree, so the order-keyed exchange is planned once and reused.
    Pair counts aggregate map-side; only the TOP-K pairs (a TakeOrdered
    heap, count desc, then (item_a, item_b) asc) join back against the
    per-item counts, and those two joins BROADCAST the 20-row side —
    the item-count table never moves. n_orders is a 1-row broadcast.

    Exactness: support/confidence are single divisions of exact
    counts; lift = (n * c_xy) / (c_x * c_y) with both products in
    decimal(38,0) (int64 overflows at ~3e9 baskets) and ONE double
    division — bit-identical cross-engine (VARCHAR-mediated cast in
    the DuckDB twin).
    """
    d38 = "decimal(38,0)"
    items = lineitem.select(
        F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
    ).distinct()
    a = items.select("oid", F.col("item").alias("item_a"))
    b = items.select("oid", F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, "oid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    top = pair_counts.orderBy(
        F.col("c_xy").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(BASKET_TOP_K)
    item_counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    n_orders = orders.agg(F.count(F.lit(1)).alias("n_orders"))
    joined = (
        item_counts.join(
            F.broadcast(top), F.col("item") == F.col("item_a")
        )
        .select("item_a", "item_b", "c_xy", F.col("c").alias("c_x"))
        .alias("j1")
    )
    joined2 = item_counts.join(
        F.broadcast(joined), F.col("item") == F.col("item_b")
    ).select("item_a", "item_b", "c_xy", "c_x", F.col("c").alias("c_y"))
    out = joined2.crossJoin(F.broadcast(n_orders))
    support = F.col("c_xy").cast("double") / F.col("n_orders").cast("double")
    confidence = F.col("c_xy").cast("double") / F.col("c_x").cast("double")
    lift = (
        (F.col("n_orders").cast(d38) * F.col("c_xy").cast(d38)).cast("double")
        / (F.col("c_x").cast(d38) * F.col("c_y").cast(d38)).cast("double")
    )
    return out.select(
        "item_a",
        "item_b",
        "c_xy",
        "c_x",
        "c_y",
        support.alias("support"),
        confidence.alias("confidence"),
        lift.alias("lift"),
    ).orderBy(F.col("c_xy").desc(), "item_a", "item_b")


def basket_rules_sql() -> str:
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem
),
pair_counts AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS c_xy
  FROM items a JOIN items b USING (oid)
  WHERE a.item < b.item
  GROUP BY a.item, b.item
),
top AS (
  SELECT * FROM pair_counts
  ORDER BY c_xy DESC, item_a ASC, item_b ASC LIMIT {BASKET_TOP_K}
),
item_counts AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item),
n_t AS (SELECT COUNT(*) AS n_orders FROM orders)
SELECT t.item_a, t.item_b, t.c_xy, x.c AS c_x, y.c AS c_y,
       CAST(t.c_xy AS DOUBLE) / CAST(n.n_orders AS DOUBLE) AS support,
       CAST(t.c_xy AS DOUBLE) / CAST(x.c AS DOUBLE) AS confidence,
       CAST(CAST(CAST(n.n_orders AS HUGEINT) * CAST(t.c_xy AS HUGEINT)
                 AS VARCHAR) AS DOUBLE)
         / CAST(CAST(CAST(x.c AS HUGEINT) * CAST(y.c AS HUGEINT)
                     AS VARCHAR) AS DOUBLE) AS lift
FROM top t
JOIN item_counts x ON x.item = t.item_a
JOIN item_counts y ON y.item = t.item_b
CROSS JOIN n_t n
ORDER BY t.c_xy DESC, t.item_a, t.item_b
"""


# --------------------------------------------------------------------------
# item-item collaborative filtering (cosine over co-purchase counts)
# --------------------------------------------------------------------------

#: neighbors reported per anchor item.
ITEM_CF_K = 5
#: minimum co-occurrences for a pair to count as evidence.
ITEM_CF_MIN_CO = 2


def item_cf(lineitem: DataFrame) -> DataFrame:
    """Item-item collaborative-filtering neighbors: for each part,
    the top-``ITEM_CF_K`` parts by co-purchase cosine

        sim(i, j) = c_ij / sqrt(c_i * c_j)

    over order baskets — the classic "people who bought X also
    bought Y" item-CF kernel (Sarwar et al. 2001), and the
    recommendation-side complement of ``basket_rules`` (rules rank by
    confidence/lift for a FEW top pairs; this emits a bounded
    neighbor list for EVERY item with co-purchase evidence).

    Scale: identical basket-bounded pair generation as basket_rules
    (order-keyed self-join, fan-out < |basket|^2/2 per order, both
    sides one reused exchange); a support floor (c_ij >=
    ITEM_CF_MIN_CO) kills singleton noise before the per-item rank
    window, which is count-bounded at k rows per item. The cosine is
    one double expression over exact integer counts — c_i * c_j in
    decimal(38,0) (int64 overflows past ~3e9 baskets), one sqrt, one
    division, bit-identical cross-engine. Neighbor lists are emitted
    in BOTH directions (i's list may contain j while j's list ranks
    others higher) — reciprocity filtering is ``mutual_knn``'s job on
    the embedding side.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    d38 = "decimal(38,0)"
    # the distinct-items table feeds four consumers (both self-join
    # sides + item counts twice); materialize it ONCE so the fact
    # table scans once — cheaper than 4 parquet passes at 100 TB
    items = _reliable_checkpoint(
        lineitem.select(
            F.col("l_orderkey").alias("oid"), F.col("l_partkey").alias("item")
        ).distinct()
    )
    a = items.select("oid", F.col("item").alias("item_a"))
    b = items.select("oid", F.col("item").alias("item_b"))
    # r20 (§2.3 shuffle fewer bytes — the embedding_pca_power triangle
    # trick): co-purchase counts are SYMMETRIC (c_ij == c_ji), so the
    # basket self-join emits only the upper triangle (item_a < item_b)
    # — half the pair rows through the groupBy exchange — and the
    # lower triangle is mirrored from the AGGREGATED pair table, where
    # the copy is pair-count-sized and free. The mirrored union is the
    # identical (item_a, item_b, c_xy) multiset the != filter built,
    # so every downstream row is unchanged.
    pair_counts_ut = (
        a.join(b, "oid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= ITEM_CF_MIN_CO)
    )
    pair_counts = pair_counts_ut.unionByName(
        pair_counts_ut.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "c_xy",
        )
    )
    item_counts = items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    withc = (
        pair_counts.join(
            item_counts.select(F.col("item").alias("item_a"), F.col("c").alias("c_x")),
            "item_a",
        )
        .join(
            item_counts.select(F.col("item").alias("item_b"), F.col("c").alias("c_y")),
            "item_b",
        )
    )
    sim = F.col("c_xy").cast("double") / F.sqrt(
        (F.col("c_x").cast(d38) * F.col("c_y").cast(d38)).cast("double")
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("sim").desc(), F.col("item_b").asc()
    )
    return (
        withc.select("item_a", "item_b", "c_xy", sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= ITEM_CF_K)
        .orderBy("item_a", "rnk")
    )


def item_cf_sql() -> str:
    return f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem
),
pair_counts AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS c_xy
  FROM items a JOIN items b ON a.oid = b.oid AND a.item != b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {ITEM_CF_MIN_CO}
),
item_counts AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item),
scored AS (
  SELECT p.item_a, p.item_b, p.c_xy,
         CAST(p.c_xy AS DOUBLE)
           / sqrt(CAST(CAST(CAST(x.c AS HUGEINT) * y.c AS VARCHAR) AS DOUBLE))
           AS sim
  FROM pair_counts p
  JOIN item_counts x ON p.item_a = x.item
  JOIN item_counts y ON p.item_b = y.item
)
SELECT item_a, item_b, c_xy, sim,
       CAST(ROW_NUMBER() OVER (PARTITION BY item_a
            ORDER BY sim DESC, item_b ASC) AS INTEGER) AS rnk
FROM scored
QUALIFY rnk <= {ITEM_CF_K}
ORDER BY item_a, rnk
"""


# --------------------------------------------------------------------------
# join-cardinality estimation audit (the CBO histogram discipline)
# --------------------------------------------------------------------------

#: histogram bucket count for the coarse estimate.
JOINSIZE_BUCKETS = 64


def join_size_audit(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Join-cardinality estimation audit — the cost-based-optimizer
    arithmetic every 100 TB engine runs before picking a join
    strategy, surfaced as a measurable query: predict
    |orders ⋈ lineitem on orderkey| three ways and compare to the
    measured row count.

    1. EXACT per-key histograms: sum_k n_o(k) * n_l(k) — equals the
       actual count identically (the audit that the decomposable
       per-key arithmetic is right; products in decimal(38,0)).
    2. COARSE equi-width histograms (what a real CBO stores):
       ``JOINSIZE_BUCKETS`` key-range buckets, containment estimate
       sum_b n_o(b) * n_l(b) / max(d_o(b), d_l(b)) with the
       uniformity assumption — the per-bucket double terms sum via
       the ordered bucket fold.
    3. The independence baseline |O|*|L|/d — what you get with no
       histogram at all.

    rel_error columns quantify what bucket resolution buys: the
    optimizer lesson (and the audit that our histogram pipeline is
    mergeable/decomposable) in one row. All inputs are one
    aggregation per side; nothing joins at row scale except the one
    measured count — and at production scale you'd TRUST the exact
    prediction instead of running it (they are provably equal;
    asserting that equality cheaply at eval scale is this entry's
    point).
    """
    n_o = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_o")
    )
    n_l = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_l")
    )
    d38 = "decimal(38,0)"
    exact = (
        n_o.join(n_l, "k")
        .agg(
            F.sum(
                F.col("c_o").cast(d38) * F.col("c_l").cast(d38)
            ).alias("pred")
        )
        .select(F.col("pred").cast("double").alias("pred_exact"))
    )
    kmax = orders.agg(F.max("o_orderkey").alias("km"))
    bucket = F.expr(f"k div (km div {JOINSIZE_BUCKETS} + 1)")
    bo = (
        n_o.crossJoin(F.broadcast(kmax))
        .select(bucket.alias("b"), "c_o")
        .groupBy("b")
        .agg(
            F.sum("c_o").alias("no_b"),
            F.count(F.lit(1)).alias("do_b"),
        )
    )
    bl = (
        n_l.crossJoin(F.broadcast(kmax))
        .select(bucket.alias("b"), "c_l")
        .groupBy("b")
        .agg(
            F.sum("c_l").alias("nl_b"),
            F.count(F.lit(1)).alias("dl_b"),
        )
    )
    terms = bo.join(bl, "b").select(
        "b",
        (
            F.col("no_b").cast("double")
            * F.col("nl_b").cast("double")
            / F.greatest("do_b", "dl_b").cast("double")
        ).alias("t"),
    )
    coarse = terms.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("b").alias("k"), F.col("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("pred_coarse")
    )
    indep = (
        orders.agg(
            F.count(F.lit(1)).alias("no"),
            F.countDistinct("o_orderkey").alias("do"),
        )
        .crossJoin(
            F.broadcast(
                lineitem.agg(
                    F.count(F.lit(1)).alias("nl"),
                    F.countDistinct("l_orderkey").alias("dl"),
                )
            )
        )
        .select(
            (
                F.col("no").cast("double")
                * F.col("nl").cast("double")
                / F.greatest("do", "dl").cast("double")
            ).alias("pred_indep")
        )
    )
    actual = (
        orders.select(F.col("o_orderkey").alias("k"))
        .join(lineitem.select(F.col("l_orderkey").alias("k")), "k")
        .agg(F.count(F.lit(1)).alias("actual"))
    )
    err = lambda c: (  # noqa: E731
        (F.col(c) - F.col("actual").cast("double"))
        / F.col("actual").cast("double")
    )
    return (
        actual.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(coarse))
        .crossJoin(F.broadcast(indep))
        .select(
            "actual",
            "pred_exact",
            "pred_coarse",
            "pred_indep",
            err("pred_exact").alias("err_exact"),
            err("pred_coarse").alias("err_coarse"),
            err("pred_indep").alias("err_indep"),
        )
    )


def join_size_audit_sql() -> str:
    return f"""
WITH n_o AS (SELECT o_orderkey AS k, COUNT(*) AS c_o FROM orders GROUP BY 1),
n_l AS (SELECT l_orderkey AS k, COUNT(*) AS c_l FROM lineitem GROUP BY 1),
exact AS (
  SELECT CAST(CAST(SUM(CAST(c_o AS HUGEINT) * c_l) AS VARCHAR) AS DOUBLE)
           AS pred_exact
  FROM n_o JOIN n_l USING (k)
),
km AS (SELECT MAX(o_orderkey) AS km FROM orders),
bo AS (
  SELECT k // (km // {JOINSIZE_BUCKETS} + 1) AS b,
         CAST(SUM(c_o) AS BIGINT) AS no_b, COUNT(*) AS do_b
  FROM n_o, km GROUP BY 1
),
bl AS (
  SELECT k // (km // {JOINSIZE_BUCKETS} + 1) AS b,
         CAST(SUM(c_l) AS BIGINT) AS nl_b, COUNT(*) AS dl_b
  FROM n_l, km GROUP BY 1
),
coarse AS (
  SELECT list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(no_b AS DOUBLE) * CAST(nl_b AS DOUBLE)
                  / CAST(GREATEST(do_b, dl_b) AS DOUBLE) ORDER BY b ASC)),
           (acc, x) -> acc + x) AS pred_coarse
  FROM bo JOIN bl USING (b)
),
indep AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders)
         * (SELECT CAST(COUNT(*) AS DOUBLE) FROM lineitem)
         / GREATEST(
             (SELECT CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) FROM orders),
             (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE)
              FROM lineitem)) AS pred_indep
),
actual AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS actual
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)
SELECT actual, pred_exact, pred_coarse, pred_indep,
       (pred_exact - CAST(actual AS DOUBLE)) / CAST(actual AS DOUBLE)
         AS err_exact,
       (pred_coarse - CAST(actual AS DOUBLE)) / CAST(actual AS DOUBLE)
         AS err_coarse,
       (pred_indep - CAST(actual AS DOUBLE)) / CAST(actual AS DOUBLE)
         AS err_indep
FROM actual, exact, coarse, indep
"""


# --------------------------------------------------------------------------
# ship-lag profile (temporal sanity + discrete lag quantiles)
# --------------------------------------------------------------------------

#: quantiles reported over the lag distribution.
SHIP_LAG_QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
#: bucket width (days) for the two-level lag-rank prefix sum.
SHIP_LAG_BUCKET = 30


def ship_lag_profile(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Order-to-ship lag profile with a built-in temporal SANITY
    audit: the discrete p50/p90/p99 of (ship date - order date) in
    days, plus the count of line items that ship BEFORE their order
    exists — a physically impossible negative lag that flags clock
    skew, timezone bugs, or broken backfills (this fixture contains
    such rows; the audit is what surfaces them).

    The lag join is the natural co-keyed orders-lineitem equijoin
    (both sides project to two columns before the shuffle; bucketed
    layouts make it shuffle-free — see `bucketed_join`). Quantiles
    are the repo's exact DISCRETE form: ceil(q*n) thresholds as
    integer rationals over the two-level bucketed prefix sum of the
    (lag_days, count) table (checkpointed — within-sums, bucket
    totals, and grand totals are three lazy consumers), never a
    global sort of the joined rows. All integer days.
    """
    from pyspark.sql import Window

    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    lags = lineitem.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .cast("long")
        .alias("lag_d")
    )
    by_lag = _reliable_checkpoint(
        lags.groupBy("lag_d")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "bucket",
            F.expr(
                f"CAST(floor(lag_d / {SHIP_LAG_BUCKET}.0) AS BIGINT)"
            ),
        )
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("lag_d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = by_lag.withColumn("cw_in", F.sum("c").over(w_in))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_cum = (
        by_lag.groupBy("bucket")
        .agg(F.sum("c").alias("bc"))
        .select(
            "bucket",
            F.coalesce(F.sum("bc").over(w_b), F.lit(0)).alias("c_below"),
        )
    )
    totals = by_lag.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("lag_d") < 0, F.col("c")).otherwise(0)).alias(
            "n_negative"
        ),
    )
    qgrid = lineitem.sparkSession.createDataFrame(
        [(name, num, den) for name, num, den in SHIP_LAG_QUANTILES],
        "quantile string, num int, den int",
    )
    cum = (
        within.join(bucket_cum, "bucket")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(qgrid))
        .select(
            "quantile",
            "lag_d",
            (F.col("c_below") + F.col("cw_in")).alias("cw"),
            "n",
            "n_negative",
            F.expr("(n * num + den - 1) div den").alias("k"),
        )
    )
    picked = (
        cum.filter(F.col("cw") >= F.col("k"))
        .groupBy("quantile")
        .agg(
            F.min("lag_d").alias("lag"),
            F.max("n").alias("n"),
            F.max("n_negative").alias("neg"),
        )
    )
    q = lambda name: F.max(F.when(F.col("quantile") == name, F.col("lag")))
    return picked.agg(
        F.max("n").alias("n_items"),
        F.max("neg").alias("n_ship_before_order"),
        q("p50").alias("p50_days"),
        q("p90").alias("p90_days"),
        q("p99").alias("p99_days"),
    )


def ship_lag_profile_sql() -> str:
    qrows = ", ".join(
        f"('{name}', {num}, {den})" for name, num, den in SHIP_LAG_QUANTILES
    )
    return f"""
WITH lags AS (
  SELECT datediff('day', o_orderdate, l_shipdate) AS lag_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
by_lag AS (SELECT lag_d, COUNT(*) AS c FROM lags GROUP BY lag_d),
cum AS (
  SELECT lag_d,
         SUM(c) OVER (ORDER BY lag_d ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(c) OVER () AS n,
         SUM(CASE WHEN lag_d < 0 THEN c ELSE 0 END) OVER () AS n_negative
  FROM by_lag
),
qgrid(quantile, num, den) AS (VALUES {qrows}),
picked AS (
  SELECT quantile, MIN(lag_d) AS lag, MAX(n) AS n,
         MAX(n_negative) AS neg
  FROM cum CROSS JOIN qgrid
  WHERE cw >= (n * num + den - 1) // den
  GROUP BY quantile
)
SELECT CAST(MAX(n) AS BIGINT) AS n_items,
       CAST(MAX(neg) AS BIGINT) AS n_ship_before_order,
       CAST(MAX(CASE WHEN quantile = 'p50' THEN lag END) AS BIGINT)
         AS p50_days,
       CAST(MAX(CASE WHEN quantile = 'p90' THEN lag END) AS BIGINT)
         AS p90_days,
       CAST(MAX(CASE WHEN quantile = 'p99' THEN lag END) AS BIGINT)
         AS p99_days
FROM picked
"""
