"""Feature-engineering preparation operators.

The deterministic, SQL-expressible transforms a training pipeline
applies between raw tables and the model-input matrix: class
balancing weights, the hashing trick for high-cardinality
categoricals, and explicit one-hot encoding. All are pure
projections or tiny-key aggregations — nothing here shuffles a fact
table more than once, and nothing uses RNG state (the hashing trick
is md5-based, the same engine-portable gate as ``hash_split``).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def class_weights(orders: DataFrame, label_col: str = "o_orderstatus") -> DataFrame:
    """Inverse-frequency class weights — sklearn's
    ``class_weight='balanced'``: w_c = n_total / (n_classes * n_c).
    One tiny-key aggregation; the weight is a single double division
    chain over exact integer counts, so it is bit-identical in any
    engine and usable as a broadcast side against the training rows.
    """
    counts = orders.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("n_classes")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            (
                F.col("n_total").cast("double")
                / (F.col("n_classes").cast("double") * F.col("n").cast("double"))
            ).alias("weight"),
        )
        .orderBy("label")
    )


def class_weights_sql(label_col: str = "o_orderstatus") -> str:
    return f"""
WITH counts AS (
  SELECT {label_col} AS label, COUNT(*) AS n FROM orders GROUP BY {label_col}
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total, COUNT(*) AS n_classes FROM counts)
SELECT label, n,
       CAST(n_total AS DOUBLE) / (CAST(n_classes AS DOUBLE) * CAST(n AS DOUBLE))
         AS weight
FROM counts CROSS JOIN tot
ORDER BY label
"""


#: hashing-trick bucket count (power of two, as in practice).
HASH_BUCKETS = 64


def feature_hashing(
    orders: DataFrame, col: str = "o_custkey", buckets: int = HASH_BUCKETS
) -> DataFrame:
    """The hashing trick for a high-cardinality categorical: bucket =
    md5(value) mod ``buckets``, reported as the per-bucket collision
    profile (n_rows, n_distinct_values) — what you inspect before
    committing to a hashed feature width.

    md5 (not the engine-native hash/crc) so Spark and DuckDB agree
    bit-for-bit; the bucket id is a pure scan projection at feature
    time — the profile agg here is the diagnostic, not the hot path.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    return (
        orders.select(bucket.alias("bucket"), F.col(col).alias("v"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("v").alias("n_distinct_values"),
        )
        .orderBy("bucket")
    )


def feature_hashing_sql(col: str = "o_custkey", buckets: int = HASH_BUCKETS) -> str:
    return f"""
SELECT CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8) AS BIGINT) % {buckets}
         AS bucket,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT {col}) AS n_distinct_values
FROM orders
GROUP BY 1
ORDER BY 1
"""


#: explicit one-hot domain for o_orderpriority (TPC-H's closed set).
PRIORITY_DOMAIN = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def onehot_encode(orders: DataFrame) -> DataFrame:
    """Explicit one-hot encoding of a closed-domain categorical: one
    0/1 indicator column per known value — a pure CASE projection
    (zero exchanges, rides the scan), unlike StringIndexer+OneHotEncoder
    which needs a fitting pass. Unknown values encode as all-zeros,
    the standard handle-invalid='keep' behavior."""
    cols = [
        F.when(F.col("o_orderpriority") == v, 1)
        .otherwise(0)
        .alias(f"pri_{i + 1}")
        for i, v in enumerate(PRIORITY_DOMAIN)
    ]
    return orders.select("o_orderkey", *cols).orderBy("o_orderkey")


def onehot_encode_sql() -> str:
    cells = ", ".join(
        f"CASE WHEN o_orderpriority = '{v}' THEN 1 ELSE 0 END AS pri_{i + 1}"
        for i, v in enumerate(PRIORITY_DOMAIN)
    )
    return f"SELECT o_orderkey, {cells} FROM orders ORDER BY o_orderkey"


#: target-encoding smoothing pseudo-count (sklearn TargetEncoder's
#: `smooth` analog, fixed rather than CV-estimated for determinism).
TE_SMOOTHING = 10
#: the binary target: a "high-value" order.
TE_PRICE_THRESHOLD = 150_000.0


def target_encode(orders: DataFrame) -> DataFrame:
    """Smoothed mean target encoding for categorical features — the
    standard high-cardinality categorical -> numeric transform
    (category_encoders / sklearn TargetEncoder):

        enc(c) = (n_pos(c) + m * prior) / (n(c) + m)

    with the binary target "o_totalprice > 150000", m = 10, and the
    global prior shrinking rare categories toward the corpus mean.
    Both fixture features (o_orderpriority, o_orderstatus) are encoded
    in ONE pass by stacking them into (feature, category) rows before
    the aggregation.

    Determinism: n / n_pos are exact integer counts; prior and enc are
    double expressions assembled from those integers via the IDENTICAL
    expression tree in both engines — bit-reproducible at any
    partitioning. Shape: one fact-table scan, one tiny-key shuffle
    ((feature, category) cardinality ~ 10), prior as a 1-row
    broadcast; the encoder output is itself broadcast-sized for the
    train-time join-back.
    """
    pos = (
        (F.col("o_totalprice") > F.lit(TE_PRICE_THRESHOLD))
        .cast("int")
        .alias("is_pos")
    )
    stacked = orders.select(
        F.explode(
            F.create_map(
                F.lit("o_orderpriority"), F.col("o_orderpriority"),
                F.lit("o_orderstatus"), F.col("o_orderstatus"),
            )
        ).alias("feature", "category"),
        pos,
    )
    per_cat = stacked.groupBy("feature", "category").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_pos").alias("n_pos"),
    )
    tot = orders.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(pos).alias("n_pos_total"),
    )
    m = F.lit(float(TE_SMOOTHING))
    prior = F.col("n_pos_total").cast("double") / F.col("n_total").cast("double")
    return (
        per_cat.crossJoin(F.broadcast(tot))
        .select(
            "feature",
            "category",
            "n",
            "n_pos",
            (
                (F.col("n_pos").cast("double") + m * prior)
                / (F.col("n").cast("double") + m)
            ).alias("enc"),
        )
        .orderBy("feature", "category")
    )


def target_encode_sql() -> str:
    return f"""
WITH stacked AS (
  SELECT f.feature,
         CASE f.feature WHEN 'o_orderpriority' THEN o_orderpriority
                        ELSE o_orderstatus END AS category,
         CASE WHEN o_totalprice > {TE_PRICE_THRESHOLD} THEN 1 ELSE 0 END AS is_pos
  FROM orders
  CROSS JOIN (SELECT UNNEST(['o_orderpriority', 'o_orderstatus']) AS feature) f
),
per_cat AS (
  SELECT feature, category, COUNT(*) AS n,
         CAST(SUM(is_pos) AS BIGINT) AS n_pos
  FROM stacked GROUP BY feature, category
),
tot AS (
  SELECT COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN o_totalprice > {TE_PRICE_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos_total
  FROM orders
)
SELECT feature, category, n, n_pos,
       (CAST(n_pos AS DOUBLE)
        + {float(TE_SMOOTHING)} * (CAST(n_pos_total AS DOUBLE) / CAST(n_total AS DOUBLE)))
       / (CAST(n AS DOUBLE) + {float(TE_SMOOTHING)}) AS enc
FROM per_cat CROSS JOIN tot
ORDER BY feature, category
"""


#: equal-frequency bin count for quantile_bins.
QB_BINS = 10

#: session-lifetime cache for the shared price-decile edge vector
#: (quantile_bins + decile_lift build the IDENTICAL 9x percentile_disc
#: aggregation; within one session the family pays it once).
_PRICE_EDGES_CACHE: dict = {}


#: bucket width (price units) for the distributed decile-edge prefix
#: sum — prices are range-bounded, so the bucket table is constant-size
#: at any corpus scale.
_PRICE_EDGE_BUCKET = 4096.0


def _price_decile_edges(orders: DataFrame, n_bins: int) -> DataFrame:
    """The (n_bins - 1)-column discrete decile edge vector over
    o_totalprice, materialized once per (session, input plan) via
    ``plan_keyed_cache`` — a 1-row localCheckpoint, so the second
    family member's build costs zero jobs (the temp-view contract;
    see operators/scale.py::plan_keyed_cache / clear_caches).

    Round-19 rewrite: the previous 9x ``percentile_disc`` aggregation
    buffered the ENTIRE value column once per percentile inside a
    single aggregation buffer — the unscalable collect-the-column
    shape, and 3.4 s of eager build at bench scale. Replaced by the
    repo's two-level bucketed prefix sum (the ``weighted_median`` /
    ``roc_auc`` convention): per-distinct-value counts group once
    (map-side combinable), cume_dist = cum/n in doubles, and ONE
    aggregation takes ``min(value WHERE cd >= q)`` for all edges
    together. This replicates Spark's percentile_disc rule exactly —
    the ANSI "smallest value with cume_dist >= p" double compare, NOT
    ceil(p*n) (probed: p=0.3 over 1..10 returns 3, where the
    double-ceil rule would give 4) — and was differential-tested
    bit-identical against percentile_disc on 18 adversarial
    distributions x 13 quantiles (dups, all-equal, price-like,
    n=1..10k). 0.39x on quantile_bins end-to-end, paired A/B with the
    edge cache cleared per arm (what a fresh bench session pays)."""
    from soccerpredictor_spark.operators.scale import plan_keyed_cache

    def build() -> DataFrame:
        qs = [i / n_bins for i in range(1, n_bins)]
        vals = orders.groupBy(F.col("o_totalprice").alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        ).withColumn(
            "bucket", F.floor(F.col("v") / F.lit(_PRICE_EDGE_BUCKET)).cast("long")
        )
        w_in = (
            Window.partitionBy("bucket")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        within = vals.withColumn("w_in", F.sum("c").over(w_in))
        # bucket-offset window is unpartitioned but runs over the
        # BUCKET table (price-range/width rows — constant in corpus
        # size), the same tiny-table concession weighted_median makes.
        w_b = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        bucket_cum = (
            vals.groupBy("bucket")
            .agg(F.sum("c").alias("bw"))
            .select(
                "bucket",
                F.coalesce(F.sum("bw").over(w_b), F.lit(0)).alias("w_below"),
            )
        )
        n = orders.agg(F.count(F.lit(1)).alias("n_all"))
        # r20 (ADVICE): the boundary test cume_dist >= q is done in
        # EXACT integer arithmetic — deciles are rational i/n_bins, so
        # "cum/n >= i/n_bins" is "cum * n_bins >= i * n_all" on longs
        # (no overflow: cum, n_all < 2^63/n_bins at any corpus scale).
        # The previous double division could round opposite ways at
        # exact-boundary (cum, n) pairs; verified bit-identical edges
        # on sf0.001/0.01/0.1 and the r19 adversarial distributions.
        cum = (
            within.join(bucket_cum, "bucket")
            .crossJoin(F.broadcast(n))
            .select(
                "v",
                (F.col("w_below") + F.col("w_in")).alias("cum"),
                "n_all",
            )
        )
        edges = cum.agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") * F.lit(n_bins)
                        >= F.lit(i) * F.col("n_all"),
                        F.col("v"),
                    )
                ).alias(f"e{i}")
                for i, q in enumerate(qs, start=1)
            ]
        )
        return edges.localCheckpoint(eager=True)

    return plan_keyed_cache(_PRICE_EDGES_CACHE, orders, ("price_edges", n_bins), build)



def quantile_bins(orders: DataFrame) -> DataFrame:
    """Equal-frequency (quantile) discretization of a numeric feature
    — sklearn KBinsDiscretizer(strategy='quantile'): o_totalprice cut
    at its own deciles into 10 bins.

    Determinism & scale: edges are percentile_disc SELECTIONS (actual
    data values, no interpolation) from ONE global aggregation; the
    1-row edge vector broadcasts onto the row stream and each row's
    bin is a pure comparison count (value > edge_i), ties landing in
    the lower bin in both engines. No global sort, no ntile window —
    the naive single-partition ranking shape is exactly what this
    operator avoids at 100 TB.
    """
    edges = _price_decile_edges(orders, QB_BINS)
    bin_expr = reduce(
        lambda acc, i: acc
        + F.when(F.col("o_totalprice") > F.col(f"e{i}"), 1).otherwise(0),
        range(2, QB_BINS),
        F.lit(1)
        + F.when(F.col("o_totalprice") > F.col("e1"), 1).otherwise(0),
    )
    return (
        orders.select("o_orderkey", "o_totalprice")
        .crossJoin(F.broadcast(edges))
        .select(
            "o_orderkey",
            "o_totalprice",
            bin_expr.cast("int").alias("bin"),
        )
        .orderBy("o_orderkey")
    )


def quantile_bins_sql() -> str:
    qs = [i / QB_BINS for i in range(1, QB_BINS)]
    edge_cols = ", ".join(
        f"quantile_disc(o_totalprice, {q}) AS e{i}"
        for i, q in enumerate(qs, start=1)
    )
    bin_sum = " + ".join(
        f"CASE WHEN o_totalprice > e{i} THEN 1 ELSE 0 END"
        for i in range(1, QB_BINS)
    )
    return f"""
WITH edges AS (SELECT {edge_cols} FROM orders)
SELECT o_orderkey, o_totalprice,
       CAST(1 + {bin_sum} AS INTEGER) AS bin
FROM orders CROSS JOIN edges
ORDER BY o_orderkey
"""


def chi2_association(orders: DataFrame) -> DataFrame:
    """Chi-square contingency cells for two categorical features
    (o_orderpriority x o_orderstatus) — the categorical-association
    screen (sklearn chi2 / scipy chi2_contingency) run before feature
    selection.

    Per cell: observed count, expected count E = row_tot * col_tot / n,
    and the chi-square contribution (obs - E)^2 / E. Counts are exact
    integers from ONE tiny-key aggregation; marginals attach via two
    broadcast-sized joins; expected/contrib are per-row double
    expressions assembled from those integers via identical trees in
    both engines — no cross-cell double summation (which would be
    partition-order-dependent), so every output value is
    bit-reproducible. The full chi2 is one strict left fold over the
    (ordered) cells for any consumer that wants the scalar.
    """
    cells = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    row_tot = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("r_tot")
    )
    col_tot = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("c_tot")
    )
    n = orders.agg(F.count(F.lit(1)).alias("n_all"))
    exp = (
        F.col("r_tot").cast("double")
        * F.col("c_tot").cast("double")
        / F.col("n_all").cast("double")
    )
    contrib = (F.col("n_obs").cast("double") - exp) * (
        F.col("n_obs").cast("double") - exp
    ) / exp
    return (
        cells.join(F.broadcast(row_tot), "o_orderpriority")
        .join(F.broadcast(col_tot), "o_orderstatus")
        .crossJoin(F.broadcast(n))
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "n_obs",
            exp.alias("n_exp"),
            contrib.alias("chi2_contrib"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


def chi2_association_sql() -> str:
    return """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_obs
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
rt AS (SELECT o_orderpriority, COUNT(*) AS r_tot FROM orders GROUP BY 1),
ct AS (SELECT o_orderstatus, COUNT(*) AS c_tot FROM orders GROUP BY 1),
n AS (SELECT COUNT(*) AS n_all FROM orders)
SELECT cells.o_orderpriority, cells.o_orderstatus, n_obs,
       CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_all AS DOUBLE)
         AS n_exp,
       (CAST(n_obs AS DOUBLE)
        - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_all AS DOUBLE))
       * (CAST(n_obs AS DOUBLE)
          - CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_all AS DOUBLE))
       / (CAST(r_tot AS DOUBLE) * CAST(c_tot AS DOUBLE) / CAST(n_all AS DOUBLE))
         AS chi2_contrib
FROM cells JOIN rt USING (o_orderpriority)
           JOIN ct USING (o_orderstatus)
           CROSS JOIN n
ORDER BY o_orderpriority, o_orderstatus
"""


# --------------------------------------------------------------------------
# k-fold assignment / decile lift
# --------------------------------------------------------------------------

#: folds for cross-validation assignment.
KFOLD_K = 5
#: deciles for the lift table.
LIFT_BINS = 10


def kfold_assign(orders: DataFrame) -> DataFrame:
    """Deterministic k-fold cross-validation assignment with a
    per-fold label-balance audit: fold = md5(key) mod K (the same
    engine-portable gate as ``hash_split`` — stable under
    repartitioning and reruns, joinable from any derived table), then
    (fold, label) counts so a skewed fold is visible before training.

    Pure scan projection + one tiny-key aggregation; zero RNG state.
    """
    fold = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % KFOLD_K
    )
    return (
        orders.select(
            fold.alias("fold"), F.col("o_orderstatus").alias("label")
        )
        .groupBy("fold", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def kfold_assign_sql() -> str:
    return f"""
SELECT CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
            AS BIGINT) % {KFOLD_K} AS fold,
       o_orderstatus AS label, COUNT(*) AS n
FROM orders GROUP BY 1, 2
"""


def decile_lift(orders: DataFrame) -> DataFrame:
    """Decile lift/gains table — the model-evaluation standard: bin
    rows by score decile (here o_totalprice as the stand-in model
    score, decile 1 = highest scores) and report each bin's response
    rate and cumulative lift over the base rate for label
    o_orderstatus = 'F'.

    Deciles are VALUE-based (percentile_disc edges from one global
    aggregation, broadcast onto the row stream — the
    ``quantile_bins`` shape), not NTILE: an ntile window is a global
    single-partition sort, the one plan that cannot scale to 100 TB.
    Ties share a bin in both engines (counts may be slightly uneven —
    the standard trade of value-based gains tables). Counts stay
    exact integers through the cumulative window (10 rows); lift =
    (cum_pos * n_total) / (cum_n * pos_total) is one double
    expression.
    """
    edges = _price_decile_edges(orders, LIFT_BINS)
    asc_bin = reduce(
        lambda acc, i: acc
        + F.when(F.col("o_totalprice") > F.col(f"e{i}"), 1).otherwise(0),
        range(2, LIFT_BINS),
        F.lit(1)
        + F.when(F.col("o_totalprice") > F.col("e1"), 1).otherwise(0),
    )
    binned = orders.select(
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "F", F.lit(1))
        .otherwise(F.lit(0))
        .alias("pos"),
    ).crossJoin(F.broadcast(edges)).select(
        (F.lit(LIFT_BINS + 1) - asc_bin).cast("int").alias("decile"),
        "pos",
    )
    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("n_pos")
    )
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = per.agg(
        F.sum("n").alias("n_total"), F.sum("n_pos").alias("pos_total")
    )
    return (
        per.select(
            "decile",
            "n",
            "n_pos",
            F.sum("n").over(cum).alias("cum_n"),
            F.sum("n_pos").over(cum).alias("cum_pos"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_n",
            "cum_pos",
            (
                F.col("n_pos").cast("double") / F.col("n").cast("double")
            ).alias("response_rate"),
            F.when(
                F.col("pos_total") > 0,
                (F.col("cum_pos") * F.col("n_total")).cast("double")
                / (F.col("cum_n") * F.col("pos_total")).cast("double"),
            ).alias("cum_lift"),
        )
    )


def decile_lift_sql() -> str:
    qs = [i / LIFT_BINS for i in range(1, LIFT_BINS)]
    edge_cols = ", ".join(
        f"quantile_disc(o_totalprice, {q}) AS e{i}"
        for i, q in enumerate(qs, start=1)
    )
    bin_sum = " + ".join(
        f"CASE WHEN o_totalprice > e{i} THEN 1 ELSE 0 END"
        for i in range(1, LIFT_BINS)
    )
    return f"""
WITH edges AS (SELECT {edge_cols} FROM orders),
binned AS (
  SELECT CAST({LIFT_BINS + 1} - (1 + {bin_sum}) AS INTEGER) AS decile,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
  FROM orders CROSS JOIN edges
),
per AS (SELECT decile, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
        FROM binned GROUP BY decile),
cumed AS (
  SELECT decile, n, n_pos,
         CAST(SUM(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_n,
         CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_pos
  FROM per
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
               CAST(SUM(n_pos) AS BIGINT) AS pos_total FROM per)
SELECT decile, n, n_pos, cum_n, cum_pos,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS response_rate,
       CASE WHEN pos_total > 0 THEN
         CAST(cum_pos * n_total AS DOUBLE) / CAST(cum_n * pos_total AS DOUBLE)
       END AS cum_lift
FROM cumed CROSS JOIN tot
"""


#: winsorization clamp quantiles.
WINSOR_LO = 0.05
WINSOR_HI = 0.95


def winsorize(orders: DataFrame) -> DataFrame:
    """Per-group winsorization: clamp o_totalprice to its group's
    [p05, p95] (percentile_disc SELECTIONS — actual data values, the
    cross-engine-exact convention of ``quantile_bins``), grouped by
    o_orderpriority — the outlier-taming step before scale-sensitive
    models, complementing ``robust_scale`` (which rescales) by
    CLIPPING instead.

    One tiny per-group percentile aggregation broadcast back onto the
    row stream; the clamp is a pure projection. The fact table
    shuffles zero times.
    """
    stats = orders.groupBy("o_orderpriority").agg(
        F.expr(
            f"percentile_disc({WINSOR_LO}) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("lo"),
        F.expr(
            f"percentile_disc({WINSOR_HI}) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("hi"),
    )
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .join(F.broadcast(stats), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
            .alias("clipped"),
            (F.col("o_totalprice") < F.col("lo")).alias("clipped_lo"),
            (F.col("o_totalprice") > F.col("hi")).alias("clipped_hi"),
        )
    )


def winsorize_sql() -> str:
    return f"""
WITH stats AS (
  SELECT o_orderpriority,
         quantile_disc(o_totalprice, {WINSOR_LO}) AS lo,
         quantile_disc(o_totalprice, {WINSOR_HI}) AS hi
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o_orderpriority, o_totalprice,
       least(greatest(o_totalprice, lo), hi) AS clipped,
       o_totalprice < lo AS clipped_lo,
       o_totalprice > hi AS clipped_hi
FROM orders JOIN stats USING (o_orderpriority)
"""


# --------------------------------------------------------------------------
# exact ROC-AUC via distributed rank statistics
# --------------------------------------------------------------------------

#: score-range bucket width (cents) for the two-level prefix sum.
AUC_BUCKET_CENTS = 10_000_000


def roc_auc(orders: DataFrame, bucket_cents: int = AUC_BUCKET_CENTS) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label, computed as
    the normalized Mann-Whitney U statistic with the standard 1/2
    credit for score ties:

        AUC = [ #(pos > neg pairs) + #(tied pairs)/2 ] / (P * N)

    Label = order is urgent; score = total price in exact int64 cents
    (the repo cent-quantization convention). All counting is integer:
    ``u2`` is TWICE the tie-adjusted U (so ties add whole units).
    u2 is bounded by 2*P*N — beyond int64 near ~4e9 balanced rows —
    so it accumulates as DECIMAL(38,0) (the feature_corr convention;
    Spark partial aggregation and DuckDB's HUGEINT sum are both exact)
    and surfaces as a double, lossless below 2^53 and identical in
    both engines since each casts the same exact integer. The AUC is
    one final double division of exactly-cast operands.

    Scale (the load-bearing choice): a naive rank-based AUC needs one
    GLOBAL sort window — a single reducer at 100 TB. Instead the
    cumulative negative count below each score is assembled as a
    two-level prefix sum: scores collapse to one row per distinct
    value, windows run PARTITIONED by a score-range bucket (parallel,
    each bounded by the bucket's distinct-score count), and only the
    per-bucket totals — one row per bucket — pass through the tiny
    global window. This is the textbook distributed prefix-sum; no
    stage is single-partition over row-scale data.

    Generalizes the reference's holdout accuracy score
    (``XGBoost/Predictor.py:112-113``) to the ranking metric used for
    imbalanced labels.
    """
    by_score = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("score"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
        .groupBy("score")
        .agg(
            F.sum("label").alias("p"),
            F.sum(1 - F.col("label")).alias("q"),
        )
        .withColumn("bucket", F.expr(f"score div {bucket_cents}"))
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = by_score.withColumn(
        "cum_q_in", F.coalesce(F.sum("q").over(w_in), F.lit(0))
    )
    bucket_tot = by_score.groupBy("bucket").agg(F.sum("q").alias("bq"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_cum = bucket_tot.select(
        "bucket", F.coalesce(F.sum("bq").over(w_b), F.lit(0)).alias("cum_q_buckets")
    )
    joined = within.join(F.broadcast(bucket_cum), "bucket")
    total = joined.agg(
        F.sum("p").alias("n_pos"),
        F.sum("q").alias("n_neg"),
        # cast BOTH factors to decimal(38,0) BEFORE the product: the
        # int64 product p * (2*cum_q + q) would overflow at ~2*P*N
        # (≈4e9 balanced rows), exactly the scale the decimal
        # accumulator exists for (round-7 advice).
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (
                2 * (F.col("cum_q_buckets") + F.col("cum_q_in")) + F.col("q")
            ).cast("decimal(38,0)")
        ).alias("u2d"),
    )
    return total.select(
        "n_pos",
        "n_neg",
        F.col("u2d").cast("double").alias("u2"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("u2d").cast("double")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
        ).alias("auc"),
    )


def roc_auc_sql() -> str:
    return f"""
WITH by_score AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS score,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END)
              AS BIGINT) AS q
  FROM orders GROUP BY 1
),
bucketed AS (
  SELECT *, score // {AUC_BUCKET_CENTS} AS bucket FROM by_score
),
within AS (
  SELECT *, COALESCE(CAST(SUM(q) OVER (PARTITION BY bucket ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS cum_q_in
  FROM bucketed
),
bucket_cum AS (
  SELECT bucket,
         COALESCE(CAST(SUM(bq) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS cum_q_buckets
  FROM (SELECT bucket, CAST(SUM(q) AS BIGINT) AS bq FROM bucketed GROUP BY bucket)
),
total AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(q) AS BIGINT) AS n_neg,
         SUM(CAST(p AS HUGEINT)
             * CAST(2 * (b.cum_q_buckets + w.cum_q_in) + q AS HUGEINT)) AS u2h
  FROM within w JOIN bucket_cum b USING (bucket)
)
SELECT n_pos, n_neg, CAST(CAST(u2h AS VARCHAR) AS DOUBLE) AS u2,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST(CAST(u2h AS VARCHAR) AS DOUBLE)
                 / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       END AS auc
FROM total
"""


# --------------------------------------------------------------------------
# staged round-8 additions: uncertainty / evaluation / experiment operators
# --------------------------------------------------------------------------

#: replicates for the deterministic hash-subsample bootstrap.
CI_REPLICATES = 32
#: two-sided 95% interval bounds over the replicate means.
CI_LO_Q, CI_HI_Q = 0.025, 0.975


def _md5_mod(prefix: str, key_col, m: int):
    """md5('<prefix>' || key) first 8 hex digits -> int64 mod m — the
    repo-wide engine-portable deterministic gate (see
    ``feature_hashing`` / ``sketch._hash_mod``)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(prefix), key_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % m
    )


def _sql_md5_mod(prefix: str, key_expr: str, m: int) -> str:
    return (
        f"CAST('0x' || substr(md5('{prefix}' || CAST({key_expr} AS VARCHAR)),"
        f" 1, 8) AS BIGINT) % {m}"
    )


def subsample_ci(orders: DataFrame) -> DataFrame:
    """Deterministic subsample-bootstrap confidence interval for the
    mean of ``o_totalprice`` — the uncertainty quantification a
    pipeline attaches to every aggregate it reports (Politis/Romano
    subsampling; the hash-gated replicate trick makes it exact-
    reproducible on any engine, no RNG state).

    Replicate k is the expected-50% Bernoulli subsample selected by
    BIT k of md5('ci' || orderkey) — ONE md5 per row gates all 32
    replicates (an md5-per-(rep,row) gate costs 32x the hash work,
    the dominant CPU at 100 TB; the 32 low bits of one md5 are
    independent Bernoullis). The replicate means' 2.5%/97.5%
    percentile_disc SELECTIONS (actual double values, no
    interpolation arithmetic) form the interval.

    Scale: the rep fan-out is a broadcast nested-loop over a 33-row
    index table (32 subsamples + the rep=-1 point-estimate
    pseudo-replicate) feeding a map-side-combinable aggregation — the
    shuffle carries 33 partial rows per partition regardless of input
    size (the ``sketch.heavy_hitters_cms`` shape); nothing ever
    materializes 32x the fact table across an exchange. Sums
    accumulate as decimal(38,0) cents (int64-safe per-term, overflow-
    safe at 100 TB).
    """
    # rep -1 is the point-estimate pseudo-replicate (keeps every row),
    # so the point mean rides the SAME scan + fan-out + aggregation as
    # the 32 subsamples: ONE pass over the fact table total, where the
    # obvious three-branch plan (members / point / ci) scans it three
    # times (verified in the physical plan).
    spark_reps = orders.sparkSession.range(-1, CI_REPLICATES).select(
        F.col("id").alias("rep")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bits = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ci"), F.col("k").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    member = (
        orders.select(
            F.col("o_orderkey").alias("k"), cents.alias("cents")
        )
        .select("cents", bits.alias("bits"))
        .crossJoin(F.broadcast(spark_reps))
        .filter(
            # greatest(rep, 0): vectorized engines evaluate BOTH OR
            # branches, and a shift by -1 is engine-defined garbage
            (F.col("rep") == -1)
            | (
                F.expr("shiftright(bits, greatest(CAST(rep AS INT), 0))") % 2
                == 1
            )
        )
    )
    per = (
        member.groupBy("rep")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sum_cents"),
        )
        .select(
            "rep",
            "n_rows",
            (
                F.col("sum_cents").cast("double")
                / F.col("n_rows").cast("double")
                / F.lit(100.0)
            ).alias("rep_mean"),
        )
    )
    # The summary (interval + point estimate) rides ONE global window
    # over the 33-row per table instead of a second aggregation branch
    # (a branch re-instantiates the scan+fan-out subtree: two full
    # scans, verified in the physical plan).
    # With n <= 39 replicates, percentile_disc(0.025)/(0.975) SELECT
    # the min/max replicate mean (ceil(0.025*n) = 1, ceil(0.975*n)
    # = n), so min/max over the window IS the disc selection — the
    # DuckDB twin keeps the quantile_disc spelling; the guard pins the
    # equivalence if CI_REPLICATES is ever raised.
    if CI_REPLICATES > 39:  # pragma: no cover - static config guard
        raise ValueError(
            "subsample_ci's windowed min/max equals percentile_disc"
            f" ({CI_LO_Q}/{CI_HI_Q}) only for <= 39 replicates;"
            " restore the percentile_disc aggregation branch"
        )
    w = Window.partitionBy()
    rep_only = F.when(F.col("rep") >= 0, F.col("rep_mean"))
    return (
        per.select(
            "rep",
            "n_rows",
            "rep_mean",
            F.min(rep_only).over(w).alias("ci_lo"),
            F.max(rep_only).over(w).alias("ci_hi"),
            F.max(F.when(F.col("rep") == -1, F.col("rep_mean")))
            .over(w)
            .alias("point_mean"),
            F.max(F.when(F.col("rep") == -1, F.col("n_rows")))
            .over(w)
            .alias("n_total"),
        )
        .filter(F.col("rep") >= 0)
        .orderBy("rep")
    )


def subsample_ci_sql() -> str:
    return f"""
WITH reps AS (SELECT unnest(range(-1, {CI_REPLICATES})) AS rep),
rows_h AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST('0x' || substr(md5('ci' || CAST(o_orderkey AS VARCHAR)), 1, 8)
              AS BIGINT) AS bits
  FROM orders
),
member AS (
  SELECT rep, cents
  FROM rows_h CROSS JOIN reps
  WHERE rep = -1 OR (bits >> GREATEST(rep, 0)) % 2 = 1
),
per AS (
  SELECT rep, COUNT(*) AS n_rows,
         CAST(CAST(SUM(CAST(cents AS HUGEINT)) AS VARCHAR) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 100.0 AS rep_mean
  FROM member GROUP BY rep
),
win AS (
  SELECT rep, n_rows, rep_mean,
         quantile_disc(rep_mean, {CI_LO_Q})
           FILTER (WHERE rep >= 0) OVER () AS ci_lo,
         quantile_disc(rep_mean, {CI_HI_Q})
           FILTER (WHERE rep >= 0) OVER () AS ci_hi,
         MAX(CASE WHEN rep = -1 THEN rep_mean END) OVER () AS point_mean,
         MAX(CASE WHEN rep = -1 THEN n_rows END) OVER () AS n_total
  FROM per
)
SELECT rep, n_rows, rep_mean, ci_lo, ci_hi, point_mean, n_total
FROM win WHERE rep >= 0 ORDER BY rep
"""


# --------------------------------------------------------------------------
# grouped OLS: per-group closed-form linear trend
# --------------------------------------------------------------------------

#: epoch anchor for the OLS regressor (days since this date).
OLS_ANCHOR = "1992-01-01"


def grouped_ols(orders: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Per-nation ordinary-least-squares price trend: regress order
    price (dollars) on order date (days since 1992-01-01), closed
    form — the per-segment trend fit a feature pipeline runs to
    detect drift before training (generalizes the reference's
    season-long team form features, ``XGBoost/Predictor.py:60-96``).

    Determinism & scale: the five sufficient statistics (n, Σx, Σy,
    Σxy, Σx², Σy²) are exact integer sums — x is an int day offset, y
    int cents; per-term products fit int64, the sums accumulate as
    decimal(38,0) (the ``feature_corr`` convention) — and slope =
    (nΣxy - ΣxΣy)/(nΣx² - (Σx)²), intercept = (ΣyΣx² - ΣxΣxy)/same
    are assembled as ONE double division each from those exact sums.
    One map-side-combinable aggregation after two broadcast dimension
    joins; nothing shuffles the fact table twice. Zero-variance
    groups (a single order date) yield NULL in both engines.
    """
    d38 = "decimal(38,0)"
    x = F.datediff(F.col("o_orderdate").cast("date"), F.lit(OLS_ANCHOR).cast("date")).cast(
        "long"
    )
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    joined = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name"), x.alias("x"), y.alias("y"))
    )
    agg = joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).alias("sxy"),
    )
    nn = F.col("n_rows").cast(d38)
    den = nn * F.col("sxx") - F.col("sx") * F.col("sx")
    num_slope = nn * F.col("sxy") - F.col("sx") * F.col("sy")
    num_icept = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    vy = nn * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(
        den > 0, num_slope.cast("double") / den.cast("double") / F.lit(100.0)
    )
    icept = F.when(
        den > 0, num_icept.cast("double") / den.cast("double") / F.lit(100.0)
    )
    r2 = F.when(
        (den > 0) & (vy > 0),
        (num_slope.cast("double") * num_slope.cast("double"))
        / (den.cast("double") * vy.cast("double")),
    )
    return agg.select(
        "n_name",
        "n_rows",
        slope.alias("slope_per_day"),
        icept.alias("intercept"),
        r2.alias("r2"),
    ).orderBy("n_name")


def grouped_ols_sql() -> str:
    # NB every HUGEINT -> DOUBLE conversion goes through VARCHAR:
    # DuckDB's direct hugeint cast is two roundings ((double)upper *
    # 2^64 + (double)lower) and is off by one ulp for some values
    # beyond 2^53 (found empirically: NATION_3's vy at sf0.01), while
    # its string parse — like Spark's Decimal.toDouble — is correctly
    # rounded, so both engines agree bit-for-bit.
    return f"""
WITH pts AS (
  SELECT n_name,
         CAST(date_diff('day', DATE '{OLS_ANCHOR}',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
),
s AS (
  SELECT n_name, COUNT(*) AS n_rows,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
  FROM pts GROUP BY n_name
)
SELECT n_name, n_rows,
       CASE WHEN n_rows * sxx - sx * sx > 0 THEN
         CAST(CAST(n_rows * sxy - sx * sy AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n_rows * sxx - sx * sx AS VARCHAR) AS DOUBLE) / 100.0
       END AS slope_per_day,
       CASE WHEN n_rows * sxx - sx * sx > 0 THEN
         CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE)
           / CAST(CAST(n_rows * sxx - sx * sx AS VARCHAR) AS DOUBLE) / 100.0
       END AS intercept,
       CASE WHEN n_rows * sxx - sx * sx > 0
             AND n_rows * syy - sy * sy > 0 THEN
         (CAST(CAST(n_rows * sxy - sx * sy AS VARCHAR) AS DOUBLE)
          * CAST(CAST(n_rows * sxy - sx * sy AS VARCHAR) AS DOUBLE))
           / (CAST(CAST(n_rows * sxx - sx * sx AS VARCHAR) AS DOUBLE)
              * CAST(CAST(n_rows * syy - sy * sy AS VARCHAR) AS DOUBLE))
       END AS r2
FROM s ORDER BY n_name
"""


# --------------------------------------------------------------------------
# NDCG@K ranking-quality metric
# --------------------------------------------------------------------------

#: NDCG truncation depth.
NDCG_K = 10


def _ndcg_discounts() -> list[str]:
    """The 1/log2(pos+1) discount ladder for positions 1..K, frozen to
    12 decimal places as STRING literals at code level. Both engines
    parse the identical decimal literal, so the per-position discount
    is the identical DECIMAL(18,12) — no runtime log2(), whose last
    ulp differs between JVM Math and libm and would break the value
    hash."""
    import math
    from decimal import Decimal, ROUND_HALF_EVEN

    out = []
    for pos in range(1, NDCG_K + 1):
        d = Decimal(1.0 / math.log2(pos + 1)).quantize(
            Decimal("0.000000000001"), rounding=ROUND_HALF_EVEN
        )
        out.append(str(d))
    return out


def _ndcg_prefixes(discs: list[str]) -> list[str]:
    """Exact prefix sums of the frozen discounts (ideal-DCG ladder)."""
    from decimal import Decimal

    acc, out = Decimal(0), []
    for d in discs:
        acc += Decimal(d)
        out.append(str(acc))
    return out


def ndcg_at_k(orders: DataFrame) -> DataFrame:
    """Per-customer NDCG@10 treating each customer's orders as a
    ranked retrieval list: score = o_totalprice (rank by it, desc),
    relevance = 1 if o_orderstatus = 'F'. The ranking-quality metric
    (Jarvelin & Kekalainen 2002) every search/recsys training
    pipeline reports.

    Determinism: discounts are frozen decimal literals (see
    ``_ndcg_discounts``), DCG = Σ rel·disc is an EXACT decimal sum,
    ideal DCG is a literal prefix-sum ladder indexed by
    min(n_pos, K) — so ndcg is one double division of two exactly-
    computed decimals. Scale: rank is a per-customer window (bounded
    partitions), the discount join is a broadcast of K rows, and both
    aggregations are keyed by customer — one shuffle each.
    """
    discs = _ndcg_discounts()
    prefixes = _ndcg_prefixes(discs)
    spark = orders.sparkSession
    disc_arr = "array(" + ", ".join(
        f"CAST({d} AS DECIMAL(18,12))" for d in discs
    ) + ")"
    disc_df = spark.range(1).select(
        F.posexplode(F.expr(disc_arr)).alias("pos0", "disc")
    ).select((F.col("pos0") + 1).alias("pos"), "disc")
    prefix_arr = "array(" + ", ".join(
        f"CAST({p} AS DECIMAL(18,12))" for p in prefixes
    ) + ")"

    rel = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ranked = orders.select(
        "o_custkey", "o_totalprice", "o_orderkey", rel.alias("rel")
    ).withColumn("pos", F.row_number().over(w))
    topk = ranked.filter(F.col("pos") <= NDCG_K)
    dcg = (
        topk.join(F.broadcast(disc_df), "pos")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("rel") == 1, F.col("disc")).otherwise(
                    F.expr("CAST(0 AS DECIMAL(18,12))")
                )
            ).alias("dcg_dec")
        )
    )
    per_cust = ranked.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("rel").alias("n_pos")
    )
    ideal_r = F.least(F.col("n_pos"), F.lit(NDCG_K)).cast("int")
    idcg = F.when(
        ideal_r >= 1, F.element_at(F.expr(prefix_arr), ideal_r)
    )
    joined = per_cust.join(dcg, "o_custkey", "left").select(
        "o_custkey",
        "n_orders",
        "n_pos",
        F.col("dcg_dec").cast("double").alias("dcg"),
        idcg.cast("double").alias("idcg"),
        F.when(
            ideal_r >= 1,
            F.col("dcg_dec").cast("double") / idcg.cast("double"),
        ).alias("ndcg"),
    )
    return joined.orderBy("o_custkey")


def ndcg_at_k_sql() -> str:
    discs = _ndcg_discounts()
    prefixes = _ndcg_prefixes(discs)
    disc_rows = ", ".join(
        f"({i + 1}, CAST({d} AS DECIMAL(18,12)))" for i, d in enumerate(discs)
    )
    prefix_list = "[" + ", ".join(
        f"CAST({p} AS DECIMAL(18,12))" for p in prefixes
    ) + "]"
    return f"""
WITH disc(pos, disc) AS (VALUES {disc_rows}),
ranked AS (
  SELECT o_custkey, o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS pos
  FROM orders
),
dcg AS (
  SELECT o_custkey,
         SUM(CASE WHEN rel = 1 THEN disc
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS dcg_dec
  FROM ranked JOIN disc USING (pos)
  WHERE pos <= {NDCG_K}
  GROUP BY o_custkey
),
per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders, CAST(SUM(rel) AS BIGINT) AS n_pos
  FROM ranked GROUP BY o_custkey
)
SELECT p.o_custkey, p.n_orders, p.n_pos,
       CAST(d.dcg_dec AS DOUBLE) AS dcg,
       CASE WHEN LEAST(p.n_pos, {NDCG_K}) >= 1 THEN
         CAST({prefix_list}[CAST(LEAST(p.n_pos, {NDCG_K}) AS INTEGER)] AS DOUBLE)
       END AS idcg,
       CASE WHEN LEAST(p.n_pos, {NDCG_K}) >= 1 THEN
         CAST(d.dcg_dec AS DOUBLE)
           / CAST({prefix_list}[CAST(LEAST(p.n_pos, {NDCG_K}) AS INTEGER)] AS DOUBLE)
       END AS ndcg
FROM per_cust p LEFT JOIN dcg d USING (o_custkey)
ORDER BY p.o_custkey
"""


# --------------------------------------------------------------------------
# split-conformal prediction interval + coverage audit
# --------------------------------------------------------------------------

#: conformal miscoverage rate (interval targets 1 - alpha coverage).
CONFORMAL_ALPHA = 0.1


def conformal_interval(orders: DataFrame) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al.; Lei et al.
    2018) around a per-priority mean-price predictor, with the
    held-out coverage audit a production ML pipeline runs before
    trusting the interval.

    Deterministic md5 split of orders: h%4 in {0,1} trains the
    predictor (per-priority mean), h%4 = 2 calibrates (qhat = the
    (1-alpha) percentile_disc SELECTION of absolute residuals),
    h%4 = 3 audits coverage. Residuals are doubles built from the identical
    expression tree in both engines (train mean = one division of an
    exact decimal cents sum); qhat is a selection, not interpolation,
    so it is one of those exact doubles.

    Scale: three disjoint subsets of ONE scan each, a broadcast join
    of the ~5-row predictor, a single global selection over the
    calibration residuals, exact-integer coverage counts.
    """
    h = _md5_mod("cf", F.col("o_orderkey"), 4)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = orders.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("y"),
        cents.alias("cents"),
        h.alias("h"),
    )
    train = (
        base.filter(F.col("h") <= 1)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            (
                F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(100.0)
            ).alias("yhat"),
        )
    )
    resid = F.abs(F.col("y") - F.col("yhat"))
    cal = base.filter(F.col("h") == 2).join(
        F.broadcast(train), "o_orderpriority"
    )
    # conformal quantile: the (1 - alpha) percentile_disc SELECTION of
    # the calibration residuals (both engines require a constant
    # percentage, so this is the standard asymptotic split-conformal
    # variant rather than the ceil((1-a)(n+1))/n finite-sample one —
    # the difference is one order statistic at calibration sizes).
    qhat = cal.select(resid.alias("r")).agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.expr(
            f"percentile_disc({1.0 - CONFORMAL_ALPHA})"
            " WITHIN GROUP (ORDER BY r)"
        ).alias("qhat"),
    )
    test = base.filter(F.col("h") == 3).join(
        F.broadcast(train), "o_orderpriority"
    )
    audit = (
        test.crossJoin(F.broadcast(qhat))
        .groupBy("o_orderpriority", "n_train", "yhat", "n_cal", "qhat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(F.when(resid <= F.col("qhat"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
    )
    return audit.select(
        "o_orderpriority",
        "n_train",
        "yhat",
        "n_cal",
        "qhat",
        "n_test",
        "n_covered",
        (
            F.col("n_covered").cast("double") / F.col("n_test").cast("double")
        ).alias("coverage"),
    ).orderBy("o_orderpriority")


def conformal_interval_sql() -> str:
    gate = _sql_md5_mod("cf", "o_orderkey", 4)
    return f"""
WITH base AS (
  SELECT o_orderpriority, o_totalprice AS y,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         {gate} AS h
  FROM orders
),
train AS (
  SELECT o_orderpriority, COUNT(*) AS n_train,
         CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS yhat
  FROM base WHERE h <= 1 GROUP BY o_orderpriority
),
cal AS (
  SELECT abs(y - yhat) AS r
  FROM base JOIN train USING (o_orderpriority) WHERE h = 2
),
qhat_t AS (
  SELECT COUNT(*) AS n_cal,
         quantile_disc(r, {1.0 - CONFORMAL_ALPHA}) AS qhat
  FROM cal
),
test AS (
  SELECT b.o_orderpriority, t.n_train, t.yhat, abs(b.y - t.yhat) AS r
  FROM base b JOIN train t USING (o_orderpriority) WHERE b.h = 3
)
SELECT o_orderpriority, n_train, yhat, n_cal, qhat,
       COUNT(*) AS n_test,
       CAST(SUM(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS coverage
FROM test CROSS JOIN qhat_t
GROUP BY o_orderpriority, n_train, yhat, n_cal, qhat
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# two-proportion z-test (A/B experiment readout)
# --------------------------------------------------------------------------


def ab_test_ztest(events: DataFrame) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users are
    hash-assigned to arms, the metric is user-level conversion (had
    at least one 'purchase' event), and the readout is the pooled
    two-proportion z statistic — the standard experimentation-
    platform significance test.

    Determinism: arm assignment is the md5 gate (reproducible on any
    engine, no RNG); conversion counts are exact integers; p0/p1/z
    are one double expression over those integers (sqrt is IEEE-exact
    in both engines). Scale: one groupBy(user) over the event stream,
    then a 2-row aggregation — the z readout is O(1) state.
    """
    per_user = events.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    arm = _md5_mod("ab", F.col("user_id"), 2)
    arms = per_user.select(arm.alias("arm"), "converted")
    agg = arms.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_conv"),
    )
    # conditional pivot of the 2-row arm table into one readout row —
    # filter-per-arm branches would re-instantiate the whole per-user
    # aggregation subtree (two scans of the event stream, verified in
    # the physical plan).
    both = agg.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_conv"))).alias("conv0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_conv"))).alias("conv1"),
    )
    p0 = F.col("conv0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("conv1").cast("double") / F.col("n1").cast("double")
    pooled = (F.col("conv0") + F.col("conv1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    z = F.when(se > 0, (p1 - p0) / se)
    return both.select(
        "n0",
        "conv0",
        "n1",
        "conv1",
        p0.alias("p0"),
        p1.alias("p1"),
        pooled.alias("p_pooled"),
        z.alias("z"),
    )


def ab_test_ztest_sql() -> str:
    gate = _sql_md5_mod("ab", "user_id", 2)
    return f"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (SELECT {gate} AS arm, converted FROM per_user),
agg AS (
  SELECT arm, COUNT(*) AS n_users, CAST(SUM(converted) AS BIGINT) AS n_conv
  FROM arms GROUP BY arm
),
a AS (SELECT n_users AS n0, n_conv AS conv0 FROM agg WHERE arm = 0),
b AS (SELECT n_users AS n1, n_conv AS conv1 FROM agg WHERE arm = 1)
SELECT n0, conv0, n1, conv1,
       CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
       CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
       CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS p_pooled,
       CASE WHEN sqrt(
              (CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              * (1.0 - CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) > 0
       THEN (CAST(conv1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(conv0 AS DOUBLE) / CAST(n0 AS DOUBLE))
            / sqrt(
              (CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              * (1.0 - CAST(conv0 + conv1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
              * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
       END AS z
FROM a CROSS JOIN b
"""


# --------------------------------------------------------------------------
# round-8 additions: calibration / drift / off-policy / sampling
# --------------------------------------------------------------------------

#: calibration: equal-width price bins (dollars per bin, bin count).
CALIB_BIN_WIDTH = 60_000.0
CALIB_N_BINS = 10
#: the score normalizer (top of the binned range).
CALIB_SCALE = CALIB_BIN_WIDTH * CALIB_N_BINS


def calibration_bins(orders: DataFrame) -> DataFrame:
    """Reliability-diagram bins for a score/label pair — the
    calibration readout (Guo et al. 2017) every classifier training
    run reports before trusting predicted probabilities. Score =
    o_totalprice / 600k clipped to [0, 1); label = '1-URGENT'.

    Exact: bin membership is integer arithmetic on cents, per-bin
    counts are exact, mean_score and pos_rate are single double
    divisions of exact decimal/integer sums — bit-identical across
    engines. Scale: ONE scan, one 10-key map-side-combinable
    aggregation; nothing else.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bin_w_cents = int(CALIB_BIN_WIDTH * 100)
    b = F.least(
        (cents / F.lit(bin_w_cents)).cast("long"), F.lit(CALIB_N_BINS - 1)
    )
    label = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    per = (
        orders.select(b.alias("bin"), cents.alias("cents"), label.alias("y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sum_cents"),
        )
    )
    mean_score = (
        F.col("sum_cents").cast("double")
        / F.col("n").cast("double")
        / F.lit(100.0)
        / F.lit(CALIB_SCALE)
    )
    pos_rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    return per.select(
        "bin",
        "n",
        "n_pos",
        mean_score.alias("mean_score"),
        pos_rate.alias("pos_rate"),
        F.abs(mean_score - pos_rate).alias("gap"),
    ).orderBy("bin")


def calibration_bins_sql() -> str:
    bin_w_cents = int(CALIB_BIN_WIDTH * 100)
    return f"""
WITH per AS (
  SELECT LEAST(CAST(round(o_totalprice * 100) AS BIGINT) // {bin_w_cents},
               {CALIB_N_BINS - 1}) AS bin,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos,
         SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
           AS sum_cents
  FROM orders GROUP BY 1
)
SELECT bin, n, n_pos,
       CAST(CAST(sum_cents AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
         / 100.0 / {CALIB_SCALE!r} AS mean_score,
       CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
       abs(CAST(CAST(sum_cents AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
             / 100.0 / {CALIB_SCALE!r}
           - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) AS gap
FROM per ORDER BY bin
"""


#: KS prefix-sum bucketing (cents per bucket; parallel window width).
KS_BUCKET_CENTS = 1_000_000


def ks_drift(orders: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two
    md5-split halves of the order-price distribution — the standard
    continuous-feature drift check run between a training snapshot
    and fresh data before retraining.

    D = max_v |F0(v) - F1(v)| computed EXACTLY: per distinct cents
    value the two sample counts, inclusive prefix sums as a two-level
    bucket-partitioned window (the ``roc_auc`` distributed prefix-sum
    shape: per-bucket windows in parallel, one tiny global window
    over bucket totals), and the difference as the exact integer
    |cum0*n1 - cum1*n0| in decimal(38,0) (the int64 product overflows
    at ~3e9 rows per split) — one double division at the very end.
    ks_location is the smallest price attaining the max (min_by on a
    (-d, v) struct key, lexicographic, deterministic).
    """
    d38 = "decimal(38,0)"
    h = _md5_mod("ks", F.col("o_orderkey"), 2)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    by_value = (
        orders.select(cents.alias("v"), h.alias("s"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("c1"),
        )
        .withColumn("bucket", F.expr(f"v div {KS_BUCKET_CENTS}"))
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = by_value.select(
        "v",
        "bucket",
        F.sum("c0").over(w_in).alias("in0"),
        F.sum("c1").over(w_in).alias("in1"),
    )
    bucket_tot = by_value.groupBy("bucket").agg(
        F.sum("c0").alias("b0"), F.sum("c1").alias("b1")
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    bucket_cum = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("b0").over(w_b), F.lit(0)).alias("cum0b"),
        F.coalesce(F.sum("b1").over(w_b), F.lit(0)).alias("cum1b"),
        F.sum("b0").over(w_all).alias("n0"),
        F.sum("b1").over(w_all).alias("n1"),
    )
    d_num = F.abs(
        (F.col("cum0b") + F.col("in0")).cast(d38) * F.col("n1").cast(d38)
        - (F.col("cum1b") + F.col("in1")).cast(d38) * F.col("n0").cast(d38)
    )
    joined = within.join(F.broadcast(bucket_cum), "bucket").select(
        "v", "n0", "n1", d_num.alias("d_num")
    )
    out = joined.agg(
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        F.max("d_num").alias("d_max"),
        F.min_by("v", F.struct(-F.col("d_num"), F.col("v"))).alias("_loc"),
    )
    return out.select(
        "n0",
        "n1",
        (
            F.col("d_max").cast("double")
            / (F.col("n0").cast(d38) * F.col("n1").cast(d38)).cast("double")
        ).alias("d_stat"),
        (F.col("_loc").cast("double") / F.lit(100.0)).alias("ks_location"),
    )


def ks_drift_sql() -> str:
    gate = _sql_md5_mod("ks", "o_orderkey", 2)
    return f"""
WITH by_value AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN {gate} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN {gate} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
  FROM orders GROUP BY 1
),
cum AS (
  SELECT v,
         CAST(SUM(c0) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS cum0,
         CAST(SUM(c1) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT)
           AS cum1,
         CAST(SUM(c0) OVER () AS HUGEINT) AS n0,
         CAST(SUM(c1) OVER () AS HUGEINT) AS n1
  FROM by_value
),
d AS (
  SELECT v, n0, n1, abs(cum0 * n1 - cum1 * n0) AS d_num FROM cum
)
SELECT CAST(MAX(n0) AS BIGINT) AS n0, CAST(MAX(n1) AS BIGINT) AS n1,
       CAST(CAST(MAX(d_num) AS VARCHAR) AS DOUBLE)
         / CAST(CAST(MAX(n0) * MAX(n1) AS VARCHAR) AS DOUBLE) AS d_stat,
       CAST(MIN(CASE WHEN d_num = (SELECT MAX(d_num) FROM d) THEN v END)
            AS DOUBLE) / 100.0 AS ks_location
FROM d
"""

# --------------------------------------------------------------------------
# off-policy evaluation (IPS / SNIPS)
# --------------------------------------------------------------------------

#: the two logged actions and the uniform logging propensity.
IPS_ACTIONS = ("view", "click")
IPS_PROPENSITY = 0.5


def ips_policy_eval(events: DataFrame) -> DataFrame:
    """Inverse-propensity-score off-policy evaluation (Horvitz-
    Thompson; Dudik et al. 2011): estimate the value of a target
    policy from logged randomized traffic without deploying it — the
    counterfactual readout every recsys/ads experiment platform
    computes.

    Logged data = view/click events, treated as uniform-random
    (propensity 0.5) logged actions with reward = ``value``. Target
    policy: show 'click' to odd users, 'view' to even users. The IPS
    estimate is sum(match * r / 0.5) / N and SNIPS normalizes by the
    matched weight mass; both are single double divisions of exact
    integer cents/counts. Scale: ONE scan, one O(1)-state
    aggregation; no join, no shuffle beyond the 1-row agg.
    """
    reward_cents = F.round(F.col("value") * 100).cast("long")
    target = F.when(F.col("user_id") % 2 == 1, "click").otherwise("view")
    match = (F.col("event_type") == target).cast("int")
    base = events.filter(F.col("event_type").isin(*IPS_ACTIONS)).select(
        match.alias("m"), reward_cents.alias("r")
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_logged"),
        F.sum("m").alias("n_matched"),
        F.sum((F.col("m") * F.col("r")).cast("decimal(38,0)")).alias(
            "match_cents"
        ),
    )
    w = F.lit(1.0 / IPS_PROPENSITY)
    ips = (
        F.col("match_cents").cast("double")
        * w
        / F.col("n_logged").cast("double")
        / F.lit(100.0)
    )
    snips = F.when(
        F.col("n_matched") > 0,
        F.col("match_cents").cast("double")
        / F.col("n_matched").cast("double")
        / F.lit(100.0),
    )
    return agg.select(
        "n_logged", "n_matched", ips.alias("ips_value"), snips.alias("snips_value")
    )


def ips_policy_eval_sql() -> str:
    acts = ", ".join(f"'{a}'" for a in IPS_ACTIONS)
    return f"""
WITH base AS (
  SELECT CASE WHEN event_type = (CASE WHEN user_id % 2 = 1 THEN 'click'
                                      ELSE 'view' END)
              THEN 1 ELSE 0 END AS m,
         CAST(round(value * 100) AS BIGINT) AS r
  FROM events WHERE event_type IN ({acts})
),
agg AS (
  SELECT COUNT(*) AS n_logged, CAST(SUM(m) AS BIGINT) AS n_matched,
         SUM(CAST(m * r AS HUGEINT)) AS match_cents
  FROM base
)
SELECT n_logged, n_matched,
       CAST(CAST(match_cents AS VARCHAR) AS DOUBLE) * {1.0 / IPS_PROPENSITY!r}
         / CAST(n_logged AS DOUBLE) / 100.0 AS ips_value,
       CASE WHEN n_matched > 0 THEN
         CAST(CAST(match_cents AS VARCHAR) AS DOUBLE)
           / CAST(n_matched AS DOUBLE) / 100.0
       END AS snips_value
FROM agg
"""


# --------------------------------------------------------------------------
# deterministic negative sampling for contrastive training pairs
# --------------------------------------------------------------------------

#: negatives drawn per user.
NEG_K = 4


def negative_sampling(
    orders: DataFrame, lineitem: DataFrame, part: DataFrame
) -> DataFrame:
    """Deterministic negative sampling for (user, item) training
    pairs — the contrastive-pairs step of every recsys / embedding
    training pipeline (word2vec negative sampling, BPR): for each
    customer, K candidate items are drawn by hash from the item
    domain and any accidental positive is removed.

    Determinism: candidate k for user u is md5('neg', u':'k) mod
    n_items mapped into the dense 1..P partkey domain — no RNG state,
    identical on any engine/partitioning. Scale: positives =
    orders ⋈ lineitem projected to (custkey, partkey); candidates =
    per-user fan-out of a K-length sequence (zero-shuffle). The
    anti-join is the union-tag trick: positives and candidates union
    into ONE (user, item)-keyed aggregation (a candidate survives iff
    its pair saw no positive), then one user-keyed rollup — the
    positives subtree is built exactly ONCE (a plain anti-join +
    separate positive-count branch would run the orders ⋈ lineitem
    join twice), and both aggregations are map-side combinable.
    """
    n_items = part.agg(F.count(F.lit(1)).alias("n_items"))
    positives = (
        orders.select("o_orderkey", F.col("o_custkey").alias("user_id"))
        .join(
            lineitem.select("l_orderkey", F.col("l_partkey").alias("item_id")),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "user_id", "item_id", F.lit(1).alias("pos"), F.lit(0).alias("cand")
        )
    )
    hash_item = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("neg"),
                        F.col("user_id").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % F.col("n_items")
        + 1
    )
    candidates = (
        orders.select(F.col("o_custkey").alias("user_id"))
        .distinct()
        .crossJoin(F.broadcast(n_items))
        .select(
            "user_id",
            F.explode(F.expr(f"sequence(1, {NEG_K})")).alias("k"),
            F.col("n_items"),
        )
        .select(
            "user_id",
            hash_item.alias("item_id"),
            F.lit(0).alias("pos"),
            F.lit(1).alias("cand"),
        )
    )
    per_pair = (
        positives.unionByName(candidates)
        .groupBy("user_id", "item_id")
        .agg(F.max("pos").alias("is_pos"), F.sum("cand").alias("n_cand"))
    )
    return (
        per_pair.groupBy("user_id")
        .agg(
            F.sum("is_pos").alias("n_pos"),
            F.sum(
                F.when(F.col("is_pos") == 0, F.col("n_cand")).otherwise(0)
            ).alias("n_neg"),
            F.sum(
                F.when(
                    F.col("is_pos") == 0, F.col("n_cand") * F.col("item_id")
                ).otherwise(0)
            ).alias("neg_item_sum"),
        )
        .filter(F.col("n_pos") >= 1)
        .orderBy("user_id")
    )


def negative_sampling_sql() -> str:
    return f"""
WITH n_items_t AS (SELECT COUNT(*) AS n_items FROM part),
positives AS (
  SELECT o_custkey AS user_id, l_partkey AS item_id, 1 AS pos, 0 AS cand
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
candidates AS (
  SELECT user_id,
         CAST('0x' || substr(md5('neg' || CAST(user_id AS VARCHAR) || ':'
                                 || CAST(k AS VARCHAR)), 1, 8) AS BIGINT)
           % n_items + 1 AS item_id,
         0 AS pos, 1 AS cand
  FROM (SELECT DISTINCT o_custkey AS user_id FROM orders)
  CROSS JOIN n_items_t
  CROSS JOIN (SELECT unnest(range(1, {NEG_K + 1})) AS k)
),
per_pair AS (
  SELECT user_id, item_id, MAX(pos) AS is_pos,
         CAST(SUM(cand) AS BIGINT) AS n_cand
  FROM (SELECT * FROM positives UNION ALL SELECT * FROM candidates)
  GROUP BY user_id, item_id
)
SELECT user_id, CAST(SUM(is_pos) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN is_pos = 0 THEN n_cand ELSE 0 END) AS BIGINT)
         AS n_neg,
       CAST(SUM(CASE WHEN is_pos = 0 THEN n_cand * item_id ELSE 0 END)
            AS BIGINT) AS neg_item_sum
FROM per_pair
GROUP BY user_id
HAVING SUM(is_pos) >= 1
ORDER BY user_id
"""

# --------------------------------------------------------------------------
# reciprocal-rank fusion of two per-customer rankings
# --------------------------------------------------------------------------

#: the RRF smoothing constant (Cormack et al. 2009's k = 60).
RRF_K = 60


def rrf_fusion(orders: DataFrame) -> DataFrame:
    """Reciprocal-rank fusion of two rankings — the standard way to
    merge heterogeneous retrieval scores (BM25 + dense, or here: each
    customer's orders ranked by price and by recency) without score
    calibration: rrf = Σ 1/(k + rank_i), k = 60.

    Exactness: ranks are integer row_numbers from two windows over
    the SAME customer partitioning (one shuffle, two in-partition
    sorts); rrf is the two-term sum 1/(60+r1) + 1/(60+r2) — a FIXED
    two-operand double expression, not an order-dependent reduction —
    identical in both engines. Output: each customer's top fused
    order (max_by on the (rrf, -orderkey) pair, deterministic).
    """
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_date = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    ranked = orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_price).alias("r_price"),
        F.row_number().over(w_date).alias("r_date"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_price").cast("double"))
        + F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("r_date").cast("double"))
    )
    scored = ranked.select(
        "o_custkey", "o_orderkey", "r_price", "r_date", rrf.alias("rrf")
    )
    # top fused order per customer: smallest (r_price + r_date) sum is
    # NOT equivalent — rrf's harmonic weighting must decide; tie-break
    # on the smaller orderkey via min_by on a (-rrf, orderkey) struct.
    best = scored.groupBy("o_custkey").agg(
        F.min_by(
            F.struct("o_orderkey", "r_price", "r_date", "rrf"),
            F.struct(-F.col("rrf"), F.col("o_orderkey")),
        ).alias("b"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return best.select(
        "o_custkey",
        F.col("b.o_orderkey").alias("best_orderkey"),
        F.col("b.r_price").alias("r_price"),
        F.col("b.r_date").alias("r_date"),
        F.col("b.rrf").alias("rrf"),
        "n_orders",
    ).orderBy("o_custkey")


def rrf_fusion_sql() -> str:
    return f"""
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS r_price,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey ASC) AS r_date
  FROM orders
),
scored AS (
  SELECT *, CAST(1.0 AS DOUBLE) / ({RRF_K} + CAST(r_price AS DOUBLE))
            + CAST(1.0 AS DOUBLE) / ({RRF_K} + CAST(r_date AS DOUBLE)) AS rrf
  FROM ranked
),
best AS (
  SELECT o_custkey, o_orderkey AS best_orderkey, r_price, r_date, rrf,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
           ORDER BY rrf DESC, o_orderkey ASC) AS rn
  FROM scored
)
SELECT o_custkey, best_orderkey, r_price, r_date, rrf, n_orders
FROM best WHERE rn = 1 ORDER BY o_custkey
"""


# --------------------------------------------------------------------------
# round-9 additions: PR-AUC, Kaplan-Meier survival, decision stump
# --------------------------------------------------------------------------


def pr_auc(orders: DataFrame, bucket_cents: int = AUC_BUCKET_CENTS) -> DataFrame:
    """Exact average precision (area under the precision-recall
    curve, the step-function form sklearn computes): with every
    distinct score a threshold,

        AP = sum_s (p_s / P) * precision_at(s)
           = (1/P) * sum_s p_s * TP_s / rank_s

    over distinct scores s DESCENDING — the ranking metric that stays
    informative when ROC-AUC saturates on imbalanced labels (the
    ``roc_auc`` companion; same label/score encoding: urgent
    priority vs exact int64 price cents).

    Exactness: TP_s (positives at score >= s) and rank_s (rows at
    score >= s) come from the same TWO-LEVEL bucketed prefix sum as
    ``roc_auc`` — windows partitioned by score bucket, only
    per-bucket totals cross the tiny global window, no single-reducer
    sort over row-scale data. Each per-score term is exact integers
    -> ONE double division; the final sum is a strict LEFT FOLD over
    terms in descending-score order (Spark ``aggregate`` / DuckDB
    ``list_reduce`` — the repo's double-fold convention), so both
    engines evaluate the identical IEEE sequence. The fold array is
    one row per DISTINCT score (the cent grid — bounded, not
    row-scale); a 100 TB run would cap distinct thresholds by
    quantizing scores, exactly as recommenders do.
    """
    by_score = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("score"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
        .groupBy("score")
        .agg(
            F.sum("label").alias("p"),
            F.count(F.lit(1)).alias("r"),
        )
        .withColumn("bucket", F.expr(f"score div {bucket_cents}"))
    )
    # distinct-score-sized with four consumers (within, bucket totals,
    # fold terms, grand totals) — checkpoint so the fact scans ONCE
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    by_score = _reliable_checkpoint(by_score)
    # descending prefix sums INCLUSIVE of the current score group
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = by_score.withColumn("tp_in", F.sum("p").over(w_in)).withColumn(
        "rk_in", F.sum("r").over(w_in)
    )
    bucket_tot = by_score.groupBy("bucket").agg(
        F.sum("p").alias("bp"), F.sum("r").alias("br")
    )
    w_b = (
        Window.orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_cum = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("bp").over(w_b), F.lit(0)).alias("tp_above"),
        F.coalesce(F.sum("br").over(w_b), F.lit(0)).alias("rk_above"),
    )
    joined = within.join(F.broadcast(bucket_cum), "bucket").select(
        "score",
        "p",
        (F.col("tp_above") + F.col("tp_in")).alias("tp"),
        (F.col("rk_above") + F.col("rk_in")).alias("rank"),
    )
    term = (
        F.col("p").cast("decimal(38,0)") * F.col("tp").cast("decimal(38,0)")
    ).cast("double") / F.col("rank").cast("double")
    folded = (
        joined.filter(F.col("p") > 0)
        .select(F.struct((-F.col("score")).alias("ns"), term.alias("t")).alias("st"))
        .agg(F.array_sort(F.collect_list("st")).alias("terms"))
        .select(
            F.aggregate(
                F.transform(F.col("terms"), lambda x: x["t"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("ap_num")
        )
    )
    totals = by_score.agg(
        F.sum("p").alias("n_pos"), F.sum(F.col("r") - F.col("p")).alias("n_neg")
    )
    return folded.crossJoin(F.broadcast(totals)).select(
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0, F.col("ap_num") / F.col("n_pos").cast("double")
        ).alias("average_precision"),
    )


def pr_auc_sql(bucket_cents: int = AUC_BUCKET_CENTS) -> str:
    return f"""
WITH by_score AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS score,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(COUNT(*) AS BIGINT) AS r
  FROM orders GROUP BY 1
),
bucketed AS (SELECT *, score // {bucket_cents} AS bucket FROM by_score),
within AS (
  SELECT *,
         CAST(SUM(p) OVER (PARTITION BY bucket ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS tp_in,
         CAST(SUM(r) OVER (PARTITION BY bucket ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS rk_in
  FROM bucketed
),
bucket_cum AS (
  SELECT bucket,
         COALESCE(CAST(SUM(bp) OVER (ORDER BY bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS tp_above,
         COALESCE(CAST(SUM(br) OVER (ORDER BY bucket DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS rk_above
  FROM (SELECT bucket, CAST(SUM(p) AS BIGINT) AS bp,
               CAST(SUM(r) AS BIGINT) AS br FROM bucketed GROUP BY bucket)
),
terms AS (
  SELECT w.score,
         CAST(CAST(CAST(w.p AS HUGEINT) * (b.tp_above + w.tp_in) AS VARCHAR)
              AS DOUBLE)
           / CAST(b.rk_above + w.rk_in AS DOUBLE) AS t
  FROM within w JOIN bucket_cum b USING (bucket)
  WHERE w.p > 0
),
folded AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list(t ORDER BY score DESC)),
           (acc, x) -> acc + x) AS ap_num
  FROM terms
),
totals AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(r - p) AS BIGINT) AS n_neg
  FROM by_score
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 THEN ap_num / CAST(n_pos AS DOUBLE) END
         AS average_precision
FROM folded, totals
"""


def decision_stump(orders: DataFrame, bucket_cents: int = AUC_BUCKET_CENTS) -> DataFrame:
    """Best binary split of a numeric feature against a binary label
    (the depth-1 decision tree / boosting weak learner): the
    threshold t maximizing the purity score

        (pL^2 + qL^2) / nL  +  (pR^2 + qR^2) / nR

    — an affine transform of negative weighted Gini impurity, so
    argmax(purity) == argmin(weighted Gini). Label = urgent order,
    feature = exact int64 price cents; split rule is score <= t.

    Every candidate threshold (= distinct score) is evaluated from
    ONE pass of cumulative (positives, rows): the same two-level
    bucketed prefix sum as ``roc_auc`` — no per-candidate scan, no
    single-reducer sort. Squares accumulate as decimal(38,0) (p^2
    overflows int64 past ~3e9 rows) and each side's term is one
    exactly-cast double division; the argmax orders by (purity DESC,
    threshold ASC) — a distributed TakeOrdered, deterministic on
    bit-identical doubles. The max score is excluded (its right side
    is empty). This is the split-finding kernel XGBoost/LightGBM run
    per feature per node — the reference trains exactly such boosted
    stumps remotely (XGBoost/Predictor.py:96-110).
    """
    by_score = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("score"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .cast("long")
            .alias("label"),
        )
        .groupBy("score")
        .agg(F.sum("label").alias("p"), F.count(F.lit(1)).alias("r"))
        .withColumn("bucket", F.expr(f"score div {bucket_cents}"))
    )
    # distinct-score-sized; three consumers (within, bucket totals,
    # grand totals) — checkpoint so the orders fact scans ONCE
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    by_score = _reliable_checkpoint(by_score)
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = by_score.withColumn("p_in", F.sum("p").over(w_in)).withColumn(
        "r_in", F.sum("r").over(w_in)
    )
    bucket_tot = by_score.groupBy("bucket").agg(
        F.sum("p").alias("bp"), F.sum("r").alias("br")
    )
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_cum = bucket_tot.select(
        "bucket",
        F.coalesce(F.sum("bp").over(w_b), F.lit(0)).alias("p_below"),
        F.coalesce(F.sum("br").over(w_b), F.lit(0)).alias("r_below"),
    )
    totals = by_score.agg(
        F.sum("p").alias("tp"), F.sum("r").alias("tr")
    )
    d38 = "decimal(38,0)"
    cum = (
        within.join(F.broadcast(bucket_cum), "bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            "score",
            (F.col("p_below") + F.col("p_in")).alias("pl"),
            (F.col("r_below") + F.col("r_in")).alias("nl"),
            (F.col("tp") - F.col("p_below") - F.col("p_in")).alias("pr_"),
            (F.col("tr") - F.col("r_below") - F.col("r_in")).alias("nr"),
        )
        .filter(F.col("nr") > 0)
    )
    ql = F.col("nl") - F.col("pl")
    qr = F.col("nr") - F.col("pr_")
    purity = (
        (
            F.col("pl").cast(d38) * F.col("pl").cast(d38)
            + ql.cast(d38) * ql.cast(d38)
        ).cast("double")
        / F.col("nl").cast("double")
        + (
            F.col("pr_").cast(d38) * F.col("pr_").cast(d38)
            + qr.cast(d38) * qr.cast(d38)
        ).cast("double")
        / F.col("nr").cast("double")
    )
    return (
        cum.select(
            F.col("score").alias("split_cents"),
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("nr").alias("n_right"),
            F.col("pr_").alias("pos_right"),
            purity.alias("purity"),
        )
        .orderBy(F.col("purity").desc(), F.col("split_cents").asc())
        .limit(1)
    )


def decision_stump_sql(bucket_cents: int = AUC_BUCKET_CENTS) -> str:
    term = (
        "CAST(CAST(CAST({p} AS HUGEINT) * {p} + CAST({q} AS HUGEINT) * {q}"
        " AS VARCHAR) AS DOUBLE) / CAST({n} AS DOUBLE)"
    )
    tl = term.format(p="pl", q="(nl - pl)", n="nl")
    tr_ = term.format(p="pr_", q="(nr - pr_)", n="nr")
    return f"""
WITH by_score AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS score,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(COUNT(*) AS BIGINT) AS r
  FROM orders GROUP BY 1
),
bucketed AS (SELECT *, score // {bucket_cents} AS bucket FROM by_score),
within AS (
  SELECT *,
         CAST(SUM(p) OVER (PARTITION BY bucket ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS p_in,
         CAST(SUM(r) OVER (PARTITION BY bucket ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS r_in
  FROM bucketed
),
bucket_cum AS (
  SELECT bucket,
         COALESCE(CAST(SUM(bp) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS p_below,
         COALESCE(CAST(SUM(br) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS r_below
  FROM (SELECT bucket, CAST(SUM(p) AS BIGINT) AS bp,
               CAST(SUM(r) AS BIGINT) AS br FROM bucketed GROUP BY bucket)
),
totals AS (SELECT CAST(SUM(p) AS BIGINT) AS tp, CAST(SUM(r) AS BIGINT) AS tr
           FROM by_score),
cum AS (
  SELECT w.score,
         b.p_below + w.p_in AS pl,
         b.r_below + w.r_in AS nl,
         t.tp - b.p_below - w.p_in AS pr_,
         t.tr - b.r_below - w.r_in AS nr
  FROM within w JOIN bucket_cum b USING (bucket), totals t
)
SELECT score AS split_cents, nl AS n_left, pl AS pos_left,
       nr AS n_right, pr_ AS pos_right,
       {tl} + {tr_} AS purity
FROM cum WHERE nr > 0
ORDER BY purity DESC, split_cents ASC
LIMIT 1
"""


def quantile_normalize(lineitem: DataFrame) -> DataFrame:
    """Quantile normalization across features — the cross-feature
    distribution equalizer (canonical in bioinformatics microarrays,
    used in ML prep wherever features must share one distribution):
    each value is replaced by the MEAN of the values holding the same
    rank in every feature, so all normalized feature columns share an
    identical empirical distribution by construction.

    Features here: quantity, extended price, discount (all exact
    cents/integer units). Shape: the three columns unpivot with ONE
    ``stack`` pass, and the EXACT per-feature rank is assembled with
    the two-level bucketed pattern (the roc_auc shape) instead of a
    per-feature single-partition sort: approximate percentile edges
    split each feature's value range into ~64 order-contiguous
    buckets (the edges only affect BALANCE — any constants give the
    identical rank, since equal values share a bucket and lower
    buckets' counts are exact offsets), rows row_number WITHIN their
    bucket ordered by v (ties arbitrary — equal values are
    interchangeable under rank-mean aggregation, see the r20 note
    below), and rank = bucket offset + within-rank. Measured: the
    single-
    partition sort was 51 s at the 10x decade; bucketed it
    re-linearizes. Rank means are exact-integer aggregations (one
    double division).

    The round-9 cut (the engine's heaviest warm cell was the per-row
    ``ranked JOIN rank_means ON rnk`` — an equi-join of TWO n-row
    streams): a bucket's ranks are CONTIGUOUS (rank = off + rn_in
    with rn_in in 1..bc), so the per-feature min/max of norm_v comes
    from rank_means range-joined to the tiny (<= 3*32-row, broadcast)
    bucket table on ``rnk BETWEEN off+1 AND off+bc`` — and the
    per-feature row counts and raw sums fall out of the same bucket
    aggregate. The n-row ranked stream now has exactly ONE consumer
    (the rank_means aggregation), so the join shuffle AND the
    checkpoint both disappear; values are bit-identical (same norm_v
    set per feature, exact-integer sums).
    """
    # r20 (§2.3 narrower shuffle types — the fd_audit trick): the
    # unpivoted stream carries an INT feature code (1=discount,
    # 2=price, 3=quantity; alphabetical so code order == name order)
    # instead of the name string, and DROPS the (l_orderkey,
    # l_linenumber) tie-break columns entirely: row_number ties among
    # equal v then land in arbitrary order, but equal values are
    # interchangeable in every consumer — rank_means groups by rnk
    # over the same v either way, and counts/sums are order-free — so
    # the output is bit-identical while the big window exchange moves
    # (int, long, int) rows instead of (string, long, long, int, int)
    # and sorts on v alone. Names re-attach on the 3-row result.
    feats = lineitem.select(
        F.expr(
            "stack(3,"
            " 3, CAST(l_quantity AS BIGINT) * 100,"
            " 2, CAST(round(l_extendedprice * 100) AS BIGINT),"
            " 1, CAST(round(l_discount * 10000) AS BIGINT))"
        ).alias("feature", "v"),
    )
    # balance-only approximate edges (31 cuts -> <=32 range buckets per
    # feature, accuracy 100 — cheap); rank correctness is
    # edge-independent (see docstring), so the sketch costs nothing in
    # exactness
    probs = F.array(*[F.lit(i / 32.0) for i in range(1, 32)])
    edges = feats.groupBy("feature").agg(
        F.percentile_approx("v", probs, F.lit(100)).alias("edges")
    )
    # the edge table is 3 rows x 31 ints — read it to the driver and
    # compile the bucket lookup into a literal binary-search CASE tree
    # (depth 5). A HOF `F.filter` lambda over the edge array is
    # interpreted per element (31 comparisons/row outside codegen —
    # measured ~2.3 s of the sf0.1 warm cell); the CASE tree is
    # whole-stage-codegen'd at ~5 comparisons/row. Legitimate driver
    # read: strata-sized, same class as the LSH budget guards.
    edge_map = {r["feature"]: list(r["edges"]) for r in edges.collect()}

    def _lt_count(sorted_edges: list, base: int):
        # expression computing base + |{e in sorted_edges : e < v}|
        if not sorted_edges:
            return F.lit(base)
        m = len(sorted_edges) // 2
        return F.when(
            F.lit(int(sorted_edges[m])) < F.col("v"),
            _lt_count(sorted_edges[m + 1:], base + m + 1),
        ).otherwise(_lt_count(sorted_edges[:m], base))

    vb_expr = None
    for feat_name, feat_edges in sorted(edge_map.items()):
        branch = _lt_count(feat_edges, 0)
        vb_expr = (
            F.when(F.col("feature") == feat_name, branch)
            if vb_expr is None
            else vb_expr.when(F.col("feature") == feat_name, branch)
        )
    # empty input -> no edge rows -> constant bucket 0 (ranks are
    # edge-independent, and there is nothing to rank anyway)
    vb_final = F.lit(0) if vb_expr is None else vb_expr.otherwise(F.lit(0))
    bucketed = feats.select(
        "feature",
        "v",
        vb_final.alias("vb"),
    )
    w_in = Window.partitionBy("feature", "vb").orderBy(F.col("v").asc())
    winned = (
        bucketed.withColumn("rn_in", F.row_number().over(w_in))
        .select("feature", "vb", "v", "rn_in")
    )
    # bucket sizes come from the POST-window stream (bc = max rn_in,
    # already grouped by the window's own hash partitioning), so the
    # counts branch and the rank branch share ONE exchange subtree
    # (ReusedExchange in the physical plan) and the scan+stack+bucket
    # pipeline runs once, not twice
    counts = winned.groupBy("feature", "vb").agg(
        F.max("rn_in").alias("bc"), F.sum("v").alias("sv")
    )
    w_off = (
        Window.partitionBy("feature")
        .orderBy("vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "feature",
        "vb",
        "bc",
        "sv",
        F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off"),
    )
    ranked = winned.join(
        F.broadcast(offsets.select("feature", "vb", "off")),
        ["feature", "vb"],
    ).select(
        "feature",
        "v",
        (F.col("off") + F.col("rn_in")).alias("rnk"),
    )
    rank_means = ranked.groupBy("rnk").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "norm_v"
        )
    )
    # per-(feature, bucket) rank range [off+1, off+bc] -> broadcast
    # range join against the n-row rank_means stream (each rank hits
    # exactly one bucket per feature), replacing the former n-row x
    # n-row equi-join back on rnk
    ranges = offsets.select(
        "feature",
        (F.col("off") + 1).alias("lo"),
        (F.col("off") + F.col("bc")).alias("hi"),
    )
    stats = (
        rank_means.join(
            F.broadcast(ranges),
            (F.col("rnk") >= F.col("lo")) & (F.col("rnk") <= F.col("hi")),
        )
        .groupBy("feature")
        .agg(
            F.min("norm_v").alias("norm_min"),
            F.max("norm_v").alias("norm_max"),
        )
    )
    totals = offsets.groupBy("feature").agg(
        F.sum("bc").alias("n_rows"), F.sum("sv").alias("raw_sum")
    )
    # compact, deterministic audit surface: per feature, the extremes
    # of the normalized column (identical across features up to
    # row-count parity — the property quantile normalization exists
    # to enforce) plus the pre-normalization integer sum
    name = (
        F.when(F.col("feature") == 1, F.lit("discount"))
        .when(F.col("feature") == 2, F.lit("price"))
        .otherwise(F.lit("quantity"))
    )
    return (
        totals.join(stats, "feature")
        .select(
            name.alias("feature"), "n_rows", "raw_sum", "norm_min", "norm_max"
        )
        .orderBy("feature")
    )


def quantile_normalize_sql() -> str:
    return """
WITH feats AS (
  SELECT l_orderkey, l_linenumber, f.feature, f.v
  FROM lineitem, LATERAL (VALUES
    ('quantity', CAST(l_quantity AS BIGINT) * 100),
    ('price', CAST(round(l_extendedprice * 100) AS BIGINT)),
    ('discount', CAST(round(l_discount * 10000) AS BIGINT))
  ) AS f(feature, v)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY feature
              ORDER BY v ASC, l_orderkey ASC, l_linenumber ASC) AS rnk
  FROM feats
),
rank_means AS (
  SELECT rnk, CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS norm_v
  FROM ranked GROUP BY rnk
)
SELECT r.feature, COUNT(*) AS n_rows,
       CAST(SUM(r.v) AS BIGINT) AS raw_sum,
       MIN(m.norm_v) AS norm_min,
       MAX(m.norm_v) AS norm_max
FROM ranked r JOIN rank_means m USING (rnk)
GROUP BY r.feature ORDER BY r.feature
"""


#: total sample budget the Neyman allocator distributes.
NEYMAN_BUDGET = 5_000


def neyman_allocation(orders: DataFrame) -> DataFrame:
    """Neyman-optimal stratified sample allocation: quota_h
    proportional to N_h * S_h (stratum size x stratum standard
    deviation) — the survey-sampling / eval-set design rule that
    minimizes the variance of the estimated mean at a fixed budget,
    upweighting big AND volatile strata (uniform and proportional
    allocation are both strictly worse unless all S_h are equal).
    STAGED round 9 for the round-10 driver window.

    Strata = order priority; metric = exact price cents. Per-stratum
    variance is the exact-integer form (n * sum(x^2) - sum(x)^2 in
    decimal(38,0) — the feature_corr convention) with ONE sqrt and
    division into doubles; the share denominator sum_h N_h * S_h is
    a strict LEFT FOLD over strata in stratum order (the double-fold
    convention — a plain double SUM would be partition-order-
    dependent). One scan, one tiny-key aggregation; everything after
    is strata-sized broadcast arithmetic.

    Flooring each share independently would strand up to
    n_strata - 1 budget samples, so the floors get a deterministic
    largest-remainder top-up (Hamilton's method): the
    budget - sum(floor) leftover goes one-each to the strata with the
    largest fractional remainders (ties broken by stratum name), so
    sum(quota) == NEYMAN_BUDGET exactly whenever any stratum has
    positive variance. The remainder rank runs over the strata-sized
    (priority-bounded, <=5-row) frame — the bounded-global-window
    pattern, never over fact rows.
    """
    d38 = "decimal(38,0)"
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("sx"),
        F.sum(cents.cast(d38) * cents.cast(d38)).alias("sxx"),
    )
    var = (
        (
            F.col("n").cast(d38) * F.col("sxx")
            - F.col("sx").cast(d38) * F.col("sx").cast(d38)
        ).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
    )
    wts = per.select(
        "stratum",
        "n",
        F.sqrt(var).alias("sd_cents"),
        (F.col("n").cast("double") * F.sqrt(var)).alias("w"),
    )
    denom = wts.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("stratum").alias("s"), F.col("w")))
                ),
                lambda x: x["w"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("denom")
    )
    share = F.col("w") / F.col("denom")
    scaled = share * F.lit(float(NEYMAN_BUDGET))
    floored = wts.crossJoin(F.broadcast(denom)).select(
        "stratum",
        "n",
        "sd_cents",
        share.alias("share"),
        F.floor(scaled).cast("long").alias("q0"),
        (scaled - F.floor(scaled)).alias("rem"),
    )
    spent = floored.agg(F.sum("q0").alias("spent"))
    w_rem = Window.orderBy(F.col("rem").desc(), F.col("stratum").asc())
    return (
        floored.crossJoin(F.broadcast(spent))
        .withColumn("rnk", F.row_number().over(w_rem))
        .select(
            "stratum",
            "n",
            "sd_cents",
            "share",
            (
                F.col("q0")
                + F.when(
                    F.col("rnk") <= F.lit(NEYMAN_BUDGET) - F.col("spent"), 1
                ).otherwise(0)
            ).alias("quota"),
        )
        .orderBy("stratum")
    )


def neyman_allocation_sql() -> str:
    var = (
        "CAST(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx"
        " AS VARCHAR) AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    )
    return f"""
WITH per AS (
  SELECT o_orderpriority AS stratum, COUNT(*) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sx,
         SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
             * CAST(round(o_totalprice * 100) AS BIGINT)) AS sxx
  FROM orders GROUP BY 1
),
wts AS (
  SELECT stratum, n, sqrt({var}) AS sd_cents,
         CAST(n AS DOUBLE) * sqrt({var}) AS w
  FROM per
),
denom AS (
  SELECT list_reduce(
           list_prepend(CAST(0 AS DOUBLE), list(w ORDER BY stratum ASC)),
           (acc, x) -> acc + x) AS denom
  FROM wts
),
floored AS (
  SELECT stratum, n, sd_cents, w / denom AS share,
         CAST(floor(w / denom * CAST({float(NEYMAN_BUDGET)!r} AS DOUBLE))
              AS BIGINT) AS q0,
         w / denom * CAST({float(NEYMAN_BUDGET)!r} AS DOUBLE)
           - floor(w / denom * CAST({float(NEYMAN_BUDGET)!r} AS DOUBLE)) AS rem
  FROM wts, denom
),
spent AS (SELECT SUM(q0) AS spent FROM floored)
SELECT stratum, n, sd_cents, share,
       q0 + CASE WHEN row_number() OVER (ORDER BY rem DESC, stratum ASC)
                      <= {NEYMAN_BUDGET} - spent
                 THEN 1 ELSE 0 END AS quota
FROM floored, spent
ORDER BY stratum
"""


#: categories kept verbatim by the collapse; the tail becomes OTHER.
COLLAPSE_KEEP_K = 20


def rare_category_collapse(lineitem: DataFrame) -> DataFrame:
    """Rare-category collapse for a high-cardinality feature (part
    key): keep the top-``COLLAPSE_KEEP_K`` categories verbatim, fold
    the long tail into one OTHER bucket — the standard cardinality
    cap before one-hot/target encoding (an unbounded category column
    is a model-size and privacy hazard; the tail carries no per-level
    signal anyway). STAGED round 9 for the round-10 driver window.

    Rank-based (top-K), not count-threshold-based, so the mapping is
    scale-free: the same operator yields the same RELATIVE coverage
    at any sf. Output: each kept category with its support and
    share, plus the OTHER rollup (how many source categories and
    rows it swallowed) — the audit a feature store publishes next to
    the mapping. One scan into a category-sized count table
    (checkpointed before its three consumers: top-K heap, tail
    rollup, total), shares are single divisions of exact counts.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    counts = _reliable_checkpoint(
        lineitem.groupBy(F.col("l_partkey").alias("cat")).agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    total = counts.agg(F.sum("n").alias("total"))
    top = counts.orderBy(F.col("n").desc(), F.col("cat").asc()).limit(
        COLLAPSE_KEEP_K
    )
    tail = counts.join(top.select("cat"), "cat", "left_anti").agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("n_source_categories"),
    )
    kept = top.select(
        F.col("cat").cast("string").alias("category"),
        "n",
        F.lit(1).cast("long").alias("n_source_categories"),
    )
    other = tail.select(
        F.lit("OTHER").alias("category"),
        "n",
        F.col("n_source_categories").cast("long"),
    )
    return (
        kept.unionByName(other)
        .crossJoin(F.broadcast(total))
        .select(
            "category",
            "n",
            "n_source_categories",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), F.col("category").asc())
    )


def rare_category_collapse_sql() -> str:
    return f"""
WITH counts AS (
  SELECT l_partkey AS cat, COUNT(*) AS n FROM lineitem GROUP BY 1
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts),
top AS (SELECT cat, n FROM counts ORDER BY n DESC, cat ASC
        LIMIT {COLLAPSE_KEEP_K}),
tail AS (
  SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_source_categories
  FROM counts WHERE cat NOT IN (SELECT cat FROM top)
),
unioned AS (
  SELECT CAST(cat AS VARCHAR) AS category, CAST(n AS BIGINT) AS n,
         CAST(1 AS BIGINT) AS n_source_categories
  FROM top
  UNION ALL
  SELECT 'OTHER', n, n_source_categories FROM tail
)
SELECT category, n, n_source_categories,
       CAST(n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
FROM unioned, total t
ORDER BY n DESC, category ASC
"""


#: MRR cutoff rank.
MRR_K = 10


def mrr_at_k(orders: DataFrame) -> DataFrame:
    """Mean reciprocal rank @ K over the per-customer ranked lists
    (the ``ndcg_at_k`` retrieval framing: rank orders by price desc,
    relevant = finished status): per customer, RR = 1/rank of the
    FIRST relevant item within the top K (0 if none); the summary row
    reports the macro mean. MRR is THE first-relevant-hit metric for
    known-item search and QA retrieval — NDCG grades the whole list,
    MRR grades how fast the list gets to one right answer. STAGED
    round 9 for the round-10 driver window.

    Exactness: the first relevant rank is an integer MIN over a
    bounded window; each RR is ONE double division (1/r with r in
    1..K — exactly representable beyond even that); the mean is the
    SUM of RRs computed as an exact rational: sum over customers of
    (K! / r) in int64 divided by (n * K!) — both exact integers, one
    double division, order-free (no double accumulation at all).
    """
    # K!/r stays int64 for K = 10 (10! = 3628800)
    import math

    kfact = math.factorial(MRR_K)
    rel = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ranked = orders.select(
        "o_custkey", "o_totalprice", "o_orderkey", rel.alias("rel")
    ).withColumn("pos", F.row_number().over(w))
    first_hit = (
        ranked.filter((F.col("pos") <= MRR_K) & (F.col("rel") == 1))
        .groupBy("o_custkey")
        .agg(F.min("pos").alias("first_rel"))
    )
    per_cust = ranked.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    scored = per_cust.join(first_hit, "o_custkey", "left").select(
        "o_custkey",
        F.coalesce(
            (F.lit(kfact) / F.col("first_rel")).cast("long"), F.lit(0)
        ).alias("rr_scaled"),
        F.col("first_rel").isNotNull().cast("int").alias("hit"),
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum("hit").cast("long").alias("n_hit"),
        (
            F.sum("rr_scaled").cast("double")
            / (F.count(F.lit(1)) * F.lit(kfact)).cast("double")
        ).alias("mrr"),
    )


def mrr_at_k_sql() -> str:
    import math

    kfact = math.factorial(MRR_K)
    return f"""
WITH ranked AS (
  SELECT o_custkey,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS rel,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS pos
  FROM orders
),
first_hit AS (
  SELECT o_custkey, CAST(MIN(pos) AS BIGINT) AS first_rel
  FROM ranked WHERE pos <= {MRR_K} AND rel = 1
  GROUP BY o_custkey
),
per_cust AS (SELECT o_custkey FROM ranked GROUP BY o_custkey),
scored AS (
  SELECT p.o_custkey,
         COALESCE(CAST({kfact} / f.first_rel AS BIGINT), 0) AS rr_scaled,
         CASE WHEN f.first_rel IS NOT NULL THEN 1 ELSE 0 END AS hit
  FROM per_cust p LEFT JOIN first_hit f USING (o_custkey)
)
SELECT COUNT(*) AS n_queries,
       CAST(SUM(hit) AS BIGINT) AS n_hit,
       CAST(SUM(rr_scaled) AS DOUBLE)
         / CAST(COUNT(*) * {kfact} AS DOUBLE) AS mrr
FROM scored
"""


# --------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) — exact tie-corrected nonparametric test
# --------------------------------------------------------------------------

#: score-range bucket width (cents) for the two-level rank prefix sum.
MWU_BUCKET_CENTS = AUC_BUCKET_CENTS


def mann_whitney_u(orders: DataFrame) -> DataFrame:
    """Exact Mann-Whitney U / Wilcoxon rank-sum test between two
    groups — the nonparametric A/B readout for skewed metrics where
    ``ab_test_ztest``'s mean comparison misleads (revenue, latency):
    does the finished-order price distribution stochastically
    dominate the open-order one? STAGED round 10 for the round-11
    window.

    Groups: order status F vs O (P excluded); metric: exact price
    cents. All rank arithmetic is exact integers in DOUBLED units
    (a midrank is a half-integer, so 2*midrank is integer): per
    distinct value v with a = |A at v|, b = |B at v|, t = a + b and
    cum = #(observations < v),

        R_A2  = sum_v a * (2*cum + t + 1)      (twice A's rank sum)
        U_A2  = R_A2 - n_a * (n_a + 1)         (twice the U statistic)

    ``cum`` is assembled with the ``roc_auc`` two-level prefix sum
    (value rows window WITHIN fixed-width cent buckets; only bucket
    totals cross the tiny global window) — no single-partition sort
    at any scale. The doubled rank-sum accumulates as decimal(38,0)
    (n * max_rank exceeds int64 near ~3e9 rows). The tie-corrected
    normal approximation

        z = (U_A - n_a n_b / 2)
            / sqrt( n_a n_b / 12 * ((n+1) - sum_v(t^3 - t)/(n(n-1))) )

    has every ingredient an exact integer (sum(t^3 - t) in
    decimal(38,0)); both engines evaluate the identical final double
    expression, so the result is bit-equal. No p-value on purpose:
    the normal CDF needs erf(), which differs by ulps across libms
    (the engine's log/erf-free determinism convention) — consumers
    threshold |z| directly, as with ``ab_test_ztest``.
    """
    scored = orders.filter(F.col("o_orderstatus").isin("F", "O")).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("in_a"),
    )
    by_score = (
        scored.groupBy("score")
        .agg(
            F.sum("in_a").alias("a"),
            F.sum(1 - F.col("in_a")).alias("b"),
        )
        .withColumn("t", F.col("a") + F.col("b"))
        .withColumn("bucket", F.expr(f"score div {MWU_BUCKET_CENTS}"))
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = by_score.withColumn(
        "cum_in", F.coalesce(F.sum("t").over(w_in), F.lit(0))
    )
    bucket_tot = by_score.groupBy("bucket").agg(F.sum("t").alias("bt"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_cum = bucket_tot.select(
        "bucket", F.coalesce(F.sum("bt").over(w_b), F.lit(0)).alias("cum_b")
    )
    d38 = "decimal(38,0)"
    joined = within.join(F.broadcast(bucket_cum), "bucket")
    agg = joined.agg(
        F.sum("a").alias("n_a"),
        F.sum("b").alias("n_b"),
        F.sum(
            F.col("a").cast(d38)
            * (
                2 * (F.col("cum_b") + F.col("cum_in")) + F.col("t") + 1
            ).cast(d38)
        ).alias("ra2"),
        F.sum(
            (
                F.col("t").cast(d38) * F.col("t").cast(d38) * F.col("t").cast(d38)
                - F.col("t").cast(d38)
            )
        ).alias("tie3"),
    )
    n_a_d = F.col("n_a").cast("double")
    n_b_d = F.col("n_b").cast("double")
    n_d = (F.col("n_a") + F.col("n_b")).cast("double")
    u_a2 = F.col("ra2") - (F.col("n_a").cast(d38) * (F.col("n_a") + 1).cast(d38))
    var = (
        n_a_d
        * n_b_d
        / F.lit(12.0)
        * (
            (n_d + F.lit(1.0))
            - F.col("tie3").cast("double") / (n_d * (n_d - F.lit(1.0)))
        )
    )
    # zero-variance guard (every observation tied): NULL, not a
    # 0/0 whose NaN-vs-NULL surface differs between engines — the
    # _pearson_from_sums convention
    z = F.when(
        var > 0,
        (u_a2.cast("double") - n_a_d * n_b_d) / (F.lit(2.0) * F.sqrt(var)),
    )
    return agg.select(
        "n_a",
        "n_b",
        u_a2.cast("double").alias("u2_a"),
        z.alias("z"),
    )


def mann_whitney_u_sql() -> str:
    return f"""
WITH scored AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS score,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS in_a
  FROM orders WHERE o_orderstatus IN ('F', 'O')
),
by_score AS (
  SELECT score, CAST(SUM(in_a) AS BIGINT) AS a,
         CAST(SUM(1 - in_a) AS BIGINT) AS b,
         CAST(SUM(1) AS BIGINT) AS t,
         score // {MWU_BUCKET_CENTS} AS bucket
  FROM scored GROUP BY score
),
within AS (
  SELECT *, COALESCE(SUM(t) OVER (PARTITION BY bucket ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_in
  FROM by_score
),
bucket_cum AS (
  SELECT bucket, COALESCE(SUM(bt) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_b
  FROM (SELECT bucket, SUM(t) AS bt FROM by_score GROUP BY bucket)
),
agg AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b,
         SUM(CAST(a AS HUGEINT) * (2 * (cum_b + cum_in) + t + 1)) AS ra2,
         SUM(CAST(t AS HUGEINT) * t * t - t) AS tie3
  FROM within JOIN bucket_cum USING (bucket)
)
SELECT n_a, n_b,
       CAST(CAST(ra2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS VARCHAR)
            AS DOUBLE) AS u2_a,
       CASE WHEN CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12.0 AS DOUBLE)
           * ((CAST(n_a + n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
              - CAST(CAST(tie3 AS VARCHAR) AS DOUBLE)
                / (CAST(n_a + n_b AS DOUBLE)
                   * (CAST(n_a + n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)))) > 0 THEN
       (CAST(CAST(ra2 - CAST(n_a AS HUGEINT) * (n_a + 1) AS VARCHAR)
             AS DOUBLE)
        - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
       / (CAST(2.0 AS DOUBLE) * sqrt(
           CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12.0 AS DOUBLE)
           * ((CAST(n_a + n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
              - CAST(CAST(tie3 AS VARCHAR) AS DOUBLE)
                / (CAST(n_a + n_b AS DOUBLE)
                   * (CAST(n_a + n_b AS DOUBLE) - CAST(1.0 AS DOUBLE))))))
       END AS z
FROM agg
"""


# --------------------------------------------------------------------------
# grouped holdout split + leakage audit
# --------------------------------------------------------------------------

#: split modulus and train share: hash % 5 < 4 -> ~80/20.
GROUP_SPLIT_MOD = 5
GROUP_SPLIT_TRAIN = 4


def group_holdout_split(orders: DataFrame) -> DataFrame:
    """Grouped train/holdout split with a leakage audit — the
    ML-prep safeguard ``hash_split`` lacks: when rows of one entity
    (customer) land on BOTH sides of a split, the holdout leaks
    (the model memorizes the entity, eval overstates). The operator
    computes the SAME 80/20 deterministic md5 split two ways — keyed
    by customer (GroupShuffleSplit semantics) and keyed by order row
    — and reports, for each method, the split sizes and the number
    of customers with orders on both sides. The group-keyed method
    is leak-free BY CONSTRUCTION (every order inherits its
    customer's side); the row-keyed method's leaked-customer count
    is the measured cost of the naive split. STAGED round 10 for the
    round-11 window.

    Shape: one scan, per-customer min/max side flags (map-side
    combinable), two tiny 1-row summaries unioned — no joins, no
    windows. Hashes are the md5-first-8-hex convention, so the
    assignment is reproducible across engines and runs.
    """

    def bucket(prefix: str, col):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(prefix), col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long") % GROUP_SPLIT_MOD

    sides = orders.select(
        "o_custkey",
        (bucket("gh:", F.col("o_custkey")) < GROUP_SPLIT_TRAIN)
        .cast("int")
        .alias("grp_train"),
        (bucket("rh:", F.col("o_orderkey")) < GROUP_SPLIT_TRAIN)
        .cast("int")
        .alias("row_train"),
    )
    per_cust = sides.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("grp_train").alias("g_tr"),
        F.sum("row_train").alias("r_tr"),
    )

    def summary(method: str, tr_col: str):
        leaked = (
            (F.col(tr_col) > 0) & (F.col(tr_col) < F.col("n"))
        ).cast("long")
        return per_cust.agg(
            F.sum(tr_col).alias("n_train_rows"),
            (F.sum("n") - F.sum(tr_col)).alias("n_test_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(leaked).alias("n_leaked_groups"),
        ).select(
            F.lit(method).alias("split_method"),
            "n_train_rows",
            "n_test_rows",
            "n_groups",
            "n_leaked_groups",
            (
                F.col("n_leaked_groups").cast("double")
                / F.col("n_groups").cast("double")
            ).alias("leak_fraction"),
        )

    return summary("group", "g_tr").unionByName(
        summary("row", "r_tr")
    ).orderBy("split_method")


def group_holdout_split_sql() -> str:
    def bucket(prefix: str, col: str) -> str:
        return (
            f"CAST('0x' || substr(md5('{prefix}' || CAST({col} AS VARCHAR)),"
            f" 1, 8) AS BIGINT) % {GROUP_SPLIT_MOD}"
        )

    return f"""
WITH sides AS (
  SELECT o_custkey,
         CASE WHEN {bucket("gh:", "o_custkey")} < {GROUP_SPLIT_TRAIN}
              THEN 1 ELSE 0 END AS grp_train,
         CASE WHEN {bucket("rh:", "o_orderkey")} < {GROUP_SPLIT_TRAIN}
              THEN 1 ELSE 0 END AS row_train
  FROM orders
),
per_cust AS (
  SELECT o_custkey, COUNT(*) AS n,
         CAST(SUM(grp_train) AS BIGINT) AS g_tr,
         CAST(SUM(row_train) AS BIGINT) AS r_tr
  FROM sides GROUP BY o_custkey
),
s AS (
  SELECT 'group' AS split_method,
         CAST(SUM(g_tr) AS BIGINT) AS n_train_rows,
         CAST(SUM(n) - SUM(g_tr) AS BIGINT) AS n_test_rows,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CASE WHEN g_tr > 0 AND g_tr < n THEN 1 ELSE 0 END)
              AS BIGINT) AS n_leaked_groups
  FROM per_cust
  UNION ALL
  SELECT 'row',
         CAST(SUM(r_tr) AS BIGINT),
         CAST(SUM(n) - SUM(r_tr) AS BIGINT),
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN r_tr > 0 AND r_tr < n THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM per_cust
)
SELECT split_method, n_train_rows, n_test_rows, n_groups, n_leaked_groups,
       CAST(n_leaked_groups AS DOUBLE) / CAST(n_groups AS DOUBLE)
         AS leak_fraction
FROM s ORDER BY split_method
"""


# --------------------------------------------------------------------------
# Bradley-Terry preference strengths (MM iterations)
# --------------------------------------------------------------------------

#: item universe: the BT_TOP_N most frequent parts (bounds the
#: pairwise tables at N^2 regardless of corpus size).
BT_TOP_N = 30
#: fixed minorization-maximization iterations (deterministic depth).
BT_ITERS = 10


def bradley_terry_strength(lineitem: DataFrame) -> DataFrame:
    """Bradley-Terry preference strengths via the classic MM update
    (Hunter 2004) — THE pairwise-preference fitting primitive behind
    reward-model data curation, ranker evaluation, and match-outcome
    rating (the reference's own domain: SoccerPredictor rates teams
    from pairwise results; this is that estimator, engine-native):

        p_i <- W_i / sum_j ( n_ij / (p_i + p_j) ),  then rescale

    Preferences here: within every order, each part pair with
    unequal quantities is one comparison won by the larger quantity
    (ties skipped); the item universe is the ``BT_TOP_N`` most
    frequent parts, so every table after the one corpus scan is
    N- or N^2-bounded and the basket pair fan-out is
    basket-choose-2 (order-bounded), never corpus-quadratic.

    Determinism: the MM denominator and the rescale total are sums
    of DOUBLES, so both run as strict ORDERED folds (by opponent id
    / item id — Spark sorted-array ``aggregate``, DuckDB
    ``list_reduce`` over ``list(... ORDER BY ...)``); the iteration
    count is FIXED (no convergence witness needed — both engines run
    exactly ``BT_ITERS`` rounds). The rescale (mean strength = 1)
    pins the scale invariance of the likelihood. STAGED round 10
    for the round-11/12 windows.
    """
    from pyspark.sql import Window

    freq = (
        lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("n_rows").desc(), F.col("l_partkey").asc())
        .limit(BT_TOP_N)
        .select(F.col("l_partkey").alias("item"))
    )
    li = lineitem.join(
        F.broadcast(freq),
        lineitem.l_partkey == freq.item,
    ).select("l_orderkey", "item", "l_quantity")
    a = li.alias("a")
    b = li.alias("b")
    comps = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.item") < F.col("b.item"))
        .filter(F.col("a.l_quantity") != F.col("b.l_quantity"))
        .select(
            F.col("a.item").alias("i"),
            F.col("b.item").alias("j"),
            (F.col("a.l_quantity") > F.col("b.l_quantity"))
            .cast("long")
            .alias("win_i"),
        )
    )
    games = (
        comps.groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("win_i").alias("w_i"))
    )
    # symmetric direction table: (i, j, n_ij, wins of i over j)
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    sym = _reliable_checkpoint(
        games.select("i", "j", "n", F.col("w_i").alias("w")).unionByName(
            games.select(
                F.col("j").alias("i"),
                F.col("i").alias("j"),
                "n",
                (F.col("n") - F.col("w_i")).alias("w"),
            )
        )
    )
    wins = sym.groupBy("i").agg(
        F.sum("w").alias("w_total"), F.sum("n").alias("n_games")
    )
    strengths = wins.select("i", F.lit(1.0).alias("p"))
    for _ in range(BT_ITERS):
        pj = strengths.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        denom = (
            sym.join(F.broadcast(strengths), "i")
            .join(F.broadcast(pj), "j")
            .groupBy("i")
            .agg(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("j").alias("k"),
                                (
                                    F.col("n").cast("double")
                                    / (F.col("p") + F.col("p_j"))
                                ).alias("t"),
                            )
                        )
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["t"],
                ).alias("d")
            )
        )
        raw = wins.join(denom, "i").select(
            "i",
            (F.col("w_total").cast("double") / F.col("d")).alias("p_raw"),
        )
        total = raw.agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("i").alias("k"), F.col("p_raw"))
                    )
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["p_raw"],
            ).alias("tot"),
            F.count(F.lit(1)).alias("n_items"),
        )
        # per-round eager checkpoint: measured AGAINST batching two MM
        # rounds per checkpoint in r20 (paired interleaved A/B, sf0.1:
        # 1.18x SLOWER batched — the fused round's doubled
        # broadcast-build work costs more than the saved driver
        # round-trip), so the r19 shape stays.
        strengths = _reliable_checkpoint(
            raw.crossJoin(F.broadcast(total)).select(
                "i",
                (
                    F.col("p_raw")
                    * F.col("n_items").cast("double")
                    / F.col("tot")
                ).alias("p"),
            )
        )
    w_rank = Window.orderBy(
        F.col("strength").desc(), F.col("item").asc()
    )
    return (
        wins.join(strengths, "i")
        .select(
            F.col("i").alias("item"),
            "n_games",
            F.col("w_total").alias("n_wins"),
            F.col("p").alias("strength"),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .orderBy("rank")
    )


def bradley_terry_strength_sql() -> str:
    rounds = []
    prev = "s0"
    for t in range(BT_ITERS):
        # AS MATERIALIZED prevents exponential CTE inlining (each
        # round references its predecessor twice; the kcore oracle
        # exhausted file handles the same way)
        rounds.append(f"""
d{t} AS MATERIALIZED (
  SELECT g.i,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list(CAST(g.n AS DOUBLE) / (si.p + sj.p) ORDER BY g.j ASC)),
           (acc, x) -> acc + x) AS d
  FROM sym g JOIN {prev} si ON g.i = si.i JOIN {prev} sj ON g.j = sj.i
  GROUP BY g.i
),
raw{t} AS MATERIALIZED (
  SELECT w.i, CAST(w.w_total AS DOUBLE) / d{t}.d AS p_raw
  FROM wins w JOIN d{t} ON w.i = d{t}.i
),
tot{t} AS MATERIALIZED (
  SELECT list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE), list(p_raw ORDER BY i ASC)),
           (acc, x) -> acc + x) AS tot,
         COUNT(*) AS n_items
  FROM raw{t}
),
s{t + 1} AS MATERIALIZED (
  SELECT r.i, r.p_raw * CAST(t.n_items AS DOUBLE) / t.tot AS p
  FROM raw{t} r, tot{t} t
)""")
        prev = f"s{t + 1}"
    body = ",".join(rounds)
    return f"""
WITH freq AS (
  SELECT l_partkey AS item FROM lineitem
  GROUP BY l_partkey ORDER BY COUNT(*) DESC, l_partkey ASC LIMIT {BT_TOP_N}
),
li AS (
  SELECT l.l_orderkey, l.l_partkey AS item, l.l_quantity
  FROM lineitem l SEMI JOIN freq f ON l.l_partkey = f.item
),
comps AS (
  SELECT a.item AS i, b.item AS j,
         CASE WHEN a.l_quantity > b.l_quantity THEN 1 ELSE 0 END AS win_i
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.item < b.item AND a.l_quantity != b.l_quantity
),
games AS (
  SELECT i, j, COUNT(*) AS n, CAST(SUM(win_i) AS BIGINT) AS w_i
  FROM comps GROUP BY i, j
),
sym AS MATERIALIZED (
  SELECT i, j, n, w_i AS w FROM games
  UNION ALL
  SELECT j AS i, i AS j, n, n - w_i AS w FROM games
),
wins AS MATERIALIZED (
  SELECT i, CAST(SUM(w) AS BIGINT) AS w_total,
         CAST(SUM(n) AS BIGINT) AS n_games
  FROM sym GROUP BY i
),
s0 AS MATERIALIZED (SELECT i, CAST(1.0 AS DOUBLE) AS p FROM wins),{body}
SELECT item, n_games, n_wins, strength,
       CAST(ROW_NUMBER() OVER (ORDER BY strength DESC, item ASC) AS BIGINT)
         AS rank
FROM (
  SELECT w.i AS item, w.n_games, w.w_total AS n_wins, s.p AS strength
  FROM wins w JOIN {prev} s ON w.i = s.i
)
ORDER BY rank
"""


# --------------------------------------------------------------------------
# expected calibration error (one-row summary over the reliability bins)
# --------------------------------------------------------------------------


def calibration_ece(orders: DataFrame) -> DataFrame:
    """Expected Calibration Error summary — the one-number readouts
    every reliability diagram collapses to (Guo et al. 2017):
    ECE = sum_b (n_b / N) * |mean_score_b - pos_rate_b| over the
    ``calibration_bins`` bins, MCE = the max bin gap, plus the Brier
    score as the proper-scoring cross-check (a model can have low
    ECE by predicting the base rate; Brier catches that).

    Exactness: the bin table is bins-bounded (10 rows), so ECE sums
    via the ordered fold over bins; Brier expands to
    (S2/K^2 - 2*SY/K + Y)/N with S2 = sum(cents^2), SY =
    sum(cents*y), Y = sum(y) all exact decimal(38,0)/int64 sums —
    the whole statistic is ONE double expression of exact integers
    (no per-row double accumulation anywhere). One scan, one 10-key
    aggregation + one global aggregation. STAGED round 10.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bin_w_cents = int(CALIB_BIN_WIDTH * 100)
    b = F.least(
        (cents / F.lit(bin_w_cents)).cast("long"), F.lit(CALIB_N_BINS - 1)
    )
    label = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    d38 = "decimal(38,0)"
    rows = orders.select(
        b.alias("bin"), cents.alias("c"), label.alias("y")
    )
    per = rows.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum(F.col("c").cast(d38)).alias("sc"),
    )
    k = F.lit(100.0 * CALIB_SCALE)
    gap_term = (
        F.abs(
            F.col("sc").cast("double") / F.col("n").cast("double") / k
            - F.col("n_pos").cast("double") / F.col("n").cast("double")
        )
        * F.col("n").cast("double")
    )
    folded = per.agg(
        F.sum("n").alias("n_total"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("bin").alias("k"), gap_term.alias("g"))
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["g"],
        ).alias("ece_num"),
        F.max(
            F.abs(
                F.col("sc").cast("double") / F.col("n").cast("double") / k
                - F.col("n_pos").cast("double") / F.col("n").cast("double")
            )
        ).alias("mce"),
    )
    tot = rows.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum(F.col("c").cast(d38) * F.col("c").cast(d38)).alias("s2"),
        F.sum(F.col("c").cast(d38) * F.col("y").cast(d38)).alias("sy"),
        F.sum("y").alias("ypos"),
    )
    brier = (
        F.col("s2").cast("double") / (k * k)
        - F.lit(2.0) * F.col("sy").cast("double") / k
        + F.col("ypos").cast("double")
    ) / F.col("nn").cast("double")
    return folded.crossJoin(F.broadcast(tot)).select(
        F.col("n_total").alias("n"),
        (F.col("ece_num") / F.col("n_total").cast("double")).alias("ece"),
        "mce",
        brier.alias("brier"),
    )


def calibration_ece_sql() -> str:
    bin_w_cents = int(CALIB_BIN_WIDTH * 100)
    k = f"CAST({100.0 * CALIB_SCALE!r} AS DOUBLE)"
    gap = (
        "abs(CAST(CAST(sc AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)"
        f" / {k} - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return f"""
WITH rows_r AS (
  SELECT LEAST(CAST(round(o_totalprice * 100) AS BIGINT) // {bin_w_cents},
               {CALIB_N_BINS - 1}) AS bin,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders
),
per AS (
  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
         SUM(CAST(c AS HUGEINT)) AS sc
  FROM rows_r GROUP BY bin
),
folded AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
             list({gap} * CAST(n AS DOUBLE) ORDER BY bin ASC)),
           (acc, x) -> acc + x) AS ece_num,
         MAX({gap}) AS mce
  FROM per
),
tot AS (
  SELECT COUNT(*) AS nn,
         SUM(CAST(c AS HUGEINT) * c) AS s2,
         SUM(CAST(c AS HUGEINT) * y) AS sy,
         CAST(SUM(y) AS BIGINT) AS ypos
  FROM rows_r
)
SELECT n_total AS n,
       ece_num / CAST(n_total AS DOUBLE) AS ece,
       mce,
       (CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / ({k} * {k})
        - CAST(2.0 AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE) / {k}
        + CAST(ypos AS DOUBLE)) / CAST(nn AS DOUBLE) AS brier
FROM folded, tot
"""


# --------------------------------------------------------------------------
# stratified k-fold assignment (exact balance by construction)
# --------------------------------------------------------------------------

#: stratified fold count (matches KFOLD_K's readout shape).
SKFOLD_K = 5


def stratified_kfold(orders: DataFrame) -> DataFrame:
    """Stratified k-fold assignment — the guarantee ``kfold_assign``
    only AUDITS: every label's rows spread across the K folds with
    sizes differing by AT MOST ONE (fold = within-label rank mod K),
    so minority-class folds can never starve, however unlucky the
    hash. Rows order within their label by the md5 of the key
    (pseudo-random but deterministic and rerun-stable), so fold
    membership is still effectively random per label — the
    scikit-learn StratifiedKFold contract, engine-native.

    The within-label rank is the two-level bucketed pattern (never a
    per-label single-partition sort): md5-hash range buckets, within-
    (label, bucket) row_number, tiny per-label cumulative bucket
    offsets. Output is the (fold, label) count table plus each
    cell's deviation from the exact per-label fold floor — all zeros
    and ones BY CONSTRUCTION (the property the plain hash split
    cannot promise). STAGED round 10.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("skf:"), F.col("o_orderkey").cast("string"))),
            1, 8,
        ),
        16,
        10,
    ).cast("long")
    bucket_w = (1 << 32) // 4096 + 1
    rows = orders.select(
        F.col("o_orderstatus").alias("label"),
        h.alias("h"),
        F.col("o_orderkey").alias("k"),
    ).withColumn("bk", F.expr(f"h div {bucket_w}"))
    w_in = Window.partitionBy("label", "bk").orderBy(
        F.col("h").asc(), F.col("k").asc()
    )
    counts = rows.groupBy("label", "bk").agg(F.count(F.lit(1)).alias("bc"))
    w_off = (
        Window.partitionBy("label")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "label",
        "bk",
        F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off"),
    )
    ranked = (
        rows.withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), ["label", "bk"])
        .select(
            "label",
            ((F.col("off") + F.col("rn") - 1) % SKFOLD_K).alias("fold"),
        )
    )
    per = ranked.groupBy("fold", "label").agg(F.count(F.lit(1)).alias("n"))
    tot = per.groupBy("label").agg(F.sum("n").alias("n_label"))
    return (
        per.join(F.broadcast(tot), "label")
        .select(
            "fold",
            "label",
            "n",
            (F.col("n") - F.expr(f"n_label div {SKFOLD_K}")).alias(
                "over_floor"
            ),
        )
        .orderBy("fold", "label")
    )


def stratified_kfold_sql() -> str:
    bucket_w = (1 << 32) // 4096 + 1
    return f"""
WITH rows_r AS (
  SELECT o_orderstatus AS label,
         CAST('0x' || substr(md5('skf:' || CAST(o_orderkey AS VARCHAR)),
              1, 8) AS BIGINT) AS h,
         o_orderkey AS k
  FROM orders
),
bucketed AS (SELECT *, h // {bucket_w} AS bk FROM rows_r),
offsets AS (
  SELECT label, bk,
         COALESCE(SUM(bc) OVER (PARTITION BY label ORDER BY bk
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM (SELECT label, bk, COUNT(*) AS bc FROM bucketed GROUP BY label, bk)
),
ranked AS (
  SELECT b.label,
         CAST((o.off + ROW_NUMBER() OVER (PARTITION BY b.label, b.bk
            ORDER BY b.h ASC, b.k ASC) - 1) % {SKFOLD_K} AS BIGINT) AS fold
  FROM bucketed b JOIN offsets o ON b.label = o.label AND b.bk = o.bk
),
per AS (SELECT fold, label, COUNT(*) AS n FROM ranked GROUP BY fold, label),
tot AS (SELECT label, CAST(SUM(n) AS BIGINT) AS n_label FROM per
        GROUP BY label)
SELECT p.fold, p.label, p.n,
       CAST(p.n - t.n_label // {SKFOLD_K} AS BIGINT) AS over_floor
FROM per p JOIN tot t USING (label)
ORDER BY p.fold, p.label
"""


# --------------------------------------------------------------------------
# Matthews correlation coefficient of the fixed-threshold stump
# --------------------------------------------------------------------------

#: fixed stump threshold (price cents): predict urgent iff
#: o_totalprice <= this. Deliberately NOT the decision_stump argmax —
#: MCC here scores a FIXED deployed rule, the way a production gate
#: is monitored after the split was frozen at training time.
MCC_SPLIT_CENTS = 15_000_000


def matthews_corr(orders: DataFrame) -> DataFrame:
    """Matthews correlation coefficient of the frozen price-threshold
    stump (predict urgent iff price <= t) against the urgent label —
    the single-number confusion summary that stays honest under
    class imbalance (accuracy and even F1 flatter a majority-class
    guesser; MCC is the full fourfold-table correlation):

        MCC = (TP*TN - FP*FN)
              / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)).

    One conditional aggregation pass produces the four exact integer
    cells (map-side combinable — four int64 sums); products
    accumulate as decimal(38,0) (the 4-marginal product is N^4-scale
    and overflows int64 past ~55k rows) and MCC is one double
    expression over their exactly-cast values — sqrt is
    IEEE-correctly-rounded in both engines (the ``temperature_mix``
    determinism note), so the audit row hash-matches. A zero
    marginal makes MCC undefined -> NULL (the ``feature_corr``
    zero-denominator convention).
    """
    label = (F.col("o_orderpriority") == "1-URGENT").cast("long")
    pred = (
        F.round(F.col("o_totalprice") * 100).cast("long")
        <= MCC_SPLIT_CENTS
    ).cast("long")
    cells = orders.select(label.alias("y"), pred.alias("p")).agg(
        F.sum(F.col("y") * F.col("p")).alias("tp"),
        F.sum((F.lit(1) - F.col("y")) * F.col("p")).alias("fp"),
        F.sum(F.col("y") * (F.lit(1) - F.col("p"))).alias("fn"),
        F.sum((F.lit(1) - F.col("y")) * (F.lit(1) - F.col("p"))).alias("tn"),
    )
    d38 = "decimal(38,0)"

    def d(c):
        return F.col(c).cast(d38)

    num = (d("tp") * d("tn") - d("fp") * d("fn")).cast("double")
    den2 = (
        (d("tp") + d("fp")) * (d("tp") + d("fn"))
        * (d("tn") + d("fp")) * (d("tn") + d("fn"))
    ).cast("double")
    n = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    acc = (F.col("tp") + F.col("tn")).cast("double") / n.cast("double")
    return cells.select(
        "tp", "fp", "fn", "tn",
        n.alias("n_rows"),
        acc.alias("accuracy"),
        F.when(den2 > 0, num / F.sqrt(den2)).alias("mcc"),
    )


def matthews_corr_sql() -> str:
    hug = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    num = hug.format(x="CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn")
    den2 = hug.format(
        x="(CAST(tp AS HUGEINT) + fp) * (CAST(tp AS HUGEINT) + fn)"
        " * (CAST(tn AS HUGEINT) + fp) * (CAST(tn AS HUGEINT) + fn)"
    )
    return f"""
WITH flagged AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
         CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT)
                   <= {MCC_SPLIT_CENTS} THEN 1 ELSE 0 END AS p
  FROM orders
),
cells AS (
  SELECT CAST(SUM(y * p) AS BIGINT) AS tp,
         CAST(SUM((1 - y) * p) AS BIGINT) AS fp,
         CAST(SUM(y * (1 - p)) AS BIGINT) AS fn,
         CAST(SUM((1 - y) * (1 - p)) AS BIGINT) AS tn
  FROM flagged
)
SELECT tp, fp, fn, tn,
       CAST(tp + fp + fn + tn AS BIGINT) AS n_rows,
       CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE)
         AS accuracy,
       CASE WHEN {den2} > 0 THEN {num} / sqrt({den2}) END AS mcc
FROM cells
"""


# --------------------------------------------------------------------------
# weighted median (two-level bucketed weighted rank)
# --------------------------------------------------------------------------

#: bucket width (price cents) for the two-level weighted prefix sum.
WMED_BUCKET_CENTS = 10_000_000


def weighted_median(lineitem: DataFrame) -> DataFrame:
    """Exact weighted median of the unit price per return flag,
    weighted by quantity — "the price of the median UNIT shipped",
    the robust per-unit price statistic an unweighted median of line
    rows gets wrong whenever quantity correlates with price. Lower
    weighted median, discretely defined: the smallest price p with
    2 * cumweight(<= p) >= total_weight — all comparisons exact
    integers (price as int64 cents, quantity as int64 units), so
    both engines select the identical row.

    Scale shape: the same two-level bucketed prefix sum as
    ``roc_auc``/``decision_stump`` — per-(flag, price) weights group
    once (map-side combinable), the within-bucket running sum
    windows over bucket-bounded partitions, bucket offsets cumulate
    over the tiny bucket table, and the winner per flag is a
    distributed min — never a per-flag global row sort (a
    single-partition Window.orderBy is the scale bug the repo's
    bucketed-rank convention exists to avoid). The (flag, price)
    table is checkpointed: within-sums, bucket totals, and flag
    totals are three lazy consumers of one corpus scan.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    by_val = _reliable_checkpoint(
        lineitem.select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias(
                "cents"
            ),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("flag", "cents")
        .agg(F.sum("q").alias("w"))
        .withColumn("bucket", F.expr(f"cents div {WMED_BUCKET_CENTS}"))
    )
    w_in = (
        Window.partitionBy("flag", "bucket")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = by_val.withColumn("w_in", F.sum("w").over(w_in))
    w_b = (
        Window.partitionBy("flag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_cum = (
        by_val.groupBy("flag", "bucket")
        .agg(F.sum("w").alias("bw"))
        .select(
            "flag",
            "bucket",
            F.coalesce(F.sum("bw").over(w_b), F.lit(0)).alias("w_below"),
        )
    )
    totals = by_val.groupBy("flag").agg(F.sum("w").alias("tw"))
    cum = (
        within.join(bucket_cum, ["flag", "bucket"])
        .join(F.broadcast(totals), "flag")
        .select(
            "flag",
            "cents",
            (F.col("w_below") + F.col("w_in")).alias("cw"),
            "tw",
        )
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.min("cents").alias("median_cents"),
            F.max("tw").alias("total_weight"),
        )
        .select(
            "flag",
            "total_weight",
            "median_cents",
            (F.col("median_cents").cast("double") / F.lit(100.0)).alias(
                "median_price"
            ),
        )
        .orderBy("flag")
    )


def weighted_median_sql() -> str:
    return """
WITH by_val AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, cents,
         SUM(w) OVER (PARTITION BY flag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY flag) AS tw
  FROM by_val
)
SELECT flag, CAST(MAX(tw) AS BIGINT) AS total_weight,
       CAST(MIN(cents) AS BIGINT) AS median_cents,
       CAST(MIN(cents) AS DOUBLE) / 100.0 AS median_price
FROM cum WHERE 2 * cw >= tw
GROUP BY flag ORDER BY flag
"""


# --------------------------------------------------------------------------
# temporal leakage audit (time-split entity overlap)
# --------------------------------------------------------------------------


def temporal_leakage_audit(events: DataFrame) -> DataFrame:
    """Entity leakage across a TIME-based train/test split: split the
    stream at the exact midpoint of its observed range and measure
    what fraction of test-period users also appear in the train
    period — the number that decides between a plain temporal split
    (fine for forecasting the same population) and a group-holdout
    split (required when the model must generalize to UNSEEN
    entities; ``group_holdout_split`` is the remedy this audit
    prescribes).

    One keyed pass: per-user early/late membership flags aggregate
    once (map-side combinable maxes), the 1-row summary reads the
    tiny flag table. The midpoint is exact integer micros with the
    ``topk_churn`` floor convention (a bare double->BIGINT cast
    truncates in Spark but ROUNDS in DuckDB). Counts exact; the
    leak rate is one guarded double division.
    """
    span = events.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    )
    mid = F.col("lo") + F.floor(
        (F.col("hi") - F.col("lo")) / F.lit(2)
    ).cast("long")
    flags = (
        events.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            (F.unix_micros("ts") <= mid).cast("int").alias("early"),
        )
        .groupBy("user_id")
        .agg(
            F.max("early").alias("in_train"),
            F.max(F.lit(1) - F.col("early")).alias("in_test"),
        )
    )
    leak = F.sum(
        ((F.col("in_train") == 1) & (F.col("in_test") == 1)).cast("long")
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("in_train").alias("n_train_users"),
        F.sum("in_test").alias("n_test_users"),
        leak.alias("n_leaked"),
    ).select(
        "n_users",
        "n_train_users",
        "n_test_users",
        "n_leaked",
        F.when(
            F.col("n_test_users") > 0,
            F.col("n_leaked").cast("double")
            / F.col("n_test_users").cast("double"),
        ).alias("leak_rate"),
    )


def temporal_leakage_audit_sql() -> str:
    return """
WITH span AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
flags AS (
  SELECT user_id,
         MAX(CASE WHEN epoch_us(ts)
                       <= lo + CAST(floor((hi - lo) / 2) AS BIGINT)
                  THEN 1 ELSE 0 END) AS in_train,
         MAX(CASE WHEN epoch_us(ts)
                       <= lo + CAST(floor((hi - lo) / 2) AS BIGINT)
                  THEN 0 ELSE 1 END) AS in_test
  FROM events CROSS JOIN span
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(in_train) AS BIGINT) AS n_train_users,
       CAST(SUM(in_test) AS BIGINT) AS n_test_users,
       CAST(SUM(CASE WHEN in_train = 1 AND in_test = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked,
       CASE WHEN SUM(in_test) > 0
            THEN CAST(SUM(CASE WHEN in_train = 1 AND in_test = 1
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(in_test) AS DOUBLE) END AS leak_rate
FROM flags
"""


# --------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

#: quintile count for each RFM dimension (5x5x5 = 125 max segments).
RFM_Q = 5


def rfm_quintiles(orders: DataFrame) -> DataFrame:
    """RFM customer segmentation — recency/frequency/monetary QUINTILE
    codes, the classic value-segmentation grid (and a standard
    engineered-feature triple for churn/LTV models). Named
    ``rfm_quintiles`` to distinguish it from the registered
    quartile-grain ``operators/windows.py::rfm_segments``. Per customer:
    R = last order time, F = order count, M = exact lifetime cents;
    each coded 1-5 by its own exact quintile edges (5 = most recent /
    most frequent / highest spend). Output is the segment grid:
    (r_q, f_q, m_q, n_customers, monetary_cents), ordered.

    Scale & determinism (the ``quantile_bins`` pattern, applied three
    ways): ONE orders aggregation builds the customer-grain table
    (map-side combinable); the 12 quintile edges are percentile_disc
    SELECTIONS over that table in one aggregation (actual data
    values, no interpolation — ties land in the lower quintile in
    both engines); the 1-row edge vector broadcasts back and each
    code is a pure comparison count. Recency compares exact integer
    epoch-DAYS (datediff vs DATE '1970-01-01', the ols_trend /
    scd2 idiom — o_orderdate is TIMESTAMP_NTZ, which unix_micros
    rejects, and day grain is RFM's natural unit anyway). No global
    sort, no ntile window at any scale.
    """
    from functools import reduce

    per_cust = orders.groupBy("o_custkey").agg(
        F.max(
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).cast("long")
        ).alias("r_day"),
        F.count(F.lit(1)).alias("f_n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("m_cents"),
    )
    qs = [i / RFM_Q for i in range(1, RFM_Q)]
    edges = per_cust.agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})").alias(
                f"{dim}{i}"
            )
            for dim, col in (("r", "r_day"), ("f", "f_n"), ("m", "m_cents"))
            for i, q in enumerate(qs, start=1)
        ]
    )

    def code(dim: str, col: str):
        return reduce(
            lambda acc, i: acc
            + F.when(F.col(col) > F.col(f"{dim}{i}"), 1).otherwise(0),
            range(2, RFM_Q),
            F.lit(1) + F.when(F.col(col) > F.col(f"{dim}1"), 1).otherwise(0),
        ).cast("int")

    coded = per_cust.crossJoin(F.broadcast(edges)).select(
        code("r", "r_day").alias("r_q"),
        code("f", "f_n").alias("f_q"),
        code("m", "m_cents").alias("m_q"),
        "m_cents",
    )
    return (
        coded.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("m_cents").alias("monetary_cents"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


def rfm_quintiles_sql() -> str:
    qs = [i / RFM_Q for i in range(1, RFM_Q)]
    edge_cols = ", ".join(
        f"quantile_disc({col}, {q}) AS {dim}{i}"
        for dim, col in (("r", "r_day"), ("f", "f_n"), ("m", "m_cents"))
        for i, q in enumerate(qs, start=1)
    )

    def code(dim: str, col: str) -> str:
        cases = " + ".join(
            f"CASE WHEN {col} > {dim}{i} THEN 1 ELSE 0 END"
            for i in range(1, RFM_Q)
        )
        return f"CAST(1 + {cases} AS INTEGER)"

    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT)) AS r_day,
         COUNT(*) AS f_n,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS m_cents
  FROM orders GROUP BY o_custkey
),
edges AS (SELECT {edge_cols} FROM per_cust),
coded AS (
  SELECT {code("r", "r_day")} AS r_q,
         {code("f", "f_n")} AS f_q,
         {code("m", "m_cents")} AS m_q,
         m_cents
  FROM per_cust CROSS JOIN edges
)
SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
       CAST(SUM(m_cents) AS BIGINT) AS monetary_cents
FROM coded
GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
"""
