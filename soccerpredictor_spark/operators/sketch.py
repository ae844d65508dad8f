"""Probabilistic-sketch operators: Bloom-filter join pruning and
count-min-sketch heavy hitters.

The sketch family a 100 TB pipeline needs around its joins and
top-k estimates: a Bloom filter culls a fact-table probe before the
real (shuffling) join touches it — the same idea as Spark's runtime
row-level bloom pruning (`spark.sql.optimizer.runtime.bloomFilter`),
surfaced here as an explicit, measurable operator; a count-min sketch
replaces an unbounded per-key count with a fixed d x w counter grid
whose cells are decomposable integer sums (map-side combinable, so
the shuffle carries O(d*w) rows per partition regardless of input
rows).

The reference engine has no sketch surface; these generalize its
exact IN-list membership filter (``SoccerPredictor/DAO/ImpalaCon.py:
33-62``) and exact top-K count (``XGBoost/Predictor.py:210-225``) to
the approximate, fixed-memory forms used at scale.

Cross-engine determinism: all hash functions are md5-derived (first 8
hex digits -> int64 -> mod), the repo-wide engine-portable convention
(see ``mlprep.feature_hashing``); the hash-function index rides
INSIDE the md5 input string ('bloom{i}:', 'cms{j}:'), so both engines
evaluate one generic expression over a tiny cross-joined index table
instead of hand-unrolled per-index columns. Every aggregate is an
integer sum/count/min; the only doubles are final single divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Bloom filter size in bits. Deliberately small relative to the build
#: set so the false-positive rate is non-degenerate and measurable at
#: test scale; a production filter sizes m ~ 10 bits/key for ~1% fp.
#: m is the ONLY memory the filter occupies regardless of build size.
BLOOM_BITS = 4096
#: number of Bloom hash functions.
BLOOM_HASHES = 3

#: count-min sketch depth (independent hash rows).
CMS_DEPTH = 4
#: count-min sketch width (counters per row).
CMS_WIDTH = 256
#: heavy hitters reported (by exact count, for the estimate audit).
CMS_TOPK = 20


def _hash_mod(prefix_col, key_col, m: int):
    """md5(prefix || ':' || key) first 8 hex digits as int64, mod m —
    the engine-portable keyed hash. ``prefix_col`` carries the hash-
    function index so one expression serves all k functions."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(prefix_col, F.lit(":"), key_col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % m
    )


def _sql_hash_mod(prefix_expr: str, key_expr: str, m: int) -> str:
    return (
        f"CAST('0x' || substr(md5({prefix_expr} || ':' ||"
        f" CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT) % {m}"
    )


def _index_df(spark_df: DataFrame, n: int, name: str) -> DataFrame:
    """A tiny n-row hash-function index table (0..n-1) from the input
    frame's own session (``spark.range``), broadcast by the callers so
    the k-way fan-out is a broadcast nested-loop over n rows — never a
    shuffle."""
    return spark_df.sparkSession.range(n).select(F.col("id").cast("int").alias(name))


def bloom_probe(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Bloom-filter membership pruning, audited: build a 4096-bit /
    3-hash filter over the urgent-order customer keys, probe every
    customer through it, and report the confusion summary (passes,
    true members, false positives, fp rate) in one row.

    Plan shape: the filter IS a DataFrame of distinct set bit
    positions — at most ``BLOOM_BITS`` rows however large the build
    set — so the probe is a broadcast join against an m-bounded side,
    never a shuffle of the probe table; a probe row passes iff all k
    of its positions hit. This is exactly how a bloom-pruned join
    culls a 100 TB probe side before the real join shuffles it: the
    filter rides the scan as a broadcast, and only passing rows
    (members + the bounded fp fraction) reach the exchange.

    No false negatives by construction (every member's positions are
    all set), so every PROBED member passes (n_true_pass ==
    n_member_probed) and fp_rate — false passes over non-member
    probes — is the quality metric. ``n_build`` is the true build-set
    size, counted independently of the probe side, so build keys
    absent from the probe table (FK orphans) are visible as
    n_member_probed < n_build instead of silently vanishing.

    The truth-side audit join (key-level, build-sized) exists only for
    the confusion summary — like heavy_hitters_cms's exact counts, at
    production scale the filter replaces the truth table and only the
    broadcast bit-position join remains; the audit join carries no
    broadcast hint, so the optimizer is free to shuffle it when the
    build side outgrows the threshold. Generalizes the reference's
    exact IN-list membership (``DAO/ImpalaCon.py:33-62``) to fixed
    memory.
    """
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    idx = _index_df(orders, BLOOM_HASHES, "i")
    prefix = F.concat(F.lit("bloom"), F.col("i").cast("string"))
    # the filter: distinct set bit positions (<= BLOOM_BITS rows).
    bits = (
        build.crossJoin(F.broadcast(idx))
        .select(_hash_mod(prefix, F.col("k"), BLOOM_BITS).alias("pos"))
        .distinct()
    )
    probe = customer.select(F.col("c_custkey").alias("k")).distinct()
    ppos = probe.crossJoin(F.broadcast(idx)).select(
        "k", _hash_mod(prefix, F.col("k"), BLOOM_BITS).alias("pos")
    )
    hits = (
        ppos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .withColumn("passes", (F.col("n_hits") == BLOOM_HASHES).cast("long"))
    )
    truth = build.withColumn("is_member", F.lit(1))
    audited = hits.join(truth, "k", "left").select(
        "passes",
        F.coalesce(F.col("is_member"), F.lit(0)).cast("long").alias("is_member"),
    )
    n_build = build.agg(F.count(F.lit(1)).alias("n_build"))
    return (
        audited.agg(
            F.sum("is_member").alias("n_member_probed"),
            F.count(F.lit(1)).alias("n_probe"),
            F.sum("passes").alias("n_pass"),
            F.sum(F.col("passes") * F.col("is_member")).alias("n_true_pass"),
            F.sum(F.col("passes") * (1 - F.col("is_member"))).alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_build))
        .select(
            "n_build",
            "n_member_probed",
            "n_probe",
            "n_pass",
            "n_true_pass",
            "n_false_pos",
            F.when(
                (F.col("n_probe") - F.col("n_member_probed")) > 0,
                F.col("n_false_pos").cast("double")
                / (F.col("n_probe") - F.col("n_member_probed")).cast("double"),
            ).alias("fp_rate"),
        )
    )


def bloom_probe_sql() -> str:
    pos = _sql_hash_mod("'bloom' || CAST(i AS VARCHAR)", "k", BLOOM_BITS)
    return f"""
WITH idx AS (SELECT unnest(range({BLOOM_HASHES})) AS i),
build AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE o_orderpriority = '1-URGENT'
),
bits AS (
  SELECT DISTINCT {pos} AS pos FROM build CROSS JOIN idx
),
probe AS (SELECT DISTINCT c_custkey AS k FROM customer),
ppos AS (
  SELECT k, {pos} AS pos FROM probe CROSS JOIN idx
),
hits AS (
  SELECT p.k,
         CAST(SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hits
  FROM ppos p LEFT JOIN bits b USING (pos)
  GROUP BY p.k
),
audited AS (
  SELECT CASE WHEN h.n_hits = {BLOOM_HASHES} THEN 1 ELSE 0 END AS passes,
         CASE WHEN bu.k IS NOT NULL THEN 1 ELSE 0 END AS is_member
  FROM hits h LEFT JOIN build bu USING (k)
)
SELECT (SELECT COUNT(*) FROM build) AS n_build,
       CAST(SUM(is_member) AS BIGINT) AS n_member_probed,
       COUNT(*) AS n_probe,
       CAST(SUM(passes) AS BIGINT) AS n_pass,
       CAST(SUM(passes * is_member) AS BIGINT) AS n_true_pass,
       CAST(SUM(passes * (1 - is_member)) AS BIGINT) AS n_false_pos,
       CASE WHEN COUNT(*) - SUM(is_member) > 0
            THEN CAST(SUM(passes * (1 - is_member)) AS DOUBLE)
                 / CAST(COUNT(*) - SUM(is_member) AS DOUBLE)
       END AS fp_rate
FROM audited
"""


def heavy_hitters_cms(events: DataFrame) -> DataFrame:
    """Count-min-sketch heavy hitters, audited against exact counts:
    estimate each user's event count from a ``CMS_DEPTH`` x
    ``CMS_WIDTH`` counter grid and report the top-``CMS_TOPK`` users
    by exact count with (exact, estimate, overcount). CMS guarantees
    est >= exact (overcount only), which the audit columns surface.

    Scale: each grid cell is sum(count) over the keys hashing to it —
    a decomposable integer aggregate, so at 100 TB the sketch is
    built with map-side partial aggregation and the shuffle carries
    at most d*w rows per partition, NOT the key cardinality. The
    probe side joins the (d*w)-row grid broadcast. Exact counts here
    exist only for the audit; in production the sketch replaces them.
    Building from per-key counts (a key-sized table) is arithmetically
    identical to streaming raw rows through the grid.
    """
    exact = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    idx = _index_df(events, CMS_DEPTH, "j")
    prefix = F.concat(F.lit("cms"), F.col("j").cast("string"))
    exploded = exact.crossJoin(F.broadcast(idx)).select(
        "k",
        "exact_cnt",
        "j",
        _hash_mod(prefix, F.col("k"), CMS_WIDTH).alias("cell"),
    )
    cells = exploded.groupBy("j", "cell").agg(F.sum("exact_cnt").alias("cell_cnt"))
    est = (
        exploded.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
    return (
        est.select(
            F.col("k").alias("user_id"),
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(CMS_TOPK)
    )


def heavy_hitters_cms_sql() -> str:
    cell = _sql_hash_mod("'cms' || CAST(j AS VARCHAR)", "k", CMS_WIDTH)
    return f"""
WITH idx AS (SELECT unnest(range({CMS_DEPTH})) AS j),
exact AS (
  SELECT user_id AS k, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
),
exploded AS (
  SELECT k, exact_cnt, j, {cell} AS cell FROM exact CROSS JOIN idx
),
cells AS (
  SELECT j, cell, CAST(SUM(exact_cnt) AS BIGINT) AS cell_cnt
  FROM exploded GROUP BY j, cell
),
est AS (
  SELECT e.k, e.exact_cnt, MIN(c.cell_cnt) AS cms_est
  FROM exploded e JOIN cells c USING (j, cell)
  GROUP BY e.k, e.exact_cnt
)
SELECT k AS user_id, exact_cnt, cms_est,
       cms_est - exact_cnt AS overcount
FROM est
ORDER BY exact_cnt DESC, user_id ASC
LIMIT {CMS_TOPK}
"""


# --------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (exact-integer registers)
# --------------------------------------------------------------------------

#: HLL register count (m = 2^p, p = 8). Standard error ~ 1.04/sqrt(m)
#: ≈ 6.5% — the classic memory/accuracy trade at 256 registers.
HLL_M = 256
#: rho window: trailing-zero rank is read from this many hash bits
#: above the register index; an all-zero window ranks HLL_W_BITS + 1.
HLL_W_BITS = 32
#: bias constant alpha_m for m >= 128 (Flajolet et al. 2007).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_distinct(events: DataFrame) -> DataFrame:
    """HyperLogLog distinct count of event ids, audited against the
    exact distinct — the fixed-memory cardinality estimator every
    100 TB pipeline uses where countDistinct would shuffle the full
    key set (Spark's own approx_count_distinct is HLL++; this is the
    same estimator built from first principles so both engines run
    the IDENTICAL arithmetic and the driver can hash-compare it).

    Register assembly is EXACT integer arithmetic end-to-end: the
    md5-derived key hash (repo-portable convention) splits into a
    register index (mod m) and a 32-bit window whose trailing-zero
    rank rho = bit_count((w & -w) - 1) + 1 — bit tricks only, no
    libm. Each register keeps max(rho) — a decomposable aggregate
    (map-side combinable, the CMS scale property: the shuffle carries
    at most m rows per partition). The harmonic mean's sum of
    2^(-M_j) is rescaled by 2^(HLL_W_BITS+1) so every addend — empty
    registers included — is an exact int64 power of two summed in ONE
    integer aggregate; the estimate is alpha * m^2 * 2^33 / S as a
    single double division of exactly-cast operands. (The small-range
    linear-counting correction needs ln() — libm-dependent — so the
    raw estimator is reported with n_empty for the caller to judge;
    at n >> m, the operating regime here, the correction is inactive
    anyway.)
    """
    max_rho = HLL_W_BITS + 1
    # 15 hex digits = 60 hash bits — fits signed int64 in BOTH engines
    # (DuckDB's hex-string cast stops at BIGINT), and 8 index bits +
    # 32 rho-window bits need only 40
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("event_id").cast("string"))),
            1, 15,
        ),
        16,
        10,
    ).cast("long")
    j = h % HLL_M
    w = F.shiftright(h, 8).bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    rho = F.when(w == 0, max_rho).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    )
    regs = (
        events.select(j.alias("j"), rho.alias("rho"))
        .groupBy("j")
        .agg(F.max("rho").alias("m_j"))
    )
    # SUM over all m registers of 2^(max_rho - M_j), empties at 2^max_rho
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        # numBits is a column here, so the SQL form (F.shiftleft wants a
        # python int)
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rho} - m_j)")).alias(
            "s_present"
        ),
    )
    exact = events.agg(F.countDistinct("event_id").alias("exact_distinct"))
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_present")) * F.lit(2 ** max_rho)
    )
    est = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        * F.lit(float(2 ** max_rho))
        / s_total.cast("double")
    )
    return agg.crossJoin(F.broadcast(exact)).select(
        F.lit(HLL_M).alias("m"),
        (F.lit(HLL_M) - F.col("n_present")).cast("long").alias("n_empty"),
        est.alias("hll_estimate"),
        "exact_distinct",
        ((est - F.col("exact_distinct").cast("double"))
         / F.col("exact_distinct").cast("double")).alias("rel_error"),
    )


def hll_distinct_sql() -> str:
    max_rho = HLL_W_BITS + 1
    return f"""
WITH hashed AS (
  SELECT CAST('0x' || substr(md5('hll:' || CAST(event_id AS VARCHAR)),
              1, 15) AS BIGINT) AS h
  FROM events
),
rhos AS (
  SELECT h % {HLL_M} AS j,
         CASE WHEN ((h >> 8) & {(1 << HLL_W_BITS) - 1}) = 0 THEN {max_rho}
              ELSE bit_count((((h >> 8) & {(1 << HLL_W_BITS) - 1})
                   & -((h >> 8) & {(1 << HLL_W_BITS) - 1})) - 1) + 1
         END AS rho
  FROM hashed
),
regs AS (SELECT j, MAX(rho) AS m_j FROM rhos GROUP BY j),
agg AS (
  SELECT COUNT(*) AS n_present,
         CAST(SUM(CAST(1 AS BIGINT) << ({max_rho} - m_j)) AS BIGINT)
           AS s_present
  FROM regs
),
exact AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS exact_distinct
          FROM events)
SELECT CAST({HLL_M} AS INT) AS m,
       CAST({HLL_M} - n_present AS BIGINT) AS n_empty,
       CAST({HLL_ALPHA!r} AS DOUBLE) * CAST({float(HLL_M)!r} AS DOUBLE)
         * CAST({float(HLL_M)!r} AS DOUBLE)
         * CAST({float(2 ** max_rho)!r} AS DOUBLE)
         / CAST(s_present + ({HLL_M} - n_present)
                * CAST({2 ** max_rho} AS BIGINT) AS DOUBLE) AS hll_estimate,
       exact_distinct,
       (CAST({HLL_ALPHA!r} AS DOUBLE) * CAST({float(HLL_M)!r} AS DOUBLE)
         * CAST({float(HLL_M)!r} AS DOUBLE)
         * CAST({float(2 ** max_rho)!r} AS DOUBLE)
         / CAST(s_present + ({HLL_M} - n_present)
                * CAST({2 ** max_rho} AS BIGINT) AS DOUBLE)
        - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)
         AS rel_error
FROM agg, exact
"""


def cms_merge_audit(events: DataFrame) -> DataFrame:
    """Sketch MERGEABILITY, proven as a query: build count-min
    sketches over two disjoint shards (user_id parity — the stand-in
    for two ingest days or two clusters), merge them cell-wise, and
    verify the merged grid equals the whole-corpus grid cell for
    cell. One summary row: cells checked, cells equal, max absolute
    divergence (0 by the CMS linearity property).

    This is THE property that makes sketches work at 100 TB: each
    executor/day/cluster sketches independently and the d x w integer
    grids ADD — no re-scan, no key exchange. The audit makes the
    engine's guarantee testable instead of asserted (the
    ``ann_recall_eval`` acceptance-gate pattern applied to the
    sketch family). All arithmetic is exact integer cell counts; the
    comparison is grid-bounded (d*w rows), never key-scale.
    """
    idx = _index_df(events, CMS_DEPTH, "j")
    prefix = F.concat(F.lit("cms"), F.col("j").cast("string"))
    keyed = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cells = (
        keyed.crossJoin(F.broadcast(idx))
        .select(
            "cnt",
            "j",
            _hash_mod(prefix, F.col("k"), CMS_WIDTH).alias("cell"),
            (F.col("k") % 2).alias("shard"),
        )
    )
    whole = cells.groupBy("j", "cell").agg(F.sum("cnt").alias("whole_cnt"))
    sharded = (
        cells.groupBy("shard", "j", "cell")
        .agg(F.sum("cnt").alias("part_cnt"))
        .groupBy("j", "cell")
        .agg(F.sum("part_cnt").alias("merged_cnt"))
    )
    both = whole.join(sharded, ["j", "cell"], "full_outer").select(
        F.coalesce("whole_cnt", F.lit(0)).alias("w"),
        F.coalesce("merged_cnt", F.lit(0)).alias("m"),
    )
    return both.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum((F.col("w") == F.col("m")).cast("long")).alias("n_equal"),
        F.max(F.abs(F.col("w") - F.col("m"))).alias("max_divergence"),
    )


def cms_merge_audit_sql() -> str:
    pos = _sql_hash_mod("'cms' || CAST(j AS VARCHAR)", "k", CMS_WIDTH)
    return f"""
WITH idx AS (SELECT unnest(range({CMS_DEPTH})) AS j),
keyed AS (SELECT user_id AS k, COUNT(*) AS cnt FROM events GROUP BY user_id),
cells AS (
  SELECT cnt, j, {pos} AS cell, k % 2 AS shard
  FROM keyed CROSS JOIN idx
),
whole AS (SELECT j, cell, CAST(SUM(cnt) AS BIGINT) AS whole_cnt
          FROM cells GROUP BY j, cell),
sharded AS (
  SELECT j, cell, CAST(SUM(part_cnt) AS BIGINT) AS merged_cnt
  FROM (SELECT shard, j, cell, SUM(cnt) AS part_cnt
        FROM cells GROUP BY shard, j, cell)
  GROUP BY j, cell
),
both_g AS (
  SELECT COALESCE(w.whole_cnt, 0) AS w, COALESCE(s.merged_cnt, 0) AS m
  FROM whole w FULL OUTER JOIN sharded s USING (j, cell)
)
SELECT COUNT(*) AS n_cells,
       CAST(SUM(CASE WHEN w = m THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
       CAST(MAX(abs(w - m)) AS BIGINT) AS max_divergence
FROM both_g
"""


def hll_merge_audit(events: DataFrame) -> DataFrame:
    """HLL MERGEABILITY, proven as a query (the ``cms_merge_audit``
    contract applied to cardinality): sketch two disjoint shards
    (event parity), merge by per-register MAX, and verify the merged
    register vector — and therefore the estimate — equals the
    whole-stream sketch exactly. STAGED round 9 for the round-10
    driver window.

    This is why distributed count-distinct works at 100 TB: register
    max is associative/commutative/idempotent, so shard sketches
    union with zero error (unlike CMS deltas, HLL merge is EXACT with
    respect to the sketch). Output: registers compared, registers
    equal, the two power-of-two harmonic sums (equal iff the vectors
    are), and the shared estimate alpha * m^2 * 2^(w+1) / S computed
    from the whole-stream sum with the empty-register correction
    (identical to ``hll_distinct``'s, and equal for both sketches
    whenever n_equal == n_registers). Comparison is all integer
    arithmetic; only the estimate divides into a double.
    """
    max_rho = HLL_W_BITS + 1
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("event_id").cast("string"))),
            1, 15,
        ),
        16,
        10,
    ).cast("long")
    rho = F.when(
        (F.shiftright(h, 8).bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))) == 0,
        max_rho,
    ).otherwise(
        F.bit_count(
            (
                F.shiftright(h, 8).bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
            ).bitwiseAND(
                -(F.shiftright(h, 8).bitwiseAND(F.lit((1 << HLL_W_BITS) - 1)))
            )
            - 1
        )
        + 1
    )
    rows = events.select(
        (h % HLL_M).alias("j"),
        rho.alias("rho"),
        (F.col("event_id") % 2).alias("shard"),
    )
    whole = rows.groupBy("j").agg(F.max("rho").alias("m_whole"))
    merged = (
        rows.groupBy("shard", "j")
        .agg(F.max("rho").alias("m_part"))
        .groupBy("j")
        .agg(F.max("m_part").alias("m_merged"))
    )
    both = whole.join(merged, "j", "full_outer").select(
        F.coalesce("m_whole", F.lit(0)).alias("w"),
        F.coalesce("m_merged", F.lit(0)).alias("m"),
    )
    agg = both.agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum((F.col("w") == F.col("m")).cast("long")).alias("n_equal"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rho} - w)")).alias(
            "s_whole"
        ),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rho} - m)")).alias(
            "s_merged"
        ),
    )
    s_full = (
        F.col("s_whole")
        + (F.lit(HLL_M) - F.col("n_registers")) * F.lit(2 ** max_rho)
    )
    return agg.select(
        "n_registers",
        "n_equal",
        "s_whole",
        "s_merged",
        (
            F.lit(HLL_ALPHA)
            * F.lit(float(HLL_M))
            * F.lit(float(HLL_M))
            * F.lit(float(2 ** max_rho))
            / s_full.cast("double")
        ).alias("estimate"),
    )


def hll_merge_audit_sql() -> str:
    max_rho = HLL_W_BITS + 1
    mask = (1 << HLL_W_BITS) - 1
    return f"""
WITH hashed AS (
  SELECT CAST('0x' || substr(md5('hll:' || CAST(event_id AS VARCHAR)),
              1, 15) AS BIGINT) AS h,
         event_id % 2 AS shard
  FROM events
),
rows_r AS (
  SELECT h % {HLL_M} AS j, shard,
         CASE WHEN ((h >> 8) & {mask}) = 0 THEN {max_rho}
              ELSE bit_count((((h >> 8) & {mask}) & -((h >> 8) & {mask})) - 1)
                   + 1
         END AS rho
  FROM hashed
),
whole AS (SELECT j, MAX(rho) AS m_whole FROM rows_r GROUP BY j),
merged AS (
  SELECT j, MAX(m_part) AS m_merged
  FROM (SELECT shard, j, MAX(rho) AS m_part FROM rows_r GROUP BY shard, j)
  GROUP BY j
),
both_g AS (
  SELECT COALESCE(w.m_whole, 0) AS w, COALESCE(m.m_merged, 0) AS m
  FROM whole w FULL OUTER JOIN merged m USING (j)
),
agg AS (
  SELECT COUNT(*) AS n_registers,
         CAST(SUM(CASE WHEN w = m THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
         CAST(SUM(CAST(1 AS BIGINT) << ({max_rho} - w)) AS BIGINT) AS s_whole,
         CAST(SUM(CAST(1 AS BIGINT) << ({max_rho} - m)) AS BIGINT) AS s_merged
  FROM both_g
)
SELECT n_registers, n_equal, s_whole, s_merged,
       CAST({HLL_ALPHA!r} AS DOUBLE) * CAST({float(HLL_M)!r} AS DOUBLE)
         * CAST({float(HLL_M)!r} AS DOUBLE)
         * CAST({float(2 ** max_rho)!r} AS DOUBLE)
         / CAST(s_whole + ({HLL_M} - n_registers)
                * CAST({2 ** max_rho} AS BIGINT) AS DOUBLE) AS estimate
FROM agg
"""


#: heavy-change keys reported (by exact |change|, for the audit).
CMS_CHANGE_TOPK = 20


def cms_heavy_change(events: DataFrame) -> DataFrame:
    """Heavy-CHANGE detection via sketch subtraction: CMS grids are
    LINEAR, so (late-half grid) - (early-half grid) is itself a
    sketch of per-key count deltas, and the keys whose traffic moved
    most between the two halves of the window are estimated without
    ever diffing exact per-key counts — the k-ary-sketch change
    detection pattern (Krishnamurthy et al. 2003). STAGED round 9
    for the round-10 driver window.

    The stream splits at its midpoint timestamp (global min/max —
    two scalars broadcast); each half's grid is the standard
    map-side-combinable cell sum, the delta grid is one full-outer
    cell join, and each key's change estimate is the minimum-
    magnitude cell delta across depths (collisions ADD spurious
    positive and negative mass; min-|.| is the conservative pick).
    The top-CMS_CHANGE_TOPK keys BY EXACT |change| are reported with
    estimate vs exact — the heavy_hitters_cms audit convention: the
    sketch answers, the exact columns grade it.
    """
    idx = _index_df(events, CMS_DEPTH, "j")
    prefix = F.concat(F.lit("cms"), F.col("j").cast("string"))
    us = F.unix_micros(F.col("ts"))
    bounds = events.agg(
        F.min(us).alias("t0"), F.max(us).alias("t1")
    )
    halves = events.crossJoin(F.broadcast(bounds)).select(
        F.col("user_id").alias("k"),
        F.when(us * 2 <= F.col("t0") + F.col("t1"), 0).otherwise(1).alias("half"),
    )
    keyed = halves.groupBy("k", "half").agg(F.count(F.lit(1)).alias("cnt"))
    cells = keyed.crossJoin(F.broadcast(idx)).select(
        "k",
        "half",
        "cnt",
        "j",
        _hash_mod(prefix, F.col("k"), CMS_WIDTH).alias("cell"),
    )
    grids = cells.groupBy("half", "j", "cell").agg(
        F.sum("cnt").alias("c")
    )
    delta = (
        grids.groupBy("j", "cell")
        .pivot("half", [0, 1])
        .agg(F.coalesce(F.first("c"), F.lit(0)))
        .select(
            "j",
            "cell",
            (
                F.coalesce(F.col("1"), F.lit(0))
                - F.coalesce(F.col("0"), F.lit(0))
            ).alias("d"),
        )
    )
    exact = (
        keyed.groupBy("k")
        .pivot("half", [0, 1])
        .agg(F.coalesce(F.first("cnt"), F.lit(0)))
        .select(
            "k",
            (
                F.coalesce(F.col("1"), F.lit(0))
                - F.coalesce(F.col("0"), F.lit(0))
            ).alias("exact_change"),
        )
    )
    probe = (
        exact.crossJoin(F.broadcast(idx))
        .select(
            "k",
            "exact_change",
            "j",
            _hash_mod(prefix, F.col("k"), CMS_WIDTH).alias("cell"),
        )
        .join(F.broadcast(delta), ["j", "cell"])
        .groupBy("k", "exact_change")
        .agg(
            # deterministic min-|.| pick: tie on |d| breaks on signed d
            F.min_by(
                "d", F.struct(F.abs(F.col("d")).alias("a"), F.col("d").alias("d"))
            ).alias("est_change"),
        )
    )
    return (
        probe.select(
            F.col("k").alias("user_id"),
            "exact_change",
            "est_change",
            (F.col("est_change") - F.col("exact_change")).alias("est_error"),
        )
        .orderBy(
            F.abs(F.col("exact_change")).desc(), F.col("user_id").asc()
        )
        .limit(CMS_CHANGE_TOPK)
    )


def cms_heavy_change_sql() -> str:
    pos = _sql_hash_mod("'cms' || CAST(j AS VARCHAR)", "k", CMS_WIDTH)
    return f"""
WITH idx AS (SELECT unnest(range({CMS_DEPTH})) AS j),
bounds AS (SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events),
halves AS (
  SELECT user_id AS k,
         CASE WHEN epoch_us(ts) * 2 <= b.t0 + b.t1 THEN 0 ELSE 1 END AS half
  FROM events, bounds b
),
keyed AS (SELECT k, half, COUNT(*) AS cnt FROM halves GROUP BY k, half),
cells AS (
  SELECT k, half, cnt, j, {pos} AS cell FROM keyed CROSS JOIN idx
),
grids AS (SELECT half, j, cell, CAST(SUM(cnt) AS BIGINT) AS c
          FROM cells GROUP BY half, j, cell),
delta AS (
  SELECT j, cell,
         COALESCE(SUM(CASE WHEN half = 1 THEN c END), 0)
           - COALESCE(SUM(CASE WHEN half = 0 THEN c END), 0) AS d
  FROM grids GROUP BY j, cell
),
exact AS (
  SELECT k,
         COALESCE(SUM(CASE WHEN half = 1 THEN cnt END), 0)
           - COALESCE(SUM(CASE WHEN half = 0 THEN cnt END), 0) AS exact_change
  FROM keyed GROUP BY k
),
cand AS (
  SELECT e.k, e.exact_change, d.d,
         ROW_NUMBER() OVER (PARTITION BY e.k
           ORDER BY abs(d.d) ASC, d.d ASC) AS rn
  FROM exact e CROSS JOIN idx
  JOIN delta d ON d.j = idx.j AND d.cell = ({_sql_hash_mod("'cms' || CAST(idx.j AS VARCHAR)", "e.k", CMS_WIDTH)})
),
probe AS (
  SELECT k, exact_change, d AS est_change FROM cand WHERE rn = 1
)
SELECT k AS user_id, CAST(exact_change AS BIGINT) AS exact_change,
       CAST(est_change AS BIGINT) AS est_change,
       CAST(est_change - exact_change AS BIGINT) AS est_error
FROM probe
ORDER BY abs(exact_change) DESC, user_id ASC
LIMIT {CMS_CHANGE_TOPK}
"""


# --------------------------------------------------------------------------
# bottom-k (KMV) sampling — mergeability audit + distinct estimate
# --------------------------------------------------------------------------

#: sample size (the K in bottom-K / K-minimum-values).
BOTTOMK_K = 256
#: hash range upper bound: md5-15-hex -> [0, 16^15).
BOTTOMK_HMAX = float(16 ** 15)


def bottomk_sample_audit(events: DataFrame) -> DataFrame:
    """Bottom-k (KMV) sampling proven MERGEABLE as a query — the
    ``hll_merge_audit`` contract applied to uniform sampling: the k
    smallest md5 hashes of the DISTINCT user ids are a uniform
    distinct-value sample, and bottom-k(shard A ∪ shard B) ==
    bottom-k(bottom-k(A) ∪ bottom-k(B)) element-for-element — which
    is why a 1000-executor cluster can keep one fixed-size uniform
    sample per partition and merge them losslessly (reservoir
    sampling, the textbook alternative, is NOT mergeable without
    weights). Also surfaces the classic KMV distinct estimate
    (k-1) * H / h_(k) against the exact count.

    Shape: the per-shard candidates come from a rank window over
    each shard's distinct-hash stream (k-bounded output), the merge
    is a union + distributed TakeOrdered heap, and the comparison
    joins whole-vs-merged ON RANK (k-bounded). No stage materializes
    more than shards * k rows after the one distinct aggregation.
    STAGED round 10 for the round-11/12 windows.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bk:"), F.col("user_id").cast("string"))),
            1, 15,
        ),
        16,
        10,
    ).cast("long")
    hashes = (
        events.select(F.col("user_id"), (F.col("user_id") % 2).alias("shard"))
        .distinct()
        .select(h.alias("h"), "shard")
    )
    # k-bounded global rank windows (over LIMITed K-row streams) are
    # fine; the per-SHARD bottom-k must NOT be a 2-partition global
    # sort, so it uses the two-level bucketed rank (hash-range
    # buckets, uniform by construction): within-(shard,bucket)
    # row_number + tiny cumulative bucket offsets, keep off+rs <= K.
    w_rank = Window.orderBy(F.col("h").asc())
    whole = (
        hashes.select("h")
        .orderBy("h")
        .limit(BOTTOMK_K)
        .withColumn("rnk", F.row_number().over(w_rank))
    )
    bucket_w = int(BOTTOMK_HMAX) // 4096
    bucketed = hashes.withColumn("bk", F.expr(f"h div {bucket_w}"))
    w_in = Window.partitionBy("shard", "bk").orderBy(F.col("h").asc())
    w_off = (
        Window.partitionBy("shard")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("shard", "bk")
        .agg(F.count(F.lit(1)).alias("bc"))
        .select(
            "shard",
            "bk",
            F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off"),
        )
    )
    shard_bottom = (
        bucketed.withColumn("rs", F.row_number().over(w_in))
        .join(F.broadcast(offsets), ["shard", "bk"])
        .filter(F.col("off") + F.col("rs") <= BOTTOMK_K)
    )
    merged = (
        shard_bottom.select("h")
        .orderBy("h")
        .limit(BOTTOMK_K)
        .withColumn("rnk", F.row_number().over(w_rank))
    )
    both = whole.alias("w").join(
        merged.alias("m"), F.col("w.rnk") == F.col("m.rnk"), "full_outer"
    )
    exact = events.agg(F.countDistinct("user_id").alias("exact_distinct"))
    agg = both.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(
            (F.col("w.h") == F.col("m.h")).cast("long")
        ).alias("n_equal"),
        F.max("w.h").alias("hk"),
    )
    est = (
        F.lit(float(BOTTOMK_K - 1))
        * F.lit(BOTTOMK_HMAX)
        / F.col("hk").cast("double")
    )
    return agg.crossJoin(F.broadcast(exact)).select(
        "k",
        "n_equal",
        est.alias("est_distinct"),
        "exact_distinct",
        (
            (est - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_error"),
    )


def bottomk_sample_audit_sql() -> str:
    return f"""
WITH hashes AS (
  SELECT CAST('0x' || substr(md5('bk:' || CAST(user_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h,
         shard
  FROM (SELECT DISTINCT user_id, user_id % 2 AS shard FROM events)
),
whole AS (
  SELECT h, CAST(ROW_NUMBER() OVER (ORDER BY h ASC) AS BIGINT) AS rnk
  FROM (SELECT h FROM hashes ORDER BY h ASC LIMIT {BOTTOMK_K})
),
merged AS (
  SELECT h, CAST(ROW_NUMBER() OVER (ORDER BY h ASC) AS BIGINT) AS rnk
  FROM (
    SELECT h FROM (
      SELECT h, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h ASC) AS rs
      FROM hashes
    ) WHERE rs <= {BOTTOMK_K}
    ORDER BY h ASC LIMIT {BOTTOMK_K}
  )
),
exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
          FROM events),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CASE WHEN w.h = m.h THEN 1 ELSE 0 END) AS BIGINT)
           AS n_equal,
         MAX(w.h) AS hk
  FROM whole w FULL OUTER JOIN merged m ON w.rnk = m.rnk
)
SELECT k, n_equal,
       CAST({float(BOTTOMK_K - 1)!r} AS DOUBLE)
         * CAST({BOTTOMK_HMAX!r} AS DOUBLE) / CAST(hk AS DOUBLE)
         AS est_distinct,
       exact_distinct,
       (CAST({float(BOTTOMK_K - 1)!r} AS DOUBLE)
          * CAST({BOTTOMK_HMAX!r} AS DOUBLE) / CAST(hk AS DOUBLE)
        - CAST(exact_distinct AS DOUBLE)) / CAST(exact_distinct AS DOUBLE)
         AS rel_error
FROM agg, exact
"""


# --------------------------------------------------------------------------
# AMS (tug-of-war) second-moment sketch, audited against exact F2
# --------------------------------------------------------------------------

#: AMS counter count K: the estimate averages K independent
#: tug-of-war counters; rel std of the mean ~ sqrt(2/K) ~ 25%.
AMS_K = 32


def ams_f2_audit(events: DataFrame) -> DataFrame:
    """AMS "tug-of-war" sketch (Alon-Matias-Szegedy) for the second
    frequency moment F2 = sum_k f_k^2 of the per-user event counts,
    audited against the exact value — the classic fixed-memory
    estimator of join/self-join SIZE and skew energy (F2 over a join
    key IS the self-join cardinality, the quantity a CBO wants
    before it commits to a shuffle strategy; ``join_size_audit``
    measures one join, this sketches the moment in O(K) memory).

    Each counter i keeps Z_i = sum_k s_i(k) * f_k with s_i(k) a
    +/-1 four-universal-style hash sign; E[Z_i^2] = F2. Everything
    is EXACT integer arithmetic end to end: signs are md5-parity
    derived (the engine-portable keyed hash, hash index INSIDE the
    md5 input), Z_i is an int64 sum, Z_i^2 and the exact F2
    accumulate as decimal(38,0), and the only doubles are the final
    mean/rel_error divisions — both engines compute identical
    values, so the audit row hash-matches.

    One corpus pass: per-user counts group once, the K-way fan-out
    is a broadcast nested-loop over the tiny counter-index table,
    and the per-counter reduction is map-side combinable (the
    shuffle carries O(K * partitions) rows). Exact F2 rides the SAME
    pass: sum_i sum_k f_k^2 = K * F2 exactly, so no second scan and
    no multi-consumer re-instantiation of the keyed table.
    """
    idx = _index_df(events, AMS_K, "i")
    prefix = F.concat(F.lit("ams"), F.col("i").cast("string"))
    keyed = events.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    d38 = "decimal(38,0)"
    sign = F.lit(1) - F.lit(2) * _hash_mod(prefix, F.col("k"), 2)
    cells = keyed.crossJoin(F.broadcast(idx)).select(
        "i",
        (sign.cast("long") * F.col("cnt")).alias("zc"),
        (F.col("cnt").cast(d38) * F.col("cnt").cast(d38)).alias("c2"),
    )
    per_i = cells.groupBy("i").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("zc").alias("z"),
        F.sum("c2").alias("f2"),
    )
    est = (F.col("z").cast(d38) * F.col("z").cast(d38)).alias("est")
    agg = per_i.select("n_keys", "f2", est).agg(
        F.max("n_keys").alias("n_keys"),
        F.max("f2").alias("f2"),
        F.sum("est").alias("est_sum"),
        F.min("est").alias("est_min"),
        F.max("est").alias("est_max"),
    )
    f2d = F.col("f2").cast("double")
    mean = F.col("est_sum").cast("double") / F.lit(float(AMS_K))
    return agg.select(
        "n_keys",
        f2d.alias("exact_f2"),
        mean.alias("est_f2"),
        F.col("est_min").cast("double").alias("est_min"),
        F.col("est_max").cast("double").alias("est_max"),
        F.when(f2d > 0, F.abs(mean - f2d) / f2d).alias("rel_error"),
    )


def ams_f2_audit_sql() -> str:
    sign = (
        "(1 - 2 * ("
        + _sql_hash_mod("'ams' || CAST(i AS VARCHAR)", "k", 2)
        + "))"
    )
    hug = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    mean = hug.format(x="est_sum") + f" / CAST({AMS_K} AS DOUBLE)"
    f2d = hug.format(x="f2")
    return f"""
WITH idx AS (SELECT unnest(range({AMS_K})) AS i),
keyed AS (SELECT user_id AS k, COUNT(*) AS cnt FROM events GROUP BY user_id),
cells AS (
  SELECT i, {sign} * cnt AS zc, CAST(cnt AS HUGEINT) * cnt AS c2
  FROM keyed CROSS JOIN idx
),
per_i AS (
  SELECT i, COUNT(*) AS n_keys, SUM(zc) AS z, SUM(c2) AS f2
  FROM cells GROUP BY i
),
agg AS (
  SELECT CAST(MAX(n_keys) AS BIGINT) AS n_keys, MAX(f2) AS f2,
         SUM(CAST(z AS HUGEINT) * z) AS est_sum,
         MIN(CAST(z AS HUGEINT) * z) AS est_min,
         MAX(CAST(z AS HUGEINT) * z) AS est_max
  FROM per_i
)
SELECT n_keys, {f2d} AS exact_f2, {mean} AS est_f2,
       {hug.format(x="est_min")} AS est_min,
       {hug.format(x="est_max")} AS est_max,
       CASE WHEN {f2d} > 0
            THEN abs({mean} - {f2d}) / {f2d} END AS rel_error
FROM agg
"""


# --------------------------------------------------------------------------
# Bloom-filter size sweep (memory vs false-positive-rate curve)
# --------------------------------------------------------------------------

#: filter sizes swept (bits). Brackets BLOOM_BITS so the curve shows
#: both the saturated and the comfortable regime at test scale.
BLOOM_SWEEP_BITS = (1024, 4096, 16384)


def bloom_size_sweep(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The Bloom-filter TUNING readout ``bloom_probe`` assumes
    already done: the measured false-positive rate of the SAME
    build/probe workload at every candidate filter size — the
    memory-vs-precision curve you consult before fixing m for a
    100 TB bloom-pruned join (the ``dedup_threshold_sweep`` pattern
    applied to the sketch family). Also reports the saturation
    fraction (bits set / m), the quantity that actually drives fp
    rate (~ fill^k).

    ONE pass over keys for every size: the md5 hash value is
    computed once per (key, hash-index) and each size just reduces
    it mod its own m (a 3-row broadcast config table; positions for
    different m are NOT independent — exactly like a real system
    re-sizing the same hash family, and deterministic cross-engine).
    The per-size filter stays a DataFrame of distinct set positions
    (<= m rows); probes pass iff all k positions hit, per size. All
    counts exact integers; fp_rate/fill are final divisions.
    """
    build = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    idx = _index_df(orders, BLOOM_HASHES, "i")
    sizes = orders.sparkSession.createDataFrame(
        [(m,) for m in BLOOM_SWEEP_BITS], "m long"
    )
    prefix = F.concat(F.lit("bloom"), F.col("i").cast("string"))

    def positions(keys: DataFrame) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(F.concat(prefix, F.lit(":"), F.col("k").cast("string"))),
                1, 8,
            ),
            16,
            10,
        ).cast("long")
        return (
            keys.crossJoin(F.broadcast(idx))
            .select("k", h.alias("h"))
            .crossJoin(F.broadcast(sizes))
            .select("k", "m", (F.col("h") % F.col("m")).alias("pos"))
        )

    bits = positions(build).select("m", "pos").distinct()
    probe = customer.select(F.col("c_custkey").alias("k")).distinct()
    hits = (
        positions(probe)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), ["m", "pos"], "left")
        .groupBy("m", "k")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .withColumn("passes", (F.col("n_hits") == BLOOM_HASHES).cast("long"))
    )
    truth = build.withColumn("is_member", F.lit(1))
    audited = hits.join(truth, "k", "left").select(
        "m",
        "passes",
        F.coalesce(F.col("is_member"), F.lit(0)).cast("long").alias("mem"),
    )
    fills = bits.groupBy("m").agg(F.count(F.lit(1)).alias("n_bits_set"))
    per_m = audited.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum("mem").alias("n_member_probed"),
        F.sum("passes").alias("n_pass"),
        F.sum(F.col("passes") * (1 - F.col("mem"))).alias("n_false_pos"),
    )
    non_mem = F.col("n_probe") - F.col("n_member_probed")
    return (
        per_m.join(fills, "m")
        .select(
            "m",
            "n_bits_set",
            (
                F.col("n_bits_set").cast("double") / F.col("m").cast("double")
            ).alias("fill"),
            "n_probe",
            "n_pass",
            "n_false_pos",
            F.when(
                non_mem > 0,
                F.col("n_false_pos").cast("double") / non_mem.cast("double"),
            ).alias("fp_rate"),
        )
        .orderBy("m")
    )


def bloom_size_sweep_sql() -> str:
    h = (
        "CAST('0x' || substr(md5('bloom' || CAST(i AS VARCHAR) || ':' ||"
        " CAST(k AS VARCHAR)), 1, 8) AS BIGINT)"
    )
    sizes = ", ".join(f"({m})" for m in BLOOM_SWEEP_BITS)
    return f"""
WITH idx AS (SELECT unnest(range({BLOOM_HASHES})) AS i),
sizes(m) AS (VALUES {sizes}),
build AS (SELECT DISTINCT o_custkey AS k FROM orders
          WHERE o_orderpriority = '1-URGENT'),
bpos AS (
  SELECT DISTINCT m, {h} % m AS pos
  FROM build CROSS JOIN idx CROSS JOIN sizes
),
probe AS (SELECT DISTINCT c_custkey AS k FROM customer),
ppos AS (
  SELECT k, m, {h} % m AS pos
  FROM probe CROSS JOIN idx CROSS JOIN sizes
),
hits AS (
  SELECT p.m, p.k,
         CASE WHEN SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                   = {BLOOM_HASHES} THEN 1 ELSE 0 END AS passes
  FROM ppos p LEFT JOIN bpos b ON p.m = b.m AND p.pos = b.pos
  GROUP BY p.m, p.k
),
audited AS (
  SELECT h.m, h.passes,
         CASE WHEN t.k IS NOT NULL THEN 1 ELSE 0 END AS mem
  FROM hits h LEFT JOIN build t ON h.k = t.k
),
fills AS (SELECT m, COUNT(*) AS n_bits_set FROM bpos GROUP BY m),
per_m AS (
  SELECT m, COUNT(*) AS n_probe, SUM(mem) AS n_member_probed,
         SUM(passes) AS n_pass,
         SUM(passes * (1 - mem)) AS n_false_pos
  FROM audited GROUP BY m
)
SELECT p.m, CAST(f.n_bits_set AS BIGINT) AS n_bits_set,
       CAST(f.n_bits_set AS DOUBLE) / CAST(p.m AS DOUBLE) AS fill,
       CAST(p.n_probe AS BIGINT) AS n_probe,
       CAST(p.n_pass AS BIGINT) AS n_pass,
       CAST(p.n_false_pos AS BIGINT) AS n_false_pos,
       CASE WHEN p.n_probe - p.n_member_probed > 0
            THEN CAST(p.n_false_pos AS DOUBLE)
                 / CAST(p.n_probe - p.n_member_probed AS DOUBLE)
       END AS fp_rate
FROM per_m p JOIN fills f USING (m) ORDER BY p.m
"""


# --------------------------------------------------------------------------
# HLL set-intersection estimate (inclusion-exclusion), audited
# --------------------------------------------------------------------------

#: the two behavioral cohorts intersected (users who did each).
HLL_IX_SET_A = "click"
HLL_IX_SET_B = "purchase"


def hll_intersection_est(events: DataFrame) -> DataFrame:
    """Set-intersection cardinality from HLL sketches via
    inclusion-exclusion — |A∩B| ~ est(A) + est(B) - est(A∪B) —
    audited against the exact overlap. This is THE standard audience-
    overlap trick (two cohorts sketched independently, union free by
    register-wise max), and ALSO the standard cautionary tale: the
    estimate's absolute error scales with the UNION size, so a small
    true overlap of two big sets can even go negative. The audit
    makes that error measurable instead of folklore.

    One keyed pass: per-user membership flags for both cohorts group
    once (the keyed table is CHECKPOINTED — the register build and
    the exact-overlap count are two lazy consumers); each user
    hashes once and its rho lands in three register banks (A, B,
    union = max) in a single m-bounded aggregation. The three
    estimates reuse ``hll_distinct``'s exact-integer register
    arithmetic (power-of-two harmonic sums, one double division
    each); inclusion-exclusion is arithmetic over three identically-
    computed doubles.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    max_rho = HLL_W_BITS + 1
    keyed = _reliable_checkpoint(
        events.groupBy(F.col("user_id").alias("k")).agg(
            F.max((F.col("event_type") == HLL_IX_SET_A).cast("int")).alias(
                "in_a"
            ),
            F.max((F.col("event_type") == HLL_IX_SET_B).cast("int")).alias(
                "in_b"
            ),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hllix:"), F.col("k").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = F.shiftright(h, 8).bitwiseAND(F.lit((1 << HLL_W_BITS) - 1))
    rho = F.when(w == 0, max_rho).otherwise(
        F.bit_count((w.bitwiseAND(-w)) - 1) + 1
    )
    members = keyed.filter(
        (F.col("in_a") == 1) | (F.col("in_b") == 1)
    ).select(
        (h % HLL_M).alias("j"),
        rho.alias("rho"),
        "in_a",
        "in_b",
    )
    regs = members.groupBy("j").agg(
        F.max(F.when(F.col("in_a") == 1, F.col("rho"))).alias("ma"),
        F.max(F.when(F.col("in_b") == 1, F.col("rho"))).alias("mb"),
        F.max("rho").alias("mu"),
    )

    def bank(col: str):
        present = F.count(F.col(col))
        s_present = F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {max_rho} - {col})")
        )
        return present, s_present

    pa, sa = bank("ma")
    pb, sb = bank("mb")
    pu, su = bank("mu")
    agg = regs.agg(
        pa.alias("n_a"), F.coalesce(sa, F.lit(0)).alias("s_a"),
        pb.alias("n_b"), F.coalesce(sb, F.lit(0)).alias("s_b"),
        pu.alias("n_u"), F.coalesce(su, F.lit(0)).alias("s_u"),
    )

    def est(n: str, s: str):
        s_total = (
            F.col(s)
            + (F.lit(HLL_M) - F.col(n)) * F.lit(2 ** max_rho)
        )
        return (
            F.lit(HLL_ALPHA)
            * F.lit(float(HLL_M))
            * F.lit(float(HLL_M))
            * F.lit(float(2 ** max_rho))
            / s_total.cast("double")
        )

    exact = keyed.agg(
        F.sum(
            ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
        ).alias("exact_intersection")
    )
    ea, eb, eu = est("n_a", "s_a"), est("n_b", "s_b"), est("n_u", "s_u")
    ei = ea + eb - eu
    xd = F.col("exact_intersection").cast("double")
    return agg.crossJoin(F.broadcast(exact)).select(
        ea.alias("est_a"),
        eb.alias("est_b"),
        eu.alias("est_union"),
        ei.alias("est_intersection"),
        "exact_intersection",
        F.when(F.col("exact_intersection") > 0, (ei - xd) / xd).alias(
            "rel_error"
        ),
    )


def hll_intersection_est_sql() -> str:
    max_rho = HLL_W_BITS + 1
    wexpr = f"((h >> 8) & {(1 << HLL_W_BITS) - 1})"
    est = (
        "CAST({a!r} AS DOUBLE) * CAST({m!r} AS DOUBLE) * CAST({m!r} AS DOUBLE)"
        " * CAST({p!r} AS DOUBLE)"
        " / CAST(s_{x} + ({mm} - n_{x}) * CAST({pp} AS BIGINT) AS DOUBLE)"
    )

    def e(x: str) -> str:
        return est.format(
            a=HLL_ALPHA, m=float(HLL_M), p=float(2 ** max_rho),
            x=x, mm=HLL_M, pp=2 ** max_rho,
        )

    ei = f"({e('a')}) + ({e('b')}) - ({e('u')})"
    return f"""
WITH keyed AS MATERIALIZED (
  SELECT user_id AS k,
         MAX(CASE WHEN event_type = '{HLL_IX_SET_A}' THEN 1 ELSE 0 END)
           AS in_a,
         MAX(CASE WHEN event_type = '{HLL_IX_SET_B}' THEN 1 ELSE 0 END)
           AS in_b
  FROM events GROUP BY user_id
),
hashed AS (
  SELECT CAST('0x' || substr(md5('hllix:' || CAST(k AS VARCHAR)),
              1, 15) AS BIGINT) AS h,
         in_a, in_b
  FROM keyed WHERE in_a = 1 OR in_b = 1
),
rhos AS (
  SELECT h % {HLL_M} AS j,
         CASE WHEN {wexpr} = 0 THEN {max_rho}
              ELSE bit_count(({wexpr} & -{wexpr}) - 1) + 1 END AS rho,
         in_a, in_b
  FROM hashed
),
regs AS (
  SELECT j,
         MAX(CASE WHEN in_a = 1 THEN rho END) AS ma,
         MAX(CASE WHEN in_b = 1 THEN rho END) AS mb,
         MAX(rho) AS mu
  FROM rhos GROUP BY j
),
agg AS (
  SELECT COUNT(ma) AS n_a,
         COALESCE(CAST(SUM(CASE WHEN ma IS NOT NULL THEN
           CAST(1 AS BIGINT) << ({max_rho} - ma) END) AS BIGINT), 0) AS s_a,
         COUNT(mb) AS n_b,
         COALESCE(CAST(SUM(CASE WHEN mb IS NOT NULL THEN
           CAST(1 AS BIGINT) << ({max_rho} - mb) END) AS BIGINT), 0) AS s_b,
         COUNT(mu) AS n_u,
         COALESCE(CAST(SUM(CASE WHEN mu IS NOT NULL THEN
           CAST(1 AS BIGINT) << ({max_rho} - mu) END) AS BIGINT), 0) AS s_u
  FROM regs
),
exact AS (
  SELECT CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS exact_intersection
  FROM keyed
)
SELECT {e('a')} AS est_a, {e('b')} AS est_b, {e('u')} AS est_union,
       {ei} AS est_intersection,
       exact_intersection,
       CASE WHEN exact_intersection > 0
            THEN (({ei}) - CAST(exact_intersection AS DOUBLE))
                 / CAST(exact_intersection AS DOUBLE) END AS rel_error
FROM agg, exact
"""
