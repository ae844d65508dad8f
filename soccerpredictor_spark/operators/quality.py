"""Data-quality audits: referential integrity + column profiling.

The pre-training audit pass a 100 TB pipeline runs before any join or
model consumes a snapshot: do the foreign keys actually resolve, and
what does each column's null/distinct shape look like? (The same
checks Deequ/Great Expectations codify; here as plain DataFrame ops
with DuckDB oracle twins.)

Scale notes:
- FK orphan checks are LEFT ANTI joins on the key only — both sides
  project to a single column before the shuffle, and the parent side
  is distinct-reduced map-side. No row data moves.
- The column profile is ONE pass over the table: stack (unpivot) to
  (column, value) pairs — a map-side Generate projection, no reshape
  shuffle — then a single groupBy computing counts / nulls / exact
  distincts per column. Values are stringified only as an injective distinct
  key (never surfaced), so engine float-formatting differences can't
  leak into results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_integrity_audit(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Orphan counts for the fixture's FK chain:
    lineitem.l_orderkey -> orders, orders.o_custkey -> customer,
    customer.c_nationkey -> nation. Returns one row per relation:
    (relation, n_child_rows, n_orphans)."""

    def one(child: DataFrame, ckey: str, parent: DataFrame, pkey: str, name: str) -> DataFrame:
        keys = child.select(F.col(ckey).alias("k"))
        orphans = keys.join(
            parent.select(F.col(pkey).alias("k")).distinct(), "k", "left_anti"
        )
        return keys.agg(
            F.lit(name).alias("relation"),
            F.count(F.lit(1)).alias("n_child_rows"),
        ).crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))

    return (
        one(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem->orders")
        .unionByName(one(orders, "o_custkey", customer, "c_custkey", "orders->customer"))
        .unionByName(one(customer, "c_nationkey", nation, "n_nationkey", "customer->nation"))
        .orderBy("relation")
    )


def fk_integrity_audit_sql() -> str:
    return """
SELECT 'customer->nation' AS relation,
       (SELECT COUNT(*) FROM customer) AS n_child_rows,
       (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
         AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
ORDER BY relation
"""


#: columns profiled by table_profile (name -> stack expression).
PROFILE_COLS = ("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


def table_profile(orders: DataFrame) -> DataFrame:
    """Single-pass column profile of the orders snapshot:
    (column, n_rows, n_nulls, n_distinct) per profiled column.

    ``stack`` multiplies rows map-side (Expand — no reshape shuffle);
    one aggregation computes every column's stats together. Distinct
    counts are exact (count(DISTINCT ...)); the stringification is an
    injective key shared by both engines, so the counts agree even
    where float FORMATTING doesn't."""
    pairs = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in PROFILE_COLS
    )
    stacked = orders.select(
        F.expr(f"stack({len(PROFILE_COLS)}, {pairs}) AS (col, val)")
    )
    return (
        stacked.groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_nulls"),
            F.countDistinct("val").alias("n_distinct"),
        )
        .orderBy("col")
    )


def table_profile_sql() -> str:
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM orders"
        for c in PROFILE_COLS
    )
    return f"""
WITH stacked AS ({selects})
SELECT col,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT val) AS n_distinct
FROM stacked GROUP BY col ORDER BY col
"""


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------

def _benford_probs() -> list[float]:
    """log10(1 + 1/d) for d = 1..9 — Python-computed double literals
    embedded in BOTH engines' plans, so no runtime log evaluation
    (ln/log10 are libm-dependent; see the tfidf convention)."""
    import math

    return [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def benford_check(orders: DataFrame) -> DataFrame:
    """Benford's-law first-digit audit of o_totalprice: observed count
    per leading digit vs the Benford expectation, with each digit's
    chi-square contribution — the classic fabricated-data /
    unit-mixing screen for numeric columns.

    The leading digit comes from string manipulation of the absolute
    value (no log10 at runtime); expected counts are n * literal
    Benford probabilities; the contribution (obs - exp)^2 / exp is
    one double expression per digit row. One scan, one 9-key
    aggregation, a 1-row total broadcast.
    """
    digit = F.substring(
        F.regexp_replace(
            F.abs(F.col("o_totalprice")).cast("string"), r"[^1-9]", ""
        ),
        1,
        1,
    ).cast("int")
    counts = (
        orders.select(digit.alias("digit"))
        .filter(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot = counts.agg(F.sum("observed").alias("n"))
    probs = _benford_probs()
    p_expr = None
    for d, p in enumerate(probs, start=1):
        branch = F.when(F.col("digit") == d, F.lit(p))
        p_expr = branch if p_expr is None else p_expr.when(
            F.col("digit") == d, F.lit(p)
        )
    expected = F.col("n").cast("double") * p_expr
    dev = F.col("observed").cast("double") - expected
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "observed",
            expected.alias("expected"),
            (dev * dev / expected).alias("chi2_term"),
        )
    )


def benford_check_sql() -> str:
    probs = _benford_probs()
    cases = " ".join(
        f"WHEN {d} THEN CAST({p!r} AS DOUBLE)"
        for d, p in enumerate(probs, start=1)
    )
    return f"""
WITH digits AS (
  SELECT CAST(substr(regexp_replace(CAST(abs(o_totalprice) AS VARCHAR),
                                    '[^1-9]', '', 'g'), 1, 1) AS INTEGER)
           AS digit
  FROM orders
),
counts AS (SELECT digit, COUNT(*) AS observed FROM digits
           WHERE digit IS NOT NULL GROUP BY digit),
tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM counts)
SELECT digit, observed,
       CAST(n AS DOUBLE) * (CASE digit {cases} END) AS expected,
       (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * (CASE digit {cases} END))
         * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * (CASE digit {cases} END))
         / (CAST(n AS DOUBLE) * (CASE digit {cases} END)) AS chi2_term
FROM counts CROSS JOIN tot
"""


# --------------------------------------------------------------------------
# functional-dependency audit
# --------------------------------------------------------------------------

#: candidate FDs audited over lineitem: (name, lhs columns, rhs column).
#: The PK candidate (orderkey, linenumber) -> quantity MUST hold; the
#: others measure how far the table is from each plausible dependency.
FD_CANDIDATES = (
    ("l_orderkey->l_linestatus", ("l_orderkey",), "l_linestatus"),
    ("l_orderkey->l_suppkey", ("l_orderkey",), "l_suppkey"),
    ("l_partkey->l_suppkey", ("l_partkey",), "l_suppkey"),
    ("l_orderkey,l_linenumber->l_quantity",
     ("l_orderkey", "l_linenumber"), "l_quantity"),
)


def fd_audit(lineitem: DataFrame) -> DataFrame:
    """Functional-dependency audit (the profiling step schema-
    discovery tools like Metanome/HyFD run before normalization or
    key inference): for each candidate X -> Y, how many X-groups
    exist, how many VIOLATE the dependency (more than one distinct Y
    inside the group), how many rows sit in violating groups, and
    the worst group's distinct-Y count. holds = 1 is a discovered
    exact dependency — the composite-PK candidate must report it,
    giving the audit a built-in self-check.

    ONE scan for all candidates: each row unpivots (stack — a
    map-side Generate, no reshape shuffle) into one (fd, lhs-key,
    rhs-value) tuple per candidate, then a single groupBy(fd, key)
    computes exact distinct-Y and row counts, and a candidate-sized
    rollup summarizes. A groupBy per candidate would scan the fact
    table once per FD — four full scans at 100 TB. Keys stringify
    with a '|' separator purely as an injective grouping key (never
    surfaced); all outputs are exact integer counts.
    """
    # r19 optimization (guide §2.3 "narrower types / shuffle fewer
    # bytes"): the unpivoted stream previously carried the FD name and
    # stringified keys/values — ~50 B of string per row, stringify CPU
    # per cell, string hashing in both aggregations. Every candidate's
    # key fits two BIGINTs and every RHS value maps injectively onto a
    # DOUBLE (ints < 2^53 cast exactly; the single-char status code via
    # ascii(); quantity is already a double), so the shuffled row is
    # now (tinyint fd id, long, long, double) — same group identities,
    # same distinct counts, bit-identical outputs after the 4-row
    # name re-map at the end.
    pairs = []
    for idx, (_, lhs, rhs) in enumerate(FD_CANDIDATES):
        k1 = F.col(lhs[0]).cast("long")
        k2 = (
            F.col(lhs[1]).cast("long") if len(lhs) > 1
            else F.lit(None).cast("long")
        )
        v = F.col(rhs)
        if rhs == "l_linestatus":
            v = F.ascii(v)
        pairs.append(
            F.struct(
                F.lit(idx).cast("int").alias("fd"),
                k1.alias("k1"),
                k2.alias("k2"),
                v.cast("double").alias("v"),
            )
        )
    exploded = lineitem.select(
        F.explode(F.array(*pairs)).alias("e")
    ).select("e.fd", "e.k1", "e.k2", "e.v")
    groups = exploded.groupBy("fd", "k1", "k2").agg(
        F.countDistinct("v").alias("nd"),
        F.count(F.lit(1)).alias("cnt"),
    )
    viol = F.col("nd") > 1
    fd_name = F.col("fd")
    for idx, (name, _, _) in enumerate(FD_CANDIDATES):
        fd_name = F.when(F.col("fd") == idx, name) if idx == 0 else fd_name.when(
            F.col("fd") == idx, name
        )
    return (
        groups.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(viol.cast("long")).alias("n_violating_groups"),
            F.sum(F.when(viol, F.col("cnt")).otherwise(0)).alias(
                "n_violating_rows"
            ),
            F.max("nd").alias("max_rhs_variants"),
        )
        .select(
            fd_name.alias("fd"),
            "n_groups", "n_violating_groups", "n_violating_rows",
            "max_rhs_variants",
            (F.col("n_violating_groups") == 0).cast("int").alias("holds"),
        )
        .orderBy("fd")
    )


def fd_audit_sql() -> str:
    arms = []
    for name, lhs, rhs in FD_CANDIDATES:
        key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in lhs)
        arms.append(
            f"SELECT '{name}' AS fd, {key} AS k,"
            f" CAST({rhs} AS VARCHAR) AS v FROM lineitem"
        )
    union = "\n  UNION ALL ".join(arms)
    return f"""
WITH exploded AS (
  {union}
),
groups AS (
  SELECT fd, k, COUNT(DISTINCT v) AS nd, COUNT(*) AS cnt
  FROM exploded GROUP BY fd, k
)
SELECT fd, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(SUM(CASE WHEN nd > 1 THEN cnt ELSE 0 END) AS BIGINT)
         AS n_violating_rows,
       CAST(MAX(nd) AS BIGINT) AS max_rhs_variants,
       CAST(CASE WHEN SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
                 THEN 1 ELSE 0 END AS INT) AS holds
FROM groups GROUP BY fd ORDER BY fd
"""


# --------------------------------------------------------------------------
# histogram-overlap drift (transcendental-free two-sample distance)
# --------------------------------------------------------------------------

#: document-length histogram bin width (chars).
HIST_DRIFT_BIN = 100


def histogram_overlap_drift(docs: DataFrame) -> DataFrame:
    """Two-sample distribution drift on the document-length
    histogram, measured WITHOUT transcendentals: split the corpus
    into two deterministic md5 halves (production: last snapshot vs
    this one), bin n_chars, and report the histogram intersection
    overlap = sum_b min(p_b, q_b) and the total-variation distance
    (1 - overlap). The monitor PSI/KL would give — but PSI needs
    ln(), which is 1-ulp engine-dependent (the tfidf libm note);
    histogram intersection is the standard drift metric that stays
    in exact arithmetic.

    Exactness: min(cnt_a/n_a, cnt_b/n_b) is selected by the INTEGER
    cross-multiplication min(cnt_a*n_b, cnt_b*n_a) — products in
    decimal(38,0) — and the numerators sum over the common
    denominator n_a*n_b, so overlap is ONE double division of two
    exactly-accumulated integers. One corpus pass builds the binned
    (cnt_a, cnt_b) table; it is checkpointed because totals and the
    per-bin min both read it (two lazy consumers would re-scan the
    corpus); everything after is bin-count-sized arithmetic.

    On the static fixture the halves are exchangeable, so overlap
    sits near 1 — the value is the REJECTION case on drifted data,
    with a reproducible cross-engine threshold.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    half = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ho:"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    bins = _reliable_checkpoint(
        docs.select(
            (F.col("n_chars") / F.lit(HIST_DRIFT_BIN))
            .cast("long")
            .alias("bin"),
            half.alias("h"),
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("cnt_b"),
        )
    )
    totals = bins.agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    d38 = "decimal(38,0)"
    num = F.least(
        F.col("cnt_a").cast(d38) * F.col("n_b").cast(d38),
        F.col("cnt_b").cast(d38) * F.col("n_a").cast(d38),
    )
    per_bin = bins.crossJoin(F.broadcast(totals)).select(
        num.alias("m"), "n_a", "n_b"
    )
    den = (F.col("n_a").cast(d38) * F.col("n_b").cast(d38)).cast("double")
    overlap = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0),
        F.col("num_sum").cast("double") / den,
    )
    return (
        per_bin.groupBy("n_a", "n_b")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("m").alias("num_sum"),
        )
        .select(
            "n_a",
            "n_b",
            "n_bins",
            overlap.alias("overlap"),
            (F.lit(1.0) - overlap).alias("tv_distance"),
        )
    )


def histogram_overlap_drift_sql() -> str:
    h = (
        "CAST('0x' || substr(md5('ho:' || CAST(doc_id AS VARCHAR)), 1, 8)"
        " AS BIGINT) % 2"
    )
    ov = (
        "CASE WHEN n_a > 0 AND n_b > 0 THEN"
        " CAST(CAST(num_sum AS VARCHAR) AS DOUBLE)"
        " / CAST(CAST(CAST(n_a AS HUGEINT) * n_b AS VARCHAR) AS DOUBLE) END"
    )
    return f"""
WITH binned AS (
  SELECT n_chars // {HIST_DRIFT_BIN} AS bin, {h} AS h FROM documents
),
bins AS (
  SELECT bin,
         SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS cnt_a,
         SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS cnt_b
  FROM binned GROUP BY bin
),
totals AS (
  SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
         CAST(SUM(cnt_b) AS BIGINT) AS n_b
  FROM bins
),
agg AS (
  SELECT n_a, n_b, COUNT(*) AS n_bins,
         SUM(LEAST(CAST(cnt_a AS HUGEINT) * n_b,
                   CAST(cnt_b AS HUGEINT) * n_a)) AS num_sum
  FROM bins CROSS JOIN totals
  GROUP BY n_a, n_b
)
SELECT n_a, n_b, CAST(n_bins AS BIGINT) AS n_bins,
       {ov} AS overlap,
       1.0 - ({ov}) AS tv_distance
FROM agg
"""


# --------------------------------------------------------------------------
# order-independent table checksum
# --------------------------------------------------------------------------

#: stable lineitem key/measure columns fingerprinted per row (floats
#: quantized to exact integer cents/units first — raw double->string
#: would tie the checksum to each engine's float formatter).
CHECKSUM_COLS_SQL = (
    "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
    " || '|' || CAST(CAST(round(l_quantity) AS BIGINT) AS VARCHAR)"
    " || '|' || CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR)"
    " || '|' || l_returnflag"
)


def table_checksum(lineitem: DataFrame) -> DataFrame:
    """Order-independent content checksum of the lineitem snapshot —
    the replication/migration acceptance primitive: two copies of a
    table (different engine, different partitioning, different row
    order) agree iff their checksums agree, without moving either
    copy. Each row hashes to an int64 (md5-15-hex of its quantized
    stable columns); the table digest combines rows with the two
    classic order-independent folds: XOR (permutation-invariant,
    overflow-free) and SUM (catches the multiset changes XOR can
    cancel out — a row added twice flips nothing in XOR but moves
    the sum), plus the exact row count.

    All integer arithmetic: floats quantize to cents/units BEFORE
    stringification (raw double->string would tie the fingerprint to
    each engine's float formatter), the hash keeps 15 hex digits
    (the DuckDB hex-cast BIGINT ceiling), XOR aggregates exactly,
    and the sum accumulates as decimal(38,0) surfaced through the
    VARCHAR->double convention. One scan, one 1-row aggregate —
    map-side combinable everywhere, nothing keyed, nothing sorted.
    """
    fp = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.round(F.col("l_quantity")).cast("long").cast("string"),
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("long")
                    .cast("string"),
                    F.col("l_returnflag"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return lineitem.select(fp.alias("fp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(fp)").alias("xor_checksum"),
        F.sum(F.col("fp").cast("decimal(38,0)"))
        .cast("double")
        .alias("sum_checksum"),
    )


def table_checksum_sql() -> str:
    fp = (
        f"CAST('0x' || substr(md5({CHECKSUM_COLS_SQL}), 1, 15) AS BIGINT)"
    )
    return f"""
WITH fps AS (SELECT {fp} AS fp FROM lineitem)
SELECT COUNT(*) AS n_rows,
       CAST(bit_xor(fp) AS BIGINT) AS xor_checksum,
       CAST(CAST(SUM(CAST(fp AS HUGEINT)) AS VARCHAR) AS DOUBLE)
         AS sum_checksum
FROM fps
"""


# --------------------------------------------------------------------------
# k-anonymity audit (quasi-identifier equivalence-class size profile)
# --------------------------------------------------------------------------

#: k rungs audited (a doc is "at risk at k" when its quasi-identifier
#: equivalence class holds fewer than k documents).
K_ANON_RUNGS = (2, 5, 10)

#: width (chars) of the n_chars quasi-identifier bucket — coarse
#: enough that length alone does not shatter classes, exact integer
#: division on both engines.
K_ANON_LEN_BUCKET = 64


def k_anonymity_audit(docs: DataFrame) -> DataFrame:
    """k-anonymity profile over the release quasi-identifiers — the
    privacy pre-flight a corpus publisher runs before sharing
    metadata: treating (lang, source, length-bucket) as the
    quasi-identifier tuple, how many documents sit in an equivalence
    class smaller than k (re-identifiable by the QI combination
    alone) for each rung of ``K_ANON_RUNGS``. The Sweeney k-anonymity
    measure as a plain groupBy profile.

    Engine shape: ONE (lang, source, bucket) aggregation builds the
    class-size table (linear scan, one shuffle on the QI key); the
    rung grid is a broadcast 3-row spine cross-applied to a
    class-size aggregate, so every rung reads the same tiny class
    table — never one corpus pass per k. The class table is
    checkpointed: the rung cross-join and the totals both consume it
    (the 2+-lazy-consumers rule).

    Output: (k, n_classes, n_classes_below_k, n_docs,
    n_docs_at_risk, at_risk_frac), k-ordered; ``at_risk_frac`` NULL
    on an empty corpus (fixed 3-row spine either way — alerting keys
    on the rungs).
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    spark = docs.sparkSession
    classes = _reliable_checkpoint(
        docs.groupBy(
            "lang",
            "source",
            F.expr(f"n_chars div {K_ANON_LEN_BUCKET}").alias("len_bucket"),
        ).agg(F.count(F.lit(1)).alias("sz"))
    )
    rungs = spark.createDataFrame([(k,) for k in K_ANON_RUNGS], "k long")
    per_k = (
        F.broadcast(rungs)
        .join(classes, how="cross")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum((F.col("sz") < F.col("k")).cast("long")).alias(
                "n_classes_below_k"
            ),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0)
            )
            .cast("long")
            .alias("n_docs_at_risk"),
        )
    )
    out = rungs.join(per_k, "k", "left").select(
        "k",
        F.coalesce(F.col("n_classes"), F.lit(0).cast("long")).alias(
            "n_classes"
        ),
        F.coalesce(F.col("n_classes_below_k"), F.lit(0).cast("long")).alias(
            "n_classes_below_k"
        ),
        F.coalesce(F.col("n_docs"), F.lit(0).cast("long")).alias("n_docs"),
        F.coalesce(F.col("n_docs_at_risk"), F.lit(0).cast("long")).alias(
            "n_docs_at_risk"
        ),
    )
    frac = F.when(F.col("n_docs") == 0, F.lit(None)).otherwise(
        F.col("n_docs_at_risk").cast("double") / F.col("n_docs").cast("double")
    )
    return out.withColumn("at_risk_frac", frac).orderBy("k")


def k_anonymity_audit_sql() -> str:
    """DuckDB twin of :func:`k_anonymity_audit` — identical QI
    bucketing, rung spine and zero-filled aggregates."""
    rungs = ", ".join(f"({k})" for k in K_ANON_RUNGS)
    return f"""
WITH classes AS (
  SELECT lang, source, n_chars // {K_ANON_LEN_BUCKET} AS len_bucket,
         COUNT(*) AS sz
  FROM documents GROUP BY 1, 2, 3
),
rungs(k) AS (VALUES {rungs}),
per_k AS (
  SELECT r.k,
         COUNT(*) AS n_classes,
         CAST(SUM(CASE WHEN c.sz < r.k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_classes_below_k,
         CAST(SUM(c.sz) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN c.sz < r.k THEN c.sz ELSE 0 END) AS BIGINT)
           AS n_docs_at_risk
  FROM rungs r CROSS JOIN classes c GROUP BY r.k
)
SELECT CAST(r.k AS BIGINT) AS k,
       COALESCE(p.n_classes, 0) AS n_classes,
       COALESCE(p.n_classes_below_k, 0) AS n_classes_below_k,
       COALESCE(p.n_docs, 0) AS n_docs,
       COALESCE(p.n_docs_at_risk, 0) AS n_docs_at_risk,
       CASE WHEN COALESCE(p.n_docs, 0) = 0 THEN NULL
            ELSE CAST(p.n_docs_at_risk AS DOUBLE)
                 / CAST(p.n_docs AS DOUBLE) END AS at_risk_frac
FROM rungs r LEFT JOIN per_k p ON r.k = p.k
ORDER BY k
"""


# --------------------------------------------------------------------------
# l-diversity audit (does each QI class hide WHICH feed a doc is from)
# --------------------------------------------------------------------------

#: distinct-l rungs, the Machanavajhala et al. (2007) measure's grid
#: (l=2 is the bare minimum: a class with ONE sensitive value leaks
#: it to anyone who can place a record in the class).
L_DIV_RUNGS = (2, 3, 5)


def l_diversity_audit(docs: DataFrame) -> DataFrame:
    """Distinct l-diversity profile — the privacy audit k-anonymity
    can't express (:func:`k_anonymity_audit` is the sibling): a QI
    class can be large (k-anonymous) yet every record in it share ONE
    sensitive value, so membership alone discloses the attribute.
    Here the quasi-identifier is (lang, length-bucket) — what an
    observer sees in released metadata — and the sensitive attribute
    is ``source`` (which feed a document came from, the thing a
    corpus publisher often must not disclose per-document): for each
    rung l in :data:`L_DIV_RUNGS`, how many QI classes carry fewer
    than l distinct sources, and how many documents sit in them.

    Engine shape: ONE (lang, len_bucket) aggregation computing class
    size and distinct-source count together (a map-side-combinable
    count-distinct over a bounded universe); the rung grid is a
    broadcast 3-row spine over that checkpointed class table (never
    one corpus pass per rung — the k_anonymity_audit shape).

    Output: (l, n_classes, n_classes_below_l, n_docs,
    n_docs_at_risk, at_risk_frac), l-ordered; fixed 3-row spine on an
    empty corpus with NULL fraction.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    spark = docs.sparkSession
    classes = _reliable_checkpoint(
        docs.groupBy(
            "lang",
            F.expr(f"n_chars div {K_ANON_LEN_BUCKET}").alias("len_bucket"),
        ).agg(
            F.count(F.lit(1)).alias("sz"),
            F.countDistinct("source").cast("long").alias("n_sensitive"),
        )
    )
    rungs = spark.createDataFrame([(l,) for l in L_DIV_RUNGS], "l long")
    per_l = (
        F.broadcast(rungs)
        .join(classes, how="cross")
        .groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum((F.col("n_sensitive") < F.col("l")).cast("long")).alias(
                "n_classes_below_l"
            ),
            F.sum("sz").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("n_sensitive") < F.col("l"), F.col("sz"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_docs_at_risk"),
        )
    )
    out = rungs.join(per_l, "l", "left").select(
        "l",
        F.coalesce(F.col("n_classes"), F.lit(0).cast("long")).alias(
            "n_classes"
        ),
        F.coalesce(F.col("n_classes_below_l"), F.lit(0).cast("long")).alias(
            "n_classes_below_l"
        ),
        F.coalesce(F.col("n_docs"), F.lit(0).cast("long")).alias("n_docs"),
        F.coalesce(F.col("n_docs_at_risk"), F.lit(0).cast("long")).alias(
            "n_docs_at_risk"
        ),
    )
    frac = F.when(F.col("n_docs") == 0, F.lit(None)).otherwise(
        F.col("n_docs_at_risk").cast("double") / F.col("n_docs").cast("double")
    )
    return out.withColumn("at_risk_frac", frac).orderBy("l")


def l_diversity_audit_sql() -> str:
    """DuckDB twin of :func:`l_diversity_audit` — identical QI
    bucketing, distinct-source count, rung spine and zero-fills."""
    rungs = ", ".join(f"({l})" for l in L_DIV_RUNGS)
    return f"""
WITH classes AS (
  SELECT lang, n_chars // {K_ANON_LEN_BUCKET} AS len_bucket,
         COUNT(*) AS sz,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sensitive
  FROM documents GROUP BY 1, 2
),
rungs(l) AS (VALUES {rungs}),
per_l AS (
  SELECT r.l,
         COUNT(*) AS n_classes,
         CAST(SUM(CASE WHEN c.n_sensitive < r.l THEN 1 ELSE 0 END)
           AS BIGINT) AS n_classes_below_l,
         CAST(SUM(c.sz) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN c.n_sensitive < r.l THEN c.sz ELSE 0 END)
           AS BIGINT) AS n_docs_at_risk
  FROM rungs r CROSS JOIN classes c
  GROUP BY r.l
)
SELECT CAST(r.l AS BIGINT) AS l,
       COALESCE(p.n_classes, 0) AS n_classes,
       COALESCE(p.n_classes_below_l, 0) AS n_classes_below_l,
       COALESCE(p.n_docs, 0) AS n_docs,
       COALESCE(p.n_docs_at_risk, 0) AS n_docs_at_risk,
       CASE WHEN COALESCE(p.n_docs, 0) = 0 THEN NULL
            ELSE CAST(p.n_docs_at_risk AS DOUBLE)
                 / CAST(p.n_docs AS DOUBLE) END AS at_risk_frac
FROM rungs r LEFT JOIN per_l p ON r.l = p.l
ORDER BY l
"""
