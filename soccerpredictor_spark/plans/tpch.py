"""Headline analytic queries over the TPC-H-ish bench tables.

These exercise the same operator classes as the reference's pipeline
(scan -> filter -> agg -> top-K -> join; SURVEY.md §2) at benchmarkable
scale, and are the workload ``bench.py`` times.

Determinism convention for cross-engine (DuckDB-oracle) parity:
money/quantity SUMs are computed over ``decimal(18,2)`` casts — decimal
addition is exact and order-independent, so Spark's partial-aggregation
order (which varies with partitioning) cannot perturb the result —
then cast back to double for a stable output schema. Averages are
expressed as exact-decimal sum / count in double. Floating-point SUMs
would differ across engines in the last ulps and fail value-hash
comparison; this convention makes every aggregate bit-reproducible at
any partition count, which also means results are stable when the same
query runs on a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"
MONEY = "decimal(10,2)"  # prices: exact 2-decimal values
RATE = "decimal(4,2)"  # discount/tax: exact 2-decimal rates


def _one() -> F.Column:
    # lazily built: F.lit needs an active SparkContext
    return F.lit(1).cast("decimal(3,2)")


def _dsum(col: F.Column) -> F.Column:
    """Order-independent exact sum: decimal-accumulate, emit double."""
    return F.sum(col.cast(DEC)).cast("double")


def _dsum_exact(col: F.Column) -> F.Column:
    """Sum an already-decimal expression, emit double."""
    return F.sum(col).cast("double")


def disc_price_expr() -> F.Column:
    """l_extendedprice * (1 - l_discount) in exact decimal arithmetic.

    Casting the factors (all exact 2-decimal values) and multiplying as
    decimals is bit-reproducible across engines; casting the *double
    product* to decimal is not — the product can land on a .xx5
    rounding boundary where rounding modes disagree.
    """
    return F.col("l_extendedprice").cast(MONEY) * (_one() - F.col("l_discount").cast(RATE))


def charge_expr() -> F.Column:
    """disc_price * (1 + l_tax), exact decimal."""
    return disc_price_expr() * (_one() + F.col("l_tax").cast(RATE))


# SQL twins of the decimal expressions above.
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(10,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)
SQL_CHARGE = f"({SQL_DISC_PRICE}) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-heavy groupBy aggregation.

    Plan shape: parquet scan (column-pruned to 7 cols, filter pushed
    down) -> partial hash agg (map-side combine) -> single shuffle on
    the 6-value group key -> final agg -> sort. At 100 TB the shuffle
    carries only num_partitions x 6 groups — negligible.
    """
    disc_price = disc_price_expr()
    charge = charge_expr()
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum_exact(disc_price).alias("sum_disc_price"),
            _dsum_exact(charge).alias("sum_charge"),
            (_dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            (_dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (_dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3-style: filtered 3-way join -> agg -> top-K.

    The customer side is filtered then broadcast (a market segment is
    a small fraction of an already-small dim); lineitem joins orders
    on the shuffle. Top-K plans as TakeOrderedAndProject — no global
    sort materialization.
    """
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    revenue = disc_price_expr()
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum_exact(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6-style: pure filter + single global aggregate.

    The whole predicate set (date range, discount band, quantity cap)
    pushes into the parquet scan, and the aggregation is a map-side
    partial sum + single-row final — the minimal possible shuffle. The
    canonical "is pushdown actually working" query.
    """
    rev = F.col("l_extendedprice").cast(MONEY) * F.col("l_discount").cast(RATE)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").cast(RATE) >= F.lit("0.05").cast(RATE))
            & (F.col("l_discount").cast(RATE) <= F.lit("0.07").cast(RATE))
            & (F.col("l_quantity").cast("double") < 24.0)
        )
        .agg(_dsum_exact(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN CAST(0.05 AS DECIMAL(4,2)) AND CAST(0.07 AS DECIMAL(4,2))
  AND CAST(l_quantity AS DOUBLE) < 24.0
"""


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10-style: returned-item revenue per customer, top 20.

    lineitem⋈orders is the only real shuffle; customer and nation
    broadcast. Top-K plans as TakeOrderedAndProject.
    """
    revenue = disc_price_expr()
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(customer), ords.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum_exact(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14-style: promotion revenue share.

    lineitem⋈part with the dim broadcast; conditional aggregation
    (sum-if) computed map-side. The ratio divides two exact-decimal
    sums in double — bit-reproducible.
    """
    revenue = disc_price_expr()
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0).cast(MONEY))
    ).cast("double")
    total = _dsum_exact(revenue)
    return joined.agg(
        (F.lit(100.0) * promo / total).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                             ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
             / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q5_local_supplier(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-style: 6-way join with small-dim broadcasts.

    region/nation/supplier/customer are all broadcast-sized dims; only
    orders⋈lineitem needs a shuffle. The c_nationkey = s_nationkey
    "local supplier" constraint is an extra equi-condition on the join.
    """
    revenue = disc_price_expr()
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        lineitem.join(ords, lineitem.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(
            F.broadcast(customer),
            (ords.o_custkey == customer.c_custkey)
            & (supplier.s_nationkey == customer.c_nationkey),
        )
        .join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey)
    )
    return (
        joined.groupBy("n_name")
        .agg(_dsum_exact(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""
