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

Coverage: 22 of 22. This module holds the 18 queries expressible over
the fixture tables directly; q2/q11/q16/q20 — DEFINED on partsupp
columns the fixtures lack — live in ``plans/partsupp.py`` over a
deterministic synthesized part-supplier relation (see that module's
docstring for the construction and its engine-portable determinism).
q12 and q21 are adapted to fixture columns as documented on their
builders. Every query has a DuckDB oracle twin and a driver row.
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


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-style: order-priority checking via EXISTS semi-join.

    The correlated EXISTS (a lineitem shipped after the order date —
    the dataset has no commit/receipt dates, so "late shipment" stands
    in for the spec's commit<receipt) plans as a left-semi shuffle join
    on the order key; lineitem is never widened, so the shuffle carries
    only (l_orderkey, l_shipdate). The final agg is 5 groups.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    return (
        ords.join(
            li,
            (ords.o_orderkey == li.l_orderkey) & (li.l_shipdate > ords.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7-style: cross-nation shipping volume by year.

    nation appears twice (supplier side / customer side) under renamed
    columns; both copies — filtered to the 2-nation pair — broadcast,
    as do supplier and customer. Only lineitem⋈orders shuffles. The
    disjunctive pair predicate becomes isin() on each side plus an
    inequality, which Catalyst pushes below the joins.
    """
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("cust_nkey"), F.col("n_name").alias("cust_nation")
    )
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cust_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_dsum_exact(disc_price_expr()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         YEAR(l_shipdate) AS l_year, {SQL_DISC_PRICE} AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q9_product_type_profit(
    part: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9-style: profit by supplier nation and order year.

    The LIKE-filtered part dim broadcasts and prunes lineitem early;
    orders joins on the shuffle only to supply the year. (The dataset
    has no partsupp/ps_supplycost, so "profit" is the discounted
    revenue rather than revenue minus cost — same plan shape.)
    """
    red_parts = part.filter(F.col("p_name").like("%red%")).select("p_partkey")
    joined = (
        lineitem.join(F.broadcast(red_parts), lineitem.l_partkey == red_parts.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            disc_price_expr().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_dsum_exact(F.col("amount")).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         {SQL_DISC_PRICE} AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count.

    Left-outer join with an extra non-key condition (priority filter
    folded into the join, so non-matching customers still appear with
    count 0), then a two-level aggregation. The second groupBy's key
    domain is tiny (distinct counts), so its shuffle is negligible.
    """
    ords = orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        customer.join(ords, customer.c_custkey == ords.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q18-style: large-volume orders (HAVING > 300 units).

    The HAVING subquery aggregates lineitem once (decimal-exact, so
    the >300 cut is reproducible), and the survivor key set semi-joins
    back into lineitem — AQE converts that to a broadcast at runtime
    since survivors are a tiny fraction of orders at any scale.
    Customer broadcasts; top-K plans as TakeOrderedAndProject.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    li = lineitem.join(big, "l_orderkey", "left_semi")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-style: disjunctive brand/size/quantity bands.

    An equi-join on partkey (part broadcast) carries the three OR'd
    band predicates as a post-join filter — same result as the spec's
    join-condition form, but keeps the equi-join hashable. Catalyst
    pushes the per-side conjuncts (p_size >= 1, brand isin) below the
    join into both scans.
    """
    joined = lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
    qty = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qty.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & qty.between(20, 40))
    )
    return joined.filter(band).agg(
        _dsum_exact(disc_price_expr()).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = f"""
SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


def q22_global_sales_opportunity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22-style: well-funded customers with no recent orders.

    Two classic shapes: a scalar subquery (the positive-balance mean,
    computed as exact-decimal sum/count so the comparison threshold is
    bit-identical across engines, then broadcast as a 1-row cross
    join) and a left-anti join against the recent-order key set.
    (The dataset has no phone column, so nationkey stands in for the
    spec's country-code grouping; every sf0.01 customer has *some*
    order, so recency — none since 2000 — replaces NOT EXISTS overall.)
    """
    thr = customer.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    cand = (
        customer.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        cand.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


Q22_SQL = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q8-style: one nation's market share of a product type in a
    region, per year.

    Everything except lineitem⋈orders broadcasts. nation joins twice
    under different roles (customer region membership / supplier
    nationality). The share is a conditional-sum over total-sum ratio
    of exact decimals — one aggregation, two outputs.
    """
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
        "left_semi",
    ).select(F.col("n_nationkey").alias("cust_nkey"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("supp_nkey"), F.col("n_name").alias("supp_nation")
    )
    promo_parts = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    joined = (
        lineitem.join(F.broadcast(promo_parts), lineitem.l_partkey == promo_parts.p_partkey)
        .join(ords, lineitem.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), ords.o_custkey == customer.c_custkey)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cust_nkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("supp_nkey"))
    )
    vol = disc_price_expr()
    target = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(
        F.lit(0).cast(MONEY)
    )
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), target.alias("tvol"))
        .groupBy("o_year")
        .agg(
            (F.sum("tvol").cast("double") / F.sum("volume").cast("double")).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                     ELSE CAST(0 AS DECIMAL(10,2)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lines
FROM (
  SELECT YEAR(o_orderdate) AS o_year, {SQL_DISC_PRICE} AS volume,
         n2.n_name AS nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
) shares
GROUP BY o_year
ORDER BY o_year
"""


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15-style: supplier(s) with the maximum quarterly revenue.

    The revenue CTE aggregates lineitem once; its global MAX (exact
    decimal, order-independent) comes back as a 1-row broadcast and
    filters the same CTE — Spark materializes the CTE subtree twice,
    but both instances are post-aggregation (supplier-cardinality)
    rows, so the duplicated work is the small agg, not the scan shuffle.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(disc_price_expr()).alias("total_rev_dec"))
    )
    best = rev.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev_dec") == F.col("max_rev"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({SQL_DISC_PRICE}) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17-style: revenue lost to small-quantity orders.

    The per-part quantity threshold (0.2 x mean) is a correlated
    scalar subquery in the spec; here it's an aggregate on lineitem
    re-joined by partkey — the mean is exact-decimal sum / count so
    the `<` cut is bit-reproducible. The brand filter broadcasts into
    both the fact scan and the threshold join.
    """
    brand_parts = part.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li = lineitem.join(
        F.broadcast(brand_parts), lineitem.l_partkey == brand_parts.p_partkey
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count(F.lit(1)))
        ).alias("qty_lim")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.pk)
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            (_dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS pk,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) AS qty_lim
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
      GROUP BY l_partkey) t ON l_partkey = pk
WHERE p_brand = 'Brand#23' AND l_quantity < qty_lim
"""


def q12_shipmode_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12-style: shipping-class vs order-priority counts.

    ADAPTED to the driver fixtures: lineitem has no l_shipmode /
    l_commitdate / l_receiptdate, so the line class is l_returnflag
    (IN-list filtered, like the spec's two shipmodes) and the date
    window is on l_shipdate. The operator shape IS Q12's: big-big
    equi-join (lineitem joins orders on the shuffle), conditional
    partial-agg counts, tiny result.
    """
    li = lineitem.filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1).cast("long") - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q21_waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    late_days: int = 90,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q21-style: suppliers who alone held up multi-supplier
    finished orders.

    ADAPTED to the driver fixtures: no l_commitdate/l_receiptdate, so
    "late" means l_shipdate > o_orderdate + ``late_days``. Spec
    semantics otherwise preserved: order is 'F', the order has >= 2
    distinct suppliers (the EXISTS), and NO other supplier was late on
    it (the NOT EXISTS) — the oracle twin states those as literal
    EXISTS / NOT EXISTS subqueries, independently cross-checking this
    formulation.

    Scale shape: the spec's two lineitem self-joins are re-expressed
    as a two-level aggregation — per (order, supplier) then per order
    — so lineitem is scanned once and shuffled once on l_orderkey
    (the second agg and the join back are exchange-aligned on the
    same key); supplier⋈nation broadcasts. numwait counts late LINES
    per the spec's count(*) over qualifying l1 rows.
    """
    ords = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {late_days} DAYS"
    )
    li = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.cast("int").alias("is_late"))
    )
    sup_order = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum("is_late").cast("long").alias("n_late_lines"),
    )
    per_order = sup_order.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"), F.sum("supp_late").alias("nlate")
    )
    nation_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
        supplier.s_nationkey == nation.n_nationkey,
        "left_semi",
    ).select("s_suppkey", "s_name")
    return (
        sup_order.filter(F.col("supp_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
