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
