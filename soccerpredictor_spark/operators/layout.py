"""Z-order (Morton) layout: multi-dimensional data skipping.

``sorted_layout_prune`` shows single-key skipping: range-partition +
sort on ONE column and parquet min/max stats prune key-range reads.
But a 100 TB fact table is usually filtered on TWO OR MORE dimensions
(customer AND date; region AND product), and a single-column sort
makes the second dimension's min/max stats useless — every file spans
the full range of the non-sort key.

Z-ordering interleaves the bits of both keys into one sort value, so
files cluster in BOTH dimensions simultaneously: each output file
covers a small rectangle of (x, y) space, its parquet row-group
min/max stats are tight on BOTH columns, and a conjunctive range
predicate prunes to the few files whose rectangles intersect the
query box — the technique behind Delta/Iceberg OPTIMIZE ZORDER BY,
expressed here as plain DataFrame ops (bit-interleave projection +
repartitionByRange + sortWithinPartitions).

The z-value is LAYOUT ONLY: it never appears in results, so the
DuckDB oracle is the plain filtered aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (16 -> 32-bit z-values; enough for ~65k distinct
#: bucketized values per dim — bucketize wider domains first).
Z_BITS = 16


def z_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: z = ... y1 x1 y0 x0. Pure bitwise projection —
    whole-stage-codegen'd, no shuffle, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(xb, 2 * i)).bitwiseOR(
            F.shiftleft(yb, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of
    (``x_col``, ``y_col``): range-partition on the z-value so each
    file owns a contiguous z-range (a small (x, y) rectangle), sort
    within partitions so row groups inside a file are tight too, then
    drop the scaffold columns before writing.

    Keys are first NORMALIZED into the ``Z_BITS`` budget —
    ``floor(v * 2^bits / (max+1))`` with the maxes computed in-plan (a
    1-row aggregate broadcast, no driver collect). Interleaving raw
    keys would silently alias any domain wider than 2^bits (e.g.
    o_orderkey at sf0.1 already exceeds 2^16): the dropped high bits
    would fold distant key ranges into the same z-range and every
    file's min/max stats would span the whole table, defeating the
    skipping the layout exists to buy."""
    mx = df.agg(
        F.max(F.col(x_col).cast("long")).alias("__xmax"),
        F.max(F.col(y_col).cast("long")).alias("__ymax"),
    )
    scale = F.lit(1 << Z_BITS).cast("long")
    zed = df.crossJoin(F.broadcast(mx)).withColumn(
        "__z",
        z_value(
            (F.col(x_col).cast("long") * scale) / (F.col("__xmax") + 1),
            (F.col(y_col).cast("long") * scale) / (F.col("__ymax") + 1),
        ),
    )
    (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", "__xmax", "__ymax")
        .write.mode("overwrite")
        .parquet(path)
    )
