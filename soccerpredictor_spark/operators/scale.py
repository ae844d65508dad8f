"""Parallelism-restoring fan-out for compute-heavy projections.

Spark's scan parallelism equals the number of file splits. At 100 TB
that is hundreds of thousands of splits and every core is busy; but a
SMALL input (one parquet file, one row group — e.g. a dimension-sized
document corpus, or the local test fixtures) yields a single
partition, and any CPU-heavy projection chained onto that scan
(explode + per-token md5, higher-order array functions) then runs on
ONE core no matter how many the cluster has. Round-3 bench forensics:
MinHash signatures — 3M md5s — took 7.7s on a 32-core local master
because every one of them ran in the documents scan's single task.

``fan_out`` is the remedy and it is deliberately *conditional*: it
round-robin-repartitions ONLY when the observed partition count is
below the session's default parallelism. On a big scan it is a no-op
(no exchange is added at 100 TB, where the shuffle would be the
bottleneck); on a splits-starved scan it pays one tiny shuffle of the
raw rows to buy full-cluster parallelism for everything downstream.

The helper belongs immediately after the scan and BEFORE the
expensive projection — fanning out after the compute has already
happened defeats the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism * factor`` IFF its
    current parallelism is lower; otherwise return it unchanged.

    Call this on scan-stage DataFrames only: the partition probe
    builds the physical RDD for ``df``, which is cheap for a scan but
    would force planning work for a deep operator tree.
    """
    if df.isStreaming:
        # no partition probe on a streaming plan; micro-batch sources
        # already split by file/offset range
        return df
    sc = df.sparkSession.sparkContext
    target = max(1, sc.defaultParallelism * factor)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
