"""Edge sinks (SURVEY.md §2.1 S9/S10-adjacent).

The reference dumps its prediction feature matrix to Excel
(``test.to_excel('test.xlsx')``, XGBoost/Predictor.py:132,159) —
a driver-side convenience output, small by construction. We preserve
the capability with a CSV default (always available) and an Excel path
gated on openpyxl. Big results use the distributed parquet writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_small(df: DataFrame, path: str, max_rows: int = 1_000_000) -> str:
    """Driver-side export of a small result (S9).

    Guard: refuses to collect more than ``max_rows`` — the distributed
    sinks below are for anything big.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{n} rows exceed the driver-side export guard ({max_rows}); "
            "use write_parquet instead"
        )
    pdf = df.toPandas()
    if path.endswith(".xlsx"):
        try:
            pdf.to_excel(path, index=False)
        except ImportError:
            path = path[:-5] + ".csv"
            pdf.to_csv(path, index=False)
    else:
        pdf.to_csv(path, index=False)
    return path


def write_parquet(df: DataFrame, path: str, partition_by: tuple[str, ...] = ()) -> None:
    """Distributed sink: parquet, optionally hive-partitioned."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_small_files(
    spark, in_dir: str, out_dir: str, target_files: int
) -> None:
    """Lakehouse maintenance: rewrite a directory of many small
    parquet files into ``target_files`` larger ones (the OPTIMIZE /
    compaction pass every streaming or per-batch-upsert table needs —
    small files destroy scan parallelism economics at 100 TB: each
    file costs a task, a footer read, and an open).

    ``coalesce`` (not repartition) merges partitions WITHOUT a
    shuffle: each output task concatenates several input files.
    Row-level content is unchanged (verified by exceptAll in tests).
    """
    df = spark.read.parquet(in_dir)
    df.coalesce(target_files).write.mode("overwrite").parquet(out_dir)
