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
        # The driver's value hash is type-sensitive: an int64 3 and a
        # float64 3.0 hash differently even though == passes.  DuckDB
        # types SUM(<any integer>) as HUGEINT (-> float64 in pandas),
        # so numeric *kind* must agree between the two engines.
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if {ka, kb} <= {"i", "u", "f"}:
            assert (ka in "iu") == (kb in "iu"), (
                f"{name}.{col}: numeric kind mismatch {a[col].dtype} vs "
                f"{b[col].dtype} — likely an un-cast integer SUM in the "
                f"oracle (DuckDB HUGEINT); wrap it in CAST(... AS BIGINT)"
            )
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


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_surfaces_no_hugeint(name, ddb):
    """Type-lint every oracle: DuckDB types SUM(<integer>) as HUGEINT
    (int128), which pandas widens to float64 while Spark emits int64 —
    breaking the driver's type-sensitive value hash even when every
    value compares equal.  Planning the query (no execution) is enough
    to surface the result types."""
    rel = ddb.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
    ]
    assert not bad, (
        f"{name}: oracle surfaces HUGEINT columns {bad} — wrap the "
        f"aggregate in CAST(... AS BIGINT)"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0
