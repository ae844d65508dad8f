"""Empty-input smoke sweep: every registered query must execute and
return a well-formed (usually zero-row) result when every table is
EMPTY.

Why this matters at 100 TB: partition pruning, a filter that matches
nothing, or a cold-start pipeline regularly hands operators zero rows
— an operator that crashes on the empty relation (divide-by-zero on a
global aggregate, sequence(NULL, NULL), max() of nothing feeding
arithmetic, np.stack of an empty batch) takes the whole job down in
production at the worst possible time. The empty relation is also the
identity element most operator algebra assumes; returning a clean
empty result is part of each operator's contract.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A fixture directory with every driver table present but empty
    (schema cloned from the sf0.001 fixtures via limit(0))."""
    root = str(tmp_path_factory.mktemp("empty_sf"))
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        (
            spark.read.parquet(src)
            .limit(0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(root, f"{t}.parquet"))
        )
    return root


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = entry.queries()[name](spark, empty_sf_dir)
    rows = df.collect()
    # a well-formed result: a real schema and no crash; most queries
    # are empty, a few legitimately emit structural rows (e.g. audits
    # counting zero orphans, recall evals over zero candidates)
    assert df.schema.fieldNames()
    assert isinstance(rows, list)
