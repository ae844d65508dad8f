"""Round-9-STAGED operators (register in the round-10 driver window
when the r4-cohort rotation frees slots): semantic unit tests with
closed-form answers PLUS a direct Spark-vs-DuckDB value parity check
for each — the same gate registered entries get from
test_oracle_parity, run here because staged operators are not yet in
``queries()``/``oracle_sql()``.

Staged set: pq_recall_eval, theil_sen_trend, neyman_allocation,
rare_category_collapse, hll_merge_audit, cms_heavy_change, mrr_at_k.
"""

from __future__ import annotations

import datetime as dt

import pytest

SF = "/root/testdata/sf0.001"

STAGED = [
    # GRADUATION (round-15 housekeeping, r14 verdict #6): all 7
    # round-9 staged ops registered in the round-10 window; their
    # parity/plan gates run via tests/test_oracle_parity.py like every
    # registered entry. Closed-form unit tests below are kept.
]


@pytest.mark.parametrize("name,module,table", STAGED)
def test_staged_parity_vs_duckdb(spark, name, module, table):
    """Every staged operator's Spark result must match its DuckDB
    twin exactly on the sf0.001 fixtures (rows, columns, values) —
    the registration-readiness gate."""
    import importlib

    import duckdb
    import pandas as pd

    from soccerpredictor_spark.sources.catalog import read_table

    mod = importlib.import_module(module)
    sdf = getattr(mod, name)(read_table(spark, SF, table)).toPandas()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    odf = con.execute(getattr(mod, f"{name}_sql")()).fetchdf()
    assert len(sdf) == len(odf), f"{name}: row count"
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    assert sc == oc, f"{name}: columns {sc} vs {oc}"
    a = sdf[sc].sort_values(sc).reset_index(drop=True)
    b = odf[oc].sort_values(oc).reset_index(drop=True)
    for c in sc:
        pd.testing.assert_series_equal(
            a[c], b[c], check_dtype=False, check_names=False, check_exact=True
        )


def test_theil_sen_exact_line_with_outlier(spark):
    """Counts on an exact line + one wild outlier hour: the Sen slope
    recovers the line (the median shrugs the outlier off), where an
    OLS slope would not."""
    from soccerpredictor_spark.operators.timeseries import theil_sen_trend

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(8):
        # cnt = 3 + 2h events in hour h  (+ outlier burst at h=3)
        n = 3 + 2 * h + (500 if h == 3 else 0)
        for _ in range(n):
            rows.append((eid, t0 + dt.timedelta(hours=h, minutes=1), 1, "click"))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    [r] = theil_sen_trend(ev).collect()
    assert r.n_points == 8
    assert r.sen_slope == 2.0  # the outlier hour does not move the median


def test_neyman_zero_variance_stratum_gets_zero_weight(spark):
    """A stratum whose prices are identical has S_h = 0 and therefore
    quota 0; the volatile stratum takes the whole budget."""
    from soccerpredictor_spark.operators.mlprep import neyman_allocation

    rows = [(i, "1-URGENT", 100.0) for i in range(10)] + [
        (100 + i, "5-LOW", float(100 + 50 * i)) for i in range(10)
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    got = {r.stratum: r for r in neyman_allocation(orders).collect()}
    assert got["1-URGENT"].sd_cents == 0.0 and got["1-URGENT"].quota == 0
    assert got["5-LOW"].share == 1.0


def test_rare_category_collapse_partitions_rows(spark):
    """Top-K kept categories + OTHER must partition all rows; OTHER
    reports how many source categories it swallowed."""
    from soccerpredictor_spark.operators.mlprep import (
        COLLAPSE_KEEP_K,
        rare_category_collapse,
    )

    # 25 categories: cat c has (26 - c) rows -> top 20 kept, 5 folded
    rows = []
    k = 0
    for c in range(25):
        for _ in range(26 - c):
            rows.append((k, c))
            k += 1
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    got = rare_category_collapse(li).collect()
    other = [r for r in got if r.category == "OTHER"]
    kept = [r for r in got if r.category != "OTHER"]
    assert len(kept) == COLLAPSE_KEEP_K and len(other) == 1
    assert other[0].n_source_categories == 5
    assert sum(r.n for r in got) == len(rows)
    assert abs(sum(r.share for r in got) - 1.0) < 1e-12


def test_hll_merge_audit_registers_equal(spark):
    """HLL merge is exact: sharded max-merged registers equal the
    whole-stream registers on any input."""
    from soccerpredictor_spark.operators.sketch import hll_merge_audit

    ev = spark.range(0, 10_000).selectExpr("id AS event_id")
    [r] = hll_merge_audit(ev).collect()
    assert r.n_registers == r.n_equal
    assert r.s_whole == r.s_merged


def test_cms_heavy_change_flags_mover(spark):
    """A user whose traffic jumps from 5 to 100 events between halves
    tops the change list with exact_change = 95; stable users rank
    below."""
    import datetime as dtm

    from soccerpredictor_spark.operators.sketch import cms_heavy_change

    t0 = dtm.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def emit(user, when, n):
        nonlocal eid
        for _ in range(n):
            rows.append((eid, when, user, "click"))
            eid += 1

    early, late = t0, t0 + dtm.timedelta(hours=10)
    emit(1, early, 5); emit(1, late, 100)   # the mover: +95
    emit(2, early, 50); emit(2, late, 52)   # stable: +2
    emit(3, early, 40); emit(3, late, 40)   # stable: 0
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = cms_heavy_change(ev).collect()
    assert got[0].user_id == 1 and got[0].exact_change == 95
    assert abs(got[0].est_change) >= abs(got[1].exact_change)


def test_mrr_first_hit_rank(spark):
    """Customer 1's first relevant item ranks 2nd -> RR = 1/2;
    customer 2 has no relevant item in top K -> RR = 0; MRR = 1/4."""
    from soccerpredictor_spark.operators.mlprep import mrr_at_k

    rows = [
        (1, 1, "O", 100.0),  # rank 1, not relevant
        (2, 1, "F", 90.0),   # rank 2, relevant -> RR 1/2
        (3, 1, "F", 80.0),
        (4, 2, "O", 50.0),
        (5, 2, "P", 40.0),
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    )
    [r] = mrr_at_k(orders).collect()
    assert r.n_queries == 2 and r.n_hit == 1
    assert r.mrr == 0.25
