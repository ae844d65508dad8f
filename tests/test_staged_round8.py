"""Semantic unit tests for the round-7-staged operators registered in
round 8 — hand-built micro-fixtures with known closed-form answers,
complementing the DuckDB value-parity sweep (test_oracle_parity) and
the plan-shape assertions (test_plans)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def test_grouped_ols_recovers_exact_line(spark):
    """Points on y = 2x + 10 (prices in dollars) must fit slope 2,
    intercept 10, r2 = 1 exactly — closed form over exact sums."""
    from soccerpredictor_spark.operators.mlprep import OLS_ANCHOR, grouped_ols

    anchor = dt.date(1992, 1, 1)
    assert str(anchor) == OLS_ANCHOR
    rows = [
        (i, 1, anchor + dt.timedelta(days=x), 2.0 * x + 10.0)
        for i, x in enumerate([0, 1, 2, 5, 10])
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    customer = spark.createDataFrame([(1, 7)], ["c_custkey", "c_nationkey"])
    nation = spark.createDataFrame([(7, "FRANCE")], ["n_nationkey", "n_name"])
    [r] = grouped_ols(orders, customer, nation).collect()
    assert r.n_name == "FRANCE" and r.n_rows == 5
    assert r.slope_per_day == 2.0
    assert r.intercept == 10.0
    assert r.r2 == 1.0


def test_grouped_ols_zero_variance_group_nulls(spark):
    """A nation whose orders all share one date has no defined trend:
    slope/intercept/r2 must be NULL, not a division blow-up."""
    from soccerpredictor_spark.operators.mlprep import grouped_ols

    d = dt.date(1995, 6, 1)
    orders = spark.createDataFrame(
        [(1, 1, d, 100.0), (2, 1, d, 200.0)],
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    customer = spark.createDataFrame([(1, 7)], ["c_custkey", "c_nationkey"])
    nation = spark.createDataFrame([(7, "KENYA")], ["n_nationkey", "n_name"])
    [r] = grouped_ols(orders, customer, nation).collect()
    assert r.slope_per_day is None and r.intercept is None and r.r2 is None


def test_ndcg_perfect_and_worst_ranking(spark):
    """Customer 1 ranks its only relevant order first -> dcg = disc[1]
    and ndcg = 1. Customer 2 ranks its relevant order last of 3 ->
    ndcg = disc[3]/disc[1] < 1. Customer 3 has no relevant order ->
    dcg 0.0 (the CASE sums to zero) and ndcg NULL (idcg undefined)."""
    from soccerpredictor_spark.operators.mlprep import ndcg_at_k

    rows = [
        # custkey, orderkey, status (F = relevant), totalprice (score)
        (1, 10, "F", 300.0),
        (1, 11, "O", 200.0),
        (2, 20, "O", 300.0),
        (2, 21, "O", 200.0),
        (2, 22, "F", 100.0),
        (3, 30, "O", 50.0),
    ]
    orders = spark.createDataFrame(
        rows, ["o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    got = {r.o_custkey: r for r in ndcg_at_k(orders).collect()}
    assert got[1].ndcg == 1.0
    d1, d3 = 1.0, 0.5  # 1/log2(2), 1/log2(4) are exact in the ladder
    assert got[2].dcg == d3
    assert got[2].ndcg == pytest.approx(d3 / d1)
    assert got[3].dcg == 0.0 and got[3].ndcg is None


def test_ab_ztest_known_counts(spark):
    """Hand-check the pooled two-proportion z on the operator's own
    arm assignment: recompute the md5 gate in python for each user and
    verify conversion counts and z match the closed form."""
    import hashlib

    from soccerpredictor_spark.operators.mlprep import ab_test_ztest

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(1, 41):
        rows.append((u, t0, eid, "view"))
        eid += 1
        if u % 3 == 0:  # every third user converts
            rows.append((u, t0 + dt.timedelta(minutes=1), eid, "purchase"))
            eid += 1
    events = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    [r] = ab_test_ztest(events).collect()
    arm = {
        u: int(hashlib.md5(f"ab{u}".encode()).hexdigest()[:8], 16) % 2
        for u in range(1, 41)
    }
    n0 = sum(1 for u, a in arm.items() if a == 0)
    conv0 = sum(1 for u, a in arm.items() if a == 0 and u % 3 == 0)
    n1, conv1 = 40 - n0, sum(
        1 for u, a in arm.items() if a == 1 and u % 3 == 0
    )
    assert (r.n0, r.conv0, r.n1, r.conv1) == (n0, conv0, n1, conv1)
    p0, p1 = conv0 / n0, conv1 / n1
    pooled = (conv0 + conv1) / (n0 + n1)
    se = math.sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1))
    assert r.z == pytest.approx((p1 - p0) / se)


def test_attribution_window_and_last_touch(spark):
    """Purchase credits the MOST RECENT source event; an out-of-window
    source (> 7 days) and a no-source purchase both fall to 'none'."""
    from soccerpredictor_spark.operators.windows import attribution

    t0 = dt.datetime(2024, 1, 1)
    m = lambda mins: t0 + dt.timedelta(minutes=mins)  # noqa: E731
    rows = [
        # user 1: view then click then purchase -> credited to click
        (1, m(0), 1, "view"),
        (1, m(5), 2, "click"),
        (1, m(10), 3, "purchase"),
        # user 2: view 8 days before purchase -> out of window, none
        (2, m(0), 4, "view"),
        (2, t0 + dt.timedelta(days=8), 5, "purchase"),
        # user 3: purchase with no prior source -> none
        (3, m(0), 6, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type"]
    )
    got = {r.credited_source: r for r in attribution(events).collect()}
    assert set(got) == {"click", "none"}
    assert got["click"].n_purchases == 1
    assert got["click"].total_delay_us == 5 * 60 * 1_000_000
    assert got["none"].n_purchases == 2
    assert got["none"].total_delay_us is None


def test_corr_matrix_exact_cells(spark):
    """l_extendedprice = 3*l_quantity -> corr exactly 1; l_discount
    constant -> its cells NULL; all six upper-triangle pairs emitted."""
    from soccerpredictor_spark.operators.windows import corr_matrix

    rows = [
        (1.0, 3.0, 0.05, 0.01),
        (2.0, 6.0, 0.05, 0.03),
        (3.0, 9.0, 0.05, 0.02),
    ]
    li = spark.createDataFrame(
        rows, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    got = {(r.col_x, r.col_y): r for r in corr_matrix(li).collect()}
    assert len(got) == 6
    assert got[("l_quantity", "l_extendedprice")].corr == 1.0
    for pair, r in got.items():
        if "l_discount" in pair:
            assert r.corr is None, pair
        assert r.n_rows == 3


def test_subsample_ci_shape_and_bracketing(spark):
    """32 replicate rows; every replicate is nonempty at this size;
    interval endpoints are the min/max replicate means and bracket
    every replicate mean; point mean is the exact full-data mean."""
    from soccerpredictor_spark.operators.mlprep import (
        CI_REPLICATES,
        subsample_ci,
    )

    orders = spark.createDataFrame(
        [(k, float(100 + k)) for k in range(200)],
        ["o_orderkey", "o_totalprice"],
    )
    rows = subsample_ci(orders).collect()
    assert len(rows) == CI_REPLICATES
    assert [r.rep for r in rows] == list(range(CI_REPLICATES))
    means = [r.rep_mean for r in rows]
    r0 = rows[0]
    assert r0.ci_lo == min(means) and r0.ci_hi == max(means)
    assert r0.n_total == 200
    assert r0.point_mean == pytest.approx(sum(100 + k for k in range(200)) / 200)


def test_conformal_interval_coverage_near_target(spark):
    """With a constant-priority, tight-noise fixture the audit must
    report coverage; qhat is one of the actual absolute residuals
    (a disc selection, not interpolation)."""
    from soccerpredictor_spark.operators.mlprep import conformal_interval

    rows = [
        (k, "1-URGENT", 1000.0 + (k % 21) - 10.0) for k in range(400)
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    [r] = conformal_interval(orders).collect()
    assert r.n_train + r.n_cal + r.n_test <= 400
    assert 0.0 <= r.coverage <= 1.0
    # qhat must be an achievable residual magnitude (<= max |noise|+|bias|)
    assert 0.0 <= r.qhat <= 11.0
    # the 90%-target interval should cover most of the held-out points
    assert r.coverage >= 0.8


def test_text_canonicalize_dedup_gain(spark):
    """Two docs differing only by case/punct/whitespace collapse to
    one canonical form: distinct_raw 2, distinct_canon 1, gain 1."""
    from soccerpredictor_spark.operators.textops import text_canonicalize

    docs = spark.createDataFrame(
        [
            ("web", "Hello,   World!"),
            ("web", "hello world"),
            ("web", "different text"),
        ],
        ["source", "text"],
    )
    [r] = text_canonicalize(docs).collect()
    assert r.n_docs == 3
    assert r.distinct_raw == 3 and r.distinct_canon == 2
    assert r.dedup_gain == 1
    assert r.n_changed == 1  # only "Hello,   World!" needed normalizing


def test_label_vote_majority_logic(spark):
    """Three crafted docs: all-pass, one-LF, and two-LF documents —
    the majority column keeps exactly the >= 2-vote docs."""
    from soccerpredictor_spark.operators.textops import label_vote

    long_fluent = ("the quick brown fox jumps over the lazy dog " * 6).strip()
    assert len(long_fluent) >= 200 and " the " in long_fluent.lower()
    short_fluent = "a the b"  # keyword only (len < 200, no digits -> digit LF fires too)
    digits_only = "1234567890" * 3  # fails all three
    docs = spark.createDataFrame(
        [("s", long_fluent), ("s", short_fluent), ("s", digits_only)],
        ["source", "text"],
    )
    [r] = label_vote(docs).collect()
    assert r.n_docs == 3
    assert r.fires_len == 1  # only the long doc
    assert r.fires_kw == 2  # long + short fluent
    assert r.fires_digit == 2  # long + short fluent (0% digits)
    assert r.majority_keep == 2  # long (3 votes) + short fluent (2 votes)
    assert r.unanimous == 2  # long doc (1,1,1) and digits doc (0,0,0)
