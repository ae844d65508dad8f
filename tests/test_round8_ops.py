"""Semantic unit tests for the new round-8 operators — hand-built
micro-fixtures with closed-form answers, complementing the DuckDB
parity sweep and the plan-shape assertions."""

from __future__ import annotations

import datetime as dt

import pytest


def test_calibration_bins_exact_bins_and_rates(spark):
    """Prices land in known $60k bins; urgent labels produce exact
    pos_rate; the top bin clips at bin 9."""
    from soccerpredictor_spark.operators.mlprep import calibration_bins

    rows = [
        (1, "1-URGENT", 30_000.0),   # bin 0, pos
        (2, "5-LOW", 30_000.0),      # bin 0, neg
        (3, "5-LOW", 90_000.0),      # bin 1, neg
        (4, "1-URGENT", 999_999.0),  # clips to bin 9, pos
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    got = {r.bin: r for r in calibration_bins(orders).collect()}
    assert set(got) == {0, 1, 9}
    assert got[0].n == 2 and got[0].n_pos == 1 and got[0].pos_rate == 0.5
    assert got[0].mean_score == pytest.approx(30_000.0 / 600_000.0)
    assert got[1].pos_rate == 0.0
    assert got[9].n == 1 and got[9].n_pos == 1


def test_ks_drift_identical_halves_zero(spark):
    """If both hash-halves see the same value multiset, D = 0. Build
    pairs (2k, 2k+1) that the md5 gate CANNOT split identically in
    general — so instead check the mathematical invariants: D in
    [0, 1], location is an attained value, and n0 + n1 = N."""
    from soccerpredictor_spark.operators.mlprep import ks_drift

    orders = spark.createDataFrame(
        [(k, float(100 + (k % 10))) for k in range(400)],
        ["o_orderkey", "o_totalprice"],
    )
    [r] = ks_drift(orders).collect()
    assert r.n0 + r.n1 == 400
    assert 0.0 <= r.d_stat <= 1.0
    assert r.ks_location in {100.0 + i for i in range(10)}


def test_ks_drift_disjoint_supports_d_one(spark):
    """Force the two samples onto disjoint supports by constructing
    keys whose md5 gate is known, then D must be exactly 1."""
    import hashlib

    from soccerpredictor_spark.operators.mlprep import ks_drift

    def gate(k: int) -> int:
        return int(hashlib.md5(f"ks{k}".encode()).hexdigest()[:8], 16) % 2

    # low values for sample 0, high values for sample 1
    rows = []
    for k in range(200):
        rows.append((k, 10.0 if gate(k) == 0 else 1000.0))
    orders = spark.createDataFrame(rows, ["o_orderkey", "o_totalprice"])
    [r] = ks_drift(orders).collect()
    assert r.d_stat == 1.0
    assert r.ks_location == 10.0  # max gap attained at the low support


def test_ips_matches_hand_computation(spark):
    """Target policy: click for odd users, view for even. Verify IPS
    and SNIPS against a direct python computation."""
    from soccerpredictor_spark.operators.mlprep import ips_policy_eval

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (user, type, value): user 1 odd -> target=click
        (1, "click", 10.0),  # match, r=10
        (1, "view", 99.0),   # no match
        (2, "view", 4.0),    # user 2 even -> target=view: match
        (2, "purchase", 50.0),  # filtered out (not a logged action)
        (3, "view", 8.0),    # user 3 odd -> target=click: no match
    ]
    events = spark.createDataFrame(
        [(u, t0, i, ty, v) for i, (u, ty, v) in enumerate(rows)],
        ["user_id", "ts", "event_id", "event_type", "value"],
    )
    [r] = ips_policy_eval(events).collect()
    assert r.n_logged == 4 and r.n_matched == 2
    assert r.ips_value == pytest.approx((10.0 + 4.0) * 2 / 4)
    assert r.snips_value == pytest.approx((10.0 + 4.0) / 2)


def test_negative_sampling_excludes_positives(spark):
    """Every user gets exactly K candidates; any candidate colliding
    with a positive is excluded, so n_neg + (collisions) = K and the
    neg_item_sum never counts a positive item."""
    import hashlib

    from soccerpredictor_spark.operators.mlprep import (
        NEG_K,
        negative_sampling,
    )

    n_items = 10
    part = spark.createDataFrame(
        [(i,) for i in range(1, n_items + 1)], ["p_partkey"]
    )
    orders = spark.createDataFrame(
        [(1, 100), (2, 200)], ["o_custkey", "o_orderkey"]
    )
    lineitem = spark.createDataFrame(
        [(100, 1), (100, 2), (200, 3)], ["l_orderkey", "l_partkey"]
    )
    got = {
        r.user_id: r
        for r in negative_sampling(orders, lineitem, part).collect()
    }

    def cand_items(u: int) -> list[int]:
        out = []
        for k in range(1, NEG_K + 1):
            h = int(hashlib.md5(f"neg{u}:{k}".encode()).hexdigest()[:8], 16)
            out.append(h % n_items + 1)
        return out

    pos = {1: {1, 2}, 2: {3}}
    for u in (1, 2):
        expected_negs = [i for i in cand_items(u) if i not in pos[u]]
        assert got[u].n_pos == len(pos[u])
        assert got[u].n_neg == len(expected_negs)
        assert got[u].neg_item_sum == sum(expected_negs)


def test_twap_weights_by_holding_time(spark):
    """value 10 held 3s then value 20 held 1s -> twap 12.5; the last
    event is right-open (contributes no weight); single-event users
    get NULL twap."""
    from soccerpredictor_spark.operators.windows import time_weighted_average

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        (1, s(0), 1, 10.0),
        (1, s(3), 2, 20.0),
        (1, s(4), 3, 999.0),  # last -> no weight
        (2, s(0), 4, 7.0),    # single event
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {r.user_id: r for r in time_weighted_average(events).collect()}
    assert got[1].twap == pytest.approx((10.0 * 3 + 20.0 * 1) / 4)
    assert got[1].total_us == 4_000_000
    assert got[2].twap is None and got[2].n_events == 1


def test_rfm_monotone_segments(spark):
    """A deliberately spread fixture: the all-best customer lands in a
    strictly higher segment than the all-worst one, and segment codes
    stay within 111..444."""
    from soccerpredictor_spark.operators.windows import rfm_segments

    base = dt.date(2024, 1, 1)
    rows = []
    oid = 0
    # 8 customers with increasing recency/frequency/monetary together
    for c in range(8):
        for k in range(c + 1):  # frequency c+1
            rows.append(
                (oid, c, base + dt.timedelta(days=10 * c), 1000.0 * (c + 1))
            )
            oid += 1
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    segs = rfm_segments(orders).collect()
    codes = [r.rfm for r in segs]
    assert all(111 <= c <= 444 for c in codes)
    assert min(codes) == 111  # the all-worst customer
    assert max(codes) == 444  # the all-best customer
    assert sum(r.n_customers for r in segs) == 8


def test_simpson_diversity_extremes(spark):
    """All-identical tokens -> collision_prob 1, diversity 0; an
    all-distinct source -> collision_prob 0, diversity 1."""
    from soccerpredictor_spark.operators.textops import simpson_diversity

    docs = spark.createDataFrame(
        [
            ("mono", "spam spam spam spam"),
            ("rich", "alpha beta gamma delta"),
        ],
        ["source", "text"],
    )
    got = {r.source: r for r in simpson_diversity(docs).collect()}
    assert got["mono"].n_tokens == 4 and got["mono"].n_distinct == 1
    assert got["mono"].collision_prob == 1.0 and got["mono"].diversity == 0.0
    assert got["rich"].collision_prob == 0.0 and got["rich"].diversity == 1.0


def test_edit_distance_join_finds_all_variant_types(spark):
    """Substitution, deletion and insertion neighbors are all found;
    a distance-2 pair is not."""
    from soccerpredictor_spark.operators.textops import edit_distance_join

    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "hellp world"),   # substitution of one char
            (3, "helo world"),    # deletion
            (4, "hhello world"),  # insertion (prefix still unique in 12)
            (5, "completely different"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.key_a, r.key_b): r.dist
        for r in edit_distance_join(docs).collect()
    }
    assert ("hello world", "hellp world") in pairs
    assert ("hello world", "helo world") in pairs
    assert all(d <= 1 for d in pairs.values())
    # the distance-2 pair (helo vs hellp) must NOT appear
    assert ("helo world", "hellp world") not in pairs


def test_basket_rules_exact_lift(spark):
    """3 orders: {1,2}, {1,2}, {1,3}. Rule (1,2): c_xy=2, c_1=3,
    c_2=2, n=3 -> lift = 3*2/(3*2) = 1; support 2/3; confidence 2/3."""
    from soccerpredictor_spark.operators.joins import basket_rules

    orders = spark.createDataFrame(
        [(100,), (200,), (300,)], ["o_orderkey"]
    )
    lineitem = spark.createDataFrame(
        [(100, 1), (100, 2), (200, 1), (200, 2), (300, 1), (300, 3)],
        ["l_orderkey", "l_partkey"],
    )
    rules = {(r.item_a, r.item_b): r for r in basket_rules(orders, lineitem).collect()}
    r12 = rules[(1, 2)]
    assert (r12.c_xy, r12.c_x, r12.c_y) == (2, 3, 2)
    assert r12.support == pytest.approx(2 / 3)
    assert r12.confidence == pytest.approx(2 / 3)
    assert r12.lift == pytest.approx(1.0)
    r13 = rules[(1, 3)]
    assert r13.lift == pytest.approx(3 * 1 / (3 * 1))
