"""Semantic unit tests for the new round-9 operators — hand-built
micro-fixtures with closed-form answers, complementing the DuckDB
parity sweep and the plan-shape assertions."""

from __future__ import annotations

import datetime as dt

import pytest


def test_pr_auc_perfect_and_worst_ranking(spark):
    """A score that ranks every positive above every negative has
    AP = 1; one that ranks them all below has AP = sum_k k/(N+k)/P."""
    from soccerpredictor_spark.operators.mlprep import pr_auc

    def orders(rows):
        return spark.createDataFrame(
            [(i, p, float(s)) for i, (p, s) in enumerate(rows)],
            ["o_orderkey", "o_orderpriority", "o_totalprice"],
        )

    perfect = orders(
        [("1-URGENT", 100), ("1-URGENT", 90), ("5-LOW", 10), ("5-LOW", 5)]
    )
    [r] = pr_auc(perfect).collect()
    assert r.n_pos == 2 and r.n_neg == 2
    assert r.average_precision == 1.0

    worst = orders(
        [("5-LOW", 100), ("5-LOW", 90), ("1-URGENT", 10), ("1-URGENT", 5)]
    )
    [r] = pr_auc(worst).collect()
    # thresholds descending: positives at ranks 3 and 4 ->
    # AP = (1*(1/3) + 1*(2/4)) / 2
    assert abs(r.average_precision - (1 / 3 + 2 / 4) / 2) < 1e-12


def test_decision_stump_perfectly_separable(spark):
    """Labels separate exactly at a price threshold: the stump finds
    it and both sides are pure (purity = nL + nR = n)."""
    from soccerpredictor_spark.operators.mlprep import decision_stump

    rows = [(i, "1-URGENT", 10.0 + i) for i in range(5)] + [
        (10 + i, "5-LOW", 100.0 + i) for i in range(5)
    ]
    orders = spark.createDataFrame(
        rows, ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    [r] = decision_stump(orders).collect()
    # split at the largest positive score (cents)
    assert r.split_cents == 1400
    assert r.n_left == 5 and r.pos_left == 5
    assert r.n_right == 5 and r.pos_right == 0
    assert r.purity == 10.0  # 25/5 + 25/5


def test_kaplan_meier_hand_case(spark):
    """Three users: lifetimes 0h, 1h, 2h; the 2h user's last event is
    at the corpus max (censored), the others churn. S(0) = 2/3,
    S(1) = 1/3, S(2) = 1/3 (censored lifetime contributes no
    factor)."""
    from soccerpredictor_spark.operators.timeseries import kaplan_meier

    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: single event long ago -> lifetime 0, churned
        (1, t0, 1),
        # user 2: span 1h, last event long ago -> churned
        (2, t0, 2), (2, t0 + h, 3),
        # user 3: span 2h ending at corpus max -> censored
        (3, t0 + dt.timedelta(days=30), 4),
        (3, t0 + dt.timedelta(days=30) + 2 * h, 5),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    got = {r.life_h: r for r in kaplan_meier(ev).collect()}
    assert got[0].n_risk == 3 and got[0].n_churned == 1
    assert abs(got[0].survival - 2 / 3) < 1e-12
    assert got[1].n_risk == 2 and got[1].n_churned == 1
    assert abs(got[1].survival - (2 / 3) * (1 / 2)) < 1e-12
    assert got[2].n_risk == 1 and got[2].n_churned == 0
    assert got[2].n_censored == 1
    assert abs(got[2].survival - (2 / 3) * (1 / 2)) < 1e-12


def test_cohen_kappa_perfect_agreement_is_one(spark):
    """Documents whose text contains their own language's markers are
    all predicted correctly -> Po = 1, kappa = 1 (multi-class mix so
    Pe < 1)."""
    from soccerpredictor_spark.operators.textops import cohen_kappa

    rows = [
        (1, "the and is of to the and", "en"),
        (2, "el la los de que el la", "es"),
        (3, "der und die das ist der", "de"),
        (4, "the of and to is in the", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    [r] = cohen_kappa(docs).collect()
    assert r.n_agree == 4 and r.po == 1.0
    assert r.kappa == 1.0


def test_hll_distinct_estimate_in_error_band(spark):
    """At n >> m the raw HLL estimate lands within a few standard
    errors (1.04/sqrt(256) ~ 6.5%) of the exact distinct."""
    from soccerpredictor_spark.operators.sketch import hll_distinct

    ev = spark.range(0, 20_000).select(F_col("id").alias("event_id"))
    [r] = hll_distinct(ev).collect()
    assert r.exact_distinct == 20_000
    assert abs(r.rel_error) < 0.2  # ~3 sigma of the 6.5% band


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_temperature_mix_sqrt_weights(spark):
    """Sources with 1 and 4 docs get weights 1 and 2: shares 1/3 and
    2/3 — flatter than the natural 1/5:4/5 mix, steeper than
    uniform."""
    from soccerpredictor_spark.operators.textops import temperature_mix

    rows = [(0, "a")] + [(i, "b") for i in range(1, 5)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    got = {r.source: r for r in temperature_mix(docs).collect()}
    assert got["a"].weight == 1.0 and got["b"].weight == 2.0
    assert abs(got["a"].share - 1 / 3) < 1e-12
    assert abs(got["b"].share - 2 / 3) < 1e-12
    assert got["a"].quota + got["b"].quota <= 10_000


def test_url_dedup_variants_collapse(spark):
    """doc_ids 0 and 40 share source+path-key: their case/utm/slash/
    fragment variants canonicalize to ONE url with 2 raw variants."""
    from soccerpredictor_spark.operators.textops import url_dedup

    docs = spark.createDataFrame(
        [(0, "src0"), (40, "src0")], ["doc_id", "source"]
    )
    rows = url_dedup(docs).collect()
    assert len(rows) == 1
    [r] = rows
    assert r.url_canonical == "https://www.example.com/src0/page-0"
    assert r.n_urls == 2 and r.n_raw_variants == 2 and r.keep_doc_id == 0


def test_media_phash_locality_and_exact_dup(spark):
    """Byte-identical payloads collide at hamming 0; a payload with a
    few flipped bytes stays within the near-dup hamming budget while
    an unrelated payload does not pair at all."""
    from soccerpredictor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_phash_neardup,
    )

    base = bytes([(7 * i) % 256 for i in range(640)])
    tweaked = bytearray(base)
    for i in range(0, 640, 160):  # perturb 4 of 640 bytes
        tweaked[i] = (tweaked[i] + 128) % 256
    other = bytes([(13 * i + 91) % 256 for i in range(640)])
    rows = [
        (1, "image", "application/x-fake-image", base, {}),
        (2, "image", "application/x-fake-image", bytes(base), {}),
        (3, "image", "application/x-fake-image", bytes(tweaked), {}),
        (4, "image", "application/x-fake-image", other, {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.media_a, r.media_b): r.hamming for r in media_phash_neardup(media).collect()}
    assert pairs[(1, 2)] == 0  # exact dup
    assert (1, 3) in pairs and pairs[(1, 3)] <= 8  # near dup survives
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_perplexity_filter_flags_rare_bigram_doc(spark):
    """Docs repeating a common bigram score 0 rare; a doc made of
    one-off bigrams scores a higher rare rate and fails the 1/4
    gate."""
    from soccerpredictor_spark.operators.textops import perplexity_filter

    # 7 high-frequency bigram types (the cycle) outnumber the 3
    # one-off types of doc 4, so the type median lands on a common
    # type and doc 4's bigrams all fall strictly below it
    common = "one two three four five six seven " * 5
    rows = [
        (1, common.strip()),
        (2, common.strip()),
        (3, common.strip()),
        (4, "zeta eta theta iota"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in perplexity_filter(docs).collect()}
    # the common docs pass the 1/4 gate (only the seam bigram ranks
    # below the type median); the one-off doc is all-rare and fails
    assert got[1].kept == 1
    assert got[4].rare_rate == 1.0
    assert got[4].rare_rate > got[1].rare_rate
    assert got[4].kept == 0


def test_mutual_knn_reciprocity(spark):
    """Every mutual pair must appear in BOTH directions of the kNN
    graph; a vector excluded from its neighbor's top-k produces no
    pair."""
    from soccerpredictor_spark.operators.scale import clear_caches
    from soccerpredictor_spark.operators.similarity import knn_graph, mutual_knn

    clear_caches()

    def v(axis, wobble=0.0):
        e = [0.0] * 64
        e[axis] = 1.0
        e[(axis + 1) % 64] = wobble
        return e

    rows = [
        (1, v(0), 0),
        (2, v(0, 0.1), 0),
        (3, v(7), 1),
        (4, v(7, 0.2), 1),
        (5, [0.5] * 64, 2),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    g = {(r.vec_a, r.vec_b) for r in knn_graph(emb, k=2).collect()}
    pairs = {(r.vec_a, r.vec_b) for r in mutual_knn(emb, k=2).collect()}
    for a, b in pairs:
        assert (a, b) in g and (b, a) in g
    assert (1, 2) in pairs  # closest mutual pair survives
    clear_caches()


def test_item_cf_hand_case(spark):
    """Parts 1,2 co-occur in 2 of their baskets: sim = 2/sqrt(3*3);
    part 3 shares fewer than MIN_CO baskets with anything -> no
    rows."""
    from soccerpredictor_spark.operators.joins import item_cf

    rows = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 3),
        (13, 2), (13, 3),
    ]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    got = {(r.item_a, r.item_b): r for r in item_cf(li).collect()}
    import math

    assert abs(got[(1, 2)].sim - 2 / math.sqrt(3 * 3)) < 1e-12
    assert got[(1, 2)].c_xy == 2 and got[(2, 1)].c_xy == 2
    assert not any(3 in k for k in got)  # below the support floor


def test_cms_merge_audit_always_equal(spark):
    """CMS linearity: shard grids summed cell-wise EQUAL the whole
    grid — zero divergence on any input."""
    from soccerpredictor_spark.operators.sketch import cms_merge_audit

    ev = spark.range(0, 5000).selectExpr("id AS event_id", "id % 97 AS user_id")
    [r] = cms_merge_audit(ev).collect()
    assert r.n_cells == r.n_equal
    assert r.max_divergence == 0


def test_seasonal_decompose_constant_series(spark):
    """A constant hourly series: trend = the constant, seasonal = 0,
    remainder = 0 at every full-window hour."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import seasonal_decompose

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i * 10 + j, t0 + dt.timedelta(hours=i), 1, "click")
        for i in range(72)
        for j in range(3)  # 3 events every hour for 3 days
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = seasonal_decompose(ev).collect()
    assert len(got) == 72 - 24  # 12 edge hours trimmed each side
    for r in got:
        assert r.cnt == 3 and r.trend == 3.0
        assert r.seasonal == 0.0 and r.remainder == 0.0


def test_graph_bfs_seed_distances(spark):
    """A path-shaped co-activity graph: seeds at distance 0, their
    neighbors at 1, etc.; the distance is the fewest hops."""
    import datetime as dt

    from soccerpredictor_spark.operators.graph import graph_bfs
    from soccerpredictor_spark.operators.scale import clear_caches

    clear_caches()
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users u and u+1 share buckets b(u) twice -> edge weight 2 (a
    # path 1-2-3-4-5); bucket = 900s windows
    for u in range(1, 5):
        for rep in range(2):
            b = t0 + dt.timedelta(seconds=900 * (u * 10 + rep))
            for user in (u, u + 1):
                rows.append((eid, b, user, "click")); eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {r.user_id: r.dist for r in graph_bfs(ev).collect()}
    # seeds = 3 smallest connected users (1, 2, 3) at dist 0
    assert got[1] == 0 and got[2] == 0 and got[3] == 0
    assert got[4] == 1 and got[5] == 2
    clear_caches()


def test_graph_bfs_at_cap_returns_final_capped_distances(spark):
    """Seed eccentricity >= max_hops: capped BFS distances are
    provably final after max_hops relaxation rounds (each round
    extends exactly one hop; dist is filtered to <= max_hops), so the
    operator must RETURN the capped rows — matching the recursive-CTE
    oracle — not raise a non-convergence witness (round-9 ADVICE)."""
    import datetime as dt

    from soccerpredictor_spark.operators.graph import graph_bfs
    from soccerpredictor_spark.operators.scale import clear_caches

    clear_caches()
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # a 1-2-...-8 path; with seeds {1,2,3} and max_hops=2, node 6 is
    # at capped distance... nodes 7,8 are beyond the cap (excluded);
    # the witness can never stabilize within 2 rounds
    for u in range(1, 8):
        for rep in range(2):
            b = t0 + dt.timedelta(seconds=900 * (u * 10 + rep))
            for user in (u, u + 1):
                rows.append((eid, b, user, "click")); eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {r.user_id: r.dist for r in graph_bfs(ev, max_hops=2).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 2}
    clear_caches()


def test_quantile_normalize_identical_distributions(spark):
    """After normalization every feature's min/max (and by extension
    the whole empirical distribution) is identical across features —
    the property the operator exists to enforce."""
    from soccerpredictor_spark.operators.mlprep import quantile_normalize

    rows = [
        (1, 1, 5.0, 100.0, 0.01),
        (1, 2, 3.0, 900.0, 0.09),
        (2, 1, 9.0, 500.0, 0.05),
        (2, 2, 7.0, 300.0, 0.03),
    ]
    li = spark.createDataFrame(
        rows,
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )
    got = quantile_normalize(li).collect()
    assert len(got) == 3
    mins = {r.norm_min for r in got}
    maxs = {r.norm_max for r in got}
    assert len(mins) == 1 and len(maxs) == 1  # shared distribution
    assert all(r.n_rows == 4 for r in got)


def test_jl_projection_ratio_near_one(spark):
    """For random-ish vectors the aggregate distortion ratio
    E[d2_proj]/(K*d2_orig) concentrates near 1 (JL property)."""
    from soccerpredictor_spark.operators.similarity import jl_projection

    import hashlib

    def vec(i):
        out = []
        for d in range(64):
            h = hashlib.md5(f"v:{i}:{d}".encode()).hexdigest()
            out.append((int(h[:4], 16) / 65535.0) - 0.5)
        return out

    emb = spark.createDataFrame(
        [(i, vec(i), 0) for i in range(40)], ["vec_id", "embedding", "label"]
    )
    [r] = jl_projection(emb).collect()
    assert r.n_pairs == 39
    assert 0.5 < r.agg_ratio < 1.5  # concentration, loose band
    assert r.min_ratio <= r.agg_ratio <= r.max_ratio


def test_zipf_audit_rank_one_is_top_term(spark):
    """Rank 1 is the most frequent term; shares are freq-ordered by
    construction of the fixture."""
    from soccerpredictor_spark.operators.textops import zipf_audit

    docs = spark.createDataFrame(
        [(1, "aa aa aa aa bb bb cc")], ["doc_id", "text"]
    )
    got = {r.rank: r for r in zipf_audit(docs).collect()}
    assert got[1].term == "aa" and got[1].freq == 4
    assert got[1].zipf_share == 4 / 7
    assert got[2].term == "bb" and got[2].rank_x_freq == 4
    assert got[3].term == "cc" and got[3].rank_x_freq == 3


def test_cluster_labels_distinctive_terms(spark):
    """Two exact-dup families: each multi-doc cluster's top label is
    a term distinctive to that family, not the shared filler."""
    from soccerpredictor_spark.operators.dedup import cluster_labels
    from soccerpredictor_spark.operators.scale import clear_caches

    clear_caches()
    fam_a = "alpha beta gamma delta epsilon common filler words here now"
    fam_b = "zeta eta theta iota kappa common filler words here now"
    docs = spark.createDataFrame(
        [(1, fam_a), (2, fam_a), (3, fam_b), (4, fam_b), (5, "totally unrelated text nothing shared")],
        ["doc_id", "text"],
    )
    rows = cluster_labels(docs).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.term)
    assert set(by_cluster) == {1, 3}
    assert "alpha" in by_cluster[1] or "beta" in by_cluster[1]
    assert "zeta" in by_cluster[3] or "eta" in by_cluster[3]
    assert "common" not in by_cluster[1] and "common" not in by_cluster[3]
    clear_caches()


def test_concurrency_profile_hand_case(spark):
    """Three overlapping sessions within one hour peak at 3; a
    touching end/start at the same microsecond does NOT double-count
    (the end processes first)."""
    import datetime as dt

    from soccerpredictor_spark.operators.windows import concurrency_profile

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # three users whose sessions overlap at 10:10
        (1, m(0), 1, "click"), (1, m(10), 2, "click"),
        (2, m(5), 3, "click"), (2, m(12), 4, "click"),
        (3, m(8), 5, "click"), (3, m(15), 6, "click"),
        # user 4 starts EXACTLY when user 3's session ends
        (4, m(15), 7, "click"), (4, m(20), 8, "click"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    [r] = concurrency_profile(ev).collect()
    assert r.starts == 4 and r.ends == 4
    assert r.max_concurrency == 3  # the touch does not make it 4


def test_conversion_lag_buckets(spark):
    """Purchases 30s and 90s after the last click land in minute
    buckets 0 and 1; a purchase with no prior click lands in -1."""
    import datetime as dt

    from soccerpredictor_spark.operators.windows import conversion_lag

    t0 = dt.datetime(2024, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        (1, s(0), 1, "click"), (1, s(30), 2, "purchase"),
        (2, s(0), 3, "click"), (2, s(90), 4, "purchase"),
        (3, s(0), 5, "purchase"),  # organic
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {r.lag_min: r for r in conversion_lag(ev).collect()}
    assert got[0].n_conversions == 1 and got[1].n_conversions == 1
    assert got[-1].n_conversions == 1
    assert abs(sum(r.share for r in got.values()) - 1.0) < 1e-12
