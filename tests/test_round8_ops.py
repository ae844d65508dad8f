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


def test_interval_merge_islands(spark):
    """Three events: two overlapping covers merge into one island, a
    distant third opens a second island; covered time never
    double-counts the overlap."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import (
        INTERVAL_COVER_S,
        interval_merge,
    )

    t0 = dt.datetime(2024, 1, 1)
    cover = INTERVAL_COVER_S  # 600 s
    rows = [
        (1, t0, 1),
        (1, t0 + dt.timedelta(seconds=300), 2),  # overlaps the first
        (1, t0 + dt.timedelta(seconds=10_000), 3),  # far -> new island
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    [r] = interval_merge(events).collect()
    assert r.n_islands == 2 and r.n_events == 3
    # island 1 spans 300 + 600 = 900 s, island 2 spans 600 s
    assert r.covered_us == (300 + cover + cover) * 1_000_000
    assert r.max_island_us == (300 + cover) * 1_000_000


def test_linear_interpolate_exact_midpoint(spark):
    """Observations 10.0 at t=0s and 20.0 at t=7200s: the hourly grid
    point at 3600s interpolates to exactly 15.0; grid points on an
    observation return the observation."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import linear_interpolate

    t0 = dt.datetime(2024, 1, 1)  # exactly on the hourly grid
    rows = [
        (1, t0, 1, 10.0),
        (1, t0 + dt.timedelta(seconds=7200), 2, 20.0),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {r.t: r.value_interp for r in linear_interpolate(events).collect()}
    import calendar

    base_us = calendar.timegm(t0.timetuple()) * 1_000_000
    assert got[base_us] == 10.0
    assert got[base_us + 3_600_000_000] == 15.0
    assert got[base_us + 7_200_000_000] == 20.0


def test_linear_interpolate_span_inside_one_grid_cell(spark):
    """A user whose whole observation span sits strictly inside one
    hourly grid cell (no grid point touched) must yield ZERO grid
    rows — not a sequence() boundary crash.  A second user with a
    normal span still interpolates (regression for the round-8
    advice: sequence start > stop for in-cell spans)."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import linear_interpolate

    t0 = dt.datetime(2024, 1, 1, 0, 10)  # off-grid start
    rows = [
        # user 1: 20-minute span strictly inside the 00:00-01:00 cell
        (1, t0, 1, 5.0),
        (1, t0 + dt.timedelta(minutes=20), 2, 7.0),
        # user 2: spans a grid point at 01:00
        (2, t0, 3, 10.0),
        (2, t0 + dt.timedelta(hours=1), 4, 20.0),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = linear_interpolate(events).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r.user_id, []).append(r)
    assert 1 not in by_user  # in-cell span: no grid rows, no crash
    assert len(by_user[2]) == 1  # exactly the 01:00 grid point


def test_rrf_harmonic_beats_rank_sum(spark):
    """Customer with 3 orders where order A is rank (1, 3) and order B
    is rank (2, 2): rrf(A) = 1/61 + 1/63 > rrf(B) = 2/62 — the
    harmonic weighting must pick A (a rank-sum tie would be ambiguous)."""
    import datetime as dt

    from soccerpredictor_spark.operators.mlprep import rrf_fusion

    d = dt.date(2024, 1, 1)
    rows = [
        # orderkey, price rank order, date rank order
        (10, 300.0, d + dt.timedelta(days=0)),  # price r1, date r3
        (11, 200.0, d + dt.timedelta(days=1)),  # price r2, date r2
        (12, 100.0, d + dt.timedelta(days=2)),  # price r3, date r1
    ]
    orders = spark.createDataFrame(
        [(1, k, p, dd) for k, p, dd in rows],
        ["o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"],
    )
    [r] = rrf_fusion(orders).collect()
    assert 1 / 61 + 1 / 63 > 2 / 62  # the fixture's premise
    assert r.best_orderkey in (10, 12)  # the two symmetric (1,3) orders
    assert r.best_orderkey == 10  # tie-break: smaller orderkey
    assert r.rrf == pytest.approx(1 / 61 + 1 / 63)


def test_tokenizer_fertility_known_ratio(spark):
    """'ab cd' -> 2 pieces / 2 words / 4 chars: fertility 1.0, 2.0
    chars per piece; punctuation inflates fertility."""
    from soccerpredictor_spark.operators.textops import tokenizer_fertility

    docs = spark.createDataFrame(
        [("en", "ab cd"), ("de", "ab, cd!")],
        ["lang", "text"],
    )
    got = {r.lang: r for r in tokenizer_fertility(docs).collect()}
    assert got["en"].fertility == 1.0
    assert got["en"].chars_per_piece == 2.0
    assert got["de"].n_pieces == 4  # ab , cd !
    assert got["de"].fertility == 2.0


def test_media_scene_segments_bounds(spark):
    """Every video reports exactly SCENE_FRAMES frames and a scene
    count in [1, n_frames]; only kind == video rows appear."""
    from soccerpredictor_spark.operators.multimodal import (
        SCENE_FRAMES,
        media_from_documents,
        media_scene_segments,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i}", "en", "web", 10) for i in range(9)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    media = media_from_documents(docs)
    rows = media_scene_segments(media).collect()
    assert {r.media_id for r in rows} == {2, 5, 8}  # doc_id % 3 == 2
    for r in rows:
        assert r.n_frames == SCENE_FRAMES
        assert 1 <= r.n_scenes <= r.n_frames


def test_snapshot_diff_classes(spark):
    """Hand-built versions: one removed, one added, one changed, one
    unchanged row — each class counted exactly once."""
    from soccerpredictor_spark.sources.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 99), (4, "d", 40)], ["k", "s", "v"]
    )
    got = {r.klass: r.n_rows for r in snapshot_diff(old, new, "k", ["s", "v"]).collect()}
    assert got == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_snapshot_diff_orders_gates_disjoint(spark):
    """The synthetic version gates are disjoint residues: every order
    key lands in exactly one of removed/added/changed/unchanged, so
    class counts sum to the base row count plus nothing double."""
    from soccerpredictor_spark.sources.upsert import snapshot_diff_orders

    orders = spark.createDataFrame(
        [(k, "O", 100.0 + k) for k in range(400)],
        ["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    got = {r.klass: r.n_rows for r in snapshot_diff_orders(orders).collect()}
    # removed keys are absent from new, added absent from old:
    # total distinct keys seen = 400 (each key in >= one version)
    assert sum(got.values()) == 400
    assert got.get("changed", 0) > 0
    assert got.get("added", 0) > 0 and got.get("removed", 0) > 0


def test_delta_attribution_shares_sum_to_one(spark):
    """Deltas are exact; when the topline moved, the per-type shares
    sum to exactly 1 (rational family with common denominator)."""
    import datetime as dt

    from soccerpredictor_spark.operators.windows import delta_attribution

    t0 = dt.datetime(2024, 1, 1)  # epoch day 19723 -> day % 14 = 11 -> period b
    rows = []
    eid = 0
    # week-a timestamps: shift back 7 days into the other parity window
    ta = t0 - dt.timedelta(days=7)
    for n, ty in ((5, "view"), (3, "click")):
        for i in range(n):
            rows.append((1, ta, eid, ty)); eid += 1
    for n, ty in ((9, "view"), (2, "click")):
        for i in range(n):
            rows.append((1, t0, eid, ty)); eid += 1
    events = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    got = {r.event_type: r for r in delta_attribution(events).collect()}
    # one of the two timestamps is period a, the other period b; which
    # is which depends on epoch-day parity — check invariants instead
    deltas = {ty: r.delta for ty, r in got.items()}
    assert abs(deltas["view"]) == 4 and abs(deltas["click"]) == 1
    total = got["view"].total_delta
    assert all(r.total_delta == total for r in got.values())
    if total != 0:
        assert sum(r.share_of_delta for r in got.values()) == pytest.approx(1.0)


def test_pca_power_recovers_dominant_axis(spark):
    """Vectors spread along axis 2 with small noise on axis 0: the
    leading-direction loading must peak (magnitude 1) at dim 2 and be
    near zero elsewhere."""
    from soccerpredictor_spark.operators.similarity import embedding_pca_power

    rows = []
    for k in range(40):
        v = [0.0, 0.0, 0.0, 0.0]
        v[2] = float(k - 20)          # dominant spread
        v[0] = 0.01 * ((k % 3) - 1)   # tiny noise
        rows.append((k, v))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {r.dim: r.loading for r in embedding_pca_power(emb).collect()}
    assert abs(got[2]) == 1.0
    for d in (0, 1, 3):
        assert abs(got[d]) < 0.05
    # constant dims contribute exactly zero
    assert got[1] == 0.0 and got[3] == 0.0


def test_pca_power_exact_ladder_guard(spark, monkeypatch):
    """Past the certified exact-decimal row bound the operator must
    raise, steering the caller to a hash subsample."""
    from soccerpredictor_spark.operators import similarity

    monkeypatch.setattr(similarity, "PCA_EXACT_MAX_ROWS", 3)
    emb = spark.createDataFrame(
        [(k, [1.0, 2.0]) for k in range(5)], ["vec_id", "embedding"]
    )
    with pytest.raises(Exception, match="exact decimal ladder"):
        similarity.embedding_pca_power(emb).collect()


def test_pii_redact_counts_and_shrinkage(spark):
    """A crafted doc with one of each PII class: counts per class,
    docs_redacted, and the char delta all match hand computation; a
    clean doc contributes zero."""
    from soccerpredictor_spark.operators.textops import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "clean text", "web"),       # doc_id 1: no synth PII
            (7, "x", "web"),                # %7 -> email appended
            (11, "y", "web"),               # %11 -> phone appended
            (13, "z", "web"),               # %13 -> ssn appended
        ],
        ["doc_id", "text", "source"],
    )
    [r] = pii_redact(docs).collect()
    assert r.n_docs == 4 and r.docs_redacted == 3
    assert (r.emails, r.phones, r.ssns) == (1, 1, 1)
    # email 'user7@example.com' (17 ch) -> '[EMAIL]' (7): -10
    # phone '555-0142' (8) -> '[PHONE]' (7): -1
    # ssn '123-45-6789' (11) -> '[SSN]' (5): -6
    assert r.chars_delta == 10 + 1 + 6
