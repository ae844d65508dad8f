"""Property-based tests (hypothesis): invariants that must hold for
ARBITRARY inputs, not just the fixtures — the guard against
fixture-shaped blind spots.

Examples are kept small and few (Spark jobs per example); the
properties target the operators whose contracts are order/layout
sensitivity traps: upsert conflict resolution, hash-gated sampling,
session gap merging.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from soccerpredictor_spark.operators.textops import group_sample_topk
from soccerpredictor_spark.sources.upsert import upsert_df

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # pk
        st.integers(min_value=0, max_value=99),  # seq (may collide)
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing_rows=ROWS, batch_rows=ROWS)
def test_upsert_latest_wins_property(spark, existing_rows, batch_rows):
    """For any PK table and batch: exactly one row per PK survives;
    the batch beats existing on PK collision regardless of seq; among
    same-PK batch rows the highest seq wins. Preconditions match the
    operator's contract: ``existing`` is a PK table (one row per PK —
    the invariant upsert itself maintains, so it holds inductively),
    and batch rows are unique on (pk, seq) so the winner is
    well-defined."""
    existing_rows = list({p: (p, s, v) for p, s, v in existing_rows}.values())
    batch_rows = list({(p, s): (p, s, v) for p, s, v in batch_rows}.values())
    cols = ["pk", "seq", "val"]
    existing = spark.createDataFrame(pd.DataFrame(existing_rows, columns=cols))
    batch = spark.createDataFrame(pd.DataFrame(batch_rows, columns=cols))
    got = {
        r["pk"]: (r["seq"], r["val"])
        for r in upsert_df(existing, batch, ["pk"], seq_col="seq").collect()
    }
    batch_pks = {p for p, _, _ in batch_rows}
    expect: dict[int, tuple[int, int]] = {}
    # existing rows survive only where the batch has no row for the PK
    for p, s, v in existing_rows:
        if p not in batch_pks:
            expect[p] = (s, v)
    for p in batch_pks:
        expect[p] = max((s, v) for q, s, v in batch_rows if q == p)
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30, unique=True),
    nparts=st.integers(min_value=1, max_value=4),
)
def test_group_sample_topk_layout_independent(spark, ids, nparts):
    """The fixed-quota sampler must pick the SAME rows regardless of
    partitioning/row order — the reproducibility contract that makes a
    100 TB sample auditable."""
    pdf = pd.DataFrame({"doc_id": ids, "lang": ["en" if i % 2 else "fr" for i in ids]})
    a = spark.createDataFrame(pdf)
    b = spark.createDataFrame(pdf.iloc[::-1]).repartition(nparts)
    k = 3
    ga = {(r["lang"], r["doc_id"], r["rk"]) for r in group_sample_topk(a, k).collect()}
    gb = {(r["lang"], r["doc_id"], r["rk"]) for r in group_sample_topk(b, k).collect()}
    assert ga == gb
    for lang in ("en", "fr"):
        n_lang = sum(1 for i in ids if (i % 2 == 1) == (lang == "en"))
        assert sum(1 for l, _, _ in ga if l == lang) == min(k, n_lang)


CDC_CHANGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),        # pk
        st.integers(min_value=0, max_value=99),       # seq
        st.sampled_from(["I", "U", "D"]),             # op
        st.integers(min_value=-100, max_value=100),   # value
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing_rows=ROWS, change_rows=CDC_CHANGES)
def test_apply_cdc_matches_sequential_model(spark, existing_rows, change_rows):
    """apply_cdc must equal the sequential one-row-at-a-time model:
    replay the change stream in seq order over a dict keyed by PK
    (I/U set, D removes). Preconditions per contract: existing is a
    PK table; (pk, seq) unique within the change batch."""
    from soccerpredictor_spark.sources.upsert import apply_cdc

    existing_rows = list({p: (p, s, v) for p, s, v in existing_rows}.values())
    change_rows = list(
        {(p, s): (p, s, o, v) for p, s, o, v in change_rows}.values()
    )
    existing = spark.createDataFrame(
        pd.DataFrame([(p, v) for p, s, v in existing_rows], columns=["pk", "val"])
    )
    changes = spark.createDataFrame(
        pd.DataFrame(change_rows, columns=["pk", "seq", "op", "val"])
    )
    got = {
        r["pk"]: r["val"]
        for r in apply_cdc(existing, changes, ["pk"], "op", "seq").collect()
    }
    model = {p: v for p, s, v in existing_rows}
    for p, s, o, v in sorted(change_rows, key=lambda t: t[1]):
        if o == "D":
            model.pop(p, None)
        else:
            model[p] = v
    assert got == model


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_part=st.integers(min_value=1, max_value=40),
    n_supp=st.integers(min_value=1, max_value=30),
)
def test_synth_partsupp_relation_invariants(spark, n_part, n_supp):
    """For ANY fixture scale (part/supplier cardinalities), the
    synthesized partsupp must be a well-formed relation: unique on
    (ps_partkey, ps_suppkey), suppkeys inside [1, S], 1-4 suppliers
    per part (the spec formula can wrap at small S — dedup'd, never
    duplicated), availqty in [1, 9999], cost cents in [100, 100000].
    """
    from soccerpredictor_spark.plans.partsupp import synth_partsupp

    part = spark.createDataFrame(
        pd.DataFrame({"p_partkey": list(range(1, n_part + 1))})
    )
    supplier = spark.createDataFrame(
        pd.DataFrame({"s_suppkey": list(range(1, n_supp + 1))})
    )
    rows = synth_partsupp(part, supplier).collect()
    keys = [(r.ps_partkey, r.ps_suppkey) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate (partkey, suppkey) pair"
    per_part: dict[int, int] = {}
    for r in rows:
        per_part[r.ps_partkey] = per_part.get(r.ps_partkey, 0) + 1
        assert 1 <= r.ps_suppkey <= n_supp
        assert 1 <= r.ps_availqty <= 9999
        assert 100 <= r.ps_supplycost_cents <= 100_000
    assert set(per_part) == set(range(1, n_part + 1))
    assert all(1 <= c <= 4 for c in per_part.values())


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    assignments=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # item
            st.integers(min_value=0, max_value=2),   # band
            st.integers(min_value=0, max_value=4),   # bucket
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_candidate_budget_bound_matches_brute_force(spark, assignments):
    """The guard's pair bound (Σ k·(k−1)/2 over bucket sizes) must
    equal the BRUTE-FORCE count of ordered candidate pairs from the
    bucket self-join, for any assignment relation."""
    from collections import Counter

    from soccerpredictor_spark.operators.scale import candidate_budget_guard

    bnd = spark.createDataFrame(
        pd.DataFrame(assignments, columns=["item", "band", "bucket"])
    )
    est, n_rows, max_bucket = candidate_budget_guard(
        bnd, ["band", "bucket"], "prop_test", max_pairs_per_row=float("inf")
    )
    sizes = Counter((b, bk) for _, b, bk in assignments)
    expect = sum(k * (k - 1) // 2 for k in sizes.values())
    assert est == expect
    assert n_rows == len(assignments)
    assert max_bucket == max(sizes.values())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),           # doc_id
            st.sampled_from(["aa bb cc", "dd ee", "aa  bb cc", "zz yy xx ww", "dd ee "]),
        ),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_incremental_dedup_matches_sequential_model(spark, docs):
    """incremental_dedup must agree with the obvious sequential
    algorithm: corpus fingerprints first, then batch docs in doc_id
    order — first unseen fingerprint is 'unique', a corpus hit is
    'dup_of_corpus', a batch-only repeat is 'dup_within_batch'.
    Fingerprints normalize whitespace, so 'aa bb cc' == 'aa  bb cc'.
    """
    import hashlib
    import re

    from soccerpredictor_spark.operators.dedup import (
        INCR_BATCH_GE,
        incremental_dedup,
    )

    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {r.doc_id: r.status for r in incremental_dedup(df).collect()}

    def bucket(doc_id: int) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100

    def fp(text: str) -> str:
        return hashlib.md5(
            re.sub(r"\s+", " ", text.lower()).strip().encode()
        ).hexdigest()

    corpus_fps = {fp(t) for d, t in docs if bucket(d) < INCR_BATCH_GE}
    batch = sorted((d, t) for d, t in docs if bucket(d) >= INCR_BATCH_GE)
    expect = {}
    seen_in_batch: set[str] = set()
    for d, t in batch:
        f = fp(t)
        if f in corpus_fps:
            expect[d] = "dup_of_corpus"
        elif f in seen_in_batch:
            expect[d] = "dup_within_batch"
        else:
            expect[d] = "unique"
        seen_in_batch.add(f)
    assert got == expect


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),        # user_id
            st.integers(min_value=0, max_value=6 * 3600),  # seconds offset
        ),
        min_size=4,
        max_size=30,
        unique=True,
    )
)
def test_interval_overlap_matches_brute_force(spark, events):
    """interval_overlap_join must agree with the brute-force model:
    sessionize per user (30-min gap), find busy hours (count > 1.2x
    hourly average), and intersect every session with every busy hour
    directly — the O(n*m) computation the bucketized equi-join
    replaces."""
    import datetime as dt

    from soccerpredictor_spark.operators.joins import (
        BUSY_DEN,
        BUSY_NUM,
        interval_overlap_join,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), u, "click", 1.0, "{}")
        for i, (u, s) in enumerate(sorted(events))
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    got = {
        (r.user_id, r.first_ts, r.busy_hour): (r.overlap_micros, r.n_hour)
        for r in interval_overlap_join(df).collect()
    }

    # brute-force model
    per_user: dict[int, list[dt.datetime]] = {}
    for _, ts, u, *_ in rows:
        per_user.setdefault(u, []).append(ts)
    sessions = []
    for u, tss in per_user.items():
        tss.sort()
        start = prev = tss[0]
        for t in tss[1:]:
            if (t - prev).total_seconds() >= 1800:
                sessions.append((u, start, prev))
                start = t
            prev = t
        sessions.append((u, start, prev))
    hours: dict[dt.datetime, int] = {}
    for _, ts, *_ in rows:
        h = ts.replace(minute=0, second=0, microsecond=0)
        hours[h] = hours.get(h, 0) + 1
    total, n_hours = sum(hours.values()), len(hours)
    busy = {
        h: c for h, c in hours.items() if c * n_hours * BUSY_DEN > total * BUSY_NUM
    }
    expect = {}
    for u, first, last in sessions:
        for h, c in busy.items():
            h_end = h + dt.timedelta(hours=1)
            if first < h_end and last >= h:
                ov = int(
                    (min(last, h_end) - max(first, h)).total_seconds() * 1_000_000
                )
                expect[(u, first, h)] = (ov, c)
    assert got == expect


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    prices=st.lists(
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False, width=32),
        min_size=10,
        max_size=60,
    )
)
def test_quantile_bins_monotone_and_bounded(spark, prices):
    """quantile_bins invariants for arbitrary inputs: bins lie in
    [1, 10], bin assignment is monotone in the value (ties may share a
    bin but never invert), and no bin exceeds ~a decile plus the mass
    of its largest tied value (the equal-frequency property up to
    ties)."""
    from collections import Counter

    from soccerpredictor_spark.operators.mlprep import QB_BINS, quantile_bins

    df = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(prices)],
        ["o_orderkey", "o_totalprice"],
    )
    rows = quantile_bins(df).collect()
    assert len(rows) == len(prices)
    by_val = sorted(rows, key=lambda r: (r.o_totalprice, r.bin))
    bins = [r.bin for r in by_val]
    assert all(1 <= b <= QB_BINS for b in bins)
    assert all(b1 <= b2 for b1, b2 in zip(bins, bins[1:])), "non-monotone bins"
    counts = Counter(bins)
    tie_mass = Counter(r.o_totalprice for r in rows).most_common(1)[0][1]
    cap = -(-len(prices) // QB_BINS) + tie_mass
    assert all(c <= cap for c in counts.values())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_triangle_census_matches_brute_force(spark, edges):
    """For any small undirected graph: the degree-ordered-orientation
    census equals the brute-force triangle enumeration, and the wedge
    count equals sum(deg*(deg-1)/2)."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from soccerpredictor_spark.operators.graph import graph_triangles

    es = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not es:
        return
    # feed the operator through its event-bucket front door: one
    # bucket per edge, two users per bucket -> that exact edge list
    rows = []
    # each edge appears in TWO buckets so it clears MIN_EDGE_WEIGHT
    for i, (u, v) in enumerate(es):
        for j in (0, 1):
            ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
                minutes=15 * (2 * i + j)
            )
            rows.append(("e", ts, u, 1))
            rows.append(("e", ts, v, 1))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "user_id", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = graph_triangles(ev).collect()[0]
    nodes = {u for e in es for u in e}
    deg = {n: sum(1 for a, b in es if n in (a, b)) for n in nodes}
    tris = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    assert got["n_nodes"] == len(nodes)
    assert got["n_edges"] == len(es)
    assert got["n_triangles"] == tris
    assert got["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_pagerank_mass_conserved_and_python_model(spark, edges):
    """For any small graph: the int64 PageRank matches an exact
    integer reference model (same truncating divisions), and total
    rank mass stays within n units of SCALE (each node's update
    truncates at most twice)."""
    from pyspark.sql import functions as F

    from soccerpredictor_spark.operators.graph import (
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        graph_pagerank,
    )

    es = sorted({(min(u, v), max(u, v)) for u, v in edges if u != v})
    if not es:
        return
    rows = []
    # each edge appears in TWO buckets so it clears MIN_EDGE_WEIGHT
    for i, (u, v) in enumerate(es):
        for j in (0, 1):
            ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
                minutes=15 * (2 * i + j)
            )
            rows.append(("e", ts, u, 1))
            rows.append(("e", ts, v, 1))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "user_id", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r["rank_micro"] for r in graph_pagerank(ev).collect()}
    # exact reference model
    nbrs: dict[int, list[int]] = {}
    for u, v in es:
        nbrs.setdefault(u, []).append(v)
        nbrs.setdefault(v, []).append(u)
    n = len(nbrs)
    rank = {u: PAGERANK_SCALE // n for u in nbrs}
    for _ in range(PAGERANK_ITERS):
        recv = {u: 0 for u in nbrs}
        for u, ns in nbrs.items():
            c = rank[u] // len(ns)
            for v in ns:
                recv[v] += c
        rank = {
            u: (15 * PAGERANK_SCALE) // (100 * n) + (85 * recv[u]) // 100
            for u in nbrs
        }
    topk = dict(sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20])
    assert got == topk
    # mass accounting: the r0 split loses < n units; each iteration's
    # contribution split loses < sum(deg_u - 1) < 2m units and the two
    # damping divisions lose < 2n units (losses only shrink under the
    # 0.85 factor) — so the total deficit is strictly bounded by
    # n + ITERS * (2m + 2n), and mass never exceeds SCALE
    m = len(es)
    deficit = PAGERANK_SCALE - sum(rank.values())
    assert 0 <= deficit <= n + PAGERANK_ITERS * (2 * m + 2 * n)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=6),
    edit=st.integers(min_value=0, max_value=2),
    pos=st.integers(min_value=0, max_value=6),
    ch=st.sampled_from("abcd"),
)
def test_fuzzy_blocking_complete_for_dist1(spark, word, edit, pos, ch):
    """Deletion-neighborhood blocking is COMPLETE for levenshtein
    distance 1: for any word and any single edit (delete / insert /
    substitute), the pair is found. (First-letter or length blocking
    would fail the substitution-at-position-0 cases.)"""
    from soccerpredictor_spark.operators.joins import fuzzy_token_pairs

    p = min(pos, len(word))
    if edit == 0:  # deletion
        other = word[: max(p - 1, 0)] + word[max(p - 1, 0) + 1 :]
    elif edit == 1:  # insertion
        other = word[:p] + ch + word[p:]
    else:  # substitution
        if p >= len(word):
            return
        other = word[:p] + ch + word[p + 1 :]
    if not other or other == word:
        return
    part = spark.createDataFrame(
        pd.DataFrame({"p_name": [word, other]})
    )
    got = {(r["a"], r["b"]) for r in fuzzy_token_pairs(part).collect()}
    assert (min(word, other), max(word, other)) in got


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    statuses=st.lists(st.sampled_from(["F", "O", "P"]), min_size=10, max_size=40)
)
def test_decile_lift_terminal_invariants(spark, statuses):
    """For any label sequence: the last (10th) cumulative row covers
    every order, so cum_lift there is EXACTLY 1.0 when positives
    exist (rational identity, no float tolerance), and response rates
    stay in [0, 1]."""
    from soccerpredictor_spark.operators.mlprep import decile_lift

    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_orderkey": range(len(statuses)),
                "o_totalprice": [float(100 + 7 * i % 13) for i in range(len(statuses))],
                "o_orderstatus": statuses,
            }
        )
    )
    rows = {r["decile"]: r for r in decile_lift(orders).collect()}
    last = rows[max(rows)]
    assert last["cum_n"] == len(statuses)
    n_pos = sum(1 for s in statuses if s == "F")
    assert last["cum_pos"] == n_pos
    if n_pos:
        assert last["cum_lift"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["response_rate"] <= 1.0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=5,
        max_size=30,
    )
)
def test_winsorize_clamp_invariants(spark, vals):
    """For any value set: clipped is within [p05, p95] selections,
    clamping is monotone (order-preserving up to ties), and rows
    inside the band pass through unchanged."""
    from soccerpredictor_spark.operators.mlprep import winsorize

    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_orderkey": range(len(vals)),
                "o_orderpriority": ["1-URGENT"] * len(vals),
                "o_totalprice": vals,
            }
        )
    )
    rows = winsorize(orders).collect()
    lo = min(r["clipped"] for r in rows)
    hi = max(r["clipped"] for r in rows)
    for r in rows:
        assert lo <= r["clipped"] <= hi
        if not r["clipped_lo"] and not r["clipped_hi"]:
            assert r["clipped"] == r["o_totalprice"]
        assert r["clipped_lo"] == (r["o_totalprice"] < lo)
        assert r["clipped_hi"] == (r["o_totalprice"] > hi)


def test_pq_exact_on_seed_vectors(spark):
    """A vector that IS one of the PQ seed centroids encodes to
    itself in every subspace, so its ADC distance to itself as query
    is exactly 0 — and the query row always tops its own top-k."""
    import numpy as np

    from soccerpredictor_spark.operators.similarity import pq_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 64).astype("float32")
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(40),
                "embedding": [v.tolist() for v in vecs],
                "label": [int(i % 3) for i in range(40)],
            }
        )
    )
    rows = pq_topk(emb, query_vec_id=0, k=5).collect()
    assert rows[0]["vec_id"] == 0
    assert rows[0]["approx_dist"] == 0
    assert rows[0]["sim"] == 1.0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pre=st.integers(min_value=1, max_value=5),
    post=st.integers(min_value=8, max_value=15),
    n_pre=st.integers(min_value=6, max_value=12),
    n_post=st.integers(min_value=6, max_value=12),
)
def test_cusum_locates_step_change(spark, pre, post, n_pre, n_post):
    """For a series with one clean mean shift, the scaled-CUSUM argmax
    lands exactly on the last pre-change hour (the standard CUSUM
    change-point estimate for a step)."""
    from pyspark.sql import functions as F

    from soccerpredictor_spark.operators.timeseries import cusum_changepoint

    rows = []
    hours = []
    for i in range(n_pre + n_post):
        level = pre if i < n_pre else post
        h = pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i)
        hours.append(h)
        for j in range(level):
            rows.append(("e", h + pd.Timedelta(seconds=j), 1, 1.0))
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "user_id", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = cusum_changepoint(ev).collect()[0]
    assert got["cp_hour"] == hours[n_pre - 1].to_pydatetime()


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=0, max_value=8),   # user
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rolling_distinct_matches_brute_force(spark, pairs):
    """For any (day, user) activity set: the fan-out implementation
    equals the brute-force trailing-7-day distinct count for every
    reported day."""
    from pyspark.sql import functions as F

    from soccerpredictor_spark.operators.timeseries import rolling_distinct

    rows = [
        ("e", pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=1), u, 1.0)
        for d, u in pairs
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "user_id", "value"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["end_day"].date(): (r["users_1d"], r["users_7d"])
        for r in rolling_distinct(ev).collect()
    }
    import datetime

    active = {}
    for d, u in pairs:
        day = (pd.Timestamp("2024-01-01") + pd.Timedelta(days=d)).date()
        active.setdefault(day, set()).add(u)
    max_day = max(active)
    for day, (u1, u7) in got.items():
        assert u1 == len(active.get(day, set()))
        win = set()
        for k in range(7):
            win |= active.get(day - datetime.timedelta(days=k), set())
        assert u7 == len(win)
        assert day <= max_day
    # every day with a nonempty trailing window must be reported
    for day in active:
        assert day in got


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),    # custkey
            st.integers(min_value=1, max_value=500),  # order price (whole $)
        ),
        min_size=1,
        max_size=25,
    )
)
def test_skyline_matches_brute_force_dominance(spark, pts):
    """For any order set: the bucket-pruned window skyline equals the
    O(n^2) dominance definition computed in Python."""
    from soccerpredictor_spark.operators.windows import skyline_pareto

    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_custkey": [c for c, _ in pts],
                "o_totalprice": [float(p) for _, p in pts],
                "o_orderpriority": ["5-LOW"] * len(pts),
            }
        )
    )
    got = {r["c_custkey"] for r in skyline_pareto(orders).collect()}
    # small bucket width -> spends span MANY buckets, exercising the
    # cross-bucket prune path the default 10M-cent width leaves idle
    # at property-test magnitudes; results must be identical.
    got_pruned = {
        r["c_custkey"] for r in skyline_pareto(orders, bucket_cents=5000).collect()
    }
    assert got_pruned == got
    agg: dict[int, list[int]] = {}
    for c, p in pts:
        a = agg.setdefault(c, [0, 0])
        a[0] += p * 100
        a[1] += 1
    expect = set()
    for c, (s, n) in agg.items():
        dominated = any(
            (s2 >= s and n2 >= n and (s2 > s or n2 > n))
            for c2, (s2, n2) in agg.items()
            if c2 != c
        )
        if not dominated:
            expect.add(c)
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),  # price (whole $ -> score)
            st.booleans(),                           # urgent?
        ),
        min_size=2,
        max_size=30,
    )
)
def test_roc_auc_matches_pairwise_definition(spark, rows):
    """For any (score, label) sample: the two-level prefix-sum AUC
    equals the brute-force pairwise definition
    [#(pos>neg) + #(ties)/2] / (P*N), including tie credit."""
    from soccerpredictor_spark.operators.mlprep import roc_auc

    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_totalprice": [float(p) for p, _ in rows],
                "o_orderpriority": [
                    "1-URGENT" if u else "5-LOW" for _, u in rows
                ],
            }
        )
    )
    r = roc_auc(orders).collect()[0]
    # small bucket width -> scores span multiple buckets, exercising
    # the cross-bucket prefix-sum leg idle at property magnitudes
    r_small = roc_auc(orders, bucket_cents=700).collect()[0]
    assert (r_small["n_pos"], r_small["n_neg"], r_small["u2"]) == (
        r["n_pos"], r["n_neg"], r["u2"]
    )
    pos = [p for p, u in rows if u]
    neg = [p for p, u in rows if not u]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    if not pos or not neg:
        assert r["auc"] is None
        return
    u2 = sum(2 if sp > sn else (1 if sp == sn else 0) for sp in pos for sn in neg)
    assert r["u2"] == u2
    assert r["auc"] == u2 / (2.0 * len(pos) * len(neg))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    build=st.sets(st.integers(min_value=1, max_value=40), min_size=0, max_size=12),
    orphans=st.sets(st.integers(min_value=81, max_value=99), min_size=0, max_size=4),
    extra=st.sets(st.integers(min_value=41, max_value=80), min_size=1, max_size=12),
)
def test_bloom_probe_matches_reference_filter(spark, build, orphans, extra):
    """For any build/probe key sets — including build keys ABSENT from
    the probe table (FK orphans): zero false negatives among probed
    members, orphans surfaced as n_member_probed < n_build, and the
    pass set equals an independent hashlib-md5 Bloom simulation."""
    import hashlib

    from soccerpredictor_spark.operators.sketch import (
        BLOOM_BITS,
        BLOOM_HASHES,
        bloom_probe,
    )

    full_build = build | orphans  # orphans never appear in customer
    probe_keys = sorted(build | extra)
    orders = spark.createDataFrame(
        pd.DataFrame(
            {
                "o_custkey": sorted(full_build) or [0],
                "o_orderpriority": ["1-URGENT"] * (len(full_build) or 1),
            }
        )
    )
    if not full_build:  # placeholder row must not enter the build set
        orders = orders.filter("o_custkey <> 0")
    customer = spark.createDataFrame(pd.DataFrame({"c_custkey": probe_keys}))
    r = bloom_probe(orders, customer).collect()[0]

    def positions(k: int) -> list[int]:
        return [
            int(hashlib.md5(f"bloom{i}:{k}".encode()).hexdigest()[:8], 16)
            % BLOOM_BITS
            for i in range(BLOOM_HASHES)
        ]

    bits = {p for k in full_build for p in positions(k)}
    sim_pass = {k for k in probe_keys if all(p in bits for p in positions(k))}
    assert build <= sim_pass  # no false negatives in the model either
    assert r["n_build"] == len(full_build)
    assert r["n_member_probed"] == len(build)
    assert r["n_probe"] == len(probe_keys)
    assert r["n_pass"] == len(sim_pass)
    assert r["n_true_pass"] == len(build)  # every PROBED member passes
    assert r["n_false_pos"] == len(sim_pass - build)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.dictionaries(
        st.integers(min_value=1, max_value=30),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=15,
    )
)
def test_cms_estimates_match_grid_simulation(spark, counts):
    """For any key->count multiset: every CMS estimate >= the exact
    count (overcount-only guarantee) and equals an independent
    hashlib-md5 grid simulation cell-for-cell."""
    import hashlib

    from soccerpredictor_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
        heavy_hitters_cms,
    )

    rows = [(k, i) for k, c in counts.items() for i in range(c)]
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [k for k, _ in rows],
                "event_type": ["e"] * len(rows),
                "ts": [pd.Timestamp("2024-01-01")] * len(rows),
                "value": [1.0] * len(rows),
            }
        )
    )
    got = {r["user_id"]: r for r in heavy_hitters_cms(events).collect()}

    def cell(j: int, k: int) -> int:
        return int(hashlib.md5(f"cms{j}:{k}".encode()).hexdigest()[:8], 16) % CMS_WIDTH

    grid: dict[tuple[int, int], int] = {}
    for k, c in counts.items():
        for j in range(CMS_DEPTH):
            key = (j, cell(j, k))
            grid[key] = grid.get(key, 0) + c
    for k, r in got.items():
        est = min(grid[(j, cell(j, k))] for j in range(CMS_DEPTH))
        assert r["exact_cnt"] == counts[k]
        assert r["cms_est"] == est
        assert r["overcount"] == est - counts[k] >= 0


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=1, max_value=7),
            st.integers(min_value=1, max_value=7),
        ).map(lambda t: (min(t), max(t))),
        min_size=1,
        max_size=10,
    ).map(lambda es: {(u, v) for u, v in es if u != v})
)
def test_link_prediction_matches_python_ra(spark, edges):
    """For any small graph (each edge realized as two shared capped
    co-activity buckets): the operator's candidate set and integer RA
    scores equal a Python common-neighbor model."""
    if not edges:
        return
    from soccerpredictor_spark.operators.graph import (
        LINK_RA_SCALE,
        link_prediction,
    )

    rows = []
    for i, (u, v) in enumerate(sorted(edges)):
        for rep in range(2):  # two distinct buckets -> weight 2 (recurring)
            base = pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=(2 * i + rep) * 3600)
            rows += [("e", base, u, 1.0), ("e", base, v, 1.0)]
    events = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts", "user_id", "value"])
    )
    got = {
        (r["u"], r["v"]): (r["common_neighbors"], r["ra_micro"])
        for r in link_prediction(events).collect()
    }
    nbrs: dict[int, set[int]] = {}
    for u, v in edges:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    expect = {}
    for u in nbrs:
        for v in nbrs:
            if u < v and v not in nbrs[u]:
                common = nbrs[u] & nbrs[v]
                if common:
                    expect[(u, v)] = (
                        len(common),
                        sum(LINK_RA_SCALE // len(nbrs[z]) for z in common),
                    )
    assert got == expect


R8_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),        # user_id
        st.integers(min_value=0, max_value=100_000),  # seconds offset
        st.integers(min_value=-500, max_value=500),   # value (cents/100)
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=R8_EVENTS)
def test_interval_merge_invariants_property(spark, rows):
    """For arbitrary event sets: per user, covered time is between one
    cover (nonempty) and n_events * cover; islands <= events; a
    single-pass python sweep reproduces covered_us exactly."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import (
        INTERVAL_COVER_S,
        interval_merge,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = [
        (u, t0 + dt.timedelta(seconds=s), i)
        for i, (u, s, _) in enumerate(rows)
    ]
    df = spark.createDataFrame(ev, ["user_id", "ts", "event_id"])
    got = {r.user_id: r for r in interval_merge(df).collect()}
    cover_us = INTERVAL_COVER_S * 1_000_000
    per_user: dict[int, list[int]] = {}
    for u, s, _ in rows:
        per_user.setdefault(u, []).append(s * 1_000_000)
    for u, starts in per_user.items():
        r = got[u]
        assert 1 <= r.n_islands <= r.n_events == len(starts)
        # python reference sweep
        covered, islands = 0, 0
        cur_s = cur_e = None
        for s in sorted(starts):
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                cur_s, cur_e = s, s + cover_us
                islands += 1
            else:
                cur_e = max(cur_e, s + cover_us)
        covered += cur_e - cur_s
        assert r.covered_us == covered and r.n_islands == islands


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=R8_EVENTS)
def test_ks_drift_bounds_property(spark, rows):
    """For arbitrary price multisets: 0 <= D <= 1, the split is a
    partition (n0 + n1 = N), and the location is an attained value."""
    from soccerpredictor_spark.operators.mlprep import ks_drift

    orders = spark.createDataFrame(
        [(i, float(abs(v)) + 1.0) for i, (_, _, v) in enumerate(rows)],
        ["o_orderkey", "o_totalprice"],
    )
    [r] = ks_drift(orders).collect()
    assert r.n0 + r.n1 == len(rows)
    if r.n0 > 0 and r.n1 > 0:
        assert 0.0 <= r.d_stat <= 1.0
    vals = {float(abs(v)) + 1.0 for _, _, v in rows}
    assert r.ks_location in vals


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=R8_EVENTS)
def test_simpson_bounds_property(spark, rows):
    """Collision probability is a probability for arbitrary token
    streams and equals a direct python computation."""
    from collections import Counter

    from soccerpredictor_spark.operators.textops import simpson_diversity

    docs = spark.createDataFrame(
        [("s", " ".join(f"w{v % 7}" for _ in range(u)) or "w0")
         for u, _, v in rows],
        ["source", "text"],
    )
    [r] = simpson_diversity(docs).collect()
    # rebuild exactly what the fixture produced
    toks = []
    for u, _, v in rows:
        t = [f"w{v % 7}"] * u
        toks += t if t else ["w0"]
    n = len(toks)
    if n > 1:
        c = Counter(toks)
        expect = sum(k * (k - 1) for k in c.values()) / (n * (n - 1))
        assert r.collision_prob == expect
        assert 0.0 <= r.collision_prob <= 1.0
    assert r.n_tokens == n


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=R8_EVENTS)
def test_snapshot_diff_is_partition_property(spark, rows):
    """For arbitrary key/value snapshots the four classes partition
    the union of keys."""
    from soccerpredictor_spark.sources.upsert import snapshot_diff

    old = list({k: (k, str(v)) for k, _, v in rows}.values())
    new = list({k: (k, str(v + s % 2)) for k, s, v in rows if s % 3 != 0}.values())
    old_df = spark.createDataFrame(old or [(0, "x")], ["k", "v"])
    new_df = spark.createDataFrame(new or [(1, "y")], ["k", "v"])
    got = {r.klass: r.n_rows for r in snapshot_diff(old_df, new_df, "k", ["v"]).collect()}
    keys_old = {k for k, _ in (old or [(0, "x")])}
    keys_new = {k for k, _ in (new or [(1, "y")])}
    assert sum(got.values()) == len(keys_old | keys_new)
    assert got.get("removed", 0) == len(keys_old - keys_new)
    assert got.get("added", 0) == len(keys_new - keys_old)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),                              # label
            st.integers(min_value=1, max_value=500),    # price dollars
        ),
        min_size=2,
        max_size=14,
    ).filter(lambda rs: any(p for p, _ in rs) and any(not p for p, _ in rs))
)
def test_pr_auc_bounds_and_row_order_invariance(spark, rows):
    """For any mixed-label set: AP is in (0, 1]; and it is invariant
    under input row ORDER (the fold is pinned to score order, not
    arrival order)."""
    from soccerpredictor_spark.operators.mlprep import pr_auc

    def run(rws):
        df = spark.createDataFrame(
            [
                (i, "1-URGENT" if pos else "5-LOW", float(price))
                for i, (pos, price) in enumerate(rws)
            ],
            ["o_orderkey", "o_orderpriority", "o_totalprice"],
        )
        return pr_auc(df).collect()[0]

    r1 = run(rows)
    r2 = run(list(reversed(rows)))
    assert 0.0 < r1.average_precision <= 1.0
    assert r1.average_precision == r2.average_precision


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lifetimes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # lifetime hours
            st.booleans(),                           # censored?
        ),
        min_size=1,
        max_size=10,
    )
)
def test_kaplan_meier_survival_non_increasing(spark, lifetimes):
    """For ANY user set: the KM curve is non-increasing in lifetime
    and every survival value sits in [0, 1]."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import kaplan_meier

    t0 = dt.datetime(2024, 1, 1)
    # censored users end at the (shared) corpus max hour; churned
    # users end well before the 168h horizon below it
    far = dt.timedelta(days=60)
    rows, eid = [], 0
    for uid, (life, censored) in enumerate(lifetimes):
        start = t0 + (far if censored else dt.timedelta(0))
        rows.append((eid, start, uid)); eid += 1
        rows.append((eid, start + dt.timedelta(hours=life), uid)); eid += 1
    # anchor the corpus max so "censored" users really are at the max
    rows.append((eid, t0 + far + dt.timedelta(hours=40), 999_999))
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = sorted(kaplan_meier(ev).collect(), key=lambda r: r.life_h)
    prev = 1.0
    for r in got:
        assert 0.0 <= r.survival <= prev + 1e-12
        prev = r.survival


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(n=st.integers(min_value=100, max_value=3000))
def test_hll_distinct_unique_keys_estimate_sane(spark, n):
    """For any unique-key cardinality: exact_distinct == n and the
    raw HLL estimate is positive and within a loose 3x band (the
    raw estimator without linear-counting correction biases low at
    small n/m, never to zero or infinity)."""
    from soccerpredictor_spark.operators.sketch import hll_distinct

    ev = spark.range(0, n).selectExpr("id AS event_id")
    [r] = hll_distinct(ev).collect()
    assert r.exact_distinct == n
    assert 0 < r.hll_estimate < 3 * n


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    doc_ids=st.lists(
        st.integers(min_value=0, max_value=400), min_size=1, max_size=12, unique=True
    )
)
def test_url_dedup_partitions_and_keeps_min(spark, doc_ids):
    """For ANY doc-id set: canonical groups partition all raw URLs
    (sum of n_urls = inputs), every keeper is the min doc_id of its
    group, and raw-variant counts never exceed group sizes."""
    from soccerpredictor_spark.operators.textops import url_dedup

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in doc_ids], ["doc_id", "source"]
    )
    rows = url_dedup(docs).collect()
    assert sum(r.n_urls for r in rows) == len(doc_ids)
    assert all(r.n_raw_variants <= r.n_urls for r in rows)
    assert all(r.keep_doc_id in doc_ids for r in rows)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sources=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=20
    ).filter(lambda xs: len(set(xs)) >= 2)
)
def test_temperature_mix_shares_partition_unity(spark, sources):
    """For ANY source mix: shares sum to exactly the fold total (1.0
    within float tolerance), each share sits strictly between the
    uniform and natural extremes' bounds, and quotas never exceed the
    budget."""
    from soccerpredictor_spark.operators.textops import temperature_mix

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sources)], ["doc_id", "source"]
    )
    rows = temperature_mix(docs).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert sum(r.quota for r in rows) <= 10_000
    # sqrt flattening is a THEOREM only at the extremes: the LARGEST
    # source can never gain share (sqrt(n_j) <= sqrt(n_max) per term)
    # and the SMALLEST can never lose it. A merely above-average
    # source CAN gain when a still-bigger source is flattened harder
    # (counts [5, 8, 1]: the 5 gains) — hypothesis found exactly that
    # falsifying mix against the previous overbroad assertion.
    n = len(sources)
    biggest = max(rows, key=lambda r: (r.n_docs, r.source))
    smallest = min(rows, key=lambda r: (r.n_docs, r.source))
    assert biggest.share <= biggest.n_docs / n + 1e-12
    assert smallest.share >= smallest.n_docs / n - 1e-12


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    lengths=st.lists(
        st.integers(min_value=64, max_value=400), min_size=2, max_size=6
    )
)
def test_media_phash_pairs_are_canonical_and_bounded(spark, lengths):
    """For ANY payload set: every reported pair is ordered (a < b),
    within the Hamming budget, and identical payloads always pair at
    hamming 0."""
    from soccerpredictor_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        PHASH_MAX_HAMMING,
        media_phash_neardup,
    )

    rows = []
    for i, ln in enumerate(lengths):
        payload = bytes([(11 * i + 3 * j) % 256 for j in range(ln)])
        rows.append((i, "image", "x", payload, {}))
    # duplicate of row 0 at a fresh id
    rows.append((len(lengths), "image", "x", bytes(rows[0][3]), {}))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = media_phash_neardup(media).collect()
    for r in pairs:
        assert r.media_a < r.media_b
        assert 0 <= r.hamming <= PHASH_MAX_HAMMING
    assert any(
        r.media_a == 0 and r.media_b == len(lengths) and r.hamming == 0
        for r in pairs
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.booleans(),
            st.integers(min_value=1, max_value=300),
        ),
        min_size=2,
        max_size=14,
    ).filter(lambda rs: any(p for p, _ in rs) and any(not p for p, _ in rs))
)
def test_decision_stump_never_worse_than_no_split(spark, rows):
    """Gini never worsens by splitting: the returned purity must be
    >= the unsplit root's (P^2 + Q^2)/n for ANY label/score mix, and
    the reported side counts must partition the input."""
    from soccerpredictor_spark.operators.mlprep import decision_stump

    df = spark.createDataFrame(
        [
            (i, "1-URGENT" if pos else "5-LOW", float(price))
            for i, (pos, price) in enumerate(rows)
        ],
        ["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    out = decision_stump(df).collect()
    n = len(rows)
    p = sum(1 for pos, _ in rows if pos)
    q = n - p
    root_purity = (p * p + q * q) / n
    if not out:
        return  # all rows share one score: no valid split exists
    [r] = out
    assert r.n_left + r.n_right == n
    assert r.pos_left + r.pos_right == p
    assert r.purity >= root_purity - 1e-9


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    labels=st.lists(
        st.sampled_from(["en", "es", "de"]), min_size=2, max_size=10
    )
)
def test_cohen_kappa_bounded_above_by_one(spark, labels):
    """kappa <= 1 for any corpus, with equality only at perfect
    agreement; Po and Pe are probabilities."""
    from soccerpredictor_spark.operators.textops import cohen_kappa

    marker = {"en": "the and is", "es": "el la los", "de": "der und die"}
    docs = spark.createDataFrame(
        [(i, marker[l], l) for i, l in enumerate(labels)],
        ["doc_id", "text", "lang"],
    )
    [r] = cohen_kappa(docs).collect()
    assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0
    if r.kappa is not None:
        assert r.kappa <= 1.0 + 1e-12
        if r.po == 1.0:
            assert r.kappa == 1.0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="abcd ", min_size=0, max_size=120),
        min_size=1,
        max_size=6,
    )
)
def test_substring_dedup_spans_bounded_property(spark, texts):
    """For ANY corpus: every reported doc has 0 < dup_chars <=
    doc_len (spans never exceed the document), n_dup_spans >= 1, each
    span is at least k chars so dup_chars >= k * 1, and dup_fraction
    is exactly dup_chars/doc_len. A tiny alphabet forces heavy gram
    collisions — the stress the fixtures don't have."""
    from soccerpredictor_spark.operators.textops import substring_dedup

    k = 8
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        ["doc_id", "text", "source"],
    )
    for r in substring_dedup(docs, k=k).collect():
        assert r.n_dup_spans >= 1
        assert k <= r.dup_chars <= r.doc_len
        assert r.dup_fraction == r.dup_chars / r.doc_len
        assert len(texts[r.doc_id]) == r.doc_len


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["F", "O"]),
            st.integers(min_value=1, max_value=40),  # price units
        ),
        min_size=4,
        max_size=24,
    )
)
def test_mann_whitney_u_bounds_property(spark, rows):
    """For ANY two-group sample: 0 <= U_A <= n_a * n_b (so u2_a in
    [0, 2*n_a*n_b]), and U_A + U_B = n_a*n_b exactly (checked via the
    rank-sum identity on the doubled units). Requires both groups
    non-empty."""
    if not any(s == "F" for s, _ in rows) or not any(
        s == "O" for s, _ in rows
    ):
        return
    from soccerpredictor_spark.operators.mlprep import mann_whitney_u

    orders = spark.createDataFrame(
        [
            (i, i, s, float(p))
            for i, (s, p) in enumerate(rows)
        ],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )
    [r] = mann_whitney_u(orders).collect()
    assert 0.0 <= r.u2_a <= 2.0 * r.n_a * r.n_b
    # cross-check vs a direct pairwise count with half credit for ties
    wins2 = 0  # doubled units
    a_vals = [p for s, p in rows if s == "F"]
    b_vals = [p for s, p in rows if s == "O"]
    for x in a_vals:
        for y in b_vals:
            wins2 += 2 if x > y else (1 if x == y else 0)
    assert r.u2_a == wins2


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=8),
        ).map(lambda t: (min(t), max(t))),
        min_size=1,
        max_size=12,
    )
)
def test_kcore_every_survivor_has_core_degree_property(spark, edges):
    """For ANY graph: every node the peel returns has core degree >=
    k WITHIN the returned subgraph, and the k-core is unique — so
    re-peeling the survivors changes nothing (idempotence)."""
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        return
    import datetime as dt

    from soccerpredictor_spark.operators.graph import kcore_decomposition
    from soccerpredictor_spark.operators.scale import clear_caches

    clear_caches()
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for n, (u, v) in enumerate(edges):
        for rep in range(2):
            b = t0 + dt.timedelta(seconds=900 * (n * 10 + rep))
            for user in (u, v):
                rows.append((eid, b, user, "click"))
                eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r.user_id: r.core_degree for r in kcore_decomposition(ev).collect()}
    # python reference peel at k=3 over the same edge set
    es = set(edges)
    while True:
        deg: dict[int, int] = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= 3}
        nxt = {(u, v) for u, v in es if u in keep and v in keep}
        if nxt == es:
            break
        es = nxt
    expect: dict[int, int] = {}
    for u, v in es:
        expect[u] = expect.get(u, 0) + 1
        expect[v] = expect.get(v, 0) + 1
    assert got == {n: d for n, d in expect.items() if d >= 3}
    clear_caches()


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    caps=st.lists(
        st.integers(min_value=1, max_value=400), min_size=1, max_size=6
    )
)
def test_waterfill_identities_property(spark, caps):
    """For ANY source-size multiset: sum(alloc) == min(budget, sum
    caps) exactly, alloc never exceeds cap, capped sources sit AT
    their cap, and uncapped allocations are level to within 1 (the
    largest-remainder top-up)."""
    from soccerpredictor_spark.operators.textops import (
        WATERFILL_BUDGET,
        capped_mix_waterfill,
    )

    rows = []
    did = 0
    for i, cap in enumerate(caps):
        for _ in range(cap):
            rows.append((did, f"t {did}", "en", f"s{i}", 0))
            did += 1
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    got = capped_mix_waterfill(docs).collect()
    total = sum(caps)
    assert sum(r.alloc for r in got) == min(WATERFILL_BUDGET, total)
    for r in got:
        assert 0 <= r.alloc <= r.cap
        if r.at_cap == 1:
            assert r.alloc == r.cap
    uncapped = [r.alloc for r in got if r.at_cap == 0]
    if uncapped:
        assert max(uncapped) - min(uncapped) <= 1


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=9),    # price dollars
            st.integers(min_value=1, max_value=20),   # weight units
        ),
        min_size=1,
        max_size=10,
    )
)
def test_weighted_median_matches_bruteforce_property(spark, items):
    """For ANY (price, weight) multiset the operator's lower weighted
    median equals the brute-force scan: smallest price whose
    cumulative weight doubles to at least the total."""
    from soccerpredictor_spark.operators.mlprep import weighted_median

    rows = [
        (i, i, i, 1, float(w), float(p), "X")
        for i, (p, w) in enumerate(items)
    ]
    li = spark.createDataFrame(
        rows,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_quantity", "l_extendedprice", "l_returnflag"],
    )
    [r] = weighted_median(li).collect()
    tw = sum(w for _, w in items)
    expect = None
    agg: dict[int, int] = {}
    for p, w in items:
        agg[p] = agg.get(p, 0) + w
    cum = 0
    for p in sorted(agg):
        cum += agg[p]
        if 2 * cum >= tw:
            expect = p * 100
            break
    assert r.median_cents == expect
    assert r.total_weight == tw


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300_000),  # event_id
            st.integers(min_value=0, max_value=10_000),   # seconds
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_out_of_order_matches_bruteforce_property(spark, rows):
    """For ANY (arrival id, event time) set — ids spanning multiple
    prefix-max buckets — the audit equals the sequential scan."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import (
        out_of_order_audit,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s), 1, "x") for i, s in rows],
        ["event_id", "ts", "user_id", "event_type"],
    )
    [r] = out_of_order_audit(ev).collect()
    run_max = None
    n_late = 0
    worst = 0
    for _, s in sorted(rows):
        if run_max is not None and run_max > s:
            n_late += 1
            worst = max(worst, run_max - s)
        run_max = s if run_max is None else max(run_max, s)
    assert r.n_events == len(rows)
    assert r.n_out_of_order == n_late
    assert r.max_lateness_s == worst


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: (t[0], t[1]),
    ),
    seed=st.integers(min_value=0, max_value=3),
)
def test_table_checksum_permutation_invariant_property(spark, rows, seed):
    """For ANY row multiset the digest is identical under any row
    order and any partitioning — the property that makes it a
    cross-copy acceptance check."""
    import random

    from soccerpredictor_spark.operators.quality import table_checksum

    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_returnflag"]
    full = [
        (ok, ok, ok, ln, float(q), q * 10.5, "A") for ok, ln, q in rows
    ]
    shuffled = list(full)
    random.Random(seed).shuffle(shuffled)
    a = table_checksum(spark.createDataFrame(full, cols)).collect()[0]
    b = table_checksum(
        spark.createDataFrame(shuffled, cols).repartition(5)
    ).collect()[0]
    assert (a.n_rows, a.xor_checksum, a.sum_checksum) == (
        b.n_rows, b.xor_checksum, b.sum_checksum,
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=30), min_size=4, max_size=16
    )
)
def test_burst_episodes_matches_bruteforce_property(spark, counts):
    """For ANY hourly count series, the episodes equal a sequential
    scan: flag hours above mean + 2sd, merge adjacent flagged hours,
    report each run's span/peak/volume."""
    import datetime as dt
    import math

    from soccerpredictor_spark.operators.timeseries import burst_episodes

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for h, n in enumerate(counts):
        for _ in range(n):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1, "x"))
            eid += 1
    if not rows:
        return
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = [
        (e.n_hours, e.peak_cnt, e.total_cnt)
        for e in burst_episodes(ev).collect()
    ]
    # brute force over OBSERVED hours only (zero-count hours produce
    # no rows, exactly like the grouped hourly table)
    obs = [(h, n) for h, n in enumerate(counts) if n > 0]
    vals = [n for _, n in obs]
    m = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals) - m * m
    gate = m + 2.0 * math.sqrt(max(var, 0.0))
    hot = [(h, n) for h, n in obs if n > gate]
    expect = []
    run: list = []
    for h, n in hot:
        if run and h - run[-1][0] <= 1:
            run.append((h, n))
        else:
            if run:
                expect.append(run)
            run = [(h, n)]
    if run:
        expect.append(run)
    expect = [
        (len(r), max(n for _, n in r), sum(n for _, n in r)) for r in expect
    ]
    assert sorted(got) == sorted(expect)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=1, max_size=10
    )
)
def test_interarrival_quantiles_match_bruteforce_property(spark, gaps):
    """For ANY gap multiset the discrete quantiles equal the sorted-
    list lookup at index ceil(q*n) (1-based)."""
    import datetime as dt

    from soccerpredictor_spark.operators.timeseries import (
        IAP_QUANTILES,
        interarrival_profile,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(0, t0, 1, "x")]
    s = 0
    for i, g in enumerate(gaps):
        s += g
        rows.append((i + 1, t0 + dt.timedelta(seconds=s), 1, "x"))
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {r.quantile: r.gap_s for r in interarrival_profile(ev).collect()}
    srt = sorted(gaps)
    n = len(srt)
    for name, num, den in IAP_QUANTILES:
        k = (n * num + den - 1) // den
        assert got[name] == srt[k - 1], (name, srt, got)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # user
            st.integers(min_value=0, max_value=20_000),   # seconds
            st.sampled_from(["click", "view", "purchase"]),
        ),
        min_size=1,
        max_size=14,
    )
)
def test_attribution_compare_matches_bruteforce_property(spark, evs):
    """For ANY event stream, first/last-touch credits equal the
    sequential reference: among a user's source events STRICTLY
    before the purchase and within the lookback, earliest/latest by
    (time, event_id) wins; none -> 'none'. Seconds are scaled up so
    some streams straddle the 7-day window."""
    import datetime as dt

    from soccerpredictor_spark.operators.windows import (
        ATTR_WINDOW_US,
        attribution_compare,
    )

    t0 = dt.datetime(2024, 1, 1)
    scale = 60  # up to ~13.9 days of span
    rows = [
        (i, t0 + dt.timedelta(seconds=s * scale), u, et)
        for i, (u, s, et) in enumerate(evs)
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        r.source: (r.n_first_touch, r.n_last_touch)
        for r in attribution_compare(ev).collect()
    }
    firsts: dict = {}
    lasts: dict = {}
    for i, (u, s, et) in enumerate(evs):
        if et != "purchase":
            continue
        t_us = s * scale * 1_000_000
        cands = [
            (s2 * scale * 1_000_000, j, e2)
            for j, (u2, s2, e2) in enumerate(evs)
            if u2 == u
            and e2 in ("click", "view")
            and t_us - ATTR_WINDOW_US <= s2 * scale * 1_000_000 <= t_us - 1
        ]
        f = min(cands)[2] if cands else "none"
        l = max(cands)[2] if cands else "none"
        firsts[f] = firsts.get(f, 0) + 1
        lasts[l] = lasts.get(l, 0) + 1
    expect = {
        src: (firsts.get(src, 0), lasts.get(src, 0))
        for src in set(firsts) | set(lasts)
    }
    assert got == expect


# --------------------------------------------------------------------------
# round-11 staged ops: BPE learning, corpus shuffle, Kneser-Ney
# --------------------------------------------------------------------------

def _py_bpe(word_counts: dict, n_merges: int):
    """Reference BPE: overlapping pair counts, (count desc, pair asc)
    winner, leftmost-non-overlapping merge — Sennrich's learn_bpe."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for rnd in range(1, n_merges + 1):
        pc: dict = {}
        for w, cnt in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + cnt
        if not pc:
            break
        (a, b), total = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, a + b, total))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


BPE_WORDS = st.lists(
    st.text(alphabet="ab", min_size=2, max_size=6),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=BPE_WORDS)
def test_bpe_learn_matches_python_model(spark, words):
    """For ANY small corpus over {a,b}: the distributed merge table
    equals the sequential Sennrich reference — same winners, same
    tie-breaks, same overlapping pair counts, same early stop."""
    from soccerpredictor_spark.operators.textops import bpe_learn_merges

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    got = [
        (r.round, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_learn_merges(docs, n_merges=5).collect()
    ]
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    expect, _ = _py_bpe(counts, 5)
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**12), min_size=1, max_size=40,
        unique=True,
    )
)
def test_corpus_shuffle_matches_hashlib_rank(spark, ids):
    """For ANY doc_id set: pos is the exact rank under the seeded md5
    key (independent hashlib computation), 1..n with no gaps — the
    two-level bucketed rank is invisible."""
    import hashlib

    from soccerpredictor_spark.operators.textops import corpus_shuffle

    docs = spark.createDataFrame([(i, "x") for i in ids], ["doc_id", "text"])
    got = {r.doc_id: r.pos for r in corpus_shuffle(docs).collect()}
    key = {
        i: int(hashlib.md5(f"sp-shuffle-42{i}".encode()).hexdigest()[:12], 16)
        for i in ids
    }
    order = sorted(ids, key=lambda i: (key[i], i))
    assert got == {i: rank for rank, i in enumerate(order, start=1)}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=2, max_size=20
    )
)
def test_kneser_ney_matches_python_model(spark, words):
    """For ANY short token stream: every reported bigram's p_kn equals
    the sequential Kneser-Ney computation (D=0.75) to double
    precision, and counts match exactly."""
    from soccerpredictor_spark.operators.textops import kneser_ney_bigram

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    rows = kneser_ney_bigram(docs).collect()
    big: dict = {}
    for w1, w2 in zip(words, words[1:]):
        big[(w1, w2)] = big.get((w1, w2), 0) + 1
    c1: dict = {}
    n1p: dict = {}
    ncont: dict = {}
    for (w1, w2), c in big.items():
        c1[w1] = c1.get(w1, 0) + c
        n1p[w1] = n1p.get(w1, 0) + 1
        ncont[w2] = ncont.get(w2, 0) + 1
    ntot = len(big)
    assert len(rows) == min(50, ntot)
    for r in rows:
        assert r.c12 == big[(r.w1, r.w2)]
        assert (r.c1, r.n1p_w1, r.ncont_w2) == (
            c1[r.w1], n1p[r.w1], ncont[r.w2]
        )
        expect = (big[(r.w1, r.w2)] - 0.75) / c1[r.w1] + 0.75 * (
            n1p[r.w1] / c1[r.w1]
        ) * (ncont[r.w2] / ntot)
        assert abs(r.p_kn - expect) < 1e-12


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(words=BPE_WORDS)
def test_bpe_fertility_matches_python_model(spark, words):
    """For ANY small corpus over {a,b}: piece totals after the merge
    loop equal the sequential reference's rewritten sequences (same
    merges -> same segmentation -> same fertility)."""
    from soccerpredictor_spark.operators.textops import bpe_encode_fertility

    docs = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])
    [r] = bpe_encode_fertility(docs, n_merges=3).collect()
    counts: dict = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    merges, seqs = _py_bpe(counts, 3)
    total_tokens = sum(counts.values())
    total_pieces = sum(c * len(seqs[w]) for w, c in counts.items())
    assert (r.n_types, r.n_merges_applied) == (len(counts), len(merges))
    assert (r.total_tokens, r.total_pieces) == (total_tokens, total_pieces)
    single = sum(c for w, c in counts.items() if len(seqs[w]) == 1)
    assert abs(r.pct_single_piece - single / total_tokens) < 1e-15


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=1, max_size=40
    )
)
def test_token_balanced_shards_invariants(spark, sizes):
    """For ANY size distribution: shards partition the corpus (doc and
    char totals conserved), per-shard doc counts differ by at most 1,
    and the boustrophedon chars spread is bounded by the largest
    document."""
    from soccerpredictor_spark.operators.textops import token_balanced_shards

    docs = spark.createDataFrame(
        [(i, "x", s) for i, s in enumerate(sizes)],
        ["doc_id", "text", "n_chars"],
    )
    rows = token_balanced_shards(docs, k=4).collect()
    assert sum(r.n_docs for r in rows) == len(sizes)
    assert sum(r.chars for r in rows) == sum(sizes)
    counts = [r.n_docs for r in rows]
    assert max(counts) - min(counts) <= 1
    if len(rows) == 4:  # all shards populated -> spread bound applies
        chars = [r.chars for r in rows]
        assert max(chars) - min(chars) <= max(sizes)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(
                "abYZ09 \t\n\r\f!#,.:;?@[]_~é中"
            ),
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_charclass_profile_matches_python_census(spark, texts):
    """For ANY text (including non-ASCII): the five class counts match
    a per-character Python census, and the classes PARTITION n_chars
    exactly (nothing double-counted, nothing dropped)."""
    import string

    from soccerpredictor_spark.operators.textops import charclass_profile

    docs = spark.createDataFrame(
        [(i, t, "xx", "s") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    [r] = charclass_profile(docs).collect()
    punct = set(string.punctuation)  # the 32 ASCII marks == \p{Punct}
    space = set(" \t\n\r\f")
    exp = {"alpha": 0, "digit": 0, "space": 0, "punct": 0, "other": 0, "n": 0}
    for t in texts:
        for ch in t:
            exp["n"] += 1
            if ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
                exp["alpha"] += 1
            elif "0" <= ch <= "9":
                exp["digit"] += 1
            elif ch in space:
                exp["space"] += 1
            elif ch in punct:
                exp["punct"] += 1
            else:
                exp["other"] += 1
    assert (r.n_chars, r.n_alpha, r.n_digit, r.n_space, r.n_punct,
            r.n_other) == (exp["n"], exp["alpha"], exp["digit"],
                           exp["space"], exp["punct"], exp["other"])
    assert (r.n_alpha + r.n_digit + r.n_space + r.n_punct + r.n_other
            == r.n_chars)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    tokens=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=5
    )
)
def test_data_constrained_mix_matches_sequential_waterfill(spark, tokens):
    """For ANY per-source token distribution: the allocation equals a
    sequential Python waterfill (sort by cap, cap-or-level, largest-
    remainder top-up), the budget identity sum(alloc) == 2*total holds
    exactly, and no source exceeds its 4-epoch cap."""
    from soccerpredictor_spark.operators.textops import (
        DATA_MIX_BUDGET_EPOCHS,
        DATA_MIX_MAX_EPOCHS,
        data_constrained_mix,
    )

    srcs = [f"s{i}" for i in range(len(tokens))]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "", s)
         for i, (s, n) in enumerate(zip(srcs, tokens))],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in data_constrained_mix(docs).collect()}

    # the family tokenization convention (split(trim(text), '\s+'))
    # counts the empty doc as ONE token ([''] on both engines) — the
    # model must count the same corpus the operator counts.
    tokens = [n if n > 0 else 1 for n in tokens]
    # sequential model (mirrors the operator's documented waterline)
    caps = sorted(
        (DATA_MIX_MAX_EPOCHS * n, s) for s, n in zip(srcs, tokens)
    )
    budget = min(
        DATA_MIX_BUDGET_EPOCHS * sum(tokens), sum(c for c, _ in caps)
    )
    alloc = {}
    remaining, n_rem = budget, len(caps)
    uncapped: list[str] = []
    lvl = rem = 0
    for cap, s in caps:
        if cap * n_rem <= remaining:
            alloc[s] = cap
            remaining -= cap
            n_rem -= 1
        else:
            if not uncapped:
                lvl, rem = remaining // n_rem, remaining % n_rem
            uncapped.append(s)
    for s in sorted(uncapped)[:rem]:
        alloc[s] = lvl + 1
    for s in sorted(uncapped)[rem:]:
        alloc[s] = lvl

    assert {s: r.alloc_tokens for s, r in got.items()} == alloc
    assert sum(r.alloc_tokens for r in got.values()) == budget
    for s, n in zip(srcs, tokens):
        assert got[s].alloc_tokens <= DATA_MIX_MAX_EPOCHS * n
        if got[s].at_cap == 1:
            assert got[s].alloc_tokens == got[s].cap_tokens


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vec_rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.one_of(
                st.none(),
                st.lists(
                    st.sampled_from([0.0, 1.0, -2.5, float("nan"),
                                     float("inf")]),
                    max_size=3,
                ),
            ),
        ),
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    doc_ids=st.lists(
        st.integers(min_value=0, max_value=9), max_size=8, unique=True
    ),
)
def test_embedding_integrity_audit_matches_python_model(
    spark, vec_rows, doc_ids
):
    """For ANY docs x vectors configuration (missing rows, NULL
    arrays, ragged dims, zero vectors, NaN/Inf): every check count
    matches a direct Python model, including the mode-dim tie-break
    to the smaller dimension."""
    import math
    from collections import Counter

    import pyspark.sql.types as T

    from soccerpredictor_spark.operators.similarity import (
        embedding_integrity_audit,
    )

    vecs = spark.createDataFrame(
        vec_rows,
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    got = {r["check"]: r.n for r in
           embedding_integrity_audit(vecs, docs).collect()}

    dims = Counter(len(e) for _, e in vec_rows if e is not None)
    mode = min(
        (d for d in dims if dims[d] == max(dims.values())), default=None
    ) if dims else None
    vids = {v for v, _ in vec_rows}
    dset = set(doc_ids)
    exp = {
        "missing_embedding": len(dset - vids),
        "orphan_vector": len(vids - dset),
        "null_embedding": sum(1 for _, e in vec_rows if e is None),
        "dim_mismatch": sum(
            1 for _, e in vec_rows if e is not None and len(e) != mode
        ),
        "zero_norm": sum(
            1 for _, e in vec_rows
            if e is not None and len(e) > 0
            and not any(x != 0 for x in e)
        ),
        "non_finite": sum(
            1 for _, e in vec_rows
            if e is not None
            and any(math.isnan(x) or math.isinf(x) for x in e)
        ),
    }
    assert got == exp


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # lang idx
            st.integers(min_value=0, max_value=2),    # source idx
            st.integers(min_value=0, max_value=400),  # n_chars
        ),
        min_size=1,
        max_size=24,
    )
)
def test_k_anonymity_monotone_in_k_property(spark, rows):
    """For ANY corpus: at-risk classes/docs are non-decreasing in k,
    totals are k-invariant, and the k=2 at-risk doc count equals the
    number of singleton QI classes."""
    from collections import Counter

    from soccerpredictor_spark.operators.quality import (
        K_ANON_LEN_BUCKET,
        k_anonymity_audit,
    )

    pdf = pd.DataFrame(
        [
            (i, f"l{li}", f"s{si}", nc)
            for i, (li, si, nc) in enumerate(rows)
        ],
        columns=["doc_id", "lang", "source", "n_chars"],
    )
    out = sorted(
        k_anonymity_audit(spark.createDataFrame(pdf)).collect(),
        key=lambda r: r.k,
    )
    assert [r.n_docs for r in out] == [len(rows)] * 3
    assert [r.n_classes for r in out] == [out[0].n_classes] * 3
    risk_docs = [r.n_docs_at_risk for r in out]
    risk_cls = [r.n_classes_below_k for r in out]
    assert risk_docs == sorted(risk_docs) and risk_cls == sorted(risk_cls)
    classes = Counter(
        (l, s, nc // K_ANON_LEN_BUCKET) for l, s, nc in rows
    )
    assert out[0].n_docs_at_risk == sum(
        1 for v in classes.values() if v < 2
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # lang idx
            st.integers(min_value=0, max_value=30),  # n alpha chars
            st.integers(min_value=0, max_value=30),  # n digit chars
        ),
        min_size=1,
        max_size=16,
    )
)
def test_script_lang_consistency_shares_property(spark, rows):
    """For ANY corpus: per-lang shares sum to 1 over the 5-bin spine,
    exactly one modal cell per lang, and n_docs totals match."""
    from soccerpredictor_spark.operators.textops import (
        script_lang_consistency,
    )

    pdf = pd.DataFrame(
        [
            (i, "a" * na + "1" * nd, f"l{li}")
            for i, (li, na, nd) in enumerate(rows)
            if na + nd > 0
        ],
        columns=["doc_id", "text", "lang"],
    )
    if pdf.empty:
        return
    out = script_lang_consistency(spark.createDataFrame(pdf)).collect()
    langs = {r.lang for r in out}
    for lang in langs:
        cells = [r for r in out if r.lang == lang]
        assert len(cells) == 5
        assert abs(sum(r.share for r in cells) - 1.0) < 1e-12
        assert sum(1 for r in cells if r.is_modal) == 1
        modal = max(cells, key=lambda r: (r.n_docs, -r.alpha_bin))
        assert next(r for r in cells if r.is_modal).n_docs == modal.n_docs
    assert sum(r.n_docs for r in out) == len(pdf)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
def test_split_balance_audit_totals_property(spark, ids):
    """For ANY id set: per-label totals partition the corpus, n_eval
    matches the md5 bucket computed independently in Python, and
    eval_frac stays in [0, 1]."""
    import hashlib

    from soccerpredictor_spark.operators.similarity import (
        split_balance_audit,
    )

    pdf = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [[0.0] * 64 for _ in ids],
            "label": [i % 3 for i in ids],
        }
    )
    out = split_balance_audit(spark.createDataFrame(pdf)).collect()
    assert sum(r.n_total for r in out) == len(ids)

    def is_eval(i):
        return int(hashlib.md5(f"kv:{i}".encode()).hexdigest()[:8], 16) % 5 == 4

    for r in out:
        expect = sum(1 for i in ids if i % 3 == r.label and is_eval(i))
        assert r.n_eval == expect
        assert 0.0 <= r.eval_frac <= 1.0


PACK_CORPUS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),   # doc_id (may collide; deduped)
        st.integers(min_value=1, max_value=600),  # token count
        st.sampled_from(["sA", "sB", "sC"]),      # source
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=PACK_CORPUS)
def test_packing_fragmentation_property(spark, rows):
    """For ANY corpus: every rung sees the same n_docs; crossings and
    split counts are exactly the per-source cumulative-offset
    recomputation; and both are monotone non-increasing as ctx doubles
    (multiples of 2c are a subset of multiples of c)."""
    from soccerpredictor_spark.operators.textops import (
        PACK_SWEEP_CTX,
        packing_fragmentation_sweep,
    )

    rows = list({d: (d, n, s) for d, n, s in rows}.values())
    docs = spark.createDataFrame(
        [(d, " ".join(f"t{i}" for i in range(n)), s) for d, n, s in rows],
        "doc_id long, text string, source string",
    )
    got = {
        r.ctx: (r.n_docs, r.n_docs_split, r.n_crossings)
        for r in packing_fragmentation_sweep(docs).collect()
    }
    # independent recomputation: per-source offsets in doc_id order
    spans = []
    for src in {s for _, _, s in rows}:
        cum = 0
        for d, n, s in sorted(r for r in rows if r[2] == src):
            spans.append((cum, cum + n - 1))
            cum += n
    for ctx in PACK_SWEEP_CTX:
        crossings = sum(e // ctx - st_ // ctx for st_, e in spans)
        split = sum(1 for st_, e in spans if e // ctx != st_ // ctx)
        assert got[ctx] == (len(spans), split, crossings)
    ordered = [got[c] for c in sorted(PACK_SWEEP_CTX)]
    assert all(a[1] >= b[1] and a[2] >= b[2] for a, b in zip(ordered, ordered[1:]))


SHUFFLE_CORPUS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.sampled_from(["sA", "sB", "sC", "sD"]),
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=SHUFFLE_CORPUS)
def test_shuffle_run_audit_property(spark, rows):
    """For ANY corpus: the audit equals an independent Python
    recomputation of the md5 shuffle order's islands (hashlib oracle
    of the SHUFFLE_SEED convention), and the internal identities hold
    (sum n_docs = corpus, mean_run * n_runs = n_docs, max <= n_docs)."""
    import hashlib
    import itertools

    from soccerpredictor_spark.operators.textops import (
        SHUFFLE_KEY_HEX,
        SHUFFLE_SEED,
        shuffle_run_audit,
    )

    rows = list({d: (d, s) for d, s in rows}.values())
    docs = spark.createDataFrame(
        [(d, "tok", s) for d, s in rows],
        "doc_id long, text string, source string",
    )

    def key(d):
        h = hashlib.md5(f"{SHUFFLE_SEED}{d}".encode()).hexdigest()
        return int(h[:SHUFFLE_KEY_HEX], 16)

    seq = [s for _, s in sorted(rows, key=lambda r: (key(r[0]), r[0]))]
    expected = {}
    for src, grp in itertools.groupby(seq):
        n = len(list(grp))
        runs, mx, total = expected.get(src, (0, 0, 0))
        expected[src] = (runs + 1, max(mx, n), total + n)
    got = {r.source: r for r in shuffle_run_audit(docs).collect()}
    assert set(got) == set(expected)
    for src, (runs, mx, total) in expected.items():
        r = got[src]
        assert (r.n_runs, r.max_run_len, r.n_docs) == (runs, mx, total)
        assert r.mean_run_len * r.n_runs == r.n_docs
        assert r.max_run_len <= r.n_docs


MIX_CORPUS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=1, max_value=40),
        st.sampled_from(["sA", "sB", "sC"]),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=MIX_CORPUS)
def test_mixture_repetition_audit_property(spark, rows):
    """For ANY corpus: shares sum to 1; the floored targets sum to at
    most the 2-epoch budget and miss it by less than n_sources;
    epochs * tokens == target exactly; excess = max(0, target-4*tok)."""
    from soccerpredictor_spark.operators.textops import (
        DATA_MIX_BUDGET_EPOCHS,
        DATA_MIX_MAX_EPOCHS,
        mixture_repetition_audit,
    )

    rows = list({d: (d, n, s) for d, n, s in rows}.values())
    docs = spark.createDataFrame(
        [(d, " ".join(f"t{i}" for i in range(n)), s) for d, n, s in rows],
        "doc_id long, text string, source string",
    )
    out = mixture_repetition_audit(docs).collect()
    total = sum(n for _, n, _ in rows)
    budget = total * DATA_MIX_BUDGET_EPOCHS
    assert abs(sum(r.share for r in out) - 1.0) < 1e-12
    tsum = sum(r.target_tokens for r in out)
    assert budget - len(out) < tsum <= budget
    for r in out:
        assert r.epochs_implied == r.target_tokens / r.tokens
        assert r.excess_tokens == max(
            0, r.target_tokens - DATA_MIX_MAX_EPOCHS * r.tokens
        )
        assert r.over_cap == (
            r.target_tokens > DATA_MIX_MAX_EPOCHS * r.tokens
        )
