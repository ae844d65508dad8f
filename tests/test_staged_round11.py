"""STAGED operators — semantic unit tests with closed-form answers
PLUS a direct Spark-vs-DuckDB value parity check for each, the same
gate registered entries get from test_oracle_parity. ROUND-12 STATUS:
50 of the 58 graduated to the registry (the whole r12 driver window;
verified 50/50 driver-style pre-commit); the 9 pending —
ivf_nprobe_sweep, embedding_threshold_sweep, bpe_merge_curve,
rfm_quintiles, kneser_ney_trigram, bloom_size_sweep, ship_lag_profile,
streaming_value_histogram, and the round-12-staged unigram_lm_pieces
— register in the r13 window alongside the r7 rotation cohort
(PLANS.md "Round-13 window plan"). Gates stay on
for graduated entries (precedent: test_staged_round10.py) — they are
the family's closed-form/property coverage, not just parity.

Batches 1-17 were staged in round 10 (stupid_backoff_lm,
ngram_decontaminate and knn_label_eval graduated to the registry in
round 11); the round-11 batch adds the learned-tokenizer family
(bpe_learn_merges / bpe_merge_curve / bpe_encode_fertility /
doc_token_budget), training-order ops (corpus_shuffle,
curriculum_order, token_balanced_shards), Kneser-Ney bigram+trigram,
embedding_split_leakage, temperature_sweep, ivf_nprobe_sweep,
embedding_threshold_sweep, rfm_quintiles.

Staged set (batch 1): mann_whitney_u,
holt_winters, group_holdout_split.
Staged set (batch 2): mann_kendall,
bottomk_sample_audit.
Staged set (batch 3): clustering_coefficient, graph_assortativity,
kcore_decomposition, bradley_terry_strength.
Staged set (batch 4): calibration_ece, source_overlap_matrix.
Staged set (batch 5): lsh_pair_recall_eval, join_size_audit,
embedding_drift, stratified_kfold.
Staged set (batch 6): dedup_threshold_sweep, burst_episodes,
capped_mix_waterfill.
Staged set (batch 7): ams_f2_audit, fd_audit, matthews_corr,
overdispersion_audit.
Staged set (batch 8): record_highs, topk_churn,
histogram_overlap_drift.
Staged set (batch 9): bloom_size_sweep, weighted_median,
interarrival_profile.
Staged set (batch 10): dedup_shingle_sweep, hod_uniformity,
streaming value_histogram.
Staged set (batch 11): table_checksum, out_of_order_audit.
Staged set (batch 12): dedup_cluster_sizes, attribution_compare,
freshness_audit.
Staged set (batch 13): ship_lag_profile, hll_intersection_est.
Staged set (batch 14): value_concentration, temporal_leakage_audit.
Staged set (batch 15): source_dup_rate.
Staged set (batch 16): rank_stability_tau, activity_streaks,
gini_activity.
Staged set (batch 17): session_gap_sweep.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

SF = "/root/testdata/sf0.001"

STAGED = [
    # GRADUATION (round-17 housekeeping): every prior staged batch —
    # r11 holdovers through the 14-op round-16 batch
    # (domain_blocklist_filter..span_cut_plan) — is now REGISTERED,
    # so parity/plan gates for all of them run via
    # tests/test_oracle_parity.py and gen_plans-audited plans like
    # every registered entry. Their closed-form unit tests (here and
    # in test_staged_round17.py) are kept. This list holds ONLY
    # not-yet-registered staged operators:
    # (name, module, table); a TUPLE table entry means the operator
    # takes several tables, in that order.
    # Round-18 housekeeping: the 8-op round-17 staged batch
    # (span_cut_apply_stats..dedup_cluster_density) is now REGISTERED;
    # their closed-form tests stay in test_staged_round18.py.
    # Round-19 housekeeping: the 5-op round-18 staged batch
    # (robots_rule_marginal_sweep, ann_recall_k_sweep, the
    # curate_corpus capstone trio) is now REGISTERED; their
    # closed-form tests stay in test_staged_round19.py. The list is
    # EMPTY until a genuinely new family is staged (the registry is
    # at semantic saturation on these fixtures — grep registry names
    # and the PLANS.md NOT-feasible list before adding here).
]


@pytest.mark.parametrize("name,module,table", STAGED)
def test_staged_parity_vs_duckdb(spark, name, module, table):
    """Every staged operator's Spark result must match its DuckDB
    twin exactly on the sf0.001 fixtures (rows, columns, numeric
    KIND, values) — the registration-readiness gate. Unlike the
    round-10 staged gate, dtype KIND is asserted too (the driver's
    value hash is type-sensitive; cms_heavy_change slipped a HUGEINT
    through the weaker check)."""
    import importlib

    import duckdb
    import pandas as pd

    from soccerpredictor_spark.sources.catalog import read_table

    mod = importlib.import_module(module)
    tables = table if isinstance(table, tuple) else (table,)
    sdf = getattr(mod, name)(
        *[read_table(spark, SF, t) for t in tables]
    ).toPandas()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    odf = con.execute(getattr(mod, f"{name}_sql")()).fetchdf()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    assert sc == oc, f"{name}: columns {sc} vs {oc}"
    a = sdf[sc].sort_values(sc).reset_index(drop=True)
    b = odf[oc].sort_values(oc).reset_index(drop=True)
    for c in sc:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if {ka, kb} <= {"i", "u", "f"}:
            assert (ka in "iu") == (kb in "iu"), (
                f"{name}.{c}: numeric kind mismatch {a[c].dtype} vs "
                f"{b[c].dtype} — un-cast HUGEINT in the oracle?"
            )
        pd.testing.assert_series_equal(
            a[c], b[c], check_dtype=False, check_names=False, check_exact=True
        )


class TestMannWhitneyU:
    def test_closed_form_no_ties(self, spark):
        """A = {30, 40}, B = {10, 20}: every A beats every B, so
        U_A = 4 (u2 = 8); ranks 1..4 exactly."""
        from soccerpredictor_spark.operators.mlprep import mann_whitney_u

        rows = [
            (1, 1, "F", 0.30), (2, 2, "F", 0.40),
            (3, 3, "O", 0.10), (4, 4, "O", 0.20),
            (5, 5, "P", 9.99),  # excluded status
        ]
        orders = spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
        )
        [r] = mann_whitney_u(orders).collect()
        assert (r.n_a, r.n_b) == (2, 2)
        assert r.u2_a == 8.0
        # z = (U - n_a n_b/2)/sqrt(n_a n_b (n+1)/12) = 2/sqrt(5/3*...)
        var = 2 * 2 / 12 * (5 - 0)
        assert abs(r.z - (4 - 2) / math.sqrt(var)) < 1e-12

    def test_all_tied_z_is_zero_numerator(self, spark):
        """Every observation equal: midranks make U exactly
        n_a*n_b/2 and the tie correction drives the variance to 0 —
        the zero-variance guard surfaces z as NULL on BOTH engines
        (the _pearson_from_sums convention; a raw 0/0 would be
        NaN-vs-NULL engine-dependent). Pin the exact U."""
        from soccerpredictor_spark.operators.mlprep import mann_whitney_u

        rows = [
            (1, 1, "F", 1.00), (2, 2, "F", 1.00),
            (3, 3, "O", 1.00), (4, 4, "O", 1.00),
        ]
        orders = spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
        )
        [r] = mann_whitney_u(orders).collect()
        assert r.u2_a == 2.0 * 2 * 2 / 2 * 2 / 2  # 2*U = n_a*n_b = 4
        assert r.z is None


class TestHoltWinters:
    def test_linear_series_zero_error(self, spark):
        """Counts on an exact line y_t = 2 + 3t: Holt with any alpha
        tracks a perfect line exactly once initialized — level ends
        at the last y, trend at the slope, RMSE 0."""
        from soccerpredictor_spark.operators.timeseries import holt_winters

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in range(6):
            for _ in range(2 + 3 * h):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=5),
                             1, "click"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = holt_winters(ev).collect()
        assert r.n_hours == 6
        assert r.level == 2 + 3 * 5
        assert r.trend == 3.0
        assert r.forecast_next == 2 + 3 * 6
        assert r.rmse_one_step == 0.0


class TestGroupHoldoutSplit:
    def test_group_method_never_leaks(self, spark):
        """The customer-keyed split puts every order of a customer on
        one side (0 leaked groups); the row-keyed split on the same
        data leaks any multi-order customer whose orders hash apart."""
        from soccerpredictor_spark.operators.mlprep import group_holdout_split

        rows = [
            (k, k % 7, "F", float(k)) for k in range(1, 200)
        ]
        orders = spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
        )
        got = {r.split_method: r for r in group_holdout_split(orders).collect()}
        assert got["group"].n_leaked_groups == 0
        assert got["group"].n_groups == 7
        # 199 orders over 7 customers: the row split almost surely
        # splits at least one customer (deterministic given md5)
        assert got["row"].n_leaked_groups > 0
        for m in ("group", "row"):
            assert got[m].n_train_rows + got[m].n_test_rows == 199


class TestStupidBackoff:
    def test_backoff_branches(self, spark):
        """Constructed 4-doc corpus where held-out trigrams hit all
        three branches; scores bounded in (0, 1] and the worst doc is
        the OOV one."""
        from soccerpredictor_spark.operators.textops import stupid_backoff_lm

        # find doc ids for each half deterministically (md5 'sb:<id>')
        import hashlib

        def half(doc_id: int) -> int:
            return int(hashlib.md5(f"sb:{doc_id}".encode()).hexdigest()[:8],
                       16) % 2

        train_ids = [i for i in range(40) if half(i) == 0][:2]
        held_ids = [i for i in range(40) if half(i) == 1][:2]
        assert len(train_ids) == 2 and len(held_ids) == 2
        docs = spark.createDataFrame(
            [
                (train_ids[0], "the cat sat on the mat", "s"),
                (train_ids[1], "the cat ran on the mat", "s"),
                # held-out: seen trigram path + backoff paths
                (held_ids[0], "the cat sat on the mat", "s"),
                (held_ids[1], "zz qq ww", "s"),  # full OOV -> score 0
            ],
            ["doc_id", "text", "source"],
        )
        got = {r.doc_id: r for r in stupid_backoff_lm(docs).collect()}
        assert set(got) == set(held_ids)
        seen = got[held_ids[0]]
        oov = got[held_ids[1]]
        assert seen.n_scored == 4 and oov.n_scored == 1
        assert oov.mean_score == 0.0
        assert 0.0 < seen.mean_score <= 1.0


class TestNgramDecontaminate:
    def test_shared_span_flagged_clean_doc_not(self, spark):
        """A train doc sharing a 15-token run with a benchmark doc
        reports exactly that span; an unrelated train doc emits no
        row; benchmark docs are never self-reported."""
        from soccerpredictor_spark.operators.textops import (
            ngram_decontaminate,
        )

        shared = " ".join(f"w{i}" for i in range(15))  # 15 tokens
        pre = " ".join(f"a{i}" for i in range(10))
        post = " ".join(f"b{i}" for i in range(10))
        docs = spark.createDataFrame(
            [
                (1, f"benchmark prefix {shared} benchmark suffix", "en",
                 "src0", 0),
                (2, f"{pre} {shared} {post}", "en", "src5", 0),
                (3, " ".join(f"c{i}" for i in range(40)), "en", "src6", 0),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = {r.doc_id: r for r in ngram_decontaminate(docs).collect()}
        assert set(rows) == {2}
        r = rows[2]
        # 15-token shared run -> 3 colliding 13-gram starts -> ONE
        # merged span of 15 tokens out of 35
        assert r.n_contam_spans == 1
        assert r.contam_tokens == 15
        assert r.n_tokens == 35
        assert abs(r.contam_fraction - 15 / 35) < 1e-12


class TestMannKendall:
    def test_strictly_increasing(self, spark):
        """y = 1..6 strictly rising: S = C(6,2) = 15, no ties, z > 0
        with the continuity correction (S-1)."""
        from soccerpredictor_spark.operators.timeseries import mann_kendall

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in range(6):
            for _ in range(1 + h):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=2),
                             1, "view"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = mann_kendall(ev).collect()
        assert r.n_points == 6 and r.s_stat == 15
        var = 6 * 5 * 17 / 18.0
        assert abs(r.z - (15 - 1) / math.sqrt(var)) < 1e-12

    def test_constant_series_null_z(self, spark):
        """All counts equal: every pair ties, S = 0 and the tie
        correction zeroes the variance -> z is NULL (guarded)."""
        from soccerpredictor_spark.operators.timeseries import mann_kendall

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in range(5):
            for _ in range(3):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=2),
                             1, "view"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = mann_kendall(ev).collect()
        assert r.s_stat == 0 and r.z is None


class TestBottomkSampleAudit:
    def test_merge_is_lossless_and_estimate_sane(self, spark):
        """500 distinct users: bottom-k(shard-k union) equals the
        whole-stream bottom-k rank-for-rank (n_equal == k), and the
        KMV estimate lands within 50% of truth at k=256/n=500."""
        from soccerpredictor_spark.operators.sketch import (
            bottomk_sample_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(minutes=i), i % 500, "click")
            for i in range(1500)
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = bottomk_sample_audit(ev).collect()
        assert r.k == 256
        assert r.n_equal == 256  # mergeability is exact
        assert r.exact_distinct == 500
        assert abs(r.rel_error) < 0.5


class TestKnnLabelEval:
    def test_separable_clusters_perfect_accuracy(self, spark):
        """Two orthogonal label clusters with tiny deterministic
        jitter: every held-out query's 5-NN vote recovers its label."""
        from soccerpredictor_spark.operators.similarity import knn_label_eval

        rows = []
        for vid in range(120):
            lab = vid % 2
            base = [0.0] * 8
            base[lab * 4] = 1.0
            base[lab * 4 + 1] = 0.001 * (vid % 7)  # jitter, same side
            rows.append((vid, base, lab))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        [r] = knn_label_eval(emb).collect()
        assert r.k == 5
        assert r.n_queries > 0
        assert r.n_correct == r.n_queries
        assert r.accuracy == 1.0


def _edge_events(spark, edges):
    """Events realizing EXACTLY the given co-activity edge list: each
    (u, v) pair shares two distinct 900s buckets (weight 2 >= the
    MIN_EDGE_WEIGHT threshold), and every bucket holds only that pair
    (under the per-bucket user cap)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for n, (u, v) in enumerate(edges):
        for rep in range(2):
            b = t0 + dt.timedelta(seconds=900 * (n * 10 + rep))
            for user in (u, v):
                rows.append((eid, b, user, "click"))
                eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )


class TestClusteringCoefficient:
    def test_triangle_with_pendant(self, spark):
        """Triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1 (their
        whole neighborhood is connected), lcc(3)=1/3 (one of three
        neighbor pairs closed), node 4 (deg 1) emits no row."""
        from soccerpredictor_spark.operators.graph import (
            clustering_coefficient,
        )
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        ev = _edge_events(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = {
            r.user_id: (r.degree, r.n_triangles, r.lcc)
            for r in clustering_coefficient(ev).collect()
        }
        assert got == {
            1: (2, 1, 1.0),
            2: (2, 1, 1.0),
            3: (3, 1, 1.0 / 3.0),
        }
        clear_caches()


class TestAssortativity:
    def test_star_is_perfectly_disassortative(self, spark):
        """A star K_{1,3}: every edge joins degree 3 to degree 1, so
        the endpoint-degree correlation is exactly -1."""
        from soccerpredictor_spark.operators.graph import graph_assortativity
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        ev = _edge_events(spark, [(10, 1), (10, 2), (10, 3)])
        [r] = graph_assortativity(ev).collect()
        assert r.n_edges == 3
        assert abs(r.assortativity - (-1.0)) < 1e-12
        clear_caches()


class TestKCore:
    def test_k4_survives_tail_peeled(self, spark):
        """K4 on {1,2,3,4} with a tail 4-5-6: the 3-core peel removes
        6 (deg 1), then 5, leaving exactly the K4 — every survivor at
        core degree 3. A plain degree>=3 filter would have kept
        nothing extra but also not cascaded; the tail proves the
        cascade."""
        from soccerpredictor_spark.operators.graph import kcore_decomposition
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        ev = _edge_events(spark, k4 + [(4, 5), (5, 6)])
        got = {
            r.user_id: r.core_degree
            for r in kcore_decomposition(ev).collect()
        }
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}
        clear_caches()


class TestBradleyTerry:
    def test_two_items_win_ratio(self, spark):
        """Item A beats item B in 3 of 4 comparisons: the BT MLE has
        p_A/p_B = 3 exactly (two-item closed form w_A/w_B), and the
        mean-1 rescale pins p_A + p_B = 2 -> (1.5, 0.5). Ten MM
        rounds converge far past 1e-9 on two items."""
        from soccerpredictor_spark.operators.mlprep import (
            bradley_terry_strength,
        )

        rows = []
        # 4 orders, each with parts 100 and 200; A=100 larger qty in 3
        for ok, (qa, qb) in enumerate([(5, 1), (4, 2), (9, 3), (1, 7)]):
            rows.append((ok, 100, float(qa)))
            rows.append((ok, 200, float(qb)))
        li = spark.createDataFrame(
            rows, ["l_orderkey", "l_partkey", "l_quantity"]
        )
        got = {r.item: r for r in bradley_terry_strength(li).collect()}
        assert got[100].n_games == 4 and got[100].n_wins == 3
        assert got[200].n_wins == 1
        assert abs(got[100].strength / got[200].strength - 3.0) < 1e-6
        assert abs(got[100].strength + got[200].strength - 2.0) < 1e-12
        assert got[100].rank == 1 and got[200].rank == 2


@pytest.mark.parametrize("name,module,table", STAGED)
def test_staged_plan_stays_jvm_side(spark, name, module, table):
    """Convention gate at staging time (mirrors tests/test_plans.py
    for registered entries): no row-at-a-time Python anywhere, and no
    Arrow Python either — every staged operator is pure DataFrame."""
    import importlib

    from soccerpredictor_spark.sources.catalog import read_table

    mod = importlib.import_module(module)
    tables = table if isinstance(table, tuple) else (table,)
    df = getattr(mod, name)(*[read_table(spark, SF, t) for t in tables])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


class TestBpeLearnMerges:
    def test_closed_form_merge_sequence(self, spark):
        """Corpus = {aaab x3, xy x2}. Round 1: (a,a) appears twice per
        'aaab' (overlapping pair counting) -> 6, beats (a,b)=3 and
        (x,y)=2; the merge is leftmost-non-overlapping so 'aaab' ->
        [aa, a, b]. Round 2: (aa,a) and (a,b) tie at 3 -> lexicographic
        tie-break picks (a,b) ('a' < 'aa'), giving [aa, ab]. Round 3:
        (aa,ab)=3 completes the word. Round 4: (x,y)=2."""
        from soccerpredictor_spark.operators.textops import bpe_learn_merges

        docs = spark.createDataFrame(
            [(1, "aaab aaab xy"), (2, "aaab xy")], ["doc_id", "text"]
        )
        rows = bpe_learn_merges(docs, n_merges=4).collect()
        got = [(r.round, r.lhs, r.rhs, r.merged, r.pair_count) for r in rows]
        assert got == [
            (1, "a", "a", "aa", 6),
            (2, "a", "b", "ab", 3),
            (3, "aa", "ab", "aaab", 3),
            (4, "x", "y", "xy", 2),
        ]

    def test_early_stop_when_fully_merged(self, spark):
        """A corpus whose only type is 2 chars exhausts its pairs after
        one merge; requesting more rounds returns only the learnable
        ones (the DuckDB twin's empty-m{k} CTEs drop the same rows)."""
        from soccerpredictor_spark.operators.textops import bpe_learn_merges

        docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
        rows = bpe_learn_merges(docs, n_merges=5).collect()
        assert [(r.round, r.merged, r.pair_count) for r in rows] == [
            (1, "ab", 3)
        ]

    def test_single_char_words_excluded(self, spark):
        """Words shorter than 2 chars never reach the type table (no
        pairs to learn from); 'a b a b' alone learns nothing."""
        from soccerpredictor_spark.operators.textops import bpe_learn_merges

        docs = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
        assert bpe_learn_merges(docs, n_merges=3).count() == 0


class TestBpeEncodeFertility:
    def test_closed_form_full_and_partial_merge(self, spark):
        """Corpus {aaab x3, xy x2}: after 4 merges both types are one
        piece (5 tokens, 5 pieces); after only 1 merge 'aaab' ->
        [aa,a,b] and 'xy' -> [x,y], so 3*3 + 2*2 = 13 pieces and
        fertility 13/5 = 2.6."""
        from soccerpredictor_spark.operators.textops import bpe_encode_fertility

        docs = spark.createDataFrame(
            [(1, "aaab aaab xy"), (2, "aaab xy")], ["doc_id", "text"]
        )
        [r] = bpe_encode_fertility(docs, n_merges=4).collect()
        assert (r.n_types, r.n_merges_applied, r.total_tokens, r.total_pieces) == (
            2, 4, 5, 5,
        )
        assert r.pct_single_piece == 1.0
        [r1] = bpe_encode_fertility(docs, n_merges=1).collect()
        assert r1.total_pieces == 13
        assert abs(r1.pieces_per_token - 2.6) < 1e-15

    def test_merge_exhaustion_keeps_table_defined(self, spark):
        """'ab' exhausts after 1 merge; asking for 5 must report
        n_merges_applied=1 over the post-merge table (the oracle's
        empty-m{k} fallback branch mirrors the Spark early break)."""
        from soccerpredictor_spark.operators.textops import bpe_encode_fertility

        docs = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
        [r] = bpe_encode_fertility(docs, n_merges=5).collect()
        assert (r.n_merges_applied, r.total_tokens, r.total_pieces) == (1, 3, 3)
        assert r.pct_single_piece == 1.0


class TestCurriculumOrder:
    def test_tiers_monotone_and_shuffled_within(self, spark):
        """pos must stream tier 0 before 1 before 2, and the order
        WITHIN a tier must equal corpus_shuffle's relative order
        (same seed, same key)."""
        from soccerpredictor_spark.operators.textops import (
            corpus_shuffle,
            curriculum_order,
        )

        rows = [(i, "x", 100 if i % 3 == 0 else (500 if i % 3 == 1 else 900))
                for i in range(60)]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
        cur = curriculum_order(docs).collect()
        tiers_along_pos = [r.tier for r in sorted(cur, key=lambda r: r.pos)]
        assert tiers_along_pos == sorted(tiers_along_pos)
        assert sorted(r.pos for r in cur) == list(range(1, 61))
        # within-tier order == corpus_shuffle relative order
        shuf = {r.doc_id: r.pos for r in corpus_shuffle(docs).collect()}
        for t in (0, 1, 2):
            ids = [r.doc_id for r in sorted(cur, key=lambda r: r.pos) if r.tier == t]
            assert ids == sorted(ids, key=lambda i: shuf[i])


class TestDocTokenBudget:
    def test_closed_form_piece_counts(self, spark):
        """{aaab aaab xy | aaab xy}, 1 merge (a,a): 'aaab' -> 3
        pieces, 'xy' -> 2. Doc1 = 8 pieces / 3 tokens, doc2 = 5 / 2 —
        one 0-bucket row (2 docs, 5 tokens, 13 pieces)."""
        from soccerpredictor_spark.operators.textops import doc_token_budget

        docs = spark.createDataFrame(
            [(1, "aaab aaab xy"), (2, "aaab xy")], ["doc_id", "text"]
        )
        [r] = doc_token_budget(docs, n_merges=1).collect()
        assert (r.piece_bucket, r.n_docs, r.tokens, r.pieces) == (0, 2, 5, 13)

    def test_oov_fallback_and_wordless_doc(self, spark):
        """Words outside the modeled vocab fall back to char-level
        pieces (1-char word -> 1; an 18-char run -> 18); a doc with no
        [a-z]+ words lands in the zero bucket with 0 tokens."""
        from soccerpredictor_spark.operators.textops import doc_token_budget

        docs = spark.createDataFrame(
            [(1, "a " + "z" * 18), (2, "???")], ["doc_id", "text"]
        )
        rows = {r.piece_bucket: r for r in doc_token_budget(docs, n_merges=1).collect()}
        [r] = rows.values()
        assert (r.piece_bucket, r.n_docs, r.tokens, r.pieces) == (0, 2, 2, 19)


class TestEmbeddingSplitLeakage:
    def test_closed_form_cross_pairs(self, spark):
        """Three IDENTICAL vectors — one whose id hashes into the eval
        bucket, two into train — plus two far-apart singletons: the
        identical triple yields 3 pairs, 2 of them cross-split, 1
        contaminated eval vector, max cross sim 1.0."""
        import hashlib

        from soccerpredictor_spark.operators.similarity import (
            embedding_split_leakage,
        )

        def is_eval(i):
            return int(hashlib.md5(f"kv:{i}".encode()).hexdigest()[:8], 16) % 5 == 4

        eval_ids = [i for i in range(200) if is_eval(i)]
        train_ids = [i for i in range(200) if not is_eval(i)]
        ids = [eval_ids[0], train_ids[0], train_ids[1]]
        v = [1.0] * 64
        far = [[100.0 * (1 if d == k else 0) - 50.0 for d in range(64)]
               for k in (0, 1)]
        rows = [(i, v, 0) for i in ids] + [
            (train_ids[2], far[0], 0), (train_ids[3], far[1], 0)
        ]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        [r] = embedding_split_leakage(emb).collect()
        assert r.n_pairs >= 3  # the triple; far vectors may pair with nothing
        assert r.n_cross == 2
        assert r.n_eval_contaminated == 1
        assert r.n_eval_total == 1
        assert r.max_cross_sim == 1.0


class TestKneserNeyTrigram:
    def test_matches_sequential_reference(self, spark):
        """Every reported trigram's p_kn3 equals the sequential
        Chen-Goodman interpolated-KN computation (D=0.75, type-count
        continuations at every lower order) to double precision."""
        from soccerpredictor_spark.operators.textops import kneser_ney_trigram

        words = "a b c a b c a b d b c a".split()
        docs = spark.createDataFrame(
            [(1, " ".join(words))], ["doc_id", "text"]
        )
        rows = kneser_ney_trigram(docs).collect()

        tri: dict = {}
        for t in zip(words, words[1:], words[2:]):
            tri[t] = tri.get(t, 0) + 1
        c12: dict = {}
        n1p12: dict = {}
        for (w1, w2, w3), c in tri.items():
            c12[(w1, w2)] = c12.get((w1, w2), 0) + c
            n1p12[(w1, w2)] = n1p12.get((w1, w2), 0) + 1
        big23 = {}
        for (w1, w2, w3) in tri:
            big23[(w2, w3)] = big23.get((w2, w3), 0) + 1
        n1p2: dict = {}
        nmid2: dict = {}
        cont3: dict = {}
        for (w2, w3), c in big23.items():
            n1p2[w2] = n1p2.get(w2, 0) + 1
            nmid2[w2] = nmid2.get(w2, 0) + c
            cont3[w3] = cont3.get(w3, 0) + 1
        ntot = len(big23)
        D = 0.75
        assert len(rows) == len(tri)
        for r in rows:
            key = (r.w1, r.w2, r.w3)
            pc = cont3[r.w3] / ntot
            p2 = (big23[(r.w2, r.w3)] - D) / nmid2[r.w2] + D * (
                n1p2[r.w2] / nmid2[r.w2]
            ) * pc
            p3 = (tri[key] - D) / c12[(r.w1, r.w2)] + D * (
                n1p12[(r.w1, r.w2)] / c12[(r.w1, r.w2)]
            ) * p2
            assert r.c123 == tri[key]
            assert abs(r.p_kn3 - p3) < 1e-12

    def test_probabilities_in_range_and_sum_bound(self, spark):
        """All reported p_kn3 in (0, 1]; for a fixed context the seen
        mass never exceeds 1."""
        from soccerpredictor_spark.operators.textops import kneser_ney_trigram

        docs = spark.createDataFrame(
            [(1, "x y z x y w x y z"), (2, "y z x y z w")],
            ["doc_id", "text"],
        )
        rows = kneser_ney_trigram(docs).collect()
        assert rows and all(0.0 < r.p_kn3 <= 1.0 for r in rows)
        by_ctx: dict = {}
        for r in rows:
            by_ctx.setdefault((r.w1, r.w2), 0.0)
            by_ctx[(r.w1, r.w2)] += r.p_kn3
        assert all(s <= 1.0 + 1e-9 for s in by_ctx.values())


class TestRfmSegments:
    def test_closed_form_quintiles(self, spark):
        """10 customers with strictly increasing R, F and M (customer
        i has i+1 orders on day i, each 100*(i+1) total): every
        dimension's quintiles split 2/2/2/2/2 and customer i lands in
        quintile 1 + i//2 on ALL THREE axes — 5 diagonal segments of
        2 customers each, monetary exact."""
        import datetime as dt

        from soccerpredictor_spark.operators.mlprep import rfm_quintiles

        rows = []
        ok = 0
        for i in range(10):
            for _ in range(i + 1):
                rows.append(
                    (
                        ok,
                        i,
                        "F",
                        float(100 * (i + 1)),
                        dt.datetime(2024, 1, 1 + i),
                        "1-URGENT",
                    )
                )
                ok += 1
        orders = spark.createDataFrame(
            rows,
            [
                "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority",
            ],
        )
        got = {(r.r_q, r.f_q, r.m_q): r for r in rfm_quintiles(orders).collect()}
        assert set(got) == {(q, q, q) for q in range(1, 6)}
        assert all(r.n_customers == 2 for r in got.values())
        # segment (5,5,5) = customers 8 (9 orders x 900) and 9 (10 x 1000)
        assert got[(5, 5, 5)].monetary_cents == (9 * 900 + 10 * 1000) * 100


class TestBpeMergeCurve:
    def test_monotone_and_consistent_with_fertility(self, spark):
        """pieces_per_token is non-increasing in n_merges (every merge
        can only shorten segmentations), the 0-merge row is the exact
        character baseline (pieces = chars), and the final checkpoint
        must equal bpe_encode_fertility's totals — one loop, same
        state."""
        from soccerpredictor_spark.operators.textops import (
            bpe_encode_fertility,
            bpe_merge_curve,
        )

        docs = spark.createDataFrame(
            [(1, "aaab aaab xy"), (2, "aaab xy")], ["doc_id", "text"]
        )
        rows = {r.n_merges: r for r in bpe_merge_curve(docs).collect()}
        assert rows[0].total_pieces == 3 * 4 + 2 * 2  # chars exactly
        ppt = [rows[k].pieces_per_token for k in sorted(rows)]
        assert ppt == sorted(ppt, reverse=True)
        [f] = bpe_encode_fertility(docs, n_merges=10).collect()
        assert rows[10].total_pieces == f.total_pieces
        assert rows[10].pieces_per_token == f.pieces_per_token


class TestUnigramLmPieces:
    """Closed form: a corpus of one repeated word type 'abab' must
    collapse to the whole-word piece. Seed counts: a=16, b=16, ab=16,
    ba/aba/bab/abab=8 -> total 80, pen=7; Viterbi costs |abab|=3 vs
    |ab||ab|=4 vs chars=8, so round 1 segments every occurrence as
    one piece; the M-step then zeroes every other piece and round 2
    (pen=4, score(abab)=4, chars floor 1) re-confirms. Final table:
    (abab, 8) + retained chars at 0; fertility exactly 1.0."""

    def test_closed_form_single_type(self, spark):
        from soccerpredictor_spark.operators.textops import unigram_lm_pieces

        docs = spark.createDataFrame(
            [(i, "abab", "en", "s", 4) for i in range(8)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        got = {r.piece: r for r in unigram_lm_pieces(docs).collect()}
        assert set(got) == {"abab", "a", "b"}
        assert got["abab"].cnt == 8 and got["abab"].score == 4
        assert got["abab"].n_chars == 4
        assert got["a"].cnt == 0 and got["a"].score == 1
        assert all(abs(r.pieces_per_word - 1.0) < 1e-15 for r in got.values())

    def test_matches_sequential_reference(self, spark):
        """Full-output equality against a sequential Python hard-EM
        implementing the identical quantized objective (pen - bitlen
        costs, (cost, k, seg) tie order, char retention, cap prune) on
        a deterministic multi-word corpus."""
        import re
        from collections import Counter

        from soccerpredictor_spark.operators.textops import (
            UNI_MAX_PIECE,
            UNI_MAX_WORD,
            UNI_PIECE_CAP,
            UNI_ROUNDS,
            UNI_TOP_K,
            UNI_VOCAB,
            unigram_lm_pieces,
        )

        vocab_words = [
            "scan", "scanner", "rescan", "sort", "sorted", "resort",
            "ab", "abab", "ababab", "banana", "bandana", "cab",
        ]
        texts = []
        for i in range(40):
            # deterministic pseudo-corpus: doc i repeats words picked
            # by index arithmetic (no RNG, no hash dependence)
            ws = [vocab_words[(i * 7 + j * 3) % len(vocab_words)]
                  for j in range(1 + i % 5)]
            texts.append(" ".join(ws))

        def bl(c):
            return max(int(c).bit_length(), 1)

        wc = Counter(
            w
            for t in texts
            for w in re.findall("[a-z]+", t)
            if 2 <= len(w) <= UNI_MAX_WORD
        )
        types = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:UNI_VOCAB]
        seed = Counter()
        for w, c in types:
            for s in range(len(w)):
                for ln in range(1, min(UNI_MAX_PIECE, len(w) - s) + 1):
                    seed[w[s : s + ln]] += c
        chars = sorted(p for p in seed if len(p) == 1)
        pieces = {p: seed[p] for p in chars}
        pieces.update(
            dict(
                sorted(
                    ((p, c) for p, c in seed.items() if len(p) >= 2),
                    key=lambda kv: (-kv[1], kv[0]),
                )[:UNI_PIECE_CAP]
            )
        )
        segf = {}
        for _ in range(UNI_ROUNDS):
            total = sum(pieces.values())
            pen = total.bit_length() if total > 0 else 1
            sc = {p: bl(c) for p, c in pieces.items()}
            used = Counter()
            segf = {}
            for w, c in types:
                n = len(w)
                dp = [None] * (n + 1)
                dp[0] = (0, 0, "")
                for i in range(1, n + 1):
                    best = None
                    for ln in range(1, min(UNI_MAX_PIECE, i) + 1):
                        p = w[i - ln : i]
                        if p in sc and dp[i - ln] is not None:
                            pr = dp[i - ln]
                            cand = (
                                pr[0] + pen - sc[p],
                                pr[1] + 1,
                                pr[2] + "|" + p + "|",
                            )
                            if best is None or cand < best:
                                best = cand
                    dp[i] = best
                _, k, seg = dp[n]
                segf[w] = (c, k)
                for p in seg[1:-1].split("||"):
                    used[p] += c
            pieces = {p: used.get(p, 0) for p in chars}
            pieces.update(
                dict(
                    sorted(
                        ((p, c) for p, c in used.items() if len(p) >= 2),
                        key=lambda kv: (-kv[1], kv[0]),
                    )[:UNI_PIECE_CAP]
                )
            )
        fert = sum(c * k for c, k in segf.values()) / sum(
            c for c, _ in segf.values()
        )
        want = sorted(
            ((p, c) for p, c in pieces.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:UNI_TOP_K]

        docs = spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        got = unigram_lm_pieces(docs).collect()
        assert [(r.piece, r.cnt) for r in got] == [
            (p, c) for p, c in want
        ]
        assert all(abs(r.pieces_per_word - fert) < 1e-12 for r in got)
        assert all(r.score == bl(r.cnt) for r in got)


class TestIvfNprobeSweep:
    def test_recall_monotone_and_full_probe_exact(self, spark):
        """IVF probing monotonicity: recall@k is non-decreasing in
        nprobe, and on the fixtures the nprobe=4 row must equal
        ivf_recall_eval's registered operating point."""
        from soccerpredictor_spark.operators.similarity import (
            ivf_nprobe_sweep,
            ivf_recall_eval,
        )
        from soccerpredictor_spark.sources.catalog import read_table

        emb = read_table(spark, SF, "embeddings")
        rows = ivf_nprobe_sweep(emb).collect()
        assert [r.nprobe for r in rows] == [1, 2, 4]
        rec = [r.recall for r in rows]
        assert rec == sorted(rec)
        [fixed] = ivf_recall_eval(emb).collect()
        assert rows[-1].recall == fixed.recall


class TestEmbeddingThresholdSweep:
    def test_counts_non_increasing_and_closed_form(self, spark):
        """An identical triple (sim 1.0) and a pair at sim ~0.6: the
        0.25 row sees both groups, the 0.75 row only the triple —
        counts non-increasing in the threshold."""
        import math

        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.similarity import (
            embedding_threshold_sweep,
        )

        v = [1.0] * 64
        # w: cos(v, w) = 32/sqrt(64*32)... build w = half ones half zeros
        w = [1.0] * 32 + [0.0] * 32  # cos = 32/(8*sqrt(32)) ~ 0.707
        rows = [(1, v, 0), (2, v, 0), (3, v, 0), (10, w, 0), (11, w, 0)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        clear_caches()
        got = {r.threshold: r for r in embedding_threshold_sweep(emb).collect()}
        # identical triples pair at 1.0 everywhere; w-pair at ~0.707... wait
        # cos(w, w) = 1.0 too (identical w's) — both groups are exact dups;
        # cross pairs v-w at ~0.707 only if they share an LSH band.
        n = [got[t].n_pairs for t in sorted(got)]
        assert n == sorted(n, reverse=True)
        assert got[0.25].n_pairs >= 4  # 3 v-pairs + 1 w-pair at least
        assert got[0.75].n_pairs >= 4  # all those sims are 1.0
        assert math.isclose(sorted(got)[0], 0.25)


class TestTokenBalancedShards:
    def test_snake_placement_bounds_imbalance(self, spark):
        """16 docs of strongly skewed sizes across k=4 shards: the
        boustrophedon rank placement must bound the chars spread by
        the largest document, and every shard gets exactly 4 docs on
        an exact multiple of 2k."""
        from soccerpredictor_spark.operators.textops import token_balanced_shards

        sizes = [1000, 900, 800, 700, 60, 50, 40, 30, 9, 8, 7, 6, 4, 3, 2, 1]
        docs = spark.createDataFrame(
            [(i, "x", s) for i, s in enumerate(sizes)],
            ["doc_id", "text", "n_chars"],
        )
        rows = token_balanced_shards(docs, k=4).collect()
        assert [r.shard for r in rows] == [0, 1, 2, 3]
        assert all(r.n_docs == 4 for r in rows)
        # snake: rank0..3 -> shards 0..3, rank4..7 -> 3..0, ...
        # shard0 gets 1000+30+9+1? ranks 0,7,8,15 -> 1000,30,9,1 = 1040
        expect = {
            0: 1000 + 30 + 9 + 1,
            1: 900 + 40 + 8 + 2,
            2: 800 + 50 + 7 + 3,
            3: 700 + 60 + 6 + 4,
        }
        got = {r.shard: r.chars for r in rows}
        assert got == expect
        spread = max(got.values()) - min(got.values())
        assert spread <= max(sizes)
        assert abs(sum(r.chars_share for r in rows) - 1.0) < 1e-12

    def test_ties_break_by_doc_id(self, spark):
        """Equal sizes: rank order (and thus shard) is pinned by
        doc_id, independent of physical layout."""
        from soccerpredictor_spark.operators.textops import token_balanced_shards

        docs = spark.createDataFrame(
            [(i, "x", 100) for i in range(8)], ["doc_id", "text", "n_chars"]
        )
        a = {(r.shard, r.n_docs, r.chars) for r in
             token_balanced_shards(docs, k=4).collect()}
        b = {(r.shard, r.n_docs, r.chars) for r in
             token_balanced_shards(docs.repartition(5), k=4).collect()}
        assert a == b
        assert all(n == 2 and c == 200 for _, n, c in a)


class TestTemperatureSweep:
    def test_flattening_monotone_in_temperature(self, spark):
        """Counts 90/10: the small source's share must rise
        monotonically as T falls (10% -> ~16% -> 25% -> ~37%), the
        large source's fall, each row pair summing to 1; T=1 is the
        natural mix exactly and T=1/2 is exactly 1/4
        (sqrt(90) = 3 sqrt(10))."""
        from soccerpredictor_spark.operators.textops import temperature_sweep

        rows = [(i, "x", "big") for i in range(90)] + [
            (100 + i, "x", "small") for i in range(10)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = {r.source: r for r in temperature_sweep(docs).collect()}
        s = got["small"]
        assert abs(s.share_t100 - 0.10) < 1e-15
        assert s.share_t100 < s.share_t75 < s.share_t50 < s.share_t25 < 0.5
        for t in ("share_t100", "share_t75", "share_t50", "share_t25"):
            assert abs(getattr(s, t) + getattr(got["big"], t) - 1.0) < 1e-12
        # T=1/2 exactly: sqrt(10)/(sqrt(90)+sqrt(10)) = 1/4
        assert abs(s.share_t50 - 0.25) < 1e-12


class TestCorpusShuffle:
    def test_matches_hashlib_and_is_permutation(self, spark):
        """pos must equal the rank of md5('sp-shuffle-42' || doc_id)
        computed independently with hashlib, and cover 1..n."""
        import hashlib

        from soccerpredictor_spark.operators.textops import corpus_shuffle

        ids = [3, 17, 42, 99, 100, 8000]
        docs = spark.createDataFrame([(i, "x") for i in ids], ["doc_id", "text"])
        got = {r.doc_id: (r.shuffle_key, r.pos) for r in corpus_shuffle(docs).collect()}
        keys = {
            i: int(hashlib.md5(f"sp-shuffle-42{i}".encode()).hexdigest()[:12], 16)
            for i in ids
        }
        expect_order = sorted(ids, key=lambda i: (keys[i], i))
        for rank, i in enumerate(expect_order, start=1):
            assert got[i] == (keys[i], rank)
        assert sorted(p for _, p in got.values()) == list(range(1, len(ids) + 1))

    def test_stable_under_repartitioning(self, spark):
        """The order is a pure function of doc_id: any physical layout
        of the input yields the identical permutation (the property
        orderBy(rand()) lacks)."""
        from soccerpredictor_spark.operators.textops import corpus_shuffle

        docs = spark.createDataFrame(
            [(i, "x") for i in range(200)], ["doc_id", "text"]
        )
        a = {(r.doc_id, r.pos) for r in corpus_shuffle(docs).collect()}
        b = {(r.doc_id, r.pos) for r in corpus_shuffle(docs.repartition(7)).collect()}
        assert a == b


class TestKneserNeyBigram:
    def test_closed_form_probabilities(self, spark):
        """Corpus {'a b' x2, 'a c'}: c(a,b)=2, c(a,c)=1, c(a .)=3,
        N1+(a .)=2, N1+(. b)=N1+(. c)=1, N1+(. .)=2.
        P(b|a) = (2-.75)/3 + .75*(2/3)*(1/2) = 2/3
        P(c|a) = (1-.75)/3 + .75*(2/3)*(1/2) = 1/3  — and the seen
        mass sums to exactly 1 here (every continuation type seen)."""
        from soccerpredictor_spark.operators.textops import kneser_ney_bigram

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
        )
        rows = {(r.w1, r.w2): r for r in kneser_ney_bigram(docs).collect()}
        assert rows[("a", "b")].c12 == 2 and rows[("a", "c")].c12 == 1
        assert rows[("a", "b")].c1 == 3 and rows[("a", "b")].n1p_w1 == 2
        assert abs(rows[("a", "b")].p_kn - 2 / 3) < 1e-15
        assert abs(rows[("a", "c")].p_kn - 1 / 3) < 1e-15

    def test_continuation_count_beats_raw_frequency(self, spark):
        """The KN signature: 'francisco' is frequent but only ever
        follows 'san', so its continuation count (1) must drag its
        smoothed backoff weight below a rarer word seen in many
        contexts. Compare the backoff TERM via ncont directly."""
        from soccerpredictor_spark.operators.textops import kneser_ney_bigram

        docs = spark.createDataFrame(
            [
                (1, "san francisco san francisco san francisco"),
                (2, "the cat a cat one cat"),
            ],
            ["doc_id", "text"],
        )
        rows = {(r.w1, r.w2): r for r in kneser_ney_bigram(docs).collect()}
        # francisco: frequent (c12=3) but ncont=1; cat: ncont=3
        assert rows[("san", "francisco")].ncont_w2 == 1
        assert rows[("the", "cat")].ncont_w2 == 3


class TestCalibrationEce:
    def test_perfectly_calibrated_binary_scores(self, spark):
        """Scores exactly 0 or 600k (bins 0 and 9) with pos_rate
        equal to mean score in each bin -> ECE = MCE = 0; Brier
        equals the in-bin variance p(1-p) = 0 here (labels match
        scores exactly)."""
        from soccerpredictor_spark.operators.mlprep import calibration_ece

        rows = []
        for i in range(10):
            rows.append((i, 1, "5-LOW", 0.0))           # score 0, y=0
            rows.append((100 + i, 1, "1-URGENT", 600_000.0))  # ~1, y=1
        orders = spark.createDataFrame(
            rows,
            ["o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"],
        )
        [r] = calibration_ece(orders).collect()
        assert r.n == 20
        assert abs(r.ece) < 1e-12
        assert abs(r.mce) < 1e-12
        assert abs(r.brier) < 1e-12


class TestSourceOverlapMatrix:
    def test_counts_shared_spans(self, spark):
        """srcA and srcB share one verbatim 30-char doc (all its
        grams); srcC's doc is unique — one output row, full overlap
        coefficient for the smaller side."""
        from soccerpredictor_spark.operators.textops import (
            source_overlap_matrix,
        )

        copied = "x" * 30  # exactly one 30-gram
        uniq_a = "".join(chr(97 + (i * 13 + i * i) % 26) for i in range(60))
        docs = spark.createDataFrame(
            [
                (1, copied, "en", "srcA", 0),
                (2, uniq_a, "en", "srcA", 0),
                (3, copied, "en", "srcB", 0),
                (4, "unrelated words that never repeat..", "en", "srcC", 0),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = source_overlap_matrix(docs).collect()
        assert len(rows) == 1
        [r] = rows
        assert (r.src_a, r.src_b) == ("srcA", "srcB")
        assert r.n_shared == 1  # the single shared 30-gram
        assert r.n_b == 1
        assert r.overlap_coef == 1.0


def test_staged_join_size_audit_parity(spark):
    """join_size_audit takes TWO tables, so it gets its own parity
    gate outside the single-table parametrization."""
    import duckdb
    import pandas as pd

    from soccerpredictor_spark.operators.joins import (
        join_size_audit,
        join_size_audit_sql,
    )
    from soccerpredictor_spark.sources.catalog import read_table

    sdf = join_size_audit(
        read_table(spark, SF, "orders"), read_table(spark, SF, "lineitem")
    ).toPandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    odf = con.execute(join_size_audit_sql()).fetchdf()
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    assert sc == oc and len(sdf) == len(odf) == 1
    for c in sc:
        ka, kb = sdf[c].dtype.kind, odf[c].dtype.kind
        assert (ka in "iu") == (kb in "iu"), (c, sdf[c].dtype, odf[c].dtype)
        pd.testing.assert_series_equal(
            sdf[c], odf[c], check_dtype=False, check_names=False,
            check_exact=True,
        )


class TestJoinSizeAudit:
    def test_exact_prediction_is_exact(self, spark):
        """The per-key histogram prediction equals the measured join
        size identically; the independence baseline does not (skewed
        key multiplicities)."""
        from soccerpredictor_spark.operators.joins import join_size_audit

        orders = spark.createDataFrame(
            [(k, 1) for k in [1, 1, 2, 3]], ["o_orderkey", "x"]
        )
        lineitem = spark.createDataFrame(
            [(k, 1) for k in [1, 1, 1, 2]], ["l_orderkey", "y"]
        )
        [r] = join_size_audit(orders, lineitem).collect()
        # key 1: 2*3=6, key 2: 1*1=1 -> actual 7
        assert r.actual == 7
        assert r.pred_exact == 7.0 and r.err_exact == 0.0
        assert r.pred_indep != 7.0


class TestLshPairRecall:
    def test_recall_one_on_identical_docs(self, spark):
        """Two identical docs always share every band -> LSH finds
        the single true pair: recall = precision = 1."""
        from soccerpredictor_spark.operators.dedup import lsh_pair_recall_eval

        text = "alpha beta gamma delta epsilon zeta eta theta iota"
        docs = spark.createDataFrame(
            [(1, text, "s"), (2, text, "s"),
             (3, "completely different words here entirely", "s")],
            ["doc_id", "text", "source"],
        )
        [r] = lsh_pair_recall_eval(docs).collect()
        assert r.n_true == 1 and r.n_lsh == 1 and r.n_hit == 1
        assert r.recall == 1.0 and r.precision == 1.0


class TestEmbeddingDrift:
    def test_identical_halves_zero_z(self, spark):
        """A constant embedding column: means equal, variance 0 ->
        z NULL (guarded); distinct dims all reported."""
        from soccerpredictor_spark.operators.similarity import embedding_drift

        rows = [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(40)]
        emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
        got = {r.dim: r for r in embedding_drift(emb).collect()}
        assert set(got) == {0, 1, 2, 3}
        for d, r in got.items():
            assert r.mean_a == r.mean_b
            assert r.z is None


def test_staged_ops_survive_empty_tables(spark):
    """Registration-readiness: every staged operator must run on
    EMPTY inputs without crashing (mirrors the registered-entry
    test_empty_inputs gate, so registration day holds no surprises)."""
    import pyspark.sql.types as T

    from soccerpredictor_spark.operators import (
        dedup, graph, joins, mlprep, quality, similarity, sketch, skew,
        textops, timeseries, windows,
    )
    from soccerpredictor_spark.operators.scale import clear_caches

    def empty(schema):
        return spark.createDataFrame([], schema)

    orders = empty(
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double, o_orderdate date"
    )
    docs = empty(
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    events = empty("event_id long, ts timestamp, user_id long, event_type string")
    emb = empty(
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        )
    )
    lineitem = empty(
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_returnflag string, l_linestatus string, l_shipdate date"
    )
    builders = [
        lambda: mlprep.mann_whitney_u(orders),
        lambda: mlprep.rfm_quintiles(orders),
        lambda: textops.unigram_lm_pieces(docs),
        lambda: textops.bpe_learn_merges(docs),
        lambda: textops.bpe_encode_fertility(docs),
        lambda: textops.corpus_shuffle(docs),
        lambda: textops.curriculum_order(docs),
        lambda: textops.doc_token_budget(docs),
        lambda: similarity.embedding_split_leakage(emb),
        lambda: textops.token_balanced_shards(docs),
        lambda: textops.temperature_sweep(docs),
        lambda: similarity.ivf_nprobe_sweep(emb),
        lambda: similarity.embedding_threshold_sweep(emb),
        lambda: textops.bpe_merge_curve(docs),
        lambda: textops.kneser_ney_bigram(docs),
        lambda: textops.kneser_ney_trigram(docs),
        lambda: textops.stupid_backoff_lm(docs),
        lambda: timeseries.holt_winters(events),
        lambda: mlprep.group_holdout_split(orders),
        lambda: textops.ngram_decontaminate(docs),
        lambda: timeseries.mann_kendall(events),
        lambda: sketch.bottomk_sample_audit(events),
        lambda: similarity.knn_label_eval(emb),
        lambda: graph.clustering_coefficient(events),
        lambda: graph.graph_assortativity(events),
        lambda: graph.kcore_decomposition(events),
        lambda: mlprep.bradley_terry_strength(lineitem),
        lambda: mlprep.calibration_ece(orders),
        lambda: textops.source_overlap_matrix(docs),
        lambda: dedup.lsh_pair_recall_eval(docs),
        lambda: joins.join_size_audit(orders, lineitem),
        lambda: similarity.embedding_drift(emb),
        lambda: mlprep.stratified_kfold(orders),
        lambda: dedup.dedup_threshold_sweep(docs),
        lambda: timeseries.burst_episodes(events),
        lambda: textops.capped_mix_waterfill(docs),
        lambda: sketch.ams_f2_audit(events),
        lambda: quality.fd_audit(lineitem),
        lambda: mlprep.matthews_corr(orders),
        lambda: timeseries.overdispersion_audit(events),
        lambda: timeseries.record_highs(events),
        lambda: timeseries.topk_churn(events),
        lambda: quality.histogram_overlap_drift(docs),
        lambda: sketch.bloom_size_sweep(orders, empty(
            "c_custkey long, c_name string, c_nationkey long")),
        lambda: mlprep.weighted_median(lineitem),
        lambda: timeseries.interarrival_profile(events),
        lambda: dedup.dedup_shingle_sweep(docs),
        lambda: timeseries.hod_uniformity(events),
        lambda: quality.table_checksum(lineitem),
        lambda: timeseries.out_of_order_audit(events),
        lambda: dedup.dedup_cluster_sizes(docs),
        lambda: windows.attribution_compare(events),
        lambda: timeseries.freshness_audit(events),
        lambda: joins.ship_lag_profile(lineitem, orders),
        lambda: sketch.hll_intersection_est(events),
        lambda: skew.value_concentration(events),
        lambda: mlprep.temporal_leakage_audit(events),
        lambda: dedup.source_dup_rate(docs),
        lambda: timeseries.rank_stability_tau(events),
        lambda: timeseries.activity_streaks(events),
        lambda: skew.gini_activity(events),
        lambda: timeseries.session_gap_sweep(events),
        # round-13 staging
        lambda: dedup.suffix_dedup_spans(docs),
        lambda: textops.vocab_ladder_fertility(docs),
        lambda: dedup.lsh_band_sweep(docs),
        lambda: textops.dsir_importance_select(docs),
        lambda: textops.length_filter_sweep(docs),
        lambda: textops.template_dedup(docs),
        lambda: textops.tokens_per_byte(docs),
        lambda: textops.ccnet_buckets(docs),
        # round-19 registrations (kept: empty-input regression)
        lambda: textops.robots_rule_marginal_sweep(docs),
        lambda: similarity.ann_recall_k_sweep(emb),
        lambda: textops.curate_corpus(docs),
        lambda: textops.curate_corpus_write(docs),
        lambda: textops.curate_funnel_by_source(docs),
    ]
    for build in builders:
        clear_caches()
        build().count()  # must not raise
    clear_caches()


class TestStratifiedKfold:
    def test_exact_balance_per_label(self, spark):
        """23 'F' rows + 7 'O' rows over 5 folds: every (label, fold)
        cell is floor or floor+1 (over_floor in {0, 1}) and each
        label's cells sum back to its total — the guarantee the plain
        hash split cannot make."""
        from soccerpredictor_spark.operators.mlprep import (
            SKFOLD_K,
            stratified_kfold,
        )

        rows = [(k, 1, "F", 1.0) for k in range(23)] + [
            (100 + k, 1, "O", 1.0) for k in range(7)
        ]
        orders = spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
        )
        out = stratified_kfold(orders).collect()
        by_label: dict[str, list] = {}
        for r in out:
            assert r.over_floor in (0, 1)
            by_label.setdefault(r.label, []).append(r.n)
        assert sum(by_label["F"]) == 23
        assert sum(by_label["O"]) == 7
        assert max(by_label["F"]) - min(by_label["F"]) <= 1
        # 7 rows over 5 folds -> five cells of 1 or 2
        assert sorted(by_label["O"]) in ([1, 1, 1, 2, 2], [1, 1, 1, 1, 3])
        assert sorted(by_label["O"]) == [1, 1, 1, 2, 2]
        assert len(out) <= 2 * SKFOLD_K


class TestCappedMixWaterfill:
    def test_water_line_with_mixed_caps(self, spark):
        """Caps {a: 2, b: 10, c: 100} with budget 300 hard-coded?
        no — budget is the module constant 300, total 112 < 300: the
        degenerate all-capped case -> alloc == cap everywhere."""
        from soccerpredictor_spark.operators.textops import (
            capped_mix_waterfill,
        )

        rows = []
        did = 0
        for src, cap in [("a", 2), ("b", 10), ("c", 100)]:
            for _ in range(cap):
                rows.append((did, f"text {did}", "en", src, 0))
                did += 1
        docs = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        got = {r.source: r for r in capped_mix_waterfill(docs).collect()}
        assert {s: r.alloc for s, r in got.items()} == {
            "a": 2, "b": 10, "c": 100
        }
        assert all(r.at_cap == 1 for r in got.values())

    def test_line_levels_the_big_sources(self, spark):
        """Caps {a: 5, b: 200, c: 200} with budget 300: a keeps its
        5, the remaining 295 levels over b and c as 147/148 (the
        lexicographically first uncapped source takes the remainder)
        — and the allocations sum EXACTLY to the budget."""
        from soccerpredictor_spark.operators.textops import (
            WATERFILL_BUDGET,
            capped_mix_waterfill,
        )

        assert WATERFILL_BUDGET == 300
        rows = []
        did = 0
        for src, cap in [("a", 5), ("b", 200), ("c", 200)]:
            for _ in range(cap):
                rows.append((did, f"text {did}", "en", src, 0))
                did += 1
        docs = spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        )
        got = {r.source: r for r in capped_mix_waterfill(docs).collect()}
        assert got["a"].alloc == 5 and got["a"].at_cap == 1
        assert got["b"].alloc == 148  # 295 = 2*147 + 1 -> b gets the +1
        assert got["c"].alloc == 147
        assert sum(r.alloc for r in got.values()) == 300


class TestBurstEpisodes:
    def test_single_burst_run_merges(self, spark):
        """A flat series with one 3-hour spike: exactly one episode
        spanning those 3 hours with the right peak and volume."""
        from soccerpredictor_spark.operators.timeseries import burst_episodes

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in range(24):
            n = 50 if h in (10, 11, 12) else 2
            for _ in range(n):
                rows.append((eid, t0 + dt.timedelta(hours=h, minutes=3),
                             1, "click"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        eps = burst_episodes(ev).collect()
        assert len(eps) == 1
        [e] = eps
        assert e.n_hours == 3
        assert e.end_h - e.start_h == 2
        assert e.peak_cnt == 50 and e.total_cnt == 150


class TestDedupThresholdSweep:
    def test_monotone_and_exact_at_known_pair(self, spark):
        """Pair counts are non-increasing in the threshold, and two
        identical docs contribute a jaccard-1.0 pair visible at
        every threshold."""
        from soccerpredictor_spark.operators.dedup import (
            dedup_threshold_sweep,
        )

        text = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(1, text, "s"), (2, text, "s"),
             (3, "unrelated words entirely different again", "s")],
            ["doc_id", "text", "source"],
        )
        rows = sorted(
            dedup_threshold_sweep(docs).collect(), key=lambda r: r.threshold
        )
        assert len(rows) == 9
        counts = [r.n_pairs for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert rows[-1].threshold == 0.9 and rows[-1].n_pairs == 1
        assert rows[-1].n_docs == 2


class TestAmsF2Audit:
    def test_single_key_is_exact(self, spark):
        """One user with c events: every tug-of-war counter holds
        Z_i = +/-c, so every estimate is c^2 EXACTLY — mean, min,
        max, and the exact F2 all coincide and rel_error is 0.0."""
        import datetime as dt

        from soccerpredictor_spark.operators.sketch import ams_f2_audit

        t0 = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [(i, t0, 7, "click") for i in range(13)],
            ["event_id", "ts", "user_id", "event_type"],
        )
        [r] = ams_f2_audit(ev).collect()
        assert r.n_keys == 1
        assert r.exact_f2 == 169.0
        assert r.est_f2 == 169.0
        assert r.est_min == 169.0 and r.est_max == 169.0
        assert r.rel_error == 0.0

    def test_estimate_brackets_exact(self, spark):
        """Multi-key corpus: the exact F2 is the known sum of squared
        counts and the mean estimate sits inside [est_min, est_max]."""
        import datetime as dt

        from soccerpredictor_spark.operators.sketch import ams_f2_audit

        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for uid, cnt in [(1, 5), (2, 3), (3, 2), (4, 1), (5, 1)]:
            for _ in range(cnt):
                rows.append((eid, t0, uid, "view"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = ams_f2_audit(ev).collect()
        assert r.n_keys == 5
        assert r.exact_f2 == float(25 + 9 + 4 + 1 + 1)
        assert r.est_min <= r.est_f2 <= r.est_max


class TestFdAudit:
    def test_known_violations(self, spark):
        """Two orders: order 1 carries two line statuses (violates
        l_orderkey->l_linestatus with 2 variants across its 3 rows),
        order 2 one; the composite-PK candidate holds by
        construction."""
        from soccerpredictor_spark.operators.quality import fd_audit

        rows = [
            # (okey, pkey, skey, lineno, qty, status)
            (1, 10, 100, 1, 5.0, "O"),
            (1, 11, 100, 2, 6.0, "O"),
            (1, 12, 101, 3, 7.0, "F"),
            (2, 10, 100, 1, 8.0, "F"),
        ]
        li = spark.createDataFrame(
            rows,
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_linestatus"],
        )
        got = {r.fd: r for r in fd_audit(li).collect()}
        m = got["l_orderkey->l_linestatus"]
        assert (m.n_groups, m.n_violating_groups, m.n_violating_rows,
                m.max_rhs_variants, m.holds) == (2, 1, 3, 2, 0)
        pk = got["l_orderkey,l_linenumber->l_quantity"]
        assert pk.holds == 1 and pk.n_violating_groups == 0
        assert pk.n_groups == 4
        # part 10 is supplied only by supplier 100 here -> holds
        ps = got["l_partkey->l_suppkey"]
        assert ps.holds == 1


class TestMatthewsCorr:
    def test_perfect_rule_is_one(self, spark):
        """Labels engineered so the frozen threshold separates
        perfectly: MCC = 1.0 exactly, accuracy 1.0."""
        from soccerpredictor_spark.operators.mlprep import (
            MCC_SPLIT_CENTS,
            matthews_corr,
        )

        cheap = (MCC_SPLIT_CENTS - 100) / 100.0
        dear = (MCC_SPLIT_CENTS + 100) / 100.0
        rows = [(i, i, "1-URGENT", cheap) for i in range(6)] + [
            (i + 6, i, "3-MEDIUM", dear) for i in range(4)
        ]
        orders = spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderpriority",
                   "o_totalprice"]
        )
        [r] = matthews_corr(orders).collect()
        assert (r.tp, r.fp, r.fn, r.tn) == (6, 0, 0, 4)
        assert r.accuracy == 1.0 and r.mcc == 1.0

    def test_constant_prediction_is_null(self, spark):
        """Every price below the threshold -> the rule predicts all
        positive -> a zero marginal -> MCC undefined (NULL)."""
        from soccerpredictor_spark.operators.mlprep import matthews_corr

        rows = [(1, 1, "1-URGENT", 10.0), (2, 2, "3-MEDIUM", 20.0)]
        orders = spark.createDataFrame(
            rows, ["o_orderkey", "o_custkey", "o_orderpriority",
                   "o_totalprice"]
        )
        [r] = matthews_corr(orders).collect()
        assert r.mcc is None
        assert r.accuracy == 0.5


class TestOverdispersionAudit:
    def test_two_hour_closed_form(self, spark):
        """Counts (1, 3) over two hours: n=2, Sx=4, Sxx=10 ->
        VMR = (2*10 - 16) / (2*4) = 0.5, chi2 = 1.0, mean 2.0."""
        import datetime as dt

        from soccerpredictor_spark.operators.timeseries import (
            overdispersion_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [(0, t0, 1, "click")] + [
            (i + 1, t0 + dt.timedelta(hours=1), 1, "click") for i in range(3)
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = overdispersion_audit(ev).collect()
        assert (r.n_hours, r.n_events) == (2, 4)
        assert r.mean_cnt == 2.0
        assert r.vmr == 0.5
        assert r.chi2_stat == 1.0

    def test_constant_series_zero_vmr(self, spark):
        """A perfectly regular series (same count every hour) is
        maximally under-dispersed: VMR = 0.0 exactly."""
        import datetime as dt

        from soccerpredictor_spark.operators.timeseries import (
            overdispersion_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h in range(6):
            for _ in range(4):
                rows.append((eid, t0 + dt.timedelta(hours=h), 1, "view"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = overdispersion_audit(ev).collect()
        assert r.vmr == 0.0 and r.chi2_stat == 0.0


class TestRecordHighs:
    def test_monotone_series_all_records(self, spark):
        """Strictly increasing hourly counts: EVERY hour is a record;
        a strictly decreasing series records only its first hour."""
        from soccerpredictor_spark.operators.timeseries import record_highs

        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(4):  # up: 1,2,3,4
            for _ in range(h + 1):
                rows.append((eid, t0 + dt.timedelta(hours=h), 1, "up"))
                eid += 1
        for h in range(4):  # down: 4,3,2,1
            for _ in range(4 - h):
                rows.append((eid, t0 + dt.timedelta(hours=h), 1, "down"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.event_type: r for r in record_highs(ev).collect()}
        assert got["up"].n_records == 4
        assert got["up"].peak_cnt == 4
        assert got["down"].n_records == 1
        t_base = got["down"].last_record_hour
        assert got["up"].last_record_hour == t_base + 3

    def test_plateau_is_not_a_record(self, spark):
        """Equal-to-max hours do NOT count (strict record): series
        2,5,5 has exactly two records."""
        from soccerpredictor_spark.operators.timeseries import record_highs

        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for h, n in [(0, 2), (1, 5), (2, 5)]:
            for _ in range(n):
                rows.append((eid, t0 + dt.timedelta(hours=h), 1, "x"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = record_highs(ev).collect()
        assert r.n_records == 2


class TestTopkChurn:
    def test_disjoint_halves_full_churn(self, spark):
        """Early half dominated by users 1-3, late half by 11-13
        (disjoint): n_common = 0, jaccard = 0, shift NULL."""
        from soccerpredictor_spark.operators.timeseries import topk_churn

        t0 = dt.datetime(2024, 1, 1)
        t1 = dt.datetime(2024, 1, 10)
        rows, eid = [], 0
        for u in (1, 2, 3):
            for _ in range(3):
                rows.append((eid, t0, u, "click"))
                eid += 1
        for u in (11, 12, 13):
            for _ in range(3):
                rows.append((eid, t1, u, "click"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = topk_churn(ev).collect()
        assert (r.n_a, r.n_b) == (3, 3)
        assert r.n_common == 0 and r.n_churned == 6
        assert r.jaccard == 0.0
        assert r.mean_rank_shift is None

    def test_rank_swap_measured(self, spark):
        """Same two users both halves but activity order flips:
        jaccard 1.0, mean |rank shift| = 1.0."""
        from soccerpredictor_spark.operators.timeseries import topk_churn

        t0 = dt.datetime(2024, 1, 1)
        t1 = dt.datetime(2024, 1, 10)
        rows, eid = [], 0
        for u, n in [(1, 5), (2, 2)]:
            for _ in range(n):
                rows.append((eid, t0, u, "click"))
                eid += 1
        for u, n in [(1, 2), (2, 5)]:
            for _ in range(n):
                rows.append((eid, t1, u, "click"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = topk_churn(ev).collect()
        assert r.n_common == 2 and r.jaccard == 1.0
        assert r.mean_rank_shift == 1.0


class TestHistogramOverlapDrift:
    def test_identical_distributions_overlap_one(self, spark):
        """Both md5 halves drawn from the same two length values in
        the same proportions: overlap exactly 1.0, tv 0.0. Build
        per-half-balanced data by putting BOTH lengths on every doc
        pair so each bin's share is identical regardless of the md5
        split? No — instead use a single length for all docs: one
        bin, min(p,q) = 1 on both sides."""
        from soccerpredictor_spark.operators.quality import (
            histogram_overlap_drift,
        )

        docs = spark.createDataFrame(
            [(i, "t", "en", "s", 250) for i in range(40)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        [r] = histogram_overlap_drift(docs).collect()
        assert r.n_a + r.n_b == 40
        assert r.n_bins == 1
        assert r.overlap == 1.0
        assert r.tv_distance == 0.0

    def test_overlap_bounded(self, spark):
        """Mixed lengths: overlap stays in [0, 1] and tv = 1 -
        overlap exactly."""
        from soccerpredictor_spark.operators.quality import (
            histogram_overlap_drift,
        )

        docs = spark.createDataFrame(
            [(i, "t", "en", "s", 100 * (i % 7) + 3) for i in range(60)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        [r] = histogram_overlap_drift(docs).collect()
        assert 0.0 <= r.overlap <= 1.0
        assert r.tv_distance == 1.0 - r.overlap


def test_staged_bloom_size_sweep_parity(spark):
    """bloom_size_sweep takes TWO tables, so it gets its own parity
    gate outside the single-table parametrization (the
    join_size_audit convention)."""
    import duckdb
    import pandas as pd

    from soccerpredictor_spark.operators.sketch import (
        bloom_size_sweep,
        bloom_size_sweep_sql,
    )
    from soccerpredictor_spark.sources.catalog import read_table

    sdf = (
        bloom_size_sweep(
            read_table(spark, SF, "orders"), read_table(spark, SF, "customer")
        )
        .toPandas()
        .sort_values("m")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    odf = con.execute(bloom_size_sweep_sql()).fetchdf()
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    assert sc == oc and len(sdf) == len(odf) == 3
    for c in sc:
        ka, kb = sdf[c].dtype.kind, odf[c].dtype.kind
        if {ka, kb} <= {"i", "u", "f"}:
            assert (ka in "iu") == (kb in "iu"), (c, sdf[c].dtype, odf[c].dtype)
        pd.testing.assert_series_equal(
            sdf[c], odf[c], check_dtype=False, check_names=False,
            check_exact=True,
        )


class TestBloomSizeSweep:
    def test_fp_rate_monotone_in_size(self, spark):
        """More bits, (weakly) fewer false positives — and no false
        negatives at any size: every probed member passes."""
        from soccerpredictor_spark.operators.sketch import bloom_size_sweep
        from soccerpredictor_spark.sources.catalog import read_table

        rows = (
            bloom_size_sweep(
                read_table(spark, SF, "orders"),
                read_table(spark, SF, "customer"),
            )
            .orderBy("m")
            .collect()
        )
        assert [r.m for r in rows] == [1024, 4096, 16384]
        fps = [r.fp_rate for r in rows]
        assert fps == sorted(fps, reverse=True)
        for r in rows:
            assert 0.0 <= r.fill <= 1.0
            # no false negatives: passes >= members (fp only adds)
            assert r.n_pass >= r.n_pass - r.n_false_pos >= 0


class TestWeightedMedian:
    def test_weight_pulls_the_median(self, spark):
        """Prices 10, 20, 30 with weights 1, 1, 8: half the 10 units
        sit at price 30, so the weighted median is 30 while the
        unweighted row median is 20."""
        from soccerpredictor_spark.operators.mlprep import weighted_median

        li = spark.createDataFrame(
            [(1, 1, 1, 1, 1.0, 10.0, "A"),
             (2, 2, 2, 1, 1.0, 20.0, "A"),
             (3, 3, 3, 1, 8.0, 30.0, "A")],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_returnflag"],
        )
        [r] = weighted_median(li).collect()
        assert r.total_weight == 10
        assert r.median_cents == 3000
        assert r.median_price == 30.0

    def test_even_split_takes_lower(self, spark):
        """Weights 5 and 5 across prices 10 and 20: 2*cw >= tw is
        first satisfied at the LOWER price (lower weighted median)."""
        from soccerpredictor_spark.operators.mlprep import weighted_median

        li = spark.createDataFrame(
            [(1, 1, 1, 1, 5.0, 10.0, "R"),
             (2, 2, 2, 1, 5.0, 20.0, "R")],
            ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
             "l_quantity", "l_extendedprice", "l_returnflag"],
        )
        [r] = weighted_median(li).collect()
        assert r.median_cents == 1000


class TestInterarrivalProfile:
    def test_known_gaps(self, spark):
        """One user, gaps of exactly 10, 20, 30, 40 seconds: discrete
        p50 = ceil(0.5*4)=2nd smallest = 20, p90 = ceil(3.6)=4th =
        40, p99 = 4th = 40."""
        from soccerpredictor_spark.operators.timeseries import (
            interarrival_profile,
        )

        t0 = dt.datetime(2024, 1, 1)
        offs = [0, 10, 30, 60, 100]
        rows = [
            (i, t0 + dt.timedelta(seconds=s), 1, "click")
            for i, s in enumerate(offs)
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.quantile: r for r in interarrival_profile(ev).collect()}
        assert got["p50"].n_gaps == 4
        assert got["p50"].gap_s == 20
        assert got["p90"].gap_s == 40
        assert got["p99"].gap_s == 40

    def test_gaps_are_per_user(self, spark):
        """Two users interleaved in time: gaps never cross users —
        each user's own spacing (100 s) is the profile, not the
        50 s interleave."""
        from soccerpredictor_spark.operators.timeseries import (
            interarrival_profile,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u, off in [(1, 0), (2, 50)]:
            for j in range(3):
                rows.append(
                    (eid, t0 + dt.timedelta(seconds=off + 100 * j), u,
                     "view")
                )
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.quantile: r for r in interarrival_profile(ev).collect()}
        assert got["p50"].n_gaps == 4
        assert got["p50"].gap_s == 100
        assert got["p99"].gap_s == 100


def test_staged_value_histogram_stream_parity(spark):
    """The staged streaming histogram runs a REAL incremental
    execution (availableNow into a memory sink) and must equal the
    DuckDB batch oracle exactly — the streaming_hourly
    one-file-one-microbatch equivalence applied to the new entry."""
    import duckdb
    import pandas as pd

    from soccerpredictor_spark.streaming.events import (
        value_histogram_available_now,
        value_histogram_sql,
    )

    sdf = value_histogram_available_now(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    odf = con.execute(value_histogram_sql()).fetchdf()
    assert len(sdf) == len(odf) and len(sdf) > 0
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    assert sc == oc
    a = sdf[sc].sort_values(sc).reset_index(drop=True)
    b = odf[oc].sort_values(oc).reset_index(drop=True)
    for c in sc:
        pd.testing.assert_series_equal(
            a[c], b[c], check_dtype=False, check_names=False,
            check_exact=True,
        )


class TestValueHistogram:
    def test_batch_twin_buckets_known_values(self, spark):
        """Values 5, 15, 15, 25 in one hour: buckets 0, 1, 1, 2."""
        from soccerpredictor_spark.streaming.events import value_histogram

        t0 = dt.datetime(2024, 1, 1, 10, 30)
        rows = [
            (0, t0, 1, "click", 5.0, "{}"),
            (1, t0, 1, "click", 15.0, "{}"),
            (2, t0, 2, "click", 15.0, "{}"),
            (3, t0, 2, "click", 25.0, "{}"),
        ]
        ev = spark.createDataFrame(
            rows,
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        got = {r.bucket: r.n_events for r in value_histogram(ev).collect()}
        assert got == {0: 1, 1: 2, 2: 1}


class TestDedupShingleSweep:
    def test_smaller_n_flags_more(self, spark):
        """Docs sharing every bigram but no 5-gram: n=2 flags the
        pair, n=5 does not — the sweep shows the monotone n curve."""
        from soccerpredictor_spark.operators.dedup import dedup_shingle_sweep

        a = "one two three four five six seven"
        b = "one two three FOUR five six seven"  # one mid edit
        docs = spark.createDataFrame(
            [(1, a, "s"), (2, b, "s"),
             (3, "completely different words here today friends", "s")],
            ["doc_id", "text", "source"],
        )
        got = {r.ngram: r for r in dedup_shingle_sweep(docs).collect()}
        assert set(got) == {2, 3, 5}
        # bigrams: 4 shared of 8 union -> jaccard 0.5, flagged
        assert got[2].n_pairs == 1 and got[2].n_docs == 2
        # trigrams: 2 of 8 -> 0.25, below threshold
        assert got[3].n_pairs == 0
        # every 5-gram spans the edit -> nothing shared
        assert got[5].n_pairs == 0 and got[5].n_docs == 0


class TestHodUniformity:
    def test_uniform_series_zero_chi2(self, spark):
        """Exactly c events in every of the 24 hod cells: chi2 = 0,
        peak share = 1/24."""
        from soccerpredictor_spark.operators.timeseries import hod_uniformity

        t0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        for h in range(24):
            for _ in range(3):
                rows.append((eid, t0 + dt.timedelta(hours=h), 1, "flat"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = hod_uniformity(ev).collect()
        assert r.n_events == 72 and r.n_hods == 24
        assert r.chi2_uniform == 0.0
        assert r.peak_hod == 0  # tie -> earliest hour
        assert r.peak_share == 3.0 / 72.0

    def test_single_cell_spike_closed_form(self, spark):
        """All S events in one hod cell: chi2 = 24*S - S = 23*S."""
        from soccerpredictor_spark.operators.timeseries import hod_uniformity

        t0 = dt.datetime(2024, 1, 1, 13)
        rows = [(i, t0, 1, "spike") for i in range(10)]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = hod_uniformity(ev).collect()
        assert r.peak_hod == 13
        assert r.peak_share == 1.0
        assert r.chi2_uniform == 23.0 * 10


class TestTableChecksum:
    def test_order_and_partition_invariant(self, spark):
        """The digest must not move under row reordering or
        repartitioning — the property that makes it a cross-copy
        acceptance check."""
        from soccerpredictor_spark.operators.quality import table_checksum

        rows = [
            (1, 10, 100, 1, 5.0, 1000.50, "A"),
            (2, 11, 101, 2, 7.0, 2000.25, "R"),
            (3, 12, 102, 1, 2.0, 300.10, "N"),
        ]
        cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_returnflag"]
        a = spark.createDataFrame(rows, cols)
        b = spark.createDataFrame(list(reversed(rows)), cols).repartition(7)
        ra = table_checksum(a).collect()[0]
        rb = table_checksum(b).collect()[0]
        assert ra.n_rows == rb.n_rows == 3
        assert ra.xor_checksum == rb.xor_checksum
        assert ra.sum_checksum == rb.sum_checksum

    def test_duplicate_row_moves_sum_not_always_xor(self, spark):
        """Adding the same row TWICE leaves XOR unchanged (x^x = 0)
        but moves the sum — the reason the digest carries both."""
        from soccerpredictor_spark.operators.quality import table_checksum

        cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_returnflag"]
        base = [(1, 10, 100, 1, 5.0, 1000.50, "A")]
        dup = base + [(2, 11, 101, 2, 7.0, 2000.25, "R")] * 2
        ra = table_checksum(spark.createDataFrame(base, cols)).collect()[0]
        rb = table_checksum(spark.createDataFrame(dup, cols)).collect()[0]
        assert rb.n_rows == 3
        assert rb.xor_checksum == ra.xor_checksum  # pair cancels
        assert rb.sum_checksum != ra.sum_checksum  # sum catches it


class TestOutOfOrderAudit:
    def test_known_inversions(self, spark):
        """Arrival order 0,1,2,3 with times 10, 30, 20, 40 s: exactly
        one late event (id 2, 10 s late)."""
        from soccerpredictor_spark.operators.timeseries import (
            out_of_order_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        secs = [10, 30, 20, 40]
        rows = [
            (i, t0 + dt.timedelta(seconds=s), 1, "click")
            for i, s in enumerate(secs)
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = out_of_order_audit(ev).collect()
        assert r.n_events == 4
        assert r.n_out_of_order == 1
        assert r.max_lateness_s == 10
        assert r.frac_late == 0.25

    def test_lateness_crosses_buckets(self, spark):
        """The late event's predecessor max sits in an EARLIER
        bucket (ids OOO_BUCKET apart): the two-level prefix max must
        still see it."""
        from soccerpredictor_spark.operators.timeseries import (
            OOO_BUCKET,
            out_of_order_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0 + dt.timedelta(seconds=100), 1, "click"),
            (OOO_BUCKET + 5, t0 + dt.timedelta(seconds=40), 1, "click"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = out_of_order_audit(ev).collect()
        assert r.n_out_of_order == 1
        assert r.max_lateness_s == 60

    def test_sorted_stream_clean(self, spark):
        """A perfectly ordered stream: zero late events."""
        from soccerpredictor_spark.operators.timeseries import (
            out_of_order_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i, t0 + dt.timedelta(seconds=10 * i), 1, "click")
            for i in range(6)
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = out_of_order_audit(ev).collect()
        assert r.n_out_of_order == 0 and r.max_lateness_s == 0
        assert r.frac_late == 0.0


class TestDedupClusterSizes:
    def test_docs_identity_holds(self, spark):
        """On the fixture corpus: n_docs == cluster_size * n_clusters
        on every row, and total clustered docs equals the label-table
        row count."""
        from soccerpredictor_spark.operators.dedup import (
            dedup_cluster_sizes,
            near_dup_clusters,
        )
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.sources.catalog import read_table

        clear_caches()
        docs = read_table(spark, SF, "documents")
        rows = dedup_cluster_sizes(docs).collect()
        assert all(r.n_docs == r.cluster_size * r.n_clusters for r in rows)
        total = sum(r.n_docs for r in rows)
        assert total == near_dup_clusters(docs).count()


class TestAttributionCompare:
    def test_first_vs_last_disagree(self, spark):
        """view -> click -> purchase: first-touch credits view,
        last-touch credits click; counts disagree per channel but
        total purchases agree."""
        from soccerpredictor_spark.operators.windows import (
            attribution_compare,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0, 1, "view"),
            (1, t0 + dt.timedelta(hours=1), 1, "click"),
            (2, t0 + dt.timedelta(hours=2), 1, "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.source: r for r in attribution_compare(ev).collect()}
        assert got["view"].n_first_touch == 1
        assert got["view"].n_last_touch == 0
        assert got["click"].n_last_touch == 1
        assert got["click"].n_first_touch == 0
        assert got["view"].first_minus_last == 1
        assert got["click"].first_minus_last == -1

    def test_lookback_bounds_the_frame(self, spark):
        """A source 8 days before the purchase is OUTSIDE the 7-day
        range frame: both models credit 'none'."""
        from soccerpredictor_spark.operators.windows import (
            attribution_compare,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0, 1, "click"),
            (1, t0 + dt.timedelta(days=8), 1, "purchase"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.source: r for r in attribution_compare(ev).collect()}
        assert set(got) == {"none"}
        assert got["none"].n_first_touch == 1
        assert got["none"].n_last_touch == 1


class TestFreshnessAudit:
    def test_staleness_vs_head(self, spark):
        """Type B stops 2 hours before type A (the head): B's
        staleness is 7200 s, A's is 0; the 24 h window counts only
        in-horizon events."""
        from soccerpredictor_spark.operators.timeseries import (
            freshness_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0 - dt.timedelta(days=3), 1, "B"),  # outside 24h
            (1, t0 - dt.timedelta(hours=2), 1, "B"),
            (2, t0 - dt.timedelta(hours=1), 1, "A"),
            (3, t0, 1, "A"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.event_type: r for r in freshness_audit(ev).collect()}
        assert got["A"].staleness_s == 0
        assert got["B"].staleness_s == 7200
        assert got["A"].n_last_24h == 2
        assert got["B"].n_last_24h == 1  # the 3-day-old event is out
        assert got["B"].n_events == 2


def test_staged_ship_lag_profile_parity(spark):
    """ship_lag_profile takes TWO tables, so it gets its own parity
    gate outside the single-table parametrization (the
    join_size_audit convention)."""
    import duckdb
    import pandas as pd

    from soccerpredictor_spark.operators.joins import (
        ship_lag_profile,
        ship_lag_profile_sql,
    )
    from soccerpredictor_spark.sources.catalog import read_table

    sdf = ship_lag_profile(
        read_table(spark, SF, "lineitem"), read_table(spark, SF, "orders")
    ).toPandas()
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    odf = con.execute(ship_lag_profile_sql()).fetchdf()
    sc, oc = sorted(sdf.columns), sorted(odf.columns)
    assert sc == oc and len(sdf) == len(odf) == 1
    for c in sc:
        ka, kb = sdf[c].dtype.kind, odf[c].dtype.kind
        if {ka, kb} <= {"i", "u", "f"}:
            assert (ka in "iu") == (kb in "iu"), (c, sdf[c].dtype, odf[c].dtype)
        pd.testing.assert_series_equal(
            sdf[c], odf[c], check_dtype=False, check_names=False,
            check_exact=True,
        )


class TestShipLagProfile:
    def test_known_lags_with_violation(self, spark):
        """Lags -2, 1, 3, 5 days (one impossible negative):
        n_negative = 1, discrete p50 = 2nd smallest = 1, p99 = 5."""
        from soccerpredictor_spark.operators.joins import ship_lag_profile

        d0 = dt.date(2024, 1, 10)
        orders = spark.createDataFrame(
            [(i, d0) for i in range(1, 5)], ["o_orderkey", "o_orderdate"]
        )
        li = spark.createDataFrame(
            [
                (1, d0 + dt.timedelta(days=-2)),
                (2, d0 + dt.timedelta(days=1)),
                (3, d0 + dt.timedelta(days=3)),
                (4, d0 + dt.timedelta(days=5)),
            ],
            ["l_orderkey", "l_shipdate"],
        )
        [r] = ship_lag_profile(li, orders).collect()
        assert r.n_items == 4
        assert r.n_ship_before_order == 1
        assert r.p50_days == 1
        assert r.p90_days == 5 and r.p99_days == 5


class TestHllIntersectionEst:
    def test_identical_cohorts_estimate_collapses(self, spark):
        """Every user does BOTH actions: the three register banks are
        identical, so est_a == est_b == est_union and inclusion-
        exclusion returns exactly est_a; the exact overlap is every
        user."""
        from soccerpredictor_spark.operators.sketch import (
            hll_intersection_est,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u in range(40):
            for et in ("click", "purchase"):
                rows.append((eid, t0, u, et))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = hll_intersection_est(ev).collect()
        assert r.exact_intersection == 40
        assert r.est_a == r.est_b == r.est_union
        assert r.est_intersection == r.est_a

    def test_disjoint_cohorts(self, spark):
        """Clickers and purchasers are disjoint: exact overlap 0 and
        rel_error NULL (zero-denominator guard); the union bank sees
        every member."""
        from soccerpredictor_spark.operators.sketch import (
            hll_intersection_est,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u in range(20):
            rows.append((eid, t0, u, "click"))
            eid += 1
        for u in range(100, 120):
            rows.append((eid, t0, u, "purchase"))
            eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = hll_intersection_est(ev).collect()
        assert r.exact_intersection == 0
        assert r.rel_error is None
        assert r.est_union >= max(r.est_a, r.est_b)


def test_staged_bucketed_rank_ops_shuffle_on_buckets(spark):
    """The scale property of the staged two-level-rank operators,
    asserted on the PHYSICAL plan: the row-scale window passes
    hash-partition on their (group, bucket) keys — never a
    SinglePartition sort of row-scale data. (SinglePartition windows
    legitimately remain above the TINY bucket tables.)"""
    from soccerpredictor_spark.operators.joins import ship_lag_profile
    from soccerpredictor_spark.operators.mlprep import weighted_median
    from soccerpredictor_spark.operators.timeseries import (
        interarrival_profile,
        out_of_order_audit,
    )
    from soccerpredictor_spark.sources.catalog import read_table

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    li = read_table(spark, SF, "lineitem")
    ev = read_table(spark, SF, "events")
    orders = read_table(spark, SF, "orders")

    p = plan(weighted_median(li))
    assert "hashpartitioning(flag" in p  # within-bucket cumsum keyed
    p = plan(interarrival_profile(ev))
    # the per-user lag pass runs INSIDE the by_gap checkpoint (already
    # executed), so the visible plan starts at the bucketed quantile
    assert "hashpartitioning(event_type" in p
    p = plan(out_of_order_audit(ev))
    assert "hashpartitioning(bucket" in p  # prefix-max bucket pass
    p = plan(ship_lag_profile(li, orders))
    assert "hashpartitioning(bucket" in p


class TestValueConcentration:
    def test_tie_exact_partial_group(self, spark):
        """10 users all with the same count: top-1% -> k=1 user ->
        exactly 1/10 of events (the partial-tie-group arithmetic);
        top-50% -> exactly half."""
        from soccerpredictor_spark.operators.skew import value_concentration

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u in range(10):
            for _ in range(4):
                rows.append((eid, t0, u, "click"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.pct: r for r in value_concentration(ev).collect()}
        assert got[1].k_users == 1 and got[1].share == 0.1
        assert got[50].k_users == 5 and got[50].share == 0.5

    def test_heavy_head_dominates(self, spark):
        """One user with 90 events + 9 with 1 each (99 users? no —
        10 users, 99 events): top-10% = 1 user = 90/99 share."""
        from soccerpredictor_spark.operators.skew import value_concentration

        t0 = dt.datetime(2024, 1, 1)
        rows = [(i, t0, 0, "click") for i in range(90)]
        eid = 90
        for u in range(1, 10):
            rows.append((eid, t0, u, "click"))
            eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.pct: r for r in value_concentration(ev).collect()}
        assert got[10].k_users == 1
        assert got[10].top_events == 90.0
        assert got[10].share == 90.0 / 99.0


class TestTemporalLeakageAudit:
    def test_known_overlap(self, spark):
        """Users {1,2} early only, {2,3} late (2 spans both): test
        users = 2, leaked = 1, rate 0.5."""
        from soccerpredictor_spark.operators.mlprep import (
            temporal_leakage_audit,
        )

        t0 = dt.datetime(2024, 1, 1)
        t1 = dt.datetime(2024, 1, 31)
        rows = [
            (0, t0, 1, "click"),
            (1, t0, 2, "click"),
            (2, t1, 2, "click"),
            (3, t1, 3, "click"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = temporal_leakage_audit(ev).collect()
        assert (r.n_users, r.n_train_users, r.n_test_users) == (3, 2, 2)
        assert r.n_leaked == 1
        assert r.leak_rate == 0.5


class TestSourceDupRate:
    def test_rates_consistent_with_labels(self, spark):
        """Per-source flagged counts must sum to the label-table row
        count, and every rate stays in [0, 1] with the exact n_dup /
        n_docs ratio."""
        from soccerpredictor_spark.operators.dedup import (
            near_dup_clusters,
            source_dup_rate,
        )
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.sources.catalog import read_table

        clear_caches()
        docs = read_table(spark, SF, "documents")
        rows = source_dup_rate(docs).collect()
        assert sum(r.n_dup for r in rows) == near_dup_clusters(docs).count()
        assert sum(r.n_docs for r in rows) == docs.count()
        for r in rows:
            assert 0 <= r.n_dup <= r.n_docs
            assert r.dup_rate == r.n_dup / r.n_docs


class TestRankStabilityTau:
    def test_preserved_order_is_one(self, spark):
        """Same three users, same activity ORDER both halves:
        tau = 1.0 over 3 pairs."""
        from soccerpredictor_spark.operators.timeseries import (
            rank_stability_tau,
        )

        t0 = dt.datetime(2024, 1, 1)
        t1 = dt.datetime(2024, 1, 20)
        rows, eid = [], 0
        for t in (t0, t1):
            for u, n in [(1, 5), (2, 3), (3, 1)]:
                for _ in range(n):
                    rows.append((eid, t, u, "click"))
                    eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = rank_stability_tau(ev).collect()
        assert r.n_common == 3 and r.n_pairs == 3
        assert r.n_concordant == 3
        assert r.tau == 1.0

    def test_inverted_order_is_minus_one(self, spark):
        """Activity order flips between halves: tau = -1.0."""
        from soccerpredictor_spark.operators.timeseries import (
            rank_stability_tau,
        )

        t0 = dt.datetime(2024, 1, 1)
        t1 = dt.datetime(2024, 1, 20)
        rows, eid = [], 0
        for u, n in [(1, 5), (2, 3), (3, 1)]:
            for _ in range(n):
                rows.append((eid, t0, u, "click"))
                eid += 1
        for u, n in [(1, 1), (2, 3), (3, 5)]:
            for _ in range(n):
                rows.append((eid, t1, u, "click"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = rank_stability_tau(ev).collect()
        assert r.n_concordant == 0
        assert r.tau == -1.0


class TestActivityStreaks:
    def test_streak_histogram(self, spark):
        """User 1 active days {1,2,3, 10}: best streak 3; user 2 one
        day: streak 1 -> histogram {1: 1, 3: 1}."""
        from soccerpredictor_spark.operators.timeseries import (
            activity_streaks,
        )

        d = lambda day: dt.datetime(2024, 1, day, 12)
        rows = [
            (0, d(1), 1, "x"), (1, d(2), 1, "x"), (2, d(3), 1, "x"),
            (3, d(10), 1, "x"), (4, d(3), 1, "x"),  # same-day dup
            (5, d(5), 2, "x"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.streak_len: r.n_users for r in activity_streaks(ev).collect()}
        assert got == {1: 1, 3: 1}


class TestGiniActivity:
    def test_equal_activity_zero(self, spark):
        """Everyone equally active: gini = 0.0 exactly."""
        from soccerpredictor_spark.operators.skew import gini_activity

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for u in range(8):
            for _ in range(3):
                rows.append((eid, t0, u, "x"))
                eid += 1
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = gini_activity(ev).collect()
        assert r.n_users == 8 and r.gini == 0.0

    def test_two_user_closed_form(self, spark):
        """Counts {1, 3}: G = (2*(1*1 + 2*3) - 3*4) / (2*4) = 0.25."""
        from soccerpredictor_spark.operators.skew import gini_activity

        t0 = dt.datetime(2024, 1, 1)
        rows = [(0, t0, 1, "x")] + [(i + 1, t0, 2, "x") for i in range(3)]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        [r] = gini_activity(ev).collect()
        assert r.gini == 0.25


class TestSessionGapSweep:
    def test_known_gaps_per_threshold(self, spark):
        """One user, events at 0 s / 10 s / 2000 s (gaps 10 and
        1990): 15 min gap -> 2 sessions, 30 min -> 2, 60 min -> 1;
        mean events/session follows exactly."""
        from soccerpredictor_spark.operators.timeseries import (
            session_gap_sweep,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0, 1, "x"),
            (1, t0 + dt.timedelta(seconds=10), 1, "x"),
            (2, t0 + dt.timedelta(seconds=2000), 1, "x"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.gap_s: r for r in session_gap_sweep(ev).collect()}
        assert got[900].n_sessions == 2
        assert got[1800].n_sessions == 2
        assert got[3600].n_sessions == 1
        assert got[900].mean_events_per_session == 1.5
        assert got[3600].mean_events_per_session == 3.0

    def test_exact_gap_starts_new_session(self, spark):
        """A gap of EXACTLY the threshold starts a new session
        (session_window's half-open [start, last+gap) semantics)."""
        from soccerpredictor_spark.operators.timeseries import (
            session_gap_sweep,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (0, t0, 1, "x"),
            (1, t0 + dt.timedelta(seconds=900), 1, "x"),
        ]
        ev = spark.createDataFrame(
            rows, ["event_id", "ts", "user_id", "event_type"]
        )
        got = {r.gap_s: r for r in session_gap_sweep(ev).collect()}
        assert got[900].n_sessions == 2
        assert got[1800].n_sessions == 1
