"""Closed-form semantic tests for the round-18 staged batch (staged
during round 17; parity + plan-purity + empty-input gates run through
the shared harness in test_staged_round11.py):

- span_cut_apply_stats: post-rewrite per-source corpus accounting
- url_path_filter: robots-style first-match path deny census
- lang_conditional_mix: two-level (lang budget, within-lang T=1/2) mix
- mixture_repetition_audit: policy-implied epochs vs the 4-epoch wall
- l_diversity_audit: distinct-l privacy profile (k-anonymity sibling)
- packing_fragmentation_sweep: chunk-boundary doc splits across ctx
- shuffle_run_audit: source-run islands of the corpus_shuffle order
- dedup_cluster_density: clique density per cluster size (chain alarm)
"""

from __future__ import annotations

import math


class TestSpanCutApplyStats:
    def test_action_arithmetic(self, spark):
        """The span_cut_plan synthesis (a src0 benchmark doc seeding a
        13-gram) aggregated per source: the bench doc is intact; the
        cut doc keeps exactly its 10-token residual; the short doc is
        dropped whole (its residual 2 would miss GOPHER_MIN_WORDS)."""
        from soccerpredictor_spark.operators.textops import (
            span_cut_apply_stats,
        )

        common = " ".join(f"w{i}" for i in range(13))
        docs = spark.createDataFrame(
            [
                (1, common, "src0"),
                (2, common + " " + " ".join(f"e{i}" for i in range(10)), "a"),
                (3, common + " x y", "a"),
                (4, "u0 u1 u2", "b"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in span_cut_apply_stats(docs).collect()}
        assert set(rows) == {"src0", "a", "b"}
        bench, a, b = rows["src0"], rows["a"], rows["b"]
        assert (bench.docs_intact, bench.token_retention) == (1, 1.0)
        assert (a.docs_total, a.docs_intact, a.docs_cut, a.docs_dropped) == (
            2, 0, 1, 1,
        )
        # doc 2 keeps its 10-token residual; doc 3 (dropped) keeps 0
        assert (a.tokens_before, a.tokens_after) == (23 + 15, 10)
        assert math.isclose(a.token_retention, 10.0 / 38.0)
        assert (b.docs_intact, b.tokens_after, b.token_retention) == (
            1, 3, 1.0,
        )

    def test_all_clean_is_identity(self, spark):
        from soccerpredictor_spark.operators.textops import (
            span_cut_apply_stats,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma", "s"), (2, "delta eps", "s")],
            "doc_id long, text string, source string",
        )
        (r,) = span_cut_apply_stats(docs).collect()
        assert (r.docs_intact, r.docs_cut, r.docs_dropped) == (2, 0, 0)
        assert r.tokens_before == r.tokens_after == 5
        assert r.token_retention == 1.0


class TestUrlPathFilter:
    def test_first_match_census_and_spine(self, spark):
        """doc_id % 8 walks ROBOTS_SECTIONS: ids 1/2/4/5 land on
        admin/login/search/tag, ids 0/3/6/7 stay allowed. The spine
        always shows all four rules plus 'allowed', zero-filled."""
        from soccerpredictor_spark.operators.textops import (
            ROBOTS_DENY_RULES,
            url_path_filter,
        )

        docs = spark.createDataFrame(
            [(i, "a b c", "src") for i in range(8)],
            "doc_id long, text string, source string",
        )
        rows = url_path_filter(docs).collect()
        assert [r.rule for r in rows] == list(ROBOTS_DENY_RULES) + ["allowed"]
        assert [r.rule_idx for r in rows] == [1, 2, 3, 4, 5]
        by = {r.rule: r for r in rows}
        for rule in ROBOTS_DENY_RULES:
            assert by[rule].n_docs == 1 and by[rule].n_tokens == 3
        assert by["allowed"].n_docs == 4 and by["allowed"].n_tokens == 12
        assert math.isclose(by["allowed"].doc_share, 0.5)
        assert math.isclose(sum(r.doc_share for r in rows), 1.0)

    def test_zero_filled_rules_on_clean_corpus(self, spark):
        """Only %8==0 docs -> every deny rule present with zero mass."""
        from soccerpredictor_spark.operators.textops import url_path_filter

        docs = spark.createDataFrame(
            [(0, "x y", "s"), (8, "z", "s")],
            "doc_id long, text string, source string",
        )
        rows = {r.rule: r for r in url_path_filter(docs).collect()}
        assert rows["/admin"].n_docs == 0 and rows["/admin"].doc_share == 0.0
        assert rows["allowed"].n_docs == 2 and rows["allowed"].n_tokens == 3

    def test_path_synthesis_shape(self, spark):
        from pyspark.sql import functions as F

        from soccerpredictor_spark.operators.textops import _synth_path

        docs = spark.createDataFrame(
            [(1, "t", "srcX"), (41, "t", "srcY")],
            "doc_id long, text string, source string",
        )
        paths = [
            r.p for r in docs.select(_synth_path().alias("p")).collect()
        ]
        assert paths == ["/admin/srcX/page-1", "/admin/srcY/page-1"]


class TestLangConditionalMix:
    def test_two_level_arithmetic(self, spark):
        """en: 2 sources (4 and 1 docs, 1 token each); fr: 1 source,
        5 docs of 3 tokens. lang shares 5/20 and 15/20; within-en
        sqrt weights 2:1; quotas floor the exact product."""
        from soccerpredictor_spark.operators.textops import (
            TEMP_MIX_BUDGET,
            lang_conditional_mix,
        )

        rows_in = (
            [(i, "t", "en", "sA") for i in range(4)]
            + [(4, "t", "en", "sB")]
            + [(5 + i, "x y z", "fr", "sC") for i in range(5)]
        )
        docs = spark.createDataFrame(
            rows_in, "doc_id long, text string, lang string, source string"
        )
        rows = {
            (r.lang, r.source): r for r in lang_conditional_mix(docs).collect()
        }
        assert set(rows) == {("en", "sA"), ("en", "sB"), ("fr", "sC")}
        a, b, c = rows[("en", "sA")], rows[("en", "sB")], rows[("fr", "sC")]
        assert (a.n_docs, a.n_tokens) == (4, 4)
        assert (b.n_docs, b.n_tokens) == (1, 1)
        assert (c.n_docs, c.n_tokens) == (5, 15)
        assert math.isclose(a.lang_token_share, 0.25)
        assert math.isclose(c.lang_token_share, 0.75)
        assert math.isclose(a.within_share, 2.0 / 3.0)
        assert math.isclose(b.within_share, 1.0 / 3.0)
        assert math.isclose(c.within_share, 1.0)
        assert a.quota == math.floor(0.25 * (2.0 / 3.0) * TEMP_MIX_BUDGET)
        assert c.quota == math.floor(0.75 * 1.0 * TEMP_MIX_BUDGET)
        # quotas never exceed the budget in total
        assert a.quota + b.quota + c.quota <= TEMP_MIX_BUDGET

    def test_single_cell_gets_everything(self, spark):
        from soccerpredictor_spark.operators.textops import (
            TEMP_MIX_BUDGET,
            lang_conditional_mix,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "de", "s")],
            "doc_id long, text string, lang string, source string",
        )
        (r,) = lang_conditional_mix(docs).collect()
        assert r.lang_token_share == 1.0 and r.within_share == 1.0
        assert r.quota == TEMP_MIX_BUDGET


class TestMixtureRepetitionAudit:
    def test_epoch_wall_arithmetic(self, spark):
        """Two sources 16:1 tokens. sqrt weights 4:1 -> shares
        0.8/0.2 of a 2x34=68-token budget -> targets 54 and 13.
        The small source's 13 tokens over its 2-token corpus is 6.5
        epochs — over the 4-epoch wall by 13-8=5 tokens; the big one
        (54/32 = 1.7 epochs) is fine."""
        from soccerpredictor_spark.operators.textops import (
            mixture_repetition_audit,
        )

        big = " ".join(f"t{i}" for i in range(16))
        docs = spark.createDataFrame(
            [(1, big, "big"), (2, big, "big"), (3, "a b", "small")],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in mixture_repetition_audit(docs).collect()}
        b, s = rows["big"], rows["small"]
        assert (b.tokens, s.tokens) == (32, 2)
        # weights sqrt(32), sqrt(2): shares 4/5 and 1/5 exactly
        import math

        w_b, w_s = math.sqrt(32.0), math.sqrt(2.0)
        assert math.isclose(b.share, w_b / (w_b + w_s))
        assert math.isclose(s.share, w_s / (w_b + w_s))
        assert b.target_tokens == math.floor(b.share * 68.0)
        assert s.target_tokens == math.floor(s.share * 68.0)
        assert not b.over_cap and b.excess_tokens == 0
        assert s.over_cap
        assert s.excess_tokens == s.target_tokens - 2 * 4
        assert math.isclose(s.epochs_implied, s.target_tokens / 2.0)

    def test_single_source_exact_budget_epochs(self, spark):
        """One source takes the whole budget: exactly
        DATA_MIX_BUDGET_EPOCHS epochs, never over the 4-epoch wall."""
        from soccerpredictor_spark.operators.textops import (
            DATA_MIX_BUDGET_EPOCHS,
            mixture_repetition_audit,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d", "s")], "doc_id long, text string, source string"
        )
        (r,) = mixture_repetition_audit(docs).collect()
        assert r.share == 1.0
        assert r.target_tokens == 4 * DATA_MIX_BUDGET_EPOCHS
        assert r.epochs_implied == float(DATA_MIX_BUDGET_EPOCHS)
        assert not r.over_cap and r.excess_tokens == 0


class TestLDiversityAudit:
    def test_distinct_l_rungs(self, spark):
        """Two QI classes (same lang, len buckets 0 and 1): bucket 0
        holds 3 docs from 2 sources, bucket 1 holds 2 docs from 1
        source. l=2: only bucket 1 below (2 docs at risk); l=3 and
        l=5: both classes below (all 5 docs at risk)."""
        from soccerpredictor_spark.operators.quality import (
            l_diversity_audit,
        )

        docs = spark.createDataFrame(
            [
                (1, "en", "sA", 10),
                (2, "en", "sA", 20),
                (3, "en", "sB", 30),
                (4, "en", "sC", 70),
                (5, "en", "sC", 90),
            ],
            "doc_id long, lang string, source string, n_chars long",
        )
        rows = {r.l: r for r in l_diversity_audit(docs).collect()}
        assert sorted(rows) == [2, 3, 5]
        assert rows[2].n_classes == 2
        assert (rows[2].n_classes_below_l, rows[2].n_docs_at_risk) == (1, 2)
        assert rows[2].at_risk_frac == 0.4
        for l in (3, 5):
            assert (rows[l].n_classes_below_l, rows[l].n_docs_at_risk) == (
                2, 5,
            )
            assert rows[l].at_risk_frac == 1.0

    def test_diverse_class_never_at_risk(self, spark):
        """A single class with 5 distinct sources passes every rung."""
        from soccerpredictor_spark.operators.quality import (
            l_diversity_audit,
        )

        docs = spark.createDataFrame(
            [(i, "fr", f"s{i}", 5) for i in range(5)],
            "doc_id long, lang string, source string, n_chars long",
        )
        rows = l_diversity_audit(docs).collect()
        assert all(r.n_classes_below_l == 0 for r in rows)
        assert all(r.at_risk_frac == 0.0 for r in rows)

    def test_empty_corpus_fixed_spine(self, spark):
        from soccerpredictor_spark.operators.quality import (
            L_DIV_RUNGS,
            l_diversity_audit,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, lang string, source string, n_chars long"
        )
        rows = l_diversity_audit(docs).collect()
        assert [r.l for r in rows] == list(L_DIV_RUNGS)
        assert all(
            (r.n_classes, r.n_docs, r.at_risk_frac) == (0, 0, None)
            for r in rows
        )


class TestPackingFragmentationSweep:
    def test_crossing_arithmetic(self, spark):
        """One source, docs of 200/100/300 tokens -> spans [0,199],
        [200,299], [300,599]. ctx=256: doc 2 crosses once (bins 0->1),
        doc 3 crosses once (bins 1->2); ctx=512: only doc 3 crosses;
        ctx=1024 and 2048: nothing crosses."""
        from soccerpredictor_spark.operators.textops import (
            PACK_SWEEP_CTX,
            packing_fragmentation_sweep,
        )

        def words(n, tag):
            return " ".join(f"{tag}{i}" for i in range(n))

        docs = spark.createDataFrame(
            [
                (1, words(200, "a"), "s"),
                (2, words(100, "b"), "s"),
                (3, words(300, "c"), "s"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.ctx: r for r in packing_fragmentation_sweep(docs).collect()}
        assert sorted(rows) == sorted(PACK_SWEEP_CTX)
        assert (rows[256].n_docs_split, rows[256].n_crossings) == (2, 2)
        assert (rows[512].n_docs_split, rows[512].n_crossings) == (1, 1)
        assert (rows[1024].n_docs_split, rows[1024].n_crossings) == (0, 0)
        assert rows[256].split_frac == 2.0 / 3.0
        assert rows[2048].split_frac == 0.0

    def test_per_source_offsets_independent(self, spark):
        """Two sources each with one 300-token doc: offsets restart per
        source, so at ctx=256 BOTH docs cross exactly once (a global
        concat would give different counts)."""
        from soccerpredictor_spark.operators.textops import (
            packing_fragmentation_sweep,
        )

        text = " ".join(f"w{i}" for i in range(300))
        docs = spark.createDataFrame(
            [(1, text, "sA"), (2, text, "sB")],
            "doc_id long, text string, source string",
        )
        rows = {r.ctx: r for r in packing_fragmentation_sweep(docs).collect()}
        assert (rows[256].n_docs_split, rows[256].n_crossings) == (2, 2)
        assert rows[512].n_docs_split == 0

    def test_empty_corpus_fixed_spine(self, spark):
        from soccerpredictor_spark.operators.textops import (
            PACK_SWEEP_CTX,
            packing_fragmentation_sweep,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        rows = packing_fragmentation_sweep(docs).collect()
        assert [r.ctx for r in rows] == sorted(PACK_SWEEP_CTX)
        assert all(
            (r.n_docs, r.n_crossings, r.split_frac) == (0, 0, None)
            for r in rows
        )


class TestShuffleRunAudit:
    def test_runs_and_clump_factor(self, spark):
        """Verify islands against the actual corpus_shuffle order: the
        audit's run decomposition must match one computed directly
        from the shuffled positions."""
        from soccerpredictor_spark.operators.textops import (
            corpus_shuffle,
            shuffle_run_audit,
        )

        docs = spark.createDataFrame(
            [(i, "t", "sA" if i % 3 else "sB") for i in range(30)],
            "doc_id long, text string, source string",
        )
        order = {
            r.doc_id: r.pos for r in corpus_shuffle(docs).collect()
        }
        seq = [
            ("sA" if d % 3 else "sB")
            for d in sorted(order, key=lambda d: order[d])
        ]
        import itertools

        expected = {}
        for src, grp in itertools.groupby(seq):
            n = len(list(grp))
            runs, mx, docs_n = expected.get(src, (0, 0, 0))
            expected[src] = (runs + 1, max(mx, n), docs_n + n)
        rows = {r.source: r for r in shuffle_run_audit(docs).collect()}
        assert set(rows) == set(expected)
        N = 30
        for src, (runs, mx, n) in expected.items():
            r = rows[src]
            assert (r.n_runs, r.max_run_len, r.n_docs) == (runs, mx, n)
            assert r.mean_run_len == n / runs
            import math

            assert math.isclose(
                r.clump_factor, (n / runs) * ((N - n + 1) / N)
            )

    def test_perfect_interleave_clump_near_one(self, spark):
        """Alternating tiny corpus where the md5 order happens to mix:
        clump_factor stays bounded and mean_run_len >= 1 always."""
        from soccerpredictor_spark.operators.textops import (
            shuffle_run_audit,
        )

        docs = spark.createDataFrame(
            [(i, "t", f"s{i % 4}") for i in range(40)],
            "doc_id long, text string, source string",
        )
        for r in shuffle_run_audit(docs).collect():
            assert 1.0 <= r.mean_run_len <= r.max_run_len
            assert r.clump_factor > 0.0

    def test_single_source_one_run(self, spark):
        from soccerpredictor_spark.operators.textops import (
            shuffle_run_audit,
        )

        docs = spark.createDataFrame(
            [(i, "t", "only") for i in range(7)],
            "doc_id long, text string, source string",
        )
        (r,) = shuffle_run_audit(docs).collect()
        assert (r.n_runs, r.n_docs, r.max_run_len) == (1, 7, 7)
        assert r.mean_run_len == 7.0
        # N == n_s -> expectation N/(N-n+1) = N, clump = 1 exactly
        assert r.clump_factor == 1.0


class TestDedupClusterDensity:
    def test_clique_density_one(self, spark):
        """Two 3-doc exact-copy cliques: every pair is a verified
        edge, so the size-3 row shows 3 edges per cluster of 3
        possible — density exactly 1.0."""
        from soccerpredictor_spark.operators.dedup import (
            dedup_cluster_density,
        )

        t1 = "x0 x1 x2 x3 x4 x5 x6 x7"
        t2 = "y0 y1 y2 y3 y4 y5 y6 y7"
        docs = spark.createDataFrame(
            [
                (1, t1, "s"), (2, t1, "s"), (3, t1, "s"),
                (4, t2, "s"), (5, t2, "s"), (6, t2, "s"),
                (7, "unrelated words entirely here now", "s"),
            ],
            "doc_id long, text string, source string",
        )
        rows = dedup_cluster_density(docs).collect()
        assert [
            (r.cluster_size, r.n_clusters, r.n_edges, r.n_possible, r.density)
            for r in rows
        ] == [(3, 2, 6, 6, 1.0)]

    def test_density_consistent_with_pair_and_label_tables(self, spark):
        """On a mixed corpus the per-size rows must equal the edge and
        possible counts recomputed directly from the session-cached
        pair and label tables (chaining, if the banding finds any,
        shows up as density < 1 — either way the accounting holds)."""
        import collections

        from soccerpredictor_spark.operators.dedup import (
            dedup_cluster_density,
            minhash_lsh_pairs,
            near_dup_clusters,
        )

        a = " ".join(f"a{i}" for i in range(12))
        b = a + " " + " ".join(f"c{i}" for i in range(4))
        docs = spark.createDataFrame(
            [
                (1, "p0 p1 p2 p3 p4 p5", "s"), (2, "p0 p1 p2 p3 p4 p5", "s"),
                (10, a, "s"), (11, b, "s"),
                (20, "solo document with its own words", "s"),
            ],
            "doc_id long, text string, source string",
        )
        labels = {
            r.doc_id: r.cluster_id for r in near_dup_clusters(docs).collect()
        }
        edges = [
            labels[r.doc_a]
            for r in minhash_lsh_pairs(docs).select("doc_a", "doc_b").collect()
        ]
        sz = collections.Counter(collections.Counter(labels.values()).values())
        edge_by_size = collections.Counter()
        cluster_sizes = collections.Counter(labels.values())
        for cid in edges:
            edge_by_size[cluster_sizes[cid]] += 1
        rows = {r.cluster_size: r for r in dedup_cluster_density(docs).collect()}
        assert set(rows) == set(sz)
        for size, n_clusters in sz.items():
            r = rows[size]
            poss = n_clusters * (size * (size - 1) // 2)
            assert (r.n_clusters, r.n_edges, r.n_possible) == (
                n_clusters, edge_by_size[size], poss,
            )
            assert r.density == edge_by_size[size] / poss

    def test_pair_cluster_density_one(self, spark):
        """Two exact copies: one 2-doc cluster, 1 edge of 1 possible."""
        from soccerpredictor_spark.operators.dedup import (
            dedup_cluster_density,
        )

        text = "p0 p1 p2 p3 p4 p5"
        docs = spark.createDataFrame(
            [(1, text, "s"), (2, text, "s"), (3, "unrelated words here", "s")],
            "doc_id long, text string, source string",
        )
        rows = dedup_cluster_density(docs).collect()
        assert [(r.cluster_size, r.n_clusters, r.n_edges, r.n_possible,
                 r.density) for r in rows] == [(2, 1, 1, 1, 1.0)]
