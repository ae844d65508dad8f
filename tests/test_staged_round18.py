"""Closed-form semantic tests for the round-18 staged batch (staged
during round 17; parity + plan-purity + empty-input gates run through
the shared harness in test_staged_round11.py):

- span_cut_apply_stats: post-rewrite per-source corpus accounting
- url_path_filter: robots-style first-match path deny census
- mixture_temperature_ladder: per-source share across T in (1,2,4,8)
- lang_conditional_mix: two-level (lang budget, within-lang T=1/2) mix
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


class TestMixtureTemperatureLadder:
    def test_shares_and_spread(self, spark):
        """Two sources 9:1. T=1 shares 0.9/0.1; T=2 3:1; T=4
        sqrt(3):1; T=8 3^(1/4):1 — each rung exactly the repeated-sqrt
        closed form, big source's share strictly decreasing in T."""
        from soccerpredictor_spark.operators.textops import (
            mixture_temperature_ladder,
        )

        docs = spark.createDataFrame(
            [(i, "t", "big" if i < 9 else "small") for i in range(10)],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in mixture_temperature_ladder(docs).collect()}
        big = rows["big"]
        assert math.isclose(big.share_t1, 0.9)
        assert math.isclose(big.share_t2, 3.0 / 4.0)
        w4 = math.sqrt(3.0)
        assert math.isclose(big.share_t4, w4 / (w4 + 1.0))
        w8 = math.sqrt(math.sqrt(math.sqrt(9.0)))
        assert math.isclose(big.share_t8, w8 / (w8 + 1.0))
        assert big.share_t1 > big.share_t2 > big.share_t4 > big.share_t8
        assert math.isclose(big.ladder_spread, big.share_t1 - big.share_t8)
        small = rows["small"]
        assert small.share_t1 < small.share_t2 < small.share_t4 < small.share_t8
        assert math.isclose(small.ladder_spread, small.share_t8 - small.share_t1)
        # every rung's shares sum to 1
        for t in (1, 2, 4, 8):
            assert math.isclose(
                getattr(big, f"share_t{t}") + getattr(small, f"share_t{t}"),
                1.0,
            )

    def test_uniform_corpus_is_t_invariant(self, spark):
        from soccerpredictor_spark.operators.textops import (
            mixture_temperature_ladder,
        )

        docs = spark.createDataFrame(
            [(i, "t", f"s{i % 4}") for i in range(8)],
            "doc_id long, text string, source string",
        )
        for r in mixture_temperature_ladder(docs).collect():
            for t in (1, 2, 4, 8):
                assert math.isclose(getattr(r, f"share_t{t}"), 0.25)
            assert math.isclose(r.ladder_spread, 0.0, abs_tol=1e-15)


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
