"""Round-13 STAGED operators — closed-form semantic unit tests.

The staged-set source of truth stays ``test_staged_round11.STAGED``
(one list feeds the parametrized parity / plan / empty-input gates,
``tools/gen_registration.py`` and the window-feasibility test); this
file holds the round-13 batch's closed-form coverage only.

Round-13 batch: suffix_dedup_spans (Lee et al. 2022 exact-substring
criterion at token grain — round-12 verdict task #6),
vocab_ladder_fertility (published-vocab calibration — task #4).
"""

from __future__ import annotations


class TestSuffixDedupSpans:
    def test_identical_docs_fully_covered(self, spark):
        """Two identical 6-token docs at k=5: both k-grams (i=1, i=2)
        are corpus duplicates, the islands merge to one span covering
        the whole doc — dup_fraction exactly 1.0 for both docs."""
        from soccerpredictor_spark.operators.dedup import suffix_dedup_spans

        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
        )
        rows = suffix_dedup_spans(docs, k=5).collect()
        assert [
            (r.doc_id, r.n_tokens, r.n_dup_spans, r.dup_tokens, r.dup_fraction)
            for r in rows
        ] == [(1, 6, 1, 6, 1.0), (2, 6, 1, 6, 1.0)]

    def test_intra_document_repeat_merges_to_one_span(self, spark):
        """'p q r s t p q r s t' at k=5: the gram repeats at i=1 and
        i=6 INSIDE one document; the gap (5) abuts at exactly k so the
        islands merge into a single [1, 10] span — intra-doc repeats
        count, as in Lee et al.'s criterion."""
        from soccerpredictor_spark.operators.dedup import suffix_dedup_spans

        docs = spark.createDataFrame(
            [(1, "p q r s t p q r s t")], ["doc_id", "text"]
        )
        [r] = suffix_dedup_spans(docs, k=5).collect()
        assert (r.n_tokens, r.n_dup_spans, r.dup_tokens) == (10, 1, 10)
        assert r.dup_fraction == 1.0

    def test_shared_span_between_two_docs(self, spark):
        """A 5-token sequence S shared by two otherwise-disjoint
        9-token docs: exactly one duplicated gram position per doc,
        span length exactly k, fraction 5/9 on both sides."""
        from soccerpredictor_spark.operators.dedup import suffix_dedup_spans

        docs = spark.createDataFrame(
            [
                (1, "x1 x2 s1 s2 s3 s4 s5 y1 y2"),
                (2, "z1 s1 s2 s3 s4 s5 w1 w2 w3"),
            ],
            ["doc_id", "text"],
        )
        rows = suffix_dedup_spans(docs, k=5).collect()
        assert [(r.doc_id, r.n_dup_spans, r.dup_tokens) for r in rows] == [
            (1, 1, 5),
            (2, 1, 5),
        ]
        assert all(abs(r.dup_fraction - 5.0 / 9.0) < 1e-15 for r in rows)

    def test_two_separated_spans_stay_separate(self, spark):
        """Two duplicated grams more than k tokens apart do NOT merge:
        doc 1 repeats S at i=1 and i=12 (gap 11 > k=5) -> 2 spans of
        k tokens each."""
        from soccerpredictor_spark.operators.dedup import suffix_dedup_spans

        docs = spark.createDataFrame(
            [
                (1, "s1 s2 s3 s4 s5 a b c d e f s1 s2 s3 s4 s5"),
                (2, "s1 s2 s3 s4 s5 q r t u v"),
            ],
            ["doc_id", "text"],
        )
        rows = {r.doc_id: r for r in suffix_dedup_spans(docs, k=5).collect()}
        assert (rows[1].n_dup_spans, rows[1].dup_tokens) == (2, 10)
        assert (rows[2].n_dup_spans, rows[2].dup_tokens) == (1, 5)

    def test_unique_corpus_returns_no_rows(self, spark):
        """All-distinct tokens: no k-gram occurs twice, output empty
        (documents with zero duplicated spans are simply absent)."""
        from soccerpredictor_spark.operators.dedup import suffix_dedup_spans

        docs = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, "h i j k l m n")], ["doc_id", "text"]
        )
        assert suffix_dedup_spans(docs, k=5).count() == 0

    def test_docs_shorter_than_k_excluded(self, spark):
        """Identical 3-token docs at k=5 hold no k-gram at all — they
        cannot carry a >= k-token duplicated span by definition, so
        they are excluded, not flagged."""
        from soccerpredictor_spark.operators.dedup import suffix_dedup_spans

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
        )
        assert suffix_dedup_spans(docs, k=5).count() == 0

    def test_default_grain_is_lee_et_al_50(self):
        from soccerpredictor_spark.operators.dedup import SUFFIX_SPAN_K

        assert SUFFIX_SPAN_K == 50


class TestVocabLadderFertility:
    def test_partial_coverage_exact(self, spark):
        """Corpus 'aa aa aa bb bb ccc': types aa(3, len 2), bb(2, 2),
        ccc(1, 3); ranks by (count desc, word asc) = aa, bb, ccc.
        V=1 keeps aa only: coverage 3/6, fertility (3 + 2*2 + 1*3)/6;
        V=2 adds bb: coverage 5/6, fertility (5 + 3)/6. Exact on both
        engines (pure integer sums over the type table)."""
        from soccerpredictor_spark.operators.textops import (
            vocab_ladder_fertility,
        )

        docs = spark.createDataFrame(
            [(1, "aa aa aa bb bb ccc")], ["doc_id", "text"]
        )
        rows = {
            r.tokenizer: r
            for r in vocab_ladder_fertility(
                docs, ladder=[("tiny", 1), ("two", 2)]
            ).collect()
        }
        t = rows["tiny"]
        assert (t.vocab_used, t.n_types) == (1, 3)
        assert t.token_coverage == 3.0 / 6.0
        assert t.oov_rate == 3.0 / 6.0
        assert t.fertility == (3 + 2 * 2 + 1 * 3) / 6.0
        u = rows["two"]
        assert (u.vocab_used, u.token_coverage) == (2, 5.0 / 6.0)
        assert u.fertility == (5 + 3) / 6.0

    def test_char_baseline_is_mean_word_length(self, spark):
        """V=0 covers nothing: fertility is exactly the occurrence-
        weighted mean word length, coverage 0 — the curve's top
        anchor."""
        from soccerpredictor_spark.operators.textops import (
            vocab_ladder_fertility,
        )

        docs = spark.createDataFrame(
            [(1, "aa bbbb aa")], ["doc_id", "text"]
        )
        [r] = vocab_ladder_fertility(
            docs, ladder=[("char_baseline", 0)]
        ).collect()
        assert r.token_coverage == 0.0 and r.oov_rate == 1.0
        assert r.fertility == (2 + 2 + 4) / 3.0

    def test_saturated_rung_floors_at_one(self, spark):
        """V >= n_types: every occurrence is one piece — fertility
        exactly 1.0, vocab_used == n_types (the saturation signal the
        sf0.01 fixture shows on every published rung)."""
        from soccerpredictor_spark.operators.textops import (
            vocab_ladder_fertility,
        )

        docs = spark.createDataFrame([(1, "x yy x")], ["doc_id", "text"])
        [r] = vocab_ladder_fertility(docs, ladder=[("big", 99)]).collect()
        assert (r.fertility, r.oov_rate, r.vocab_used, r.n_types) == (
            1.0,
            0.0,
            2,
            2,
        )

    def test_published_ladder_values(self):
        """The embedded rungs are the published sizes (GPT-2 50257,
        BERT 30522, T5 32100, LLaMA-2 32000, cl100k 100256, o200k
        199998, Gemma 256000) plus the V=0 char anchor — pinned so a
        typo cannot silently shift the calibration."""
        from soccerpredictor_spark.operators.textops import (
            PUBLISHED_VOCAB_LADDER,
        )

        assert dict(PUBLISHED_VOCAB_LADDER) == {
            "char_baseline": 0,
            "bert_base_wordpiece": 30522,
            "llama2_sentencepiece": 32000,
            "t5_sentencepiece": 32100,
            "gpt2_bpe": 50257,
            "cl100k_base": 100256,
            "o200k_base": 199998,
            "gemma_sentencepiece": 256000,
        }


class TestLshBandSweep:
    def test_identical_docs_full_recall_every_config(self, spark):
        """Two identical docs share every minhash, so every banding
        catches the pair: n_hit == n_true == 1 and recall 1.0 on all
        five configs; rows_per_band = 12/b exactly."""
        from soccerpredictor_spark.operators.dedup import lsh_band_sweep

        text = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(1, text), (2, text), (3, "totally different words here now")],
            ["doc_id", "text"],
        )
        rows = lsh_band_sweep(docs).collect()
        assert [r.bands for r in rows] == [2, 3, 4, 6]
        for r in rows:
            assert r.rows_per_band == 12 // r.bands
            assert (r.n_true, r.n_hit, r.recall) == (1, 1, 1.0)
            assert r.n_candidates >= 1

    def test_candidates_monotone_in_bands(self, spark):
        """Divisor banding nests: every coarse band contains a
        complete finer band, so the candidate set (and hence recall)
        is monotone non-decreasing in b — the property that makes the
        sweep a tuning CURVE rather than five unrelated numbers.
        Checked on the sf0.001 fixture corpus by the parity gate's
        data; here on a synthetic near-dup corpus."""
        from soccerpredictor_spark.operators.dedup import lsh_band_sweep

        base = "w%d " * 30
        docs = spark.createDataFrame(
            [
                (i, (base % tuple(range(j, j + 30))).strip())
                for i, j in [(1, 0), (2, 1), (3, 2), (4, 50), (5, 51)]
            ],
            ["doc_id", "text"],
        )
        rows = sorted(lsh_band_sweep(docs).collect(), key=lambda r: r.bands)
        cands = [r.n_candidates for r in rows]
        hits = [r.n_hit for r in rows]
        assert cands == sorted(cands)
        assert hits == sorted(hits)

    def test_s_curve_literals_match_python_pow(self, spark):
        """The theoretical S-curve midpoint (1/b)^(1/r) is computed
        ONCE driver-side and embedded as the identical double in both
        engines (pow is libm-dependent; evaluating it per-engine is
        the ln() trap). Pin the values."""
        import math

        from soccerpredictor_spark.operators.dedup import lsh_band_sweep

        docs = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
        got = {
            r.bands: r.s_curve_threshold for r in lsh_band_sweep(docs).collect()
        }
        assert got == {
            b: math.pow(1.0 / b, 1.0 / (12 // b)) for b in (2, 3, 4, 6)
        }

    def test_empty_corpus_keeps_config_rows(self, spark):
        """No documents: the sweep still reports one row per config
        (n_true = n_hit = n_candidates = 0, recall NULL) — the
        config table is the spine, not the data."""
        from soccerpredictor_spark.operators.dedup import lsh_band_sweep

        docs = spark.createDataFrame([], "doc_id long, text string")
        rows = lsh_band_sweep(docs).collect()
        assert len(rows) == 4
        assert all(
            (r.n_true, r.n_hit, r.n_candidates, r.recall) == (0, 0, 0, None)
            for r in rows
        )


class TestDsirImportanceSelect:
    def test_target_source_scores_highest(self, spark):
        """src0 docs repeat one vocabulary, src1 another: the hashed
        bucket model gives src0 features positive log-ratio weight,
        so src0's mean_weight strictly dominates and (with k =
        ceil(6/5) = 2 and all three src0 docs tied at the boundary
        score) ties-inclusive selection keeps ALL of src0 and none of
        src1."""
        from soccerpredictor_spark.operators.textops import (
            dsir_importance_select,
        )

        docs = spark.createDataFrame(
            [(i, "aa aa aa", "en", "src0", 8) for i in range(3)]
            + [(10 + i, "zz zz zz", "en", "src1", 8) for i in range(3)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = {r.source: r for r in dsir_importance_select(docs).collect()}
        assert rows["src0"].mean_weight > rows["src1"].mean_weight
        assert (rows["src0"].n_selected, rows["src0"].sel_rate) == (3, 1.0)
        assert (rows["src1"].n_selected, rows["src1"].sel_rate) == (0, 0.0)

    def test_single_source_selects_quota_with_ties(self, spark):
        """All docs identical (one source): every score ties, so the
        ties-inclusive top-20% keeps everything — sel_rate 1.0, the
        documented deterministic replacement for Gumbel resampling."""
        from soccerpredictor_spark.operators.textops import (
            dsir_importance_select,
        )

        docs = spark.createDataFrame(
            [(i, "w1 w2 w3", "en", "src0", 8) for i in range(5)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        [r] = dsir_importance_select(docs).collect()
        assert (r.n_docs, r.n_selected, r.sel_rate) == (5, 5, 1.0)

    def test_null_text_doc_scores_zero(self, spark):
        """A NULL-text document has no feature rows; the anti-join
        branch keeps it at score 0 so the per-source grain never
        loses rows."""
        from soccerpredictor_spark.operators.textops import (
            dsir_importance_select,
        )

        docs = spark.createDataFrame(
            [
                (1, "aa bb cc", "en", "src0", 8),
                (2, None, "en", "srcnull", 0),
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )
        rows = {r.source: r for r in dsir_importance_select(docs).collect()}
        assert rows["srcnull"].sum_weight == 0
        assert rows["srcnull"].n_docs == 1


class TestLengthFilterSweep:
    def test_exact_counts_and_shares(self, spark):
        """Docs of 3, 10 and 30 tokens against the fixed thresholds:
        >=10 keeps 2 docs / 40 tokens, >=25 keeps 1 doc / 30 tokens,
        >=50 and up keep nothing; shares are the exact ratios over
        3 docs / 43 tokens."""
        from soccerpredictor_spark.operators.textops import (
            length_filter_sweep,
        )

        mk = lambda n: " ".join(f"t{i}" for i in range(n))  # noqa: E731
        docs = spark.createDataFrame(
            [(1, mk(3)), (2, mk(10)), (3, mk(30))], ["doc_id", "text"]
        )
        rows = {r.min_tokens: r for r in length_filter_sweep(docs).collect()}
        assert sorted(rows) == [10, 25, 50, 100, 200]
        assert (rows[10].n_docs_kept, rows[10].n_tokens_kept) == (2, 40)
        assert rows[10].docs_share == 2.0 / 3.0
        assert rows[10].tokens_share == 40.0 / 43.0
        assert (rows[25].n_docs_kept, rows[25].n_tokens_kept) == (1, 30)
        assert (rows[50].n_docs_kept, rows[200].n_tokens_kept) == (0, 0)

    def test_empty_corpus_keeps_threshold_spine(self, spark):
        """No documents: five rows still report, zero counts, NULL
        shares (guarded division) — the sweep spine convention."""
        from soccerpredictor_spark.operators.textops import (
            length_filter_sweep,
        )

        docs = spark.createDataFrame([], "doc_id long, text string")
        rows = length_filter_sweep(docs).collect()
        assert len(rows) == 5
        assert all(
            (r.n_docs_kept, r.n_tokens_kept, r.docs_share, r.tokens_share)
            == (0, 0, None, None)
            for r in rows
        )


class TestTemplateDedup:
    def test_shared_scaffold_different_content_is_a_family(self, spark):
        """'the # of #' scaffold with different content words groups;
        a doc with a different scaffold does not; an exact-dup pair
        (same text twice) is EXCLUDED (n_texts must exceed 1 — that
        grain belongs to exact dedup)."""
        from soccerpredictor_spark.functions.text import STOPWORDS
        from soccerpredictor_spark.operators.textops import template_dedup

        assert {"the", "of", "a"} <= set(STOPWORDS)
        docs = spark.createDataFrame(
            [
                (1, "the cat of doom", "en", "s1", 10),
                (2, "the dog of joy", "en", "s2", 10),
                (3, "a lonely scaffold", "en", "s1", 10),
                (4, "same exact text", "en", "s1", 10),
                (5, "same exact text", "en", "s2", 10),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = template_dedup(docs).collect()
        assert len(rows) == 1
        [r] = rows
        assert (r.n_docs, r.n_texts, r.n_sources) == (2, 2, 2)

    def test_divergence_past_prefix_still_groups(self, spark):
        """The skeleton reads only the first 16 tokens: two docs
        identical in scaffold up front but wildly different after
        token 16 are still one family — boilerplate headers are
        positional."""
        from soccerpredictor_spark.operators.textops import template_dedup

        head = "the x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15"
        docs = spark.createDataFrame(
            [
                (1, head + " tail one here", "en", "s1", 10),
                (2, head + " completely different ending words", "en", "s1", 10),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = template_dedup(docs).collect()
        assert len(rows) == 1 and rows[0].n_docs == 2


class TestTokensPerByte:
    def test_exact_bucket_and_ratio(self, spark):
        """'ab ab' -> 2 pieces / 5 bytes: bucket 40 DIV 5 = 8, mean
        0.4; 'aaaa' -> 1/4: bucket 5, mean 0.25. Integer DIV
        bucketing and ratio-of-sums, exact on both engines."""
        from soccerpredictor_spark.operators.textops import tokens_per_byte

        docs = spark.createDataFrame(
            [
                (1, "ab ab", "en", "s1", 5),
                (2, "aaaa", "en", "s1", 4),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = {r.tpb_bucket: r for r in tokens_per_byte(docs).collect()}
        assert rows[8].n_docs == 1 and rows[8].mean_tpb == 2.0 / 5.0
        assert rows[5].n_docs == 1 and rows[5].mean_tpb == 1.0 / 4.0

    def test_ratio_of_sums_within_bucket(self, spark):
        """Two docs landing in one bucket aggregate as sum(p)/sum(nb)
        — the order-independent bucket statistic, not a float fold of
        per-doc ratios."""
        from soccerpredictor_spark.operators.textops import tokens_per_byte

        docs = spark.createDataFrame(
            [
                (1, "ab ab", "en", "s1", 5),      # 2/5 -> bucket 8
                (2, "ab ab ab ab", "en", "s1", 11),  # 4/11 -> 80 DIV 11 = 7
                (3, "cd cd", "en", "s1", 5),      # 2/5 -> bucket 8
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = {r.tpb_bucket: r for r in tokens_per_byte(docs).collect()}
        assert rows[8].n_docs == 2
        assert rows[8].mean_tpb == (2 + 2) / (5 + 5)
        assert rows[7].n_docs == 1

    def test_empty_text_excluded(self, spark):
        """Zero-byte documents carry no signal and are dropped, not
        divided by zero."""
        from soccerpredictor_spark.operators.textops import tokens_per_byte

        docs = spark.createDataFrame(
            [(1, "", "en", "s1", 0), (2, "ab", "en", "s1", 2)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = tokens_per_byte(docs).collect()
        assert len(rows) == 1 and rows[0].n_docs == 1


class TestCcnetBuckets:
    def test_buckets_monotone_and_mass_preserved(self, spark):
        """On the sf0.001 fixture: per lang, the bucket aggregate
        rare rate is strictly monotone head < middle < tail (the
        property that makes the tercile split a QUALITY ordering) and
        bucket doc counts sum back to the scored-doc count."""
        from soccerpredictor_spark.operators.textops import (
            ccnet_buckets,
            perplexity_filter,
        )
        from soccerpredictor_spark.sources.catalog import read_table

        docs = read_table(spark, "/root/testdata/sf0.001", "documents")
        rows = ccnet_buckets(docs).collect()
        n_scored = perplexity_filter(docs).count()
        assert sum(r.n_docs for r in rows) == n_scored
        by_lang: dict[str, dict[str, float]] = {}
        for r in rows:
            by_lang.setdefault(r.lang, {})[r.ppl_bucket] = r.bucket_rare_rate
        for lang, b in by_lang.items():
            assert set(b) == {"a_head", "b_middle", "c_tail"}, lang
            assert b["a_head"] < b["b_middle"] < b["c_tail"], lang

    def test_identical_docs_single_head_bucket(self, spark):
        """Every document identical: one rare-rate value, so both
        tercile edges equal it and EVERYTHING lands in head (ties
        compare low) — no empty-bucket crashes, one row per lang."""
        from soccerpredictor_spark.operators.textops import ccnet_buckets

        docs = spark.createDataFrame(
            [(i, "w1 w2 w1 w2 w3", "en", "s1", 10) for i in range(4)],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = ccnet_buckets(docs).collect()
        assert len(rows) == 1
        assert (rows[0].ppl_bucket, rows[0].n_docs) == ("a_head", 4)

    def test_docs_without_bigrams_absent(self, spark):
        """Single-token documents carry no LM evidence: they are
        absent from the buckets, exactly as in perplexity_filter."""
        from soccerpredictor_spark.operators.textops import ccnet_buckets

        docs = spark.createDataFrame(
            [
                (1, "solo", "en", "s1", 4),
                (2, "w1 w2 w1 w2", "en", "s1", 11),
            ],
            ["doc_id", "text", "lang", "source", "n_chars"],
        )
        rows = ccnet_buckets(docs).collect()
        assert sum(r.n_docs for r in rows) == 1
