"""Round-14 STAGED operators — closed-form semantic unit tests.

The staged-set source of truth stays ``test_staged_round11.STAGED``
(one list feeds the parametrized parity / plan gates,
``tools/gen_registration.py`` and the window-feasibility test); this
file holds the round-14 batch's closed-form coverage only.

Round-14 batch: doremi_mixture (Xie et al. 2023 — round-13 verdict
task #4), gopher_quality_rules + dup_ngram_char_fraction (Rae et al.
2021 A1.1), semdedup (Abbas et al. 2023), heaps_law_curve,
char_entropy_profile, ngram_entropy_profile, pq_m_sweep.
"""

from __future__ import annotations


class TestDoremiMixture:
    def test_single_domain_weight_is_one(self, spark):
        """One domain: normalization + uniform smoothing over D=1 is
        the identity, so the final weight is exactly 1.0 regardless
        of the excess."""
        from soccerpredictor_spark.operators.textops import doremi_mixture

        docs = spark.createDataFrame(
            [(1, "a b c a b", "src0"), (2, "c a b a a", "src0")],
            ["doc_id", "text", "source"],
        )
        [r] = doremi_mixture(docs).collect()
        assert r.source == "src0"
        assert r.n_docs == 2 and r.n_tokens == 10
        assert r.baseline_share == 1.0
        assert r.doremi_weight == 1.0

    def test_repetitive_domain_gains_weight(self, spark):
        """Domain A is one token repeated (its specialist model is
        near-free; the generalist mixture charges it more -> positive
        excess); domain B is diverse. A's final weight must exceed
        its baseline share and B's excess."""
        from soccerpredictor_spark.operators.textops import doremi_mixture

        # domA: 8 occurrences of one alien token in a 128-token corpus
        # -> generalist charges bitlen(128+64)-bitlen(9) = 4 bits,
        # specialist bitlen(8+64)-bitlen(9) = 3 -> excess 1 bit/token
        # (1000/kt, capped to 16). domB's totals match the corpus
        # scale, so its excess quantizes to 0.
        rows = [(1, "zz " * 7 + "zz", "domA")]
        words = [f"w{i}" for i in range(15)]
        rows += [
            (2 + j, " ".join(words), "domB") for j in range(8)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = {r.source: r for r in doremi_mixture(docs).collect()}
        assert got["domA"].excess_bits_per_kilotoken > 0
        assert (
            got["domA"].excess_bits_per_kilotoken
            > got["domB"].excess_bits_per_kilotoken
        )
        assert got["domA"].doremi_weight > got["domA"].baseline_share
        total = sum(r.doremi_weight for r in got.values())
        assert abs(total - 1.0) < 1e-6

    def test_weights_sum_to_one_and_floor_holds(self, spark):
        """c = 0.2 uniform smoothing every round: no domain's weight
        can fall below ~c/D even with maximal excess against it."""
        from soccerpredictor_spark.operators.textops import doremi_mixture

        rows = [(1, "qq " * 60 + "qq", "big")]
        rows += [(2, "one two three four five six seven eight", "small")]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        got = {r.source: r for r in doremi_mixture(docs).collect()}
        assert abs(sum(r.doremi_weight for r in got.values()) - 1.0) < 1e-6
        assert all(r.doremi_weight > 0.2 / 2 * 0.9 for r in got.values())


class TestGopherQualityRules:
    def test_each_rule_fires_exactly(self, spark):
        """Five crafted documents, one per rule, plus one clean one:
        the per-source failure counts are exact."""
        from soccerpredictor_spark.operators.textops import (
            gopher_quality_rules,
        )

        good = (
            "the cat and dog that have fun with food here now "
            "more words keep the count over ten total"
        )
        docs = spark.createDataFrame(
            [
                (1, good, "s"),
                (2, "too few words here", "s"),  # < 10 words
                (3, " ".join(["extraordinarily"] * 12), "s"),  # wlen > 10
                (4, "# " * 11 + good, "s"),  # symbols > 10%
                (5, " ".join(["123"] * 12), "s"),  # < 80% alpha words
                (6, " ".join(["zig zag"] * 6), "s"),  # < 2 stopwords
            ],
            ["doc_id", "text", "source"],
        )
        [r] = gopher_quality_rules(docs).collect()
        assert r.n_docs == 6
        assert r.fail_word_count == 1  # doc 2
        # rules overlap by design (a '#'-ridden doc also drags mean
        # word length under 3 and alpha-word share under 80%)
        assert r.fail_word_length == 2  # docs 3, 4
        assert r.fail_symbol_ratio == 1  # doc 4
        assert r.fail_alpha_words == 2  # docs 4, 5
        assert r.fail_stopwords == 4  # docs 2, 3, 5, 6
        assert r.n_pass == 1 and abs(r.pass_rate - 1.0 / 6.0) < 1e-15

    def test_clean_corpus_passes(self, spark):
        from soccerpredictor_spark.operators.textops import (
            gopher_quality_rules,
        )

        good = (
            "the cat and dog that have fun with food here now "
            "more words keep the count over ten total"
        )
        docs = spark.createDataFrame(
            [(i, good, "s") for i in range(3)], ["doc_id", "text", "source"]
        )
        [r] = gopher_quality_rules(docs).collect()
        assert r.n_pass == 3 and r.pass_rate == 1.0


class TestHeapsLawCurve:
    def test_cumulative_spine_single_doc(self, spark):
        """One document lands in exactly one hash bucket b: rungs
        before b read zero, rungs >= b read the doc's totals; the
        spine always has all 8 rows."""
        from soccerpredictor_spark.operators.textops import (
            HEAPS_RUNGS,
            heaps_law_curve,
        )

        docs = spark.createDataFrame(
            [(7, "aa bb aa cc", "s")], ["doc_id", "text", "source"]
        )
        rows = heaps_law_curve(docs).collect()
        assert len(rows) == HEAPS_RUNGS
        assert [r.rung for r in rows] == list(range(1, HEAPS_RUNGS + 1))
        # monotone cumulative, final rung = full corpus
        last = rows[-1]
        assert (last.n_docs, last.n_tokens, last.n_types) == (1, 4, 3)
        seen = 0
        for r in rows:
            assert r.n_docs >= seen
            seen = r.n_docs
        # exactly one step from 0 to 1
        assert sum(1 for i in range(1, len(rows))
                   if rows[i].n_docs != rows[i - 1].n_docs) == 1

    def test_empty_corpus_keeps_spine(self, spark):
        from soccerpredictor_spark.operators.textops import (
            HEAPS_RUNGS,
            heaps_law_curve,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        rows = heaps_law_curve(docs).collect()
        assert len(rows) == HEAPS_RUNGS
        assert all(
            (r.n_docs, r.n_tokens, r.n_types) == (0, 0, 0) for r in rows
        )
        assert all(r.type_token_ratio is None for r in rows)

    def test_types_count_first_bucket_only(self, spark):
        """A word seen in several buckets is counted once, at its
        first (min) bucket — cumulative types never double-count."""
        from soccerpredictor_spark.operators.textops import heaps_law_curve

        # many docs sharing one word: type count at the last rung is 1
        docs = spark.createDataFrame(
            [(i, "same", "s") for i in range(40)],
            ["doc_id", "text", "source"],
        )
        rows = heaps_law_curve(docs).collect()
        assert rows[-1].n_types == 1
        assert rows[-1].n_docs == 40 and rows[-1].n_tokens == 40


class TestCharEntropyProfile:
    def test_zero_and_known_entropy(self, spark):
        """'aaaa' has zero quantized entropy (single symbol); 'ab'
        has E = 2*bitlen(2) - 2*bitlen(1) = 2 -> 10 deci-bits/char."""
        from soccerpredictor_spark.operators.textops import (
            char_entropy_profile,
        )

        docs = spark.createDataFrame(
            [(1, "aaaa", "s"), (2, "ab", "s")], ["doc_id", "text", "source"]
        )
        rows = {r.entropy_decibits: r for r in char_entropy_profile(docs).collect()}
        assert rows[0].n_docs == 1 and rows[0].total_chars == 4
        assert rows[10].n_docs == 1 and rows[10].total_chars == 2

    def test_histogram_groups_docs(self, spark):
        from soccerpredictor_spark.operators.textops import (
            char_entropy_profile,
        )

        docs = spark.createDataFrame(
            [(1, "xxxx", "s"), (2, "yyyy", "s")], ["doc_id", "text", "source"]
        )
        [r] = char_entropy_profile(docs).collect()
        assert (r.entropy_decibits, r.n_docs, r.total_chars) == (0, 2, 8)


class TestDupNgramCharFraction:
    def test_within_doc_repeat_full_coverage(self, spark):
        """'a b c d e a b c d e': the 5-gram 'a b c d e' repeats at
        positions 1 and 6, covering all 10 single-char tokens ->
        fraction exactly 1.0 at n=5; no 10-gram repeats -> 0 at
        n=10."""
        from soccerpredictor_spark.operators.textops import (
            dup_ngram_char_fraction,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e a b c d e", "s")], ["doc_id", "text", "source"]
        )
        rows = {r.gram_n: r for r in dup_ngram_char_fraction(docs).collect()}
        assert rows[5].n_docs_with_dup == 1
        assert rows[5].dup_token_chars == 10
        assert rows[5].dup_char_fraction == 1.0
        assert rows[10].n_docs_with_dup == 0
        assert rows[10].dup_token_chars == 0

    def test_cross_doc_repeats_do_not_count(self, spark):
        """The same 5-gram in two DIFFERENT docs is cross-doc
        duplication (suffix_dedup_spans' job), not within-doc
        repetition: both rungs read zero."""
        from soccerpredictor_spark.operators.textops import (
            dup_ngram_char_fraction,
        )

        docs = spark.createDataFrame(
            [
                (1, "p q r s t x y", "s"),
                (2, "p q r s t u v", "s"),
            ],
            ["doc_id", "text", "source"],
        )
        rows = {r.gram_n: r for r in dup_ngram_char_fraction(docs).collect()}
        assert rows[5].dup_token_chars == 0 and rows[10].dup_token_chars == 0
        assert rows[5].n_docs == 2

    def test_empty_corpus_keeps_spine(self, spark):
        from soccerpredictor_spark.operators.textops import (
            DUP_NGRAM_NS,
            dup_ngram_char_fraction,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        rows = dup_ngram_char_fraction(docs).collect()
        assert [r.gram_n for r in rows] == list(DUP_NGRAM_NS)
        assert all(r.dup_char_fraction is None for r in rows)


class TestNgramEntropyProfile:
    def test_constant_stream_zero_entropy(self, spark):
        """'x x x x' — one unigram type, one bigram type: both
        quantized entropies are exactly zero."""
        from soccerpredictor_spark.operators.textops import (
            ngram_entropy_profile,
        )

        docs = spark.createDataFrame(
            [(1, "x x x x", "s")], ["doc_id", "text", "source"]
        )
        [r] = ngram_entropy_profile(docs).collect()
        assert r.n_tokens == 4 and r.n_types == 1
        assert r.unigram_entropy_decibits == 0
        assert r.n_bigrams == 3 and r.n_bigram_types == 1
        assert r.bigram_cond_entropy_decibits == 0

    def test_two_symbol_stream(self, spark):
        """'a b': T=2, each count 1 -> E1 = 2*(bitlen(2)-bitlen(1))
        = 2 -> 10 deci-bits/token; single bigram -> H2 = 0."""
        from soccerpredictor_spark.operators.textops import (
            ngram_entropy_profile,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "s")], ["doc_id", "text", "source"]
        )
        [r] = ngram_entropy_profile(docs).collect()
        assert r.unigram_entropy_decibits == 10
        assert r.bigram_cond_entropy_decibits == 0

    def test_repetitive_vs_diverse_ordering(self, spark):
        """A diverse source carries strictly higher conditional
        bigram entropy than a templated one — the signal the operator
        exists to surface."""
        from soccerpredictor_spark.operators.textops import (
            ngram_entropy_profile,
        )

        docs = spark.createDataFrame(
            [
                (1, "spam ham " * 20 + "spam", "tmpl"),
                (2, "one two three four five six seven eight nine ten "
                    "eleven twelve thirteen fourteen fifteen sixteen "
                    "one three five seven nine two four six eight ten",
                 "div"),
            ],
            ["doc_id", "text", "source"],
        )
        got = {r.source: r for r in ngram_entropy_profile(docs).collect()}
        assert (
            got["div"].bigram_cond_entropy_decibits
            > got["tmpl"].bigram_cond_entropy_decibits
        )


class TestSemdedup:
    @staticmethod
    def _emb(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_exact_duplicate_dropped_once(self, spark):
        """20 near-orthogonal vectors + one exact copy of vec 3: the
        copy lands in vec 3's cluster at sim 1.0 and is dropped
        (keep-lowest-id); nothing else moves."""
        from soccerpredictor_spark.operators.similarity import semdedup

        dim = 8
        rows = []
        for i in range(20):
            v = [0.0] * dim
            v[i % dim] = 1.0 + 0.01 * (i // dim)
            rows.append((i, v, 0))
        dup = [0.0] * dim
        dup[3] = 1.0  # exact duplicate of vec 3
        rows.append((20, dup, 0))
        out = {r.cluster_id: r for r in semdedup(self._emb(spark, rows)).collect()}
        assert sum(r.n_items for r in out.values()) == 21
        assert sum(r.n_dropped for r in out.values()) >= 1
        c3 = out[3]
        assert c3.n_dropped >= 1
        assert c3.keep_rate < 1.0

    def test_orthogonal_corpus_keeps_everything(self, spark):
        from soccerpredictor_spark.operators.similarity import semdedup

        dim = 16
        rows = []
        for i in range(16):
            v = [0.0] * dim
            v[i] = 1.0
            rows.append((i, v, 0))
        out = semdedup(self._emb(spark, rows)).collect()
        assert all(r.n_dropped == 0 and r.keep_rate == 1.0 for r in out)
        assert sum(r.n_items for r in out) == 16


class TestPqMSweep:
    @staticmethod
    def _emb(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_codebook_corpus_zero_distortion_full_recall(self, spark):
        """Vectors 0..15 are scaled one-hots (the codebook rows);
        16..19 are copies of vec 0. Every vector IS a codebook row,
        so encoding distortion is exactly 0 at every m, and the ADC
        top-k matches the exact top-k (recall 1.0): copies of the
        query rank first, ties then break by vec_id identically in
        both rankings."""
        from soccerpredictor_spark.operators.similarity import (
            PQ_EMB_DIM,
            PQ_M_SWEEP,
            pq_m_sweep,
        )

        rows = []
        for i in range(16):
            v = [0.0] * PQ_EMB_DIM
            v[i] = 1.0
            rows.append((i, v, 0))
        q = [0.0] * PQ_EMB_DIM
        q[0] = 1.0
        for i in range(16, 20):
            rows.append((i, list(q), 0))
        out = pq_m_sweep(self._emb(spark, rows)).collect()
        assert [r.pq_m for r in out] == list(PQ_M_SWEEP)
        for r in out:
            assert r.total_distortion_q30 == 0
            assert r.n_exact == 10 and r.n_pq == 10
            assert r.recall == 1.0

    def test_distortion_non_increasing_in_m_on_fixtures(self, spark):
        """More subquantizers can only refine the per-subspace fit:
        on the sf0.001 embeddings the corpus distortion is
        non-increasing in m (the dial the sweep exists to read)."""
        from soccerpredictor_spark.operators.similarity import pq_m_sweep
        from soccerpredictor_spark.sources.catalog import read_table

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = pq_m_sweep(emb).collect()
        ds = [r.total_distortion_q30 for r in out]
        assert ds == sorted(ds, reverse=True)
