"""Round-15 STAGED operators — closed-form semantic unit tests.

The staged-set source of truth stays ``test_staged_round11.STAGED``
(parity + plan gates parametrize from there); this file pins the
SEMANTICS of the four round-15 staged operators with closed-form
fixtures: quality_calibration_bins (CCNet buckets x Gopher rules),
contamination_matrix (cross-source n-gram leakage grid),
neardup_edit_confirm (banded-Levenshtein second stage over LSH
candidates), semdedup_threshold_sweep (removal-rate-vs-threshold
dial sharing semdedup's cached assignment).
"""

from __future__ import annotations


class TestQualityCalibrationBins:
    @staticmethod
    def _docs(spark):
        # 3 "good" docs: >= 10 words, mean word length in [3, 10],
        # >= 2 distinct Gopher stopwords, all-alpha words, no symbols.
        # 3 "bad" docs: 3 words (< GOPHER_MIN_WORDS) but still >= 2
        # tokens, so they carry bigram evidence and enter the buckets.
        good = "the quick brown fox and the lazy dog jump over fences daily"
        rows = []
        for i in range(3):
            rows.append((i, good, "en", "s"))
        for i in range(3, 6):
            rows.append((i, "tiny bad doc", "en", "s"))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )

    def test_totals_and_pass_counts(self, spark):
        from soccerpredictor_spark.operators.textops import (
            quality_calibration_bins,
        )

        rows = quality_calibration_bins(self._docs(spark)).collect()
        assert sum(r.n_docs for r in rows) == 6
        assert sum(r.n_gopher_pass for r in rows) == 3
        for r in rows:
            assert r.lang == "en"
            assert 0 <= r.n_gopher_pass <= r.n_docs
            assert r.pass_rate == r.n_gopher_pass / r.n_docs

    def test_empty_corpus_empty_output(self, spark):
        """Buckets are data-driven (tercile edges need data), so the
        empty corpus yields an empty table, matching ccnet_buckets."""
        from soccerpredictor_spark.operators.textops import (
            quality_calibration_bins,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string"
        )
        assert quality_calibration_bins(docs).collect() == []


class TestContaminationMatrix:
    @staticmethod
    def _df(spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_shared_gram_lights_both_directions(self, spark):
        """Docs 1 (src a) and 2 (src b) share one 5-gram; doc 3
        (src a) is disjoint. Off-diagonal cells light up exactly once
        in each direction; diagonals stay dark."""
        from soccerpredictor_spark.operators.textops import (
            contamination_matrix,
        )

        shared = "alpha beta gamma delta epsilon"
        rows = [
            (1, shared + " zeta eta", "a"),
            (2, "theta iota " + shared, "b"),
            (3, "kappa lam mu nu xi omicron pi rho", "a"),
        ]
        out = {
            (r.eval_source, r.train_source): r
            for r in contamination_matrix(self._df(spark, rows)).collect()
        }
        assert len(out) == 4
        assert out[("a", "b")].n_contaminated == 1
        assert out[("b", "a")].n_contaminated == 1
        assert out[("a", "a")].n_contaminated == 0
        assert out[("b", "b")].n_contaminated == 0
        assert out[("a", "b")].n_eval_docs == 2
        assert out[("b", "a")].n_eval_docs == 1
        assert out[("a", "b")].contamination_rate == 0.5
        assert out[("b", "a")].contamination_rate == 1.0

    def test_df_cap_drops_boilerplate_gram(self, spark):
        """A 5-gram in 25 documents exceeds CONTAM_MATRIX_MAX_DF=20:
        boilerplate, not contamination — the whole grid stays zero."""
        from soccerpredictor_spark.operators.textops import (
            CONTAM_MATRIX_MAX_DF,
            contamination_matrix,
        )

        boiler = "click here to read more"
        rows = [
            (i, boiler + f" unique{i} tail{i}", "a" if i % 2 else "b")
            for i in range(CONTAM_MATRIX_MAX_DF + 5)
        ]
        out = contamination_matrix(self._df(spark, rows)).collect()
        assert len(out) == 4
        assert all(r.n_contaminated == 0 for r in out)

    def test_diagonal_reads_within_source_leakage(self, spark):
        from soccerpredictor_spark.operators.textops import (
            contamination_matrix,
        )

        shared = "one two three four five"
        rows = [
            (1, shared + " six", "s"),
            (2, shared + " seven", "s"),
        ]
        out = contamination_matrix(self._df(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.eval_source, r.train_source) == ("s", "s")
        assert r.n_contaminated == 2 and r.contamination_rate == 1.0

    def test_empty_corpus_empty_grid(self, spark):
        from soccerpredictor_spark.operators.textops import (
            contamination_matrix,
        )

        assert contamination_matrix(self._df(spark, [])).collect() == []


class TestNeardupEditConfirm:
    @staticmethod
    def _df(spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_one_word_edit_confirmed(self, spark):
        """Two 24-word docs differing in ONE word: the LSH stage
        emits the candidate, and the character edit distance is far
        under 20% of the length — confirmed."""
        from soccerpredictor_spark.operators.dedup import (
            neardup_edit_confirm,
        )

        base = [f"tok{i:02d}" for i in range(24)]
        other = list(base)
        other[12] = "zzzzz"
        rows = [(1, " ".join(base)), (2, " ".join(other))]
        out = neardup_edit_confirm(self._df(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.doc_a, r.doc_b) == (1, 2)
        assert 0 < r.edit_distance <= 5
        assert r.confirmed == 1

    def test_block_swap_rejected_beyond_cap(self, spark):
        """Doc Y is doc X with its two ~360-char halves swapped: the
        shingle SETS nearly coincide (high Jaccard -> LSH candidate)
        but the SEQUENCE is maximally displaced — the banded DP
        overflows EDIT_CONFIRM_CAP, reports the -1 sentinel, and the
        pair is rejected. Exactly the failure mode a set-based first
        stage cannot see."""
        from soccerpredictor_spark.operators.dedup import (
            neardup_edit_confirm,
        )

        half_a = [f"aaa{i:02d}" for i in range(60)]
        half_b = [f"bbb{i:02d}" for i in range(60)]
        rows = [
            (1, " ".join(half_a + half_b)),
            (2, " ".join(half_b + half_a)),
        ]
        out = neardup_edit_confirm(self._df(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.jaccard > 0.8
        assert r.edit_distance == -1
        assert r.confirmed == 0

    def test_empty_corpus_no_pairs(self, spark):
        from soccerpredictor_spark.operators.dedup import (
            neardup_edit_confirm,
        )

        assert neardup_edit_confirm(self._df(spark, [])).collect() == []


class TestSemdedupThresholdSweep:
    @staticmethod
    def _emb(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_exact_dup_dropped_at_every_rung(self, spark):
        """16 orthogonal one-hots + one exact copy of vec 3: the copy
        is the only vector with an incriminating neighbor (cosine
        1.0), so every rung drops exactly it; orthogonal pairs score
        0 and never drop."""
        from soccerpredictor_spark.operators.similarity import (
            SEMDEDUP_SWEEP,
            semdedup_threshold_sweep,
        )

        dim = 16
        rows = []
        for i in range(16):
            v = [0.0] * dim
            v[i] = 1.0
            rows.append((i, v, 0))
        dup = [0.0] * dim
        dup[3] = 1.0
        rows.append((16, dup, 0))
        out = semdedup_threshold_sweep(self._emb(spark, rows)).collect()
        assert [r.threshold for r in out] == [float(t) for t in SEMDEDUP_SWEEP]
        for r in out:
            assert r.n_items == 17
            assert r.n_dropped == 1
            assert r.drop_rate == 1 / 17

    def test_monotone_non_increasing_on_fixtures(self, spark):
        from soccerpredictor_spark.operators.similarity import (
            semdedup_threshold_sweep,
        )
        from soccerpredictor_spark.sources.catalog import read_table

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = semdedup_threshold_sweep(emb).collect()
        drops = [r.n_dropped for r in out]
        assert drops == sorted(drops, reverse=True)

    def test_empty_corpus_keeps_spine(self, spark):
        from soccerpredictor_spark.operators.similarity import (
            SEMDEDUP_SWEEP,
            semdedup_threshold_sweep,
        )

        emb = self._emb(spark, [])
        rows = semdedup_threshold_sweep(emb).collect()
        assert len(rows) == len(SEMDEDUP_SWEEP)
        assert all(r.n_items == 0 and r.n_dropped == 0 for r in rows)
        assert all(r.drop_rate is None for r in rows)
