"""Round-16 STAGED operators — closed-form semantic unit tests.

The staged-set source of truth stays ``test_staged_round11.STAGED``
(parity + plan gates parametrize from there); this file pins the
SEMANTICS of the four round-16 staged operators: charclass_profile
(ASCII character-class census without explode), data_constrained_mix
(epoch-capped token waterfill, Muennighoff et al. 2023),
dedup_tokens_saved (per-source survivorship savings over the cached
cluster labels), embedding_integrity_audit (docs x vectors pre-flight
checks on a fixed 6-row spine).
"""

from __future__ import annotations


class TestCharclassProfile:
    def test_closed_form_counts(self, spark):
        """'ab1 !' = 2 alpha + 1 digit + 1 space + 1 punct; the empty
        doc contributes chars only to n_docs; 'xyz' is pure alpha."""
        from soccerpredictor_spark.operators.textops import charclass_profile

        docs = spark.createDataFrame(
            [
                (1, "ab1 !", "en", "s"),
                (2, "", "en", "s"),
                (3, "xyz", "fr", "s"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        rows = {r.lang: r for r in charclass_profile(docs).collect()}
        en = rows["en"]
        assert (en.n_docs, en.n_chars) == (2, 5)
        assert (en.n_alpha, en.n_digit, en.n_space, en.n_punct, en.n_other) \
            == (2, 1, 1, 1, 0)
        assert en.frac_alpha == 2 / 5 and en.frac_punct == 1 / 5
        fr = rows["fr"]
        assert (fr.n_chars, fr.n_alpha, fr.frac_alpha) == (3, 3, 1.0)

    def test_all_empty_lang_fracs_null(self, spark):
        """A language whose every text is empty divides by zero
        nowhere — fractions surface as NULL on BOTH engines."""
        from soccerpredictor_spark.operators.textops import charclass_profile

        docs = spark.createDataFrame(
            [(1, "", "de", "s")],
            "doc_id long, text string, lang string, source string",
        )
        [r] = charclass_profile(docs).collect()
        assert r.n_chars == 0 and r.frac_alpha is None and r.frac_other is None

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import charclass_profile

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string"
        )
        assert charclass_profile(docs).collect() == []


class TestDataConstrainedMix:
    @staticmethod
    def _docs(spark, tokens_per_source):
        rows = []
        for i, (src, n) in enumerate(sorted(tokens_per_source.items())):
            rows.append((i, " ".join(["w"] * n) if n else "", src))
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_scarce_source_hits_epoch_wall(self, spark):
        """tokens {a: 100, b: 10}: budget = 2x110 = 220; uniform level
        110 each, but b caps at 4x10 = 40 -> a absorbs 180 (1.8
        epochs), b trains 4.0 epochs. Sum identity holds exactly."""
        from soccerpredictor_spark.operators.textops import (
            data_constrained_mix,
        )

        rows = {r.source: r for r in
                data_constrained_mix(self._docs(spark, {"a": 100, "b": 10}))
                .collect()}
        a, b = rows["a"], rows["b"]
        assert (a.alloc_tokens, a.at_cap, a.epochs) == (180, 0, 1.8)
        assert (b.alloc_tokens, b.at_cap, b.epochs) == (40, 1, 4.0)
        assert a.alloc_tokens + b.alloc_tokens == 2 * (100 + 10)

    def test_largest_remainder_topup(self, spark):
        """tokens {a: 4, b: 5, c: 2}: budget 22, no cap binds
        (8*3 = 24 > 22), level = 22 div 3 = 7 rem 1 -> the
        lexicographically first source gets the extra token."""
        from soccerpredictor_spark.operators.textops import (
            data_constrained_mix,
        )

        rows = {r.source: r.alloc_tokens for r in
                data_constrained_mix(
                    self._docs(spark, {"a": 4, "b": 5, "c": 2})
                ).collect()}
        assert rows == {"a": 8, "b": 7, "c": 7}
        assert sum(rows.values()) == 22

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import (
            data_constrained_mix,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert data_constrained_mix(docs).collect() == []


class TestDedupTokensSaved:
    def test_cross_source_cluster_drops_higher_id(self, spark):
        """Docs 1 (src a) and 2 (src b) are EXACT duplicates -> one
        cluster keeping doc 1; doc 3 (src b) is unique. Source b
        therefore drops doc 2's tokens and keeps doc 3's."""
        from soccerpredictor_spark.operators.dedup import dedup_tokens_saved

        dup = " ".join(f"tok{i}" for i in range(12))
        uniq = " ".join(f"zzz{i}" for i in range(8))
        docs = spark.createDataFrame(
            [(1, dup, "a"), (2, dup, "b"), (3, uniq, "b")],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in dedup_tokens_saved(docs).collect()}
        a, b = rows["a"], rows["b"]
        assert (a.n_docs, a.n_kept, a.n_dropped) == (1, 1, 0)
        assert (a.tokens_total, a.tokens_dropped, a.saved_frac) == (12, 0, 0.0)
        assert (b.n_docs, b.n_kept, b.n_dropped) == (2, 1, 1)
        assert (b.tokens_total, b.tokens_kept, b.tokens_dropped) == (20, 8, 12)
        assert b.saved_frac == 12 / 20

    def test_no_duplicates_nothing_saved(self, spark):
        from soccerpredictor_spark.operators.dedup import dedup_tokens_saved

        docs = spark.createDataFrame(
            [
                (1, " ".join(f"aa{i}" for i in range(10)), "s"),
                (2, " ".join(f"bb{i}" for i in range(10)), "s"),
            ],
            "doc_id long, text string, source string",
        )
        [r] = dedup_tokens_saved(docs).collect()
        assert (r.n_kept, r.n_dropped, r.tokens_dropped) == (2, 0, 0)

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.dedup import dedup_tokens_saved
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert dedup_tokens_saved(docs).collect() == []
        clear_caches()


class TestEmbeddingIntegrityAudit:
    @staticmethod
    def _vecs(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    @staticmethod
    def _docs(spark, ids):
        return spark.createDataFrame(
            [(i,) for i in ids], "doc_id long"
        )

    def test_every_check_fires(self, spark):
        """Mode dim = 2 (two clean 2-d vectors). Doc 4 has no vector;
        vectors 5/6 have no doc; vector 3 is NULL; 5 (3-d) and 6 (1-d)
        mismatch the mode; 2 is all-zero; 6 carries a NaN."""
        from soccerpredictor_spark.operators.similarity import (
            embedding_integrity_audit,
        )

        vecs = self._vecs(
            spark,
            [
                (1, [1.0, 2.0]),
                (2, [0.0, 0.0]),
                (3, None),
                (5, [1.0, 2.0, 3.0]),
                (6, [float("nan")]),
            ],
        )
        docs = self._docs(spark, [1, 2, 3, 4])
        out = {r["check"]: r.n for r in
               embedding_integrity_audit(vecs, docs).collect()}
        assert out == {
            "missing_embedding": 1,
            "orphan_vector": 2,
            "null_embedding": 1,
            "dim_mismatch": 2,
            "zero_norm": 1,
            "non_finite": 1,
        }

    def test_mode_tie_breaks_to_smaller_dim(self, spark):
        """dims {1, 2} each once: the tie resolves to dim 1, so the
        2-d vector is the mismatch."""
        from soccerpredictor_spark.operators.similarity import (
            embedding_integrity_audit,
        )

        vecs = self._vecs(spark, [(1, [0.5]), (2, [1.0, 2.0])])
        out = {r["check"]: r.n for r in
               embedding_integrity_audit(
                   vecs, self._docs(spark, [1, 2])
               ).collect()}
        assert out["dim_mismatch"] == 1 and out["missing_embedding"] == 0

    def test_empty_inputs_keep_spine(self, spark):
        """Both tables empty -> all six checks present, all zero (the
        fixed-spine convention: alerting keys on check names)."""
        from soccerpredictor_spark.operators.similarity import (
            EMBEDDING_AUDIT_CHECKS,
            embedding_integrity_audit,
        )

        out = embedding_integrity_audit(
            self._vecs(spark, []), self._docs(spark, [])
        ).collect()
        assert [r["check"] for r in out] == sorted(EMBEDDING_AUDIT_CHECKS)
        assert all(r.n == 0 for r in out)
