"""Closed-form semantic tests for the round-17 staged batch (staged
during round 16; parity + plan-purity + empty-input gates run through
the shared harness in test_staged_round11.py):

- domain_blocklist_filter: broadcast-blocklist domain audit
- script_lang_consistency: charclass x lang agreement grid
- dedup_keep_best: quality-aware (longest-doc) dedup survivor rule
- embedding_eval_contamination: per-eval-vector dense contamination
"""

from __future__ import annotations


class TestDomainBlocklistFilter:
    def test_hit_and_miss_domains(self, spark):
        """doc 0 (src3, %3=0 -> .com) lands on blocked src3.com; doc 1
        (src3, %3=1 -> .org) lands on clean src3.org; doc 2 (src7,
        %3=2 -> .net) lands on blocked src7.net. Counts and token sums
        are per registrable domain regardless of subdomain."""
        from soccerpredictor_spark.operators.textops import (
            domain_blocklist_filter,
        )

        docs = spark.createDataFrame(
            [
                (0, "a b c", "src3"),     # cdn.src3.com  -> src3.com
                (1, "d e", "src3"),       # www.src3.org  -> src3.org
                (2, "f", "src7"),         # src7.net      -> src7.net
                (12, "g h i j", "src3"),  # cdn.src3.com  -> src3.com
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.domain: r for r in domain_blocklist_filter(docs).collect()}
        assert set(rows) == {"src3.com", "src3.org", "src7.net"}
        assert rows["src3.com"].blocked and rows["src7.net"].blocked
        assert not rows["src3.org"].blocked
        assert (rows["src3.com"].n_docs, rows["src3.com"].n_tokens) == (2, 7)
        assert (rows["src3.org"].n_docs, rows["src3.org"].n_tokens) == (1, 2)
        assert (rows["src7.net"].n_docs, rows["src7.net"].n_tokens) == (1, 1)

    def test_subdomains_collapse_to_registrable_domain(self, spark):
        """doc_ids 0/1/2/3 of one source and tld cycle through all
        four subdomain variants but 0 and 12 share (.com) while 3/15
        share m. + .com — the domain regex strips every subdomain."""
        from soccerpredictor_spark.operators.textops import (
            domain_blocklist_filter,
        )

        docs = spark.createDataFrame(
            [(0, "x", "s"), (12, "x", "s"), (3, "x", "s"), (15, "x", "s")],
            "doc_id long, text string, source string",
        )
        rows = domain_blocklist_filter(docs).collect()
        assert [(r.domain, r.n_docs) for r in rows] == [("s.com", 4)]
        assert not rows[0].blocked

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import (
            domain_blocklist_filter,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert domain_blocklist_filter(docs).collect() == []


class TestScriptLangConsistency:
    def test_bins_shares_and_modal(self, spark):
        """en: 'abcde' and 'ab1de' both bin 4 (25//5, 20//5), 'a1111'
        bin 1 -> shares 2/3 @ bin4 (modal), 1/3 @ bin1, zero-filled
        elsewhere. zh: all non-ASCII -> bin 0, share 1.0, modal."""
        from soccerpredictor_spark.operators.textops import (
            script_lang_consistency,
        )

        docs = spark.createDataFrame(
            [
                (1, "abcde", "en"),
                (2, "ab1de", "en"),
                (3, "a1111", "en"),
                (4, "你好世界", "zh"),
            ],
            "doc_id long, text string, lang string",
        )
        rows = script_lang_consistency(docs).collect()
        grid = {(r.lang, r.alpha_bin): r for r in rows}
        assert len(rows) == 10  # 2 langs x 5 bins, every cell present
        assert grid[("en", 4)].n_docs == 2 and grid[("en", 4)].is_modal
        assert grid[("en", 4)].share == 2 / 3
        assert grid[("en", 1)].n_docs == 1 and not grid[("en", 1)].is_modal
        assert grid[("en", 0)].n_docs == 0 and grid[("en", 0)].share == 0.0
        assert grid[("zh", 0)].n_docs == 1 and grid[("zh", 0)].is_modal
        assert grid[("zh", 0)].share == 1.0

    def test_modal_tie_breaks_to_smaller_bin(self, spark):
        """One doc in bin 0 and one in bin 4: the tie resolves to the
        smaller bin (deterministic on both engines)."""
        from soccerpredictor_spark.operators.textops import (
            script_lang_consistency,
        )

        docs = spark.createDataFrame(
            [(1, "11111", "fr"), (2, "aaaaa", "fr")],
            "doc_id long, text string, lang string",
        )
        modal = [
            r.alpha_bin
            for r in script_lang_consistency(docs).collect()
            if r.is_modal
        ]
        assert modal == [0]

    def test_empty_text_excluded(self, spark):
        """An empty document carries no character evidence: it joins
        no bin and does not create its language's spine."""
        from soccerpredictor_spark.operators.textops import (
            script_lang_consistency,
        )

        docs = spark.createDataFrame(
            [(1, "", "de"), (2, "abc", "en")],
            "doc_id long, text string, lang string",
        )
        rows = script_lang_consistency(docs).collect()
        assert {r.lang for r in rows} == {"en"}
        assert sum(r.n_docs for r in rows) == 1

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import (
            script_lang_consistency,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, lang string"
        )
        assert script_lang_consistency(docs).collect() == []


class TestDedupKeepBest:
    def test_longest_doc_wins_cluster(self, spark):
        """Docs 1 (12 tokens, src a) and 2 (15 tokens = doc 1 + 3
        extra, src b) near-duplicate (shingle jaccard 10/13); doc 3
        (src a) unique. keep-min-id keeps doc 1; keep-best keeps doc
        2 — the survivor MOVES from source a to source b and b gains
        doc 2's 15 tokens."""
        from soccerpredictor_spark.operators.dedup import dedup_keep_best
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        base = " ".join(f"tok{i}" for i in range(12))
        docs = spark.createDataFrame(
            [
                (1, base, "a"),
                (2, base + " xa xb xc", "b"),
                (3, " ".join(f"zzz{i}" for i in range(8)), "a"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in dedup_keep_best(docs).collect()}
        a, b = rows["a"], rows["b"]
        assert (a.n_docs, a.n_kept_minid, a.n_kept_best) == (2, 2, 1)
        assert (a.tokens_kept_minid, a.tokens_kept_best) == (20, 8)
        assert a.tokens_gained == -12
        assert (b.n_docs, b.n_kept_minid, b.n_kept_best) == (1, 0, 1)
        assert (b.tokens_kept_minid, b.tokens_kept_best) == (0, 15)
        assert b.tokens_gained == 15
        # one survivor per cluster under BOTH rules
        assert a.n_kept_minid + b.n_kept_minid == a.n_kept_best + b.n_kept_best
        clear_caches()

    def test_token_tie_breaks_to_min_id(self, spark):
        """Exact duplicates have equal token counts: keep-best
        degenerates to keep-min-id (doc_id ASC tie-break)."""
        from soccerpredictor_spark.operators.dedup import dedup_keep_best
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        dup = " ".join(f"tok{i}" for i in range(12))
        docs = spark.createDataFrame(
            [(10, dup, "s"), (11, dup, "s")],
            "doc_id long, text string, source string",
        )
        [r] = dedup_keep_best(docs).collect()
        assert (r.n_kept_minid, r.n_kept_best) == (1, 1)
        assert r.tokens_kept_best == r.tokens_kept_minid == 12
        assert r.tokens_gained == 0
        clear_caches()

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.dedup import dedup_keep_best
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert dedup_keep_best(docs).collect() == []
        clear_caches()


class TestEmbeddingEvalContamination:
    # kv: md5 split buckets (verified in-test below): 4/18/27 are the
    # only eval ids (bucket 4) among the ids used here.
    EVALS = (4, 18, 27)

    @staticmethod
    def _bucket(i: int) -> int:
        import hashlib

        return int(hashlib.md5(f"kv:{i}".encode()).hexdigest()[:8], 16) % 5

    def test_split_constants_still_hold(self):
        assert [i for i in range(30) if self._bucket(i) == 4] == [4, 18, 27]

    def test_nearest_train_and_clean_spine(self, spark):
        """Eval vec 4 duplicates train vecs 0 AND 1 (identical
        vectors -> certain LSH collision, equal sim): nearest ties
        break to the smaller train_id (0). Evals 18/27 duplicate only
        EACH OTHER — an eval-eval pair is not contamination, so both
        appear on the spine clean."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.similarity import (
            embedding_eval_contamination,
        )

        clear_caches()

        def v(axis):
            e = [0.0] * 64
            e[axis] = 1.0
            return e

        emb = spark.createDataFrame(
            [
                (0, v(0), 0),
                (1, v(0), 0),
                (4, v(0), 0),
                (18, v(7), 1),
                (27, v(7), 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        rows = {r.vec_id: r for r in
                embedding_eval_contamination(emb).collect()}
        assert set(rows) == set(self.EVALS)
        r4 = rows[4]
        assert r4.contaminated and r4.n_train_neighbors == 2
        assert r4.nearest_train_id == 0
        assert r4.max_train_sim > 0.999
        for vid in (18, 27):
            r = rows[vid]
            assert not r.contaminated
            assert r.n_train_neighbors == 0
            assert r.max_train_sim is None and r.nearest_train_id is None
        clear_caches()

    def test_empty_embeddings_empty_output(self, spark):
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.similarity import (
            embedding_eval_contamination,
        )

        clear_caches()
        emb = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        assert embedding_eval_contamination(emb).collect() == []
        clear_caches()


# ---- second staging session of round 16 ---------------------------------


class TestKAnonymityAudit:
    def test_class_profile_rungs(self, spark):
        """Classes: (en,a,0) x3, (en,b,0) x1, (fr,a,1) x2. k=2 flags
        only the singleton; k=5 and k=10 flag everything."""
        from soccerpredictor_spark.operators.quality import k_anonymity_audit

        docs = spark.createDataFrame(
            [
                (1, "en", "a", 10), (2, "en", "a", 20), (3, "en", "a", 30),
                (4, "en", "b", 10),
                (5, "fr", "a", 100), (6, "fr", "a", 120),
            ],
            "doc_id long, lang string, source string, n_chars long",
        )
        rows = {r.k: r for r in k_anonymity_audit(docs).collect()}
        assert sorted(rows) == [2, 5, 10]
        r2 = rows[2]
        assert (r2.n_classes, r2.n_classes_below_k) == (3, 1)
        assert (r2.n_docs, r2.n_docs_at_risk) == (6, 1)
        assert r2.at_risk_frac == 1 / 6
        for k in (5, 10):
            r = rows[k]
            assert (r.n_classes_below_k, r.n_docs_at_risk) == (3, 6)
            assert r.at_risk_frac == 1.0

    def test_length_bucket_boundary(self, spark):
        """n_chars 63 and 64 land in different buckets (64-wide
        integer division), so same (lang, source) still splits."""
        from soccerpredictor_spark.operators.quality import k_anonymity_audit

        docs = spark.createDataFrame(
            [(1, "en", "a", 63), (2, "en", "a", 64)],
            "doc_id long, lang string, source string, n_chars long",
        )
        r2 = {r.k: r for r in k_anonymity_audit(docs).collect()}[2]
        assert (r2.n_classes, r2.n_classes_below_k) == (2, 2)

    def test_empty_corpus_keeps_rung_spine(self, spark):
        from soccerpredictor_spark.operators.quality import (
            K_ANON_RUNGS,
            k_anonymity_audit,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, lang string, source string, n_chars long"
        )
        rows = k_anonymity_audit(docs).collect()
        assert [r.k for r in rows] == list(K_ANON_RUNGS)
        assert all(
            (r.n_classes, r.n_docs, r.at_risk_frac) == (0, 0, None)
            for r in rows
        )


class TestDedupQualityShift:
    def test_dropped_side_accounted(self, spark):
        """Docs 1 (passes Gopher) and 2 (passes, longer) are
        near-dups -> keep-min-id keeps 1, drops 2; doc 3 fails the
        word-count rule and is kept (unique). kept = {1, 3}: pass
        rate 1/2, tokens 20; dropped = {2}: pass rate 1, tokens 15."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import (
            dedup_quality_shift,
        )

        clear_caches()
        base = "the be " + " ".join(f"tok{i}" for i in range(10))  # 12 words
        docs = spark.createDataFrame(
            [
                (1, base, "a"),
                (2, base + " xa xb xc", "b"),          # 15 words, near-dup
                (3, " ".join(f"zz{i}" for i in range(8)), "a"),  # f_wc fails
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.status: r for r in dedup_quality_shift(docs).collect()}
        k, d = rows["kept"], rows["dropped"]
        assert (k.n_docs, k.n_gopher_pass, k.tokens_total) == (2, 1, 20)
        assert k.pass_rate == 0.5 and k.mean_tokens == 10.0
        assert (d.n_docs, d.n_gopher_pass, d.tokens_total) == (1, 1, 15)
        assert d.pass_rate == 1.0 and d.mean_tokens == 15.0
        clear_caches()

    def test_empty_corpus_keeps_status_spine(self, spark):
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import (
            dedup_quality_shift,
        )

        clear_caches()
        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        rows = dedup_quality_shift(docs).collect()
        assert [r.status for r in rows] == ["dropped", "kept"]
        assert all(
            (r.n_docs, r.pass_rate, r.mean_tokens) == (0, None, None)
            for r in rows
        )
        clear_caches()


class TestSourceSignatureTerms:
    def test_lift_rank_and_exclusions(self, spark):
        """A = aaa x3 aab x3 ccc x3, B = bbb x3 ccc x3. aaa/aab tie at
        lift 5/3 (term ASC tie-break); ccc is excluded from A (lift
        5/6 < 1) but included for B (lift 5/4 > 1); bbb leads B at
        lift 5/2."""
        from soccerpredictor_spark.operators.textops import (
            source_signature_terms,
        )

        docs = spark.createDataFrame(
            [
                (1, "aaa aaa aaa aab aab aab ccc ccc ccc", "A"),
                (2, "bbb bbb bbb ccc ccc ccc", "B"),
            ],
            "doc_id long, text string, source string",
        )
        rows = [
            (r.source, r.rank, r.term, r.tf_source, r.tf_corpus, r.lift)
            for r in source_signature_terms(docs).collect()
        ]
        assert rows == [
            ("A", 1, "aaa", 3, 3, (3 / 9) / (3 / 15)),
            ("A", 2, "aab", 3, 3, (3 / 9) / (3 / 15)),
            ("B", 1, "bbb", 3, 3, (3 / 6) / (3 / 15)),
            ("B", 2, "ccc", 3, 6, (3 / 6) / (6 / 15)),
        ]

    def test_min_tf_gate(self, spark):
        """A source-unique term with tf 2 < SIG_MIN_TF never
        qualifies, however large its lift."""
        from soccerpredictor_spark.operators.textops import (
            source_signature_terms,
        )

        docs = spark.createDataFrame(
            [(1, "rare rare fill fill fill", "A"),
             (2, "fill fill fill", "B")],
            "doc_id long, text string, source string",
        )
        terms = {r.term for r in source_signature_terms(docs).collect()}
        assert "rare" not in terms

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import (
            source_signature_terms,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert source_signature_terms(docs).collect() == []


class TestSplitBalanceAudit:
    def test_per_label_composition(self, spark):
        """ids 0..29: eval bucket hits exactly {4, 18, 27} (pinned in
        TestEmbeddingEvalContamination). label 0 = ids 0..9 -> 1/10
        eval; label 1 = ids 10..29 -> 2/20 eval."""
        from soccerpredictor_spark.operators.similarity import (
            split_balance_audit,
        )

        emb = spark.createDataFrame(
            [(i, [0.0] * 64, 0 if i < 10 else 1) for i in range(30)],
            "vec_id long, embedding array<float>, label int",
        )
        rows = {r.label: r for r in split_balance_audit(emb).collect()}
        assert (rows[0].n_total, rows[0].n_eval) == (10, 1)
        assert (rows[1].n_total, rows[1].n_eval) == (20, 2)
        for lbl in (0, 1):
            assert rows[lbl].eval_frac == 0.1
            assert abs(rows[lbl].dev_from_expected + 0.1) < 1e-12

    def test_empty_embeddings_empty_output(self, spark):
        from soccerpredictor_spark.operators.similarity import (
            split_balance_audit,
        )

        emb = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        assert split_balance_audit(emb).collect() == []


# ---- third staging session of round 16 -----------------------------------


class TestMarkupDensityAudit:
    DIV = ' <div class="ad">subscribe now</div>'
    BR = " <br>"

    def test_synth_hit_and_miss(self, spark):
        """doc 9 (%9) gains the div block (2 tags), doc 17 (%17) the
        lone <br> (1 tag), doc 1 stays clean — counts and tag-char
        mass computed from the literal synthesis strings."""
        from soccerpredictor_spark.operators.textops import (
            markup_density_audit,
        )

        docs = spark.createDataFrame(
            [(9, "hello", "a"), (1, "x", "a"), (17, "yy", "b")],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in markup_density_audit(docs).collect()}
        a, b = rows["a"], rows["b"]
        assert (a.n_docs, a.n_docs_with_markup) == (2, 1)
        assert a.n_chars == len("hello") + len(self.DIV) + len("x")
        assert a.tag_chars == len('<div class="ad">') + len("</div>")
        assert a.tag_char_fraction == a.tag_chars / a.n_chars
        assert (b.n_docs, b.n_docs_with_markup) == (1, 1)
        assert b.tag_chars == len("<br>")
        assert b.n_chars == len("yy") + len(self.BR)

    def test_clean_corpus_zero_fractions(self, spark):
        from soccerpredictor_spark.operators.textops import (
            markup_density_audit,
        )

        docs = spark.createDataFrame(
            [(1, "plain words only", "s")],
            "doc_id long, text string, source string",
        )
        [r] = markup_density_audit(docs).collect()
        assert (r.n_docs_with_markup, r.tag_chars) == (0, 0)
        assert r.tag_char_fraction == 0.0

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import (
            markup_density_audit,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert markup_density_audit(docs).collect() == []


class TestPiiQualityCrosstab:
    PASS = "the be " + " ".join(f"tok{i}" for i in range(10))  # 12 words
    FAIL = "zz zz"  # 2 words -> f_wc

    def test_all_four_cells(self, spark):
        """ids 7 (email synth) and 13 (SSN synth) carry PII; the PASS
        text clears every Gopher rule, FAIL trips word count — one
        doc per cell, shares 1/4 each."""
        from soccerpredictor_spark.operators.textops import (
            pii_quality_crosstab,
        )

        docs = spark.createDataFrame(
            [(7, self.PASS, "s"), (1, self.PASS, "s"), (2, self.FAIL, "s"),
             (13, self.FAIL, "s")],
            "doc_id long, text string, source string",
        )
        rows = {(r.has_pii, r.gopher_pass): r
                for r in pii_quality_crosstab(docs).collect()}
        assert len(rows) == 4
        for cell in rows.values():
            assert cell.n_docs == 1 and cell.share == 0.25
        assert rows[(True, True)].n_tokens == 12
        assert rows[(True, False)].n_tokens == 2

    def test_empty_corpus_keeps_spine(self, spark):
        from soccerpredictor_spark.operators.textops import (
            pii_quality_crosstab,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        rows = pii_quality_crosstab(docs).collect()
        assert [(r.has_pii, r.gopher_pass) for r in rows] == [
            (False, False), (False, True), (True, False), (True, True)
        ]
        assert all((r.n_docs, r.share) == (0, None) for r in rows)


class TestBlocklistCoverageSweep:
    def test_cumulative_and_flat_tail(self, spark):
        """Hits: doc 0 -> src3.com (rung 1, 2 tokens), doc 2 ->
        src7.net (rung 2, 3 tokens), doc 4 -> src11.org (rung 3,
        1 token); doc 1 is never blocked. The curve is cumulative and
        the miss entry (rung 4) adds nothing."""
        from soccerpredictor_spark.operators.textops import (
            blocklist_coverage_sweep,
        )

        docs = spark.createDataFrame(
            [(0, "a b", "src3"), (1, "c", "src3"),
             (2, "d e f", "src7"), (4, "g", "src11")],
            "doc_id long, text string, source string",
        )
        rows = {r.rung: r for r in blocklist_coverage_sweep(docs).collect()}
        assert [rows[k].n_docs_dropped for k in (1, 2, 3, 4)] == [1, 2, 3, 3]
        assert [rows[k].n_tokens_dropped for k in (1, 2, 3, 4)] == [2, 5, 6, 6]
        assert rows[4].added_domain == "tracking-farm.net"
        assert rows[3].drop_doc_frac == 3 / 4

    def test_empty_corpus_keeps_rungs(self, spark):
        from soccerpredictor_spark.operators.textops import (
            DOMAIN_BLOCKLIST,
            blocklist_coverage_sweep,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        rows = blocklist_coverage_sweep(docs).collect()
        assert [r.added_domain for r in rows] == list(DOMAIN_BLOCKLIST)
        assert all(
            (r.n_docs_dropped, r.drop_doc_frac) == (0, None) for r in rows
        )


class TestDecontaminationLossReport:
    def test_span_loss_accounting(self, spark):
        """Train doc 2 shares a full 13-gram with bench doc 1
        (source src0): 13 of its 15 tokens are contaminated; doc 3
        is clean. Bench docs report zero loss in their own source."""
        from soccerpredictor_spark.operators.textops import (
            decontamination_loss_report,
        )

        common = " ".join(f"w{i}" for i in range(13))
        docs = spark.createDataFrame(
            [
                (1, common, "src0"),
                (2, common + " extra1 extra2", "a"),
                (3, "u0 u1 u2 u3 u4", "a"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in
                decontamination_loss_report(docs).collect()}
        a, bench = rows["a"], rows["src0"]
        assert (a.n_docs, a.n_contaminated) == (2, 1)
        assert (a.tokens_total, a.contam_tokens) == (20, 13)
        assert a.contam_doc_frac == 0.5
        assert a.contam_token_frac == 13 / 20
        assert (bench.n_contaminated, bench.contam_tokens) == (0, 0)

    def test_clean_corpus_zero_loss(self, spark):
        from soccerpredictor_spark.operators.textops import (
            decontamination_loss_report,
        )

        docs = spark.createDataFrame(
            [(1, " ".join(f"a{i}" for i in range(14)), "src0"),
             (2, " ".join(f"b{i}" for i in range(14)), "t")],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in
                decontamination_loss_report(docs).collect()}
        assert all(r.n_contaminated == 0 for r in rows.values())

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import (
            decontamination_loss_report,
        )

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert decontamination_loss_report(docs).collect() == []


# ---- fourth staging session of round 16 ----------------------------------


class TestMixturePolicyCompare:
    def test_policy_shares_and_spread(self, spark):
        """A = 3 docs, B = 1 doc (uniform 4-token texts, disjoint
        vocab). Budget (300) exceeds the corpus, so the capped policy
        degenerates to natural doc shares (0.75/0.25); temperature
        T=1/2 gives sqrt(3):(sqrt(3)+1); every policy's shares sum to
        ~1 and spread is exactly max-min of the three."""
        import math

        from soccerpredictor_spark.operators.textops import (
            mixture_policy_compare,
        )

        def doc(i, pre):
            return (i, " ".join(f"{pre}{i}x{j}" for j in range(4)),
                    "a" if pre == "a" else "b")

        docs = spark.createDataFrame(
            [doc(1, "a"), doc(2, "a"), doc(3, "a"), doc(4, "b")],
            "doc_id long, text string, source string",
        )
        rows = {r.source: r for r in mixture_policy_compare(docs).collect()}
        a, b = rows["a"], rows["b"]
        assert a.share_capped == 0.75 and b.share_capped == 0.25
        s3 = math.sqrt(3.0)
        assert abs(a.share_temperature - s3 / (s3 + 1.0)) < 1e-15
        assert a.share_baseline_tokens == 0.75
        for r in (a, b):
            hi = max(r.share_capped, r.share_temperature, r.share_doremi)
            lo = min(r.share_capped, r.share_temperature, r.share_doremi)
            assert r.spread == hi - lo and r.spread >= 0.0
        assert abs(a.share_doremi + b.share_doremi - 1.0) < 1e-4

    def test_single_source_degenerate(self, spark):
        """One source: every policy gives share 1 and spread 0."""
        from soccerpredictor_spark.operators.textops import (
            mixture_policy_compare,
        )

        docs = spark.createDataFrame(
            [(1, "t0 t1 t2 t3", "s"), (2, "t4 t5 t6 t7", "s")],
            "doc_id long, text string, source string",
        )
        [r] = mixture_policy_compare(docs).collect()
        assert r.share_capped == 1.0 and r.share_temperature == 1.0
        assert abs(r.share_doremi - 1.0) < 1e-4
        assert r.spread < 1e-4


class TestSpanCutPlan:
    def test_three_actions(self, spark):
        """Train doc 2 keeps exactly GOPHER_MIN_WORDS tokens after
        the cut (boundary -> cut_spans); doc 3 keeps 2 (-> drop_doc);
        doc 4 and the benchmark doc are intact."""
        from soccerpredictor_spark.operators.textops import span_cut_plan

        common = " ".join(f"w{i}" for i in range(13))
        docs = spark.createDataFrame(
            [
                (1, common, "src0"),
                (2, common + " " + " ".join(f"e{i}" for i in range(10)), "a"),
                (3, common + " x y", "a"),
                (4, "u0 u1 u2", "a"),
            ],
            "doc_id long, text string, source string",
        )
        rows = {r.doc_id: r for r in span_cut_plan(docs).collect()}
        assert len(rows) == 4
        assert rows[1].action == "keep_intact"
        assert (rows[2].contam_tokens, rows[2].tokens_after) == (13, 10)
        assert rows[2].action == "cut_spans"
        assert (rows[3].tokens_after, rows[3].action) == (2, "drop_doc")
        assert rows[4].action == "keep_intact"

    def test_empty_corpus_empty_output(self, spark):
        from soccerpredictor_spark.operators.textops import span_cut_plan

        docs = spark.createDataFrame(
            [], "doc_id long, text string, source string"
        )
        assert span_cut_plan(docs).collect() == []
