"""Closed-form semantic tests for the round-19 staged batch (staged
during round 18; parity + plan-purity + empty-input gates run through
the shared harness in test_staged_round11.py):

- robots_rule_marginal_sweep: raw vs marginal (first-match) coverage
  of an overlapping deny ladder, with the shadowed-rule readout
- ann_recall_k_sweep: recall-vs-k curve of the single-band LSH ANN
  index over the 4-probe set, against the exact top-k
- curate_corpus: the end-to-end curation capstone funnel (robots ->
  blocklist -> gopher -> keep-best survivorship -> span cuts ->
  uniform source token quota)
- curate_corpus_write: the materialization half — write the curated
  survivors to source-partitioned parquet, report the shipped
  composition from the READ-BACK (the write_roundtrip convention)
- curate_funnel_by_source: the per-source attribution form of the
  funnel (which source loses mass at which gate), riding the shared
  checkpointed per-source stage table

Feasibility note recorded at staging time: ``code_switch_matrix``
(within-doc language-mixing census over LANG_MARKERS pairs) was
surveyed and REJECTED — every (lang_a, lang_b) both-markers doc count
is 0 at sf0.001 AND sf0.01 (the synthetic docs are monolingual in
marker space), so the operator would be a degenerate all-zero table
on these fixtures (the line/sentence-dedup precedent).
"""

from __future__ import annotations

import math

import pytest


SF_DIR = "/root/testdata/sf0.001"


def _doc(doc_id: int, text: str, source: str, lang: str = "en"):
    return (doc_id, text, lang, source, len(text))


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


class TestRobotsRuleMarginalSweep:
    def test_shadowing_and_cumulative(self, spark):
        """Path synthesis: doc_id%8 walks ROBOTS_SECTIONS, so id 1
        and 9 land on /admin (id 1 with source src1 also under
        /admin/src1), id 4 on /search, id 5 on /tag, id 0 stays
        clean. The ladder's nested rules must show raw mass but zero
        marginal (fully shadowed); the miss rule shows NULL."""
        from soccerpredictor_spark.operators.textops import (
            robots_rule_marginal_sweep,
        )

        docs = spark.createDataFrame(
            [
                _doc(0, "a b c", "src1"),      # /articles -> allowed
                _doc(1, "d e f", "src1"),      # /admin/src1/...
                _doc(9, "g h i", "other"),     # /admin/other/...
                _doc(4, "j k l", "src1"),      # /search/...
                _doc(5, "m n o", "src1"),      # /tag/...
            ],
            DOC_SCHEMA,
        )
        rows = {r.rule: r for r in robots_rule_marginal_sweep(docs).collect()}
        assert set(rows) == {
            "/admin", "/admin/src1", "/s", "/search", "/tag", "/checkout"
        }
        adm = rows["/admin"]
        assert (adm.n_match_raw, adm.n_docs_marginal, adm.n_docs_cum) == (
            2, 2, 2,
        )
        assert adm.n_tokens_marginal == 6 and adm.shadowed_frac == 0.0
        nested = rows["/admin/src1"]
        assert (nested.n_match_raw, nested.n_docs_marginal) == (1, 0)
        assert nested.shadowed_frac == 1.0  # fully shadowed by /admin
        assert nested.n_docs_cum == 2  # cumulative unchanged
        s = rows["/s"]
        assert (s.n_match_raw, s.n_docs_marginal, s.n_docs_cum) == (1, 1, 3)
        sea = rows["/search"]
        assert (sea.n_match_raw, sea.n_docs_marginal) == (1, 0)
        assert sea.shadowed_frac == 1.0  # fully shadowed by /s
        tag = rows["/tag"]
        assert (tag.n_docs_marginal, tag.n_docs_cum) == (1, 4)
        assert math.isclose(tag.cum_doc_frac, 4.0 / 5.0)
        miss = rows["/checkout"]
        assert (miss.n_match_raw, miss.n_docs_marginal) == (0, 0)
        assert miss.shadowed_frac is None  # 0 raw matches -> NULL
        assert miss.n_docs_cum == 4

    def test_marginals_sum_to_cumulative(self, spark):
        """Algebraic identity of first-match attribution: the rung-r
        cumulative equals the sum of marginals 1..r, and raw >=
        marginal everywhere."""
        from soccerpredictor_spark.operators.textops import (
            robots_rule_marginal_sweep,
        )

        docs = spark.createDataFrame(
            [_doc(i, "w x y z", f"src{i % 3}") for i in range(32)],
            DOC_SCHEMA,
        )
        rows = robots_rule_marginal_sweep(docs).orderBy("rung").collect()
        run = 0
        for r in rows:
            run += r.n_docs_marginal
            assert r.n_docs_cum == run
            assert r.n_match_raw >= r.n_docs_marginal


def _emb_rows(vec, n_same: int, n_other: int):
    """n_same copies of ``vec`` (ids 0..n_same-1) then n_other copies
    of ``-vec`` — same-direction vectors share the band-0 bucket, the
    negated ones land in the complementary bucket (every plane dot
    flips sign and none are zero for a single-axis vector)."""
    neg = [-x for x in vec]
    rows = [(i, vec, 1) for i in range(n_same)]
    rows += [(n_same + j, neg, 0) for j in range(n_other)]
    return rows


EMB_SCHEMA = "vec_id long, embedding array<double>, label int"


class TestAnnRecallKSweep:
    def test_bucket_exhaustion_curve(self, spark):
        """5 vectors in the probes' bucket (ids 0-4, identical), 25 in
        the complementary bucket: exact top-k ranks the 5 same-bucket
        vectors first (cos ~ 1 beats cos ~ -1), the approximate leg
        can never return more than the 5 bucket members — recall is
        1.0 through k=5, then exactly 5/k."""
        from soccerpredictor_spark.operators.similarity import (
            ann_recall_k_sweep,
        )
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        vec = [0.5] + [0.0] * 63
        emb = spark.createDataFrame(_emb_rows(vec, 5, 25), EMB_SCHEMA)
        rows = {r.k: r for r in ann_recall_k_sweep(emb).collect()}
        assert set(rows) == {1, 2, 5, 10, 20}
        for k in (1, 2, 5):
            r = rows[k]
            assert (r.n_exact, r.n_approx, r.n_hit) == (4 * k, 4 * k, 4 * k)
            assert r.recall == 1.0
        r10 = rows[10]
        assert (r10.n_exact, r10.n_approx, r10.n_hit) == (40, 20, 20)
        assert r10.recall == 0.5
        r20 = rows[20]
        assert (r20.n_exact, r20.n_approx, r20.n_hit) == (80, 20, 20)
        assert r20.recall == 0.25
        clear_caches()

    def test_single_bucket_perfect_recall(self, spark):
        """Every vector in one direction: the bucket holds the whole
        corpus, approx == exact, recall 1.0 at every rung."""
        from soccerpredictor_spark.operators.similarity import (
            ann_recall_k_sweep,
        )
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        vec = [0.25, -0.5] + [0.0] * 62
        emb = spark.createDataFrame(
            [(i, vec, 1) for i in range(30)], EMB_SCHEMA
        )
        rows = ann_recall_k_sweep(emb).collect()
        for r in rows:
            assert r.n_exact == 4 * min(r.k, 30)
            assert r.n_approx == r.n_exact and r.n_hit == r.n_exact
            assert r.recall == 1.0
        clear_caches()

    def test_fixture_invariants(self, spark):
        """On the real sf0.001 embeddings: counts are monotone
        non-decreasing in k (looser rank cutoffs can only admit
        more), the approximate candidate list can never out-size the
        exact one, and recall stays in (0, 1]."""
        from soccerpredictor_spark.operators.similarity import (
            RECALL_PROBE_IDS,
            ann_recall_k_sweep,
        )
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.sources.catalog import read_table

        clear_caches()
        emb = read_table(spark, SF_DIR, "embeddings")
        rows = ann_recall_k_sweep(emb).orderBy("k").collect()
        prev = None
        for r in rows:
            assert r.n_exact == len(RECALL_PROBE_IDS) * min(r.k, 500)
            assert r.n_approx <= r.n_exact
            assert r.n_hit <= min(r.n_approx, r.n_exact)
            assert 0.0 < r.recall <= 1.0
            if prev is not None:
                assert r.n_exact >= prev.n_exact
                assert r.n_approx >= prev.n_approx
                assert r.n_hit >= prev.n_hit
            prev = r
        clear_caches()

    def test_empty_corpus_keeps_spine(self, spark):
        """No vectors -> no probes: all counts 0, recall NULL, but
        the 5-rung spine survives (the zero-filled-spine convention)."""
        from soccerpredictor_spark.operators.similarity import (
            ann_recall_k_sweep,
        )
        import pyspark.sql.types as T

        emb = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("vec_id", T.LongType()),
                    T.StructField("embedding", T.ArrayType(T.DoubleType())),
                    T.StructField("label", T.IntegerType()),
                ]
            ),
        )
        rows = ann_recall_k_sweep(emb).orderBy("k").collect()
        assert [r.k for r in rows] == [1, 2, 5, 10, 20]
        for r in rows:
            assert (r.n_exact, r.n_approx, r.n_hit) == (0, 0, 0)
            assert r.recall is None


class TestCurateCorpus:
    GOOD = "the and when alpha0 alpha1 alpha2 alpha3 alpha4 alpha5 alpha6"

    def test_gates_only_funnel(self, spark):
        """Four docs, one casualty per gate: id 9 fails robots
        (/admin path), id 24 with source src3 fails the blocklist
        (doc_id%3==0 -> src3.com), the 2-token doc fails Gopher;
        the clean doc carries through every stage and the quota line
        (one surviving source) equals its own token mass."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import curate_corpus

        clear_caches()
        docs = spark.createDataFrame(
            [
                _doc(8, self.GOOD, "alpha"),          # passes all
                _doc(9, self.GOOD, "alpha"),          # /admin -> robots
                _doc(24, self.GOOD, "src3"),          # src3.com -> blocked
                _doc(16, "a b", "beta"),              # gopher f_wc
            ],
            DOC_SCHEMA,
        )
        rows = {r.stage: r for r in curate_corpus(docs).collect()}
        assert rows["base"].n_docs == 4
        assert rows["robots"].n_docs == 3
        assert rows["blocklist"].n_docs == 2
        assert rows["gopher"].n_docs == 1
        assert rows["dedup_keep_best"].n_docs == 1
        assert rows["span_cut"].n_docs == 1
        assert rows["source_quota"].n_docs == 1
        # token accounting: GOOD = 10 tokens, "a b" = 2
        assert rows["base"].n_tokens == 32
        assert rows["robots"].n_tokens == 22
        assert rows["blocklist"].n_tokens == 12
        assert rows["gopher"].n_tokens == 10
        assert rows["span_cut"].n_tokens == 10
        assert rows["source_quota"].n_tokens == 10  # line = 10 div 1
        assert rows["base"].doc_retention == 1.0
        assert math.isclose(rows["gopher"].doc_retention, 0.25)
        assert math.isclose(
            rows["source_quota"].token_retention, 10.0 / 32.0
        )
        clear_caches()

    def test_keep_best_drops_duplicate(self, spark):
        """Two identical docs (guaranteed LSH pair: identical minhash
        signatures collide in every band, exact jaccard 1.0) from two
        sources: survivorship keeps the min-id one (equal length) and
        the funnel drops exactly one doc between gopher and
        dedup_keep_best."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import curate_corpus

        clear_caches()
        dup = self.GOOD + " omega0 omega1"
        # the third doc must share (almost) no shingles with the dup
        # pair: a common prefix would give J = 8/10 = 0.8 and chain
        # it into the cluster (caught by this test's first draft —
        # the operator was right, the fixture was wrong)
        other = "the and when gamma0 gamma1 gamma2 gamma3 gamma4 gamma5 gamma6"
        docs = spark.createDataFrame(
            [
                _doc(8, dup, "alpha"),
                _doc(16, dup, "beta"),
                _doc(24, other, "gamma"),
            ],
            DOC_SCHEMA,
        )
        rows = {r.stage: r for r in curate_corpus(docs).collect()}
        assert rows["gopher"].n_docs == 3
        assert rows["dedup_keep_best"].n_docs == 2
        # the loser is the 12-token beta copy
        assert rows["dedup_keep_best"].n_tokens == rows["gopher"].n_tokens - 12
        assert rows["span_cut"].n_docs == 2
        # quota: two surviving sources (alpha 12, gamma 10), line =
        # 22 div 2 = 11 -> alpha capped at 11, gamma keeps 10
        assert rows["source_quota"].n_tokens == 21
        clear_caches()

    def test_span_cut_stage(self, spark):
        """A benchmark doc (src0) seeds a 13-gram; the long training
        doc shares it (jaccard 11/58 < 0.25 -> never a near-dup pair)
        and keeps its 47-token residual; the clean doc is intact. The
        benchmark doc itself carries no span entry (it is what the
        hygiene protects)."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import curate_corpus

        clear_caches()
        common = "the and " + " ".join(f"tok{i}" for i in range(11))
        resid = " ".join(f"res{i}" for i in range(47))
        docs = spark.createDataFrame(
            [
                _doc(8, common, "src0"),            # benchmark, 13 tokens
                _doc(16, common + " " + resid, "gamma"),  # contaminated, 60
                _doc(24, self.GOOD, "delta"),       # clean, 10
            ],
            DOC_SCHEMA,
        )
        rows = {r.stage: r for r in curate_corpus(docs).collect()}
        assert rows["gopher"].n_docs == 3
        assert rows["dedup_keep_best"].n_docs == 3
        assert rows["span_cut"].n_docs == 3
        # tokens: 13 (bench, intact) + 47 (cut residual) + 10 (clean)
        assert rows["gopher"].n_tokens == 83
        assert rows["span_cut"].n_tokens == 70
        # quota: three sources (13, 47, 10), line = 70 div 3 = 23:
        # src0 keeps 13, gamma capped at 23, delta keeps 10
        assert rows["source_quota"].n_tokens == 46
        clear_caches()

    def test_cross_op_invariants_on_fixture(self, spark):
        """The three curate views of one corpus must agree (run on
        the real sf0.001 fixture so the invariants see the full
        gate/cluster/span machinery, sharing one family-cache build):

        - the global funnel is monotone non-increasing in docs and
          (through stage 6) in tokens, and the quota stage can only
          shave tokens;
        - curate_funnel_by_source sums to curate_corpus exactly at
          every stage (including the quota stage — same water line);
        - curate_corpus_write ships exactly the span_cut stage:
          doc count == stage-6 n_docs, tokens_shipped == stage-6
          n_tokens."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import (
            curate_corpus,
            curate_corpus_write,
            curate_funnel_by_source,
        )
        from soccerpredictor_spark.sources.catalog import read_table

        clear_caches()
        docs = read_table(spark, SF_DIR, "documents")
        funnel = {r.stage_idx: r for r in curate_corpus(docs).collect()}
        assert funnel[1].n_docs > 0  # non-degenerate on the fixture
        for i in range(2, 7):
            assert funnel[i].n_docs <= funnel[i - 1].n_docs
            assert funnel[i].n_tokens <= funnel[i - 1].n_tokens
        assert funnel[7].n_docs == funnel[6].n_docs
        assert funnel[7].n_tokens <= funnel[6].n_tokens
        by_src = curate_funnel_by_source(docs).collect()
        sums: dict[int, list[int]] = {}
        for r in by_src:
            nd, nt = sums.setdefault(r.stage_idx, [0, 0])
            sums[r.stage_idx] = [nd + r.n_docs, nt + r.n_tokens]
        for i in range(1, 8):
            assert sums[i] == [funnel[i].n_docs, funnel[i].n_tokens], i
        shipped = curate_corpus_write(docs).collect()
        assert sum(r.n_docs for r in shipped) == funnel[6].n_docs
        assert sum(r.tokens_shipped for r in shipped) == funnel[6].n_tokens
        clear_caches()

    def test_empty_corpus_keeps_stages(self, spark):
        """Empty input -> seven zero rows with NULL retentions (the
        zero-filled-spine convention)."""
        from soccerpredictor_spark.operators.textops import (
            CURATE_STAGES,
            curate_corpus,
        )

        docs = spark.createDataFrame([], DOC_SCHEMA)
        rows = curate_corpus(docs).orderBy("stage_idx").collect()
        assert [r.stage for r in rows] == list(CURATE_STAGES)
        for r in rows:
            assert (r.n_docs, r.n_tokens) == (0, 0)
            assert r.doc_retention is None and r.token_retention is None


class TestCurateCorpusWrite:
    def test_shipped_composition_from_readback(self, spark):
        """The span-cut fixture shipped: the benchmark doc (13 intact)
        and the clean doc (10 intact) ship uncut; the contaminated doc
        ships its 47-token residual flagged was_cut. The report comes
        from the parquet READ-BACK, so these values prove the
        source-partitioned write is lossless."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import (
            curate_corpus_write,
        )

        clear_caches()
        common = "the and " + " ".join(f"tok{i}" for i in range(11))
        resid = " ".join(f"res{i}" for i in range(47))
        docs = spark.createDataFrame(
            [
                _doc(8, common, "src0"),
                _doc(16, common + " " + resid, "gamma"),
                _doc(24, TestCurateCorpus.GOOD, "delta"),
            ],
            DOC_SCHEMA,
        )
        rows = {r.source: r for r in curate_corpus_write(docs).collect()}
        assert set(rows) == {"src0", "gamma", "delta"}
        assert (rows["src0"].n_docs, rows["src0"].n_docs_cut) == (1, 0)
        assert rows["src0"].tokens_shipped == 13
        g = rows["gamma"]
        assert (g.n_docs, g.n_docs_cut) == (1, 1)
        assert (g.tokens_shipped, g.tokens_before_cuts) == (47, 60)
        assert rows["delta"].tokens_shipped == 10
        clear_caches()

    def test_funnel_by_source_attribution(self, spark):
        """The gates-only fixture at (source, stage) grain: alpha's
        robots casualty, src3's blocklist wipe-out and beta's gopher
        failure each show up in THEIR source's funnel row, and the
        quota stage applies the global line per source."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import (
            curate_funnel_by_source,
        )

        clear_caches()
        docs = spark.createDataFrame(
            [
                _doc(8, TestCurateCorpus.GOOD, "alpha"),
                _doc(9, TestCurateCorpus.GOOD, "alpha"),   # /admin
                _doc(24, TestCurateCorpus.GOOD, "src3"),   # blocked domain
                _doc(16, "a b", "beta"),                   # gopher f_wc
            ],
            DOC_SCHEMA,
        )
        out = curate_funnel_by_source(docs).collect()
        assert len(out) == 3 * 7
        got = {(r.source, r.stage): (r.n_docs, r.n_tokens) for r in out}
        assert got[("alpha", "base")] == (2, 20)
        assert got[("alpha", "robots")] == (1, 10)   # doc 9 dropped HERE
        assert got[("alpha", "source_quota")] == (1, 10)  # line = 10 div 1
        assert got[("src3", "robots")] == (1, 10)    # survives robots...
        assert got[("src3", "blocklist")] == (0, 0)  # ...dies HERE
        assert got[("beta", "blocklist")] == (1, 2)
        assert got[("beta", "gopher")] == (0, 0)     # dies HERE
        assert got[("beta", "source_quota")] == (0, 0)
        clear_caches()

    def test_keep_best_loser_not_shipped(self, spark):
        """The duplicate pair ships exactly one copy (the min-id
        survivor); the shipped doc count equals the funnel's
        dedup_keep_best stage."""
        from soccerpredictor_spark.operators.scale import clear_caches
        from soccerpredictor_spark.operators.textops import (
            curate_corpus_write,
        )

        clear_caches()
        dup = TestCurateCorpus.GOOD + " omega0 omega1"
        other = (
            "the and when gamma0 gamma1 gamma2 gamma3 gamma4 gamma5 gamma6"
        )
        docs = spark.createDataFrame(
            [
                _doc(8, dup, "alpha"),
                _doc(16, dup, "beta"),
                _doc(24, other, "gamma"),
            ],
            DOC_SCHEMA,
        )
        rows = {r.source: r for r in curate_corpus_write(docs).collect()}
        assert set(rows) == {"alpha", "gamma"}  # beta's copy lost
        assert rows["alpha"].n_docs == 1
        assert rows["alpha"].tokens_shipped == 12
        assert rows["gamma"].tokens_shipped == 10
        clear_caches()

    def test_default_sink_is_per_invocation_and_retired(self, spark):
        """The default sink contract: each invocation gets a FRESH
        mkdtemp directory (0700 — a held read-back DataFrame can
        never silently see a later invocation's rows), the previous
        default sink is retired so litter stays bounded at one live
        directory, and a retired-path read fails LOUDLY instead of
        returning the wrong corpus."""
        import os

        from soccerpredictor_spark.operators import textops as T
        from soccerpredictor_spark.operators.scale import clear_caches

        clear_caches()
        docs = spark.createDataFrame(
            [_doc(8, TestCurateCorpus.GOOD, "src0")], DOC_SCHEMA
        )
        held = T.curate_corpus_write(docs)  # never executed
        d1 = list(T._CURATE_SINK_DIRS)
        assert len(d1) == 1
        assert (os.stat(d1[0]).st_mode & 0o777) == 0o700
        T.curate_corpus_write(docs).collect()  # retires d1
        d2 = list(T._CURATE_SINK_DIRS)
        assert len(d2) == 1 and d2[0] != d1[0]
        assert not os.path.exists(d1[0]) and os.path.isdir(d2[0])
        with pytest.raises(Exception, match="FILE_NOT_EXIST|FileNotFound"):
            held.collect()
        clear_caches()
