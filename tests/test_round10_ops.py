"""Round-10 operators: semantic unit tests with closed-form answers.

The Spark-vs-DuckDB value parity gate runs per-pytest for every
registered entry in test_oracle_parity.py; these tests pin the
SEMANTICS on constructed corpora where the right answer is derivable
by hand.
"""

from __future__ import annotations


class TestSubstringDedup:
    def test_shared_span_between_two_docs(self, spark):
        """Two docs share one exact 40-char block inside otherwise
        unique text: both report exactly that block's coverage
        (merged into ONE span), the unique doc reports nothing."""
        from soccerpredictor_spark.operators.textops import substring_dedup

        import hashlib

        def rand_text(seed: str, n: int) -> str:
            # repeat-free-by-construction filler: md5 hex stream (a
            # stride pattern mod 26 is PERIODIC and self-duplicates)
            out = ""
            i = 0
            while len(out) < n:
                out += hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
                i += 1
            return out[:n]

        shared = "the quick brown fox jumps over the lazy"  # 39 chars
        assert len(shared) == 39
        u1 = rand_text("u1", 61)
        u2 = rand_text("u2", 61)
        docs = spark.createDataFrame(
            [
                (1, u1 + shared + rand_text("t1", 61), "s"),
                (2, u2 + shared + rand_text("t2", 61), "s"),
                (3, "totally unique text with no repeats at all here!", "s"),
            ],
            ["doc_id", "text", "source"],
        )
        got = {
            r.doc_id: (r.n_dup_spans, r.dup_chars)
            for r in substring_dedup(docs, k=30).collect()
        }
        # the shared block is 39 chars -> 10 dup 30-gram starts ->
        # one merged span of exactly 39 chars in each carrier doc
        assert got == {1: (1, 39), 2: (1, 39)}

    def test_intra_document_repeat_counts(self, spark):
        """Lee-et-al semantics: a block repeated WITHIN one document
        is duplicated text too — both occurrences are covered."""
        from soccerpredictor_spark.operators.textops import substring_dedup

        block = "x" * 30
        filler = "".join(chr(97 + (i * 5) % 26) for i in range(40))
        docs = spark.createDataFrame(
            [(7, block + filler + block, "s")],
            ["doc_id", "text", "source"],
        )
        [r] = substring_dedup(docs, k=30).collect()
        # NOTE: 'x'*30 repeated means interior grams of each block are
        # also equal to each other, and the two covered intervals are
        # disjoint (separated by 40 unique chars) -> 2 spans, 60 chars
        assert r.doc_id == 7
        assert r.n_dup_spans == 2
        assert r.dup_chars == 60

    def test_adjacent_grams_merge_into_one_span(self, spark):
        """Overlapping duplicated gram starts coalesce: a 45-char
        shared block is ONE span of 45 chars, not 16 spans."""
        from soccerpredictor_spark.operators.textops import substring_dedup

        import hashlib

        shared = "X!" + "abcdefghijklmnopqrstuvwxyz0123456789ABCDEF" + "Y"
        assert len(shared) == 45
        pre1 = hashlib.md5(b"p1").hexdigest() + hashlib.md5(b"p1x").hexdigest()
        pre1 = pre1[:35]
        pre2 = hashlib.md5(b"p2").hexdigest() + hashlib.md5(b"p2x").hexdigest()
        pre2 = pre2[:35]
        docs = spark.createDataFrame(
            [(1, pre1 + shared, "s"), (2, pre2 + shared, "s")],
            ["doc_id", "text", "source"],
        )
        got = {
            r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_fraction)
            for r in substring_dedup(docs, k=30).collect()
        }
        assert got[1][0] == 1 and got[1][1] == 45
        assert got[2][0] == 1 and got[2][1] == 45
        assert abs(got[1][2] - 45 / 80) < 1e-12

    def test_short_docs_excluded(self, spark):
        """Docs shorter than k cannot carry a k-span and emit no row
        (and no gram work) — they are structurally dedup-clean."""
        from soccerpredictor_spark.operators.textops import substring_dedup

        docs = spark.createDataFrame(
            [(1, "short", "s"), (2, "short", "s")],
            ["doc_id", "text", "source"],
        )
        assert substring_dedup(docs, k=30).count() == 0
