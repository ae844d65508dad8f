"""Scale-guard behavior: the properties that keep the dedup/similarity
operators alive at 100 TB, exercised on adversarial small data.

The df-cap (max_df) on shingles is THE skew guard for the shingle
self-join: a stop-phrase shared by half the corpus would otherwise
produce |corpus|^2/4 candidate pairs out of a single shingle bucket.
These tests build exactly that corpus and assert the guard drops the
hot bucket while real near-duplicates still surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from soccerpredictor_spark.operators import dedup as D


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """200 docs that ALL open with the same stop phrase (a hot shingle
    bucket of df=200), each with a unique tail — plus one pair of true
    near-duplicates with rare shared content."""
    stop = "breaking news today again"
    rows = [
        (i, "en", f"{stop} item {i} alpha{i * 7} beta{i * 13} gamma{i * 29}")
        for i in range(200)
    ]
    rows.append((9001, "en", "rare pangolin fact sheet edition one final"))
    rows.append((9002, "en", "rare pangolin fact sheet edition two final"))
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"]).cache()


def test_hot_shingle_capped_no_pair_explosion(skewed_docs):
    """With the df cap active, the 200 stop-phrase docs must NOT pair
    with each other (their only shared shingles are hot); the true
    near-dup pair must still be found."""
    pairs = D.jaccard_pairs(skewed_docs, n=3, threshold=0.2, max_df=100).collect()
    pair_keys = {(r.doc_a, r.doc_b) for r in pairs}
    assert (9001, 9002) in pair_keys
    # no stop-phrase-only pair survives
    assert all(a >= 9000 and b >= 9000 for a, b in pair_keys), pair_keys


def test_uncapped_would_explode(skewed_docs):
    """Sanity check that the guard is doing real work: without the cap
    the same corpus produces tens of thousands of candidate pairs."""
    n_uncapped = (
        D.jaccard_pairs(skewed_docs, n=3, threshold=0.0, max_df=10**9)
        .count()
    )
    assert n_uncapped > 19_000  # ~200*199/2 stop-phrase pairs


def test_minhash_lsh_respects_cap_in_verification(skewed_docs):
    """LSH candidates of stop-phrase docs exist (signatures collide),
    but exact-jaccard verification over df-capped shingles kills them;
    the rare pair survives end-to-end."""
    pairs = D.minhash_lsh_pairs(
        skewed_docs, n=3, num_hashes=12, bands=4, threshold=0.2, max_df=100
    ).collect()
    pair_keys = {(r.doc_a, r.doc_b) for r in pairs}
    assert (9001, 9002) in pair_keys
    assert all(a >= 9000 and b >= 9000 for a, b in pair_keys), pair_keys


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    """distinct_agg documents exact count-distinct with HLL as the
    at-scale drop-in; this pins the drop-in's error envelope (HLL++
    rsd default 5%) so the claim stays tested, not aspirational."""
    from soccerpredictor_spark.sources.catalog import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r.approx - r.exact) <= max(0.1 * r.exact, 5), (
            r.event_type, r.exact, r.approx,
        )


def test_salted_join_equals_plain_join(spark):
    """The salted join must return EXACTLY the plain join's rows on a
    pathologically skewed big side (90% of rows on one key)."""
    from pyspark.sql import functions as F

    from soccerpredictor_spark.operators.skew import salted_join

    big = spark.range(0, 2000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN CAST(1 AS BIGINT) ELSE id END AS k", "id AS v"
    )
    small = spark.range(0, 2000).selectExpr("id AS k", "id * 2 AS w")
    agg = [F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")]
    got = salted_join(big, small, "k").agg(*agg).collect()
    exp = big.join(small, "k").agg(*agg).collect()
    assert got == exp


class TestCandidateBudgetGuard:
    """No-silent-caps guard (round-5 verdict #6): candidate-pair bound
    computed from bucket sizes BEFORE the self-join; degenerate banding
    aborts loudly instead of silently going all-pairs."""

    def test_healthy_banding_passes_and_reports(self, spark):
        from soccerpredictor_spark.operators.scale import candidate_budget_guard

        # 64 items spread over 16 buckets x 2 bands -> small buckets
        rows = [(i, b, i % 16) for i in range(64) for b in range(2)]
        bnd = spark.createDataFrame(rows, ["vec_id", "band", "bucket"])
        est, n_rows, max_bucket = candidate_budget_guard(
            bnd, ["band", "bucket"], "test_healthy"
        )
        assert n_rows == 128
        assert max_bucket == 4
        assert est == 32 * (4 * 3 // 2)  # 16 buckets x 2 bands, k=4

    def test_degenerate_single_bucket_aborts(self, spark):
        from soccerpredictor_spark.operators.scale import candidate_budget_guard

        # everything collides into one bucket: bound = n*(n-1)/2 ~ n^2
        rows = [(i, 0, 0) for i in range(200)]
        bnd = spark.createDataFrame(rows, ["vec_id", "band", "bucket"])
        with pytest.raises(RuntimeError, match="all-pairs"):
            candidate_budget_guard(bnd, ["band", "bucket"], "test_degenerate")

    def test_override_allows_dense_runs(self, spark):
        from soccerpredictor_spark.operators.scale import candidate_budget_guard

        rows = [(i, 0, 0) for i in range(200)]
        bnd = spark.createDataFrame(rows, ["vec_id", "band", "bucket"])
        est, n_rows, _ = candidate_budget_guard(
            bnd, ["band", "bucket"], "test_optout", max_pairs_per_row=float("inf")
        )
        assert est == 200 * 199 // 2 and n_rows == 200

    def test_near_dup_paths_run_guarded(self, spark):
        """The production callers still work end-to-end with the guard
        in line (healthy fixture data stays far under budget)."""
        from soccerpredictor_spark.operators.similarity import cosine_near_dup
        from soccerpredictor_spark.sources.catalog import read_table

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
        out = cosine_near_dup(emb)
        assert out.columns == ["vec_a", "vec_b", "sim"]
        out.count()  # materializes through the guard without raising
