"""Warm same-JVM scaling curves for the pair-generation operator
family (PLANS.md). Protocol: one session, one untimed warm-up run of
every (operator, sf) cell to absorb JVM/codegen/Python-worker-pool
startup, then the timed pass; report seconds per cell.

The 10x point (sf1x) comes from gen_scale10.py — a corpus 10x sf0.1
with true-duplicate density held constant by construction, so the
expected curve is LINEAR in rows; super-linear growth would expose a
candidate-generation blowup.

Usage: python gen_scale10.py && python gen_curves.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

OPS = [
    "dedup_jaccard",
    "dedup_clusters",
    "embedding_dedup_clusters",
    "doc_sim_knn",
    # round-7 families whose fan-out could in principle grow
    # super-linearly (pair generation / wedge joins / iterations):
    "graph_coactivity",
    "graph_triangles",
    "graph_pagerank",
    "graph_components",
    "ann_pq_topk",
    "pmi_collocations",
    # round-7 second-half additions with non-trivial scaling shapes:
    # link_prediction fans out wedges (hub-capped), heavy_hitters_cms
    # must show the flat d*w-bounded sketch cost, roc_auc's prefix sum
    # and skyline's prune+window must stay linear, bloom_probe's
    # filter stays m-bounded while build/probe grow.
    "link_prediction",
    "heavy_hitters_cms",
    "roc_auc",
    "skyline_pareto",
    "bloom_probe",
    # round-8 registrations whose scaling shapes matter: the KS and CI
    # prefix/fan-out paths must stay linear; the FastSS variant join
    # and the basket pair join are the two bounded-fan-out candidates;
    # negative_sampling's union-tag aggregation is the big shuffle;
    # simpson's token counts and ndcg's per-customer windows are the
    # explode-bound paths.
    "subsample_ci",
    "ks_drift",
    "ndcg_at_k",
    "grouped_ols",
    "rfm_segments",
    "corr_matrix",
    "attribution",
    "time_weighted_average",
    "simpson_diversity",
    "edit_distance_join",
    "basket_rules",
    "negative_sampling",
    # batch 2/3 + closers: window/union-window shapes (interval and
    # interpolation), the d^2 Gram (PCA), the projection-only passes
    # (fertility, pii_redact, delta_attribution), the PK-keyed
    # full-outer diff, and the stub-decode frame fan-out.
    "interval_merge",
    "linear_interpolate",
    "rrf_fusion",
    "tokenizer_fertility",
    "media_scene_segments",
    "snapshot_diff",
    "delta_attribution",
    "embedding_pca_power",
    "pii_redact",
    # round-9 registrations: the bigram-type join (perplexity), the
    # banded dHash pair join (phash), the prefix-sum metric pair
    # (pr_auc/stump), the span-bounded survival fold, the sketch, and
    # the projection-only mix/url/kappa passes.
    "perplexity_filter",
    "media_phash_neardup",
    "pr_auc",
    "decision_stump",
    "kaplan_meier",
    "cohen_kappa",
    "hll_distinct",
    "temperature_mix",
    "url_dedup",
    "graph_bfs",
    "mutual_knn",
    "item_cf",
    "seasonal_decompose",
    "cms_merge_audit",
    "quantile_normalize",
    "jl_projection",
    "zipf_audit",
    "cluster_labels",
    "concurrency_profile",
    "conversion_lag",
    "ivf_recall_eval",
    # round-10 registrations: the every-position gram explode
    # (substring_dedup — the one new fan-out shape), the PQ ADC scan,
    # the pairwise-slope median (hour-bounded), the sketch audits, and
    # the strata/rank-bounded allocations/metrics.
    "substring_dedup",
    "pq_recall_eval",
    "theil_sen_trend",
    "neyman_allocation",
    "rare_category_collapse",
    "hll_merge_audit",
    "cms_heavy_change",
    "mrr_at_k",
]
SFS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1x", os.environ.get("SCALE10_DIR", "/tmp/sf1x")),
]


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()

    # optional CLI filter: `python gen_curves.py op1 op2 ...` runs only
    # the named cells (for re-recording a subset without the full hour)
    ops = [o for o in OPS if o in sys.argv[1:]] if len(sys.argv) > 1 else OPS

    def run(op: str, sf_dir: str) -> tuple[float, object]:
        """Run one cell; on a candidate-budget abort (expected for the
        fixed-geometry embedding banding at 10x — the guard working),
        rerun with the explicit override so the over-budget cell still
        yields its timing datapoint, tagged with a *."""
        from soccerpredictor_spark.operators import similarity
        from soccerpredictor_spark.sources.catalog import read_table

        import gc

        t0 = time.monotonic()
        try:
            n = qs[op](spark, sf_dir).count()
            dt = time.monotonic() - t0
            # release checkpoint/persist blocks promptly (the bench.py
            # discipline) — without this, blocks pinned by the dedup /
            # graph families degrade every LATER cell 5-10x (observed:
            # rfm_segments 0.7s warm -> 6.5s in the timed pass)
            gc.collect()
            return dt, n
        except RuntimeError as e:
            if "candidate-pair bound" not in str(e):
                raise
            print(f"GUARD-ABORT {op} @ {sf_dir}: {e}", flush=True)
            emb = read_table(spark, sf_dir, "embeddings")
            t0 = time.monotonic()
            n = similarity.embedding_dedup_clusters(
                emb, max_pairs_per_row=float("inf")
            ).count()
            return time.monotonic() - t0, f"{n}*"

    results: dict[tuple[str, str], tuple[float, object]] = {}
    for timed in (False, True):
        for op in ops:
            for sf_name, sf_dir in SFS:
                dt, n = run(op, sf_dir)
                tag = "TIMED" if timed else "warm "
                if timed:
                    results[(op, sf_name)] = (dt, n)
                print(f"{tag} {op} {sf_name}: {dt:.2f}s ({n} rows)", flush=True)
    print("\n| operator | " + " | ".join(s for s, _ in SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for op in ops:
        cells = " | ".join(f"{results[(op, s)][0]:.2f}" for s, _ in SFS)
        print(f"| {op} | {cells} |")
    spark.stop()


if __name__ == "__main__":
    main()
