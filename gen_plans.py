import sys
sys.path.insert(0, "/root/repo")
from soccerpredictor_spark.session import get_spark
import __spark_entry__ as m
spark = get_spark("plans")
spark.conf.set("spark.sql.adaptive.enabled", "false")  # show static codegen stages
sf = "/root/testdata/sf0.1"

HEADLINE = {
    "tpch_q1": "Scan-heavy agg: pushdown + column pruning + map-side partial agg",
    "tpch_q3": "3-way join: broadcast filtered dim, shuffle only lineitem-orders, top-K as TakeOrderedAndProject",
    "semi_join": "Procedural 2-step lookup re-expressed as broadcast left-semi chain",
    "pivot_avg": "Long-to-wide pivot with explicit value list (no distinct-collection job)",
    "dedup_minhash_lsh": "MinHash LSH: signature agg, banded buckets, candidate-restricted verification, exchange reuse",
    "embedding_near_dup": "Sign-LSH near-dup: arrays quantized once, id-only candidate shuffle, vectors re-joined",
    "asof_join": "As-of join as union+window: one shuffle, zero join nodes",
    "tpch_q4": "EXISTS as left-semi shuffle join; lineitem projected to 2 cols before the shuffle",
    "tpch_q18": "HAVING-subquery semi-join; survivor keys broadcast back into lineitem",
    "tpch_q22": "Scalar subquery as 1-row broadcast; anti-join against recent-order keys",
    "tfidf_top_terms": "One explode pass: df via window-over-tf (no duplicated Generate subtree); count-only shuffles",
    "hash_split": "Deterministic split: pure scan projection, zero exchanges",
    "ngram_topk": "Corpus n-gram df: explode distinct shingles, map-side-combinable count, TakeOrderedAndProject top-k",
    "ann_ivf_topk": "IVF assignment as broadcast argmin projection (r2 fix: was crossJoin+window = 16x shuffle; now zero exchanges on the vector branch)",
    "range_join": "Literal tiers as CASE projection (r2 fix: was broadcast band join at 3.1s; now single-exchange agg ~1.1s)",
    "range_join_bands": "Tier-table band join: broadcast nested loop, fact side never shuffles",
    "tpch_q12": "Big-big equi-join with conditional partial-agg counts; both sides pruned to 2 cols before the shuffle",
    "tpch_q21": "Waiting-supplier EXISTS/NOT-EXISTS as two-level agg: lineitem shuffles once on l_orderkey; supplier⋈nation broadcast",
    "dedup_simhash": "SimHash: one conv per token hash + 32 shiftright bits (r2 fix: was 32 substring+instr probes; 6.6s -> ~5.5s)",
    "ann_ivf_kmeans": "Lloyd-refined IVF: two broadcast-argmin assignment passes, vector table never exchanged; refinement shuffle = lists x dims",
    "funnel_stages": "Ordered funnel: one groupBy + per-row fold over the sorted event sequence (no per-step self-joins)",
    "doc_chunks": "Context-window chunking: per-row array arithmetic + posexplode, zero exchanges",
    "window_trailing_range": "Time-RANGE frame over epoch seconds: single exchange on user_id, no join",
    "salted_join": "Skew-proof shuffle join: salted fact x salt-replicated dim (exactly the plain join's rows)",
    "dedup_containment": "Subset-duplication containment metric over the df-capped shingle self-join (exchange-reused sides)",
    "mad_outliers": "Median/MAD robust outliers: two tiny-key percentile aggs broadcast back into the row stream",
    "bm25_search": "BM25 as a pure scan ranking: per-term tf via array HOFs (no explode), 1-row corpus stats broadcast, TakeOrderedAndProject heaps",
    "inverted_index": "Index build: per-doc terms deduped map-side (array_distinct before explode), Partial WindowGroupLimit bounds the posting shuffle at vocab x p rows per task, vocab-sized broadcast join",
    "group_sample_topk": "Fixed-quota per-stratum sample: map-side Partial WindowGroupLimit prunes each task to k rows per stratum BEFORE the shuffle",
    "scd2_intervals": "SCD2 validity intervals: event_type filter pushed to the scan, one window shuffle for LEAD",
    "domain_mix": "Data-driven mixture gate: 5-row rate table broadcast onto the scan; the corpus is never join-shuffled",
    "partitioned_prune": "Hive-partitioned read-back: the lang predicate resolves against directory metadata (PartitionFilters) — only the matching partition's files open",
    "ann_int8_topk": "int8 scalar-quantized MIPS: 4x-compressed codes, exact int64 dots, TakeOrdered heaps, zero shuffle",
    "unpivot_metrics": "Wide-to-long unpivot as an Expand projection: map-side row multiplication, zero reshape shuffle",
    "doc_sim_knn": "Sparse text kNN: df-capped posting-list self-join, exact int64 dots, rank-window top-k",
    "zorder_prune": "Z-order layout read-back: conjunctive two-dimension predicates pushed to the scan's row-group stats",
    "cdc_apply": "CDC merge with deletes: one window over the change batch, one key-only anti-join against the base",
    "shuffle_hash_join": "Explicit SHUFFLE_HASH: hash join on the exchange, zero sorts",
    "fk_integrity_audit": "FK orphan audit: key-only LEFT ANTI joins, parent side distinct-reduced",
    "date_spine_fill": "Calendar gap fill: generated spine x type dim broadcast-joined onto the single daily-agg shuffle",
    "tpch_q2": "Synthesized-partsupp min-cost supplier: region chain + part attrs broadcast, correlated MIN as one agg + equi-join, top-100 as TakeOrderedAndProject",
    "tpch_q20": "Excess-stock suppliers: ONE lineitem scan (pair availqty evaluated in place via md5 — no partsupp materialization), shipdate pushed, part keys broadcast",
    "target_encode": "Smoothed target encoding: tiny (feature, category) agg + 1-row prior broadcast; fact table scanned once, never sort-merged",
    "ngram_novelty": "Per-doc n-gram novelty: map-side-combinable MIN per shingle, one equi-join back — per-document scoring with NO pair generation",
    "quantile_bins": "Equal-frequency binning: percentile_disc decile edges in one agg, broadcast comparison-count bin assignment — no ntile, no global sort",
    "chi2_association": "Chi-square cells: one contingency agg + broadcast marginals; per-cell double assembly, no order-dependent cross-cell sum",
    "incremental_dedup": "Batch-vs-corpus dedup: corpus distinct-reduced to fingerprints before the membership join; text never crosses an exchange",
    "embedding_outliers": "Per-label centroid-distance outliers: (label, dim) sums broadcast, exact decimal numerator combined map-side, count-bounded rank window",
    "interval_overlap_join": "Interval x interval overlap bucketized to hour grain: the temporal join is a plain equi-join on the hour key — no inequality-pair join",
    "substring_dedup": "Exact repeated-span dedup: ONE scan -> gram explode -> count-window on fingerprint -> per-doc islands; zero joins, no all-pairs",
    "quantile_normalize": "Exact cross-feature rank normalization: bucket lookup as codegen CASE tree, ONE windowed rank stream (AQE-reused exchange), rank means range-joined broadcast to the 96-row bucket table — no n-row equi-join, no checkpoint",
}

# Performance-notes sections are maintained by hand in PLANS.md and
# carried over verbatim on regeneration (everything from the first
# "## Round-" notes heading onward).
with open("/root/repo/PLANS.md") as f:
    _existing = f.read()
_notes_at = _existing.find("## Round-")
PERF_NOTES = _existing[_notes_at:] if _notes_at >= 0 else ""

out = ["# PLANS — physical plans of headline queries (sf0.1, AQE display off)",
       "",
       "Regenerate: `python " + "gen_plans.py" + "` (or see tests/test_plans.py",
       "for the assertions that gate these shapes). Annotations call out the",
       "properties that matter at 100 TB.",
       ""]
for name, note in HEADLINE.items():
    df = m.queries()[name](spark, sf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    out.append(f"## {name}")
    out.append("")
    out.append(f"**{note}**")
    out.append("")
    out.append("```")
    # keep the operator tree + scan details; drop the verbose per-node field dumps
    lines = plan.splitlines()
    tree_end = next((i for i, l in enumerate(lines) if not l.strip()), len(lines))
    keep = lines[:tree_end]
    detail = [l for l in lines[tree_end:] if any(
        k in l for k in ("PushedFilters", "ReadSchema", "Location"))]
    out.extend(keep)
    if detail:
        out.append("")
        out.extend(d.strip()[:200] for d in detail)
    out.append("```")
    out.append("")
out.append(PERF_NOTES)
with open("/root/repo/PLANS.md", "w") as f:
    f.write("\n".join(out))
print("wrote PLANS.md", sum(len(l) for l in out))
