"""Similarity search over the embeddings table (array<float> column).

Training-data-pipeline ANN layer (BASELINE.json north star):

- cosine_topk        brute-force exact top-k against a query vector —
                     the correctness baseline; one scan, no shuffle,
                     TakeOrderedAndProject for the top-k
- lsh_ann_topk       sign-LSH bucketed top-k: only the query's bucket
                     is scanned — the scale path (buckets prune the
                     candidate set ~2^planes-fold on uniform data)
- cosine_near_dup    all-pairs near-duplicate detection restricted to
                     LSH-bucket-colliding pairs (banded OR-construction
                     for recall), never materializing n^2

All similarity math uses the exact-decimal dot product
(functions/vectors.py) so Spark and the DuckDB oracle agree on every
bit; hyperplanes are md5-seeded literals shared by both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from soccerpredictor_spark.functions import vectors as V
from soccerpredictor_spark.operators.scale import fan_out

#: default LSH geometry: 4 bands x 4 planes = 16 hyperplanes.
BANDS = 4
PLANES_PER_BAND = 4
DIM = 64

#: near-dup candidate geometry: 8 bands x 8 planes = 256 buckets per
#: band. The coarse 4x4 default (16 buckets/band) is fine for a
#: single-query ANN probe but catastrophic for the pair SELF-join:
#: at sf0.1 it passed 461,847 of ~2M possible pairs (23% — nearly
#: all-pairs through a keyhole), making exact verification the
#: operator's dominant cost. 8-plane buckets cut candidates ~7x
#: (and bucket population ~n/256 per band scales the self-join
#: linearly in true-duplicate count at 100 TB); 8 OR-ed bands keep
#: collision probability ~94% at sim 0.9 (p_agree = 1 - acos(s)/pi,
#: band hit = p^8, recall = 1-(1-p^8)^8) — recall concentrates on
#: actual near-duplicates rather than the sim~0.3 long tail.
ND_BANDS = 8
ND_PLANES_PER_BAND = 8

#: scale ladder for the per-band bucket DEPTH (round-15 sf1x finding:
#: at 20k vectors the fixed 8-bit buckets left a ~7.4M candidate-pair
#: bound — 46 pairs/row vs the 32/row budget — and the guard aborted
#: the whole family — correctly, but the DEFAULT should survive a 10x
#: decade). Random-collision candidates per row grow ~n / 2^depth per
#: band, so depth gains 2 bits per 4x rows from the geometry's design
#: point (sf0.1: 2000 vectors / 256 buckets = ~8 rows/bucket):
#: n <= 2048 -> 8 bits (bit-identical to the historical geometry at
#: every verified fixture scale), <= 8192 -> 10, beyond -> 12. The
#: recall trade is the standard LSH one and concentrates where it
#: should: at sim 0.99 recall stays ~0.999 at depth 12
#: (p = 1 - acos(s)/pi = .955, 1-(1-p^12)^8); sim 0.95 -> ~0.92; the
#: sim ~0.3 long tail decays hardest. True-duplicate clusters agree
#: on EVERY bit, so their (wanted) candidate mass is depth-invariant.
#: Past the ladder cap the geometry is deployment config (pass more
#: bands/planes for a 10^9-vector corpus) and the budget guard still
#: aborts loudly rather than degrade into all-pairs. Depth derives
#: from COUNT(*) of the input — the SQL twins compute the identical
#: CASE from the identical count, so both engines always agree.
ND_EXT_PLANES_PER_BAND = 4
ND_DEPTH_LADDER = ((2_048, 8), (8_192, 10))
ND_DEPTH_MAX = ND_PLANES_PER_BAND + ND_EXT_PLANES_PER_BAND


def _nd_depth(n: int) -> int:
    """Bucket-prefix depth for an n-row corpus (see ND_DEPTH_LADDER)."""
    for bound, depth in ND_DEPTH_LADDER:
        if n <= bound:
            return depth
    return ND_DEPTH_MAX


def _nd_depth_sql() -> str:
    """The identical depth pick as a DuckDB scalar subquery.

    FULL-TABLE COUPLING: this counts the whole ``embeddings`` view,
    while the Spark side derives depth from the ACTUAL input frame
    (``_nd_depth(df.count())``). Registered queries pass the full
    table, so the two always agree; a caller handing
    :func:`cosine_near_dup` / :func:`knn_graph` a FILTERED or
    alternate embedding set whose row count straddles a ladder
    boundary (2048 / 8192) would get a different depth than this SQL
    twin — silently different bucket geometry. If you need subset
    inputs with oracle parity, register the subset as its own view
    and parameterize this builder with that relation name.
    """
    cases = " ".join(
        f"WHEN COUNT(*) <= {b} THEN {d}" for b, d in ND_DEPTH_LADDER
    )
    return f"(SELECT CASE {cases} ELSE {ND_DEPTH_MAX} END FROM embeddings)"


def _planes() -> list[list[float]]:
    return V.hyperplanes(BANDS * PLANES_PER_BAND, DIM)


def _nd_all_planes() -> list[list[float]]:
    """Base planes (indices 0-63, unchanged from the historical
    geometry) followed by the ladder's extension planes (64-95) —
    band i's full bucket is its 8 base bits + its 4 extension bits,
    so a depth-8 prefix is BIT-IDENTICAL to the pre-ladder bucket."""
    return V.hyperplanes(
        ND_BANDS * (ND_PLANES_PER_BAND + ND_EXT_PLANES_PER_BAND), DIM
    )


def _nd_sketch_udf():
    """Arrow-vectorized near-dup sketch: ONE numpy pass per batch
    computes the quantized int64 vector, its squared norm, and all
    ``ND_BANDS`` bucket bit-strings (a (batch x dim) @ (dim x planes)
    int matmul).

    Why Python here: the pure-Catalyst formulation (per-plane
    ``aggregate(zip_with(...))``) runs INTERPRETED — higher-order
    functions don't codegen — and measured 4-11s for 2000x64 planes at
    sf0.1, slower than the join work it feeds. The sanctioned
    vectorized-Pandas-UDF path does the identical exact-integer
    arithmetic (quantize = round-half-away-from-zero to 1e7, matching
    Spark ``round`` and DuckDB ``round`` bit-for-bit) at memory
    bandwidth. Declared in tests/test_plans.py's Python allowlist."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(_nd_all_planes(), dtype=np.int64)
    ppb = ND_PLANES_PER_BAND
    epb = ND_EXT_PLANES_PER_BAND
    nb = ND_BANDS
    base_n = nb * ppb
    scale = V.SCALE

    # NOTE: no type hints — `from __future__ import annotations` turns
    # them into strings this module's scope can't re-evaluate, breaking
    # pandas_udf's signature inference; the explicit SCALAR eval type
    # carries the same information.
    from pyspark.sql.functions import PandasUDFType

    @pandas_udf(
        "struct<iv: array<bigint>, nrm: bigint, buckets: array<string>>",
        PandasUDFType.SCALAR,
    )
    def sketch(emb):
        if len(emb) == 0:
            return pd.DataFrame({"iv": [], "nrm": [], "buckets": []})
        M = np.stack(emb.to_numpy()).astype(np.float64)
        IV = np.where(
            M >= 0,
            np.floor(M * scale + 0.5),
            np.ceil(M * scale - 0.5),
        ).astype(np.int64)
        D = IV @ P.T
        nrm = (IV * IV).sum(axis=1)
        bits = np.where(D >= 0, "1", "0")
        # band i = 8 base bits + 4 ladder extension bits; consumers
        # take a count-driven prefix (depth 8 == historical geometry)
        buckets = [
            [
                "".join(r[i * ppb : (i + 1) * ppb])
                + "".join(r[base_n + i * epb : base_n + (i + 1) * epb])
                for i in range(nb)
            ]
            for r in bits
        ]
        return pd.DataFrame(
            {"iv": list(IV), "nrm": nrm, "buckets": buckets}
        )

    return sketch


def _pair_dot_udf():
    """Arrow-vectorized exact int64 dot of two pre-quantized arrays —
    the near-dup verification kernel ((pairs x dim) elementwise
    multiply-sum per batch). Same interpreted-HOF rationale as
    ``_nd_sketch_udf``."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("bigint", PandasUDFType.SCALAR)
    def pair_dot(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        A = np.stack(a.to_numpy()).astype(np.int64)
        B = np.stack(b.to_numpy()).astype(np.int64)
        return pd.Series((A * B).sum(axis=1))

    return pair_dot


def cosine_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Exact top-k by cosine similarity to one stored vector.

    The single-row query side is broadcast; similarity is a per-row
    expression, so the plan is scan -> project -> TakeOrderedAndProject
    (partial top-k per partition, no global sort).
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        fan_out(emb).crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            V.cosine(F.col("embedding"), F.col("q_emb")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    cos = V.sql_cosine("embedding", "qe")
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id, label, {cos} AS sim
FROM embeddings, q
ORDER BY sim DESC, vec_id ASC
LIMIT {k}
"""


def with_bucket(emb: DataFrame, band: int) -> DataFrame:
    """Attach the sign-LSH bucket id for one band."""
    planes = _planes()[band * PLANES_PER_BAND : (band + 1) * PLANES_PER_BAND]
    return emb.withColumn("bucket", V.lsh_bucket(F.col("embedding"), planes))


def lsh_ann_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Approximate top-k: scan only vectors in the query's band-0
    bucket. At scale the bucket column is a partition/cluster key, so
    this touches 1/2^planes of the data instead of all of it.

    Each vector is quantized once and its norm/bucket derived from the
    materialized array — not re-quantized per plane and per similarity
    term (see cosine_near_dup for the same pattern)."""
    base = _band0_base(emb)
    q = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("iv").alias("q_iv"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double")) * F.sqrt(F.col("q_nrm").cast("double"))
    )
    return (
        base.join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select("vec_id", "label", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def lsh_ann_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    planes = _planes()[:PLANES_PER_BAND]
    bucket = V.sql_lsh_bucket("embedding", planes)
    q_bucket = V.sql_lsh_bucket("qe", planes)
    cos = V.sql_cosine("embedding", "qe")
    return f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id})
SELECT vec_id, label, {cos} AS sim
FROM embeddings, q
WHERE ({bucket}) = ({q_bucket})
ORDER BY sim DESC, vec_id ASC
LIMIT {k}
"""


#: IVF geometry: seed-vector centroids, probe the nearest few lists.
IVF_CENTROIDS = 16
IVF_NPROBE = 4


def ivf_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF-style approximate top-k: the inverted-file counterpart to
    the LSH path.

    Coarse quantizer = the ``IVF_CENTROIDS`` stored vectors with the
    smallest vec_ids (deterministic seeds — a k-means refinement would
    drop in here without changing the query shape). Every vector is
    assigned to its nearest centroid (exact integer distance:
    |a-c|^2 = |a|^2 - 2 a.c + |c|^2, ties -> lowest centroid id); the
    query probes its ``IVF_NPROBE`` nearest lists and ranks only those
    lists' vectors by exact cosine.

    Scale shape: the centroid table collapses to ONE broadcast row
    holding an array of (cid, civ, cnrm) structs, so nearest-centroid
    assignment is a *pure projection* — ``array_min`` over the per-row
    distance structs (struct comparison orders by dist then cid, which
    is exactly the tie-break) — with no shuffle and no window. The
    earlier crossJoin+row_number formulation expanded every row 16x and
    re-shuffled the expansion on vec_id just to take an argmin; at
    100 TB that shuffle IS the job, and it is entirely avoidable. At
    rest the assignment is a partition/cluster key so a probe reads
    nprobe/nlist of the data. Returns (vec_id, label, sim).
    """
    base = fan_out(emb).select(
        "vec_id", "label", V.int_vec(F.col("embedding")).alias("iv")
    ).select("vec_id", "label", "iv", V.sq_norm_iv(F.col("iv")).alias("nrm"))

    # single-row side: sorted array of the 16 centroid structs
    cents_arr = (
        base.orderBy("vec_id")
        .limit(IVF_CENTROIDS)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cid"),
                        F.col("iv").alias("civ"),
                        F.col("nrm").alias("cnrm"),
                    )
                )
            ).alias("cs")
        )
    )
    # per-row (dist, cid) structs: dist^2 = nrm - 2*dot + cnrm (exact ints)
    dists = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            (
                F.col("nrm") - 2 * V.int_dot_iv(F.col("iv"), c["civ"]) + c["cnrm"]
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    with_d = base.crossJoin(F.broadcast(cents_arr)).withColumn("dists", dists)
    assigned = with_d.select(
        "vec_id", "label", "iv", "nrm", F.array_min("dists")["cid"].alias("list_id")
    )
    q = with_d.filter(F.col("vec_id") == query_vec_id).select(
        F.col("iv").alias("q_iv"),
        F.col("nrm").alias("q_nrm"),
        F.transform(
            F.slice(F.array_sort(F.col("dists")), 1, nprobe), lambda s: s["cid"]
        ).alias("probes"),
    )
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double")) * F.sqrt(F.col("q_nrm").cast("double"))
    )
    return (
        assigned.crossJoin(F.broadcast(q))
        .filter(F.array_contains(F.col("probes"), F.col("list_id")))
        .select("vec_id", "label", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_topk_sql(
    query_vec_id: int = 0, k: int = 10, nprobe: int = IVF_NPROBE
) -> str:
    dot_ac = V.sql_dot("embedding", "cemb")
    nrm_a = V.sql_dot("embedding", "embedding")
    nrm_c = V.sql_dot("cemb", "cemb")
    cos = V.sql_cosine("embedding", "qe")
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings
  ORDER BY vec_id LIMIT {IVF_CENTROIDS}
),
ranked AS (
  SELECT e.vec_id, e.label, e.embedding, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY ({nrm_a}) - 2 * ({dot_ac}) + ({nrm_c}) ASC, c.cid ASC
         ) AS rn
  FROM embeddings e CROSS JOIN cents c
),
assigned AS (SELECT vec_id, label, embedding, cid AS list_id FROM ranked WHERE rn = 1),
probe AS (SELECT cid AS list_id FROM ranked WHERE vec_id = {query_vec_id} AND rn <= {nprobe}),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {query_vec_id})
SELECT a.vec_id, a.label, {cos.replace('embedding', 'a.embedding')} AS sim
FROM assigned a JOIN probe USING (list_id) CROSS JOIN q
ORDER BY sim DESC, a.vec_id ASC
LIMIT {k}
"""


#: session-lifetime cache of checkpointed verified near-dup pairs
#: (``scale.plan_keyed_cache`` semantics).
_PAIR_CACHE: dict = {}

#: session-lifetime cache of checkpointed sign-LSH sketch bases —
#: the Arrow-matmul quantize+bucket pass is the ANN family's dominant
#: cost, and three entries (cosine_near_dup and everything built on
#: it, knn_graph, lsh_ann_topk/ann_recall_eval) used to rebuild it
#: per entry (round-8 verdict #1). Keyed like _PAIR_CACHE:
#: (session, analyzed emb plan, which-sketch) — a different corpus or
#: geometry can never hit a stale entry. Registered in
#: ``scale.clear_caches``.
_SKETCH_CACHE: dict = {}


def _nd_sketch_base(emb: DataFrame) -> DataFrame:
    """Checkpointed (vec_id, iv, nrm, buckets) ND sketch — ONE Arrow
    matmul per (session, emb plan), shared by ``cosine_near_dup``
    (hence embedding_near_dup / embedding_dedup_clusters / the
    near-dup audits) and ``knn_graph``."""
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    from soccerpredictor_spark.operators.scale import plan_keyed_cache

    def build() -> DataFrame:
        return _reliable_checkpoint(
            fan_out(emb)
            .select("vec_id", _nd_sketch_udf()(F.col("embedding")).alias("sk"))
            .select(
                "vec_id",
                F.col("sk.iv").alias("iv"),
                F.col("sk.nrm").alias("nrm"),
                F.col("sk.buckets").alias("buckets"),
            )
        )

    return plan_keyed_cache(_SKETCH_CACHE, emb, "nd_sketch", build)


def _band0_base(emb: DataFrame) -> DataFrame:
    """Checkpointed single-band quantized base (vec_id, label, iv,
    nrm, bucket) shared by ``lsh_ann_topk`` and ``ann_recall_eval``'s
    approximate leg (which calls lsh_ann_topk and therefore hits this
    cache on its second in-session use)."""
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    from soccerpredictor_spark.operators.scale import plan_keyed_cache

    planes = _planes()[:PLANES_PER_BAND]

    def build() -> DataFrame:
        return _reliable_checkpoint(
            fan_out(emb)
            .select("vec_id", "label", V.int_vec(F.col("embedding")).alias("iv"))
            .select(
                "vec_id",
                "label",
                "iv",
                V.sq_norm_iv(F.col("iv")).alias("nrm"),
                V.lsh_bucket_iv(F.col("iv"), planes).alias("bucket"),
            )
        )

    return plan_keyed_cache(_SKETCH_CACHE, emb, "band0", build)


def cosine_near_dup(
    emb: DataFrame,
    threshold: float = 0.25,
    max_pairs_per_row: float | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs via banded sign-LSH candidates +
    exact cosine verification.

    Candidates = pairs agreeing on ALL planes of at least one band
    (OR over bands boosts recall; AND within a band keeps buckets
    selective). Only bucket-colliding pairs are compared — the n^2
    comparison never happens. Returns (vec_a, vec_b, sim), vec_a < vec_b.

    Physical shape (the part that matters at 100 TB):
    - quantization, norms, and ALL band buckets come from one
      Arrow-batched numpy pass (``_nd_sketch_udf``: a batch x dim
      int matmul against the plane matrix) — exact integer
      arithmetic identical to the DuckDB twin, at memory bandwidth;
    - the bucket self-join and pair-dedup move only (vec_id, band,
      bucket) — the 64-wide arrays never enter a shuffle;
    - vectors are joined back to the deduped id-pairs from the compact
      ``base`` projection (broadcast when small; hash-join on vec_id
      otherwise), and verification is one vectorized elementwise
      multiply-sum per candidate batch (``_pair_dot_udf``).

    Cache discipline (round 6, tightened round 9): the sketch base —
    the Arrow matmul, this operator's dominant cost — is checkpointed
    and SESSION-cached via ``_nd_sketch_base``, so the budget guard,
    the band self-join, both verification sides, AND ``knn_graph``
    all read one materialization (previously knn_graph re-ran the
    matmul per entry); the verified-pair result is eagerly pinned
    (same mode-aware checkpoint as the minhash path). The
    ``candidate_budget_guard`` call is the no-silent-caps abort for a
    degenerate banding (round-5 verdict #6).

    The checkpointed pair set is CACHED per (session, emb plan,
    threshold, max_pairs_per_row): ``embedding_near_dup`` and
    ``embedding_dedup_clusters`` share this entire sketch + bucket +
    verify prerequisite (the ``scale.plan_keyed_cache`` contract — a
    different input or parameter can never hit a stale entry).

    Deployment config: bucket depth steps with corpus size via
    ``ND_DEPTH_LADDER`` (count-driven CASE, identical on both
    engines); past the ladder cap (depth 12) the budget guard still
    aborts loudly — a larger deployment RAISES the ladder (more
    extension planes/bands), it is not a bug. Oracle-parity caveat:
    the SQL twin derives depth from COUNT(*) of the FULL
    ``embeddings`` view (see ``_nd_depth_sql``), so pass the full
    table — a filtered subset straddling a ladder boundary would get
    a different depth than its twin.
    """
    from soccerpredictor_spark.operators.scale import plan_keyed_cache

    return plan_keyed_cache(
        _PAIR_CACHE,
        emb,
        (threshold, max_pairs_per_row),
        lambda: _cosine_near_dup_build(emb, threshold, max_pairs_per_row),
    )


def _cosine_near_dup_build(
    emb: DataFrame,
    threshold: float,
    max_pairs_per_row: float | None,
) -> DataFrame:
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    from soccerpredictor_spark.operators.scale import candidate_budget_guard

    # the sketch base is checkpointed + session-cached (_nd_sketch_base)
    # rather than persisted per-call: knn_graph and every near-dup
    # consumer read the same materialization, and downstream plans see
    # a flat scan instead of the Arrow-matmul subtree
    base = _nd_sketch_base(emb)
    # count-driven bucket depth (ND_DEPTH_LADDER): the base is an
    # eagerly checkpointed session-cached table, so this count is a
    # cheap scan of materialized blocks, and the depth is a pure
    # function of the input the SQL twin derives identically
    depth = _nd_depth(base.count())
    bnd = base.select(
        "vec_id", F.posexplode("buckets").alias("band", "bucket")
    ).withColumn("bucket", F.substring("bucket", 1, depth))
    guard_kwargs = (
        {} if max_pairs_per_row is None
        else {"max_pairs_per_row": max_pairs_per_row}
    )
    candidate_budget_guard(bnd, ["band", "bucket"], "cosine_near_dup", **guard_kwargs)
    a = bnd.alias("a")
    b = bnd.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = base.select(
        F.col("vec_id").alias("vec_a"), F.col("iv").alias("iv_a"), F.col("nrm").alias("nrm_a")
    )
    vb = base.select(
        F.col("vec_id").alias("vec_b"), F.col("iv").alias("iv_b"), F.col("nrm").alias("nrm_b")
    )
    sim = _pair_dot_udf()(F.col("iv_a"), F.col("iv_b")).cast("double") / (
        F.sqrt(F.col("nrm_a").cast("double")) * F.sqrt(F.col("nrm_b").cast("double"))
    )
    return _reliable_checkpoint(
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def cosine_near_dup_sql(threshold: float = 0.25) -> str:
    planes = _nd_all_planes()
    base_n = ND_BANDS * ND_PLANES_PER_BAND
    depth = _nd_depth_sql()
    band_selects = []
    for bi in range(ND_BANDS):
        band_planes = (
            planes[bi * ND_PLANES_PER_BAND : (bi + 1) * ND_PLANES_PER_BAND]
            + planes[base_n + bi * ND_EXT_PLANES_PER_BAND
                     : base_n + (bi + 1) * ND_EXT_PLANES_PER_BAND]
        )
        bucket = (
            f"substring(({V.sql_lsh_bucket('embedding', band_planes)}), "
            f"1, {depth})"
        )
        band_selects.append(
            f"SELECT vec_id, embedding, {bi} AS band, ({bucket}) AS bucket FROM embeddings"
        )
    bnd = " UNION ALL ".join(band_selects)
    cos = V.sql_cosine("ea", "eb")
    return f"""
WITH bnd AS ({bnd}),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         any_value(a.embedding) AS ea, any_value(b.embedding) AS eb
  FROM bnd a JOIN bnd b USING (band, bucket)
  WHERE a.vec_id < b.vec_id GROUP BY 1, 2
)
SELECT vec_a, vec_b, {cos} AS sim FROM cand
WHERE {cos} >= {threshold}
"""


# --------------------------------------------------------------------------
# per-label centroids
# --------------------------------------------------------------------------


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label mean embedding, one row per (label, dimension).

    The clustering/IVF-training primitive (and the monitoring query for
    embedding drift): posexplode the QUANTIZED int64 vector (see
    functions/vectors.py — float sums are order-dependent, int64 sums
    are exact), aggregate per (label, pos), divide back to double. One
    shuffle keyed on (label, pos) — dims x labels groups, each a
    map-side-combinable long sum, so shuffle volume is independent of
    row count at any scale.
    """
    q = fan_out(emb).select("label", V.int_vec(F.col("embedding")).alias("iv"))
    pos = q.select("label", F.posexplode("iv").alias("pos", "v"))
    return (
        pos.groupBy("label", "pos")
        .agg(
            (
                F.sum("v").cast("double") / F.count(F.lit(1)) / F.lit(V.SCALE)
            ).alias("mean_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .orderBy("label", "pos")
    )


def label_centroids_sql() -> str:
    iv = V.sql_int_vec("embedding")
    return f"""
WITH q AS (SELECT label, {iv} AS iv FROM embeddings),
p AS (SELECT label, i AS pos, iv[i + 1] AS v
      FROM q, UNNEST(range(len(iv))) AS u(i))
SELECT label, pos,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) / {V.SCALE} AS mean_val,
       COUNT(*) AS n_vectors
FROM p
GROUP BY label, pos
ORDER BY label, pos
"""


# --------------------------------------------------------------------------
# IVF with k-means (Lloyd) refinement
# --------------------------------------------------------------------------


def ivf_kmeans_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """IVF top-k with ONE Lloyd (k-means) refinement of the coarse
    quantizer — the training step real IVF indexes run before
    assignment, expressed entirely as DataFrame ops so it is
    oracle-checkable.

    Pipeline: seed centroids (lowest vec_ids) -> assign every vector
    (broadcast argmin projection, int distances) -> recompute each
    list's centroid as the per-dimension MEAN of its members ->
    re-assign against the refined centroids (double distances) ->
    probe the query's IVF_NPROBE nearest refined lists -> exact-cosine
    rank.

    Scale shape: both assignment passes are pure projections over a
    single-row broadcast centroid array (zero shuffle of the vector
    table — see ivf_topk); the refinement's only shuffle is the
    (list, dim) mean, whose map-side-combined volume is
    partitions x lists x dims, independent of row count.

    Cross-engine determinism: member sums are exact int64 (quantized
    components), means are one double division; the refined-distance
    fold is a per-row LEFT FOLD over dims in index order — Spark
    ``aggregate`` and DuckDB ``list_reduce`` evaluate the identical
    IEEE sequence, so even double distances are bit-equal. Ties break
    on lowest centroid id.
    """
    base = fan_out(emb).select(
        "vec_id", "label", V.int_vec(F.col("embedding")).alias("iv")
    ).select("vec_id", "label", "iv", V.sq_norm_iv(F.col("iv")).alias("nrm"))

    seeds = (
        base.orderBy("vec_id")
        .limit(IVF_CENTROIDS)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cid"),
                        F.col("iv").alias("civ"),
                        F.col("nrm").alias("cnrm"),
                    )
                )
            ).alias("cs")
        )
    )
    int_dists = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            (
                F.col("nrm") - 2 * V.int_dot_iv(F.col("iv"), c["civ"]) + c["cnrm"]
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    a1 = (
        base.crossJoin(F.broadcast(seeds))
        .withColumn("list_id", F.array_min(int_dists)["cid"])
        .select("vec_id", "label", "iv", "nrm", "list_id")
    )

    # Lloyd step: per-(list, dim) mean of the quantized components.
    pos = a1.select("list_id", F.posexplode("iv").alias("pos", "v"))
    cent2 = pos.groupBy("list_id", "pos").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("c")
    )
    cvec = cent2.groupBy("list_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("cv")
    )
    cents2 = cvec.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("list_id").alias("cid"), F.col("cv")))
        ).alias("cs2")
    )

    dbl_dists = F.transform(
        F.col("cs2"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("iv"),
                    c["cv"],
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    with_d2 = base.crossJoin(F.broadcast(cents2)).withColumn("d2", dbl_dists)
    assigned = with_d2.select(
        "vec_id", "label", "iv", "nrm", F.array_min("d2")["cid"].alias("list_id")
    )
    q = with_d2.filter(F.col("vec_id") == query_vec_id).select(
        F.col("iv").alias("q_iv"),
        F.col("nrm").alias("q_nrm"),
        F.transform(
            F.slice(F.array_sort(F.col("d2")), 1, IVF_NPROBE), lambda s: s["cid"]
        ).alias("probes"),
    )
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double")) * F.sqrt(F.col("q_nrm").cast("double"))
    )
    return (
        assigned.crossJoin(F.broadcast(q))
        .filter(F.array_contains(F.col("probes"), F.col("list_id")))
        .select("vec_id", "label", sim.alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_kmeans_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    iv = V.sql_int_vec("embedding")
    # int dot of two PRE-QUANTIZED lists (exact; list_sum over ints)
    dot_iv = (
        "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"
    )
    # double distance to a refined centroid: LEFT FOLD in index order
    # (list_reduce), matching Spark's aggregate over zip_with exactly.
    dbl_dist = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(range(1, len({a})+1), "
        "i -> (CAST({a}[i] AS DOUBLE) - {c}[i]) * (CAST({a}[i] AS DOUBLE) - {c}[i]))), "
        "(acc, x) -> acc + x)"
    )
    cos = V.sql_cosine("e1", "e2")
    return f"""
WITH base AS (
  SELECT vec_id, label, embedding, {iv} AS iv,
         {dot_iv.format(a=f'({iv})', b=f'({iv})')} AS nrm
  FROM embeddings
),
seeds AS (
  SELECT vec_id AS cid, iv AS civ, nrm AS cnrm FROM base
  ORDER BY vec_id LIMIT {IVF_CENTROIDS}
),
a1 AS (
  SELECT vec_id, label, iv, nrm, cid AS list_id FROM (
    SELECT b.vec_id, b.label, b.iv, b.nrm, s.cid,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY b.nrm - 2 * {dot_iv.format(a='b.iv', b='s.civ')} + s.cnrm ASC,
                      s.cid ASC
           ) AS rn
    FROM base b CROSS JOIN seeds s
  ) t WHERE rn = 1
),
cent2 AS (
  SELECT list_id, i AS pos, CAST(SUM(iv[i + 1]) AS DOUBLE) / COUNT(*) AS c
  FROM a1, UNNEST(range(len(iv))) AS u(i)
  GROUP BY list_id, i
),
cvecs AS (
  SELECT list_id, list(c ORDER BY pos) AS cv FROM cent2 GROUP BY list_id
),
a2 AS (
  SELECT vec_id, label, nrm, list_id FROM (
    SELECT b.vec_id, b.label, b.nrm, c.list_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY {dbl_dist.format(a='b.iv', c='c.cv')} ASC, c.list_id ASC
           ) AS rn
    FROM base b CROSS JOIN cvecs c
  ) t WHERE rn = 1
),
probe AS (
  SELECT list_id FROM (
    SELECT c.list_id,
           ROW_NUMBER() OVER (
             ORDER BY {dbl_dist.format(a='b.iv', c='c.cv')} ASC, c.list_id ASC
           ) AS rn
    FROM base b CROSS JOIN cvecs c
    WHERE b.vec_id = {query_vec_id}
  ) t WHERE rn <= {IVF_NPROBE}
),
q AS (SELECT embedding AS e2 FROM embeddings WHERE vec_id = {query_vec_id})
SELECT a2.vec_id, a2.label, {cos.replace('e1', 'e.embedding').replace('e2', 'q.e2')} AS sim
FROM a2
JOIN probe USING (list_id)
JOIN embeddings e ON e.vec_id = a2.vec_id
CROSS JOIN q
ORDER BY sim DESC, a2.vec_id ASC
LIMIT {k}
"""


# --------------------------------------------------------------------------
# ANN quality eval (round 4)
# --------------------------------------------------------------------------


def ann_recall_eval(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact brute-force
    top-k for one probe query: a single row
    (n_exact, n_approx, n_hit, recall).

    The acceptance gate for an approximate index: measure recall at a
    small scale factor (or a sampled query set) before routing the
    100 TB corpus through the approximate path. Both inputs are this
    module's own operators, so the eval exercises exactly the shapes
    production uses; the hit count is a broadcast join of two k-row
    results — cost is the two top-k scans, the comparison is free.

    ``recall`` is n_hit/k over the EXACT set (the denominator the
    metric is defined on); n_approx is reported so a short candidate
    list (bucket pruned below k) is visible rather than silently
    inflating recall.
    """
    # exact/approx are k-row sets each consumed TWICE (the hit
    # semi-join and their own counts) — checkpointed so the final
    # plan reads two k-row pins instead of re-running each corpus
    # TakeOrdered scan per consumer (the 2+-lazy-consumers rule).
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    exact = _reliable_checkpoint(
        cosine_topk(emb, query_vec_id, k).select("vec_id")
    )
    approx = _reliable_checkpoint(
        lsh_ann_topk(emb, query_vec_id, k).select("vec_id")
    )
    hits = exact.join(approx, "vec_id", "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_approx")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_exact",
            "n_approx",
            "n_hit",
            (F.col("n_hit").cast("double") / F.lit(float(k))).alias("recall"),
        )
    )


def ann_recall_eval_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH exact_k AS (SELECT vec_id FROM ({cosine_topk_sql(query_vec_id, k)}) e),
approx_k AS (SELECT vec_id FROM ({lsh_ann_topk_sql(query_vec_id, k)}) a),
hit AS (SELECT vec_id FROM exact_k WHERE vec_id IN (SELECT vec_id FROM approx_k))
SELECT (SELECT COUNT(*) FROM exact_k) AS n_exact,
       (SELECT COUNT(*) FROM approx_k) AS n_approx,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE) / {float(k)} AS recall
"""


#: recall@k rungs measured by :func:`ann_recall_k_sweep`.
RECALL_K_RUNGS = (1, 2, 5, 10, 20)
#: probe query vector ids for the multi-probe recall sweep (the
#: deterministic low-id convention the IVF centroids also use).
RECALL_PROBE_IDS = (0, 1, 2, 3)
#: salt fan-out for the two-level exact top-k (stage-1 local ranks).
_RECALL_SALT = 32


def ann_recall_k_sweep(emb: DataFrame) -> DataFrame:
    """Recall-vs-k curve for the sign-LSH ANN index over a PROBE SET —
    the operating-curve readout :func:`ann_recall_eval` (one probe,
    one fixed k) can't give: how recall decays (or holds) as the
    requested neighbor count k grows, aggregated over
    ``RECALL_PROBE_IDS``. The acceptance artifact for choosing k
    before routing a 100 TB corpus through the approximate path: a
    k where recall collapses means the single-band bucket is
    exhausted and the index needs more bands or probes, and the
    n_approx column shows the exhaustion directly (bucket pruned
    below k inflates nothing — the :func:`ann_recall_eval`
    convention, per rung).

    Engine shape: the cached single-band quantized base
    (``_band0_base``) is scanned twice — once crossJoined against
    the broadcast 4-row probe table for the exact leg, once
    bucket-equi-joined for the approximate leg. Per-probe exact
    top-maxK is the TWO-LEVEL rank (stage 1 ranks within
    (probe, vec_id % salt) and keeps maxK — an exact superset of the
    global top-maxK; stage 2 ranks the surviving
    probes x salt x maxK rows), never a single-partition global
    window: with 4 probe groups a flat window would funnel the whole
    corpus through 4 reducers. Both ranked lists are checkpointed
    (every rung reads them); every rung aggregate runs over
    <= |probes| * maxK rows.

    Output: (k, n_exact, n_approx, n_hit, recall), k-ordered;
    recall = n_hit / n_exact summed over probes, NULL on an empty
    corpus (never 0/0).
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    spark = emb.sparkSession
    max_k = max(RECALL_K_RUNGS)
    base = _band0_base(emb)
    probes = base.filter(
        F.col("vec_id").isin(list(RECALL_PROBE_IDS))
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("iv").alias("q_iv"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double"))
        * F.sqrt(F.col("q_nrm").cast("double"))
    )

    from pyspark.sql.window import Window

    def ranked(cand: DataFrame) -> DataFrame:
        w1 = Window.partitionBy("probe_id", "salt").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
        w2 = Window.partitionBy("probe_id").orderBy(
            F.col("sim").desc(), F.col("vec_id").asc()
        )
        local = (
            cand.withColumn("salt", F.col("vec_id") % _RECALL_SALT)
            .withColumn("lr", F.row_number().over(w1))
            .filter(F.col("lr") <= max_k)
        )
        return _reliable_checkpoint(
            local.withColumn("rnk", F.row_number().over(w2))
            .filter(F.col("rnk") <= max_k)
            .select("probe_id", "vec_id", "rnk")
        )

    exact_r = ranked(
        base.crossJoin(F.broadcast(probes)).select(
            "probe_id", "vec_id", sim.alias("sim")
        )
    )
    approx_r = ranked(
        base.join(
            F.broadcast(probes), F.col("bucket") == F.col("q_bucket")
        ).select("probe_id", "vec_id", sim.alias("sim"))
    )
    hits = exact_r.join(
        approx_r.select(
            "probe_id", "vec_id", F.col("rnk").alias("rnk_a")
        ),
        ["probe_id", "vec_id"],
    )
    spine = spark.createDataFrame(
        [(int(k),) for k in RECALL_K_RUNGS], "k long"
    )
    n_exact_k = (
        spine.join(F.broadcast(exact_r), F.col("rnk") <= F.col("k"), "left")
        .groupBy("k")
        .agg(F.count("rnk").alias("n_exact"))
    )
    n_approx_k = (
        spine.join(F.broadcast(approx_r), F.col("rnk") <= F.col("k"), "left")
        .groupBy("k")
        .agg(F.count("rnk").alias("n_approx"))
    )
    n_hit_k = (
        spine.join(
            F.broadcast(hits),
            (F.col("rnk") <= F.col("k")) & (F.col("rnk_a") <= F.col("k")),
            "left",
        )
        .groupBy("k")
        .agg(F.count("rnk").alias("n_hit"))
    )
    recall = F.when(F.col("n_exact") == 0, F.lit(None)).otherwise(
        F.col("n_hit").cast("double") / F.col("n_exact").cast("double")
    )
    return (
        n_exact_k.join(n_approx_k, "k")
        .join(n_hit_k, "k")
        .select("k", "n_exact", "n_approx", "n_hit", recall.alias("recall"))
        .orderBy("k")
    )


def ann_recall_k_sweep_sql() -> str:
    """DuckDB twin of :func:`ann_recall_k_sweep` — identical probe
    set, single-band bucket restriction, rank windows (flat windows
    are fine at oracle scale) and per-rung counts."""
    planes = _planes()[:PLANES_PER_BAND]
    bucket = V.sql_lsh_bucket("e.embedding", planes)
    q_bucket = V.sql_lsh_bucket("q.embedding", planes)
    cos = V.sql_cosine("e.embedding", "q.embedding")
    probe_list = ", ".join(str(p) for p in RECALL_PROBE_IDS)
    rung_vals = ", ".join(f"({int(k)})" for k in RECALL_K_RUNGS)
    max_k = max(RECALL_K_RUNGS)
    return f"""
WITH probes AS (
  SELECT vec_id AS probe_id, embedding FROM embeddings
  WHERE vec_id IN ({probe_list})
),
exact_r AS (
  SELECT probe_id, vec_id, rnk FROM (
    SELECT q.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.probe_id
                              ORDER BY {cos} DESC, e.vec_id ASC) AS rnk
    FROM embeddings e CROSS JOIN probes q
  ) WHERE rnk <= {max_k}
),
approx_r AS (
  SELECT probe_id, vec_id, rnk FROM (
    SELECT q.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY q.probe_id
                              ORDER BY {cos} DESC, e.vec_id ASC) AS rnk
    FROM embeddings e JOIN probes q ON ({bucket}) = ({q_bucket})
  ) WHERE rnk <= {max_k}
),
hits AS (
  SELECT x.probe_id, x.vec_id, x.rnk, a.rnk AS rnk_a
  FROM exact_r x JOIN approx_r a USING (probe_id, vec_id)
),
spine(k) AS (VALUES {rung_vals})
SELECT CAST(s.k AS BIGINT) AS k,
       (SELECT COUNT(*) FROM exact_r WHERE rnk <= s.k) AS n_exact,
       (SELECT COUNT(*) FROM approx_r WHERE rnk <= s.k) AS n_approx,
       (SELECT COUNT(*) FROM hits WHERE rnk <= s.k AND rnk_a <= s.k)
         AS n_hit,
       CASE WHEN (SELECT COUNT(*) FROM exact_r WHERE rnk <= s.k) = 0
            THEN NULL
            ELSE CAST((SELECT COUNT(*) FROM hits
                       WHERE rnk <= s.k AND rnk_a <= s.k) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM exact_r
                         WHERE rnk <= s.k) AS DOUBLE) END AS recall
FROM spine s
ORDER BY s.k
"""


def embedding_dedup_clusters(
    emb: DataFrame,
    threshold: float = 0.25,
    max_iter: int = 20,
    max_pairs_per_row: float | None = None,
) -> DataFrame:
    """Connected components of the embedding near-duplicate graph:
    (vec_id, cluster_id), cluster_id = smallest vec_id reachable
    through pairs with cosine similarity >= ``threshold``.

    The vector-side canonical-selection step that completes the
    embedding dedup pipeline (near-dup pairs -> components -> keep
    min-id per component), composing ``cosine_near_dup`` with the same
    min-label propagation used by the text-side ``dedup_clusters`` —
    identical scale story: LSH-restricted pair generation, one shuffle
    join per propagation round, mode-aware checkpoint cutting the
    iterative plan.
    """
    from soccerpredictor_spark.operators.dedup import _components_from_pairs

    pairs = cosine_near_dup(emb, threshold, max_pairs_per_row=max_pairs_per_row).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = _components_from_pairs(pairs, max_iter)
    return comp.select(
        F.col("doc_id").alias("vec_id"), F.col("cluster_id")
    ).orderBy("vec_id")


def embedding_dedup_clusters_sql(threshold: float = 0.25) -> str:
    """Recursive-CTE twin over the cosine_near_dup pair set."""
    pairs = cosine_near_dup_sql(threshold)
    return f"""
WITH RECURSIVE
pairs AS MATERIALIZED (SELECT vec_a, vec_b FROM ({pairs}) p),
edges AS MATERIALIZED (SELECT vec_a AS a, vec_b AS b FROM pairs
          UNION SELECT vec_b, vec_a FROM pairs),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges) v
  UNION
  SELECT e.a, r.b FROM edges e JOIN reach r ON e.b = r.a
)
SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a ORDER BY vec_id
"""


# --------------------------------------------------------------------------
# int8 scalar-quantized inner-product search
# --------------------------------------------------------------------------


def _int8_codes(col):
    """Per-vector symmetric int8 scalar quantization: one double scale
    (max|x|/127) + codes in [-127, 127]. floor(x/s + 0.5) — NOT
    round() — so tie behavior is identical across engines; a zero
    vector gets all-zero codes (s = 0 guard)."""
    mx = F.array_max(F.transform(col, lambda x: F.abs(x.cast("double"))))
    s = mx / F.lit(127.0)
    zero = F.transform(col, lambda x: F.lit(0).cast("long"))
    codes = F.when(s == F.lit(0.0), zero).otherwise(
        F.transform(col, lambda x: F.floor(x.cast("double") / s + F.lit(0.5)).cast("long"))
    )
    return s, codes


def int8_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Top-k by inner product over int8 scalar-quantized vectors —
    the 4x-compression MIPS path of a vector store (codes ride in a
    quarter of the memory/shuffle bytes; the reconstruction is
    dot(q_a, q_b) * s_a * s_b).

    Scale shape: codes + scale are derived ONCE per row in a pure
    projection; the single-row query side broadcasts; ranking is
    TakeOrderedAndProject (per-partition heaps). Zero shuffle — at
    100 TB this is one compressed scan, and the same codes column is
    what you'd persist as the serving index.

    Cross-engine determinism: the code dot is exact int64 arithmetic;
    the only FP steps (scale derivation, final rescale multiply) are
    the identical correctly-rounded expression in both engines.
    """
    s, codes = _int8_codes(F.col("embedding"))
    coded = fan_out(emb).select(
        "vec_id", "label", s.alias("s"), codes.alias("codes")
    )
    qs, qcodes = _int8_codes(F.col("embedding"))
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        qs.alias("qs"), qcodes.alias("qcodes")
    )
    sim = (
        V.int_dot_iv(F.col("codes"), F.col("qcodes")).cast("double")
        * (F.col("s") * F.col("qs"))
    )
    return (
        coded.crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("sim_int8"))
        .orderBy(F.col("sim_int8").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def _sql_int8(col: str) -> tuple[str, str]:
    s = f"(list_max(list_transform({col}, x -> abs(CAST(x AS DOUBLE)))) / 127.0)"
    codes = (
        f"CASE WHEN {s} = 0.0 THEN list_transform({col}, x -> CAST(0 AS BIGINT)) "
        f"ELSE list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) / {s} + 0.5) AS BIGINT)) END"
    )
    return s, codes


def int8_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    s, codes = _sql_int8("embedding")
    dot = (
        "list_sum(list_transform(range(1, len(codes)+1), i -> codes[i] * qcodes[i]))"
    )
    return f"""
WITH coded AS (
  SELECT vec_id, label, {s} AS s, {codes} AS codes FROM embeddings
),
q AS (
  SELECT {s} AS qs, {codes} AS qcodes FROM embeddings WHERE vec_id = {query_vec_id}
)
SELECT vec_id, label,
       CAST({dot} AS DOUBLE) * (s * qs) AS sim_int8
FROM coded, q
ORDER BY sim_int8 DESC, vec_id ASC
LIMIT {k}
"""


def embedding_quality(emb: DataFrame) -> DataFrame:
    """Embedding-hygiene audit per label: vector count, dimension
    spread, zero-vector count, and the min/max quantized squared norm
    — the sanity gate you run before spending ANN/dedup cycles on a
    100 TB vector table (dead/degenerate vectors poison both).

    All statistics are exact int64 arithmetic on the quantized
    components (sq_norm = int_dot(v, v)); one partial-agg shuffle of
    5 longs per label — vectors never leave the scan.
    """
    iv = V.int_vec(F.col("embedding"))
    sq = V.sq_norm_iv(iv)
    return (
        fan_out(emb)
        .select(
            "label",
            F.size(F.col("embedding")).alias("dim"),
            sq.alias("sq_norm"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            F.sum((F.col("sq_norm") == 0).cast("long")).alias("n_zero"),
            F.min("sq_norm").alias("min_sq_norm"),
            F.max("sq_norm").alias("max_sq_norm"),
        )
        .orderBy("label")
    )


def embedding_quality_sql() -> str:
    sq = V.sql_dot("embedding", "embedding")
    return f"""
WITH per_vec AS (
  SELECT label, len(embedding) AS dim, {sq} AS sq_norm FROM embeddings
)
SELECT label,
       COUNT(*) AS n_vecs,
       MIN(dim) AS min_dim,
       MAX(dim) AS max_dim,
       CAST(SUM(CASE WHEN sq_norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(MIN(sq_norm) AS BIGINT) AS min_sq_norm,
       CAST(MAX(sq_norm) AS BIGINT) AS max_sq_norm
FROM per_vec
GROUP BY label
ORDER BY label
"""


def int8_recall_eval(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Scalar-quantization acceptance gate: overlap@k of the int8 MIPS
    ranking (``int8_topk`` — 127-level codes, 4x compressed) against
    the full-precision inner-product ranking on the same query —
    the measurement that justifies (or vetoes) shipping the compressed
    codes as the serving index, exactly as ``ann_recall_eval`` gates
    the LSH path against brute force.

    Both rankings are TakeOrdered heaps over pure scan projections
    (zero shuffle); the comparison joins two k-row sets. Exact int64
    dot arithmetic on both sides keeps the twins bit-identical.
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        V.int_vec(F.col("embedding")).alias("qiv")
    )
    ref = (
        fan_out(emb)
        .select("vec_id", V.int_vec(F.col("embedding")).alias("iv"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", V.int_dot_iv(F.col("iv"), F.col("qiv")).alias("dot"))
        .orderBy(F.col("dot").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id")
    )
    # ref/approx are k-row sets each consumed TWICE (the hit join and
    # their own counts) — checkpointed so the final plan reads two
    # k-row pins instead of re-running each corpus TakeOrdered scan
    # per consumer (the 2+-lazy-consumers rule).
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    ref = _reliable_checkpoint(ref)
    approx = _reliable_checkpoint(int8_topk(emb, query_vec_id, k).select("vec_id"))
    hit = ref.join(approx, "vec_id")
    return (
        ref.agg(F.count(F.lit(1)).alias("n_ref"))
        .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_int8")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_ref",
            "n_int8",
            "n_hit",
            (F.col("n_hit").cast("double") / F.lit(float(k))).alias("overlap_at_k"),
        )
    )


def int8_recall_eval_sql(query_vec_id: int = 0, k: int = 10) -> str:
    dot = (
        "list_sum(list_transform(range(1, len(iv)+1), i -> iv[i] * qiv[i]))"
    )
    iv = V.sql_int_vec("embedding")
    return f"""
WITH base AS (SELECT vec_id, {iv} AS iv FROM embeddings),
q AS (SELECT {iv} AS qiv FROM embeddings WHERE vec_id = {query_vec_id}),
ref AS (
  SELECT vec_id FROM base, q
  ORDER BY CAST({dot} AS BIGINT) DESC, vec_id ASC LIMIT {k}
),
approx AS (SELECT vec_id FROM ({int8_topk_sql(query_vec_id, k)}) a),
hit AS (SELECT vec_id FROM ref WHERE vec_id IN (SELECT vec_id FROM approx))
SELECT (SELECT COUNT(*) FROM ref) AS n_ref,
       (SELECT COUNT(*) FROM approx) AS n_int8,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE) / {float(k)} AS overlap_at_k
"""


# --------------------------------------------------------------------------
# kNN graph (all-vectors top-k neighbors over LSH candidates)
# --------------------------------------------------------------------------

#: neighbors per vector in the kNN graph.
KNN_GRAPH_K = 5


def knn_graph(emb: DataFrame, k: int = KNN_GRAPH_K) -> DataFrame:
    """Top-k nearest neighbors for EVERY vector (the kNN-graph build
    behind dedup clustering, label propagation, and graph-based ANN
    indexes), restricted to sign-LSH bucket candidates — the batch
    generalization of the single-query ANN operators.

    Shape: identical candidate generation to ``cosine_near_dup``
    (sketch once via the Arrow matmul, bucket self-join on id-only
    rows, budget-guarded). Candidates are UNDIRECTED (a < b) so the
    symmetric exact int64 cosine runs ONCE per pair (half the Arrow
    batches and half the dedup shuffle); both directions are then
    restored by a projection-only union before the per-source rank
    window — count-bounded output of k rows per vector. Recall caveat
    documented as for all LSH paths: vectors sharing no bucket are
    not candidates (the oracle twin reproduces the same bucket
    structure, so results match exactly).

    The RANKED graph is checkpointed and SESSION-cached per
    (emb plan, k) — ``mutual_knn``'s reciprocity self-join consumes
    the directed list TWICE (both legs), and without the cut each leg
    re-instantiated the union + rank window over the verified pairs
    (round-15 sf1x reading: mutual_knn 22.3 s vs knn_graph's 8.9 —
    the classic 2+-lazy-consumers shape this repo checkpoints on
    sight). The table is n*k rows — tiny next to what builds it.

    Deployment config + parity caveat as for ``cosine_near_dup``:
    bucket depth is the count-driven ``ND_DEPTH_LADDER`` (raise the
    ladder past depth 12 for larger corpora; the guard aborts loudly
    meanwhile), and the SQL twin counts the FULL ``embeddings`` view
    (``_nd_depth_sql``) — subset inputs near a 2048/8192 boundary
    would diverge from their oracle.
    """
    from soccerpredictor_spark.operators.scale import plan_keyed_cache

    return plan_keyed_cache(
        _PAIR_CACHE, emb, ("knn_graph", k), lambda: _knn_graph_build(emb, k)
    )


def _knn_graph_build(emb: DataFrame, k: int) -> DataFrame:
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    from soccerpredictor_spark.operators.scale import candidate_budget_guard
    from pyspark.sql.window import Window as W

    base = _nd_sketch_base(emb)
    depth = _nd_depth(base.count())  # see ND_DEPTH_LADDER
    bnd = base.select(
        "vec_id", F.posexplode("buckets").alias("band", "bucket")
    ).withColumn("bucket", F.substring("bucket", 1, depth))
    candidate_budget_guard(bnd, ["band", "bucket"], "knn_graph")
    a = bnd.alias("a")
    b = bnd.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    va = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("iv").alias("iv_a"),
        F.col("nrm").alias("nrm_a"),
    )
    vb = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("iv").alias("iv_b"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = _pair_dot_udf()(F.col("iv_a"), F.col("iv_b")).cast("double") / (
        F.sqrt(F.col("nrm_a").cast("double"))
        * F.sqrt(F.col("nrm_b").cast("double"))
    )
    # materialize the half-sized sims ONCE (mode-aware checkpoint);
    # without the cut the union's two branches would each re-run
    # the join + Arrow dot subtree (exchange reuse does not span
    # the differing projections above it).
    undirected = _reliable_checkpoint(
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("sim"))
    )
    directed = undirected.unionAll(
        undirected.select(
            F.col("vec_b").alias("vec_a"),
            F.col("vec_a").alias("vec_b"),
            "sim",
        )
    )
    w = W.partitionBy("vec_a").orderBy(F.col("sim").desc(), F.col("vec_b").asc())
    return _reliable_checkpoint(
        directed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("vec_a", "vec_b", "sim", "rnk")
    )


def knn_graph_sql(k: int = KNN_GRAPH_K) -> str:
    planes = _nd_all_planes()
    base_n = ND_BANDS * ND_PLANES_PER_BAND
    depth = _nd_depth_sql()
    band_selects = []
    for bi in range(ND_BANDS):
        band_planes = (
            planes[bi * ND_PLANES_PER_BAND : (bi + 1) * ND_PLANES_PER_BAND]
            + planes[base_n + bi * ND_EXT_PLANES_PER_BAND
                     : base_n + (bi + 1) * ND_EXT_PLANES_PER_BAND]
        )
        bucket = (
            f"substring(({V.sql_lsh_bucket('embedding', band_planes)}), "
            f"1, {depth})"
        )
        band_selects.append(
            f"SELECT vec_id, embedding, {bi} AS band, ({bucket}) AS bucket FROM embeddings"
        )
    bnd = " UNION ALL ".join(band_selects)
    cos = V.sql_cosine("ea", "eb")
    return f"""
WITH bnd AS ({bnd}),
cand AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         any_value(a.embedding) AS ea, any_value(b.embedding) AS eb
  FROM bnd a JOIN bnd b USING (band, bucket)
  WHERE a.vec_id <> b.vec_id GROUP BY 1, 2
),
sims AS (SELECT vec_a, vec_b, {cos} AS sim FROM cand)
SELECT vec_a, vec_b, sim, rnk FROM (
  SELECT vec_a, vec_b, sim,
         row_number() OVER (PARTITION BY vec_a
                            ORDER BY sim DESC, vec_b ASC) AS rnk
  FROM sims
) r WHERE rnk <= {k}
"""


# --------------------------------------------------------------------------
# per-label embedding outliers (distance to own-label centroid)
# --------------------------------------------------------------------------

#: outliers reported per label.
OUTLIERS_PER_LABEL = 5
#: per-operator quantization (1e3): coarser than vectors.SCALE so the
#: n-scaled deviation squares stay inside DECIMAL(38,0) at any n.
OUTLIER_SCALE = 1_000.0


def embedding_outliers(emb: DataFrame, top_n: int = OUTLIERS_PER_LABEL) -> DataFrame:
    """The ``top_n`` vectors FARTHEST from their own label's centroid,
    per label — the mislabeled-example / embedding-drift screen a
    curation pipeline runs before training on labeled embeddings.

    Exactness: with x quantized to int (scale 1e3) and per-label dim
    sums s, n, squared distance to the centroid satisfies

        dist2 = Σ_i (x_i - s_i/n)^2 = Σ_i (n·x_i - s_i)^2 / n^2

    — the numerator is EXACT integer arithmetic (per-term products in
    DECIMAL(38,0); n·x fits int64 for any realistic per-label count),
    so the ranking is bit-deterministic; only the final /n^2/scale^2
    display division is double. Shape: pos-exploded rows broadcast-join
    the (label, dim)-sums table (labels x dims rows — tiny at any
    scale), the per-vector numerator is a map-side-combinable decimal
    sum (one shuffle keyed on vec_id), and the per-label top-n is a
    count-bounded rank window.
    """
    from pyspark.sql.window import Window as W

    iv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(OUTLIER_SCALE)).cast("long"),
    )
    pos = fan_out(emb).select(
        "vec_id", "label", F.posexplode(iv).alias("pos", "x")
    )
    sums = pos.groupBy("label", "pos").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    dev = (F.col("n") * F.col("x") - F.col("s")).cast("decimal(19,0)")
    per_vec = (
        pos.join(F.broadcast(sums), ["label", "pos"])
        .select("vec_id", "label", "n", (dev * dev).alias("term"))
        .groupBy("vec_id", "label")
        .agg(F.sum("term").alias("num"), F.max("n").alias("n_label"))
    )
    dist2 = F.col("num").cast("double") / (
        F.col("n_label").cast("double")
        * F.col("n_label").cast("double")
        * F.lit(OUTLIER_SCALE * OUTLIER_SCALE)
    )
    w = W.partitionBy("label").orderBy(F.col("num").desc(), F.col("vec_id").asc())
    return (
        per_vec.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_n)
        .select("label", "vec_id", "n_label", dist2.alias("dist2"), "rnk")
        .orderBy("label", "rnk")
    )


def embedding_outliers_sql(top_n: int = OUTLIERS_PER_LABEL) -> str:
    s = OUTLIER_SCALE
    return f"""
WITH q AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT)) AS iv
  FROM embeddings
),
p AS (SELECT vec_id, label, i AS pos, iv[i + 1] AS x
      FROM q, UNNEST(range(len(iv))) AS u(i)),
sums AS (SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s, COUNT(*) AS n
         FROM p GROUP BY label, pos),
per_vec AS (
  SELECT vec_id, p.label,
         SUM(CAST(n * x - s AS DECIMAL(19,0)) * CAST(n * x - s AS DECIMAL(19,0)))
           AS num,
         MAX(n) AS n_label
  FROM p JOIN sums ON p.label = sums.label AND p.pos = sums.pos
  GROUP BY vec_id, p.label
)
SELECT label, vec_id, n_label,
       CAST(num AS DOUBLE)
         / (CAST(n_label AS DOUBLE) * CAST(n_label AS DOUBLE) * {s * s}) AS dist2,
       rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY label
                               ORDER BY num DESC, vec_id ASC) AS rnk
  FROM per_vec
) r WHERE rnk <= {top_n}
ORDER BY label, rnk
"""


# --------------------------------------------------------------------------
# product quantization (PQ) top-k
# --------------------------------------------------------------------------

#: PQ layout: EMB_DIM dims split into PQ_M subspaces of PQ_SUBDIM,
#: PQ_K centroids per subspace (codes fit a nibble; a 64-dim float
#: vector compresses to PQ_M bytes + the shared codebook).
PQ_EMB_DIM = 64
PQ_M = 4
PQ_SUBDIM = PQ_EMB_DIM // PQ_M
PQ_K = 16


def pq_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Approximate top-k by product quantization with asymmetric
    distance (ADC) — the memory-bound ANN standard (Jegou et al.,
    "Product Quantization for Nearest Neighbor Search"): each vector
    is encoded as PQ_M independent sub-codes; the query's distance to
    a vector is the SUM of its per-subspace distances to the chosen
    sub-centroids.

    Codebooks are deterministic seed selections (the lowest-vec_id
    rows' subvectors — the same convention as ``ivf_topk``'s coarse
    quantizer), so the whole pipeline is oracle-checkable. Encoding
    chooses, per subspace, the centroid minimizing the EXACT int64
    squared distance (ties -> lowest centroid id); the ADC lookup
    reuses that choice to fetch the query's int64 distance to the
    same centroid, so approx_dist stays exact int64 end-to-end.
    Exact cosine is then computed for the k SURVIVORS only (the PQ
    point: full-precision work is O(k), not O(n)).

    Scale shape: the codebook + query are ONE broadcast row; encoding
    and ADC are pure scan-side projections (zero shuffle of the
    vector table); top-k plans as TakeOrderedAndProject; the exact
    rerank joins k ids back against the base projection.
    """
    base = fan_out(emb).select(
        "vec_id", "label", V.int_vec(F.col("embedding")).alias("iv")
    )
    subs = base.select(
        "vec_id",
        "label",
        "iv",
        *[
            F.slice("iv", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias(f"sub{s}")
            for s in range(PQ_M)
        ],
    )
    cb = (
        subs.orderBy("vec_id")
        .limit(PQ_K)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cid"),
                        *[F.col(f"sub{s}").alias(f"csub{s}") for s in range(PQ_M)],
                    )
                )
            ).alias("cb")
        )
    )
    q = (
        subs.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("iv").alias("q_iv"),
            *[F.col(f"sub{s}").alias(f"qsub{s}") for s in range(PQ_M)],
        )
    )

    def _sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    # per subspace: argmin over the broadcast codebook by (own dist,
    # cid), carrying the query's distance to the SAME centroid — the
    # ADC table lookup fused into the encoding projection.
    # Factory closure, NOT `lambda c, s=s`: a two-parameter HOF lambda
    # binds its second param to the element INDEX (the bm25 trap).
    def _chosen_qd(s: int):
        def per_centroid(c):
            return F.struct(
                _sqdist(F.col(f"sub{s}"), c[f"csub{s}"]).alias("d"),
                c["cid"].alias("cid"),
                _sqdist(F.col(f"qsub{s}"), c[f"csub{s}"]).alias("qd"),
            )

        return F.array_min(F.transform(F.col("cb"), per_centroid))["qd"]

    chosen = [_chosen_qd(s) for s in range(PQ_M)]
    approx = (
        subs.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            "iv",
            "q_iv",
            sum(chosen[1:], chosen[0]).alias("approx_dist"),
        )
    )
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(V.sq_norm_iv(F.col("iv")).cast("double"))
        * F.sqrt(V.sq_norm_iv(F.col("q_iv")).cast("double"))
    )
    return (
        approx.orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", "label", "approx_dist", sim.alias("sim"))
        .orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
    )


def pq_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    iv = V.sql_int_vec("embedding")
    # exact int64 squared distance between two already-quantized
    # sub-lists (list_sum over ints — order-independent, exact)
    sq = (
        "list_sum(list_transform(range(1, {n}+1),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    subcols = ", ".join(
        f"(({iv})[{s * PQ_SUBDIM + 1}:{(s + 1) * PQ_SUBDIM}]) AS sub{s}"
        for s in range(PQ_M)
    )
    d_vc = sq.format(n=PQ_SUBDIM, a="e.sub", b="c.csub")
    d_qc = sq.format(n=PQ_SUBDIM, a="q.qsub", b="c.csub")
    return f"""
WITH subs AS (
  SELECT vec_id, label, {iv} AS ivq, {subcols} FROM embeddings
),
cb AS (
  SELECT vec_id AS cid, {", ".join(f"sub{s} AS csub{s}" for s in range(PQ_M))}
  FROM subs ORDER BY vec_id LIMIT {PQ_K}
),
qrow AS (SELECT ivq AS q_iv,
                {", ".join(f"sub{s} AS qsub{s}" for s in range(PQ_M))}
         FROM subs WHERE vec_id = {query_vec_id}),
unp AS (
  SELECT e.vec_id, e.label, e.ivq, s.s,
         CASE s.s {" ".join(f"WHEN {s} THEN e.sub{s}" for s in range(PQ_M))}
         END AS sub,
         CASE s.s {" ".join(f"WHEN {s} THEN q.qsub{s}" for s in range(PQ_M))}
         END AS qsub
  FROM subs e CROSS JOIN qrow q
       CROSS JOIN (SELECT unnest(range({PQ_M})) AS s) s
),
cbu AS (
  SELECT cid, s.s,
         CASE s.s {" ".join(f"WHEN {s} THEN csub{s}" for s in range(PQ_M))}
         END AS csub
  FROM cb CROSS JOIN (SELECT unnest(range({PQ_M})) AS s) s
),
enc AS (
  SELECT u.vec_id, u.label, u.s,
         {sq.format(n=PQ_SUBDIM, a="u.qsub", b="c.csub")} AS qd,
         ROW_NUMBER() OVER (
           PARTITION BY u.vec_id, u.s
           ORDER BY {sq.format(n=PQ_SUBDIM, a="u.sub", b="c.csub")} ASC,
                    c.cid ASC
         ) AS rn
  FROM unp u JOIN cbu c USING (s)
),
adc AS (
  SELECT vec_id, CAST(SUM(qd) AS BIGINT) AS approx_dist
  FROM enc WHERE rn = 1 GROUP BY vec_id
),
topk AS (
  SELECT a.vec_id, a.approx_dist FROM adc a
  ORDER BY a.approx_dist ASC, a.vec_id ASC LIMIT {k}
)
SELECT t.vec_id, e.label, t.approx_dist,
       CAST(list_sum(list_transform(range(1, {PQ_EMB_DIM}+1),
              i -> e.ivq[i] * q.q_iv[i])) AS DOUBLE)
         / (sqrt(CAST(list_sum(list_transform(range(1, {PQ_EMB_DIM}+1),
                i -> e.ivq[i] * e.ivq[i])) AS DOUBLE))
            * sqrt(CAST(list_sum(list_transform(range(1, {PQ_EMB_DIM}+1),
                i -> q.q_iv[i] * q.q_iv[i])) AS DOUBLE))) AS sim
FROM topk t JOIN subs e USING (vec_id) CROSS JOIN qrow q
ORDER BY t.approx_dist ASC, t.vec_id ASC
"""


def centroid_shift(emb: DataFrame) -> DataFrame:
    """Per-label embedding drift: the distance between the centroid of
    the even-vec_id half and the odd-vec_id half of each label — the
    two-sample drift monitor you run between data snapshots (the
    halves stand in for "yesterday vs today"; any boolean split column
    works).

    Exactness (the ``embedding_outliers`` convention): with per-half
    dim sums s_a, s_b and counts n_a, n_b, the centroid difference in
    dim i is s_a/n_a - s_b/n_b = (s_a*n_b - s_b*n_a) / (n_a*n_b); the
    numerator is exact int64, its square accumulates in DECIMAL(38,0)
    (order-independent), and only the final sqrt/normalize is double.
    Shape: one pos-exploded aggregation to (label, half, dim) sums —
    labels x 2 x dims rows — then a label-keyed pivot join of the two
    tiny halves; the vector table shuffles once (map-side-combined).
    """
    iv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * F.lit(OUTLIER_SCALE)).cast("long"),
    )
    pos = fan_out(emb).select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("even"),
        F.posexplode(iv).alias("pos", "x"),
    )
    sums = pos.groupBy("label", "even", "pos").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = sums.filter(F.col("even")).select(
        "label", "pos", F.col("s").alias("s_a"), F.col("n").alias("n_a")
    )
    b = sums.filter(~F.col("even")).select(
        "label", "pos", F.col("s").alias("s_b"), F.col("n").alias("n_b")
    )
    diff = (
        F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")
    ).cast("decimal(19,0)")
    per_label = (
        a.join(b, ["label", "pos"])
        .select("label", "n_a", "n_b", (diff * diff).alias("term"))
        .groupBy("label")
        .agg(
            F.sum("term").alias("num"),
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
        )
    )
    shift = F.sqrt(F.col("num").cast("double")) / (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        * F.lit(OUTLIER_SCALE)
    )
    return per_label.select("label", "n_a", "n_b", shift.alias("shift"))


def centroid_shift_sql() -> str:
    s = OUTLIER_SCALE
    return f"""
WITH q AS (
  SELECT vec_id, label, vec_id % 2 = 0 AS even,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {s}) AS BIGINT)) AS iv
  FROM embeddings
),
p AS (SELECT label, even, i AS pos, iv[i + 1] AS x
      FROM q, UNNEST(range(len(iv))) AS u(i)),
sums AS (SELECT label, even, pos, CAST(SUM(x) AS BIGINT) AS sm, COUNT(*) AS n
         FROM p GROUP BY label, even, pos),
a AS (SELECT label, pos, sm AS s_a, n AS n_a FROM sums WHERE even),
b AS (SELECT label, pos, sm AS s_b, n AS n_b FROM sums WHERE NOT even),
per_label AS (
  SELECT label,
         SUM(CAST(s_a * n_b - s_b * n_a AS DECIMAL(19,0))
             * CAST(s_a * n_b - s_b * n_a AS DECIMAL(19,0))) AS num,
         MAX(n_a) AS n_a, MAX(n_b) AS n_b
  FROM a JOIN b USING (label, pos) GROUP BY label
)
SELECT label, n_a, n_b,
       sqrt(CAST(num AS DOUBLE))
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * {float(s)!r}) AS shift
FROM per_label
"""


# --------------------------------------------------------------------------
# top principal direction via exact-integer covariance power iteration
# --------------------------------------------------------------------------

#: embedding quantization for the PCA sufficient statistics (fixed
#: point, round-half-away-from-zero in both engines). Two digits is
#: deliberate: the exact-decimal ladder of the SECOND power step is
#: v2 <= d^2 * C^2 with C <= 2*(3*PCA_Q)^2*n^2, so q=100 keeps two
#: unrolled steps inside decimal(38,0) up to PCA_EXACT_MAX_ROWS.
PCA_Q = 100
#: beyond this many vectors the second power step can overflow the
#: exact decimal(38,0) ladder -> the operator raises; at corpus scale
#: run it on a hash subsample (a principal-direction SCREEN needs
#: ~1e5 rows for ~1e-2 loading error, not the full corpus).
PCA_EXACT_MAX_ROWS = 200_000


def embedding_pca_power(embeddings: DataFrame) -> DataFrame:
    """Leading principal direction of the embedding cloud by power
    iteration on the EXACT integer covariance — the PCA screen a
    pipeline runs to catch a dominant nuisance axis (batch effects,
    norm artifacts) before indexing/training.

    Math, all exact until the final division: vectors quantize to
    int (x * 100, half-away-from-zero); the Gram G = Sigma q q^T and
    per-dimension sums s accumulate as decimal(38,0); the scaled
    covariance C = n*G - s s^T is the exact n^2-scaled covariance;
    two unrolled power steps from the ones vector, v2 = C*(C*1),
    stay inside decimal(38,0) for n <= 200k rows (the ladder:
    |C| <= 2*(300)^2*n^2 ~ 7e15, |v1| <= 64|C|, |v2| <= 64|C||v1|
    ~ 2e35 < 1e38) — a guard RAISES past that; at 100 TB you run the
    screen on a deterministic hash subsample, which estimates the
    direction to ~1e-2 at 1e5 rows. Output loadings are v2 / max|v2|:
    ONE double division per dimension of two exactly-cast decimals
    (DuckDB twin VARCHAR-mediates), deterministic at any
    partitioning; two steps separate the top axis by (l1/l2)^2.

    Scale shape: the d^2 fan-out (posexplode x 2) is the textbook
    distributed Gram — n*d^2 work, map-side combined to <= d^2
    partial rows per partition; everything after the Gram is
    d^2-sized (4096 rows), joined broadcast. No driver-side linear
    algebra, no RNG, no libm. The Gram is symmetric, so the heavy
    fan-out emits only the upper triangle (second posexplode over
    the j >= i tail slice — d(d+1)/2 cells per row instead of d^2,
    0.68x paired A/B) and the lower triangle is mirrored from the
    aggregated d^2-sized cell table, where the copy is free; every
    cell's decimal sum adds the exact same integer products, so the
    mirrored matrix is bit-identical to the full fan-out's.
    """
    d38 = "decimal(38,0)"
    q = F.transform(
        F.col("embedding"),
        lambda x: F.round(x * PCA_Q).cast("long"),
    )
    base = embeddings.select(q.alias("qv"))
    ex1 = base.select(
        F.posexplode(F.col("qv")).alias("i", "xi"), F.col("qv")
    )
    ex2 = ex1.select(
        "i",
        "xi",
        F.posexplode(
            F.slice(
                F.col("qv"), F.col("i") + 1, F.size(F.col("qv")) - F.col("i")
            )
        ).alias("jp", "xj"),
    ).select("i", "xi", (F.col("i") + F.col("jp")).alias("j"), "xj")
    gram_ut = ex2.groupBy("i", "j").agg(
        F.sum((F.col("xi") * F.col("xj")).cast(d38)).alias("g"),
        F.count(F.lit(1)).alias("n"),
    )
    gram = gram_ut.unionByName(
        gram_ut.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "g", "n"
        )
    )
    sums = base.select(F.posexplode(F.col("qv")).alias("i", "xi")).groupBy(
        "i"
    ).agg(F.sum(F.col("xi").cast(d38)).alias("s"))
    si = sums.select(F.col("i").alias("ii"), F.col("s").alias("s_i"))
    sj = sums.select(F.col("i").alias("jj"), F.col("s").alias("s_j"))
    guard = F.when(
        F.col("n") > PCA_EXACT_MAX_ROWS,
        F.raise_error(
            F.lit(
                "embedding_pca_power: exact decimal ladder certified to "
                f"{PCA_EXACT_MAX_ROWS} rows — run on a hash subsample"
            )
        ).cast(d38),
    )
    cov = (
        gram.join(F.broadcast(si), F.col("i") == F.col("ii"))
        .join(F.broadcast(sj), F.col("j") == F.col("jj"))
        .select(
            "i",
            "j",
            F.coalesce(
                guard,
                F.col("n").cast(d38) * F.col("g")
                - F.col("s_i") * F.col("s_j"),
            ).alias("c"),
        )
    )
    from pyspark.sql import Window

    v1 = cov.groupBy(F.col("j").alias("vj")).agg(F.sum("c").alias("v1"))
    v2 = (
        cov.join(F.broadcast(v1), F.col("j") == F.col("vj"))
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("v1")).alias("v2"))
    )
    w_all = Window.partitionBy()
    out = v2.select(
        F.col("i").alias("dim"),
        "v2",
        F.max(F.abs(F.col("v2"))).over(w_all).alias("m"),
    )
    loading = F.when(
        F.col("m") > 0, F.col("v2").cast("double") / F.col("m").cast("double")
    ).otherwise(F.lit(0.0))
    return out.select("dim", loading.alias("loading")).orderBy("dim")


def embedding_pca_power_sql() -> str:
    return f"""
WITH base AS (
  SELECT list_transform(embedding,
           x -> CAST(round(x * {PCA_Q}) AS BIGINT)) AS qv
  FROM embeddings
),
ex1 AS (
  SELECT gs.i - 1 AS i, qv[gs.i] AS xi, qv
  FROM base, LATERAL (SELECT unnest(range(1, len(qv) + 1)) AS i) gs
),
ex2 AS (
  SELECT i, xi, gs.j - 1 AS j, qv[gs.j] AS xj
  FROM ex1, LATERAL (SELECT unnest(range(1, len(qv) + 1)) AS j) gs
),
gram AS (
  SELECT i, j, SUM(CAST(xi AS HUGEINT) * CAST(xj AS HUGEINT)) AS g,
         COUNT(*) AS n
  FROM ex2 GROUP BY i, j
),
sums AS (
  SELECT i, SUM(CAST(xi AS HUGEINT)) AS s FROM ex1 GROUP BY i
),
cov AS (
  SELECT g.i, g.j,
         CASE WHEN g.n > {PCA_EXACT_MAX_ROWS}
              THEN error('embedding_pca_power: exact decimal ladder'
                         ' certified to {PCA_EXACT_MAX_ROWS} rows')
              ELSE CAST(g.n AS HUGEINT) * g.g - si.s * sj.s END AS c
  FROM gram g
  JOIN sums si ON g.i = si.i
  JOIN sums sj ON g.j = sj.i
),
v1 AS (SELECT j AS vj, SUM(c) AS v1 FROM cov GROUP BY j),
v2 AS (
  SELECT i, SUM(c * v1.v1) AS v2
  FROM cov JOIN v1 ON cov.j = v1.vj
  GROUP BY i
),
outp AS (
  SELECT i AS dim, v2, MAX(abs(v2)) OVER () AS m FROM v2
)
SELECT dim,
       CASE WHEN m > 0 THEN
         CAST(CAST(v2 AS VARCHAR) AS DOUBLE)
           / CAST(CAST(m AS VARCHAR) AS DOUBLE)
       ELSE CAST(0.0 AS DOUBLE) END AS loading
FROM outp ORDER BY dim
"""


def mutual_knn(emb: DataFrame, k: int = KNN_GRAPH_K) -> DataFrame:
    """Reciprocal nearest-neighbor pairs: (a, b) kept only when b is
    in a's top-k AND a is in b's top-k — the mutual-kNN filter that
    turns a kNN graph into high-precision match candidates (entity
    resolution, semantic dedup, bitext mining all use reciprocity to
    kill hub-induced false neighbors: a hub lands in everyone's list,
    but few land in the hub's).

    Pure composition over ``knn_graph``'s directed edge list — which
    is itself built from the session-cached sign-LSH sketch
    (``_nd_sketch_base``), so a session that already ran any ANN
    entry pays only the (tiny) reciprocity self-join here: the
    directed list joins itself on the reversed key, keeps a < b, and
    reports both ranks. Output is bounded by n*k edges before the
    filter, pairs after it.
    """
    g = knn_graph(emb, k)
    a = g.select(
        F.col("vec_a"), F.col("vec_b"), F.col("sim"), F.col("rnk").alias("rank_ab")
    )
    b = g.select(
        F.col("vec_a").alias("vec_b"),
        F.col("vec_b").alias("vec_a"),
        F.col("rnk").alias("rank_ba"),
    )
    return (
        a.join(b, ["vec_a", "vec_b"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "sim", "rank_ab", "rank_ba")
        .orderBy("vec_a", "vec_b")
    )


def mutual_knn_sql(k: int = KNN_GRAPH_K) -> str:
    return f"""
WITH g AS ({knn_graph_sql(k)})
SELECT a.vec_a, a.vec_b, a.sim,
       a.rnk AS rank_ab, b.rnk AS rank_ba
FROM g a JOIN g b ON a.vec_a = b.vec_b AND a.vec_b = b.vec_a
WHERE a.vec_a < a.vec_b
ORDER BY a.vec_a, a.vec_b
"""


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + distortion audit
# --------------------------------------------------------------------------

#: JL output dimensionality (64 -> 16: a 4x cost cut for downstream
#: pair arithmetic, at the distortion the audit below measures).
JL_OUT_DIMS = 16
JL_IN_DIMS = 64


def _jl_signs() -> list[list[int]]:
    """The +-1 projection matrix, md5-derived (hashlib at build time,
    embedded as literals in BOTH engines — the vectors.py plane
    convention)."""
    import hashlib

    rows = []
    for k in range(JL_OUT_DIMS):
        row = []
        for d in range(JL_IN_DIMS):
            h = hashlib.md5(f"jl:{k}:{d}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) >= 8 else -1)
        rows.append(row)
    return rows


def jl_projection(emb: DataFrame) -> DataFrame:
    """Johnson-Lindenstrauss sign projection (64 -> 16 dims) with a
    distance-distortion audit — the dimensionality-reduction step a
    100 TB embedding pipeline runs BEFORE pair-heavy work (near-dup,
    kNN): with a +-1 matrix R, E[||Rx||^2] = K*||x||^2, so squared
    distances survive projection up to the distortion this audit
    measures (Achlioptas 2003 database-friendly JL).

    Exactness end-to-end: inputs quantize to int64 (vectors.SCALE);
    each projected coordinate is an exact signed integer sum; audit
    pairs are the deterministic (vec_id, vec_id+1) chain; the
    original squared distance stays int64, the projected one
    accumulates as decimal(38,0) (16 * (1.3e9)^2 exceeds int64), and
    the aggregate ratio sum(d2_proj) / (K * sum(d2_orig)) is ONE
    double division of exact totals — order-free, bit-identical
    (HUGEINT + VARCHAR-cast in the twin). Per-pair min/max ratios are
    order-free extremes. Scale: projection is a pure scan projection
    (zero shuffle); the audit join is an id-chain equi-join.
    """
    signs = _jl_signs()
    iv = V.int_vec(F.col("embedding"))
    proj_cols = [
        F.aggregate(
            F.zip_with(
                F.col("iv"),
                F.array(*[F.lit(s) for s in signs[k]]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias(f"y{k}")
        for k in range(JL_OUT_DIMS)
    ]
    base = emb.select("vec_id", iv.alias("iv")).select("vec_id", "iv", *proj_cols)
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b, F.col("b.vec_id") == F.col("a.vec_id") + 1
    )
    d2_orig = F.aggregate(
        F.zip_with(F.col("a.iv"), F.col("b.iv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d2_proj = sum(
        (
            (F.col(f"a.y{k}") - F.col(f"b.y{k}")).cast("decimal(38,0)")
            * (F.col(f"a.y{k}") - F.col(f"b.y{k}")).cast("decimal(38,0)")
            for k in range(JL_OUT_DIMS)
        ),
        F.lit(0).cast("decimal(38,0)"),
    )
    ratio = d2_proj.cast("double") / (
        F.lit(float(JL_OUT_DIMS)) * d2_orig.cast("double")
    )
    per_pair = pairs.select(
        d2_orig.alias("d2o"),
        d2_proj.alias("d2p"),
        ratio.alias("r"),
    ).filter(F.col("d2o") > 0)
    return per_pair.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.lit(JL_IN_DIMS).alias("dims_in"),
        F.lit(JL_OUT_DIMS).alias("dims_out"),
        (
            F.sum("d2p").cast("double")
            / (F.lit(float(JL_OUT_DIMS)) * F.sum("d2o").cast("double"))
        ).alias("agg_ratio"),
        F.min("r").alias("min_ratio"),
        F.max("r").alias("max_ratio"),
    )


def jl_projection_sql() -> str:
    signs = _jl_signs()
    iv = V.sql_int_vec("embedding")
    y = []
    for k in range(JL_OUT_DIMS):
        arr = "[" + ", ".join(str(s) for s in signs[k]) + "]"
        y.append(
            f"list_sum(list_transform(range(1, len(iv)+1),"
            f" i -> iv[i] * ({arr})[i])) AS y{k}"
        )
    d2p = " + ".join(
        f"CAST(a.y{k} - b.y{k} AS HUGEINT) * (a.y{k} - b.y{k})"
        for k in range(JL_OUT_DIMS)
    )
    return f"""
WITH base AS (
  SELECT vec_id, iv, {', '.join(y)}
  FROM (SELECT vec_id, {iv} AS iv FROM embeddings) q
),
pairs AS (
  SELECT
    list_sum(list_transform(range(1, len(a.iv)+1),
      i -> (a.iv[i] - b.iv[i]) * (a.iv[i] - b.iv[i]))) AS d2o,
    ({d2p}) AS d2p
  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
),
live AS (SELECT * FROM pairs WHERE d2o > 0)
SELECT COUNT(*) AS n_pairs,
       CAST({JL_IN_DIMS} AS INT) AS dims_in,
       CAST({JL_OUT_DIMS} AS INT) AS dims_out,
       CAST(CAST(SUM(d2p) AS VARCHAR) AS DOUBLE)
         / (CAST({float(JL_OUT_DIMS)!r} AS DOUBLE)
            * CAST(CAST(SUM(d2o) AS VARCHAR) AS DOUBLE)) AS agg_ratio,
       MIN(CAST(CAST(d2p AS VARCHAR) AS DOUBLE)
           / (CAST({float(JL_OUT_DIMS)!r} AS DOUBLE) * CAST(d2o AS DOUBLE)))
         AS min_ratio,
       MAX(CAST(CAST(d2p AS VARCHAR) AS DOUBLE)
           / (CAST({float(JL_OUT_DIMS)!r} AS DOUBLE) * CAST(d2o AS DOUBLE)))
         AS max_ratio
FROM live
"""


def ivf_recall_eval(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """IVF acceptance gate: recall@k of the inverted-file approximate
    top-k (``ivf_topk`` — seeded centroids, IVF_NPROBE probed lists)
    against the exact brute-force cosine ranking — completing the
    per-index recall symmetry (``ann_recall_eval`` gates LSH,
    ``int8_recall_eval`` gates scalar quantization, this gates IVF):
    every approximate path in the engine now has its measured
    acceptance gate, so an index choice at 100 TB is a comparison of
    recall rows, not a guess.

    Cost is the two top-k scans (both zero-shuffle TakeOrdered
    shapes); the comparison joins two k-row sets; n_probe-pruned
    shortfalls surface via n_ivf < k rather than silently inflating
    recall (the ann_recall_eval convention).
    """
    # exact/approx are k-row sets each consumed TWICE (the hit
    # semi-join and their own counts) — checkpointed so the final
    # plan reads two k-row pins instead of re-running each corpus
    # TakeOrdered scan per consumer (the 2+-lazy-consumers rule).
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    exact = _reliable_checkpoint(
        cosine_topk(emb, query_vec_id, k).select("vec_id")
    )
    approx = _reliable_checkpoint(
        ivf_topk(emb, query_vec_id, k).select("vec_id")
    )
    hit = exact.join(approx, "vec_id", "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_ivf")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_exact",
            "n_ivf",
            "n_hit",
            (F.col("n_hit").cast("double") / F.lit(float(k))).alias("recall"),
        )
    )


def ivf_recall_eval_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH exact_k AS (SELECT vec_id FROM ({cosine_topk_sql(query_vec_id, k)}) e),
approx_k AS (SELECT vec_id FROM ({ivf_topk_sql(query_vec_id, k)}) a),
hit AS (SELECT vec_id FROM exact_k WHERE vec_id IN (SELECT vec_id FROM approx_k))
SELECT (SELECT COUNT(*) FROM exact_k) AS n_exact,
       (SELECT COUNT(*) FROM approx_k) AS n_ivf,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE) / {float(k)} AS recall
"""


def pq_recall_eval(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Product-quantization acceptance gate: recall@k of the PQ-ADC
    ranking (``pq_topk``) against the exact brute-force cosine —
    closing the LAST approximate path without a measured gate
    (``ann_recall_eval`` gates LSH, ``int8_recall_eval`` scalar
    quantization, ``ivf_recall_eval`` IVF). STAGED round 9 for the
    round-10 driver window.

    Same shape as its siblings: two top-k scans, a k-row comparison
    join, recall over the exact set; a short PQ candidate list
    surfaces via n_pq < k rather than silently inflating recall.
    """
    # exact/approx are k-row sets each consumed TWICE (the hit
    # semi-join and their own counts) — checkpointed so the final
    # plan reads two k-row pins instead of re-running each corpus
    # TakeOrdered scan per consumer (the 2+-lazy-consumers rule).
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    exact = _reliable_checkpoint(
        cosine_topk(emb, query_vec_id, k).select("vec_id")
    )
    approx = _reliable_checkpoint(
        pq_topk(emb, query_vec_id, k).select("vec_id")
    )
    hit = exact.join(approx, "vec_id", "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_pq")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_exact",
            "n_pq",
            "n_hit",
            (F.col("n_hit").cast("double") / F.lit(float(k))).alias("recall"),
        )
    )


def pq_recall_eval_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH exact_k AS (SELECT vec_id FROM ({cosine_topk_sql(query_vec_id, k)}) e),
approx_k AS (SELECT vec_id FROM ({pq_topk_sql(query_vec_id, k)}) a),
hit AS (SELECT vec_id FROM exact_k WHERE vec_id IN (SELECT vec_id FROM approx_k))
SELECT (SELECT COUNT(*) FROM exact_k) AS n_exact,
       (SELECT COUNT(*) FROM approx_k) AS n_pq,
       (SELECT COUNT(*) FROM hit) AS n_hit,
       CAST((SELECT COUNT(*) FROM hit) AS DOUBLE) / {float(k)} AS recall
"""


# --------------------------------------------------------------------------
# kNN-classifier holdout evaluation over the embedding space
# --------------------------------------------------------------------------

#: evaluation panel size (fixed query count — keeps the exact-scan
#: eval cost linear in the train side regardless of corpus size).
KNN_EVAL_QUERIES = 64
#: neighbors per query for the majority vote.
KNN_EVAL_K = 5


def knn_label_eval(emb: DataFrame) -> DataFrame:
    """kNN-classifier holdout accuracy over the embedding column —
    the standard label-quality / embedding-quality probe (if a
    5-NN majority vote can't recover held-out labels, the space
    won't power retrieval or dedup either; the eval the
    ``embedding_quality`` centroid readout approximates without
    neighbors): md5-hash 20% of vectors out, take a fixed
    ``KNN_EVAL_QUERIES``-query panel (smallest held-out vec_ids —
    deterministic), vote each query's label from its
    ``KNN_EVAL_K`` nearest TRAIN vectors by exact quantized cosine
    (count desc, label asc tie-break), and report the confusion
    summary. STAGED round 10 for the round-11/12 windows.

    Scale: the panel broadcasts (64 rows x d), so the train side
    NEVER shuffles for the similarity pass — each train partition
    scores its rows against the panel in place (the
    ``ann_recall_eval`` shape, panel-many queries at once); the
    per-query top-k rank window is panel-bounded (64 partitions).
    At 100 TB you would swap the exact scan for the IVF/LSH index
    probe — this entry is the eval-grade EXACT baseline those
    indexes are gated against.
    """
    from pyspark.sql import Window

    split = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kv:"), F.col("vec_id").cast("string"))),
                1, 8,
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    base = fan_out(emb).select(
        "vec_id", "label", V.int_vec(F.col("embedding")).alias("iv"),
        split.alias("bkt"),
    ).withColumn("nrm", V.int_dot_iv(F.col("iv"), F.col("iv")))
    panel = (
        base.filter(F.col("bkt") == 4)
        .orderBy("vec_id")
        .limit(KNN_EVAL_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("iv").alias("q_iv"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    train = base.filter(F.col("bkt") != 4)
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double"))
        * F.sqrt(F.col("q_nrm").cast("double"))
    )
    scored = train.crossJoin(F.broadcast(panel)).select(
        "q_id", "q_label", "vec_id", "label", sim.alias("sim")
    )
    w_q = Window.partitionBy("q_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    topk = scored.withColumn("rn", F.row_number().over(w_q)).filter(
        F.col("rn") <= KNN_EVAL_K
    )
    votes = topk.groupBy("q_id", "q_label", "label").agg(
        F.count(F.lit(1)).alias("v")
    )
    w_v = Window.partitionBy("q_id").orderBy(
        F.col("v").desc(), F.col("label").asc()
    )
    pred = (
        votes.withColumn("rv", F.row_number().over(w_v))
        .filter(F.col("rv") == 1)
        .select(
            "q_id",
            "q_label",
            F.col("label").alias("pred_label"),
            F.col("v").alias("votes"),
        )
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(
            (F.col("pred_label") == F.col("q_label")).cast("long")
        ).alias("n_correct"),
    ).select(
        "n_queries",
        F.lit(KNN_EVAL_K).alias("k"),
        "n_correct",
        (
            F.col("n_correct").cast("double")
            / F.col("n_queries").cast("double")
        ).alias("accuracy"),
    )


def knn_label_eval_sql() -> str:
    iv = V.sql_int_vec("embedding")
    dot = "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i]))"
    return f"""
WITH base AS (
  SELECT vec_id, label, {iv} AS iv,
         CAST('0x' || substr(md5('kv:' || CAST(vec_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 5 AS bkt
  FROM embeddings
),
nbase AS (
  SELECT vec_id, label, iv, bkt,
         CAST({dot.format(a='iv', b='iv')} AS BIGINT) AS nrm
  FROM base
),
panel AS (
  SELECT vec_id AS q_id, label AS q_label, iv AS q_iv, nrm AS q_nrm
  FROM nbase WHERE bkt = 4 ORDER BY vec_id LIMIT {KNN_EVAL_QUERIES}
),
scored AS (
  SELECT p.q_id, p.q_label, t.vec_id, t.label,
         CAST({dot.format(a='t.iv', b='p.q_iv')} AS DOUBLE)
           / (sqrt(CAST(t.nrm AS DOUBLE)) * sqrt(CAST(p.q_nrm AS DOUBLE)))
           AS sim
  FROM nbase t CROSS JOIN panel p
  WHERE t.bkt != 4
),
topk AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sim DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {KNN_EVAL_K}
),
votes AS (
  SELECT q_id, q_label, label, COUNT(*) AS v
  FROM topk GROUP BY q_id, q_label, label
),
pred AS (
  SELECT q_id, q_label, label AS pred_label FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY v DESC, label ASC) AS rv
    FROM votes
  ) WHERE rv = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST({KNN_EVAL_K} AS INT) AS k,
       CAST(SUM(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(SUM(CASE WHEN pred_label = q_label THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM pred
"""


# --------------------------------------------------------------------------
# embedding distribution drift (per-dimension two-sample check)
# --------------------------------------------------------------------------


def embedding_drift(emb: DataFrame) -> DataFrame:
    """Per-dimension embedding drift check — the ML-ops monitor for
    "did the encoder (or the corpus) move?": split the vectors into
    two deterministic md5 halves (in production: last week vs this
    week), and for every dimension report the two-sample z statistic

        z_d = (mean_a - mean_b) / sqrt(var_p * (1/n_a + 1/n_b))

    with the pooled variance from exact integer sufficient
    statistics (values quantized to int64 by the engine's vector
    convention; sums of squares in decimal(38,0)). On the static
    fixture the halves are exchangeable, so |z| stays small — the
    operator's value is the REJECTION case on drifted production
    data, and its cross-engine exactness makes the alarm threshold
    reproducible. Dimensions are the output grain (embedding-width
    rows, 64 here).

    Shape: one posexplode of the quantized vectors, one (dim, half)
    aggregation — map-side combinable, dimension-keyed shuffle
    only; no pairs, no windows over row-scale data. NULL z on
    degenerate variance (the _pearson guard convention). STAGED
    round 10.
    """
    split = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ed:"), F.col("vec_id").cast("string"))),
                1, 8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    d38 = "decimal(38,0)"
    cells = (
        fan_out(emb)
        .select(split.alias("half"), V.int_vec(F.col("embedding")).alias("iv"))
        .select("half", F.posexplode("iv").alias("dim", "x"))
    )
    per = cells.groupBy("dim", "half").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
    )
    a = per.filter(F.col("half") == 0).select(
        "dim", F.col("n").alias("n_a"), F.col("sx").alias("sx_a"),
        F.col("sxx").alias("sxx_a"),
    )
    b = per.filter(F.col("half") == 1).select(
        "dim", F.col("n").alias("n_b"), F.col("sx").alias("sx_b"),
        F.col("sxx").alias("sxx_b"),
    )
    j = a.join(b, "dim")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("sx_a").cast("double") / na
    mb = F.col("sx_b").cast("double") / nb
    # pooled variance: (SSa + SSb) / (n_a + n_b - 2), SS from the
    # exact sums: SS = sxx - sx^2/n
    ssa = F.col("sxx_a").cast("double") - (
        F.col("sx_a").cast("double") * F.col("sx_a").cast("double")
    ) / na
    ssb = F.col("sxx_b").cast("double") - (
        F.col("sx_b").cast("double") * F.col("sx_b").cast("double")
    ) / nb
    varp = (ssa + ssb) / (na + nb - F.lit(2.0))
    z = F.when(
        varp > 0,
        (ma - mb)
        / F.sqrt(varp * (F.lit(1.0) / na + F.lit(1.0) / nb)),
    )
    return j.select(
        "dim",
        "n_a",
        "n_b",
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        z.alias("z"),
    ).orderBy("dim")


def embedding_drift_sql() -> str:
    iv = V.sql_int_vec("embedding")
    return f"""
WITH cells AS (
  SELECT CAST('0x' || substr(md5('ed:' || CAST(vec_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 2 AS half,
         u.i - 1 AS dim, v.iv[u.i] AS x
  FROM (SELECT vec_id, {iv} AS iv FROM embeddings) v,
       UNNEST(range(1, len(v.iv) + 1)) AS u(i)
),
per AS (
  SELECT dim, half, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM cells GROUP BY dim, half
),
j AS (
  SELECT a.dim,
         a.n AS n_a, a.sx AS sx_a, a.sxx AS sxx_a,
         b.n AS n_b, b.sx AS sx_b, b.sxx AS sxx_b
  FROM (SELECT * FROM per WHERE half = 0) a
  JOIN (SELECT * FROM per WHERE half = 1) b USING (dim)
)
SELECT dim, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
       CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
       CASE WHEN ((CAST(CAST(sxx_a AS VARCHAR) AS DOUBLE)
                   - (CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE))
                     / CAST(n_a AS DOUBLE))
                  + (CAST(CAST(sxx_b AS VARCHAR) AS DOUBLE)
                   - (CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE))
                     / CAST(n_b AS DOUBLE)))
                 / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                    - CAST(2.0 AS DOUBLE)) > 0
            THEN (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                  - CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((((CAST(CAST(sxx_a AS VARCHAR) AS DOUBLE)
                           - (CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE))
                             / CAST(n_a AS DOUBLE))
                          + (CAST(CAST(sxx_b AS VARCHAR) AS DOUBLE)
                           - (CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE))
                             / CAST(n_b AS DOUBLE)))
                         / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                            - CAST(2.0 AS DOUBLE)))
                        * (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE)
                           + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)))
       END AS z
FROM j ORDER BY dim
"""


# --------------------------------------------------------------------------
# cross-split embedding leakage (near-dup pairs straddling the eval split)
# --------------------------------------------------------------------------


def _kv_eval_bucket(c):
    # knn_label_eval's split, verbatim: md5('kv:'||id)[:8 hex] % 5,
    # bucket 4 = the 20% eval holdout. Sharing the expression means
    # this audit measures leakage INTO the exact split that
    # knn_label_eval (and any consumer of the kv: convention) holds out.
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("kv:"), c.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 5
    )


def embedding_split_leakage(
    emb: DataFrame, max_pairs_per_row: float | None = None
) -> DataFrame:
    """Train/eval leakage through NEAR-DUPLICATE embeddings — the
    dense-space counterpart of ``ngram_decontaminate``: a benchmark
    row whose near-twin sits in training is contaminated even when no
    n-gram matches (paraphrases, re-encodes, crops). Counts the
    verified near-dup pairs (``cosine_near_dup``'s banded-LSH + exact
    verification, session-cached) that STRADDLE the md5 eval split,
    and how many distinct eval vectors are touched.

    One row: (n_pairs, n_cross, n_eval_contaminated, n_eval_total,
    leak_rate, eval_contamination_rate, max_cross_sim). Rates are
    NULL (not NaN/0-division) on empty denominators, both engines.

    Scale: the pair table is the cached near-dup prerequisite (its
    cost is the family build, amortized across the dedup/ANN
    entries); everything here is two 1-row aggregations of that
    small table plus one map-side count of the eval fraction —
    nothing new shuffles. At 100 TB the same audit runs off whatever
    pair table the dedup pass already materialized. Inherits the
    family's candidate-budget guard (no-silent-caps abort on
    degenerate banding; ``max_pairs_per_row`` is the explicit
    override, as everywhere in the near-dup family).
    """
    pairs = cosine_near_dup(emb, max_pairs_per_row=max_pairs_per_row)
    tagged = pairs.select(
        "sim",
        "vec_a",
        "vec_b",
        (_kv_eval_bucket(F.col("vec_a")) == 4).alias("a_eval"),
        (_kv_eval_bucket(F.col("vec_b")) == 4).alias("b_eval"),
    )
    is_cross = F.col("a_eval") != F.col("b_eval")
    stats = tagged.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(is_cross.cast("long")), F.lit(0)).alias("n_cross"),
        F.max(F.when(is_cross, F.col("sim"))).alias("max_cross_sim"),
    )
    contaminated = (
        tagged.filter(is_cross)
        .select(
            F.when(F.col("a_eval"), F.col("vec_a"))
            .otherwise(F.col("vec_b"))
            .alias("vid")
        )
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_eval_contaminated"))
    )
    n_eval = emb.select(
        (_kv_eval_bucket(F.col("vec_id")) == 4).cast("long").alias("e")
    ).agg(F.coalesce(F.sum("e"), F.lit(0)).alias("n_eval_total"))
    return (
        stats.crossJoin(contaminated)
        .crossJoin(n_eval)
        .select(
            "n_pairs",
            "n_cross",
            "n_eval_contaminated",
            "n_eval_total",
            F.when(
                F.col("n_pairs") > 0,
                F.col("n_cross").cast("double") / F.col("n_pairs").cast("double"),
            ).alias("leak_rate"),
            F.when(
                F.col("n_eval_total") > 0,
                F.col("n_eval_contaminated").cast("double")
                / F.col("n_eval_total").cast("double"),
            ).alias("eval_contamination_rate"),
            "max_cross_sim",
        )
    )


def embedding_split_leakage_sql(threshold: float = 0.25) -> str:
    bkt = (
        "(CAST(concat('0x', substr(md5('kv:' || CAST({c} AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 5 = 4)"
    )
    a_eval, b_eval, v_eval = (
        bkt.format(c="vec_a"), bkt.format(c="vec_b"), bkt.format(c="vec_id")
    )
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({cosine_near_dup_sql(threshold)}) q
),
tagged AS (
  SELECT sim, vec_a, vec_b, {a_eval} AS a_eval, {b_eval} AS b_eval
  FROM pairs
),
stats AS (
  SELECT count(*) AS n_pairs,
         COALESCE(CAST(SUM(CASE WHEN a_eval <> b_eval THEN 1 ELSE 0 END)
                  AS BIGINT), 0) AS n_cross,
         MAX(CASE WHEN a_eval <> b_eval THEN sim END) AS max_cross_sim
  FROM tagged
),
contaminated AS (
  SELECT count(*) AS n_eval_contaminated FROM (
    SELECT DISTINCT CASE WHEN a_eval THEN vec_a ELSE vec_b END AS vid
    FROM tagged WHERE a_eval <> b_eval
  )
),
n_eval AS (
  SELECT COALESCE(CAST(SUM(CASE WHEN {v_eval} THEN 1 ELSE 0 END) AS BIGINT),
                  0) AS n_eval_total
  FROM embeddings
)
SELECT n_pairs, n_cross, n_eval_contaminated, n_eval_total,
       CASE WHEN n_pairs > 0
            THEN CAST(n_cross AS DOUBLE) / CAST(n_pairs AS DOUBLE) END
         AS leak_rate,
       CASE WHEN n_eval_total > 0
            THEN CAST(n_eval_contaminated AS DOUBLE)
                 / CAST(n_eval_total AS DOUBLE) END
         AS eval_contamination_rate,
       max_cross_sim
FROM stats CROSS JOIN contaminated CROSS JOIN n_eval
"""


def embedding_eval_contamination(
    emb: DataFrame,
    threshold: float = 0.25,
    max_pairs_per_row: float | None = None,
) -> DataFrame:
    """Per-eval-vector contamination detail table — the dense-space
    counterpart of :func:`textops.contamination_matrix`'s grid and
    the drill-down behind :func:`embedding_split_leakage`'s one-row
    summary: for EVERY vector in the ``kv:`` md5 eval holdout
    (bucket 4 — the exact split ``knn_label_eval`` holds out), the
    maximum cosine to any TRAIN-side vector among the verified
    near-duplicate pairs, the nearest such train vector, and the
    per-vector contaminated verdict — the list a curation run
    publishes so contaminated benchmark rows can be dropped
    individually (the way ``ngram_decontaminate`` lists text hits).

    Candidates are ``cosine_near_dup``'s banded-LSH + exact-verify
    pair table (SESSION-CACHED via ``_PAIR_CACHE`` — a pipeline that
    already ran any near-dup entry pays nothing here; recall caveat
    as for the whole family: eval/train twins sharing no LSH bucket
    are not candidates). Nearest-train tie-break is deterministic on
    both engines: rank by (sim DESC, train_id ASC) — a ROW_NUMBER
    window, never an argmax-by-struct (the DuckDB arg_min ordering
    trap).

    Scale: the pair table is the family's amortized prerequisite;
    tagging + the rank window run over THAT small table (partitioned
    by eval vector — per-row pair counts are budget-guarded
    upstream, so keys are bounded); the spine join is one map-side
    filter of the corpus plus an equi-join against the per-eval
    aggregate. Nothing new is pair-shaped.

    Output: (vec_id, n_train_neighbors, max_train_sim,
    nearest_train_id, contaminated), vec_id-ordered over the FULL
    eval spine — untouched eval vectors appear with zero neighbors
    and NULL sim/nearest, so the clean rows are auditable too.
    """
    pairs = cosine_near_dup(
        emb, threshold=threshold, max_pairs_per_row=max_pairs_per_row
    )
    tagged = pairs.select(
        "sim",
        "vec_a",
        "vec_b",
        (_kv_eval_bucket(F.col("vec_a")) == 4).alias("a_eval"),
        (_kv_eval_bucket(F.col("vec_b")) == 4).alias("b_eval"),
    )
    cross = (
        tagged.filter(F.col("a_eval") & ~F.col("b_eval"))
        .select(
            F.col("vec_a").alias("eval_id"),
            F.col("vec_b").alias("train_id"),
            "sim",
        )
        .unionByName(
            tagged.filter(F.col("b_eval") & ~F.col("a_eval")).select(
                F.col("vec_b").alias("eval_id"),
                F.col("vec_a").alias("train_id"),
                "sim",
            )
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("eval_id").orderBy(
        F.col("sim").desc(), F.col("train_id").asc()
    )
    per_eval = (
        cross.withColumn("rn", F.row_number().over(w))
        .groupBy("eval_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_neighbors"),
            F.max(F.when(F.col("rn") == 1, F.col("sim"))).alias(
                "max_train_sim"
            ),
            F.max(F.when(F.col("rn") == 1, F.col("train_id"))).alias(
                "nearest_train_id"
            ),
        )
    )
    spine = emb.select("vec_id").filter(_kv_eval_bucket(F.col("vec_id")) == 4)
    return (
        spine.join(
            per_eval, spine["vec_id"] == per_eval["eval_id"], "left"
        )
        .select(
            "vec_id",
            F.coalesce(F.col("n_train_neighbors"), F.lit(0).cast("long"))
            .alias("n_train_neighbors"),
            "max_train_sim",
            "nearest_train_id",
            F.col("eval_id").isNotNull().alias("contaminated"),
        )
        .orderBy("vec_id")
    )


def embedding_eval_contamination_sql(threshold: float = 0.25) -> str:
    """DuckDB twin of :func:`embedding_eval_contamination` — nests
    :func:`cosine_near_dup_sql`, identical split tag, rank window and
    eval spine."""
    bkt = (
        "(CAST(concat('0x', substr(md5('kv:' || CAST({c} AS VARCHAR)), 1, 8)) "
        "AS BIGINT) % 5 = 4)"
    )
    a_eval, b_eval, v_eval = (
        bkt.format(c="vec_a"), bkt.format(c="vec_b"), bkt.format(c="vec_id")
    )
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({cosine_near_dup_sql(threshold)}) q
),
tagged AS (
  SELECT sim, vec_a, vec_b, {a_eval} AS a_eval, {b_eval} AS b_eval
  FROM pairs
),
cross_d AS (
  SELECT vec_a AS eval_id, vec_b AS train_id, sim
  FROM tagged WHERE a_eval AND NOT b_eval
  UNION ALL
  SELECT vec_b AS eval_id, vec_a AS train_id, sim
  FROM tagged WHERE b_eval AND NOT a_eval
),
ranked AS (
  SELECT eval_id, train_id, sim,
         ROW_NUMBER() OVER (PARTITION BY eval_id
                            ORDER BY sim DESC, train_id ASC) AS rn
  FROM cross_d
),
per_eval AS (
  SELECT eval_id,
         CAST(COUNT(*) AS BIGINT) AS n_train_neighbors,
         MAX(CASE WHEN rn = 1 THEN sim END) AS max_train_sim,
         MAX(CASE WHEN rn = 1 THEN train_id END) AS nearest_train_id
  FROM ranked GROUP BY eval_id
),
spine AS (SELECT vec_id FROM embeddings WHERE {v_eval})
SELECT s.vec_id,
       COALESCE(p.n_train_neighbors, 0) AS n_train_neighbors,
       p.max_train_sim, p.nearest_train_id,
       (p.eval_id IS NOT NULL) AS contaminated
FROM spine s LEFT JOIN per_eval p ON s.vec_id = p.eval_id
ORDER BY s.vec_id
"""


# --------------------------------------------------------------------------
# IVF nprobe sweep (recall-vs-probes tuning table)
# --------------------------------------------------------------------------

#: probed-list counts swept (nlist = 16 centroids, so 1/2/4 probes =
#: 6%/12%/25% of the data read per query).
IVF_SWEEP_PROBES = (1, 2, 4)


def ivf_nprobe_sweep(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Recall@k vs nprobe for the IVF index — the tuning table behind
    ``ivf_recall_eval``'s single fixed operating point (the sweep-
    table family: how many lists must a query probe before recall
    plateaus is THE latency/recall dial IVF deployments tune). One
    row per nprobe in ``IVF_SWEEP_PROBES``:
    (nprobe, n_exact, n_ivf, n_hit, recall).

    Cost shape — ONE corpus scan for the whole sweep, not one per
    level: the max-nprobe candidate set (vectors whose list is among
    the query's 4 nearest, ~nprobe/nlist of the corpus) materializes
    once with each vector's PROBE RANK (position of its list in the
    query's sorted probe order), and every sweep level is then a
    filter (probe_rank <= nprobe) + TakeOrdered over that small
    checkpoint — by IVF monotonicity the level-np candidate set is
    exactly the rank-<=np subset, so each leg is bit-identical to an
    independent ``ivf_topk`` run (the equivalence the closed-form
    test pins against ``ivf_recall_eval``). The exact top-k computes
    once. Recall is non-decreasing in nprobe by construction.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    max_np = max(IVF_SWEEP_PROBES)
    exact = _reliable_checkpoint(
        cosine_topk(emb, query_vec_id, k).select("vec_id")
    )

    # one scan: assignment + query probes at max nprobe + probe rank
    base = fan_out(emb).select(
        "vec_id", "label", V.int_vec(F.col("embedding")).alias("iv")
    ).select("vec_id", "label", "iv", V.sq_norm_iv(F.col("iv")).alias("nrm"))
    cents_arr = (
        base.orderBy("vec_id")
        .limit(IVF_CENTROIDS)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cid"),
                        F.col("iv").alias("civ"),
                        F.col("nrm").alias("cnrm"),
                    )
                )
            ).alias("cs")
        )
    )
    dists = F.transform(
        F.col("cs"),
        lambda c: F.struct(
            (
                F.col("nrm") - 2 * V.int_dot_iv(F.col("iv"), c["civ"]) + c["cnrm"]
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    with_d = base.crossJoin(F.broadcast(cents_arr)).withColumn("dists", dists)
    assigned = with_d.select(
        "vec_id", "label", "iv", "nrm",
        F.array_min("dists")["cid"].alias("list_id"),
    )
    q = with_d.filter(F.col("vec_id") == query_vec_id).select(
        F.col("iv").alias("q_iv"),
        F.col("nrm").alias("q_nrm"),
        F.transform(
            F.slice(F.array_sort(F.col("dists")), 1, max_np), lambda s: s["cid"]
        ).alias("probes"),
    )
    sim = V.int_dot_iv(F.col("iv"), F.col("q_iv")).cast("double") / (
        F.sqrt(F.col("nrm").cast("double")) * F.sqrt(F.col("q_nrm").cast("double"))
    )
    cand = _reliable_checkpoint(
        assigned.crossJoin(F.broadcast(q))
        .withColumn(
            "probe_rank", F.array_position(F.col("probes"), F.col("list_id"))
        )
        .filter(F.col("probe_rank") >= 1)
        .select("vec_id", sim.alias("sim"), "probe_rank")
    )

    out = None
    for np_ in IVF_SWEEP_PROBES:
        approx = (
            cand.filter(F.col("probe_rank") <= np_)
            .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
            .limit(k)
            .select("vec_id")
        )
        hit = exact.join(approx, "vec_id", "left_semi")
        row = (
            exact.agg(F.count(F.lit(1)).alias("n_exact"))
            .crossJoin(approx.agg(F.count(F.lit(1)).alias("n_ivf")))
            .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
            .select(
                F.lit(np_).cast("int").alias("nprobe"),
                "n_exact",
                "n_ivf",
                "n_hit",
                (F.col("n_hit").cast("double") / F.lit(float(k))).alias("recall"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("nprobe")


def ivf_nprobe_sweep_sql(query_vec_id: int = 0, k: int = 10) -> str:
    legs = []
    for np_ in IVF_SWEEP_PROBES:
        legs.append(
            f"""
SELECT CAST({np_} AS INT) AS nprobe,
       (SELECT COUNT(*) FROM exact_k) AS n_exact,
       (SELECT COUNT(*) FROM ({ivf_topk_sql(query_vec_id, k, nprobe=np_)}) a)
         AS n_ivf,
       (SELECT COUNT(*) FROM exact_k
        WHERE vec_id IN (SELECT vec_id
                         FROM ({ivf_topk_sql(query_vec_id, k, nprobe=np_)}) b))
         AS n_hit,
       CAST((SELECT COUNT(*) FROM exact_k
             WHERE vec_id IN (SELECT vec_id
                              FROM ({ivf_topk_sql(query_vec_id, k, nprobe=np_)}) c))
            AS DOUBLE) / {float(k)} AS recall"""
        )
    body = "\nUNION ALL\n".join(legs)
    return f"""
WITH exact_k AS MATERIALIZED (
  SELECT vec_id FROM ({cosine_topk_sql(query_vec_id, k)}) e
)
SELECT * FROM (
{body}
) ORDER BY nprobe
"""


# --------------------------------------------------------------------------
# embedding near-dup threshold sweep
# --------------------------------------------------------------------------

#: cosine thresholds swept; the pair table builds ONCE at the loosest.
EMB_SWEEP_THRESHOLDS = (0.25, 0.5, 0.75)


def embedding_threshold_sweep(
    emb: DataFrame, max_pairs_per_row: float | None = None
) -> DataFrame:
    """Near-duplicate pair counts vs cosine threshold for the
    embedding dedup path — the dense-space sibling of
    ``dedup_threshold_sweep`` (text jaccard): how aggressive can the
    dedup cut be before it starts merging non-duplicates is tuned
    from exactly this curve. One row per threshold:
    (threshold, n_pairs, n_docs_affected).

    Cost shape: the verified pair table builds ONCE at the loosest
    threshold (``cosine_near_dup``'s session-cached checkpoint —
    higher thresholds are pure FILTERS of it, never rebuilds);
    affected-doc counts are distincts of the small pair table. By
    construction both columns are non-increasing in the threshold,
    which the closed-form test pins.
    """
    lo = min(EMB_SWEEP_THRESHOLDS)
    pairs = cosine_near_dup(emb, threshold=lo, max_pairs_per_row=max_pairs_per_row)
    out = None
    for t in sorted(EMB_SWEEP_THRESHOLDS):
        at_t = pairs.filter(F.col("sim") >= t)
        docs_affected = (
            at_t.select(F.col("vec_a").alias("v"))
            .unionAll(at_t.select(F.col("vec_b").alias("v")))
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_docs_affected"))
        )
        row = (
            at_t.agg(F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_pairs"))
            .crossJoin(docs_affected)
            .select(
                F.lit(t).cast("double").alias("threshold"),
                "n_pairs",
                "n_docs_affected",
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("threshold")


def embedding_threshold_sweep_sql() -> str:
    lo = min(EMB_SWEEP_THRESHOLDS)
    legs = []
    for t in sorted(EMB_SWEEP_THRESHOLDS):
        legs.append(
            f"""
SELECT CAST({t} AS DOUBLE) AS threshold,
       (SELECT COUNT(*) FROM pairs WHERE sim >= {t}) AS n_pairs,
       (SELECT COUNT(*) FROM (
          SELECT DISTINCT v FROM (
            SELECT vec_a AS v FROM pairs WHERE sim >= {t}
            UNION ALL
            SELECT vec_b AS v FROM pairs WHERE sim >= {t}
          )
        )) AS n_docs_affected"""
        )
    body = "\nUNION ALL\n".join(legs)
    return f"""
WITH pairs AS MATERIALIZED (
  SELECT * FROM ({cosine_near_dup_sql(lo)}) q
)
SELECT * FROM (
{body}
) ORDER BY threshold
"""


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup inside embedding clusters
# --------------------------------------------------------------------------

#: within-cluster cosine above this marks a semantic duplicate
#: (Abbas et al. 2023 run 0.95+ on real embeddings; fixture-scaled so
#: the synthetic corpus exercises the drop path).
SEMDEDUP_THRESHOLD = 0.4

#: target cluster population; the cluster count scales as
#: max(16, ceil(n / SEMDEDUP_CLUSTER_TARGET)) — the paper's K ~ n
#: regime — so the within-cluster pair volume stays LINEAR in n
#: (~TARGET/2 candidate pairs per row) at every scale.
SEMDEDUP_CLUSTER_TARGET = 48

#: floor on the coarse quantizer width of the two-level assignment
#: (K_coarse = max(this, ceil(sqrt(K))) — sqrt keeps both levels'
#: per-row scan ~sqrt(K) entries).
SEMDEDUP_COARSE_MIN = 4

#: explicit candidate budget (pairs/row) for the within-cluster
#: self-join. Balanced clusters give ~TARGET/2 = 24 pairs/row; the
#: guard's default 32 trips on the sf0.1+ fixtures (largest seed
#: cluster 173 rows -> 42.5 pairs/row observed) because SemDeDup's
#: clusters are SUPPOSED to be semantically dense — that density is
#: what it deduplicates (Abbas et al. 2023) — and lowest-vec_id seed
#: centroids skew harder than trained k-means. 2x TARGET keeps the
#: bound linear in n and the guard loud against true degeneration
#: (an all-pairs collapse is O(n/TARGET) times this).
SEMDEDUP_MAX_PAIRS_PER_ROW = 2 * SEMDEDUP_CLUSTER_TARGET


def _semdedup_assigned(emb: DataFrame) -> DataFrame:
    """Shared two-level cluster assignment behind :func:`semdedup`
    and :func:`semdedup_threshold_sweep`: (vec_id, iv, nrm,
    cluster_id), materialized once per (session, input plan) via
    ``plan_keyed_cache`` + localCheckpoint and budget-guarded. See
    :func:`semdedup` for the full engine-shape rationale."""
    import math

    from soccerpredictor_spark.operators.scale import (
        candidate_budget_guard,
        plan_keyed_cache,
    )

    n = emb.count()
    k_fine = max(16, -(-int(n) // SEMDEDUP_CLUSTER_TARGET))
    k_coarse = max(SEMDEDUP_COARSE_MIN, int(math.ceil(math.sqrt(float(k_fine)))))
    base = fan_out(emb).select(
        "vec_id", V.int_vec(F.col("embedding")).alias("iv")
    ).select("vec_id", "iv", V.sq_norm_iv(F.col("iv")).alias("nrm"))
    coarse_arr = (
        base.orderBy("vec_id")
        .limit(k_coarse)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("vec_id").alias("cid"),
                        F.col("iv").alias("civ"),
                        F.col("nrm").alias("cnrm"),
                    )
                )
            ).alias("ccs")
        )
    )

    def _argmin_cid(arr_col):
        # (min dist, then min cid) — identical tie rule on both engines
        return F.array_min(
            F.transform(
                arr_col,
                lambda c: F.struct(
                    (
                        F.col("nrm")
                        - 2 * V.int_dot_iv(F.col("iv"), c["civ"])
                        + c["cnrm"]
                    ).alias("dist"),
                    c["cid"].alias("cid"),
                ),
            )
        )["cid"]

    # fine seed centroids -> their coarse cell (K rows x K_coarse scan)
    fine_cells = (
        base.orderBy("vec_id")
        .limit(k_fine)
        .crossJoin(F.broadcast(coarse_arr))
        .select(
            _argmin_cid(F.col("ccs")).alias("coarse_id"),
            F.col("vec_id").alias("cid"),
            F.col("iv").alias("civ"),
            F.col("nrm").alias("cnrm"),
        )
        .groupBy("coarse_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("cid", "civ", "cnrm"))
            ).alias("cell")
        )
    )
    assigned_plan = (
        base.crossJoin(F.broadcast(coarse_arr))
        .select(
            "vec_id", "iv", "nrm",
            _argmin_cid(F.col("ccs")).alias("coarse_id"),
        )
        # key join, NOT a forced broadcast: AQE sizes the cell table at
        # runtime (tiny here; a shuffle join at 100 TB, where the fine
        # centroid payload is O(n*dim/TARGET) bytes)
        .join(fine_cells, "coarse_id")
        .select(
            "vec_id", "iv", "nrm",
            _argmin_cid(F.col("cell")).alias("cluster_id"),
        )
    )
    assigned = plan_keyed_cache(
        _PAIR_CACHE,
        emb,
        ("semdedup_assign", k_fine),
        lambda: assigned_plan.localCheckpoint(),
    )
    candidate_budget_guard(
        assigned.select("vec_id", "cluster_id"),
        ["cluster_id"],
        "semdedup",
        max_pairs_per_row=SEMDEDUP_MAX_PAIRS_PER_ROW,
    )
    return assigned


def _semdedup_pairs(assigned: DataFrame):
    """Within-cluster candidate pairs (cluster_id, vec_a, vec_b) plus
    the exact-int cosine expression, shared by :func:`semdedup` and
    :func:`semdedup_threshold_sweep`."""
    a = assigned.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("iv").alias("iv_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = assigned.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("vec_b"),
        F.col("iv").alias("iv_b"),
        F.col("nrm").alias("nrm_b"),
    )
    sim = V.int_dot_iv(F.col("iv_a"), F.col("iv_b")).cast("double") / (
        F.sqrt(F.col("nrm_a").cast("double"))
        * F.sqrt(F.col("nrm_b").cast("double"))
    )
    pairs = a.join(b, "cluster_id").filter(F.col("vec_a") < F.col("vec_b"))
    return pairs, sim


def semdedup(emb: DataFrame) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop semantic duplicates —
    vectors whose cosine similarity inside the SAME embedding cluster
    exceeds ``SEMDEDUP_THRESHOLD`` — keeping one representative per
    duplicate neighborhood (deterministic keep-lowest-vec_id instead
    of the paper's random pick). Per-cluster readout of how much of
    the corpus semantic dedup removes.

    Engine shape:
    - cluster count K = max(16, ceil(n / SEMDEDUP_CLUSTER_TARGET)):
      the paper's K-grows-with-n regime, which keeps the
      within-cluster self-join ~TARGET/2 pairs per row — the PAIR
      volume is linear at 100 TB, guarded by
      ``candidate_budget_guard`` (loud abort, never a silent cap);
    - ASSIGNMENT is two-level (round-14 advice: a flat argmin over
      all K centroids is O(n*K) = O(n^2/TARGET) work and a
      with-n-growing single broadcast array row). A coarse quantizer
      of K_coarse = max(SEMDEDUP_COARSE_MIN, ceil(sqrt(K)))
      lowest-vec_id seeds is the only array broadcast to every row
      (O(sqrt(K)) structs — ~4.6k entries at 10^9 vectors, bounded);
      the K fine centroids (lowest-vec_id seeds; production drops
      trained k-means centroids into the same plan) are themselves
      coarse-assigned and grouped into per-cell arrays, and each row
      joins to ITS cell by coarse_id — a key join Catalyst/AQE sizes
      at runtime (broadcast at fixture scale, shuffle at 100 TB) —
      then takes the fine argmin over ~sqrt(K) in-cell entries.
      Total assignment work O(n*sqrt(K)); every fine centroid seeds
      its own cell (distance 0 to itself), so no cell is empty. This
      is IVF nprobe=1 semantics — both engines implement the
      identical two-level rule, so assignments match bit-for-bit
      (exact int64 distances, ties to the lowest centroid id);
    - the pairwise cosine is the ``cosine_near_dup`` convention:
      exact int64 dot / sqrt norms — both engines evaluate the
      identical expression tree, so the threshold compare is
      bit-equal;
    - a vector is DROPPED iff some same-cluster neighbor with a
      smaller vec_id clears the threshold (one left-semi per
      cluster member — no iteration, no connected components).

    K is read once from a count (bounded 1-row read at build time,
    the LSH-builder class). The assigned (vec_id, cluster_id) frame
    is materialized once via ``plan_keyed_cache`` + localCheckpoint
    before the budget guard reads it (round-14 advice: the guard's
    eager count must not re-evaluate the assignment for the output).
    Output: (cluster_id, n_items, n_dropped, keep_rate),
    cluster-ordered; clusters with no members are absent (the
    centroid spine is data-driven).
    """
    assigned = _semdedup_assigned(emb)
    pairs, sim = _semdedup_pairs(assigned)
    dropped = (
        pairs.filter(sim >= SEMDEDUP_THRESHOLD)
        .select("cluster_id", F.col("vec_b").alias("vec_id"))
        .distinct()
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .join(dropped, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_items",
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias(
                "n_dropped"
            ),
            (
                (F.col("n_items") - F.coalesce(F.col("n_dropped"), F.lit(0)))
                .cast("double")
                / F.col("n_items").cast("double")
            ).alias("keep_rate"),
        )
        .orderBy("cluster_id")
    )


def _semdedup_assigned_sql() -> str:
    """The shared WITH-chain (kk .. assigned) implementing the
    identical two-level coarse→fine assignment rule in DuckDB (exact
    int64 distances, ties to the lowest centroid id at both levels),
    composed by :func:`semdedup_sql` and
    :func:`semdedup_threshold_sweep_sql`."""
    nrm_f = V.sql_dot("f.cemb", "f.cemb")
    nrm_cc = V.sql_dot("c.ccemb", "c.ccemb")
    dot_fc = V.sql_dot("f.cemb", "c.ccemb")
    nrm_e = V.sql_dot("e.embedding", "e.embedding")
    dot_ec = V.sql_dot("e.embedding", "c.ccemb")
    nrm_r = V.sql_dot("r.embedding", "r.embedding")
    nrm_fc2 = V.sql_dot("f.cemb", "f.cemb")
    dot_rf = V.sql_dot("r.embedding", "f.cemb")
    return f"""kk AS (
  SELECT GREATEST(16, CAST(CEIL(CAST(COUNT(*) AS DOUBLE)
         / {SEMDEDUP_CLUSTER_TARGET}.0) AS BIGINT)) AS k
  FROM embeddings
),
kk2 AS (
  SELECT k, GREATEST({SEMDEDUP_COARSE_MIN},
         CAST(CEIL(SQRT(CAST(k AS DOUBLE))) AS BIGINT)) AS kc
  FROM kk
),
seeds AS (
  SELECT vec_id, embedding,
         ROW_NUMBER() OVER (ORDER BY vec_id ASC) AS rn
  FROM embeddings
),
fine AS (
  SELECT vec_id AS cid, embedding AS cemb
  FROM seeds CROSS JOIN kk2 WHERE rn <= kk2.k
),
coarse AS (
  SELECT vec_id AS ccid, embedding AS ccemb
  FROM seeds CROSS JOIN kk2 WHERE rn <= kk2.kc
),
fine_cell AS (
  SELECT cid, cemb, ccid AS coarse_id FROM (
    SELECT f.cid, f.cemb, c.ccid,
           ROW_NUMBER() OVER (
             PARTITION BY f.cid
             ORDER BY ({nrm_f}) - 2 * ({dot_fc}) + ({nrm_cc}) ASC,
                      c.ccid ASC
           ) AS rn
    FROM fine f CROSS JOIN coarse c
  ) WHERE rn = 1
),
row_coarse AS (
  SELECT vec_id, embedding, ccid AS coarse_id FROM (
    SELECT e.vec_id, e.embedding, c.ccid,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ({nrm_e}) - 2 * ({dot_ec}) + ({nrm_cc}) ASC,
                      c.ccid ASC
           ) AS rn
    FROM embeddings e CROSS JOIN coarse c
  ) WHERE rn = 1
),
assigned AS (
  SELECT vec_id, embedding, cid AS cluster_id FROM (
    SELECT r.vec_id, r.embedding, f.cid,
           ROW_NUMBER() OVER (
             PARTITION BY r.vec_id
             ORDER BY ({nrm_r}) - 2 * ({dot_rf}) + ({nrm_fc2}) ASC,
                      f.cid ASC
           ) AS rn
    FROM row_coarse r JOIN fine_cell f ON r.coarse_id = f.coarse_id
  ) WHERE rn = 1
)"""


def semdedup_sql() -> str:
    """DuckDB twin of :func:`semdedup` (K and K_coarse computed
    in-SQL from the same count + ceilings; assignment CTEs shared via
    :func:`_semdedup_assigned_sql`)."""
    cos = V.sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH {_semdedup_assigned_sql()},
dropped AS (
  SELECT cluster_id, COUNT(*) AS n_dropped
  FROM (
    SELECT DISTINCT a.cluster_id, b.vec_id
    FROM assigned a JOIN assigned b USING (cluster_id)
    WHERE a.vec_id < b.vec_id AND ({cos}) >= {SEMDEDUP_THRESHOLD}
  )
  GROUP BY cluster_id
)
SELECT s.cluster_id,
       COUNT(*) AS n_items,
       CAST(COALESCE(MAX(d.n_dropped), 0) AS BIGINT) AS n_dropped,
       CAST(COUNT(*) - COALESCE(MAX(d.n_dropped), 0) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS keep_rate
FROM assigned s LEFT JOIN dropped d ON s.cluster_id = d.cluster_id
GROUP BY s.cluster_id
ORDER BY s.cluster_id
"""


#: thresholds swept by semdedup_threshold_sweep — brackets the
#: operating point SEMDEDUP_THRESHOLD pins (the sweep-table family:
#: ``pq_m_sweep`` reads bytes-vs-recall, this reads the paper's
#: removal-rate-vs-threshold dial, Abbas et al. 2023 Fig. 2).
SEMDEDUP_SWEEP = (0.2, 0.4, 0.6, 0.8)


def semdedup_threshold_sweep(emb: DataFrame) -> DataFrame:
    """Corpus removal rate vs the SemDeDup cosine threshold — the
    tuning table for :func:`semdedup`'s single operating point: how
    much of the corpus semantic dedup would drop at each rung of
    ``SEMDEDUP_SWEEP``.

    Engine shape: the two-level cluster assignment is SHARED with
    :func:`semdedup` through the same ``plan_keyed_cache`` entry
    (key "semdedup_assign" — a session running both pays the
    checkpointed assignment once), and the within-cluster pair pass
    runs ONCE for all rungs: per victim vector, keep the MAX cosine
    against any smaller-vec_id same-cluster neighbor (one groupBy
    over the budget-guarded pair stream), then every rung is a pure
    comparison against that per-vector scalar — rungs cost one tiny
    aggregation each, never a pair-join re-run. Drop semantics are
    exactly :func:`semdedup`'s: dropped iff best incriminating
    cosine >= threshold.

    Output: (threshold, n_items, n_dropped, drop_rate),
    threshold-ordered; n_items is the full corpus count on every
    rung (the spine is the constant sweep tuple).
    """
    assigned = _semdedup_assigned(emb)
    pairs, sim = _semdedup_pairs(assigned)
    best = (
        pairs.select(F.col("vec_b").alias("vec_id"), sim.alias("s"))
        .groupBy("vec_id")
        .agg(F.max("s").alias("best_sim"))
    )
    spark = emb.sparkSession
    spine = spark.createDataFrame(
        [(float(t),) for t in SEMDEDUP_SWEEP], "threshold double"
    )
    n_items = assigned.agg(F.count(F.lit(1)).alias("n_items"))
    dropped = (
        spine.crossJoin(best)
        .filter(F.col("best_sim") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
    )
    return (
        spine.join(dropped, "threshold", "left")
        .crossJoin(F.broadcast(n_items))
        .select(
            "threshold",
            F.col("n_items").cast("long").alias("n_items"),
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias(
                "n_dropped"
            ),
            F.when(
                F.col("n_items") > 0,
                F.coalesce(F.col("n_dropped"), F.lit(0)).cast("double")
                / F.col("n_items").cast("double"),
            ).alias("drop_rate"),
        )
        .orderBy("threshold")
    )


def semdedup_threshold_sweep_sql() -> str:
    """DuckDB twin of :func:`semdedup_threshold_sweep` (assignment
    CTEs shared via :func:`_semdedup_assigned_sql`; the same
    per-victim best-cosine collapse, rungs as a VALUES spine)."""
    cos = V.sql_cosine("a.embedding", "b.embedding")
    spine = ", ".join(f"(CAST({t!r} AS DOUBLE))" for t in SEMDEDUP_SWEEP)
    return f"""
WITH {_semdedup_assigned_sql()},
best AS (
  SELECT b.vec_id, MAX({cos}) AS best_sim
  FROM assigned a JOIN assigned b USING (cluster_id)
  WHERE a.vec_id < b.vec_id
  GROUP BY b.vec_id
),
spine(threshold) AS (VALUES {spine}),
tot AS (SELECT COUNT(*) AS n_items FROM assigned),
dropped AS (
  SELECT s.threshold, COUNT(*) AS n_dropped
  FROM spine s JOIN best b ON b.best_sim >= s.threshold
  GROUP BY s.threshold
)
SELECT s.threshold,
       CAST(t.n_items AS BIGINT) AS n_items,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CASE WHEN t.n_items > 0
            THEN CAST(COALESCE(d.n_dropped, 0) AS DOUBLE)
                 / CAST(t.n_items AS DOUBLE) END AS drop_rate
FROM spine s CROSS JOIN tot t
LEFT JOIN dropped d ON s.threshold = d.threshold
ORDER BY s.threshold
"""


# --------------------------------------------------------------------------
# PQ subquantizer-count sweep
# --------------------------------------------------------------------------

#: subquantizer counts swept (PQ_EMB_DIM divisible by each; code size
#: = m nibbles at PQ_K = 16, so the sweep reads bytes-vs-recall).
PQ_M_SWEEP = (2, 4, 8)

#: distortion is reported in 2^-30-scaled int64 units (per-vector
#: encoding error summed over the corpus would overflow int64 raw:
#: |sub - c|^2 ~ dim * (2 * SCALE)^2 ~ 2^54 per vector).
PQ_DISTORTION_SHIFT = 1 << 30


def pq_m_sweep(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Recall@k and corpus encoding distortion vs the number of PQ
    subquantizers m — the bytes-per-vector dial of Jegou et al.'s
    product quantization (``pq_topk`` pins one operating point; this
    is its tuning table, the sweep-table family): more subspaces =
    more code bytes = finer ADC and lower distortion.

    Per rung: the ``pq_topk`` pipeline verbatim at m subspaces
    (deterministic lowest-vec_id codebooks; per-subspace argmin by
    exact int64 distance with ties to the lowest centroid id; ADC =
    integer sum of the query's distances to the CHOSEN centroids) —
    one broadcast codebook row and a pure scan projection per rung,
    zero vector shuffles. The exact top-k computes once. Distortion
    is the per-vector own-encoding error, 2^-30 scaled (integer DIV)
    before the corpus sum so the total stays inside int64 at any n.

    Output: (pq_m, n_exact, n_pq, n_hit, recall,
    total_distortion_q30), m-ordered.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    exact = _reliable_checkpoint(
        cosine_topk(emb, query_vec_id, k).select("vec_id")
    )
    base = fan_out(emb).select(
        "vec_id", V.int_vec(F.col("embedding")).alias("iv")
    )

    def _sqdist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    out = None
    for m in PQ_M_SWEEP:
        subdim = PQ_EMB_DIM // m
        subs = base.select(
            "vec_id",
            *[
                F.slice("iv", s * subdim + 1, subdim).alias(f"sub{s}")
                for s in range(m)
            ],
        )
        cb = (
            subs.orderBy("vec_id")
            .limit(PQ_K)
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("vec_id").alias("cid"),
                            *[
                                F.col(f"sub{s}").alias(f"csub{s}")
                                for s in range(m)
                            ],
                        )
                    )
                ).alias("cb")
            )
        )
        q = subs.filter(F.col("vec_id") == query_vec_id).select(
            *[F.col(f"sub{s}").alias(f"qsub{s}") for s in range(m)]
        )

        def _chosen(s: int):
            def per_centroid(c):
                return F.struct(
                    _sqdist(F.col(f"sub{s}"), c[f"csub{s}"]).alias("d"),
                    c["cid"].alias("cid"),
                    _sqdist(F.col(f"qsub{s}"), c[f"csub{s}"]).alias("qd"),
                )

            return F.array_min(F.transform(F.col("cb"), per_centroid))

        chosen = [_chosen(s) for s in range(m)]
        approx = (
            subs.crossJoin(F.broadcast(cb))
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                sum(
                    [c["qd"] for c in chosen[1:]], chosen[0]["qd"]
                ).alias("approx_dist"),
                sum([c["d"] for c in chosen[1:]], chosen[0]["d"]).alias(
                    "own_dist"
                ),
            )
        )
        approx = _reliable_checkpoint(approx)
        topk = (
            approx.orderBy(F.col("approx_dist").asc(), F.col("vec_id").asc())
            .limit(k)
            .select("vec_id")
        )
        hit = exact.join(topk, "vec_id", "left_semi")
        row = (
            exact.agg(F.count(F.lit(1)).alias("n_exact"))
            .crossJoin(topk.agg(F.count(F.lit(1)).alias("n_pq")))
            .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
            .crossJoin(
                approx.agg(
                    F.sum(
                        F.expr(
                            f"CAST(own_dist DIV {PQ_DISTORTION_SHIFT} "
                            "AS BIGINT)"
                        )
                    )
                    .cast("long")
                    .alias("total_distortion_q30")
                )
            )
            .select(
                F.lit(int(m)).cast("long").alias("pq_m"),
                "n_exact",
                "n_pq",
                "n_hit",
                (F.col("n_hit").cast("double") / F.lit(float(k))).alias(
                    "recall"
                ),
                F.coalesce(
                    F.col("total_distortion_q30"), F.lit(0).cast("long")
                ).alias("total_distortion_q30"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pq_m")


def pq_m_sweep_sql(query_vec_id: int = 0, k: int = 10) -> str:
    """DuckDB twin of :func:`pq_m_sweep` — one enc/adc leg per rung,
    sharing the exact top-k CTE."""
    iv = V.sql_int_vec("embedding")
    sq = (
        "list_sum(list_transform(range(1, {n}+1),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )
    legs = []
    for m in PQ_M_SWEEP:
        legs.append(f"""
SELECT CAST({m} AS BIGINT) AS pq_m,
       (SELECT COUNT(*) FROM exact_k) AS n_exact,
       (SELECT COUNT(*) FROM tk{m}) AS n_pq,
       (SELECT COUNT(*) FROM exact_k
        WHERE vec_id IN (SELECT vec_id FROM tk{m})) AS n_hit,
       CAST((SELECT COUNT(*) FROM exact_k
             WHERE vec_id IN (SELECT vec_id FROM tk{m}))
            AS DOUBLE) / {float(k)} AS recall,
       (SELECT CAST(COALESCE(SUM(own_dist // {PQ_DISTORTION_SHIFT}), 0)
               AS BIGINT) FROM adc{m}) AS total_distortion_q30""")
    leg_sql = "\nUNION ALL\n".join(legs)
    ctes = []
    for m in PQ_M_SWEEP:
        subdim = PQ_EMB_DIM // m
        subcols = ", ".join(
            f"((ivq)[{s * subdim + 1}:{(s + 1) * subdim}]) AS sub{s}"
            for s in range(m)
        )
        ctes.append(f"""
subs{m} AS (
  SELECT vec_id, ivq, {subcols}
  FROM (SELECT vec_id, {iv} AS ivq FROM embeddings)
),
cb{m} AS (
  SELECT vec_id AS cid,
         {", ".join(f"sub{s} AS csub{s}" for s in range(m))}
  FROM subs{m} ORDER BY vec_id LIMIT {PQ_K}
),
q{m} AS (
  SELECT {", ".join(f"sub{s} AS qsub{s}" for s in range(m))}
  FROM subs{m} WHERE vec_id = {query_vec_id}
),
unp{m} AS (
  SELECT e.vec_id, s.s,
         CASE s.s {" ".join(f"WHEN {s} THEN e.sub{s}" for s in range(m))}
         END AS sub,
         CASE s.s {" ".join(f"WHEN {s} THEN q.qsub{s}" for s in range(m))}
         END AS qsub
  FROM subs{m} e CROSS JOIN q{m} q
       CROSS JOIN (SELECT unnest(range({m})) AS s) s
),
cbu{m} AS (
  SELECT cid, s.s,
         CASE s.s {" ".join(f"WHEN {s} THEN csub{s}" for s in range(m))}
         END AS csub
  FROM cb{m} CROSS JOIN (SELECT unnest(range({m})) AS s) s
),
enc{m} AS (
  SELECT u.vec_id, u.s,
         {sq.format(n=subdim, a="u.qsub", b="c.csub")} AS qd,
         {sq.format(n=subdim, a="u.sub", b="c.csub")} AS od,
         ROW_NUMBER() OVER (
           PARTITION BY u.vec_id, u.s
           ORDER BY {sq.format(n=subdim, a="u.sub", b="c.csub")} ASC,
                    c.cid ASC
         ) AS rn
  FROM unp{m} u JOIN cbu{m} c USING (s)
),
adc{m} AS (
  SELECT vec_id,
         CAST(SUM(qd) AS BIGINT) AS approx_dist,
         CAST(SUM(od) AS BIGINT) AS own_dist
  FROM enc{m} WHERE rn = 1 GROUP BY vec_id
),
tk{m} AS (
  SELECT vec_id FROM adc{m}
  ORDER BY approx_dist ASC, vec_id ASC LIMIT {k}
)""")
    return f"""
WITH exact_k AS MATERIALIZED (
  SELECT vec_id FROM ({cosine_topk_sql(query_vec_id, k)}) e
),{",".join(ctes)}
SELECT * FROM (
{leg_sql}
) ORDER BY pq_m
"""


# --------------------------------------------------------------------------
# embedding integrity audit (pipeline pre-flight over docs x vectors)
# --------------------------------------------------------------------------

#: the audit's fixed check spine, alphabetical — every run emits all
#: six rows (zero-filled), so downstream alerting can key on the check
#: name without existence tests.
EMBEDDING_AUDIT_CHECKS = (
    "dim_mismatch",
    "missing_embedding",
    "non_finite",
    "null_embedding",
    "orphan_vector",
    "zero_norm",
)


def embedding_integrity_audit(vecs: DataFrame, docs: DataFrame) -> DataFrame:
    """Pre-flight integrity audit of an embedding table against its
    document spine — the check a pipeline runs BEFORE spending cluster
    time on ANN/semdedup over a join that silently drops rows:

    - ``missing_embedding`` — document with no vector row (the join
      would drop it from every downstream similarity op);
    - ``orphan_vector`` — vector with no document (stale embedding run);
    - ``null_embedding`` — vector row present but the array is NULL;
    - ``dim_mismatch`` — array length differs from the corpus MODE
      dimension (most frequent length; ties break to the smallest —
      a mixed-model embedding table);
    - ``zero_norm`` — no non-zero element (a zeroed vector cosines to
      NaN/garbage);
    - ``non_finite`` — any NaN or +/-Inf element.

    Checks overlap deliberately (a NULL array is neither zero_norm nor
    dim_mismatch; a NaN vector may also be zero_norm-false) — each row
    answers its own question.

    Scale: one (dim)-keyed agg for the mode (then a 1-row broadcast),
    one doc_id<->vec_id full outer equi-join (linear shuffle on the
    64-bit key), element predicates via ``exists``/``filter`` higher-
    order functions (JVM codegen, never Python), one global agg
    unpivoted over the fixed 6-row spine.

    Output: (check, n), check-ordered, always exactly 6 rows.
    """
    sized = vecs.select(
        "vec_id",
        "embedding",
        F.when(
            F.col("embedding").isNotNull(), F.size("embedding")
        ).alias("dim"),
    )
    mode = (
        sized.filter(F.col("dim").isNotNull())
        .groupBy("dim")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.max_by(
                F.col("dim"), F.struct(F.col("cnt"), (-F.col("dim")).alias("neg"))
            ).alias("mode_dim")
        )
    )
    d = docs.select("doc_id")
    j = d.join(sized, d.doc_id == sized.vec_id, "full_outer").join(
        F.broadcast(mode), how="cross"
    )
    inf = F.lit(float("inf"))
    flags = j.select(
        F.when(F.col("vec_id").isNull() & F.col("doc_id").isNotNull(), 1)
        .otherwise(0)
        .alias("missing_embedding"),
        F.when(F.col("doc_id").isNull() & F.col("vec_id").isNotNull(), 1)
        .otherwise(0)
        .alias("orphan_vector"),
        F.when(F.col("vec_id").isNotNull() & F.col("embedding").isNull(), 1)
        .otherwise(0)
        .alias("null_embedding"),
        F.when(F.col("dim") != F.col("mode_dim"), 1).otherwise(0).alias(
            "dim_mismatch"
        ),
        F.when(
            F.col("embedding").isNotNull()
            & (F.col("dim") > 0)
            & (F.size(F.filter("embedding", lambda x: x != F.lit(0.0))) == 0),
            1,
        )
        .otherwise(0)
        .alias("zero_norm"),
        F.when(
            F.exists("embedding", lambda x: F.isnan(x) | (F.abs(x) == inf)),
            1,
        )
        .otherwise(0)
        .alias("non_finite"),
    )
    agg = flags.agg(
        *[F.sum(c).cast("long").alias(c) for c in EMBEDDING_AUDIT_CHECKS]
    )
    stack_args = ", ".join(
        f"'{c}', coalesce({c}, 0L)" for c in EMBEDDING_AUDIT_CHECKS
    )
    return (
        agg.selectExpr(
            f"stack({len(EMBEDDING_AUDIT_CHECKS)}, {stack_args}) AS (check, n)"
        )
        .orderBy("check")
    )


def embedding_integrity_audit_sql() -> str:
    """DuckDB twin of :func:`embedding_integrity_audit` (scalar
    subquery keeps the mode row present even on an empty table,
    matching Spark's always-one-row global agg)."""
    selects = []
    for c in EMBEDDING_AUDIT_CHECKS:
        selects.append(
            f"SELECT '{c}' AS \"check\","
            f" CAST(COALESCE(SUM({c}), 0) AS BIGINT) AS n FROM flags"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH sized AS (
  SELECT vec_id, embedding,
         CASE WHEN embedding IS NOT NULL THEN len(embedding) END AS dim
  FROM embeddings
),
mode AS (
  SELECT (SELECT dim FROM (SELECT dim, COUNT(*) AS cnt FROM sized
                           WHERE dim IS NOT NULL GROUP BY dim)
          ORDER BY cnt DESC, dim ASC LIMIT 1) AS mode_dim
),
j AS (
  SELECT d.doc_id, s.vec_id, s.embedding, s.dim, m.mode_dim
  FROM (SELECT doc_id FROM documents) d
  FULL OUTER JOIN sized s ON d.doc_id = s.vec_id
  CROSS JOIN mode m
),
flags AS (
  SELECT
    CASE WHEN vec_id IS NULL AND doc_id IS NOT NULL THEN 1 ELSE 0 END
      AS missing_embedding,
    CASE WHEN doc_id IS NULL AND vec_id IS NOT NULL THEN 1 ELSE 0 END
      AS orphan_vector,
    CASE WHEN vec_id IS NOT NULL AND embedding IS NULL THEN 1 ELSE 0 END
      AS null_embedding,
    CASE WHEN dim <> mode_dim THEN 1 ELSE 0 END AS dim_mismatch,
    CASE WHEN embedding IS NOT NULL AND dim > 0
              AND len(list_filter(embedding, x -> x != 0)) = 0
         THEN 1 ELSE 0 END AS zero_norm,
    CASE WHEN embedding IS NOT NULL
              AND len(list_filter(embedding,
                                  x -> isnan(x) OR isinf(x))) > 0
         THEN 1 ELSE 0 END AS non_finite
  FROM j
)
SELECT * FROM ({union}) ORDER BY "check"
"""


# --------------------------------------------------------------------------
# Split balance audit (kv: eval-holdout composition per label)
# --------------------------------------------------------------------------

#: nominal eval share of the kv: md5 split (bucket 4 of 5).
SPLIT_EXPECTED_EVAL_FRAC = 0.2


def split_balance_audit(emb: DataFrame) -> DataFrame:
    """Composition audit of the ``kv:`` md5 eval holdout per class
    label — the pre-training check that the hash split did not land
    skewed on any class (a label whose eval fraction drifts far from
    the nominal 20% biases every eval metric computed on the split;
    hash splits are only uniform in expectation). The companion every
    consumer of the split (``knn_label_eval``,
    ``embedding_split_leakage``, ``embedding_eval_contamination``)
    reads before trusting per-class eval numbers.

    Engine shape: one scan projecting the split bucket (the shared
    ``_kv_eval_bucket`` md5 expression — identical on both engines),
    one (label) aggregation. Flat at any corpus size.

    Output: (label, n_total, n_eval, eval_frac, dev_from_expected),
    label-ordered; ``dev_from_expected`` = eval_frac -
    ``SPLIT_EXPECTED_EVAL_FRAC`` (labels never have n_total = 0 by
    construction — a label row exists only if vectors carry it).
    """
    tagged = emb.select(
        "label",
        (_kv_eval_bucket(F.col("vec_id")) == 4).cast("long").alias("e"),
    )
    agg = tagged.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("e").cast("long").alias("n_eval"),
    )
    frac = F.col("n_eval").cast("double") / F.col("n_total").cast("double")
    return (
        agg.withColumn("eval_frac", frac)
        .withColumn(
            "dev_from_expected",
            F.col("eval_frac") - F.lit(SPLIT_EXPECTED_EVAL_FRAC),
        )
        .orderBy("label")
    )


def split_balance_audit_sql() -> str:
    """DuckDB twin of :func:`split_balance_audit` — the identical
    md5 bucket expression and double arithmetic."""
    bkt = (
        "(CAST(concat('0x', substr(md5('kv:' || CAST(vec_id AS VARCHAR)), "
        "1, 8)) AS BIGINT) % 5 = 4)"
    )
    return f"""
WITH agg AS (
  SELECT label, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN {bkt} THEN 1 ELSE 0 END) AS BIGINT) AS n_eval
  FROM embeddings GROUP BY label
)
SELECT label, n_total, n_eval,
       CAST(n_eval AS DOUBLE) / CAST(n_total AS DOUBLE) AS eval_frac,
       CAST(n_eval AS DOUBLE) / CAST(n_total AS DOUBLE)
         - CAST({SPLIT_EXPECTED_EVAL_FRAC} AS DOUBLE) AS dev_from_expected
FROM agg ORDER BY label
"""
