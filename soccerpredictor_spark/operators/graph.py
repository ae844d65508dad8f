"""Graph analytics over a bounded co-activity graph.

The graph family a large-scale data pipeline needs once documents /
users / entities are linked: degree diagnostics, centrality
(PageRank), and triangle/clustering statistics. The reference engine
has no graph surface; these generalize its event-log queries
(``SoccerPredictor/DAO/ImpalaCon.py:79-106`` scan-shape) the same way
the dedup family generalizes its exact-match filters.

Edge construction is the load-bearing scale decision: edges are
generated ONLY inside (event_type, 15-minute) buckets whose distinct-
user count is <= ``MAX_USERS_PER_BUCKET`` — the same df-cap pattern as
``dedup_jaccard``'s shingle join. Per-bucket fan-out is bounded by
B*(B-1)/2, so total pair work is O(n_buckets * B^2) at ANY data scale;
a hot bucket (a global broadcast event touched by millions of users)
is excluded by the cap instead of detonating into an all-pairs join.

Cross-engine determinism: PageRank runs entirely in scaled int64
arithmetic (micro-units of 1e-12) — integer sums are associative and
order-independent, so Spark's partitioned aggregation and DuckDB's
single-threaded fold produce bit-identical ranks; doubles appear only
in final single-division display expressions evaluated identically by
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: co-activity bucket width (seconds) — 15-minute windows.
BUCKET_SECONDS = 900
#: df-cap: buckets with more distinct users than this generate no edges.
MAX_USERS_PER_BUCKET = 20
#: analytics (degree/PageRank/triangles) run on the RECURRING graph:
#: edges kept only when the pair co-occurred in >= this many buckets.
#: One-shot co-occurrence is mostly coincidence noise AND is what
#: densifies the graph (at sf0.1 the raw graph has 297k edges, avg
#: degree ~400, ~30M oriented wedges; weight>=2 keeps 43k edges and
#: the census runs in seconds) — the standard "robust graph"
#: threshold, applied identically in the DuckDB twins.
MIN_EDGE_WEIGHT = 2
#: fixed PageRank iteration count (deterministic plan depth).
PAGERANK_ITERS = 3
#: rank mass is represented in int64 units of 1/PAGERANK_SCALE.
PAGERANK_SCALE = 10**12
#: rows returned by graph_pagerank.
PAGERANK_TOPK = 20


def _bucketed_users(events: DataFrame) -> DataFrame:
    """Distinct (event_type, bucket, user) triples, with the bucket's
    distinct-user count attached. unix_timestamp truncates toward
    -inf on the UTC-pinned session, matching floor(epoch(ts))."""
    b = events.select(
        "event_type",
        F.expr(f"unix_timestamp(ts) div {BUCKET_SECONDS}").alias("bkt"),
        "user_id",
    ).distinct()
    w = Window.partitionBy("event_type", "bkt")
    return b.withColumn("nu", F.count(F.lit(1)).over(w))


def coactivity_edges(events: DataFrame) -> DataFrame:
    """Undirected weighted edge list (u < v): users co-active in the
    same capped bucket; weight = number of shared buckets.

    Plan shape: one distinct (shuffle on the bucket key), one window
    over the same partitioning (exchange reused), a self-join on the
    bucket key (co-partitioned, no extra shuffle of the big side), and
    one edge-key aggregation. Nothing is ever joined all-pairs.
    """
    capped = _bucketed_users(events).filter(
        F.col("nu") <= MAX_USERS_PER_BUCKET
    )
    a = capped.select("event_type", "bkt", F.col("user_id").alias("u"))
    b = capped.select("event_type", "bkt", F.col("user_id").alias("v"))
    return (
        a.join(b, ["event_type", "bkt"])
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


_EDGES_CTE = f"""
b AS (
  SELECT DISTINCT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // {BUCKET_SECONDS} AS bkt,
         user_id
  FROM events
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY event_type, bkt) AS nu FROM b
),
capped AS (SELECT * FROM sized WHERE nu <= {MAX_USERS_PER_BUCKET}),
edges AS (
  SELECT a.user_id AS u, c.user_id AS v, COUNT(*) AS weight
  FROM capped a JOIN capped c USING (event_type, bkt)
  WHERE a.user_id < c.user_id
  GROUP BY a.user_id, c.user_id
)"""


def coactivity_edges_sql() -> str:
    return f"WITH {_EDGES_CTE} SELECT u, v, weight FROM edges"


#: twin of _edges_checkpointed: the thresholded analytics graph.
def _strong_edges_cte() -> str:
    return (
        _EDGES_CTE
        + f""",
strong AS (SELECT u, v FROM edges WHERE weight >= {MIN_EDGE_WEIGHT})"""
    )


#: session-lifetime cache of materialized edge lists
#: (``scale.plan_keyed_cache`` semantics: plan-identity keyed,
#: collision- and session-guarded, bounded).
_EDGE_CACHE: dict = {}


def _edges_checkpointed(events: DataFrame) -> DataFrame:
    """The RECURRING-co-activity edge list (weight >= MIN_EDGE_WEIGHT),
    materialized once (mode-aware checkpoint, the
    ``dedup._reliable_checkpoint`` pattern): every graph statistic
    references the edges several times (union of directions, wedge
    self-join, per-iteration joins), and without the cut each
    reference re-embeds — and re-executes — the full bucket-join
    subtree (7+ replays in the 3-iteration PageRank plan).

    The materialized edges are CACHED per (session, input plan): six
    registry entries (degree/PageRank/triangles/components/link
    prediction/edges) share this prerequisite, and a session asking
    for several graph statistics over the same events should pay the
    bucket join once — the same contract as a user materializing a
    temp view. Identity is the full analyzed plan (``sameSemantics``),
    so a different path, filter, or literal — including empty-fixture
    and property-test inputs — can never hit a stale entry."""
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint
    from soccerpredictor_spark.operators.scale import plan_keyed_cache

    return plan_keyed_cache(
        _EDGE_CACHE,
        events,
        MIN_EDGE_WEIGHT,
        lambda: _reliable_checkpoint(
            coactivity_edges(events).filter(F.col("weight") >= MIN_EDGE_WEIGHT)
        ),
    )


def graph_degree_stats(events: DataFrame) -> DataFrame:
    """Degree histogram of the co-activity graph: (degree, n_users).

    The hubness diagnostic: a heavy right tail means the cap or the
    bucketing is too coarse. Degrees come from one union + one
    aggregation over the (already small, checkpointed) edge list.
    """
    e = _edges_checkpointed(events)
    sym = e.select(F.col("u").alias("user_id")).unionAll(
        e.select(F.col("v").alias("user_id"))
    )
    deg = sym.groupBy("user_id").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_users"))


def graph_degree_stats_sql() -> str:
    return f"""
WITH {_strong_edges_cte()},
sym AS (SELECT u AS user_id FROM strong UNION ALL SELECT v FROM strong),
deg AS (SELECT user_id, COUNT(*) AS degree FROM sym GROUP BY user_id)
SELECT degree, COUNT(*) AS n_users FROM deg GROUP BY degree
"""


def graph_pagerank(events: DataFrame) -> DataFrame:
    """Top-K users by PageRank on the co-activity graph
    (3 fixed power iterations, damping 0.85).

    TextRank-style centrality; on a document-similarity graph the same
    plan ranks representative documents. Exact arithmetic: ranks live
    in int64 micro-units; per-edge contribution is rank div degree
    (truncating integer division, identical in both engines on
    non-negative values), the per-node sum is an int64 aggregation
    (order-independent), and the damping update is
    (15*SCALE) div (100*n) + (85*S) div 100 — all int64. The double
    ``rank`` column is a single final division by a literal.

    Scale: each iteration is one join of the edge list with the
    (node-sized) rank table plus one aggregation — the standard
    distributed PageRank step. The rank side is nodes-only (never the
    fact table); on a real cluster both sides would be pre-partitioned
    by user_id so the per-iteration exchanges collapse to one.
    """
    e = _edges_checkpointed(events)
    # symmetrize: every undirected edge contributes in both directions
    sym = e.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        e.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("user_id"), "deg")
    n = nodes.select(F.count(F.lit(1)).alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "user_id",
        "deg",
        "n",
        F.expr(f"CAST({PAGERANK_SCALE} AS BIGINT) div n").alias("rank_micro"),
    )
    for _ in range(PAGERANK_ITERS):
        contrib = sym.join(
            ranks.withColumnRenamed("user_id", "src"), "src"
        ).select(
            F.col("dst").alias("user_id"),
            F.expr("rank_micro div deg").alias("c"),
        )
        s = contrib.groupBy("user_id").agg(F.sum("c").alias("s"))
        ranks = (
            ranks.select("user_id", "deg", "n")
            .join(s, "user_id", "left")
            .select(
                "user_id",
                "deg",
                "n",
                (
                    F.expr(f"CAST(15 * {PAGERANK_SCALE} AS BIGINT) div (100 * n)")
                    + F.expr("(85 * coalesce(s, CAST(0 AS BIGINT))) div 100")
                ).alias("rank_micro"),
            )
        )
    return (
        ranks.select(
            "user_id",
            "rank_micro",
            (F.col("rank_micro").cast("double") / F.lit(float(PAGERANK_SCALE))).alias(
                "rank"
            ),
        )
        .orderBy(F.col("rank_micro").desc(), F.col("user_id").asc())
        .limit(PAGERANK_TOPK)
    )


def graph_pagerank_sql() -> str:
    scale = PAGERANK_SCALE
    iters = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(
            f"""
s{i} AS (
  SELECT sym.dst AS user_id, CAST(SUM(r.rank_micro // r.deg) AS BIGINT) AS s
  FROM sym JOIN {prev} r ON sym.src = r.user_id
  GROUP BY sym.dst
),
r{i} AS (
  SELECT n.user_id, n.deg, n.n,
         CAST(15 * {scale} AS BIGINT) // (100 * n.n)
           + (85 * COALESCE(s{i}.s, 0)) // 100 AS rank_micro
  FROM r0_base n LEFT JOIN s{i} USING (user_id)
)"""
        )
        prev = f"r{i}"
    return f"""
WITH {_strong_edges_cte()},
sym AS (SELECT u AS src, v AS dst FROM strong
        UNION ALL SELECT v, u FROM strong),
degs AS (SELECT src AS user_id, COUNT(*) AS deg FROM sym GROUP BY src),
r0_base AS (SELECT user_id, deg, (SELECT COUNT(*) FROM degs) AS n FROM degs),
r0 AS (SELECT user_id, deg, n,
              CAST({scale} AS BIGINT) // n AS rank_micro FROM r0_base),
{",".join(iters)}
SELECT user_id, rank_micro,
       CAST(rank_micro AS DOUBLE) / {float(scale)!r} AS rank
FROM {prev}
ORDER BY rank_micro DESC, user_id ASC
LIMIT {PAGERANK_TOPK}
"""


def _oriented_triangles(e: DataFrame) -> tuple:
    """Degree table and once-enumerated triangle set ``(a, b, c)`` of
    the undirected edge list ``e`` via the classic degree-ordered
    orientation: every edge points from its lower-(degree, id)
    endpoint to the higher, so each triangle is generated exactly
    once and the wedge join's fan-out is bounded by the oriented
    out-degree. Shared by :func:`graph_triangles` (global census) and
    :func:`clustering_coefficient` (per-vertex counts) — one
    implementation, so an orientation/planner change can never
    silently diverge the two.

    No broadcast hint on the degree table: it has one row per NODE,
    which scales with the graph (billions at 100 TB) — a forced
    broadcast would OOM executors there. AQE picks the broadcast
    join on its own when the measured degree table is small, and
    falls back to a shuffled equi-join when it isn't.
    """
    sym = e.select(F.col("u").alias("user_id")).unionAll(
        e.select(F.col("v").alias("user_id"))
    )
    deg = sym.groupBy("user_id").agg(F.count(F.lit(1)).alias("deg"))
    du = deg.select(F.col("user_id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("user_id").alias("v"), F.col("deg").alias("deg_v"))
    lesser_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lesser_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lesser_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    # close the wedge: need edge between b and c in EITHER orientation
    closing = oriented.select(
        F.least("src", "dst").alias("b"), F.greatest("src", "dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    return deg, tri


def graph_triangles(events: DataFrame) -> DataFrame:
    """One-row triangle census of the co-activity graph:
    (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    clustering = 3*triangles/wedges (the global clustering
    coefficient).

    Scale: the classic degree-ordered orientation — every edge is
    directed from its lower-(degree, id) endpoint to the higher, so
    each triangle is generated exactly once and the wedge join's
    fan-out is bounded by the oriented out-degree (O(sqrt(m)) on
    arbitrary graphs, O(B) here thanks to the bucket cap) instead of
    the raw degree. The wedge set is then semi-joined back against the
    oriented edges; no step is quadratic in nodes.
    """
    e = _edges_checkpointed(events).select("u", "v")
    deg, tri = _oriented_triangles(e)
    # all census counts stay distributed aggregations (no driver-side
    # .count() actions); the three 1-row sides crossJoin for free
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) div 2")).alias("n_wedges"),
    )
    return (
        node_stats.crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select(
            "n_nodes",
            "n_edges",
            F.col("n_wedges").cast("long").alias("n_wedges"),
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
            ).alias("clustering"),
        )
    )


def graph_triangles_sql() -> str:
    return f"""
WITH {_strong_edges_cte()},
e AS (SELECT u, v FROM strong),
sym AS (SELECT u AS user_id FROM e UNION ALL SELECT v FROM e),
deg AS (SELECT user_id, COUNT(*) AS deg FROM sym GROUP BY user_id),
oriented AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM e JOIN deg du ON e.u = du.user_id
         JOIN deg dv ON e.v = dv.user_id
),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
  WHERE e1.dst < e2.dst
),
closing AS (SELECT least(src, dst) AS b, greatest(src, dst) AS c FROM oriented),
tri AS (
  SELECT COUNT(*) AS n_triangles FROM wedges w
  WHERE EXISTS (SELECT 1 FROM closing cl WHERE cl.b = w.b AND cl.c = w.c)
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       n_triangles,
       CASE WHEN (SELECT SUM(deg * (deg - 1) // 2) FROM deg) > 0
            THEN 3.0 * CAST(n_triangles AS DOUBLE)
                 / CAST((SELECT SUM(deg * (deg - 1) // 2) FROM deg) AS DOUBLE)
       END AS clustering
FROM tri
"""


#: link prediction: hub cap on the shared-neighbor node — wedges
#: through a node of degree > this are skipped (hubs carry little
#: evidence AND are the quadratic fan-out risk; same df-cap pattern
#: as the bucket cap above and dedup_jaccard's shingle cap).
LINK_MAX_HUB_DEGREE = 50
#: resource-allocation scores are summed in int units of 1/RA_SCALE.
LINK_RA_SCALE = 10**6
#: candidate pairs returned.
LINK_TOPK = 100


def link_prediction(events: DataFrame) -> DataFrame:
    """Link prediction on the recurring co-activity graph: for every
    non-adjacent pair at distance 2, the common-neighbor count and the
    resource-allocation index RA(u,v) = sum over shared neighbors z of
    1/deg(z) (Zhou/Lu/Zhang 2009 — Adamic-Adar's integer-friendly
    sibling), top-``LINK_TOPK`` by score.

    Exact arithmetic: per-neighbor contribution is
    ``LINK_RA_SCALE div deg(z)`` (truncating integer division,
    identical in both engines on non-negative ints) and the pair score
    is an int64 sum — order-independent, so partitioned aggregation
    matches DuckDB's fold bit-for-bit. The double ``ra_score`` is one
    final division by a literal.

    Scale: candidate pairs come from the wedge self-join on the shared
    node z, capped at deg(z) <= ``LINK_MAX_HUB_DEGREE`` — fan-out is
    bounded by cap^2 per node instead of detonating on hubs; existing
    edges leave via one anti-join on the (already small) edge list.
    No step touches the fact table twice or joins all-pairs.
    """
    e = _edges_checkpointed(events)
    sym = e.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionAll(
        e.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    deg = sym.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    hub_capped = sym.join(
        F.broadcast(deg.filter(F.col("deg") <= LINK_MAX_HUB_DEGREE)), "z"
    )
    a = hub_capped.select("z", "deg", F.col("nb").alias("u"))
    b = hub_capped.select("z", F.col("nb").alias("v"))
    wedges = a.join(b, "z").filter(F.col("u") < F.col("v"))
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.sum(F.expr(f"CAST({LINK_RA_SCALE} AS BIGINT) div deg")).alias("ra_micro"),
    )
    non_edges = scored.join(e.select("u", "v"), ["u", "v"], "left_anti")
    return (
        non_edges.select(
            "u",
            "v",
            "common_neighbors",
            "ra_micro",
            (F.col("ra_micro").cast("double") / F.lit(float(LINK_RA_SCALE))).alias(
                "ra_score"
            ),
        )
        .orderBy(F.col("ra_micro").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(LINK_TOPK)
    )


def link_prediction_sql() -> str:
    return f"""
WITH {_strong_edges_cte()},
sym AS (SELECT u AS z, v AS nb FROM strong
        UNION ALL SELECT v, u FROM strong),
deg AS (SELECT z, COUNT(*) AS deg FROM sym GROUP BY z),
hub_capped AS (
  SELECT s.z, d.deg, s.nb FROM sym s JOIN deg d USING (z)
  WHERE d.deg <= {LINK_MAX_HUB_DEGREE}
),
wedges AS (
  SELECT a.nb AS u, b.nb AS v, a.deg
  FROM hub_capped a JOIN hub_capped b USING (z)
  WHERE a.nb < b.nb
),
scored AS (
  SELECT u, v, COUNT(*) AS common_neighbors,
         CAST(SUM(CAST({LINK_RA_SCALE} AS BIGINT) // deg) AS BIGINT) AS ra_micro
  FROM wedges GROUP BY u, v
),
non_edges AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM strong e WHERE e.u = s.u AND e.v = s.v)
)
SELECT u, v, common_neighbors, ra_micro,
       CAST(ra_micro AS DOUBLE) / {float(LINK_RA_SCALE)!r} AS ra_score
FROM non_edges
ORDER BY ra_micro DESC, u ASC, v ASC
LIMIT {LINK_TOPK}
"""


def graph_components(events: DataFrame) -> DataFrame:
    """Connected components of the recurring co-activity graph:
    (user_id, component_id), component_id = smallest user_id reachable
    — community detection's first cut, and the same min-label
    machinery as ``dedup.near_dup_clusters`` (pointer-jumped
    propagation, O(log diameter) rounds, mode-aware checkpoints)
    applied to a user graph instead of a document graph.
    """
    from soccerpredictor_spark.operators.dedup import _components_from_pairs

    e = _edges_checkpointed(events).select(
        F.col("u").alias("doc_a"), F.col("v").alias("doc_b")
    )
    return _components_from_pairs(e).select(
        F.col("doc_id").alias("user_id"),
        F.col("cluster_id").alias("component_id"),
    )


def graph_components_sql() -> str:
    return f"""
WITH RECURSIVE
{_strong_edges_cte()},
sym AS MATERIALIZED (SELECT u AS a, v AS b FROM strong
                     UNION SELECT v, u FROM strong),
reach(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM sym) v
  UNION
  SELECT e.a, r.b FROM sym e JOIN reach r ON e.b = r.a
)
SELECT a AS user_id, MIN(b) AS component_id FROM reach GROUP BY a
"""


# --------------------------------------------------------------------------
# multi-source BFS distances
# --------------------------------------------------------------------------

#: BFS seed set size (the smallest connected user ids — deterministic).
BFS_SEEDS = 3
#: hop cap; unreached-within-cap nodes are excluded on BOTH engines.
BFS_MAX_HOPS = 12


def graph_bfs(
    events: DataFrame,
    max_hops: int = BFS_MAX_HOPS,
) -> DataFrame:
    """Multi-source BFS over the recurring co-activity graph:
    (user_id, dist) = fewest hops from the seed set (the BFS_SEEDS
    smallest connected user ids) — the influence-radius / proximity
    primitive behind friend-of-friend features and blast-radius
    analyses, and the remaining basic graph statistic the family
    lacked (components answers "which", BFS answers "how far").

    Iterative frontier relaxation as plain DataFrame ops: each round
    every node takes min(own dist, neighbor dist + 1); fixed point in
    O(diameter) rounds (true BFS distance has no pointer-jump
    shortcut — each hop must be traversed). Loop discipline as in
    ``dedup._components_from_pairs``: mode-aware checkpoint cuts the
    per-round plan and a (count, sum) fixed-point witness allows an
    EARLY exit once a round changes nothing. Unlike min-label
    propagation (where hitting the iteration cap leaves labels
    possibly non-final, so that operator raises), capped BFS needs no
    convergence confirmation at the cap: each relaxation round
    extends reach by exactly one hop and distances are filtered to
    <= max_hops, so after max_hops rounds every node within the cap
    holds its exact final distance — the witness only saves rounds,
    it never gates correctness (round-9 ADVICE: the previous raise
    here loudly diverged from the recursive-CTE twin's identical,
    correct rows on seed-eccentricity >= max_hops graphs). Distances
    are capped at ``max_hops`` on both engines (the twin explores
    (node, d) pairs with d < max_hops, so an any-cycle walk
    terminates), making the reachable set identical by construction.
    Each round is one shuffle join of the frontier against the
    checkpointed edge list — edges are never rewritten.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    edges = _edges_checkpointed(events)
    sym = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    seeds = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(BFS_SEEDS)
    )
    dist = _reliable_checkpoint(
        seeds.select("node", F.lit(0).cast("long").alias("dist"))
    )
    prev_witness = None
    hops_done = 0
    while hops_done < max_hops:
        # r20 (r19 verdict item 6): TWO relaxation rounds per
        # checkpoint + witness collect — each checkpoint/collect is a
        # driver round-trip whose scheduling overhead dominates these
        # frontier-sized jobs, and distances only need max_hops TOTAL
        # relaxations (extra rounds at the fixed point are no-ops), so
        # batching halves the job count without changing any distance.
        relaxed = dist
        for _ in range(min(2, max_hops - hops_done)):
            relaxed = (
                relaxed.join(sym, relaxed.node == sym.u)
                .select(
                    F.col("v").alias("node"), (F.col("dist") + 1).alias("dist")
                )
                .filter(F.col("dist") <= max_hops)
                .unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            hops_done += 1
        relaxed = _reliable_checkpoint(relaxed)
        row = relaxed.agg(
            F.count(F.lit(1)).alias("c"), F.sum("dist").alias("s")
        ).collect()[0]
        witness = (row.c, row.s)
        dist = relaxed
        if witness == prev_witness:
            break  # early exit only — max_hops rounds are already final
        prev_witness = witness
    return dist.select(F.col("node").alias("user_id"), "dist").orderBy("user_id")


def graph_bfs_sql(max_hops: int = BFS_MAX_HOPS) -> str:
    return f"""
WITH RECURSIVE
{_strong_edges_cte()},
sym AS MATERIALIZED (SELECT u, v FROM strong
                     UNION ALL SELECT v, u FROM strong),
seeds AS (SELECT u AS node FROM (SELECT DISTINCT u FROM sym) n
          ORDER BY node LIMIT {BFS_SEEDS}),
walk(node, d) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT s.v, w.d + 1 FROM walk w JOIN sym s ON s.u = w.node
  WHERE w.d < {max_hops}
)
SELECT node AS user_id, CAST(MIN(d) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY user_id
"""


# --------------------------------------------------------------------------
# per-vertex clustering coefficient
# --------------------------------------------------------------------------


def clustering_coefficient(events: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the co-activity
    graph: lcc(v) = 2*T(v) / (deg(v) * (deg(v) - 1)) — the
    per-node version of ``graph_triangles``'s global census (global
    answers "how clique-ish is the graph", this answers "WHICH nodes
    sit in cliques" — the ego-density feature behind community
    seeds and bot/collusion detection).

    Scale shape: same degree-ordered orientation as graph_triangles
    (each triangle enumerated exactly ONCE, wedge fan-out bounded by
    oriented out-degree), then each found triangle {a,b,c} explodes
    to its three corners and a per-vertex count aggregates — linear
    in triangles, never quadratic in nodes. Nodes with deg < 2 have
    no defined coefficient and emit no row (their wedge count is 0).
    """
    e = _edges_checkpointed(events).select("u", "v")
    deg, tri = _oriented_triangles(e)
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("user_id")
    )
    t_v = corners.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_tri"))
    return (
        deg.filter(F.col("deg") >= 2)
        .join(t_v, "user_id", "left")
        .select(
            "user_id",
            F.col("deg").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_triangles"),
            (
                F.lit(2.0) * F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double")
            ).alias("lcc"),
        )
        .orderBy("user_id")
    )


def clustering_coefficient_sql() -> str:
    return f"""
WITH {_strong_edges_cte()},
e AS (SELECT u, v FROM strong),
sym AS (SELECT u AS user_id FROM e UNION ALL SELECT v FROM e),
deg AS (SELECT user_id, COUNT(*) AS deg FROM sym GROUP BY user_id),
oriented AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM e JOIN deg du ON e.u = du.user_id
         JOIN deg dv ON e.v = dv.user_id
),
wedges AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
  WHERE e1.dst < e2.dst
),
closing AS (SELECT least(src, dst) AS b, greatest(src, dst) AS c FROM oriented),
tri AS (
  SELECT a, b, c FROM wedges w
  WHERE EXISTS (SELECT 1 FROM closing cl WHERE cl.b = w.b AND cl.c = w.c)
),
corners AS (
  SELECT a AS user_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
t_v AS (SELECT user_id, COUNT(*) AS n_tri FROM corners GROUP BY user_id)
SELECT d.user_id, CAST(d.deg AS BIGINT) AS degree,
       CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_triangles,
       CAST(2.0 AS DOUBLE) * CAST(COALESCE(t.n_tri, 0) AS DOUBLE)
         / CAST(d.deg * (d.deg - 1) AS DOUBLE) AS lcc
FROM deg d LEFT JOIN t_v t USING (user_id)
WHERE d.deg >= 2
ORDER BY d.user_id
"""


# --------------------------------------------------------------------------
# degree assortativity
# --------------------------------------------------------------------------


def graph_assortativity(events: DataFrame) -> DataFrame:
    """Degree assortativity of the co-activity graph: the Pearson
    correlation of endpoint degrees over the SYMMETRIZED edge list
    (Newman 2002) — positive means hubs attach to hubs (social
    shape), negative means hub-and-spoke (infrastructure shape); the
    one-number topology fingerprint degree histograms can't see.

    Exactness: both directions of every edge contribute, so the two
    endpoint marginals coincide and the statistic is the standard
    Pearson over exact int64 degree sums (the feature_corr
    sufficient-statistics convention, decimal(38,0) products, one
    final double expression, NULL-guarded on degree-regular graphs).
    One broadcast degree join over the checkpointed edge list; all
    aggregations map-side combinable.
    """
    e = _edges_checkpointed(events).select("u", "v")
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = (
        sym.select(F.col("u").alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    pairs = (
        sym.join(
            F.broadcast(
                deg.select(F.col("user_id").alias("u"), F.col("deg").alias("x"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                deg.select(F.col("user_id").alias("v"), F.col("deg").alias("y"))
            ),
            "v",
        )
        .select("x", "y")
    )
    d38 = "decimal(38,0)"
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x").cast(d38)).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y").cast(d38)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return agg.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.when(den > 0, (n * sxy - sx * sy) / den).alias("assortativity"),
    )


def graph_assortativity_sql() -> str:
    hug = "CAST(CAST({x} AS VARCHAR) AS DOUBLE)"
    return f"""
WITH {_strong_edges_cte()},
e AS (SELECT u, v FROM strong),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS user_id, COUNT(*) AS deg FROM sym GROUP BY u),
pairs AS (
  SELECT dx.deg AS x, dy.deg AS y
  FROM sym s JOIN deg dx ON s.u = dx.user_id
             JOIN deg dy ON s.v = dy.user_id
),
agg AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       CASE WHEN sqrt(CAST(n AS DOUBLE) * {hug.format(x='sxx')}
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * sqrt(CAST(n AS DOUBLE) * {hug.format(x='syy')}
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN (CAST(n AS DOUBLE) * {hug.format(x='sxy')}
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * {hug.format(x='sxx')}
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * {hug.format(x='syy')}
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS assortativity
FROM agg
"""


# --------------------------------------------------------------------------
# k-core decomposition (fixed k, iterative peel)
# --------------------------------------------------------------------------

#: the core order: nodes surviving repeated removal of degree < K.
KCORE_K = 3
#: peel-round cap; unconfirmed convergence raises (components rule:
#: an unfinished peel is NOT final, unlike capped BFS distances).
KCORE_MAX_ITER = 30


def kcore_decomposition(events: DataFrame, k: int = KCORE_K) -> DataFrame:
    """k-core of the co-activity graph: the maximal subgraph where
    every node keeps degree >= k after everyone weaker is removed —
    the standard dense-nucleus extractor (spam/collusion rings,
    community cores, the "keep the connected heart" filter that
    plain degree thresholds get WRONG because removing one weak node
    weakens its neighbors in cascade).

    Iterative peel as plain DataFrame ops: each round drops nodes
    with CURRENT degree < k and recomputes degrees on the induced
    subgraph; fixed point when the node count stops changing (the
    (count, sum) witness; since the survivor set only shrinks,
    count equality IS set equality — no hash needed). Peeling is
    idempotent at the fixed point, so an engine running extra
    rounds agrees bit-for-bit with one that early-exits — the
    oracle simply unrolls ``KCORE_MAX_ITER`` rounds. An UNCONFIRMED
    fixed point at the cap raises (the components discipline — a
    half-peeled core is not a k-core; contrast graph_bfs, whose
    capped distances ARE final). Each round is one shuffle join of
    the (shrinking, checkpointed) edge list; the raw edges are
    built once.
    """
    from soccerpredictor_spark.operators.dedup import _reliable_checkpoint

    edges = _edges_checkpointed(events).select("u", "v")
    cur = _reliable_checkpoint(edges)
    prev_n = None
    converged = False
    for _ in range(KCORE_MAX_ITER):
        sym = cur.select(F.col("u").alias("user_id")).unionAll(
            cur.select(F.col("v").alias("user_id"))
        )
        deg = sym.groupBy("user_id").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("user_id")
        nxt = _reliable_checkpoint(
            cur.join(
                keep.select(F.col("user_id").alias("u")), "u", "left_semi"
            ).join(
                keep.select(F.col("user_id").alias("v")), "v", "left_semi"
            )
        )
        n = nxt.count()
        cur = nxt
        if prev_n is not None and n == prev_n:
            converged = True
            break
        prev_n = n
    if not converged:
        raise RuntimeError(
            f"k-core: peel not converged within {KCORE_MAX_ITER} rounds — "
            "raise KCORE_MAX_ITER (a truncated peel is not a k-core)"
        )
    sym = cur.select(F.col("u").alias("user_id")).unionAll(
        cur.select(F.col("v").alias("user_id"))
    )
    return (
        sym.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .filter(F.col("core_degree") >= k)
        .orderBy("user_id")
    )


def kcore_decomposition_sql(k: int = KCORE_K) -> str:
    # unrolled peel: r0 = strong edges; r_{i+1} = r_i restricted to
    # endpoints with degree >= k in r_i. Idempotent past the fixed
    # point, so a fixed unroll depth equals the converged Spark loop.
    rounds = []
    prev = "strong"
    for i in range(KCORE_MAX_ITER):
        # AS MATERIALIZED is load-bearing: each round references its
        # predecessor 3x, so inlined CTEs would expand 3^30 ways (the
        # un-materialized form actually exhausted file handles
        # re-opening the parquet scan)
        rounds.append(f"""
d{i} AS MATERIALIZED (
  SELECT user_id, COUNT(*) AS deg FROM (
    SELECT u AS user_id FROM {prev} UNION ALL SELECT v FROM {prev}
  ) GROUP BY user_id
),
k{i} AS MATERIALIZED (SELECT user_id FROM d{i} WHERE deg >= {k}),
r{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  WHERE EXISTS (SELECT 1 FROM k{i} a WHERE a.user_id = e.u)
    AND EXISTS (SELECT 1 FROM k{i} b WHERE b.user_id = e.v)
)""")
        prev = f"r{i}"
    body = ",".join(rounds)
    return f"""
WITH {_strong_edges_cte()},{body}
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS core_degree FROM (
  SELECT u AS user_id FROM {prev} UNION ALL SELECT v FROM {prev}
) GROUP BY user_id HAVING COUNT(*) >= {k}
ORDER BY user_id
"""
