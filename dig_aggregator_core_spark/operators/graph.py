"""Graph analytics over relational data — PageRank on the event-type
transition graph, the second iterative-algorithm family member beside
dedup_connected_components (label contraction) and
clustering.kmeans_embeddings (centroid refinement).

Scale shape: the expensive part at 100 TB is EDGE EXTRACTION — a lag
window per user (one shuffle on user_id, mid-cardinality keys) followed
by an aggregation to the weighted edge relation. The power iteration
itself then runs over the aggregated graph, which for a categorical node
domain is metadata-sized; for a large node domain the same joins become
shuffle joins on src/dst and nothing else changes. Ranks are rounded
each iteration on both engines so the schedule is bit-deterministic
(the [[kmeans]] rounding device).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import dir_fingerprint, load

DAMPING = 0.85
PR_ITERS = 5
_RND = 12  # per-iteration rank rounding (both engines)


def _pagerank_oracle() -> str:
    ctes = [
        # consecutive events per user define src -> dst transitions
        """ev AS (
      SELECT user_id, ts, event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )""",
        """edges AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM ev WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )""",
        """outw AS (
      SELECT src, SUM(w) AS total FROM edges GROUP BY src
    )""",
        """nodes AS (
      SELECT DISTINCT event_type AS node FROM events
    )""",
        """nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)""",
        f"""r0 AS (
      SELECT node, ROUND(1.0 / n, {_RND}) AS rank FROM nodes, nn
    )""",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
      SELECT n.node,
             ROUND((1.0 - {DAMPING}) / nn.n + {DAMPING} * COALESCE(c.m, 0),
                   {_RND}) AS rank
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank * e.w / o.total) AS m
        FROM edges e JOIN r{i - 1} r ON e.src = r.node
                     JOIN outw o ON e.src = o.src
        GROUP BY e.dst
      ) c ON n.node = c.node
    )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS event_type, ROUND(rank, 8) AS pagerank"
        f" FROM r{PR_ITERS}"
    )


@query("pagerank_transitions", oracle=_pagerank_oracle())
def pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph: edges = consecutive
    events per user (lag window), weights = transition counts, then
    {PR_ITERS} damped power iterations. Dangling mass is left unallocated
    (identically on both engines). Each iteration's ranks round to
    {_RND} decimals so Spark and the oracle walk bit-identical schedules.

    The per-user lag window is the corpus-scale stage (one shuffle on
    user_id); iterations run over the aggregated edge relation."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events").withColumn(
        "prev_type", F.lag("event_type").over(w)
    )
    edges = (
        ev.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count("*").cast("double").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("total"))
    nodes = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("node")
    ).distinct()
    # categorical node domain: materialize the tiny graph driver-side for
    # the iteration loop (same metadata-sized rule as kmeans centroids);
    # the heavy lag/aggregation above already ran distributed
    n = nodes.count()
    ranks = nodes.select(
        "node", F.round(F.lit(1.0) / n, _RND).alias("rank")
    )
    contrib_base = edges.join(outw, "src")
    for _ in range(PR_ITERS):
        contrib = (
            contrib_base.join(ranks, F.col("src") == F.col("node"))
            .groupBy(F.col("dst"))
            .agg(F.sum(F.col("rank") * F.col("w") / F.col("total")).alias("m"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left_outer")
            .select(
                "node",
                F.round(
                    (1.0 - DAMPING) / n
                    + DAMPING * F.coalesce(F.col("m"), F.lit(0.0)),
                    _RND,
                ).alias("rank"),
            )
        )
    return ranks.select(
        F.col("node").alias("event_type"),
        F.round("rank", 8).alias("pagerank"),
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH cooc AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
      FROM events
    ),
    edges AS (
      SELECT DISTINCT a.user_id AS u, b.user_id AS v
      FROM cooc a JOIN cooc b
        ON a.event_type = b.event_type AND a.h = b.h
       AND a.user_id < b.user_id
    ),
    tris AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e1.v = e2.u
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM tris
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting — the classic two-join graph algorithm (the
    clustering-coefficient numerator, and the canonical MapReduce graph
    benchmark). The graph is derived deterministically from the fixture:
    users co-occurring in the same (event_type, hour) share an undirected
    edge; triangles are counted by orienting every edge low->high
    (u < v) and joining edge(a,b) x edge(b,c) x edge(a,c) — the
    orientation means each triangle matches exactly once, no /6
    correction, and bounds each join's fan-out by the max out-degree.

    Scale: both joins shuffle on a single node key; the low->high
    orientation is the standard skew guard (a hub's edges split between
    its in- and out- sides). Degree-based orientation (order by degree,
    then id) is the further 100 TB refinement; same plan shape."""
    ev = load(spark, sf_dir, "events")
    cooc = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    a, b = cooc.alias("a"), cooc.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("u"), F.col("b.user_id").alias("v")
        )
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
    )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
    ).select("n_edges", "n_triangles")


@query(
    "event_transition_matrix",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    edges AS (
      SELECT prev_type AS src, event_type AS dst,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ev WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n,
           CAST((n * 1000000) // SUM(n) OVER (PARTITION BY src)
                AS BIGINT) AS p_micro,
           CAST(ROW_NUMBER() OVER (PARTITION BY src
             ORDER BY n DESC, dst) AS INT) AS dst_rank
    FROM edges
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the user event stream —
    the report behind journey Sankeys and the input to Markov-chain
    attribution: per (src, dst) event-type pair, the transition count,
    the row-normalized probability (integer micro-units — exact), and
    the destination's popularity rank within its source.

    Edge extraction is pagerank_transitions' exact shape (one lag window
    per user, one aggregation to the |types|^2-bounded edge relation);
    the normalization and ranking are windows OVER THE EDGE GRID —
    metadata-sized, never the event stream. The tie-break (count desc,
    then dst name) makes dst_rank deterministic on both engines."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return transition_grid(edges)


def transition_grid(edges: DataFrame) -> DataFrame:
    """Grid finalize shared with the streaming twin: (src, dst, n) edge
    counts -> probabilities + ranks via windows over the tiny grid."""
    w_src = Window.partitionBy("src")
    w_rank = Window.partitionBy("src").orderBy(F.col("n").desc(), "dst")
    return edges.select(
        "src",
        "dst",
        "n",
        F.expr("n * 1000000").alias("_num"),
        F.sum("n").over(w_src).alias("_den"),
        F.row_number().over(w_rank).cast("int").alias("dst_rank"),
    ).select(
        "src",
        "dst",
        "n",
        F.expr("_num DIV _den").alias("p_micro"),
        "dst_rank",
    )


_LPA_ITERS = 3


def _lpa_oracle() -> str:
    """Chained-CTE replay of synchronous majority-vote label propagation
    over the near-dup graph (minhash candidate+verify pairs, undirected),
    init label = own id, ties -> smallest label, fixed iterations."""
    from .dedup import _CORPUS_SQL, _MINHASH_SQL

    ctes = [
        _CORPUS_SQL.strip(),
        _MINHASH_SQL.strip().rstrip(","),
        """pairs AS (
      SELECT c.doc_a, c.doc_b FROM cand c
      JOIN shingled sa ON sa.doc_id = c.doc_a
      JOIN shingled sb ON sb.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(sa.sh_set, sb.sh_set)) AS DOUBLE)
            / (len(sa.sh_set) + len(sb.sh_set)
               - len(list_intersect(sa.sh_set, sb.sh_set))) >= 0.5
    )""",
        """edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    )""",
        """nodes AS (SELECT DISTINCT u AS node FROM edges)""",
        """l0 AS (SELECT node, node AS label FROM nodes)""",
    ]
    for i in range(1, _LPA_ITERS + 1):
        ctes.append(
            f"""l{i} AS (
      SELECT node, label FROM (
        SELECT e.u AS node, l.label,
               ROW_NUMBER() OVER (PARTITION BY e.u
                 ORDER BY COUNT(*) DESC, l.label) AS rk
        FROM edges e JOIN l{i - 1} l ON l.node = e.v
        GROUP BY e.u, l.label
      ) WHERE rk = 1
    )"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS doc_id, CAST(label AS BIGINT) AS community"
        f" FROM l{_LPA_ITERS}"
    )


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the near-dup graph — the fourth iterative-algorithm
    family member (CC contraction, k-means, PageRank, now LPA), and a
    DIFFERENT fixpoint than connected components: each round a node
    adopts the MAJORITY label among its neighbors (ties to the smallest
    label), so dense near-dup clusters converge to one community without
    chaining through weak bridges the way CC's min-label does.

    Determinism: init label = own id; the argmax is count desc then
    smallest label (pinned on both engines); a FIXED iteration count
    replaces LPA's usual run-to-quiescence (which is order-dependent and
    not engine-portable). Spark shape per round: edges join labels (hash
    join on node id), groupBy (node, label) with partial agg, then the
    per-node argmax via max_by over (count, -label) — no ranking window
    over the corpus-sized relation. Edge extraction reuses
    dedup_minhash_lsh verbatim; at 100 TB the rounds are |edges|-keyed
    hash joins and nothing else."""
    from .dedup import _neardup_pairs

    pairs = _neardup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # unionAll of two projections, NOT an explode-symmetrize: the MinHash
    # subtree is deduped by ReusedExchange (both branches share its
    # shuffle), so the union costs two cheap post-shuffle passes — an
    # explode(array(struct,struct)) was A/B-measured 10% SLOWER at sf0.1
    # (per-row struct construction in one serial pass beats nothing here).
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    ).localCheckpoint()
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ITERS):
        votes = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("label")
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = votes.groupBy("node").agg(
            F.min_by(
                F.col("label"), F.struct(-F.col("cnt"), F.col("label"))
            ).alias("label")
        )
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").cast("bigint").alias("community"),
    )


_BFS_ROUNDS = 4
_BFS_SEED_MOD = 25  # deterministic seed set: user_id % 25 == 0

_BFS_BAND = 3  # banded co-occurrence: each user links to its next 3
# bucket neighbors by id — |edges| <= 2 * BAND * |cooc rows|, LINEAR in
# the input where the naive all-pairs-in-bucket form is quadratic in
# per-bucket density (the x10 scaleproof measured the naive draft at 41x
# for 10x data; banding is the fan-out cap, the simjoin-prefix lesson)

_BFS_ORACLE = f"""
WITH RECURSIVE
cooc AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
),
r AS (
  SELECT event_type, h, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY user_id) AS rn
  FROM cooc
),
bp AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM r a JOIN r b
    ON a.event_type = b.event_type AND a.h = b.h
   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_BFS_BAND}
),
e AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM bp UNION ALL SELECT v, u FROM bp
  )
),
walk(node, dist) AS (
  SELECT DISTINCT user_id, 0 FROM events WHERE user_id % {_BFS_SEED_MOD} = 0
  UNION
  SELECT e.v, walk.dist + 1
  FROM walk JOIN e ON e.u = walk.node
  WHERE walk.dist < {_BFS_ROUNDS}
)
SELECT node AS user_id, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


@query("graph_bfs_distance", oracle=_BFS_ORACLE)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the user co-occurrence graph (the
    graph_triangle_count edge relation, both orientations): hop distance
    from a deterministic seed set (user_id % {mod} == 0) out to
    {k} rounds — the reachability/blast-radius primitive (fraud rings,
    influence radius, contamination spread) that completes the iterative
    family beside PageRank (diffusion), LPA (consensus), and CC
    (contraction).

    Edge derivation is BANDED co-occurrence: within each (event_type,
    hour) bucket each user links to its next {band} neighbors by id, so
    |edges| is linear in the cooc rows where the naive
    all-pairs-in-bucket join is quadratic in bucket density (measured
    41x at the x10 scaleproof before banding; graph connectivity within
    a bucket is preserved — a band ring reaches every member).

    Frontier form, the textbook scale shape: each round joins ONLY the
    newly-reached frontier against the edge relation (|frontier ⋈ edges|
    work, never |visited ⋈ edges|), anti-joins the visited set, and
    appends. Every join is an equi hash join on a node key; the visited
    set carries (node, dist) pairs only — no paths are ever
    materialized, which is exactly what the oracle's UNION-dedup
    recursive CTE also guarantees. Fixed {k} rounds keeps the plan
    static (the kmeans/PageRank device); an open-ended variant loops
    until the frontier empties with localCheckpoint per round (the
    dedup_connected_components fixpoint pattern)."""
    ev = load(spark, sf_dir, "events")
    # the iterative-op lineage rule (dedup_connected_components):
    # checkpoint the edge relation once (builder default) and each
    # round's frontier/visited, otherwise every later round re-embeds
    # the full co-occurrence join and the plan multiplies (the first
    # draft linted at 187 shuffles; checkpointed it is edges + 2/round)
    edges = banded_cooc_edges(spark, sf_dir, symmetric=True)
    seeds = (
        ev.filter(F.col("user_id") % _BFS_SEED_MOD == 0)
        .select("user_id")
        .distinct()
        .localCheckpoint()
    )
    dist = seeds.withColumn("dist", F.lit(0).cast("bigint"))
    frontier = seeds
    for i in range(1, _BFS_ROUNDS + 1):
        reached = (
            frontier.join(edges, frontier.user_id == edges.u)
            .select(F.col("v").alias("user_id"))
            .distinct()
        )
        fresh = reached.join(dist, "user_id", "left_anti").localCheckpoint()
        dist = dist.unionByName(
            fresh.withColumn("dist", F.lit(i).cast("bigint"))
        ).localCheckpoint()
        frontier = fresh
    return dist


graph_bfs_distance.__doc__ = graph_bfs_distance.__doc__.format(
    mod=_BFS_SEED_MOD, k=_BFS_ROUNDS, band=_BFS_BAND
)


_FOF_EDGE_SQL = f"""
cooc AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
),
r AS (
  SELECT event_type, h, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY user_id) AS rn
  FROM cooc
),
bp AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM r a JOIN r b
    ON a.event_type = b.event_type AND a.h = b.h
   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_BFS_BAND}
),
e AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM bp UNION ALL SELECT v, u FROM bp
  )
)"""


_FOF_CAP = 16  # deterministic per-node adjacency cap (smallest ids)

_FOF_ORACLE = f"""
WITH {_FOF_EDGE_SQL},
ec AS (
  SELECT u, v FROM (
    SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rk
    FROM e
  ) WHERE rk <= {_FOF_CAP}
),
n1 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg1 FROM ec GROUP BY u),
hop2 AS (
  SELECT DISTINCT e1.u, e2.v AS w
  FROM ec e1 JOIN ec e2 ON e1.v = e2.u
  WHERE e2.v <> e1.u
),
fresh AS (
  SELECT h.u, CAST(COUNT(*) AS BIGINT) AS deg2_new
  FROM hop2 h LEFT JOIN ec ON ec.u = h.u AND ec.v = h.w
  WHERE ec.u IS NULL GROUP BY h.u
)
SELECT n1.u AS user_id, n1.deg1,
       COALESCE(fresh.deg2_new, 0) AS deg2_new,
       n1.deg1 + COALESCE(fresh.deg2_new, 0) AS reach2
FROM n1 LEFT JOIN fresh ON fresh.u = n1.u
"""


@query("graph_neighborhood_2hop", oracle=_FOF_ORACLE)
def graph_neighborhood_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friends-of-friends: per node, the 1-hop degree and the count of
    NEW nodes first reachable at hop 2 — the neighborhood-growth metric
    behind audience expansion, influence estimation, and graph-feature
    engineering (deg2/deg1 is the local expansion rate). Complements
    graph_bfs_distance (distance from a fixed seed set) with a per-node
    neighborhood size; same banded co-occurrence edge relation.

    Scale shape: the adjacency is CAPPED to each node's B smallest-id
    neighbors before the 2-hop self-join, so |hop2| <= |V|·B² — linear
    in nodes — where the uncapped FoF bound Σ_v indeg(v)·outdeg(v) is
    quadratic in bucket membership (measured 24.9 s vs ~2 s at sf0.1;
    the simjoin prefix lesson applied to degree skew, and what every
    production FoF system does for superstar nodes). The deterministic
    cap (smallest ids, row_number) keeps the oracle exact. Then one
    distinct and one anti-join against the capped edges drop
    already-1-hop pairs; every join is an equi hash join on a node key.
    """
    # DEGREE CAP, applied for real (not just documented): each node keeps
    # its _FOF_CAP smallest-id neighbors, so |hop2| <= |V| * CAP^2 — the
    # uncapped form is Sum deg(u)*deg(v), quadratic in bucket membership
    # (measured 24.9 s at sf0.1; capped: ~2 s). Deterministic cap =
    # deterministic oracle. The capped relation is the session-memoized
    # checkpoint shared with link_prediction_adamic_adar (reused 4x
    # below — one materialization per session, not per call).
    edges = capped_cooc_edges(spark, sf_dir)
    n1 = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg1"))
    e2 = edges.select(F.col("u").alias("m"), F.col("v").alias("w"))
    hop2 = (
        edges.join(e2, edges.v == e2.m)
        .filter(F.col("w") != F.col("u"))
        .select("u", "w")
        .distinct()
    )
    fresh = hop2.join(
        edges.select("u", F.col("v").alias("w")), ["u", "w"], "left_anti"
    ).groupBy("u").agg(F.count(F.lit(1)).alias("deg2_new"))
    return (
        n1.join(fresh, "u", "left")
        .select(
            F.col("u").alias("user_id"),
            "deg1",
            F.coalesce("deg2_new", F.lit(0)).alias("deg2_new"),
            (F.col("deg1") + F.coalesce("deg2_new", F.lit(0))).alias(
                "reach2"
            ),
        )
    )


_KCORE_K = 3   # minimum degree to survive a peel
_KCORE_R = 3   # fixed peel rounds (both engines unroll identically)


def _kcore_oracle() -> str:
    sql = f"WITH {_FOF_EDGE_SQL.lstrip()}, e0 AS (SELECT u, v FROM e)"
    for r in range(1, _KCORE_R + 1):
        sql += f""",
k{r} AS (
  SELECT u FROM e{r - 1} GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
),
e{r} AS (
  SELECT e.u, e.v FROM e{r - 1} e
  JOIN k{r} a ON e.u = a.u JOIN k{r} b ON e.v = b.u
)"""
    sql += f"""
SELECT u AS user_id, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{_KCORE_R} GROUP BY u
"""
    return sql


@query("graph_kcore_decompose", oracle=_kcore_oracle())
def graph_kcore_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (Seidman 1983): repeatedly remove nodes with
    degree < k={k}; what survives is the densely-knit core — the
    community-backbone / spam-ring / influence-seed primitive that
    completes the iterative family (diffusion: PageRank, consensus:
    LPA, contraction: CC, reachability: BFS/FoF — this one is
    SUBTRACTIVE). Fixed {r} peel rounds so the plan is static and the
    unrolled-CTE oracle computes the identical partial peel; the
    open-ended variant loops until no node falls below k, checkpointing
    per round (the dedup_connected_components fixpoint pattern —
    convergence is monotone since degrees only ever decrease).

    Scale shape per round: one degree aggregation over the live edge
    relation plus two semi joins (u-side, v-side) against the
    |survivors| relation — all equi hash joins keyed on node ids, edge
    relation shrinks monotonically, and localCheckpoint per round keeps
    the lineage (and the replanned join tree) from compounding.
    """
    edges = banded_cooc_edges(spark, sf_dir, symmetric=True)
    for _ in range(_KCORE_R):
        keep = (
            edges.groupBy("u")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= _KCORE_K)
            .select("u")
            .localCheckpoint()
        )
        edges = (
            edges.join(keep, "u", "left_semi")
            .join(
                keep.select(F.col("u").alias("v")), "v", "left_semi"
            )
            .localCheckpoint()
        )
    return edges.groupBy("u").agg(
        F.count(F.lit(1)).alias("degree")
    ).select(F.col("u").alias("user_id"), "degree")


_AA_TOPK = 5  # suggestions kept per node


_AA_ORACLE = f"""
WITH {_FOF_EDGE_SQL},
ec AS (
  SELECT u, v FROM (
    SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rk
    FROM e
  ) WHERE rk <= {_FOF_CAP}
),
ecr AS (
  SELECT u, v FROM (
    SELECT u, v, ROW_NUMBER() OVER (PARTITION BY v ORDER BY u) AS rk
    FROM ec
  ) WHERE rk <= {_FOF_CAP}
),
deg AS (
  SELECT u AS z, CAST(COUNT(*) AS BIGINT) AS d FROM ec GROUP BY u
),
cand AS (
  SELECT a.u AS u, b.u AS w, a.v AS z
  FROM ecr a JOIN ecr b ON a.v = b.v AND a.u < b.u
),
nonedge AS (
  SELECT c.u, c.w, c.z FROM cand c
  LEFT JOIN ec e1 ON e1.u = c.u AND e1.v = c.w
  LEFT JOIN ec e2 ON e2.u = c.w AND e2.v = c.u
  WHERE e1.u IS NULL AND e2.u IS NULL
),
scored AS (
  SELECT n.u, n.w,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         CAST(SUM(CAST(FLOOR(1000000.0 / ln(d)) AS BIGINT))
              AS BIGINT) AS aa_micro
  FROM nonedge n JOIN deg ON deg.z = n.z
  WHERE deg.d >= 2
  GROUP BY n.u, n.w
)
SELECT u AS user_a, w AS user_b, n_common, aa_micro
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY u
             ORDER BY aa_micro DESC, n_common DESC, w) AS rk
  FROM scored
) WHERE rk <= {_AA_TOPK}
"""


@query("link_prediction_adamic_adar", oracle=_AA_ORACLE)
def link_prediction_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003): score each
    non-adjacent node pair by Σ_z 1/ln(deg(z)) over their common
    neighbors z — rare shared contacts weigh more than hubs — and keep
    each node's top-{k} suggestions. The "people you may know" / related-
    item primitive next to graph_neighborhood_2hop (which counts the
    2-hop frontier; this RANKS it).

    Scale shape: the adjacency is capped twice — forward (each node's
    {cap} smallest-id neighbors, the module's FoF device) and REVERSE
    (each neighbor keeps its {cap} smallest-id inviters) — so the
    common-neighbor self-join emits ≤ |V|·{cap}² candidate rows, linear
    in nodes, where the one-sided cap still lets a popular smallest-id
    neighbor fan out quadratically (Σ_z indeg(z)² is unbounded by the
    forward cap alone). Both caps are deterministic row_numbers, keeping
    the oracle exact. Scoring is an equi-join to the |V|-row degree
    table; per-term weights are floored to exact integer micro-units so
    the sum is order-free and the top-{k} ranking (window over ≤ {cap}²
    candidates per node) is cross-engine deterministic — no float
    summation order anywhere. Existing edges drop via two hash
    anti-joins on the capped relation. deg(z) ≥ 2 guards ln(1) = 0
    (a degree-1 neighbor carries no AA evidence by definition).
    """
    # session-memoized capped adjacency (shared with
    # graph_neighborhood_2hop): reused by reverse cap, degree, 2 anti-joins
    ec = capped_cooc_edges(spark, sf_dir)
    wrev = Window.partitionBy("v").orderBy("u")
    ecr = (
        ec.withColumn("rk", F.row_number().over(wrev))
        .filter(F.col("rk") <= _FOF_CAP)
        .drop("rk")
    )
    deg = ec.groupBy(F.col("u").alias("z")).agg(
        F.count(F.lit(1)).alias("d")
    )
    b = ecr.select(F.col("u").alias("w_"), F.col("v").alias("z"))
    cand = (
        ecr.select(F.col("u").alias("u"), F.col("v").alias("z"))
        .join(b, "z")
        .filter(F.col("u") < F.col("w_"))
    )
    nonedge = cand.join(
        ec.select(F.col("u"), F.col("v").alias("w_")), ["u", "w_"],
        "left_anti",
    ).join(
        ec.select(F.col("v").alias("u"), F.col("u").alias("w_")),
        ["u", "w_"],
        "left_anti",
    )
    scored = (
        nonedge.join(deg.filter(F.col("d") >= 2), "z")
        .groupBy("u", "w_")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(
                F.expr("CAST(FLOOR(1000000.0 / ln(d)) AS BIGINT)")
            ).alias("aa_micro"),
        )
    )
    wtop = Window.partitionBy("u").orderBy(
        F.col("aa_micro").desc(), F.col("n_common").desc(), F.col("w_")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= _AA_TOPK)
        .select(
            F.col("u").alias("user_a"),
            F.col("w_").alias("user_b"),
            "n_common",
            "aa_micro",
        )
    )


link_prediction_adamic_adar.__doc__ = (
    link_prediction_adamic_adar.__doc__.format(k=_AA_TOPK, cap=_FOF_CAP)
)


# memo keyed by (SparkSession, sf_dir, band, symmetric) — the _SH_CACHE
# precedent (dedup.py): six graph queries derive the SAME edge relation
# from events, and a session (the driver's 50-query run, a real pipeline's
# graph stage) should pay the cooc scan + rank window + band join once.
# Entries for a different sf_dir on the same session are dropped so a
# long-lived session iterating corpora can't accumulate checkpointed RDDs;
# the checkpointed blocks die with their last DataFrame reference.
_EDGE_CACHE: dict = {}


def banded_cooc_edges(
    spark: SparkSession,
    sf_dir: str,
    band: int = _BFS_BAND,
    symmetric: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """THE banded co-occurrence edge builder — the one shared derivation
    every graph operator in this module uses (BFS, FoF, k-core,
    Adamic-Adar, assortativity, LCC), factored so the next consumer
    cannot re-introduce the all-pairs-in-bucket join it replaces.

    Semantics: users co-occurring in the same (event_type, hour) bucket
    are ranked by user_id; each links to its next `band` rank-neighbors.
    Returns (u, v) low->high oriented (u < v, free from the rank order);
    `symmetric=True` appends the reversed copies so both orientations
    appear — disjoint from the oriented half, so the union stays
    duplicate-free without a second distinct.

    Scale shape (the fan-out-cap lesson, see PLANS.md): the band target
    is found by an EQUI hash join on (bucket, rn+d) after exploding d in
    1..band, so |edges| <= band * |cooc rows| — LINEAR in input where
    the naive all-pairs self-join is quadratic in bucket density
    (measured 41x at the x10 scaleproof before banding). Bucket
    connectivity is preserved: consecutive ranks are always linked, so a
    band graph spans every bucket member. Invariants (linearity, strict
    orientation, band reach, symmetry disjointness) are pinned by
    tests/test_banded_edges.py.

    `checkpoint=True` localCheckpoints the result — mandatory when the
    consumer fans the edges into multiple joins or an iterative loop
    (lineage re-embeds the full derivation per consumer otherwise; the
    BFS first draft linted at 187 shuffles uncheckpointed). Checkpointed
    results are memoized per (session, sf_dir + listing fingerprint,
    band, symmetric) so the derivation runs once per session, not once
    per consuming query — and an in-place corpus mutation invalidates."""
    key = (spark, sf_dir, dir_fingerprint(sf_dir), band, symmetric)
    if checkpoint:
        hit = _EDGE_CACHE.get(key)
        if hit is not None:
            return hit
        # keep sibling (band, symmetric) variants of the SAME dir+listing
        # and recent other dirs (bounded); evict stale listings of this
        # dir (ADVICE r10 via tables.evict_memo)
        from ..tables import evict_memo

        evict_memo(_EDGE_CACHE, spark, sf_dir, keep_fingerprint=key[2])
    ev = load(spark, sf_dir, "events")
    cooc = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    w = Window.partitionBy("event_type", "h").orderBy("user_id")
    r = cooc.withColumn("rn", F.row_number().over(w))
    probe = r.withColumn(
        "d", F.explode(F.sequence(F.lit(1), F.lit(band)))
    ).select(
        "event_type",
        "h",
        F.col("user_id").alias("u"),
        (F.col("rn") + F.col("d")).alias("rn2"),
    )
    other = r.select(
        F.col("event_type").alias("e2"),
        F.col("h").alias("h2"),
        F.col("user_id").alias("v"),
        F.col("rn").alias("rn2"),
    )
    edges = (
        probe.join(
            other,
            (F.col("event_type") == F.col("e2"))
            & (F.col("h") == F.col("h2"))
            & (probe.rn2 == other.rn2),
        )
        .select("u", "v")
        .distinct()
    )
    if symmetric:
        edges = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    if not checkpoint:
        return edges
    edges = edges.localCheckpoint()
    _EDGE_CACHE[key] = edges
    return edges


# memo for the degree-CAPPED symmetric adjacency (each node's _FOF_CAP
# smallest-id neighbors) — FoF and Adamic-Adar derive the IDENTICAL
# relation (same cap, same orientation) and each used to re-run the
# full cooc derivation + cap window per call (checkpoint=False bypassed
# the _EDGE_CACHE memo entirely, so even the banded edges were rebuilt
# per bench run). Same convention as _EDGE_CACHE/_SH_CACHE: in
# production this is the maintained capped-adjacency table a graph
# stage derives once per corpus snapshot.
_CAPPED_CACHE: dict = {}


def capped_cooc_edges(spark: SparkSession, sf_dir: str,
                      cap: int = _FOF_CAP) -> DataFrame:
    """Symmetric banded adjacency capped to each node's `cap` smallest-id
    neighbors, localCheckpointed and memoized per (session, corpus
    listing, cap). Deterministic cap (row_number by v) keeps the FoF/AA
    oracles exact; the base relation rides the _EDGE_CACHE memo."""
    key = (spark, sf_dir, dir_fingerprint(sf_dir), cap)
    hit = _CAPPED_CACHE.get(key)
    if hit is not None:
        return hit
    from ..tables import evict_memo

    # unpersist on eviction (ADVICE r12): these are localCheckpointed
    # edge relations — without the callback the evicted blocks stay
    # pinned until driver GC (the _SH_CACHE convention)
    evict_memo(_CAPPED_CACHE, spark, sf_dir, keep_fingerprint=key[2],
               unpersist=lambda df: df.unpersist())
    edges = banded_cooc_edges(spark, sf_dir, symmetric=True)
    wcap = Window.partitionBy("u").orderBy("v")
    ec = (
        edges.withColumn("rk", F.row_number().over(wcap))
        .filter(F.col("rk") <= cap)
        .drop("rk")
        .localCheckpoint()
    )
    _CAPPED_CACHE[key] = ec
    return ec


_ASSORT_ORACLE = f"""
WITH cooc AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
),
r AS (
  SELECT event_type, h, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY user_id) AS rn
  FROM cooc
),
edges AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM r a JOIN r b
    ON b.event_type = a.event_type AND b.h = a.h
   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_BFS_BAND}
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM edges
        UNION ALL SELECT v AS node FROM edges)
  GROUP BY node
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(du.d * dv.d) AS BIGINT) AS sjk,
         CAST(SUM(du.d + dv.d) AS BIGINT) AS sj,
         CAST(SUM(du.d * du.d + dv.d * dv.d) AS BIGINT) AS sj2
  FROM edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
)
SELECT n_edges,
       CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       ROUND((CAST(sjk AS DOUBLE) / n_edges
              - POW(CAST(sj AS DOUBLE) / (2 * n_edges), 2))
             / (CAST(sj2 AS DOUBLE) / (2 * n_edges)
                - POW(CAST(sj AS DOUBLE) / (2 * n_edges), 2)), 6) + 0.0
         AS assortativity
FROM m
WHERE CAST(sj2 AS DOUBLE) / (2 * n_edges)
      - POW(CAST(sj AS DOUBLE) / (2 * n_edges), 2) > 0
"""


@query("graph_degree_assortativity", oracle=_ASSORT_ORACLE)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman, PRL 2002): the Pearson correlation
    of endpoint degrees over edges — positive means hubs attach to hubs
    (social graphs), negative means hub-and-spoke (the web, biological
    nets), and the sign drives which partitioning/skew strategy a graph
    workload needs (disassortative graphs are exactly the ones where
    salting the hub key pays). Same deterministic co-occurrence graph as
    graph_triangle_count.

    Exactness: degrees are exact integers; the three edge moments
    (Σjk, Σ(j+k), Σ(j²+k²)) are exact BIGINT sums — bound m·d_max² ≈
    10¹⁸ at m=10⁹/d_max=10³, lift to DECIMAL(38,0) past that (the
    pca_power_component device) — and Newman's closed form is a single
    rounded double from those integers.

    Scale shape: degrees come from one node-keyed count over the edge
    endpoints; attaching them to edges is two linear equi-joins keyed on
    u then v (each a single bounded-key shuffle — the label-propagation
    join pattern), and everything collapses map-side into the 1-row
    moment frame. No window over the edge set, no corpus-sized state.
    Reference analog: frequencyAnalysis.py's per-group statistics layer
    (frequencyAnalysis.py:31-35) as a graph-topology statistic.
    """
    edges = banded_cooc_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    m = (
        edges.join(du, "u")
        .join(dv, "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
            F.sum(F.expr("du * dv")).cast("bigint").alias("sjk"),
            F.sum(F.expr("du + dv")).cast("bigint").alias("sj"),
            F.sum(F.expr("du * du + dv * dv"))
            .cast("bigint")
            .alias("sj2"),
        )
    )
    nn = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    mean = "CAST(sj AS DOUBLE) / (2 * n_edges)"
    var = f"CAST(sj2 AS DOUBLE) / (2 * n_edges) - POW({mean}, 2)"
    return (
        m.crossJoin(F.broadcast(nn))
        .filter(F.expr(f"{var} > 0"))
        .select(
            "n_edges",
            "n_nodes",
            F.expr(
                f"ROUND((CAST(sjk AS DOUBLE) / n_edges"
                f" - POW({mean}, 2)) / ({var}), 6) + 0.0"
            ).alias("assortativity"),
        )
    )


_LCC_ORACLE = f"""
WITH cooc AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
),
r0 AS (
  SELECT event_type, h, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY user_id) AS rn
  FROM cooc
),
edges AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM r0 a JOIN r0 b
    ON b.event_type = a.event_type AND b.h = a.h
   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_BFS_BAND}
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM edges
        UNION ALL SELECT v AS node FROM edges)
  GROUP BY node
),
tris AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
pert AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS tri
  FROM (SELECT a AS node FROM tris
        UNION ALL SELECT b AS node FROM tris
        UNION ALL SELECT c AS node FROM tris)
  GROUP BY node
)
SELECT deg.node AS user_id, deg.d AS degree,
       COALESCE(pert.tri, 0) AS n_triangles,
       CAST((COALESCE(pert.tri, 0) * 2000000)
            // (deg.d * (deg.d - 1)) AS BIGINT) AS lcc_micro
FROM deg LEFT JOIN pert ON pert.node = deg.node
WHERE deg.d >= 2
"""


@query("graph_clustering_coefficient", oracle=_LCC_ORACLE)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998):
    the share of a node's neighbor pairs that are themselves connected,
    2·T(v)/(d(d−1)) — the node-level refinement of
    graph_triangle_count's global number, and the standard community-
    structure / spam-subgraph feature (dense local cliques score ~1,
    star centers score 0). Runs on the BANDED co-occurrence graph (the
    graph_bfs_distance device — linear |edges|, see
    graph_degree_assortativity) with a degree-ORIENTED adjacency
    intersection — each triangle found ONCE on its lowest-degree edge,
    then credited to its three corners by an explode-style union, so
    the per-node count needs no /2 or /6 correction juggling beyond the
    closed form's own factor.

    Exactness: triangles and degrees are exact integers; the
    coefficient is a truncating-DIV micro on NONNEGATIVE values (the
    signed-DIV cross-engine trap doesn't apply). Nodes with d < 2 have
    no defined coefficient and are excluded (division guard).

    Scale shape: single-node-key shuffles only (adjacency aggregate,
    corner-credit aggregate) with the low->high orientation as the skew
    guard; wedges are compared inside a narrow per-edge projection and
    never exchanged. Output is nodes-sized — a
    per-node FEATURE, not a report, so no top-k window is imposed.
    Reference analog: frequencyAnalysis.py's per-group statistics layer
    (frequencyAnalysis.py:31-35) as a topology feature.
    """
    edges0 = banded_cooc_edges(spark, sf_dir)
    deg = (
        edges0.select(F.col("u").alias("node"))
        .unionAll(edges0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .localCheckpoint()  # feeds the reorientation AND the report join
    )
    # DEGREE-ordered orientation (the triangle_count docstring's "further
    # 100 TB refinement", applied): re-point every edge from its lower-
    # (degree, id) endpoint to the higher one. The join fan-out is then
    # bounded by the graph's degeneracy instead of the max degree — the
    # classic arboricity argument — which cut this op 11.2 s -> measured
    # below at sf0.1. The triangle SET is orientation-invariant, so the
    # oracle keeps the simpler id-ordering.
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    edges = (
        edges0.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(
                F.struct(F.col("v").alias("s"), F.col("u").alias("t"))
            )
            .alias("e")
        )
        .select(F.col("e.s").alias("u"), F.col("e.t").alias("v"))
        .localCheckpoint()
    )
    # Adjacency-INTERSECTION triangle listing (r12): the former
    # wedge-join (e1 |><| e2 on v=u, then probe e3) materialized and
    # shuffled every wedge — 17.2M wedge rows for 188k edges at sf0.1 on
    # this dense co-occurrence graph — before the e3 probe killed the
    # open ones. Intersecting out-neighbor sets per EDGE does the same
    # element-compares inside a narrow projection: no wedge rows ever
    # hit an exchange, and the only wide ops are the nodes-sized adj
    # aggregate and the corner-credit aggregate. A triangle x<y<z (in
    # the degree order) is found exactly once, on its (x, y) edge, as
    # z in N+(x) /\ N+(y) — same multiplicity as the wedge join, so the
    # corner credits are unchanged. No broadcast HINT on adj: it is
    # nodes-sized (fits at every test SF, where Catalyst auto-BHJs it;
    # at 100 TB it degrades to a node-keyed shuffle join that still
    # exchanges only nodes+edges rows, never wedges). Measured
    # 3.16 s -> 0.86 s exec at sf0.1, identical 1500-row output.
    par = spark.sparkContext.defaultParallelism
    spread = (
        edges.repartition(par, "u")
        if edges.rdd.getNumPartitions() < par
        else edges
    )
    adj = edges.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    ew = (
        spread.join(
            adj.select(F.col("u"), F.col("nbrs").alias("un")), "u", "left"
        )
        .join(
            adj.select(
                F.col("u").alias("v"), F.col("nbrs").alias("vn")
            ),
            "v",
            "left",
        )
        .select(
            "u",
            "v",
            F.expr(
                "array_intersect(coalesce(un, array()),"
                " coalesce(vn, array()))"
            ).alias("ws"),
        )
    )
    # corner credit in ONE explode: u and v each close size(ws)
    # triangles on this edge, every w in ws closes one
    pert = (
        ew.select(
            F.explode(
                F.expr(
                    "concat(array(named_struct('node', u, 'c', size(ws)),"
                    "             named_struct('node', v, 'c', size(ws))),"
                    "       transform(ws, w -> named_struct('node', w,"
                    "                                       'c', 1)))"
                )
            ).alias("s")
        )
        .select("s.node", "s.c")
        .groupBy("node")
        .agg(F.sum("c").cast("bigint").alias("tri"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(pert, "node", "left")
        .select(
            F.col("node").alias("user_id"),
            F.col("d").alias("degree"),
            F.coalesce("tri", F.lit(0)).cast("bigint").alias(
                "n_triangles"
            ),
            F.expr(
                "CAST((COALESCE(tri, 0) * 2000000)"
                " DIV (d * (d - 1)) AS BIGINT)"
            ).alias("lcc_micro"),
        )
    )


# ------------------------------------------- weighted SSSP (Bellman-Ford)

_SSSP_ROUNDS = _BFS_ROUNDS  # same hop bound as BFS => sandwich property
_SSSP_WMOD = 7  # deterministic edge cost 1 + (u + v) % 7 in [1, 7]

_SSSP_ORACLE = f"""
WITH RECURSIVE
cooc AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
),
r AS (
  SELECT event_type, h, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type, h
                            ORDER BY user_id) AS rn
  FROM cooc
),
bp AS (
  SELECT a.user_id AS u, b.user_id AS v
  FROM r a JOIN r b
    ON a.event_type = b.event_type AND a.h = b.h
   AND b.rn BETWEEN a.rn + 1 AND a.rn + {_BFS_BAND}
),
e AS (
  SELECT DISTINCT u, v FROM (
    SELECT u, v FROM bp UNION ALL SELECT v, u FROM bp
  )
),
ew AS (SELECT u, v, 1 + (u + v) % {_SSSP_WMOD} AS w FROM e),
walk(node, d, hops) AS (
  SELECT DISTINCT user_id, CAST(0 AS BIGINT), 0
  FROM events WHERE user_id % {_BFS_SEED_MOD} = 0
  UNION
  SELECT ew.v, walk.d + ew.w, walk.hops + 1
  FROM walk JOIN ew ON ew.u = walk.node
  WHERE walk.hops < {_SSSP_ROUNDS}
)
SELECT node AS user_id, CAST(MIN(d) AS BIGINT) AS dist
FROM walk GROUP BY node
"""


@query("graph_sssp_weighted", oracle=_SSSP_ORACLE)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted multi-source shortest path, frontier Bellman-Ford over
    the banded co-occurrence graph: min path COST (deterministic
    integer edge cost 1 + (u+v) % {wm}, a stand-in for a real affinity/
    latency weight) from the BFS seed set within {k} relaxation rounds.
    Completes the traversal family: graph_bfs_distance answers "how many
    hops", this answers "how cheap" — and since every edge costs >= 1,
    hops <= dist <= {wm} * hops is a pinned cross-operator invariant
    (tests/test_sssp.py).

    Frontier form (delta-stepping-lite): each round relaxes ONLY edges
    out of nodes whose distance improved last round — |frontier ⋈ edges|
    work — takes the per-node round minimum, keeps strict improvements
    vs the accumulated distance map (left join + null-or-less filter),
    and merges via anti-join + union. Standard induction gives
    dist_i(v) = min cost over <= i-hop paths, exactly the oracle's
    bounded recursive-CTE MIN. Integer costs make the fold order-free —
    no float-sum drift across engines or executors.

    Scale: all joins are equi hash joins on a node key; per-round state
    is (node, dist) only; localCheckpoint per round caps lineage (the
    graph_bfs_distance device). Edge weights ride the memoized
    checkpointed edge relation, derived once per session."""
    ev = load(spark, sf_dir, "events")
    edges = banded_cooc_edges(spark, sf_dir, symmetric=True).withColumn(
        "w", (F.lit(1) + (F.col("u") + F.col("v")) % _SSSP_WMOD).cast("bigint")
    )
    seeds = (
        ev.filter(F.col("user_id") % _BFS_SEED_MOD == 0)
        .select("user_id")
        .distinct()
        .localCheckpoint()
    )
    dist = seeds.withColumn("d", F.lit(0).cast("bigint"))
    frontier = dist
    for _ in range(_SSSP_ROUNDS):
        cand = (
            frontier.join(edges, frontier.user_id == edges.u)
            .select(F.col("v").alias("user_id"), (F.col("d") + F.col("w")).alias("nd"))
            .groupBy("user_id")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(dist, "user_id", "left")
            .filter(F.col("d").isNull() | (F.col("nd") < F.col("d")))
            .select("user_id", F.col("nd").alias("d"))
            .localCheckpoint()
        )
        dist = (
            dist.join(improved, "user_id", "left_anti")
            .unionByName(improved)
            .localCheckpoint()
        )
        frontier = improved
    return dist.select("user_id", F.col("d").alias("dist"))


graph_sssp_weighted.__doc__ = graph_sssp_weighted.__doc__.format(
    wm=_SSSP_WMOD, k=_SSSP_ROUNDS
)
