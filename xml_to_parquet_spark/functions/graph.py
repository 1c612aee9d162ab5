"""Graph ranking: weighted PageRank in integer fixed point.

The reference has no graph surface; in a web-corpus training pipeline a
link-graph importance score (the published PageRank recipe, Brin & Page
1998) is a standard quality-weighting signal next to the text-level
gates. The engine already has the iterative-join machinery (connected
components, functions/dedup.py:828); this is the same per-round shape —
one equi-join + one groupBy — with rank mass instead of min-labels.

Integer re-expression so the DuckDB oracle replays bit-identically:
ranks live in ``scale`` fixed-point units; one power-iteration round is

    rank'(v) = (15·scale) // (100·N)
             + Σ_{u→v} (85 · rank(u) · w(u,v)) // (100 · W(u))

with W(u) = Σ_w out-weights, damping 0.85 as the 85/100 rational, and
every division a truncating integer div. Dangling-node mass is dropped
(documented simplification, shared by many production implementations;
ranks then sum to slightly under ``scale``). Fixed ``iterations`` rounds
keep the oracle a finite CTE chain — the convergence-probe upgrade path
is identical to dedup_clusters' checksum early-exit.

Overflow contract: ``85 · rank · weight < 2^63`` ⇒ keep
``scale · max_edge_weight ≲ 10^17`` (documented; at the default
scale=10^9 edge weights up to ~10^8 transitions are safe).

Scale shape: edges are built ONCE by the caller (for the catalog query:
one lag-window over per-user event streams + a map-side-combined count
groupBy — corpus-sized but single-pass); each round's join/groupBy
touches only the aggregated EDGE table (≪ corpus) and the N-row rank
table; per-round ``localCheckpoint`` cuts the exponentially-growing
iterative lineage exactly as in dedup_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**9


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    scale: int = PR_SCALE,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over an (src, dst, weight) edge table.

    Returns (node, rank) in ``scale`` fixed-point units after
    ``iterations`` power-iteration rounds from the uniform start
    ``scale // N``. Deterministic, partitioning-invariant, and exactly
    SQL-replayable (see module docstring for the round formula).

    Each rank table is referenced once per round, so lineage grows
    LINEARLY (unlike dedup_clusters' twice-per-round exponential case) —
    a short fixed loop needs no materialization at all, and eager
    checkpoints only cost blocking jobs (measured −0.5 s at 3 rounds).
    ``checkpoint_every`` bounds plan depth for long runs; results are
    identical either way (equality-tested).
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    e = edges.join(outw, on="src").localCheckpoint(eager=True)
    # N and the per-round base stay IN the plan (1-row broadcast), so the
    # operator needs no driver action and the oracle derives them the
    # same way
    nstats = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(nstats)).select(
        "node", F.expr(f"div({scale}L, n_nodes)").alias("rank")
    )
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("div(85 * rank * weight, 100 * w_out)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(nstats))
            .select(
                "node",
                (
                    F.expr(f"div(15 * {scale}L, 100 * n_nodes)")
                    + F.coalesce(F.col("s"), F.lit(0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            # rank tables are node-count-sized — coalesce keeps the
            # blocking job's task count proportional to the data
            ranks = ranks.coalesce(8).localCheckpoint(eager=True)
    return ranks


def pagerank_sql(
    edges_cte: str,
    iterations: int = 3,
    scale: int = PR_SCALE,
) -> tuple[str, str]:
    """Oracle twin: returns (ctes, final_rank_table). ``edges_cte`` must
    select (src, dst, weight); compose the result into one WITH clause.
    """
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst AS node FROM edges)",
        "outw AS (SELECT src, CAST(SUM(weight) AS BIGINT) AS w_out "
        "FROM edges GROUP BY src)",
        "nstats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) // n_nodes AS rank "
        "FROM nodes CROSS JOIN nstats)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node,
         CAST(SUM(85 * r.rank * e.weight // (100 * o.w_out)) AS BIGINT) AS s
  FROM edges e JOIN outw o USING (src) JOIN {prev} r ON e.src = r.node
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{i} AS (
  SELECT n.node,
         CAST(15 * CAST({scale} AS BIGINT) // (100 * t.n_nodes)
              + COALESCE(c.s, 0) AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c USING (node) CROSS JOIN nstats t
)"""
        )
        prev = f"r{i}"
    return ",\n".join(parts), prev


def triangle_counts(
    edges: DataFrame,
    top_k: int = 20,
) -> DataFrame:
    """Per-node triangle participation via degree-ordered orientation —
    the published MapReduce triangle recipe (Suri & Vassilvitskii 2011;
    Cohen 2009). Input: an (src, dst) edge table, any direction,
    duplicates tolerated (canonicalized + distinct internally).

    Orient each undirected edge from its lower endpoint to its higher
    endpoint under the total order ``key(v) = (degree(v), v)``. Every
    triangle then materializes exactly once: as the wedge (x→y, x→z)
    with key(y) < key(z) closed by the oriented edge (y→z). The payoff
    at scale: out-degree under this orientation is bounded by O(√m)
    regardless of skew — a celebrity node of degree 10^6 generates
    wedges at its *out*-neighbors' expense, not d² of its own — so the
    wedge table (the only super-linear intermediate) is Σ d_out² ≤
    O(m^1.5) worst-case instead of Σ d² which is unbounded under skew.

    Shape: degree = one map-side-combined groupBy; orientation = two
    node-sized equi-joins; wedges = one self-equi-join on the spoke
    node; closure = one equi-join of wedges against oriented edges on
    the (y, z) pair; per-node counts = explode(3) + groupBy. No windows,
    no global sorts, no driver collects; every join key is an id, so AQE
    splits hot spokes.

    Returns ``(node, degree, triangles)`` — top ``top_k`` by triangles
    desc then node asc (deterministic). Nodes in no triangle are
    omitted (rank-k report, not a full profile)."""
    # und/deg/oriented are each referenced 2-3 times downstream, and the
    # caller's edge construction (often a heavy co-occurrence self-join)
    # sits in their lineage — without materialization every reference
    # replays it (q101 graph at sf0.1: 4.45 s → 1.8 s steady-state
    # together with the basket-array edge build).
    # All three are edge/node-sized, far below the input corpus.
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("d_b"))
    keyed = und.join(da, "a").join(db, "b")
    lower_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lower_first, F.col("d_b")).otherwise(F.col("d_a")).alias("d_dst"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select("src", F.col("dst").alias("y"), F.col("d_dst").alias("d_y"))
    o2 = oriented.select("src", F.col("dst").alias("z"), F.col("d_dst").alias("d_z"))
    wedges = o1.join(o2, "src").filter(
        (F.col("d_y") < F.col("d_z"))
        | ((F.col("d_y") == F.col("d_z")) & (F.col("y") < F.col("z")))
    )
    closing = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closing, ["y", "z"]).select(
        F.col("src").alias("x"), "y", "z"
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        per_node.join(deg, "node")
        .select("node", F.col("d").alias("degree"), "triangles")
        .orderBy(F.col("triangles").desc(), F.col("node").asc())
        .limit(top_k)
    )


def triangle_counts_sql(edges_cte: str, top_k: int = 20) -> str:
    """Oracle twin of :func:`triangle_counts`: same orientation total
    order, same wedge/closure chain. ``edges_cte`` must select
    (src, dst)."""
    return f"""
WITH raw_e AS ({edges_cte}),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw_e WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b AS node FROM und
  ) GROUP BY node
),
keyed AS (
  SELECT u.a, u.b, x.d AS d_a, y.d AS d_b
  FROM und u JOIN deg x ON u.a = x.node JOIN deg y ON u.b = y.node
),
oriented AS (
  SELECT CASE WHEN d_a < d_b OR (d_a = d_b AND a < b) THEN a ELSE b END AS src,
         CASE WHEN d_a < d_b OR (d_a = d_b AND a < b) THEN b ELSE a END AS dst,
         CASE WHEN d_a < d_b OR (d_a = d_b AND a < b) THEN d_b ELSE d_a
         END AS d_dst
  FROM keyed
),
wedges AS (
  SELECT o1.src, o1.dst AS y, o2.dst AS z
  FROM oriented o1 JOIN oriented o2 ON o1.src = o2.src
  WHERE o1.d_dst < o2.d_dst OR (o1.d_dst = o2.d_dst AND o1.dst < o2.dst)
),
tris AS (
  SELECT w.src AS x, w.y, w.z
  FROM wedges w JOIN oriented c ON w.y = c.src AND w.z = c.dst
),
per_node AS (
  SELECT node, COUNT(*) AS triangles FROM (
    SELECT x AS node FROM tris UNION ALL SELECT y FROM tris
    UNION ALL SELECT z FROM tris
  ) GROUP BY node
)
SELECT p.node, CAST(d AS BIGINT) AS degree,
       CAST(triangles AS BIGINT) AS triangles
FROM per_node p JOIN deg USING (node)
ORDER BY triangles DESC, node ASC LIMIT {top_k}
"""


def bfs_levels(
    edges: DataFrame,
    seeds: list[int],
    max_hops: int = 3,
    undirected: bool = True,
) -> DataFrame:
    """Multi-source BFS: how many NEW nodes each seed reaches at hop
    1..``max_hops`` — the reachability / neighborhood-growth profile
    (link-graph crawl-frontier sizing, contamination blast-radius
    checks). Classic iterative frontier expansion:

        frontier_h = (frontier_{h-1} ⋈ edges) ∖ visited

    with the visited set preventing re-counting across hops (a node is
    counted at its FIRST hop distance — BFS level, not walk count).

    Scale shape: per round one equi-join keyed on the frontier node
    (AQE-splittable) + one left-anti join against visited, both keyed
    tables ∝ seeds × reachable nodes (≪ corpus for bounded hops);
    per-round ``localCheckpoint`` cuts iterative lineage exactly as in
    pagerank/dedup_clusters. The hop count is fixed, so the oracle is a
    finite unrolled CTE chain (pagerank_sql style — no recursion).

    Returns ``(seed, hop, n_nodes)`` for hop 1..``max_hops`` (0 rows
    possible for exhausted frontiers — seeds that saturate early simply
    stop producing), ordered seed asc, hop asc."""
    e = edges.select("src", "dst")
    if undirected:
        # r13-opt: inline both directions in ONE pass — the old
        # union(edges, reversed(edges)) embedded the caller's edge
        # construction (a heavy co-occurrence groupBy for the catalog
        # entries) twice in the pre-checkpoint plan
        e = e.select(
            F.expr(
                "inline(array(named_struct('src', src, 'dst', dst),"
                " named_struct('src', dst, 'dst', src)))"
            )
        )
    e = e.distinct().localCheckpoint(eager=False)
    spark = edges.sparkSession
    seed_df = spark.createDataFrame(
        [(int(s),) for s in seeds], "seed long"
    )
    frontier = seed_df.select("seed", F.col("seed").alias("node"))
    visited = frontier
    out = None
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["seed", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        level = nxt.groupBy("seed").agg(
            F.count(F.lit(1)).alias("n_nodes")
        ).select("seed", F.lit(hop).alias("hop"), "n_nodes")
        out = level if out is None else out.unionByName(level)
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return out.orderBy("seed", "hop")


def bfs_levels_sql(
    edges_cte: str,
    seeds: list[int],
    max_hops: int = 3,
    undirected: bool = True,
) -> str:
    """Oracle twin of :func:`bfs_levels` — the same frontier/visited
    algebra unrolled into a finite CTE chain."""
    seed_rows = ", ".join(f"({s})" for s in seeds)
    und = (
        "SELECT src, dst FROM raw_e UNION SELECT dst AS src, src AS dst "
        "FROM raw_e"
        if undirected
        else "SELECT DISTINCT src, dst FROM raw_e"
    )
    parts = [
        f"raw_e AS ({edges_cte})",
        f"e AS ({und})",
        f"seeds(seed) AS (VALUES {seed_rows})",
        "f0 AS (SELECT seed, seed AS node FROM seeds)",
        "v0 AS (SELECT seed, node FROM f0)",
    ]
    levels = []
    for h in range(1, max_hops + 1):
        parts.append(
            f"""f{h} AS (
  SELECT DISTINCT f.seed, e.dst AS node
  FROM f{h - 1} f JOIN e ON f.node = e.src
  WHERE NOT EXISTS (SELECT 1 FROM v{h - 1} v
                    WHERE v.seed = f.seed AND v.node = e.dst)
)"""
        )
        parts.append(
            f"v{h} AS (SELECT seed, node FROM v{h - 1} "
            f"UNION ALL SELECT seed, node FROM f{h})"
        )
        levels.append(
            f"SELECT seed, {h} AS hop, COUNT(*) AS n_nodes "
            f"FROM f{h} GROUP BY seed"
        )
    union = "\nUNION ALL\n".join(levels)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT CAST(seed AS BIGINT) AS seed, CAST(hop AS BIGINT) AS hop,"
        f" CAST(n_nodes AS BIGINT) AS n_nodes FROM ({union})"
        " ORDER BY seed, hop"
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    undirected: bool = True,
) -> DataFrame:
    """k-core decomposition by iterative peeling — the link-graph
    curation gate (a page surviving the k-core has ``k`` neighbors that
    THEMSELVES have ``k`` qualifying neighbors; link farms and orphan
    chains peel away, which is why crawl-quality pipelines run this
    before trusting link-based signals).

    ``rounds`` must be >= 1 — the convergence certificate compares the
    last peel's survivor count against the final degree table, so a
    zero-round call has no "last peel" to certify.

    ``rounds`` fixed peels: each round keeps nodes with degree >= ``k``
    and restricts the edge set to kept endpoints. Peeling is monotone
    (only removes), so once a round removes nothing the state is the
    true k-core and every later round is a no-op — the fixed round
    count exists for the oracle (finite unrolled CTE chain, the
    bfs/pagerank pattern), and the output's ``converged`` flag (round
    R's node count == round R-1's) certifies in-band whether the true
    core was reached; re-run with more rounds when 0.

    Scale shape: per round ONE map-side-combined degree aggregation
    (shuffle ∝ surviving nodes) and ONE double semi-join of edges
    against the kept set (equi-joins, AQE-splittable/broadcastable as
    the survivor set shrinks); ``localCheckpoint`` cuts the iterative
    lineage each round. At 100 TB the survivor set shrinks
    geometrically for web-shaped graphs — later rounds are cheap.

    Returns ``(node, deg, converged)`` for nodes with >= 1 edge in the
    final restricted graph, ``deg`` = degree within it (all >= k iff
    converged), ordered by node. Self-loops are dropped (k-core is a
    simple-graph notion — a loop would let a node vouch for itself)."""
    if rounds < 1:
        raise ValueError(f"k_core needs rounds >= 1, got {rounds}")
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if undirected:
        # r13-opt: one-pass direction doubling (see bfs_levels) — the
        # union form computed the caller's edge subtree twice
        e = e.select(
            F.expr(
                "inline(array(named_struct('src', src, 'dst', dst),"
                " named_struct('src', dst, 'dst', src)))"
            )
        )
    e = e.distinct().localCheckpoint(eager=False)
    prev_nodes = None
    for _ in range(rounds):
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(
            F.col("src").alias("node")
        )
        e = (
            e.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        prev_nodes = keep
    # degree within the final restricted graph; converged = the last
    # peel removed nothing (node counts equal), broadcast into every row
    final_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    n_last = prev_nodes.agg(F.count(F.lit(1)).alias("n_kept"))
    n_final = final_deg.filter(F.col("deg") >= k).agg(
        F.count(F.lit(1)).alias("n_core")
    )
    conv = (
        n_last.crossJoin(n_final)
        .select(
            (F.col("n_kept") == F.col("n_core")).cast("int").alias(
                "converged"
            )
        )
    )
    return (
        final_deg.crossJoin(F.broadcast(conv))
        .select("node", "deg", "converged")
        .orderBy("node")
    )


def k_core_sql(
    edges_cte: str,
    k: int = 3,
    rounds: int = 6,
    undirected: bool = True,
) -> str:
    """Oracle twin of :func:`k_core` — identical peels unrolled as a
    finite CTE chain, identical convergence certificate, identical
    self-loop drop."""
    if rounds < 1:
        raise ValueError(f"k_core_sql needs rounds >= 1, got {rounds}")
    loopless = "SELECT src, dst FROM raw_e WHERE src <> dst"
    und = (
        f"SELECT src, dst FROM ({loopless}) "
        f"UNION SELECT dst AS src, src AS dst FROM ({loopless})"
        if undirected
        else f"SELECT DISTINCT src, dst FROM ({loopless})"
    )
    # AS MATERIALIZED: each e{i}/k{i} is referenced by the next two
    # CTEs — DuckDB's default inlining would expand the chain
    # exponentially (measured ~9x wall per extra round at sf0.001);
    # materializing pins the oracle to the same linear work per round
    # as the Spark plan's per-round localCheckpoint
    parts = [
        f"raw_e AS MATERIALIZED ({edges_cte})",
        f"e0 AS MATERIALIZED ({und})",
    ]
    for i in range(rounds):
        parts.append(
            f"""k{i} AS MATERIALIZED (
  SELECT src AS node FROM e{i} GROUP BY src HAVING COUNT(*) >= {k}
)"""
        )
        parts.append(
            f"""e{i + 1} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i} e
  JOIN k{i} a ON e.src = a.node JOIN k{i} b ON e.dst = b.node
)"""
        )
    last = rounds
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
fdeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM e{last} GROUP BY src),
conv AS (
  SELECT CAST((SELECT COUNT(*) FROM k{rounds - 1}) =
              (SELECT COUNT(*) FROM fdeg WHERE deg >= {k}) AS INT)
         AS converged
)
SELECT node, deg, converged FROM fdeg, conv ORDER BY node"""
    )
