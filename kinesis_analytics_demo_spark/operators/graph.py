"""Graph analytics: PageRank over the order-derived trade graph.

PageRank (Page et al. 1999) with a fixed iteration count, expressed as
pure DataFrame joins/aggregations — the canonical "iterative algorithm
on Spark" shape: the per-iteration plan is

    ranks (small)  --broadcast-->  edges (large)  --shuffle on dst-->
    next ranks

so each iteration costs one hash aggregation over the edge list; the
edge list itself is computed once and persisted. Driver-side work is
loop control only (K is a constant), never data.

Cross-engine determinism (the float-accumulation trap): the only
order-sensitive operation in PageRank is the per-destination SUM of
contributions. Each per-edge contribution is computed in float64,
rounded to 12 digits, cast to DECIMAL(28,12), and summed in DECIMAL —
order-insensitive and exact. The scalar update (teleport + damped
dangling mass + damped contribution sum) is a fixed left-to-right
chain of single IEEE-754 double ops, identical on both engines, and
the result is re-rounded to 12 digits before it becomes the next
iteration's DECIMAL state.

Scale: ranks are O(nodes) and broadcast; at node counts beyond
broadcast limits, drop the hint and let AQE pick a shuffle join with
both sides hash-partitioned on the join key — the iteration count
doesn't change the asymptotics (K x one shuffle of O(edges)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

DAMPING = 0.85
PR_ITERS = 5
_SCALE = 12  #: decimal digits carried between iterations


def pagerank(
    nodes: DataFrame,  # (node_id)
    edges: DataFrame,  # (src, dst), distinct
    iters: int = PR_ITERS,
    damping: float = DAMPING,
) -> DataFrame:
    """Fixed-iteration PageRank with uniform teleport and dangling-
    mass redistribution. Returns ``(node_id, rank)`` with rank a
    12-digit-rounded double; ranks sum to ~1."""
    edges = tracked_persist(edges.select("src", "dst").distinct())
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # nodes with outdeg joined once; dangling = no out-edges
    base = tracked_persist(
        nodes.select("node_id").distinct().join(
            outdeg, nodes["node_id"] == outdeg["src"], "left"
        ).select("node_id", "outdeg")
    )
    n_nodes = base.count()  # loop-control scalar, not data movement
    if n_nodes == 0:
        # empty graph: empty result with the output schema
        return base.select(
            "node_id", F.lit(None).cast("double").alias("rank")
        )
    init = round(1.0 / n_nodes, _SCALE)
    ranks = base.select(
        "node_id",
        "outdeg",
        F.lit(init).cast(f"decimal(28,{_SCALE})").alias("rank"),
    )
    for _ in range(iters):
        ranks = tracked_persist(ranks)
        # order-insensitive dangling mass: DECIMAL sum of exact state
        dangling = (
            ranks.filter(F.col("outdeg").isNull())
            .agg(F.sum("rank").alias("dm"))
            .select(F.coalesce(F.col("dm"), F.lit(0).cast("decimal(28,12)")).alias("dm"))
        )
        contrib = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["node_id"])
            .select(
                "dst",
                F.round(
                    F.col("rank").cast("double") / F.col("outdeg"), _SCALE
                )
                .cast(f"decimal(28,{_SCALE})")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        new_rank = F.round(
            F.lit(1.0 - damping) / n_nodes
            + F.lit(damping) * F.col("dm").cast("double") / n_nodes
            + F.lit(damping)
            * F.coalesce(F.col("csum"), F.lit(0).cast("decimal(28,12)")).cast(
                "double"
            ),
            _SCALE,
        )
        ranks = (
            base.join(contrib, base["node_id"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node_id",
                "outdeg",
                new_rank.cast(f"decimal(28,{_SCALE})").alias("rank"),
            )
        )
    return ranks.select(
        "node_id", F.col("rank").cast("double").alias("rank")
    )


def _pr_oracle(iters: int = PR_ITERS, damping: float = DAMPING) -> str:
    """DuckDB twin: the identical unrolled iteration chain."""
    graph_ctes = f"""
WITH edges AS (
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
nodes AS (
    SELECT c_custkey * 2 AS node_id FROM customer
    UNION ALL
    SELECT s_suppkey * 2 + 1 FROM supplier),
outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
base AS (
    SELECT n.node_id, o.outdeg
    FROM nodes n LEFT JOIN outdeg o ON n.node_id = o.src),
nn AS (SELECT count(*) AS n FROM base),
r0 AS (
    SELECT node_id, outdeg,
           CAST(ROUND(1.0 / (SELECT n FROM nn), {_SCALE})
                AS DECIMAL(28,{_SCALE})) AS rank
    FROM base)"""
    tail = f"""
SELECT CASE WHEN node_id % 2 = 0 THEN 'c' || CAST(node_id // 2 AS BIGINT)
            ELSE 's' || CAST((node_id - 1) // 2 AS BIGINT) END AS node_id,
       CAST(rank AS DOUBLE) AS rank
FROM r{iters}"""
    return pr_unrolled_oracle(graph_ctes, tail, iters=iters, damping=damping)


def pr_unrolled_oracle(
    graph_ctes: str,
    tail: str,
    iters: int = PR_ITERS,
    damping: float = DAMPING,
) -> str:
    """Generic unrolled-CTE PageRank oracle: caller supplies the
    graph-construction CTEs (must define ``edges(src, dst)``,
    ``base(node_id, outdeg)``, ``nn(n)`` and the ``r0`` initial-rank
    CTE, opening with ``WITH``) and the final SELECT reading
    ``r{{iters}}``; this emits the dm/cs/r iteration chain between
    them — the exact decimal/round arithmetic the Spark ``pagerank``
    helper performs, so any graph wired through both is bit-exact."""
    d = damping
    parts = [graph_ctes]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f"""
dm{i} AS (
    SELECT COALESCE(SUM(rank), CAST(0 AS DECIMAL(28,{_SCALE}))) AS dm
    FROM r{p} WHERE outdeg IS NULL),
cs{i} AS (
    SELECT e.dst,
           SUM(CAST(ROUND(CAST(r.rank AS DOUBLE) / r.outdeg, {_SCALE})
                    AS DECIMAL(28,{_SCALE}))) AS csum
    FROM edges e JOIN r{p} r ON e.src = r.node_id
    GROUP BY e.dst),
r{i} AS (
    SELECT b.node_id, b.outdeg,
           CAST(ROUND({1.0 - d} / (SELECT n FROM nn)
                      + {d} * CAST((SELECT dm FROM dm{i}) AS DOUBLE)
                        / (SELECT n FROM nn)
                      + {d} * CAST(COALESCE(c.csum,
                            CAST(0 AS DECIMAL(28,{_SCALE}))) AS DOUBLE),
                      {_SCALE}) AS DECIMAL(28,{_SCALE})) AS rank
    FROM base b LEFT JOIN cs{i} c ON b.node_id = c.dst)""")
    return ",".join(parts) + tail


@register(
    "pagerank_trade_graph",
    oracle=_pr_oracle(),
    doc="PageRank (5 fixed iterations, damping 0.85, dangling-mass "
    "redistribution) over the bipartite customer->supplier trade "
    "graph derived from orders x lineitem. Iterative-algorithm-on-"
    "Spark template: broadcast small rank state into the persisted "
    "edge list, one shuffle per iteration; the only order-sensitive "
    "op (per-dst contribution sum) runs in DECIMAL over 12-digit-"
    "rounded terms, so Spark and the unrolled-CTE DuckDB oracle agree "
    "bit-for-bit.",
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Integer node encoding (customers even: 2k; suppliers odd: 2k+1)
    # keeps the wide stages — the edge-list distinct and every
    # iteration's shuffle — on 8-byte keys instead of strings; the
    # human-readable 'c<k>'/'s<k>' ids appear only in the final
    # O(nodes) projection. ~3x faster edge build at sf0.1.
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    edges = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    nodes = customer.select(
        (F.col("c_custkey") * 2).alias("node_id")
    ).unionByName(
        supplier.select((F.col("s_suppkey") * 2 + 1).alias("node_id"))
    )
    out = pagerank(nodes, edges)
    label = F.when(
        F.col("node_id") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node_id") / 2).cast("bigint")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node_id") - 1) / 2).cast("bigint"))
    )
    return out.select(label.alias("node_id"), "rank")


MB_MIN_SUPPORT = 2  #: co-purchase edge threshold (matches market basket)


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS u, c.l_partkey AS v
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MB_MIN_SUPPORT}),
    nodes AS (SELECT u AS x FROM e UNION SELECT v FROM e),
    tri AS (
        SELECT count(*) AS t
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST(tri.t AS BIGINT) AS n_triangles
    FROM tri
    """,
    doc="Triangle counting over the co-purchase graph (part pairs "
    "sharing >= 2 orders): edges are stored ORIENTED (u < v), so "
    "each triangle is found exactly once by the wedge join "
    "e1(u,v) x e2(v,w) closed by e3(u,w) — the standard distributed "
    "triangle scheme. At scale, orient by (degree, id) instead of "
    "raw id so wedge counts are bounded by sqrt(edges) per node "
    "(heavy hitters become wedge CENTERS, never wedge ENDS). Two "
    "hash joins on integer pairs; the graph-cohesion audit number.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    c = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    e = tracked_persist(
        a.join(c, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MB_MIN_SUPPORT)
        .select("u", "v")
    )
    n_nodes = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .distinct()
        .count()
    )
    n_edges = e.count()
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .count()
    )
    return e.sparkSession.range(1).select(
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.lit(tri).cast("bigint").alias("n_triangles"),
    )


# ------------------------------------------------------- BFS levels
BFS_SOURCE_CUSTKEY = 1  #: BFS root: customer #1 (node id 2)
BFS_MAX_DEPTH = 10  #: oracle recursion guard; >> graph eccentricity


def bfs_levels(edges: DataFrame, source: int) -> DataFrame:
    """Breadth-first search levels from ``source`` over a directed
    edge list — the frontier-expansion iterative shape (the other
    canonical graph loop besides pagerank's full-relaxation): each
    round joins the (small, broadcastable) frontier against the edge
    list, anti-joins out already-visited nodes, and stops when the
    frontier empties. Driver work is loop control (one count per
    level); per-level cost is one hash join over O(edges) + one
    anti-join over O(visited). Levels are exact integers — no float
    discipline needed."""
    edges = tracked_persist(edges.select("src", "dst").distinct())
    spark = edges.sparkSession
    levels = tracked_persist(
        spark.createDataFrame([(source, 0)], "node_id long, level int")
    )
    frontier = levels
    lvl = 0
    # Cap at the oracle's recursion guard: without it a node more than
    # BFS_MAX_DEPTH hops out would appear in the Spark result but not
    # the recursive-CTE oracle (ADVICE r4 — parity silently depended
    # on graph diameter).
    while lvl < BFS_MAX_DEPTH:
        lvl += 1
        nxt = tracked_persist(
            edges.join(
                F.broadcast(frontier),
                edges["src"] == frontier["node_id"],
            )
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(levels, "node_id", "left_anti")
            .withColumn("level", F.lit(lvl))
        )
        if nxt.count() == 0:
            break
        # eager localCheckpoint truncates the union lineage each
        # round (the kcore plan-growth discipline): without it the
        # accumulated plan tree — and its multi-MB toString during
        # analysis — OOMed a heap-starved 1g driver session after a
        # long query sequence (round-6 full-registry sweep).
        levels = levels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return levels


@register(
    "graph_bfs_levels",
    oracle=f"""
    WITH RECURSIVE e0 AS (
        SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS (SELECT DISTINCT src, dst FROM
              (SELECT src, dst FROM e0
               UNION ALL SELECT dst AS src, src AS dst FROM e0)),
    bfs(node_id, lvl) AS (
        SELECT CAST({BFS_SOURCE_CUSTKEY * 2} AS BIGINT), 0
        UNION
        SELECT e.dst, bfs.lvl + 1
        FROM bfs JOIN edges e ON e.src = bfs.node_id
        WHERE bfs.lvl < {BFS_MAX_DEPTH})
    SELECT CASE WHEN node_id % 2 = 0
                THEN 'c' || CAST(node_id // 2 AS VARCHAR)
                ELSE 's' || CAST((node_id - 1) // 2 AS VARCHAR)
           END AS node_id,
           CAST(min(lvl) AS INT) AS level
    FROM bfs GROUP BY 1
    """,
    doc="BFS hop distance from customer #1 over the UNDIRECTED trade "
    "graph (customer<->supplier edges from orders x lineitem): "
    "frontier expansion with a broadcast frontier, left-anti "
    "visited-set pruning, loop ends when the frontier empties. The "
    "oracle is a recursive CTE taking min level per node — exact "
    "integer parity with the iterative DataFrame loop.",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    e0 = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = bfs_levels(edges, BFS_SOURCE_CUSTKEY * 2)
    label = F.when(
        F.col("node_id") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node_id") / 2).cast("bigint")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node_id") - 1) / 2).cast("bigint"))
    )
    return out.select(label.alias("node_id"), F.col("level").cast("int"))


# ------------------------------------------- connected components
CC_MIN_SUPPORT = 2  #: same co-purchase threshold as the triangle graph
CC_MAX_ITERS = 25  #: fixpoint guard; loop RAISES if hit (oracle is exact)


def connected_components(edges: DataFrame) -> DataFrame:
    """Connected components by min-label propagation with pointer
    jumping — the third canonical graph loop (pagerank = full
    relaxation, bfs = frontier expansion, cc = label convergence).

    Each round does two steps:

    1. neighbor-min: every node takes the min of its own label and
       its neighbors' labels (one join of the symmetric edge list
       against the O(nodes) label table + one min-aggregate);
    2. pointer jump: every node re-reads the label OF its label
       (one self-join of the label table), halving pointer chains
       so convergence is O(log n) rounds instead of O(diameter).

    The loop runs to an exact fixpoint (zero labels changed) and
    RAISES if CC_MAX_ITERS is hit rather than silently capping —
    the recursive-CTE oracle computes the exact fixpoint, so a
    capped result would break parity (the BFS depth-cap lesson,
    ADVICE r4). Driver-side work is one changed-row count per round.

    Lineage discipline: each round ends in an EAGER localCheckpoint.
    The label table is used three times per round (neighbor-min,
    pointer-jump self-join, changed-count join), so without
    truncation the logical plan TRIPLES per iteration — by round ~10
    the plan string alone OOMs a 1g driver. Checkpointing resets the
    plan to a LogicalRDD of O(nodes) rows per round; at cluster
    scale use reliable checkpoint dirs instead of local blocks.

    Scale: labels are O(nodes) — both joins are hash joins keyed on
    integers; the edge list is persisted once; per-round cost is one
    shuffle of O(edges) + one of O(nodes). This is the
    alternating-contraction scheme of Kiveris et al. ("Connected
    Components in MapReduce and Beyond", SoCC'14) specialized to
    label tables instead of edge rewrites.
    """
    edges = tracked_persist(edges.select("u", "v").distinct())
    lbl = tracked_persist(
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(CC_MAX_ITERS):
        nbr_min = (
            edges.join(lbl, edges["u"] == lbl["node"])
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("lbl").alias("nbr"))
        )
        stepped = (
            lbl.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nbr", "lbl")).alias("lbl"),
            )
        )
        jump = stepped.select(
            F.col("node").alias("lbl"), F.col("lbl").alias("jlbl")
        )
        nxt = (
            stepped.join(jump, "lbl", "left")
            .select("node", F.coalesce("jlbl", "lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            nxt.join(lbl.withColumnRenamed("lbl", "old"), "node")
            .filter(F.col("lbl") != F.col("old"))
            .count()
        )
        lbl = nxt
        if changed == 0:
            return lbl
    raise RuntimeError(
        f"connected_components did not converge in {CC_MAX_ITERS} rounds"
    )


@register(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
        SELECT a.l_partkey AS u, c.l_partkey AS v
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {CC_MIN_SUPPORT}),
    edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
    nodes AS (SELECT DISTINCT u AS x FROM edges),
    r(node, lbl) AS (
        SELECT x, x FROM nodes
        UNION
        SELECT e.v, r.lbl FROM r JOIN edges e ON e.u = r.node
        WHERE r.lbl < e.v),
    comp AS (SELECT node, min(lbl) AS cid FROM r GROUP BY node),
    sizes AS (SELECT cid, count(*) AS sz FROM comp GROUP BY cid)
    SELECT CAST(sz AS BIGINT) AS component_size,
           CAST(count(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY sz
    """,
    doc="Connected components of the co-purchase part graph (edges = "
    "part pairs sharing >= 2 orders, the triangle query's graph): "
    "min-label propagation + pointer jumping run to an exact "
    "fixpoint, reported as the component-size histogram — the "
    "canonical dedup-clustering primitive (minhash/simhash cluster "
    "queries inline the same idea; this is the reusable general "
    "form). The oracle is a recursive CTE propagating only "
    "DECREASING labels (r.lbl < e.v) to bound the reachable-pair "
    "enumeration, then min per node.",
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    c = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e0 = (
        a.join(c, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= CC_MIN_SUPPORT)
        .select("u", "v")
    )
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    comp = connected_components(edges)
    return (
        comp.groupBy("lbl")
        .agg(F.count("*").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count("*").alias("n_components"))
        .select(
            F.col("component_size").cast("bigint"),
            F.col("n_components").cast("bigint"),
        )
    )


# ------------------------------------------------- k-core decomposition
KCORE_K = 3  #: keep the 3-core (every node has >= 3 surviving neighbors)
KCORE_MAX_ITERS = 15  #: peel-round guard; loop RAISES if hit (oracle exact)


def kcore_surviving_edges(
    edges: DataFrame,  # bidirectional (src, dst)
    k: int = KCORE_K,
    max_iters: int = KCORE_MAX_ITERS,
) -> DataFrame:
    """Simultaneous-round k-core peeling over a BIDIRECTIONAL edge
    list: per round, drop every edge incident to a node of current
    degree < k; stop at the (unique) fixpoint. Returns the surviving
    bidirectional edges; raises if the guard is hit.

    Lineage discipline (the connected_components lesson): each
    round's surviving edge list ends in an EAGER localCheckpoint —
    the two anti-joins per round otherwise compound the logical plan
    until the plan string alone OOMs a 1g driver by round ~10. At
    cluster scale use reliable checkpoint dirs instead of local
    blocks."""
    edges = edges.select("src", "dst").localCheckpoint()
    for _ in range(max_iters):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        bad = tracked_persist(
            deg.filter(F.col("deg") < k).select(
                F.col("src").alias("bad_node")
            )
        )
        if bad.count() == 0:  # loop-control scalar only
            break
        edges = (
            edges.join(
                F.broadcast(bad),
                edges["src"] == bad["bad_node"],
                "left_anti",
            )
            .join(
                F.broadcast(bad),
                edges["dst"] == bad["bad_node"],
                "left_anti",
            )
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"k-core peeling did not converge within {max_iters} "
            "rounds; raise the max_iters guard (the oracle reads the "
            f"fixpoint at its final iteration)"
        )
    return edges


@register(
    "graph_kcore_membership",
    # Simultaneous peeling IS SQL-expressible: the recursive CTE's
    # working table carries the surviving BIDIRECTIONAL edge set; a
    # window count per endpoint inside the recursive term computes
    # current degrees, and an edge survives iff both endpoints have
    # degree >= K — exactly the Spark loop's "drop all edges incident
    # to an under-degree node" round. Once the core is stable every
    # iteration reproduces it, so reading the rows at
    # it = KCORE_MAX_ITERS yields the fixpoint (the Spark side RAISES
    # if it hasn't converged by then — a parity break is loud, never
    # silent: the BFS depth-cap lesson applied forward).
    oracle=f"""
    WITH RECURSIVE b AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
        SELECT a.l_partkey AS u, c.l_partkey AS v
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MB_MIN_SUPPORT}),
    rec(it, src, dst) AS (
        SELECT 0, src, dst FROM (
            SELECT u AS src, v AS dst FROM e0
            UNION ALL SELECT v AS src, u AS dst FROM e0)
        UNION ALL
        SELECT it + 1, src, dst FROM (
            SELECT it, src, dst,
                   count(*) OVER (PARTITION BY it, src) AS dsrc,
                   count(*) OVER (PARTITION BY it, dst) AS ddst
            FROM rec)
        WHERE dsrc >= {KCORE_K} AND ddst >= {KCORE_K}
          AND it < {KCORE_MAX_ITERS})
    SELECT CAST(src AS BIGINT) AS part_id,
           CAST(count(*) AS BIGINT) AS core_degree
    FROM rec WHERE it = {KCORE_MAX_ITERS}
    GROUP BY src
    """,
    doc=f"{KCORE_K}-core of the co-purchase graph (part pairs sharing "
    f">= {MB_MIN_SUPPORT} orders): iteratively peel every node whose "
    f"current degree is < {KCORE_K} until the survivor set is stable; "
    "emit each surviving part with its within-core degree. The "
    "density filter that separates structurally-cohesive product "
    "communities from hub-and-spoke noise (triangle counting's "
    "subgraph-level sibling; Seidman 1983). Batagelj-Zaversnik "
    "peeling is inherently sequential, but SIMULTANEOUS-round "
    "peeling (all under-degree nodes drop per round) reaches the "
    "same unique fixpoint — the distributed formulation. "
    "Determinism: pure integer degree counting, no floats anywhere. "
    "Scale: per round = one map-side-combinable degree count + one "
    "broadcast anti-join of the (small) under-degree node set "
    "against the persisted edge list; rounds are bounded by the "
    "degeneracy ordering depth, not graph size; the loop raises "
    "loudly if the guard is hit. Driver work is loop control only.",
)
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    c = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e0 = (
        a.join(c, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MB_MIN_SUPPORT)
        .select("u", "v")
    )
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("src"), F.col("v").alias("dst"))
    core = kcore_surviving_edges(edges, KCORE_K, KCORE_MAX_ITERS)
    return core.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    ).select(F.col("src").cast("bigint").alias("part_id"), "core_degree")


# --------------------------------- Adamic-Adar link prediction
AA_TOP = 50  #: strongest predicted links emitted
#: wedge centers above this degree are dropped (with a logged count —
#: no silent caps): one hub center generates deg^2 wedges in a single
#: task, the operator's only skew-unbounded stage. Provably inert at
#: every test SF (max co-purchase degree ~10^2) and at the 10x/100x
#: probes; at the 100 TB target it bounds per-center wedge work at
#: ~10^8 pairs.
AA_DEG_CAP = 10_000


@register(
    "adamic_adar_link_prediction",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS u, c.l_partkey AS v
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MB_MIN_SUPPORT}),
    sym AS (SELECT u AS w, v AS x FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT w, count(*) AS d FROM sym GROUP BY w),
    wedge AS (
        SELECT s1.x AS u, s2.x AS v, s1.w AS w
        FROM sym s1 JOIN sym s2 ON s1.w = s2.w AND s1.x < s2.x
        JOIN deg ON deg.w = s1.w AND deg.d <= {AA_DEG_CAP}),
    cand AS (
        SELECT wg.u, wg.v, wg.w FROM wedge wg
        ANTI JOIN e ON e.u = wg.u AND e.v = wg.v),
    sc AS (
        SELECT cand.u, cand.v,
               COUNT(*) AS n_common,
               SUM(CAST(ROUND(1.0 / ln(CAST(deg.d AS DOUBLE)), 12)
                        AS DECIMAL(28,12))) AS s
        FROM cand JOIN deg ON deg.w = cand.w
        GROUP BY cand.u, cand.v)
    SELECT u AS part_u, v AS part_v,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(ROUND(CAST(s AS DOUBLE), 6) AS DOUBLE) AS aa_score
    FROM sc
    ORDER BY s DESC, u, v
    LIMIT {AA_TOP}
    """,
    doc="Adamic-Adar link prediction over the co-purchase graph "
    "(same edge definition as triangle counting / k-core): for every "
    "non-adjacent part pair (u, v) sharing a neighbor, "
    "AA = sum over common neighbors w of 1/ln(deg(w)) — rare shared "
    "neighbors are stronger evidence than hubs (Adamic & Adar, "
    "'Friends and neighbors on the Web', Social Networks 2003). Each "
    "1/ln(deg) term is rounded to 12 dp and summed in exact DECIMAL, "
    "so the cross-neighbor accumulation order cannot skew the score "
    "or the top-{AA_TOP} cut, which ties-break on the exact decimal "
    "then (u, v). Scale: wedges are generated per CENTER node, so "
    f"hub nodes dominate cost — centers above degree {AA_DEG_CAP} "
    "are DROPPED before the wedge join (the standard hub-cap "
    "mitigation), with the dropped-hub count logged per the "
    "no-silent-caps rule; the cap is provably inert at every test "
    "SF and both probe decades (max co-purchase degree ~10^2), so "
    "the oracle mirrors it trivially. The anti-join to existing "
    "edges is hash-keyed.",
)
def adamic_adar_link_prediction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    c = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    e = tracked_persist(
        a.join(c, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MB_MIN_SUPPORT)
        .select("u", "v")
    )
    sym = tracked_persist(
        e.select(F.col("u").alias("w"), F.col("v").alias("x")).unionAll(
            e.select(F.col("v").alias("w"), F.col("u").alias("x"))
        )
    )
    deg = sym.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    # degree cap on wedge CENTERS: one hub center emits deg^2 wedges
    # into a single task — the skew-unbounded stage the 10x smoke
    # flagged (116s / 12.35 GB with GC pressure). Hubs are counted
    # and logged, never silently dropped; the hub set is bounded by
    # 2|E|/cap so the anti-join stays hash-keyed (no broadcast hint —
    # AQE decides).
    #
    # BUILD-TIME ACTION (deliberate, ADVICE r9): the hubs.count()
    # below runs a Spark job at DataFrame-CONSTRUCTION time so the
    # dropped-hub warning can fire before any action on the result.
    # It materializes the tracked_persist'ed hub frame, which the
    # anti-join then reuses from cache — execution pays nothing
    # twice; only plan-only consumers (explain / plan-shape tests)
    # pay the one degree aggregation. A lazy alternative
    # (df.observe + a listener) would delay the warning to after the
    # first action and needs a JVM-side QueryExecutionListener, so
    # the eager-but-cached form is kept on purpose.
    hubs = tracked_persist(
        deg.filter(F.col("d") > AA_DEG_CAP).select("w")
    )
    n_hubs = hubs.count()
    if n_hubs:
        import logging

        logging.getLogger(__name__).warning(
            "adamic_adar_link_prediction: dropped %d wedge centers "
            "with degree > %d (scores lose those hubs' 1/ln(deg) "
            "terms; raise AA_DEG_CAP to include them)",
            n_hubs,
            AA_DEG_CAP,
        )
    symc = sym.join(hubs, "w", "left_anti")
    s1 = symc.select("w", F.col("x").alias("u"))
    s2 = symc.select("w", F.col("x").alias("v"))
    wedge = s1.join(s2, "w").filter(F.col("u") < F.col("v"))
    cand = wedge.join(e, ["u", "v"], "left_anti")
    term = F.round(
        F.lit(1.0) / F.log(F.col("d").cast("double")), 12
    ).cast("decimal(28,12)")
    sc = (
        cand.join(deg, "w")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(term).alias("s"),
        )
    )
    return (
        sc.orderBy(F.desc("s"), "u", "v")
        .limit(AA_TOP)
        .select(
            F.col("u").alias("part_u"),
            F.col("v").alias("part_v"),
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(F.col("s").cast("double"), 6)
            .cast("double")
            .alias("aa_score"),
        )
    )
