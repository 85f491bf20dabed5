"""Graph analytics: PageRank over a fact-table-derived edge list.

The second iterative-algorithm family beside connected components
(operators/dedup.py::propagate_min_labels): weighted, damped PageRank
over the customer<->supplier interaction graph that lineitem x orders
implies (edge weight = number of line items between the pair, both
directions so the walk actually mixes). Used in corpus curation as the
centrality signal over citation / link graphs (quality weighting of
crawled domains).

Determinism across engines and cluster merge orders: ranks are scaled
integers (1e9), every per-edge contribution is
``floor(floor(rank * w / W_out) * 85 / 100)`` in pure BIGINT arithmetic
— identical nesting in both engines, associative integer sums, no
float anywhere until the display division at the end. The DuckDB oracle
unrolls the same ``_PR_ITERATIONS`` rounds as chained CTEs; the Spark
side is a DataFrame loop with per-round ``localCheckpoint`` (lineage
cut, same as the CC loop; reliable checkpoints at cluster scale via the
same mechanism).

Scale notes (100 TB): the edge list is one fact-scan aggregation
(map-side combined); each iteration is one join edges x ranks (ranks
are |nodes|-sized — broadcastable for dimension-scale graphs, shuffled
hash join for web-scale) plus one groupBy(dst) sum shuffle. O(iters)
rounds, state O(|nodes|), contributions partial-aggregate before the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.joins import gated_broadcast
from spark_stream_kudu_spark.functions.lineage import (
    configure_reliable_checkpoints,
    cut_lineage,
    pin as _pin,
)
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

_PR_ITERATIONS = 5
_PR_SCALE = 1_000_000_000  # rank unit: 1e9 per node
_SUPP_OFFSET = 1_000_000  # supplier node ids live above customers


def _pr_oracle() -> str:
    base = f"CAST(CAST({_PR_SCALE} AS BIGINT) * 15 // 100 AS BIGINT)"
    cte = [
        f"""edges0 AS (
  SELECT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)""",
        """edges AS (
  SELECT src, dst, w FROM edges0
  UNION ALL
  SELECT dst, src, w FROM edges0
)""",
        """outdeg AS (
  SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM edges GROUP BY src
)""",
        f"""nodes AS (
  SELECT DISTINCT src AS node FROM edges
)""",
        f"""r0 AS (
  SELECT node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM nodes
)""",
    ]
    for i in range(_PR_ITERATIONS):
        cte.append(
            f"""r{i + 1} AS (
  SELECT n.node,
         {base} + COALESCE(CAST(sum(
             (r.rank * e.w // d.wout) * 85 // 100
         ) AS BIGINT), 0) AS rank
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{i} r ON r.node = e.src
  LEFT JOIN outdeg d ON d.src = e.src
  GROUP BY n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"\nSELECT node, rank AS rank_e9 FROM r{_PR_ITERATIONS}"
    )


@register(
    "q86_pagerank",
    "graph",
    f"Weighted damped PageRank ({_PR_ITERATIONS} rounds) over the "
    "customer<->supplier graph derived from lineitem x orders (edge "
    "weight = line-item count, both directions). All arithmetic is "
    "nested integer floor-division on 1e9-scaled ranks — bit-identical "
    "across engines AND across cluster merge orders (integer sums are "
    "associative; float PageRank is neither). The oracle unrolls the "
    "same rounds as chained CTEs, so the iterative DataFrame loop is "
    "hash-checked end-to-end like the connected-components family. Each "
    "round: one edges x ranks join + one groupBy(dst) partial-aggregated "
    "shuffle; lineage cut per round via the shared lineage helper "
    "(reliable checkpoints every few rounds when "
    "SPARK_GRAFT_CC_CHECKPOINT_DIR names a durable store, exactly as "
    "dedup_clusters does). Overflow bound: rank*w is 64-bit; ranks sum "
    "to ~|nodes|*1e9, so a single node's rank times a heavy edge weight "
    "must stay under 2^63 — safe up to ~1e9 rank-mass per node with "
    "w<=1e4; beyond that accumulate contributions as decimal(38,0) like "
    "the q99 digest family.",
    oracle=_pr_oracle(),
    bench=True,
)
def q86_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # Pin the fact-scale join+agg FIRST: the union / out-degree /
    # edge-join below each consume it, and without the pin the planner
    # duplicates the lineitem x orders subtree into every branch (the
    # slightly different pushed filters per branch defeat exchange
    # reuse — 4 copies in the executed plan). One materialization of
    # |edges0| rows replaces four fact-table joins; at 100 TB this is
    # the difference between one pass over the fact join and four.
    e0 = _pin(
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    raw = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    # The out-degree rollup IS the node set (its keys are exactly
    # distinct src of the symmetrized edge list), so pin it once and
    # reuse it both as the join side below and as `nodes` — the
    # separate nodes-distinct pin the old shape paid is gone.
    outdeg = _pin(raw.groupBy("src").agg(F.sum("w").alias("wout")))
    # Size-gate the static-table joins ONCE (the node set is static
    # across rounds): broadcast while |nodes| fits under the session's
    # autoBroadcastJoinThreshold, shuffled hash join above it — the
    # web-scale path where a broadcast would OOM the driver.
    n_nodes = outdeg.count()
    # Fold the static out-degree into the edge list ONCE; each round
    # then needs only the |nodes|-sized rank table on the build side —
    # the edge list never re-shuffles. Gating the out-degree side turns
    # the old SortMergeJoin (full edge-list exchange + sort) into a
    # broadcast hash join at dimension scale.
    edges = _pin(raw.join(gated_broadcast(outdeg, n_nodes, spark), "src"))
    nodes = outdeg.select(F.col("src").alias("node"))
    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    base = int(_PR_SCALE * 15 // 100)
    reliable = configure_reliable_checkpoints(spark)
    for i in range(_PR_ITERATIONS):
        ranks_side = gated_broadcast(ranks, n_nodes, spark)
        contrib = (
            edges.join(ranks_side, edges["src"] == ranks_side["node"])
            .select(
                F.col("dst"),
                # Integer `div`, never float `/`: rank * w exceeds 2^53,
                # where double division silently rounds.
                F.expr("((rank * w) div wout) * 85 div 100")
                .cast("long")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        contrib_side = gated_broadcast(contrib, n_nodes, spark)
        ranks = (
            nodes.join(contrib_side, nodes["node"] == contrib_side["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0))).alias("rank"),
            )
        )
        # Cadence measured, not guessed: local_interval 2/3/6 over the
        # 5-round loop at sf0.1 local[32] (5 interleaved reps) gave
        # medians 3.30/3.34/3.38 s — the eager localCheckpoint is NOT
        # the dominant cost here, so keep 2: lineage stays <=2 rounds
        # deep for free, which is the setting that also survives a
        # longer-horizon loop at web scale.
        # Lazy cut (round-11): no per-round convergence probe exists, so
        # the blocking per-cut job is pure barrier cost — the final
        # action materializes every round in one pipelined job.
        ranks = cut_lineage(ranks, i, reliable, local_interval=2, eager=False)
    return ranks.select("node", F.col("rank").alias("rank_e9"))


# --------------------------------------------------------------------------
# q114: triangle count over the co-purchase part graph
# --------------------------------------------------------------------------

_TRI_ORACLE = """
WITH lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
)
SELECT CAST((SELECT count(DISTINCT u) FROM (SELECT u FROM e UNION ALL SELECT v FROM e)) AS BIGINT)
         AS n_nodes,
       CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*)
             FROM e ab JOIN e bc ON bc.u = ab.v
                       JOIN e ac ON ac.u = ab.u AND ac.v = bc.v) AS BIGINT)
         AS n_triangles
"""


@register(
    "q114_triangle_count",
    "graph",
    "Triangle counting over the co-purchase graph (parts co-occurring in "
    "an order are adjacent; per-order fan-out is bounded by order size, "
    "so edge generation is row-local-ish and never quadratic in the "
    "table). The oracle counts canonical a<b<c wedges by self-join; the "
    "engine runs the DEGREE-ORDERED orientation: each edge points from "
    "its lower-(degree, id) endpoint to the higher, so every vertex's "
    "out-degree is O(sqrt(|E|)) and the wedge join (u->v, u->w) stays "
    "near-linear even on power-law graphs — the standard trick that "
    "makes triangle counting feasible at 100 TB where naive wedge "
    "enumeration explodes on hub vertices. Wedges close via one hash "
    "join back to the oriented edge list.",
    oracle=_TRI_ORACLE,
)
def q114_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    # Edge list is reused four times (degrees, orientation, closing,
    # count) — materialize once; it is O(parts x co-rate), tiny next to
    # the fact table.
    edges = _pin(
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient each edge from the endpoint with lower (deg, id) to higher:
    # out-neighborhoods are O(sqrt(|E|))-bounded, taming hub vertices.
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    keyed = edges.join(du, "u").join(dv, "v")
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oriented = _pin(keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
    ))
    o1 = oriented.select(F.col("s").alias("c"), F.col("t").alias("x"))
    o2 = oriented.select(F.col("s").alias("c"), F.col("t").alias("y"))
    wedges = o1.join(o2, "c").filter(F.col("x") < F.col("y"))
    # Close wedges with an EQUI-join on the canonical (min, max) edge
    # key — an OR of both orientations would plan as a nested loop.
    closing = oriented.select(
        F.least("s", "t").alias("x"), F.greatest("s", "t").alias("y")
    )
    n_tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(n_tri)
        .select("n_nodes", "n_edges", "n_triangles")
    )


# --------------------------------------------------------------------------
# q137: synchronous weighted label propagation (community detection)
# --------------------------------------------------------------------------

_LP_ROUNDS = 3


def _lp_oracle() -> str:
    """Unrolled-CTE oracle for ``_LP_ROUNDS`` synchronous LPA rounds over
    the same customer<->supplier graph as q86. Per round every node
    adopts the label with the max edge-weight sum among its neighbors'
    CURRENT labels (ties -> min label) — the argmax is a window rank
    with a total (weight DESC, label ASC) order, deterministic in both
    engines."""
    cte = [
        f"""edges0 AS (
  SELECT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)""",
        """edges AS (
  SELECT src, dst, w FROM edges0
  UNION ALL
  SELECT dst, src, w FROM edges0
)""",
        f"""l0 AS (
  SELECT c_custkey AS node, CAST(c_nationkey AS BIGINT) AS label
  FROM customer WHERE c_custkey IN (SELECT src FROM edges0)
  UNION ALL
  SELECT DISTINCT s.s_suppkey + {_SUPP_OFFSET} AS node,
         CAST(s.s_nationkey AS BIGINT) AS label
  FROM supplier s WHERE s.s_suppkey + {_SUPP_OFFSET} IN (SELECT dst FROM edges0)
)""",
    ]
    for i in range(_LP_ROUNDS):
        cte.append(
            f"""l{i + 1} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, r.label,
           row_number() OVER (PARTITION BY e.dst
             ORDER BY sum(e.w) DESC, r.label ASC) AS rk
    FROM edges e JOIN l{i} r ON r.node = e.src
    GROUP BY e.dst, r.label
  ) WHERE rk = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"""
SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(min(node) AS BIGINT) AS min_node,
       CAST(max(node) AS BIGINT) AS max_node
FROM l{_LP_ROUNDS} GROUP BY label"""
    )


@register(
    "q137_label_propagation",
    "graph",
    f"Synchronous weighted label propagation ({_LP_ROUNDS} rounds) over "
    "the q86 customer<->supplier graph, seeded with nation labels: every "
    "round each node adopts the label with the maximum edge-weight sum "
    "among its neighbors' current labels (ties -> min label — the argmax "
    "is a window rank under a TOTAL order, so the sync update is "
    "deterministic in both engines; async LPA is not even run-to-run "
    "stable). Community detection as the third iterative graph family "
    "beside min-label components and PageRank. Per round: one edges x "
    "labels broadcast join + one (node, label) weight-sum shuffle + one "
    "per-node window rank over at most |labels-per-node| rows; lineage "
    "cut per round via the shared helper. Output is the community size "
    "table (per-label node counts + id range).",
    oracle=_lp_oracle(),
)
def q137_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    # Pin the fact-scale join+agg BEFORE symmetrizing (the q86/q165
    # round-11 pattern): without it the union duplicates the
    # lineitem x orders subtree per branch, and the old pin(edges)
    # computed the fact join twice.
    e0 = _pin(
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    # One distinct pass serves both the label init and the gate count
    # (the old shape ran it once lazily for labels and once for count).
    c_nodes = _pin(edges.select(F.col("dst").alias("node")).distinct())
    seeds_c = cust.select(
        F.col("c_custkey").alias("node"), F.col("c_nationkey").cast("long").alias("label")
    )
    seeds_s = supp.select(
        (F.col("s_suppkey") + _SUPP_OFFSET).alias("node"),
        F.col("s_nationkey").cast("long").alias("label"),
    )
    labels = c_nodes.join(seeds_c.unionByName(seeds_s), "node")
    # Same size gate as q86: count the (static) node set once, then
    # broadcast the per-round label table only while it fits under the
    # session threshold — shuffled hash join beyond.
    n_nodes = c_nodes.count()
    reliable = configure_reliable_checkpoints(spark)
    wrk = Window.partitionBy("node").orderBy(F.desc("ws"), F.asc("label"))
    for i in range(_LP_ROUNDS):
        votes = (
            edges.join(
                gated_broadcast(
                    labels.withColumnRenamed("node", "src_n"), n_nodes, spark
                ),
                edges["src"] == F.col("src_n"),
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.sum("w").alias("ws"))
        )
        labels = (
            votes.withColumn("rk", F.row_number().over(wrk))
            .filter(F.col("rk") == 1)
            .select("node", "label")
        )
        # Lazy cut (round-11): no per-round probe — see q86.
        labels = cut_lineage(labels, i, reliable, local_interval=2, eager=False)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


# --------------------------------------------------------------------------
# q156: recursive hierarchy flattening (org-chart / BOM closure)
# --------------------------------------------------------------------------

_HIER_ORACLE = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS node, c_custkey // 2 AS ancestor, 1 AS dist
  FROM customer WHERE c_custkey >= 2
  UNION ALL
  SELECT a.node, a.ancestor // 2, a.dist + 1
  FROM anc a WHERE a.ancestor >= 2
)
SELECT CAST(a.ancestor AS BIGINT) AS manager,
       CAST(count(*) AS BIGINT) AS n_reports,
       CAST(max(a.dist) AS BIGINT) AS max_depth,
       CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS subtree_cents
FROM anc a JOIN customer c ON c.c_custkey = a.node
GROUP BY a.ancestor
"""


@register(
    "q156_hierarchy_closure",
    "graph",
    "Recursive-hierarchy flattening (the org-chart/BOM closure SQL "
    "engines express with WITH RECURSIVE, which Spark SQL lacks): the "
    "customer table is read as a management tree (parent(k) = k div 2 "
    "— TPC-H custkeys are contiguous from 1, so every parent exists) "
    "and the FULL ancestor closure (node, ancestor, dist) is computed "
    "by pointer doubling / repeated squaring: R_{2d} = R_d UNION "
    "compose(R_d, R_d), so a depth-D tree needs ceil(log2 D) self-join "
    "rounds — 5 rounds for a million-node tree, NOT D sequential joins "
    "like naive recursion. Round count derives from max(custkey) "
    "(depth of the k div 2 chain = floor(log2 k)), each round is one "
    "shuffled self-join + distinct with lineage cut. Output is the "
    "per-manager subtree rollup (report count, max depth, exact "
    "account-balance subtotal in cents) — the aggregation closures "
    "exist for. The oracle is DuckDB's native WITH RECURSIVE, so the "
    "doubling loop is hash-checked against real recursive SQL.",
    oracle=_HIER_ORACLE,
)
def q156_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    c = load_table(spark, sf_dir, "customer")
    edges = c.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").cast("long").alias("node"),
        F.expr("c_custkey div 2").cast("long").alias("ancestor"),
        F.lit(1).cast("long").alias("dist"),
    )
    # bounded collect: 1-row MAX aggregate (sets the pointer-doubling
    # round count; never row data)
    max_key = c.agg(F.max("c_custkey")).collect()[0][0] or 1
    depth = max(1, int(max_key).bit_length() - 1)
    rounds = max(1, (depth - 1).bit_length())
    reliable = configure_reliable_checkpoints(spark)
    closure = edges
    for i in range(rounds):
        a = closure.select(
            F.col("node"), F.col("ancestor").alias("mid"), F.col("dist").alias("da")
        )
        b = closure.select(
            F.col("node").alias("mid"),
            F.col("ancestor"),
            F.col("dist").alias("db"),
        )
        hops = a.join(b, "mid").select(
            "node", "ancestor", (F.col("da") + F.col("db")).alias("dist")
        )
        # In a tree the ancestor at a given distance is unique, but a
        # path of length d is composed from several (da, db) splits —
        # distinct() collapses them before the next squaring round.
        closure = closure.unionByName(hops).distinct()
        # Lazy cut (round-11): no per-round probe — see q86.
        closure = cut_lineage(closure, i, reliable, local_interval=2, eager=False)
    rollup_src = closure.join(
        c.select(
            F.col("c_custkey").cast("long").alias("node"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        ),
        "node",
    )
    return rollup_src.groupBy(F.col("ancestor").alias("manager")).agg(
        F.count(F.lit(1)).alias("n_reports"),
        F.max("dist").alias("max_depth"),
        F.sum("cents").alias("subtree_cents"),
    )


# --------------------------------------------------------------------------
# q165: bounded multi-source shortest paths (Bellman-Ford relaxation)
# --------------------------------------------------------------------------

_SSSP_ROUNDS = 6


def _sssp_oracle() -> str:
    cte = [
        f"""edges0 AS (
  SELECT o.o_custkey AS src, l.l_suppkey + {_SUPP_OFFSET} AS dst,
         CAST(min(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS w
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)""",
        """edges AS (
  SELECT src, dst, w FROM edges0
  UNION ALL
  SELECT dst, src, w FROM edges0
)""",
        """nodes AS (
  SELECT DISTINCT src AS node FROM edges
)""",
        f"""d0 AS (
  SELECT node,
         CASE WHEN node < {_SUPP_OFFSET} AND node % 20 = 0
              THEN CAST(0 AS BIGINT) END AS dist
  FROM nodes
)""",
    ]
    for i in range(_SSSP_ROUNDS):
        cte.append(
            f"""d{i + 1} AS (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{i}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d{i} d JOIN edges e ON e.src = d.node
    WHERE d.dist IS NOT NULL
  ) u GROUP BY node
)"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"\nSELECT node, dist AS dist_cents FROM d{_SSSP_ROUNDS}"
        + "\nWHERE dist IS NOT NULL"
    )


@register(
    "q165_shortest_paths",
    "graph",
    "Bounded multi-source shortest paths (Bellman-Ford relaxation) over "
    "the customer<->supplier graph from q86: edge weight = cheapest line "
    "item between the pair in exact cents, sources = every customer "
    f"node with custkey % 20 == 0, {_SSSP_ROUNDS} relaxation rounds "
    f"(= {_SSSP_ROUNDS}-hop cost horizon — the bounded-iteration "
    "contract; unreachable-within-horizon nodes are excluded rather "
    "than carrying a sentinel infinity). The fourth iterative graph "
    "family beside connected components, PageRank and label "
    "propagation: supply-chain reach / cheapest-route-cost analysis. "
    "Each round relaxes every edge once — one join of the static edge "
    "list against the |nodes|-sized frontier table (size-gated "
    "broadcast, shuffled-hash above threshold) plus one min-combine "
    "shuffle (partial min map-side, so the relax never materializes "
    "|E| rows past the exchange); the distance table is the only loop "
    "state and the edge list never re-shuffles. All-integer cents "
    "arithmetic and associative min make the result bit-identical "
    "across engines and merge orders; the oracle unrolls the same "
    "rounds as chained CTEs.",
    oracle=_sssp_oracle(),
)
def q165_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    # Pin the fact-scale join+agg BEFORE symmetrizing: the union
    # duplicates its subtree otherwise (the q86 pattern — per-branch
    # pushed filters defeat exchange reuse), so the old pin(edges)
    # computed the lineitem x orders join twice. Materializing e0 once
    # makes the union a narrow re-read of checkpointed blocks — cheap
    # per round, no second materialization of the doubled edge list.
    e0 = _pin(
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.min(cents).alias("w"))
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    # One distinct pass serves both the frontier init AND the gate
    # count (the old shape ran the full distinct twice — once for
    # nodes, once again for n_nodes).
    nodes = _pin(edges.select(F.col("src").alias("node")).distinct())
    n_nodes = nodes.count()
    dist = nodes.select(
        "node",
        F.when(
            (F.col("node") < _SUPP_OFFSET) & (F.col("node") % 20 == 0),
            F.lit(0).cast("long"),
        ).alias("dist"),
    )
    reliable = configure_reliable_checkpoints(spark)
    for i in range(_SSSP_ROUNDS):
        frontier = gated_broadcast(
            dist.filter(F.col("dist").isNotNull()), n_nodes, spark
        )
        relaxed = edges.join(frontier, edges["src"] == frontier["node"]).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.select("node", "dist")
            .unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        # Lazy cut (round-11): no per-round probe — see q86.
        dist = cut_lineage(dist, i, reliable, local_interval=2, eager=False)
    return dist.filter(F.col("dist").isNotNull()).select(
        "node", F.col("dist").alias("dist_cents")
    )


# --------------------------------------------------------------------------
# q180: local clustering coefficient — the per-node refinement of q114
# --------------------------------------------------------------------------

_CC_ORACLE = """
WITH lp AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p
), deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
), tri AS (
  SELECT ab.u AS a, ab.v AS b, bc.v AS c
  FROM e ab JOIN e bc ON bc.u = ab.v
            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
), part AS (
  SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY node
)
SELECT d.node, d.deg,
       CAST(COALESCE(p.tri_cnt, 0) AS BIGINT) AS tri_cnt,
       CAST(CASE WHEN d.deg >= 2
                 THEN (2 * COALESCE(p.tri_cnt, 0) * 1000000)
                      // (d.deg * (d.deg - 1))
                 ELSE 0 END AS BIGINT) AS coeff_e6
FROM deg d LEFT JOIN part p ON p.node = d.node
"""


@register(
    "q180_clustering_coefficient",
    "graph",
    "Local clustering coefficient per node over the q114 co-purchase "
    "graph: coeff(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), reported as an "
    "integer-exact e6-scaled ratio (both engines truncate integer "
    "division toward zero, so the low digit is bit-stable). Triangle "
    "participation comes from the SAME degree-ordered wedge "
    "enumeration as q114 — each closed wedge names one unique triangle "
    "{c, x, y}, so exploding the three corners and counting per node "
    "is exact without per-triangle dedup. At 100 TB the orientation "
    "bounds every out-neighborhood at O(sqrt(|E|)) (hub-safe wedge "
    "join), the corner explode is 3x the triangle count (partial-agg "
    "absorbed), and degrees are one shuffle of the edge list — the "
    "per-node refinement costs one more groupBy than the global "
    "count, not a new algorithm.",
    oracle=_CC_ORACLE,
)
def q180_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = _pin(
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    keyed = edges.join(du, "u").join(dv, "v")
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oriented = _pin(keyed.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
    ))
    o1 = oriented.select(F.col("s").alias("c"), F.col("t").alias("x"))
    o2 = oriented.select(F.col("s").alias("c"), F.col("t").alias("y"))
    wedges = o1.join(o2, "c").filter(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("s", "t").alias("x"), F.greatest("s", "t").alias("y")
    )
    # Each closed wedge is one UNIQUE triangle (counted at its
    # lowest-(deg, id) corner c), so corner participation needs no
    # per-triangle dedup.
    corners = (
        wedges.join(closing, ["x", "y"])
        .select(
            F.explode(F.array(F.col("c"), F.col("x"), F.col("y"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("tri_cnt"))
    )
    tri = F.coalesce(F.col("tri_cnt"), F.lit(0)).cast("long")
    return deg.join(corners, "node", "left").select(
        "node",
        F.col("deg").cast("long").alias("deg"),
        tri.alias("tri_cnt"),
        F.when(
            F.col("deg") >= 2,
            F.expr("(2 * coalesce(tri_cnt, 0) * 1000000)"
                   " div (deg * (deg - 1))"),
        ).otherwise(F.lit(0)).cast("long").alias("coeff_e6"),
    )


# --------------------------------------------------------------------------
# q190: k-core decomposition — iterative peeling with frontier gating
# --------------------------------------------------------------------------

_KCORE_K = 75
_KCORE_ROUNDS = 8


def _kcore_oracle() -> str:
    """Unrolled-CTE twin of the peeling loop (the q165/q86 pattern).
    MATERIALIZED is load-bearing: e{r-1} and s{r} are each referenced
    twice per round, and DuckDB's default CTE inlining would otherwise
    duplicate the whole chain 2^rounds times."""
    ctes = [
        "lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,"
        " l_partkey AS p FROM lineitem)",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.p AS u, b.p AS v"
        " FROM lp a JOIN lp b ON a.o = b.o AND a.p < b.p)",
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT node, count(*) AS c FROM ("
            f"SELECT u AS node FROM e{r - 1}"
            f" UNION ALL SELECT v FROM e{r - 1}) GROUP BY node)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT node FROM d{r}"
            f" WHERE c >= {_KCORE_K})"
        )
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT e.u, e.v FROM e{r - 1} e"
            f" JOIN s{r} a ON a.node = e.u JOIN s{r} b ON b.node = e.v)"
        )
    sel = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" CAST((SELECT count(*) FROM s{r}) AS BIGINT) AS n_nodes,"
        f" CAST((SELECT count(*) FROM e{r}) AS BIGINT) AS n_edges"
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


@register(
    "q190_kcore",
    "graph",
    f"k-core decomposition (k={_KCORE_K}, {_KCORE_ROUNDS} peel rounds) "
    "over the q114 co-purchase part graph — the fifth iterative graph "
    "family beside components, PageRank, label propagation and "
    "Bellman-Ford, and the standard graph-curation screen (spam/bot "
    "subgraph pruning on interaction graphs) a training-data pipeline "
    "runs before trusting link-derived signals. Each round drops every "
    "node whose degree in the SURVIVING subgraph is below k and the "
    "edges it carried; the output is the per-round (n_nodes, n_edges) "
    "peel trajectory — the fixture's own core-collapse profile, "
    "bit-exact. FRONTIER GATING: an unchanged edge count proves the "
    "fixed point (a dropped node always carries away an edge, since "
    "degrees come from the edge set itself), so later rounds emit the "
    "converged row without launching further jobs. Per round: one "
    "endpoint-count shuffle + one size-gated semijoin against the "
    "survivor set (broadcast at dimension scale, shuffled-hash at web "
    "scale), lineage cut per round — O(rounds), never O(rounds^2), "
    "state is the edge list itself. The edge build is basket-local "
    "(q128's sorted-array pair expansion via basket_edges — no order-"
    "keyed self-join, so a thousand-item hub basket never serializes "
    "its |basket|^2 pairs through one join task). The oracle unrolls "
    "the identical rounds as MATERIALIZED chained CTEs (q165's "
    "pattern).",
    oracle=_kcore_oracle(),
)
def q190_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    metrics = kcore_trajectory(
        spark, basket_edges(li), _KCORE_K, _KCORE_ROUNDS
    )
    return spark.createDataFrame(
        metrics, "round long, n_nodes long, n_edges long"
    )


def basket_edges(memberships: DataFrame) -> DataFrame:
    """Canonical (u < v, distinct) co-membership edges from an (o, p)
    membership table WITHOUT an order-keyed self-join: each basket
    collects into ONE sorted distinct array row (a single shuffle on
    the basket key) and pairs expand basket-locally from the array —
    the q128 market-basket pattern. An order-keyed self-join emits
    |basket|^2 rows inside the join task of a hot key, so a thousand-
    item hub in a real co-interaction log serializes a million-row
    build through one task; here the hub's quadratic streams through
    the Generate operator of the row that holds it, with no skewed
    join build side and one fewer shuffle. Pair order u < v holds by
    construction (ascending sorted set, each element pairs with its
    strict suffix)."""
    grouped = memberships.groupBy("o").agg(
        F.array_sort(F.collect_set("p")).alias("ps")
    )
    pair_expr = F.expr(
        "flatten(transform(ps, (x, i) -> "
        "transform(slice(ps, i + 2, size(ps)), "
        "y -> struct(x AS u, y AS v))))"
    )
    return (
        grouped.select(F.explode(pair_expr).alias("e"))
        .select("e.u", "e.v")
        .distinct()
    )


def kcore_trajectory(
    spark: SparkSession, edges: DataFrame, k: int, rounds: int
) -> list[tuple[int, int, int]]:
    """``rounds`` peel iterations over an undirected (u, v) edge list
    (canonical u < v, deduplicated): per round, nodes whose degree in
    the surviving subgraph is below ``k`` drop with their edges.
    Returns the (round, n_nodes, n_edges) trajectory.

    Round-11 restructure — NODE-set loop state, not edge-set: survivor
    sets shrink monotonically (S_r ⊆ S_{r-1}), so the surviving edge
    set is fully determined by the LATEST survivor set alone
    (e_r = e_base ∩ S_r x S_r). The loop therefore never materializes
    a filtered edge list per round; it pins only the |nodes|-sized
    degree table. One degree aggregate per round yields THREE things
    at once: sum(deg)/2 = |e_{r-1}| (the previous round's edge
    metric — every edge is counted at both endpoints), the c >= k
    filter = S_r (next round's semi-join side), and count(c >= k)
    = n_nodes_r. The old shape localCheckpointed the full edge list
    every round (O(|E|) writes/round — 1.16M rows/round at sf0.1 for
    a peel that was dropping ~0.1% of them); this writes O(|N|) and
    streams the pinned base through two size-gated broadcast
    semi-joins instead.

    Convergence: |S_r| == |S_{r-1}| with monotone subsets proves
    S_r == S_{r-1}, hence e_r == e_{r-1} and a fixed point — detected
    from the counts already in hand, one round EARLIER than the old
    edge-count rule (which needed e_r materialized first). Converged
    rounds emit without launching jobs, as before.

    Contraction re-pin: when the live edge set has shrunk below half
    of the pinned base, the base is re-pinned to the filtered set —
    so a peel that DOES collapse its graph gets the old shape's
    shrinking-scan behavior, while a stable core never pays the
    per-round edge rewrite. Property-tested against plain-Python
    peeling on arbitrary graphs in tests/test_properties.py (which
    exercises both regimes: tiny graphs collapse fast and re-pin;
    k=1 graphs stay stable)."""
    base = _pin(edges)
    base_bound: int | None = None  # upper bound on |base|, from the aggs
    metrics: list[tuple[int, int, int]] = []
    surv: DataFrame | None = None  # S_{r-1}; None means "all nodes"
    n_prev = 0  # |S_{r-1}|, the gate bound for the semi-join sides
    converged = False

    def _live(surv_df: DataFrame, bound: int) -> DataFrame:
        su = gated_broadcast(
            surv_df.select(F.col("node").alias("u")), bound, spark
        )
        sv = gated_broadcast(
            surv_df.select(F.col("node").alias("v")), bound, spark
        )
        return base.join(su, "u", "left_semi").join(sv, "v", "left_semi")

    for r in range(1, rounds + 1):
        live = base if surv is None else _live(surv, n_prev)
        deg = _pin(
            live.select(F.col("u").alias("node"))
            .unionAll(live.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # bounded collect: 1-row aggregate over the |nodes|-sized
        # pinned degree table.
        row = deg.agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("s"),
            F.coalesce(
                F.sum((F.col("c") >= k).cast("long")), F.lit(0)
            ).cast("long").alias("n"),
        ).first()
        e_before = int(row["s"]) // 2  # |e_{r-1}|
        n_r = int(row["n"])  # |S_r|
        if r == 1:
            base_bound = e_before
        else:
            # Fill the previous round's pending edge metric.
            metrics[-1] = (r - 1, n_prev, e_before)
        if r >= 2 and n_r == n_prev:
            # Fixed point: S_r == S_{r-1} (monotone + equal count), so
            # e_r == e_{r-1}; later rounds replicate without jobs.
            metrics.extend((r2, n_r, e_before) for r2 in range(r, rounds + 1))
            converged = True
            break
        metrics.append((r, n_r, -1))  # n_edges filled next iteration
        n_prev = n_r
        surv = deg.filter(F.col("c") >= k).select("node")
        if base_bound is not None and e_before < base_bound // 2:
            # The live set collapsed — re-pin it as the new base so
            # later rounds scan the shrunken graph, not e_0.
            base = _pin(_live(surv, n_prev).select("u", "v"))
            base_bound = e_before
            surv = None
    if not converged and metrics:
        # The last round's edge metric needs one more filtered count.
        live = base if surv is None else _live(surv, n_prev)
        metrics[-1] = (rounds, n_prev, int(live.count()))
    return metrics
