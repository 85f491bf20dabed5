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

from spark_stream_kudu_spark.functions.lineage import (
    configure_reliable_checkpoints,
    cut_lineage,
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
    e0 = (
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
    outdeg = raw.groupBy("src").agg(F.sum("w").alias("wout"))
    # Fold the static out-degree into the edge list ONCE; each round then
    # needs only a broadcast of the |nodes|-sized rank table — the edge
    # list never re-shuffles (at web scale swap the broadcast for a
    # shuffled hash join, same loop).
    edges = raw.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    ranks = nodes.select("node", F.lit(_PR_SCALE).cast("long").alias("rank"))
    base = int(_PR_SCALE * 15 // 100)
    reliable = configure_reliable_checkpoints(spark)
    for i in range(_PR_ITERATIONS):
        contrib = (
            edges.join(F.broadcast(ranks), edges["src"] == ranks["node"])
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
        ranks = (
            nodes.join(F.broadcast(contrib), nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0))).alias("rank"),
            )
        )
        ranks = cut_lineage(ranks, i, reliable)
    return ranks.select("node", F.col("rank").alias("rank_e9"))
