"""Core relational operator surface (SURVEY.md §2.4).

The reference exercises exactly one relational query — a global
AVG/MIN/MAX aggregation over a windowed stream batch
(kafka_to_kudu.py:32-38, KafkaToKuduJava.java:104-110,
KafkaToKuduScala.scala:39-45) — and its consumers run
``SELECT * ... ORDER BY`` (README.md:40). This module generalizes that
into the full declared contract: scans/filters, all join types,
grouped/rolled-up aggregation, analytic window functions, sorts/limits,
set operations, and the scalar-function surface, each as a registered
query with a DuckDB oracle twin.

Scale design notes (valid at sf0.001 and at 100 TB):
- Everything is a declarative DataFrame plan: filters and projections
  reach the parquet scan (PushedFilters / ReadSchema), whole-stage
  codegen covers the operator pipelines, AQE resizes shuffles at run
  time.
- Dimension tables (region, nation, customer-after-filter) are
  explicitly broadcast where a 1000-executor cluster would want a
  broadcast hash join; fact-fact joins shuffle on their keys and rely
  on AQE skew handling.
- Aggregates compute partial (map-side) then final automatically
  (HashAggregateExec) — no collect-based logic anywhere.
- Doubles in outputs are ROUNDed in *both* engines so cross-engine
  float summation-order differences can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import favg, fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table, register_views


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation over a scan (TPC-H Q1 shape; generalizes reference O9-O12)
# --------------------------------------------------------------------------

_Q01_ORACLE = """
SELECT l_returnflag, l_linestatus,
       floor((sum(l_quantity)) * 100 + 0.5) / 100                                          AS sum_qty,
       floor((sum(l_extendedprice)) * 100 + 0.5) / 100                                     AS sum_base_price,
       floor((sum(l_extendedprice * (1 - l_discount))) * 100 + 0.5) / 100                  AS sum_disc_price,
       floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100 + 0.5) / 100    AS sum_charge,
       floor((floor((sum(l_quantity)) * 100 + 0.5) / 100 / count(*)) * 10000 + 0.5) / 10000        AS avg_qty,
       floor((floor((sum(l_extendedprice)) * 100 + 0.5) / 100 / count(*)) * 10000 + 0.5) / 10000   AS avg_price,
       floor((floor((sum(l_discount)) * 10000 + 0.5) / 10000 / count(*)) * 1000000 + 0.5) / 1000000 AS avg_disc,
       count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q01_pricing_summary",
    "aggregation",
    "Filtered scan -> grouped multi-aggregate (sum/avg/count); the engine's flagship "
    "query. Generalizes the reference's global AVG/MIN/MAX agg (kafka_to_kudu.py:32-38).",
    oracle=_Q01_ORACLE,
    bench=True,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("sum_qty"),
            fround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            fround(F.sum(disc_price), 2).alias("sum_disc_price"),
            fround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            favg(F.sum("l_quantity"), F.count(F.lit(1)), 4).alias("avg_qty"),
            favg(F.sum("l_extendedprice"), F.count(F.lit(1)), 4).alias("avg_price"),
            favg(F.sum("l_discount"), F.count(F.lit(1)), 6, sum_decimals=4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Scan / project / filter: the full predicate surface
# --------------------------------------------------------------------------

_Q02_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       floor((o_totalprice) * 100 + 0.5) / 100      AS price,
       CAST(o_orderdate AS DATE)   AS odate
FROM orders
WHERE (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
  AND o_orderstatus <> 'P'
  AND o_totalprice BETWEEN 1000 AND 300000
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
  AND NOT (o_orderstatus = 'F' AND o_totalprice < 5000)
  AND nullif(o_orderpriority, '2-HIGH') IS NOT NULL
"""


@register(
    "q02_filter_predicates",
    "filter",
    "Predicate surface: LIKE, <>, BETWEEN, >=, IN (subquery/semi), NOT, AND/OR, "
    "NULLIF + IS NOT NULL; projection prunes to 5 columns (pushdown-checked in tests).",
    oracle=_Q02_ORACLE,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    filtered = o.filter(
        (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"))
        & (F.col("o_orderstatus") != "P")
        & F.col("o_totalprice").between(1000, 300000)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & ~((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 5000))
        & F.nullif(F.col("o_orderpriority"), F.lit("2-HIGH")).isNotNull()
    )
    # IN (subquery) == left-semi join. The customer side is entity-
    # scale (grows with the corpus), so it carries NO broadcast hint:
    # the planner broadcasts it from scan stats while it fits under
    # autoBroadcastJoinThreshold and degrades to a shuffled semi-join
    # at 100 TB instead of a forced hint OOMing the executors.
    return filtered.join(
        c, filtered["o_custkey"] == c["c_custkey"], "left_semi"
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        fround("o_totalprice", 2).alias("price"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

_Q03_ORACLE = """
SELECT o.o_orderkey,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue,
       CAST(o.o_orderdate AS DATE)                           AS odate,
       o.o_orderpriority
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register(
    "q03_topk_revenue",
    "join",
    "3-way inner join (broadcast filtered dim, shuffled fact-fact) -> group -> "
    "top-k by rounded revenue with unique-key tiebreak (TPC-H Q3 shape).",
    oracle=_Q03_ORACLE,
    bench=True,
)
def q03_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        # customer is entity-scale: un-hinted, the planner broadcasts
        # it from stats at test SF and shuffles past the threshold.
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("odate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_Q04_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q04_semi_join",
    "join",
    "EXISTS == left-semi join; no row duplication from the many-side (TPC-H Q4 shape).",
    oracle=_Q04_ORACLE,
)
def q04_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q05_ORACLE = """
SELECT n.n_name,
       floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100 + 0.5) / 100 AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY n.n_name
"""


@register(
    "q05_regional_revenue",
    "join",
    "6-table join chain with a multi-key condition (l_suppkey AND c_nationkey=s_nationkey); "
    "nation/region/supplier broadcast — only customer-orders-lineitem shuffle (TPC-H Q5 shape).",
    oracle=_Q05_ORACLE,
    bench=True,
)
def q05_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        # supplier is entity-scale: un-hinted (stats/AQE decide).
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])  # bounded: |nations| domain
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])  # bounded: |regions| domain
        .groupBy("n_name")
        .agg(
            fround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("n_name")
    )


_Q06_ORACLE = """
SELECT floor((sum(l_extendedprice * l_discount)) * 100 + 0.5) / 100 AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register(
    "q06_forecast_revenue",
    "aggregation",
    "Global (no GROUP BY) aggregate over a highly selective filtered scan — the "
    "reference's one-row-output shape (kafka_to_kudu.py:32-38); TPC-H Q6 filter.",
    oracle=_Q06_ORACLE,
    bench=True,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        fround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q07_ORACLE = """
SELECT c.c_custkey, c.c_name,
       count(o.o_orderkey)                      AS order_count,
       floor((coalesce(sum(o.o_totalprice), 0)) * 100 + 0.5) / 100 AS total_spend
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'O'
GROUP BY c.c_custkey, c.c_name
"""


@register(
    "q07_left_join_agg",
    "join",
    "LEFT join with an extra non-key join condition; COUNT(col) vs COUNT(*) null "
    "semantics; COALESCE over the null side.",
    oracle=_Q07_ORACLE,
)
def q07_left_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"]) & (o["o_orderstatus"] == "O"),
            "left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            fround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


_Q08_ORACLE = """
SELECT n.n_name, count(c.c_custkey) AS cust_count
FROM customer c
RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register(
    "q08_right_join",
    "join",
    "RIGHT outer join preserving unmatched dimension rows (zero-customer nations).",
    oracle=_Q08_ORACLE,
)
def q08_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"], "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("cust_count"))
    )


_Q09_ORACLE = """
WITH cc AS (SELECT c_nationkey AS nk, count(*) AS ncust FROM customer GROUP BY 1),
     sc AS (SELECT s_nationkey AS nk, count(*) AS nsupp FROM supplier GROUP BY 1)
SELECT coalesce(cc.nk, sc.nk)  AS nationkey,
       coalesce(cc.ncust, 0)   AS ncust,
       coalesce(sc.nsupp, 0)   AS nsupp
FROM cc FULL OUTER JOIN sc ON cc.nk = sc.nk
"""


@register(
    "q09_full_outer_join",
    "join",
    "FULL OUTER join of two aggregates with COALESCE key reconciliation.",
    oracle=_Q09_ORACLE,
)
def q09_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("ncust"))
    )
    sc = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("nsupp"))
    )
    return cc.join(sc, cc["nk"] == sc["nk"], "full").select(
        F.coalesce(cc["nk"], sc["nk"]).alias("nationkey"),
        F.coalesce(F.col("ncust"), F.lit(0)).alias("ncust"),
        F.coalesce(F.col("nsupp"), F.lit(0)).alias("nsupp"),
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


@register(
    "q10_anti_join",
    "join",
    "NOT EXISTS == left-anti join (customers with no urgent orders — the "
    "filtered subquery keeps the result non-empty at every fixture scale, "
    "so the parity check is never vacuous).",
    oracle=_Q10_ORACLE,
)
def q10_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


_Q11_ORACLE = """
WITH g AS (SELECT l_orderkey AS k1, l_returnflag AS k2,
                  count(*) AS grp_cnt, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS grp_qty
           FROM lineitem GROUP BY 1, 2)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, g.grp_cnt, g.grp_qty
FROM lineitem l
JOIN g ON l.l_orderkey = g.k1 AND l.l_returnflag = g.k2
WHERE g.grp_cnt >= 3
"""


@register(
    "q11_multikey_join",
    "join",
    "Multi-key equi-join (2 keys) of a fact table against its own aggregate.",
    oracle=_Q11_ORACLE,
)
def q11_multikey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    g = (
        li.groupBy(
            F.col("l_orderkey").alias("k1"), F.col("l_returnflag").alias("k2")
        )
        .agg(
            F.count(F.lit(1)).alias("grp_cnt"),
            fround(F.sum("l_quantity"), 2).alias("grp_qty"),
        )
        .filter(F.col("grp_cnt") >= 3)
    )
    return li.join(
        g, (li["l_orderkey"] == g["k1"]) & (li["l_returnflag"] == g["k2"])
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "grp_cnt", "grp_qty")


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_suppkey, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS total_qty, count(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
HAVING sum(l_quantity) > 15000
"""


@register(
    "q12_group_having",
    "aggregation",
    "GROUP BY + HAVING post-aggregate predicate.",
    oracle=_Q12_ORACLE,
)
def q12_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            fround(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 15000)
        .drop("_raw_qty")
    )


_Q13_ORACLE = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS distinct_parts,
       count(DISTINCT l_suppkey) AS distinct_supps,
       count(*)                  AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q13_count_distinct",
    "aggregation",
    "Multiple COUNT(DISTINCT) in one aggregate (expand + two-phase agg in Catalyst).",
    oracle=_Q13_ORACLE,
)
def q13_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n"),
    )


_Q14_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_rf,
       CAST(grouping(l_linestatus) AS INT) AS g_ls,
       count(*) AS n, floor((sum(l_quantity)) * 100 + 0.5) / 100 AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register(
    "q14_rollup",
    "aggregation",
    "ROLLUP hierarchy with GROUPING() disambiguation of generated nulls.",
    oracle=_Q14_ORACLE,
)
def q14_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
        fround(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


_Q15_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT)   AS g_st,
       CAST(grouping(o_orderpriority) AS INT) AS g_pr,
       count(*) AS n,
       floor((floor((sum(o_totalprice)) * 100 + 0.5) / 100 / count(*)) * 100 + 0.5) / 100 AS avg_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register(
    "q15_cube",
    "aggregation",
    "CUBE over two dimensions (all 4 grouping combinations).",
    oracle=_Q15_ORACLE,
)
def q15_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_st"),
        F.grouping("o_orderpriority").cast("int").alias("g_pr"),
        F.count(F.lit(1)).alias("n"),
        favg(F.sum("o_totalprice"), F.count(F.lit(1)), 2).alias("avg_price"),
    )


_Q16_SQL = """
SELECT c_mktsegment, c_nationkey, count(*) AS n,
       floor((floor((sum(c_acctbal)) * 100 + 0.5) / 100 / count(*)) * 100 + 0.5) / 100 AS avg_bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register(
    "q16_grouping_sets",
    "aggregation",
    "GROUPING SETS via the engine's SQL-text entry point (temp views, like the "
    "reference's registerTempTable+sql at kafka_to_kudu.py:30-38).",
    oracle=_Q16_SQL,
)
def q16_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(_Q16_SQL)


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT * FROM (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         floor((l_extendedprice) * 100 + 0.5) / 100 AS price,
         row_number() OVER w AS rn,
         rank() OVER w       AS rnk,
         dense_rank() OVER w AS drnk
  FROM lineitem
  WINDOW w AS (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)
) WHERE rn <= 5
"""


@register(
    "q17_window_ranks",
    "window",
    "row_number/rank/dense_rank with a total (tiebroken) per-partition order; "
    "top-5 per group via rn filter.",
    oracle=_Q17_ORACLE,
)
def q17_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            fround("l_extendedprice", 2).alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


_Q18_ORACLE = """
SELECT event_id, user_id, floor((value) * 100 + 0.5) / 100 AS v,
       floor((lag(value)  OVER w) * 100 + 0.5) / 100 AS prev_v,
       floor((lead(value) OVER w) * 100 + 0.5) / 100 AS next_v,
       epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS ms_since_prev
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


@register(
    "q18_window_lag_lead",
    "window",
    "LAG/LEAD with null boundaries and timestamp deltas in epoch-millis.",
    oracle=_Q18_ORACLE,
)
def q18_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        fround("value", 2).alias("v"),
        fround(F.lag("value").over(w), 2).alias("prev_v"),
        fround(F.lead("value").over(w), 2).alias("next_v"),
        (F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))).alias(
            "ms_since_prev"
        ),
    )


_Q19_ORACLE = """
SELECT event_id, user_id,
       floor((sum(value) OVER w) * 100 + 0.5) / 100  AS running_sum,
       floor((floor((sum(value) OVER w) * 100 + 0.5) / 100 / (count(*) OVER w)) * 10000 + 0.5) / 10000 AS running_avg,
       count(*) OVER w              AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "q19_running_agg",
    "window",
    "Running SUM/AVG/COUNT over an explicit ROWS frame.",
    oracle=_Q19_ORACLE,
)
def q19_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        fround(F.sum("value").over(w), 2).alias("running_sum"),
        favg(F.sum("value").over(w), F.count(F.lit(1)).over(w), 4).alias("running_avg"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


# --------------------------------------------------------------------------
# Sort / limit (reference consumer query O17: ORDER BY; README.md:40)
# --------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
       floor((o_totalprice) * 100 + 0.5) / 100 AS price
FROM orders
ORDER BY prio ASC NULLS FIRST, price DESC, o_orderkey ASC
LIMIT 100
"""


@register(
    "q20_sort_limit",
    "sort",
    "Multi-key ORDER BY with NULLS FIRST + DESC + unique tiebreak, then LIMIT "
    "(deterministic top-100).",
    oracle=_Q20_ORACLE,
)
def q20_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias("prio"),
            fround("o_totalprice", 2).alias("price"),
        )
        .orderBy(
            F.col("prio").asc_nulls_first(), F.col("price").desc(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT c_nationkey AS nationkey, 'customer' AS side, count(*) AS n
FROM customer GROUP BY 1
UNION ALL
SELECT s_nationkey AS nationkey, 'supplier' AS side, count(*) AS n
FROM supplier GROUP BY 1
"""


@register("q21_union_all", "setop", "UNION ALL of two aggregates.", oracle=_Q21_ORACLE)
def q21_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("nationkey", F.lit("customer").alias("side"), "n")
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("nationkey", F.lit("supplier").alias("side"), "n")
    )
    return c.unionByName(s)


_Q22_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("q22_union_distinct", "setop", "UNION (distinct).", oracle=_Q22_ORACLE)
def q22_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


_Q23_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("q23_intersect", "setop", "INTERSECT (distinct).", oracle=_Q23_ORACLE)
def q23_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_Q24_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
"""


@register(
    "q24_except",
    "setop",
    "EXCEPT (distinct): customers with finished orders but no pending ones "
    "— both sides chosen so the difference is non-empty at every fixture "
    "scale (nationkey-based EXCEPTs go vacuously empty once suppliers "
    "cover all nations).",
    oracle=_Q24_ORACLE,
)
def q24_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    p = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(p)


_Q116_ORACLE = """
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 25
INTERSECT ALL
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
"""


@register(
    "q116_intersect_all",
    "setop",
    "INTERSECT ALL (multiset): per supplier key, min(multiplicity) copies "
    "survive — bag semantics the distinct q23 can't express (SQL:2003 "
    "F304). Spark's intersectAll plans as a count-compare aggregate + "
    "generate, one shuffle per side on the compared columns.",
    oracle=_Q116_ORACLE,
)
def q116_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("suppkey"))
    return a.intersectAll(b)


_Q117_ORACLE = """
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_quantity >= 25
EXCEPT ALL
SELECT l_suppkey AS suppkey FROM lineitem WHERE l_returnflag = 'R'
"""


@register(
    "q117_except_all",
    "setop",
    "EXCEPT ALL (multiset): each key keeps max(0, left-mult - right-mult) "
    "copies — the bag difference q24's distinct subtract collapses.",
    oracle=_Q117_ORACLE,
)
def q117_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(F.col("l_suppkey").alias("suppkey"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("suppkey"))
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# Scalar functions (reference O5/O10/O11: split/trim/round/unix_timestamp)
# --------------------------------------------------------------------------

_Q25_ORACLE = """
SELECT doc_id,
       upper(substr(text, 1, 10))        AS head_u,
       lower(source)                     AS src_l,
       length(text)                      AS n_len,
       concat(lang, ':', source)         AS tag,
       split_part(text, ' ', 1)          AS first_tok,
       substr(replace(text, ' ', ''), 1, 12) AS squished,
       (text LIKE '%data%')              AS has_data
FROM documents
"""


@register(
    "q25_scalar_string",
    "scalar",
    "String surface: upper/lower/substr/length/concat/split_part/replace/LIKE "
    "(generalizes reference split+trim parse, kafka_to_kudu.py:25).",
    oracle=_Q25_ORACLE,
)
def q25_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_u"),
        F.lower("source").alias("src_l"),
        F.length("text").cast("long").alias("n_len"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("tag"),
        F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_tok"),
        F.substring(F.regexp_replace("text", " ", ""), 1, 12).alias("squished"),
        F.col("text").like("%data%").alias("has_data"),
    )


_Q26_ORACLE = """
SELECT l_orderkey, l_linenumber,
       floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100 + 0.5) / 100 AS charge,
       floor((abs(l_discount - 0.05)) * 10000 + 0.5) / 10000                           AS disc_dev,
       CAST(floor(l_quantity / 7) AS BIGINT)                      AS q_div,
       CAST(ceil(l_quantity / 7)  AS BIGINT)                      AS q_ceil,
       CAST(l_quantity AS INT) % 5                                AS q_mod
FROM lineitem
"""


@register(
    "q26_scalar_math",
    "scalar",
    "Math surface: round/abs/floor/ceil, + - * / %, casts (reference O10 ROUND).",
    oracle=_Q26_ORACLE,
)
def q26_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        fround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
        fround(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        # l_quantity is DOUBLE in the fixture schema; the oracle applies
        # the identical floor/ceil-over-double expressions.
        F.floor(F.col("l_quantity") / 7).cast("long").alias("q_div"),  # float-by-design: DOUBLE input
        F.ceil(F.col("l_quantity") / 7).cast("long").alias("q_ceil"),  # float-by-design: DOUBLE input
        (F.col("l_quantity").cast("int") % 5).alias("q_mod"),
    )


_Q27_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                       AS odate,
       year(o_orderdate)                               AS y,
       month(o_orderdate)                              AS m,
       day(o_orderdate)                                AS d,
       CAST(date_trunc('month', o_orderdate) AS DATE)  AS month_start,
       epoch_ms(o_orderdate)                           AS epoch_millis
FROM orders
WHERE o_orderkey % 10 = 0
"""


@register(
    "q27_datetime",
    "scalar",
    "Date/time surface: date_trunc, year/month/day, epoch-millis conversion "
    "(reference O11 UNIX_TIMESTAMP*1000 equivalent).",
    oracle=_Q27_ORACLE,
)
def q27_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("odate"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.unix_millis(F.col("o_orderdate")).alias("epoch_millis"),
    )


_Q28_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 3000 THEN 'low'
            WHEN c_acctbal < 7000 THEN 'mid'
            ELSE 'high' END                              AS bal_tier,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
       CAST(floor((c_acctbal) * 1 + 0.5) / 1 AS BIGINT)                  AS bal_round,
       CAST(c_custkey AS VARCHAR)                        AS key_str,
       CAST(c_nationkey AS DOUBLE)                       AS nk_d
FROM customer
"""


@register(
    "q28_case_coalesce",
    "scalar",
    "CASE WHEN tiers, COALESCE/NULLIF, and cross-type casts "
    "(explicit round-then-cast: Spark double->int casts truncate while DuckDB rounds).",
    oracle=_Q28_ORACLE,
)
def q28_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg"
        ),
        fround(F.col("c_acctbal"), 0).cast("long").alias("bal_round"),
        F.col("c_custkey").cast("string").alias("key_str"),
        F.col("c_nationkey").cast("double").alias("nk_d"),
    )
