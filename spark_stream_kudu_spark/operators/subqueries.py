"""Subquery-heavy TPC-H-style shapes (Q13/Q15/Q17/Q19/Q22 analogs).

The reference has no joins at all (SURVEY.md §2.2 — single-table
pipeline), so this family exists to prove the declared contract's
subquery surface the way Catalyst wants it expressed: every correlated
subquery is decorrelated to an aggregate-join, every scalar subquery
becomes a broadcast of a 1-row aggregate, and disjunctive predicates
stay inside the scan so parquet row-group pruning still applies.

Scale notes (100 TB): each query here shuffles only on its aggregation
key; the scalar-aggregate sides are single rows (broadcast, never a
shuffle); Q13's left join is fact-to-fact but both sides are keyed on
the join key, and its second aggregation operates on |customers| rows,
then |distinct counts| rows — strictly shrinking.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround, sql_fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q47 — disjunctive multi-attribute join predicate (TPC-H Q19 shape)
# --------------------------------------------------------------------------

_Q47_PRED = """(
      (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 45
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
)"""

_Q47_ORACLE = f"""
SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
         AS revenue_e4,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {_Q47_PRED}
"""


@register(
    "q47_disjunctive_join",
    "join",
    "TPC-H Q19 shape: broadcast equi-join with an OR-of-conjunctions residual "
    "predicate spanning both sides. The equi-key keeps the join hash-based "
    "(never a cartesian); the disjunction stays a residual filter. Revenue "
    "summed as exact e4-scaled integers so engines agree bit-for-bit.",
    oracle=_Q47_ORACLE,
)
def q47_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 30)
           & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 45)
           & (q >= 20) & (q <= 40))
    )
    cents4 = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    return (
        # part is entity-scale: un-hinted (stats/AQE decide).
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            F.sum(cents4).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q48 — correlated AVG subquery, decorrelated (TPC-H Q17 shape)
# --------------------------------------------------------------------------

_Q48_ORACLE = """
SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS small_qty_cents,
       count(*) AS n_lines
FROM lineitem l
JOIN (
  SELECT l_partkey, sum(l_quantity) AS qty_sum, count(*) AS qty_n
  FROM lineitem GROUP BY l_partkey
) a ON a.l_partkey = l.l_partkey
WHERE l.l_quantity * a.qty_n * 5 < a.qty_sum
"""


@register(
    "q48_small_quantity_revenue",
    "join",
    "TPC-H Q17 shape: correlated AVG(l_quantity) subquery decorrelated to a "
    "per-part aggregate joined back to lineitem. The threshold compare is kept "
    "in integers (qty*n*5 < sum — quantities are integral doubles, summed "
    "exactly) so no engine disagrees at the boundary. Two passes over "
    "lineitem, one shuffle each, keyed identically — AQE reuses the exchange.",
    oracle=_Q48_ORACLE,
)
def q48_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("qty_sum"),
        F.count(F.lit(1)).alias("qty_n"),
    )
    joined = li.join(per_part, "l_partkey").filter(
        F.col("l_quantity") * F.col("qty_n") * 5 < F.col("qty_sum")
    )
    return joined.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("small_qty_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# q49 — customer order-count distribution (TPC-H Q13 shape)
# --------------------------------------------------------------------------

_Q49_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register(
    "q49_order_count_distribution",
    "join",
    "TPC-H Q13 shape: outer join with a non-key residual condition, COUNT(col) "
    "null semantics, then a second aggregation over the first's output. "
    "Cardinality shrinks at every step (|orders| -> |customers| -> |distinct "
    "counts|), so the second shuffle is negligible at any scale.",
    oracle=_Q49_ORACLE,
    bench=True,
)
def q49_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# q50 — top-revenue supplier via scalar MAX subquery (TPC-H Q15 shape)
# --------------------------------------------------------------------------

_Q50_REV = (
    "SELECT l_suppkey, "
    "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)"
    " AS total_rev_e4 "
    "FROM lineitem WHERE l_returnflag <> 'R' GROUP BY l_suppkey"
)

_Q50_ORACLE = f"""
WITH rev AS ({_Q50_REV})
SELECT s.s_suppkey, s.s_name, r.total_rev_e4
FROM supplier s
JOIN rev r ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
"""


@register(
    "q50_top_supplier",
    "join",
    "TPC-H Q15 shape: scalar MAX over an aggregated view selects the view's "
    "own argmax rows (keeps ties, unlike LIMIT 1). The 1-row max side is a "
    "broadcast cross-join — no shuffle; revenue in exact e4 integers so the "
    "equality compare is engine-independent.",
    oracle=_Q50_ORACLE,
)
def q50_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    rev = (
        li.filter(F.col("l_returnflag") != "R")
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
            ).alias("total_rev_e4")
        )
    )
    top = rev.agg(F.max("total_rev_e4").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev_e4 == top.max_rev)  # bounded: 1-row max
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


# --------------------------------------------------------------------------
# q51 — idle rich customers (TPC-H Q22 shape)
# --------------------------------------------------------------------------

_Q51_AVG = sql_fround(
    "(SELECT floor(sum(c_acctbal) * 100 + 0.5) / 100 / count(*) "
    " FROM customer WHERE c_acctbal > 0.0)",
    4,
)

_Q51_ORACLE = f"""
SELECT c.c_nationkey,
       count(*) AS n_idle_rich,
       CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE c.c_acctbal > {_Q51_AVG}
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
"""


@register(
    "q51_idle_rich_customers",
    "join",
    "TPC-H Q22 shape: scalar AVG subquery (snap-summed via favg so the "
    "threshold double is bit-identical across engines) + NOT EXISTS (no "
    "urgent orders — non-empty at every fixture scale) as a left-anti "
    "join, then a small group-by. The scalar side broadcasts; the "
    "anti join is the only fact-sized shuffle.",
    oracle=_Q51_ORACLE,
)
def q51_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            fround(
                fround(F.sum("c_acctbal"), 2) / F.count(F.lit(1)), 4
            ).alias("avg_bal")
        )
    )
    rich = (
        c.join(F.broadcast(thr))  # bounded: 1-row threshold
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    idle_rich = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return idle_rich.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_idle_rich"),
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("acctbal_cents"),
    )


# --------------------------------------------------------------------------
# q63 — one SQL text, two engines (the strongest portability statement)
# --------------------------------------------------------------------------

_Q63_SQL = """
SELECT n.n_name,
       o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderstatus <> 'P'
GROUP BY n.n_name, o.o_orderpriority
"""


@register(
    "q63_sql_text",
    "sql",
    "The SQL-text entry point (reference's registerTempTable + spark.sql "
    "path, kafka_to_kudu.py:30-38) run on a 4-table join: the EXACT same "
    "ANSI string executes on Spark (over registered temp views) and on the "
    "DuckDB oracle — one dialect-neutral text, two engines, identical "
    "results. Catalyst still broadcasts the dimension chain and pushes the "
    "region/status predicates; declaring via SQL text loses nothing vs the "
    "DataFrame API.",
    oracle=_Q63_SQL,
)
def q63_sql_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.sources.tables import register_views

    tune_session(spark)
    register_views(spark, sf_dir, ["orders", "customer", "nation", "region"])
    return spark.sql(_Q63_SQL)


# --------------------------------------------------------------------------
# q65 — nation-pair volume (TPC-H Q7 shape)
# --------------------------------------------------------------------------

_Q65_ORACLE = """
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
         AS volume_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o    ON o.o_orderkey = l.l_orderkey
JOIN customer c  ON c.c_custkey = o.o_custkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
WHERE ((cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_7')
    OR (cn.n_name = 'NATION_7' AND sn.n_name = 'NATION_3'))
GROUP BY cn.n_name, sn.n_name, year(l.l_shipdate)
"""


@register(
    "q65_nation_pair_volume",
    "join",
    "TPC-H Q7 shape: 6-table join with a symmetric nation-pair OR predicate "
    "and a year extraction in the grouping key. The two nation aliases and "
    "supplier/customer dims broadcast; lineitem->orders is the only "
    "fact-fact edge, shuffled once on orderkey. The pair disjunction sits "
    "above the dim joins where it prunes to two nation pairs before the "
    "fact join output grows.",
    oracle=_Q65_ORACLE,
)
def q65_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        ((F.col("cust_nation") == "NATION_3") & (F.col("supp_nation") == "NATION_7"))
        | ((F.col("cust_nation") == "NATION_7") & (F.col("supp_nation") == "NATION_3"))
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer/supplier are entity-scale: un-hinted (stats/AQE).
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))  # bounded: |nations|
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))  # bounded: |nations|
        .filter(pair)
    )
    return joined.groupBy(
        "cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("ship_year")
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
        ).alias("volume_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
# q122: TPC-H Q10 — returned-item revenue, top customers
# --------------------------------------------------------------------------

_Q122_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
         AS revenue_e4
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue_e4 DESC, c.c_custkey ASC
LIMIT 20
"""


@register(
    "q122_returned_items",
    "subquery",
    "TPC-H Q10 shape: customers who returned the most revenue in one "
    "quarter — lineitem x orders x customer x nation, quarter predicate "
    "pushed to the orders scan, RETURNFLAG filter pushed to lineitem, "
    "top-20 with a deterministic (revenue DESC, custkey ASC) tie-break. "
    "The classic churn-investigation query (reference parity target: "
    "none — the reference has no joins at all; SURVEY §2.2).",
    oracle=_Q122_ORACLE,
)
def q122_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        # customer is entity-scale: un-hinted (stats/AQE decide).
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# q123: TPC-H Q16 shape — supplier diversity per part attribute, NOT IN
# --------------------------------------------------------------------------

_Q123_ORACLE = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "q123_supplier_diversity",
    "subquery",
    "TPC-H Q16 shape: how many distinct suppliers ship each qualifying "
    "(brand, type, size) — attribute anti-predicates (<>, NOT LIKE, IN "
    "list), a NOT IN blacklist subquery (negative-balance suppliers; "
    "suppkey is non-null by schema so a broadcast LEFT ANTI join is "
    "exactly NOT IN — the null-aware plan is only needed for nullable "
    "keys, which q119 covers), and COUNT(DISTINCT) per group. The "
    "supplier relation is derived from lineitem's (partkey, suppkey) "
    "pairs — the fixture's partsupp equivalent.",
    oracle=_Q123_ORACLE,
)
def q123_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    # supplier/part sides are entity-scale: un-hinted (stats/AQE).
    kept = li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
    return (
        kept.join(p, kept["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# q130: TPC-H Q14 shape — promotion revenue share
# --------------------------------------------------------------------------

_Q130_ORACLE = f"""
SELECT
  CAST(sum(CASE WHEN p.p_type = 'PROMO'
       THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
       ELSE 0 END) AS BIGINT) AS promo_rev_e4,
  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))
       AS BIGINT) AS total_rev_e4,
  {sql_fround(
      "100.0 * sum(CASE WHEN p.p_type = 'PROMO' "
      "THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) "
      "ELSE 0 END) / sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT))",
      6)} AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-04-01'
"""


@register(
    "q130_promo_revenue",
    "subquery",
    "TPC-H Q14 shape: promotion revenue share for one quarter — the "
    "conditional-numerator / unconditional-denominator ratio computed in "
    "ONE aggregation pass (no second scan for the denominator), with the "
    "shipdate window pushed to the lineitem scan and part broadcast. "
    "Revenue quantizes to e4 integers before summing, so the final "
    "percentage divides two exact BIGINTs — identical doubles in both "
    "engines (the q82 market-share discipline).",
    oracle=_Q130_ORACLE,
)
def q130_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast(
        "long"
    )
    agg = (
        # part is entity-scale: un-hinted (stats/AQE decide).
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
                "promo_rev_e4"
            ),
            F.sum(rev).alias("total_rev_e4"),
        )
    )
    return agg.select(
        "promo_rev_e4",
        "total_rev_e4",
        fround(
            F.lit(100.0) * F.col("promo_rev_e4") / F.col("total_rev_e4"), 6
        ).alias("promo_pct"),
    )


# --------------------------------------------------------------------------
# q131: TPC-H Q12 shape — late-shipment counts by priority class
# --------------------------------------------------------------------------

_Q131_LATE_DAYS = 90

_Q131_ORACLE = f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL {_Q131_LATE_DAYS} DAY
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register(
    "q131_late_priority",
    "subquery",
    f"TPC-H Q12 shape: for lineitems shipped more than {_Q131_LATE_DAYS} "
    "days after their order date (the late-shipment predicate joins the "
    "two facts' date columns), count high-priority (1-URGENT/2-HIGH) vs "
    "lower-priority lines per return flag — the conditional-sum pivot Q12 "
    "uses for shipmode, adapted to the fixture's columns. Fact-to-fact "
    "equi-join on the order key with the residual date predicate applied "
    "at join time; one partially-aggregated shuffle over 3 groups.",
    oracle=_Q131_ORACLE,
)
def q131_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q131_LATE_DAYS} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q158-q162: the five TPC-H shapes that complete all 22 (Q2/Q4/Q9/Q11/Q20)
#
# The fixture has no partsupp table (TESTDATA.md), so the Q2/Q9/Q11/Q20
# shapes derive their "supply" relation from lineitem — (partkey,
# suppkey) unit-cost/quantity rollups with exact integer arithmetic.
# The PLAN shapes (correlated min, EXISTS semi-join, multi-join profit
# rollup, group-HAVING vs scalar subquery, nested IN chains) are the
# canonical ones; only the cost column's provenance differs.
#
# The Q2/Q11/Q20 shapes read the supply relation as a MATERIALIZED
# parquet table (supply_table below, written once per sf_dir via
# QuerySpec.prepare) rather than recomputing the lineitem rollup as a
# CTE inside each query — so the scans and joins price a stored
# partsupp-sized relation, exactly as TPC-H's do. DuckDB cannot see the
# prepared parquet, so each oracle re-derives the identical relation
# with the same exact-integer formulas (associative sums -> bit-equal).
# --------------------------------------------------------------------------


def supply_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixture's partsupp stand-in, materialized once per (process,
    sf_dir): lineitem rolled up per (partkey, suppkey) with exact
    integer unit cost (cents division), total value (cents), and total
    quantity. Idempotent — written to a session-temp warehouse on first
    use and reused, mirroring a real deployment where the supply rollup
    is a maintained table, not a per-query CTE. At 100 TB the rollup is
    ~|parts|x|avg suppliers per part| rows — partsupp-sized, orders of
    magnitude smaller than lineitem — so every query that joins it
    scans the small stored relation instead of re-shuffling the fact.

    Cache keying and concurrency: the cache tag folds in a fingerprint
    of the lineitem fixture files (paths + sizes + mtimes), so a
    regenerated fixture at the same sf_dir gets a fresh rollup instead
    of silently serving a stale one. The write goes to a unique temp
    directory and is renamed into place atomically (POSIX same-fs
    rename), so concurrent processes (pytest-xdist, parallel bench)
    that both miss the cache race safely — one rename wins, the loser
    discards its copy and reads the winner's.
    """
    tune_session(spark)
    li_root = os.path.join(sf_dir, "lineitem.parquet")
    files = (
        [li_root]
        if os.path.isfile(li_root)
        else sorted(glob.glob(os.path.join(li_root, "*.parquet")))
    ) or [li_root]
    stamp = "|".join(
        f"{p}:{os.stat(p).st_size}:{os.stat(p).st_mtime_ns}"
        for p in files
        if os.path.exists(p)
    )
    tag = hashlib.md5(f"{sf_dir}|{stamp}".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"ssk_supply_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.groupBy(
                F.col("l_partkey").alias("ps_partkey"),
                F.col("l_suppkey").alias("ps_suppkey"),
            )
            .agg(
                F.expr(
                    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
                    " div sum(CAST(l_quantity AS BIGINT)) AS BIGINT)"
                ).alias("ps_unit_e2"),
                F.expr(
                    "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))"
                    " AS BIGINT)"
                ).alias("ps_value_e2"),
                F.expr("CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)").alias(
                    "ps_qty"
                ),
            )
            .write.mode("overwrite")
            .parquet(staging)
        )
        try:
            os.rename(staging, path)
        except OSError:
            # rename fails either because another process renamed a
            # COMPLETE copy first (rename is atomic and only happens
            # after a full write — its _SUCCESS marker is present), or
            # because a stale partial directory occupies `path` (e.g. a
            # crashed writer). Distinguish by the marker before
            # discarding our good staging copy: reading a marker-less
            # directory would silently serve an incomplete rollup.
            if not os.path.exists(marker):
                shutil.rmtree(path, ignore_errors=True)
                try:
                    os.rename(staging, path)
                except OSError:
                    # Lost a second race; only trust the winner if its
                    # copy is complete — otherwise fail loudly.
                    shutil.rmtree(staging, ignore_errors=True)
                    if not os.path.exists(marker):
                        raise RuntimeError(
                            f"supply cache at {path} is incomplete "
                            "(no _SUCCESS) and could not be replaced"
                        )
            else:
                shutil.rmtree(staging, ignore_errors=True)
    return spark.read.parquet(path)

_Q158_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
              // CAST(sum(l_quantity) AS BIGINT) AS BIGINT) AS unit_e2
  FROM lineitem GROUP BY 1, 2
), europe AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
), offers AS (
  SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name, su.unit_e2
  FROM part p
  JOIN supply su ON su.l_partkey = p.p_partkey
  JOIN europe e ON e.s_suppkey = su.l_suppkey
  WHERE p.p_type = 'ECONOMY'
)
SELECT o.p_partkey, o.p_name, o.s_name, o.n_name,
       CAST(round(o.s_acctbal * 100) AS BIGINT) AS acctbal_e2, o.unit_e2
FROM offers o
JOIN (SELECT p_partkey, min(unit_e2) AS m FROM offers GROUP BY 1) b
  ON b.p_partkey = o.p_partkey AND o.unit_e2 = b.m
"""


@register(
    "q158_min_cost_supplier",
    "subquery",
    "TPC-H Q2 shape: for every qualifying part, the EUROPE supplier(s) "
    "offering the minimum unit cost — the correlated-MIN subquery "
    "decorrelated into a per-part min aggregate joined back against "
    "the offer set (Catalyst's plan for the canonical form). The "
    "supply relation is the MATERIALIZED partsupp stand-in "
    "(supply_table, prepared parquet — no partsupp in the fixture): "
    "per-(part, supplier) unit cost as exact integer cents division, "
    "so the min and the equality join are bit-stable in both engines. "
    "The query scans the stored relation (partsupp-sized) instead of "
    "re-rolling lineitem. Region filter prunes the supplier side "
    "BEFORE the join; ties (two suppliers at the same min) are all "
    "kept, as in Q2.",
    oracle=_Q158_ORACLE,
    prepare=lambda spark, sf_dir: supply_table(spark, sf_dir) and None,
)
def q158_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supply = supply_table(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey", F.col("ps_unit_e2").alias("unit_e2")
    )
    europe = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])  # bounded: |regions|
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        p.join(supply, p["p_partkey"] == supply["ps_partkey"])
        # europe is supplier-derived (entity-scale): un-hinted.
        .join(europe, supply["ps_suppkey"] == europe["s_suppkey"])
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name", "unit_e2")
    )
    best = offers.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.min("unit_e2").alias("m")
    )
    return (
        offers.join(
            best,
            (offers["p_partkey"] == best["bk"]) & (offers["unit_e2"] == best["m"]),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_e2"),
            "unit_e2",
        )
    )


_Q159_ORACLE = """
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o.o_orderpriority
"""


@register(
    "q159_order_priority_check",
    "subquery",
    "TPC-H Q4 shape: order counts per priority for one quarter, "
    "restricted to orders with at least one late line item — EXISTS "
    "with a correlated inequality (l_shipdate > o_orderdate + 30 days "
    "stands in for commitdate < receiptdate, absent from the fixture), "
    "planned as a LEFT SEMI join so each order is counted once no "
    "matter how many lines qualify. Quarter predicate pushed to the "
    "orders scan; the semi join's residual inequality rides the "
    "equi-join on orderkey.",
    oracle=_Q159_ORACLE,
)
def q159_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q160_ORACLE = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                - (CAST(round(p.p_retailprice * 10000) AS BIGINT)
                   * CAST(l.l_quantity AS BIGINT)) // 10) AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_type = 'PROMO'
GROUP BY 1, 2
"""


@register(
    "q160_product_profit",
    "subquery",
    "TPC-H Q9 shape: profit by supplier nation and order year over one "
    "product line — the 5-table join (lineitem x part x supplier x "
    "nation x orders) with amount = revenue minus cost per line. Cost "
    "derives from p_retailprice (no partsupp supplycost in the "
    "fixture): a tenth of retail per unit, computed as exact integer "
    "e4 arithmetic so the per-line amounts sum associatively in any "
    "merge order. Part-type filter prunes the part side before the "
    "join; part/supplier/nation broadcast as dimensions.",
    oracle=_Q160_ORACLE,
)
def q160_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    cost = F.expr(
        "(CAST(round(p_retailprice * 10000) AS BIGINT)"
        " * CAST(l_quantity AS BIGINT)) div 10"
    )
    return (
        # part/supplier are entity-scale: un-hinted (stats/AQE).
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev - cost).alias("profit_e4"))
    )


_Q161_ORACLE = """
WITH europe_supply AS (
  SELECT l.l_partkey,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_e2
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY 1
), total AS (
  SELECT CAST(sum(value_e2) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS n_parts
  FROM europe_supply
)
SELECT e.l_partkey AS p_partkey, e.value_e2
FROM europe_supply e CROSS JOIN total
WHERE e.value_e2 * total.n_parts * 2 > 3 * total.t
"""


@register(
    "q161_important_stock",
    "subquery",
    "TPC-H Q11 shape: parts whose EUROPE-supplied value exceeds 1.5x "
    "the mean per-part share of the region's total — Q11's own "
    "scale-adaptive cut (the spec's fraction is 0.0001/SF precisely so "
    "output survives scale-up; here the 1/|parts| mean share derives "
    "from the data, so no SF constant is baked in and the query is "
    "non-vacuous at every fixture scale — a fixed 0.1% cut went empty "
    "at sf0.1, caught by the round-5 sf0.1 certification sweep). "
    "Per-part value rollup (exact integer cents), one-row total+count "
    "via the same aggregate re-reduced, and the HAVING-vs-scalar-"
    "subquery comparison as a broadcast cross join with the threshold "
    "CROSS-MULTIPLIED (value * n_parts * 2 > 3 * total: no float "
    "fraction, no rounding ambiguity at the cut). Supply is the "
    "MATERIALIZED partsupp "
    "stand-in (supply_table, prepared parquet): the per-part rollup "
    "sums the stored per-(part, supplier) values — integer sums "
    "re-associate bit-exactly — so the scan prices the small stored "
    "relation, not a lineitem re-shuffle.",
    oracle=_Q161_ORACLE,
    prepare=lambda spark, sf_dir: supply_table(spark, sf_dir) and None,
)
def q161_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])  # bounded: |regions|
        .select("s_suppkey")
    )
    europe_supply = (
        supply_table(spark, sf_dir)
        # europe is supplier-derived (entity-scale): un-hinted.
        .join(
            europe,
            F.col("ps_suppkey") == europe["s_suppkey"],
            "left_semi",
        )
        .groupBy(F.col("ps_partkey").alias("p_partkey"))
        .agg(F.sum("ps_value_e2").alias("value_e2"))
    )
    total = europe_supply.agg(
        F.sum("value_e2").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return (
        europe_supply.crossJoin(F.broadcast(total))  # bounded: 1-row total
        .filter(F.col("value_e2") * F.col("n_parts") * 2 > 3 * F.col("t"))
        .select("p_partkey", "value_e2")
    )


_Q162_ORACLE = """
SELECT s.s_name, CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_e2
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'AFRICA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
    )
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 50
  )
"""


@register(
    "q162_excess_suppliers",
    "subquery",
    "TPC-H Q20 shape: AFRICA suppliers who moved more than a threshold "
    "quantity of some qualifying part — the nested IN chain (supplier "
    "IN (aggregated lineitem subquery over part IN (filtered parts))) "
    "planned as two broadcast semi-joins feeding the stored-quantity "
    "filter. The quantity threshold stands in for the partsupp "
    "availqty comparison, read from the MATERIALIZED partsupp "
    "stand-in (supply_table, prepared parquet — the per-(supplier, "
    "part) quantity rollup is pre-stored, so the inner subquery is a "
    "filtered scan of the small relation, no lineitem aggregation at "
    "query time); the plan shape — innermost filter pruning the part "
    "side, semi-join up the chain — is the canonical one.",
    oracle=_Q162_ORACLE,
    prepare=lambda spark, sf_dir: supply_table(spark, sf_dir) and None,
)
def q162_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    movers = (
        supply_table(spark, sf_dir)
        # part is entity-scale: un-hinted (stats/AQE decide).
        .join(p, F.col("ps_partkey") == p["p_partkey"], "left_semi")
        .filter(F.col("ps_qty") > 50)
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])  # bounded: |regions|
        .join(movers, s["s_suppkey"] == movers["ps_suppkey"], "left_semi")
        .select(
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_e2"),
        )
    )
