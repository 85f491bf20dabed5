"""Advanced relational surface: pivot, JSON access, distribution window
functions, and sketch aggregates — rounding out SURVEY.md §2.4 beyond
the core contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround, idiv
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Pivot (conditional aggregation)
# --------------------------------------------------------------------------

_STATUSES = ["F", "O", "P"]

_PIVOT_ORACLE = f"""
SELECT o_orderpriority,
       {", ".join(
           f"floor((coalesce(sum(CASE WHEN o_orderstatus = '{s}' THEN o_totalprice END), 0)) * 100 + 0.5) / 100 AS total_{s}"
           for s in _STATUSES
       )},
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "q33_pivot",
    "aggregation",
    "Pivot orders by status: groupBy().pivot() compiles to conditional "
    "aggregation — one pass, one shuffle, no per-value scans.",
    oracle=_PIVOT_ORACLE,
)
def q33_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    # explicit value list: avoids the extra distinct-values job and
    # keeps output schema static (required for the oracle contract)
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.sum("o_totalprice"))
    )
    n = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    out = pv.join(n, "o_orderpriority")
    for s in _STATUSES:
        out = out.withColumn(
            f"total_{s}", fround(F.coalesce(F.col(s), F.lit(0.0)), 2)
        ).drop(s)
    return out.select("o_orderpriority", *[f"total_{s}" for s in _STATUSES], "n")


# --------------------------------------------------------------------------
# Semi-structured: JSON property access
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_id,
       json_extract_string(props, '$.k')                AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50) AS k_high
FROM events
"""


@register(
    "q34_json_extract",
    "scalar",
    "JSON property extraction from the events.props column "
    "(get_json_object == json_extract_string), with typed casts downstream.",
    oracle=_JSON_ORACLE,
)
def q34_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_num"),
        (k.cast("long") >= 50).alias("k_high"),
    )


# --------------------------------------------------------------------------
# Distribution window functions
# --------------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT c_custkey,
       ntile(4)        OVER w AS quartile,
       floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000 AS pct_rank,
       floor((cume_dist()    OVER w) * 1000000 + 0.5) / 1000000 AS cume,
       first_value(c_custkey) OVER w AS richest_key,
       last_value(c_custkey)  OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                     AS poorest_key,
       c_mktsegment
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
"""


@register(
    "q35_distribution_windows",
    "window",
    "ntile / percent_rank / cume_dist / first_value / last_value over a total "
    "per-segment order (explicit full frame for last_value).",
    oracle=_NTILE_ORACLE,
)
def q35_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        fround(F.percent_rank().over(w), 6).alias("pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("richest_key"),
        F.last("c_custkey").over(w_full).alias("poorest_key"),
        "c_mktsegment",
    )


_MEDIAN_ORACLE = """
SELECT l_returnflag,
       floor((median(l_extendedprice)) * 100 + 0.5) / 100 AS median_price,
       floor((quantile_cont(l_extendedprice, 0.9)) * 100 + 0.5) / 100 AS p90_price
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q37_exact_percentiles",
    "aggregation",
    "Exact median / continuous quantile per group (Spark percentile == DuckDB "
    "quantile_cont) — the exact twin of the q36 sketches.",
    oracle=_MEDIAN_ORACLE,
)
def q37_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        fround(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("median_price"),
        fround(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90_price"),
    )


# --------------------------------------------------------------------------
# Skew-salted two-phase aggregation (scale technique, oracle-identical)
# --------------------------------------------------------------------------

_SALT_BUCKETS = 16

_SALTED_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_items,
       CAST(max(round(l_quantity)) AS BIGINT) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register(
    "q42_salted_agg",
    "aggregation",
    f"Skew-salted two-phase aggregation: {_SALT_BUCKETS}-way salt on a "
    "3-value grouping key (worst-case skew: every row shares one of 3 keys), "
    "partial agg on (key, salt), final agg on key. Result is provably "
    "identical to the direct GROUP BY (the oracle runs the unsalted form); "
    "the plan trades one extra tiny shuffle for partial partitions bounded "
    "at 1/salt of a key's rows — the standard fix when AQE skew handling "
    "isn't enough (e.g. a single hot key beyond split granularity).",
    oracle=_SALTED_ORACLE,
    bench=True,
)
def q42_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    salted = li.withColumn(
        "salt", F.pmod(F.col("l_orderkey") + F.col("l_linenumber"), F.lit(_SALT_BUCKETS))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum(cents).alias("p_rev"),
        F.count(F.lit(1)).alias("p_n"),
        F.max(F.round("l_quantity")).alias("p_maxq"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("p_rev").alias("revenue_cents"),
        F.sum("p_n").alias("n_items"),
        F.max("p_maxq").cast("long").alias("max_qty"),
    )


# --------------------------------------------------------------------------
# Array surface (nested-type functions over grouped data)
# --------------------------------------------------------------------------

_ARRAY_ORACLE = """
WITH g AS (
  SELECT l_orderkey, list(l_linenumber ORDER BY l_linenumber) AS lines
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(lines) AS n_lines,
       lines[1] AS first_line,
       lines[-1] AS last_line,
       list_contains(lines, 3) AS has_line_3,
       array_to_string(lines, ',') AS joined
FROM g
"""


@register(
    "q43_array_functions",
    "scalar",
    "Nested-type surface: per-group sorted array aggregation then element "
    "access, membership, size, and join-to-string — all native array "
    "expressions (SURVEY §1.2 extension types); arrays stay row-local so the "
    "only shuffle is the groupBy.",
    oracle=_ARRAY_ORACLE,
)
def q43_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("lines")
    )
    return g.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.array_contains("lines", 3).alias("has_line_3"),
        F.concat_ws(",", F.transform("lines", lambda x: x.cast("string"))).alias(
            "joined"
        ),
    )


# --------------------------------------------------------------------------
# Large-scale join shapes (TPC-H Q18 / Q21 style)
# --------------------------------------------------------------------------

_BIG_ORDER_QTY = 120

_Q44_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {_BIG_ORDER_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       epoch_ms(o.o_orderdate) AS order_ms,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@register(
    "q44_large_order_customers",
    "join",
    f"TPC-H Q18 shape: orders whose total quantity exceeds {_BIG_ORDER_QTY}. "
    "The per-order quantity aggregate serves double duty — it IS the filter "
    "AND the output measure — so lineitem is scanned and aggregated exactly "
    "ONCE (the classic Q18 rewrite; the naive form semi-joins on the "
    "aggregate, then re-scans and re-aggregates lineitem for the rollup). "
    "The surviving key set is tiny, so AQE turns the orders join into a "
    "broadcast at runtime.",
    oracle=_Q44_ORACLE,
    bench=True,
)
def q44_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    qty = F.round("l_quantity").cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("total_qty"))
        .filter(F.col("total_qty") > _BIG_ORDER_QTY)
    )
    return (
        big.join(o, o["o_orderkey"] == big["l_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("order_ms"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("totalprice_cents"),
            "total_qty",
        )
    )


_Q45_ORACLE = """
SELECT s.s_suppkey, s.s_name, count(*) AS n_late_lines
FROM supplier s
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l.l_orderkey AND l2.l_suppkey <> l.l_suppkey)
GROUP BY s.s_suppkey, s.s_name
"""


@register(
    "q45_late_suppliers",
    "join",
    "TPC-H Q21 shape: suppliers with late line items (ship > order + 60d) on "
    "finalized multi-supplier orders — an EXISTS on the same fact table "
    "becomes a left-semi self-join on the order key; the date inequality is "
    "a residual filter on the equi-join, never a join condition.",
    oracle=_Q45_ORACLE,
)
def q45_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            F.unix_micros("l_shipdate")
            > F.unix_micros("o_orderdate") + F.lit(60 * 86400 * 1_000_000)
        )
        .select("l_orderkey", "l_suppkey")
    )
    multi = late.join(
        l2,
        (late["l_orderkey"] == l2["l2_orderkey"])
        & (late["l_suppkey"] != l2["l2_suppkey"]),
        "left_semi",
    )
    return (
        multi.join(s, multi["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
    )


_TOPK_PER_GROUP = 3

_Q46_ORACLE = f"""
SELECT o_custkey, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY round(o_totalprice * 100) DESC, o_orderkey ASC
         ) AS rk
  FROM orders
)
WHERE rk <= {_TOPK_PER_GROUP}
"""


@register(
    "q46_topk_per_group",
    "sort",
    f"Top-{_TOPK_PER_GROUP} orders per customer: rank-then-filter window — the "
    "scalable top-k-per-group form (one shuffle on the group key, per-partition "
    "sort; never a global sort or a self-join). Ranked on exact integer cents "
    "with a unique key tiebreak so order is engine-independent.",
    oracle=_Q46_ORACLE,
    bench=False,
)
def q46_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(
        cents.desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TOPK_PER_GROUP)
        .select("o_custkey", "o_orderkey", cents.alias("totalprice_cents"), "rk")
    )


# --------------------------------------------------------------------------
# Skew-salted join (scale technique, oracle-identical to the plain join)
# --------------------------------------------------------------------------

_JOIN_SALT = 8

_SALTED_JOIN_ORACLE = """
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(e.value * 10000) AS BIGINT)) AS BIGINT) AS value_e4,
       CAST(sum(d.spend_cents) AS BIGINT) AS spend_cents
FROM events e
JOIN (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
  FROM orders GROUP BY o_custkey
) d ON d.o_custkey = e.user_id
GROUP BY e.event_type
"""


@register(
    "q56_salted_skew_join",
    "join",
    f"Skew-salted equi-join: the event log's user_id key space is tiny "
    "(worst-case join skew — every row hits a handful of hash partitions), "
    f"so the fact side salts {_JOIN_SALT} ways (pmod of the unique event id) "
    f"and the per-user dim explodes x{_JOIN_SALT}, turning each hot key into "
    f"{_JOIN_SALT} uniformly-sized partitions. Join on (key, salt) is "
    "provably result-identical to the plain join (the oracle runs the "
    "unsalted form). The manual escape hatch for when one key's rows exceed "
    "even AQE's skew-split granularity; dim replication cost = |dim| x salt, "
    "paid only for keys actually joined.",
    oracle=_SALTED_JOIN_ORACLE,
)
def q56_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    o = t(spark, sf_dir, "orders")
    dim = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spend_cents")
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_JOIN_SALT - 1)))
    )
    fact_salted = ev.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_JOIN_SALT)).cast("int")
    )
    joined = fact_salted.join(
        dim_salted,
        (fact_salted.user_id == dim_salted.o_custkey)
        & (fact_salted.salt == dim_salted.salt),
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_e4"),
        F.sum("spend_cents").alias("spend_cents"),
    )


# --------------------------------------------------------------------------
# Column profiling (data-quality summary in one pass)
# --------------------------------------------------------------------------

_PROFILE_ORACLE = """
WITH a AS (
  SELECT count(*) AS n_rows,
         count(o_custkey) AS nn_cust, count(DISTINCT o_custkey) AS nd_cust,
         CAST(min(o_custkey) AS VARCHAR) AS mn_cust, CAST(max(o_custkey) AS VARCHAR) AS mx_cust,
         count(o_orderstatus) AS nn_st, count(DISTINCT o_orderstatus) AS nd_st,
         min(o_orderstatus) AS mn_st, max(o_orderstatus) AS mx_st,
         count(o_totalprice) AS nn_tp, count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)) AS nd_tp,
         CAST(CAST(round(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mn_tp,
         CAST(CAST(round(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS mx_tp
  FROM orders
)
SELECT * FROM (
  SELECT 'o_custkey' AS column_name, n_rows,
         CAST(n_rows - nn_cust AS BIGINT) AS n_nulls,
         CAST(nd_cust AS BIGINT) AS n_distinct, mn_cust AS min_repr, mx_cust AS max_repr
  FROM a
  UNION ALL
  SELECT 'o_orderstatus', n_rows, CAST(n_rows - nn_st AS BIGINT),
         CAST(nd_st AS BIGINT), mn_st, mx_st FROM a
  UNION ALL
  SELECT 'o_totalprice_cents', n_rows, CAST(n_rows - nn_tp AS BIGINT),
         CAST(nd_tp AS BIGINT), mn_tp, mx_tp FROM a
)
"""


@register(
    "q57_column_profile",
    "profile",
    "One-pass column profiling of orders (row count, null count, distinct "
    "count, min/max) for a key, a categorical, and a money column — the "
    "data-quality summary every ingest pipeline runs first. ONE aggregation "
    "job computes every statistic (multi-distinct compiles to a single "
    "expand + aggregate), then the 1-row result is unpivoted driver-free "
    "into (column, stat) rows. Money rendered as integer cents so min/max "
    "strings are engine-independent.",
    oracle=_PROFILE_ORACLE,
)
def q57_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    tp_cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("nn_cust"),
        F.count_distinct("o_custkey").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        F.count("o_orderstatus").alias("nn_st"),
        F.count_distinct("o_orderstatus").alias("nd_st"),
        F.min("o_orderstatus").alias("mn_st"),
        F.max("o_orderstatus").alias("mx_st"),
        F.count("o_totalprice").alias("nn_tp"),
        F.count_distinct(tp_cents).alias("nd_tp"),
        F.round(F.min("o_totalprice") * 100).cast("long").cast("string").alias("mn_tp"),
        F.round(F.max("o_totalprice") * 100).cast("long").cast("string").alias("mx_tp"),
    )
    stacked = a.select(
        F.col("n_rows"),
        F.expr(
            "stack(3, "
            "'o_custkey', n_rows - nn_cust, nd_cust, mn_cust, mx_cust, "
            "'o_orderstatus', n_rows - nn_st, nd_st, mn_st, mx_st, "
            "'o_totalprice_cents', n_rows - nn_tp, nd_tp, mn_tp, mx_tp) "
            "AS (column_name, n_nulls, n_distinct, min_repr, max_repr)"
        ),
    )
    return stacked.select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_repr",
        "max_repr",
    )


# --------------------------------------------------------------------------
# Schema evolution: union across schema versions
# --------------------------------------------------------------------------

_EVOLUTION_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
),
v2 AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
),
unioned AS (
  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM v1
  UNION ALL
  SELECT * FROM v2
)
SELECT coalesce(o_orderpriority, '<pre-schema-v2>') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM unioned
GROUP BY 1
"""


@register(
    "q60_schema_evolution",
    "set",
    "Schema-drift ingestion: a v1 extract (no priority column) unions with "
    "a v2 extract via unionByName(allowMissingColumns=True) — missing "
    "columns null-fill by NAME, never by position (positional union is the "
    "classic silent-corruption bug when upstream adds a column). Downstream "
    "aggregation buckets the pre-evolution rows explicitly. At scale this "
    "is how years of heterogeneous parquet land in one query without "
    "rewriting old files.",
    oracle=_EVOLUTION_ORACLE,
)
def q60_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_totalprice")
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return (
        unioned.groupBy(
            F.coalesce("o_orderpriority", F.lit("<pre-schema-v2>")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
    )


# --------------------------------------------------------------------------
# Argmax aggregation (max_by / arg_max)
# --------------------------------------------------------------------------

_ARGMAX_ORACLE = """
SELECT o_custkey,
       arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey)
         AS best_orderkey,
       CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS best_cents
FROM orders
GROUP BY o_custkey
"""


@register(
    "q61_argmax_order",
    "aggregation",
    "Argmax without a window: max_by/arg_max picks each customer's "
    "highest-value order in ONE aggregation pass (partial+final), where the "
    "window formulation would shuffle-and-sort every row. Ties broken by "
    "orderkey via a composite integer ordering key (cents * 1e8 + orderkey, "
    "exact in int64 at fixture scale) in both engines, so the chosen row is "
    "engine-independent.",
    oracle=_ARGMAX_ORACLE,
)
def q61_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", cents * 100000000 + F.col("o_orderkey"))
        .alias("best_orderkey"),
        F.max(cents).alias("best_cents"),
    )


# --------------------------------------------------------------------------
# Percent-of-total (global window share)
# --------------------------------------------------------------------------

_SHARE_ORACLE = """
WITH n AS (
  SELECT c_nationkey,
         CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS nation_cents
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, nation_cents,
       floor(nation_cents * 1000000.0 / (sum(nation_cents) OVER ()) + 0.5) / 1000000
         AS share
FROM n
"""


@register(
    "q62_percent_of_total",
    "window",
    "Percent-of-total: aggregate to group grain FIRST, then a global "
    "unpartitioned window over the tiny aggregate — the share computation "
    "touches |groups| rows, never the fact table (running OVER () on raw "
    "rows is the classic single-partition bottleneck). The ratio divides "
    "two exact integers, so the double is bit-identical across engines "
    "before floor-rounding.",
    oracle=_SHARE_ORACLE,
)
def q62_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    c = t(spark, sf_dir, "customer")
    n = c.groupBy("c_nationkey").agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("nation_cents")
    )
    total = F.sum("nation_cents").over(W.partitionBy())
    share = F.floor(F.col("nation_cents") * 1000000.0 / total + 0.5) / 1000000
    return n.select("c_nationkey", "nation_cents", share.alias("share"))


# --------------------------------------------------------------------------
# q164: MapType surface — keyed-collection construction, filtering,
# value transformation, re-expansion
# --------------------------------------------------------------------------

_MAP_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), per_user AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_types_all,
         CAST(count(*) FILTER (c >= 3) AS BIGINT) AS n_types_kept
  FROM counts GROUP BY 1
)
SELECT c.user_id, p.n_types_all, p.n_types_kept,
       c.event_type, c.c AS cnt, c.c * 10 AS boosted
FROM counts c JOIN per_user p USING (user_id)
WHERE c.c >= 3
"""


@register(
    "q164_map_functions",
    "scalar",
    "MapType operator surface: per-user event-type counts built into a "
    "real MAP column (map_from_entries over collect_list(struct)), "
    "then map_filter (drop rare types), transform_values (rescale), "
    "map_keys/size introspection, and explosion back to rows — the "
    "keyed-collection round trip feature stores use for per-entity "
    "profiles. All map ops are JVM-side Catalyst expressions. The "
    "output is FLAT rows (maps have no canonical key order, so the "
    "map itself never crosses the hash gate); the oracle states the "
    "same semantics relationally, pinning that Spark's map pipeline "
    "neither drops nor duplicates entries. At 100 TB the map column "
    "is the point: one row per entity with a bounded keyed profile "
    "beats a 20x-taller (entity, key) table for serving lookups.",
    oracle=_MAP_ORACLE,
)
def q164_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    profiles = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("profile")
    )
    kept = profiles.select(
        "user_id",
        F.size(F.map_keys(F.col("profile"))).cast("long").alias("n_types_all"),
        F.map_filter(F.col("profile"), lambda k, v: v >= 3).alias("kept"),
    )
    boosted = kept.select(
        "user_id",
        "n_types_all",
        F.size(F.map_keys(F.col("kept"))).cast("long").alias("n_types_kept"),
        F.transform_values(F.col("kept"), lambda k, v: v * 10).alias("b"),
    ).filter(F.col("n_types_kept") > 0)
    return boosted.select(
        "user_id",
        "n_types_all",
        "n_types_kept",
        F.explode(F.col("b")).alias("event_type", "boosted"),
    ).select(
        "user_id",
        "n_types_all",
        "n_types_kept",
        "event_type",
        # Integral div (round-11): boosted is a count * 10, exact by
        # construction instead of by a below-2^53 magnitude argument.
        idiv(F.col("boosted"), 10).alias("cnt"),
        "boosted",
    )


# --------------------------------------------------------------------------
# q187: skew-safe two-phase top-k per group (shard-local candidates)
# --------------------------------------------------------------------------

_TOPK_SHARDS = 16

_Q187_ORACLE = f"""
SELECT event_type, event_id,
       CAST(round(value * 100) AS BIGINT) AS value_e2, rk
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY round(value * 100) DESC, event_id ASC
         ) AS rk
  FROM events
)
WHERE rk <= {_TOPK_PER_GROUP}
"""


@register(
    "q187_topk_skewsafe",
    "sort",
    f"Top-{_TOPK_PER_GROUP} events per event type via SKEW-SAFE "
    f"two-phase ranking: phase 1 ranks within (type, shard) — shard = "
    f"event_id mod {_TOPK_SHARDS} — keeping each shard's local "
    f"top-{_TOPK_PER_GROUP}; phase 2 re-ranks the <= "
    f"{_TOPK_SHARDS}x{_TOPK_PER_GROUP} survivors per type. Exact by "
    "the shard-superset argument: every global top-k row is its own "
    "shard's top-k, so phase 1 never discards an answer. q46's "
    "rank-then-filter window is the right plan when groups are "
    "numerous and balanced; THIS is the form for few/huge groups "
    "(here: a handful of event types over the whole fact), where a "
    "plain PARTITION BY type window funnels each hot group through "
    "one task — phase 1's "
    f"{_TOPK_SHARDS}x-finer partitioning spreads the heavy sort, and "
    "phase 2 touches survivors only. Exact integer cents with "
    "unique-key tiebreak; oracle is the flat single-window form.",
    oracle=_Q187_ORACLE,
)
def q187_topk_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    shard = F.pmod(F.col("event_id"), F.lit(_TOPK_SHARDS))
    w1 = Window.partitionBy("event_type", shard).orderBy(
        cents.desc(), F.col("event_id").asc()
    )
    survivors = (
        ev.withColumn("_lrk", F.row_number().over(w1))
        .filter(F.col("_lrk") <= _TOPK_PER_GROUP)
        .select("event_type", "event_id", cents.alias("value_e2"))
    )
    w2 = Window.partitionBy("event_type").orderBy(
        F.col("value_e2").desc(), F.col("event_id").asc()
    )
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _TOPK_PER_GROUP)
        .select("event_type", "event_id", "value_e2", "rk")
    )
