"""Temporal join operators: as-of join, range join, correlated scalar
subquery, and RANGE-frame windows.

The reference has no joins at all (SURVEY.md §2.2 — its single pipeline
is one table end-to-end), but a time-series engine whose output is a
keyed time series (`traffic_conditions`, ddl/create_impala_kudu_table.sql:4-13,
consumed as ``ORDER BY as_of_time`` README.md:40) invites exactly these
temporal queries; they are also the canonical "operator Spark lacks"
category the engine must express as compositions of built-ins.

Scale design notes (the point of each implementation):

- **As-of join** is NOT an inequality theta-join (O(n*m) comparisons,
  broadcast-nested-loop in Spark). It is the union-and-carry-forward
  form: union both sides, one shuffle on the key, one sort per
  partition, ``last(..., ignorenulls=True)`` carries the most recent
  right-side row forward. Cost: one shuffle + one sort — survives
  100 TB because it never materializes candidate pairs.
- **Range join** is bucketized: with range length bounded by H, each
  left row is exploded into the (at most 2) H-width time buckets its
  window overlaps and each right row into its single bucket, turning
  the inequality join into an equi-join on (key, bucket) + a residual
  filter. Candidate pairs shrink from |users|^2-ish to near-output
  size; the equi-join shuffles hash-uniformly.
- **Correlated scalar subqueries** decorrelate to a window (or a
  grouped self-join) — the same rewrite Catalyst's
  RewriteCorrelatedScalarSubquery performs; writing the window form
  directly keeps one shuffle and zero joins.
- **RANGE frames** differ from ROWS frames under ties: all peer rows
  with equal order-keys enter the frame together, which is what makes
  the result deterministic for a value-based trailing window.

Cross-engine determinism: every aggregated measure here is summed as
exact integers (cents / 2^20-scaled components), never as doubles —
double summation order differs between Spark partial aggregation and
the DuckDB oracle and can flip comparisons on boundary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

RANGE_JOIN_WINDOW_SEC = 3600  # range-join window length H (1 hour)
TRAILING_DAYS = 90  # RANGE-frame trailing window


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "events")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "orders")


# --------------------------------------------------------------------------
# As-of join
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH v AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id,
       epoch_ms(p.ts) AS purchase_ms,
       v.view_event_id,
       epoch_ms(v.ts) AS view_ms
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@register(
    "q38_asof_join",
    "join",
    "As-of join: each purchase matched to the latest view at-or-before it per "
    "user. Implemented scalably as union + carry-forward (ONE shuffle on "
    "user_id, last(ignorenulls) window) — never as an inequality theta-join. "
    "Ties (same user+ts) resolve to the max view event_id via the sort key, "
    "with no separate dedupe shuffle.",
    oracle=_ASOF_ORACLE,
    bench=True,
)
def q38_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # side=0 sorts view rows before purchase rows at equal ts, giving the
    # inclusive v.ts <= p.ts semantics of ASOF JOIN. Ordering views at
    # the same (user, ts) by event_id ascending makes the carry-forward
    # pick the max-event_id view — the tie rule — without a separate
    # pre-dedupe shuffle: the whole join is ONE exchange on user_id.
    v = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("view_event_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("view_event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = v.unionByName(p)
    return (
        u.withColumn("lv_id", F.last("view_event_id", ignorenulls=True).over(w))
        .withColumn("lv_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.unix_millis("ts").alias("purchase_ms"),
            F.col("lv_id").alias("view_event_id"),
            F.unix_millis("lv_ts").alias("view_ms"),
        )
    )


# --------------------------------------------------------------------------
# Range join (bounded-interval, bucketized)
# --------------------------------------------------------------------------

_RANGE_ORACLE = f"""
WITH s AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
),
e AS (
  SELECT user_id, ts FROM events WHERE event_type = 'error'
)
SELECT s.event_id AS signup_id, s.user_id,
       epoch_ms(s.ts) AS signup_ms,
       count(e.ts) AS n_errors
FROM s LEFT JOIN e
  ON e.user_id = s.user_id
 AND e.ts >= s.ts
 AND e.ts < s.ts + INTERVAL {RANGE_JOIN_WINDOW_SEC} SECOND
GROUP BY s.event_id, s.user_id, s.ts
"""


@register(
    "q39_range_join",
    "join",
    f"Bounded range join: errors within {RANGE_JOIN_WINDOW_SEC}s after each "
    "signup, per user. Bucketized to an equi-join: left rows explode into the "
    "<=2 overlapping H-wide time buckets, right rows into their single bucket, "
    "join on (user, bucket), residual time filter — no theta-join candidate "
    "blowup, hash-uniform shuffle.",
    oracle=_RANGE_ORACLE,
)
def q39_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    h_us = RANGE_JOIN_WINDOW_SEC * 1_000_000  # bucket width in microseconds
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        F.unix_millis("ts").alias("signup_ms"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.unix_micros("ts").alias("e_us")
    )
    s_bucketed = s.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("s_us") / h_us).cast("long"),
                (F.col("s_us") / h_us).cast("long") + 1,
            )
        ),
    )
    e_bucketed = e.withColumn("bucket", (F.col("e_us") / h_us).cast("long"))
    matched = (
        s_bucketed.join(
            e_bucketed,
            (F.col("user_id") == F.col("e_user"))
            & (s_bucketed["bucket"] == e_bucketed["bucket"])
            & (F.col("e_us") >= F.col("s_us"))
            & (F.col("e_us") < F.col("s_us") + h_us),
        )
        .groupBy("signup_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    # Left-join the counts back so signups with zero errors survive.
    return (
        s.join(matched, "signup_id", "left")
        .select(
            "signup_id",
            "user_id",
            "signup_ms",
            F.coalesce(F.col("n_errors"), F.lit(0)).alias("n_errors"),
        )
    )


# --------------------------------------------------------------------------
# Correlated scalar subquery (decorrelated to a window)
# --------------------------------------------------------------------------

_CORR_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE round(o_totalprice * 100) >
      (SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
              / count(*)
       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""


@register(
    "q40_correlated_subquery",
    "filter",
    "Correlated scalar subquery (orders above their customer's average), "
    "decorrelated to a single window aggregation — the rewrite Catalyst's "
    "RewriteCorrelatedScalarSubquery does, written directly: one shuffle, no "
    "join. Prices compared in exact integer cents so partial-agg summation "
    "order can't flip boundary rows between engines.",
    oracle=_CORR_ORACLE,
)
def q40_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cents", cents)
        .withColumn(
            "cust_avg_cents",
            F.sum("cents").over(w).cast("double") / F.count(F.lit(1)).over(w),
        )
        .filter(F.col("cents") > F.col("cust_avg_cents"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# RANGE-frame window (value-based trailing window)
# --------------------------------------------------------------------------

_RANGE_FRAME_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       epoch_ms(o_orderdate) AS order_ms,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
         RANGE BETWEEN {TRAILING_DAYS * 86400} PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS trailing_cents
FROM orders
"""


@register(
    "q41_range_frame",
    "window",
    f"Value-based RANGE frame: trailing {TRAILING_DAYS}-day revenue per "
    "customer ordered by order date. RANGE (not ROWS) so same-date peer "
    "orders enter the frame together — the deterministic semantics for "
    "time-based trailing windows; summed in exact integer cents.",
    oracle=_RANGE_FRAME_ORACLE,
    bench=True,
)
def q41_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-TRAILING_DAYS * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.unix_millis("o_orderdate").alias("order_ms"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .over(w)
        .alias("trailing_cents"),
    )
