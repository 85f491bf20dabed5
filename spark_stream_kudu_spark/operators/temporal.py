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
from spark_stream_kudu_spark.functions.lineage import pin as _pin
from spark_stream_kudu_spark.functions.rounding import idiv

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
                idiv(F.col("s_us"), h_us),
                idiv(F.col("s_us"), h_us) + 1,
            )
        ),
    )
    e_bucketed = e.withColumn("bucket", idiv(F.col("e_us"), h_us))
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


# --------------------------------------------------------------------------
# Gap-based sessionization (batch twin of streaming session_window)
# --------------------------------------------------------------------------

SESSION_GAP_MS = 30 * 60 * 1000  # 30-minute inactivity gap

_SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {SESSION_GAP_MS}
                OR lag(epoch_ms(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_ms) AS start_ms,
       max(ts_ms) AS end_ms,
       max(ts_ms) - min(ts_ms) AS duration_ms
FROM (
  SELECT user_id, ts_ms,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY ts_ms, event_id) AS BIGINT)
             AS session_idx
  FROM flagged
)
GROUP BY user_id, session_idx
"""


@register(
    "q52_sessionize",
    "temporal",
    "Gap-based sessionization in batch: lag() flags a session start after "
    f"{SESSION_GAP_MS // 60000} min of inactivity, a running sum assigns "
    "session ids, then one group-by per (user, session). The batch twin of "
    "q32_session_window. ONE shuffle on user_id serves both window passes "
    "and the aggregation (same partitioning); all timestamps are integer "
    "epoch-millis so engines agree exactly.",
    oracle=_SESSIONIZE_ORACLE,
    bench=True,
)
def q52_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    is_new = F.when(
        F.lag("ts_ms").over(w).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(w) > SESSION_GAP_MS),
        1,
    ).otherwise(0)
    sessions = ev.withColumn(
        "session_idx", F.sum(is_new).over(w)
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


# --------------------------------------------------------------------------
# Funnel analysis (stage-ordered first-touch counts)
# --------------------------------------------------------------------------

_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]

_FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup'   THEN epoch_ms(ts) END) AS t_signup,
         min(CASE WHEN event_type = 'view'     THEN epoch_ms(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click'    THEN epoch_ms(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT CAST(count(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS BIGINT) AS n_signup,
       CAST(count(CASE WHEN t_view  >= t_signup THEN 1 END) AS BIGINT) AS n_view,
       CAST(count(CASE WHEN t_click >= t_view AND t_view >= t_signup THEN 1 END) AS BIGINT)
         AS n_click,
       CAST(count(CASE WHEN t_purchase >= t_click AND t_click >= t_view
                        AND t_view >= t_signup THEN 1 END) AS BIGINT) AS n_purchase
FROM firsts
"""


@register(
    "q53_event_funnel",
    "temporal",
    "First-touch funnel signup->view->click->purchase: one conditional-min "
    "pass per user (single shuffle, partial agg), then stage counts where "
    "each first-touch time is ordered after the previous stage's. The "
    "whole funnel is ONE aggregation over events, not one join per stage.",
    oracle=_FUNNEL_ORACLE,
    bench=True,
)
def q53_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ms = F.unix_millis("ts")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, ms)).alias(f"t_{s}")
            for s in _FUNNEL_STAGES
        ]
    )
    t = {s: F.col(f"t_{s}") for s in _FUNNEL_STAGES}
    reached = [t["signup"].isNotNull()]
    for prev, cur in zip(_FUNNEL_STAGES, _FUNNEL_STAGES[1:]):
        reached.append(reached[-1] & (t[cur] >= t[prev]))
    # NULL comparisons are NULL -> count() skips them, same as the oracle
    return firsts.agg(
        *[
            F.count(F.when(cond, 1)).alias(f"n_{s}")
            for s, cond in zip(_FUNNEL_STAGES, reached)
        ]
    )


# --------------------------------------------------------------------------
# Cohort retention (distinct users active N days after their first day)
# --------------------------------------------------------------------------

_RETENTION_DAYS = 7

_RETENTION_ORACLE = f"""
WITH first_day AS (
  SELECT user_id, min(epoch_ms(ts) // 86400000) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS active_day
  FROM events
)
SELECT f.cohort_day,
       CAST(count(DISTINCT f.user_id) AS BIGINT) AS cohort_size,
       CAST(count(DISTINCT CASE WHEN a.active_day >= f.cohort_day + {_RETENTION_DAYS}
                                THEN a.user_id END) AS BIGINT) AS retained
FROM first_day f
LEFT JOIN activity a ON a.user_id = f.user_id
GROUP BY f.cohort_day
"""


@register(
    "q54_cohort_retention",
    "temporal",
    f"Cohort retention: users grouped by first-active day; retained = still "
    f"active >= {_RETENTION_DAYS} days later. Both sides of the self-join are "
    "pre-aggregated to (user, day) grain before joining (shrink-then-join), "
    "and the join key is user_id — co-partitioned with both aggregations, so "
    "the day arithmetic is integer epoch-day, never date math on doubles.",
    oracle=_RETENTION_ORACLE,
    bench=True,
)
def q54_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    day = idiv(F.unix_millis("ts"), 86400000)
    first_day = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("active_day")).distinct()
    joined = first_day.join(activity, "user_id", "left")
    return joined.groupBy("cohort_day").agg(
        F.count_distinct("user_id").alias("cohort_size"),
        F.count_distinct(
            F.when(
                F.col("active_day") >= F.col("cohort_day") + _RETENTION_DAYS,
                F.col("user_id"),
            )
        ).alias("retained"),
    )


# --------------------------------------------------------------------------
# Multi-resolution rollup (hypertable continuous-aggregate pattern)
# --------------------------------------------------------------------------

_MIN_MS = 60_000
_HOUR_MS = 3_600_000
_DAY_MS = 86_400_000

_ROLLUP_SQL = """
WITH m AS (
  SELECT (epoch_ms(ts) // {m}) * {m} AS bucket_ms, event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT (bucket_ms // {h}) * {h} AS bucket_ms, event_type,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(value_e4) AS BIGINT) AS value_e4
  FROM m GROUP BY 1, 2
),
d AS (
  SELECT (bucket_ms // {d}) * {d} AS bucket_ms, event_type,
         CAST(sum(n_events) AS BIGINT) AS n_events,
         CAST(sum(value_e4) AS BIGINT) AS value_e4
  FROM h GROUP BY 1, 2
)
SELECT '1m' AS resolution, * FROM m
UNION ALL SELECT '1h', * FROM h
UNION ALL SELECT '1d', * FROM d
""".format(m=_MIN_MS, h=_HOUR_MS, d=_DAY_MS)


def _bucket(col, width_ms):
    return (idiv(col, width_ms) * width_ms).cast("long")


@register(
    "q59_multires_rollup",
    "temporal",
    "Hypertable-style continuous aggregate: minute rollup from raw events, "
    "hour rollup re-aggregated FROM the minute level, day from hour — each "
    "level reads its parent's (much smaller) output, never the raw table, "
    "which is what makes multi-resolution dashboards viable at 100 TB. "
    "The minute level is materialized once (localCheckpoint — the in-query "
    "stand-in for persisting each level as its own incrementally-updated "
    "table), so the raw table is scanned exactly once no matter how many "
    "resolutions stack on top. All buckets are integer epoch-millis "
    "arithmetic.",
    oracle=_ROLLUP_SQL,
    bench=True,
)
def q59_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ms = F.unix_millis("ts")
    minute = _pin((
        ev.groupBy(
            _bucket(ms, _MIN_MS).alias("bucket_ms"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_e4"),
        )
    ))
    def up(parent, width):
        return (
            parent.groupBy(
                _bucket(F.col("bucket_ms"), width).alias("bucket_ms"), "event_type"
            ).agg(
                F.sum("n_events").alias("n_events"),
                F.sum("value_e4").alias("value_e4"),
            )
        )
    hour = up(minute, _HOUR_MS)
    day = up(hour, _DAY_MS)
    tag = lambda df, r: df.select(
        F.lit(r).alias("resolution"), "bucket_ms", "event_type", "n_events", "value_e4"
    )
    return tag(minute, "1m").unionAll(tag(hour, "1h")).unionAll(tag(day, "1d"))


# --------------------------------------------------------------------------
# Running distinct count (a window op Spark lacks natively)
# --------------------------------------------------------------------------

_RUNNING_DISTINCT_ORACLE = """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
       CAST(count(DISTINCT event_type) OVER w AS BIGINT) AS n_types_seen
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "q64_running_distinct",
    "window",
    "Running DISTINCT count per user — an operator Spark's window engine "
    "refuses natively (DISTINCT aggregates are unsupported OVER a window), "
    "expressed as the idiomatic composition size(collect_set() OVER ...). "
    "State per row is the distinct set — bounded by the DISTINCT-KEY "
    "domain (event_type: 5 here), NOT the row count; on a high-cardinality "
    "key the expanding frame degrades to O(n) state per row, so use the "
    "RANGE-bounded variant (q64b_running_distinct_bounded) or an HLL "
    "sketch there. One shuffle on user_id.",
    oracle=_RUNNING_DISTINCT_ORACLE,
)
def q64_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types_seen"),
    )


# --------------------------------------------------------------------------
# Interval coalescing (merge overlapping intervals per key)
# --------------------------------------------------------------------------

_COALESCE_HOLD_MS = 1_800_000  # each event opens a 30-minute interval

_COALESCE_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_ms(ts) AS s,
         epoch_ms(ts) + {_COALESCE_HOLD_MS} AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                  PARTITION BY user_id ORDER BY s ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
)
SELECT user_id,
       CAST(min(s) AS BIGINT) AS start_ms,
       CAST(max(e) AS BIGINT) AS end_ms,
       CAST(count(*) AS BIGINT) AS n_events
FROM islands
GROUP BY user_id, island
"""


@register(
    "q108_interval_coalesce",
    "temporal",
    "Interval coalescing (the temporal-database PACK operator): each "
    "event opens a 30-minute interval; overlapping intervals per user "
    "merge into maximal islands, reported as (start, end, contributing "
    "events). Gaps-and-islands via ONE ordered window pass — a row "
    "starts a new island iff its start exceeds the running max end of "
    "all predecessors, island id is the running flag sum, then one "
    "grouped rollup on the SAME user partitioning (single exchange). "
    "Generalizes gap sessionization (q52 is the special case where "
    "every interval has equal length and overlap means gap < hold); "
    "the uptime/coverage-merging kernel for SLA and presence analytics.",
    oracle=_COALESCE_ORACLE,
)
def q108_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    s = F.unix_millis("ts")
    iv = ev.select(
        "user_id",
        "event_id",
        s.alias("s"),
        (s + F.lit(_COALESCE_HOLD_MS)).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("s").asc(), F.col("event_id").asc())
    prior_max_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(prior_max_end, F.lit(-1))).cast("int"),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("s").alias("start_ms"),
        F.max("e").alias("end_ms"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("island")


# --------------------------------------------------------------------------
# Interval unpacking: daily coverage minutes (time-in-app per user-day)
# --------------------------------------------------------------------------

_DAY_MS = 86_400_000

_COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id, event_id, epoch_ms(ts) AS s,
         epoch_ms(ts) + {_COALESCE_HOLD_MS} AS e
  FROM events
),
flagged AS (
  SELECT user_id, event_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                  PARTITION BY user_id ORDER BY s ASC, event_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s ASC, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flagged
),
merged AS (
  SELECT user_id, min(s) AS ms, max(e) AS me
  FROM islands GROUP BY user_id, island
),
days AS (
  SELECT user_id, ms, me,
         unnest(generate_series(CAST(ms // {_DAY_MS} AS BIGINT),
                                CAST((me - 1) // {_DAY_MS} AS BIGINT))) AS day_no
  FROM merged
)
SELECT user_id, CAST(day_no AS BIGINT) AS day_no,
       CAST(sum(least(me, (day_no + 1) * {_DAY_MS}) -
                greatest(ms, day_no * {_DAY_MS})) AS BIGINT) AS covered_ms
FROM days
GROUP BY 1, 2
"""


@register(
    "q109_daily_coverage",
    "temporal",
    "Interval UNPACK: the coalesced presence islands (q108) split at UTC "
    "day boundaries and clipped, summing covered milliseconds per "
    "(user, day) — daily time-in-app, the engagement metric DAU counts "
    "cannot see. Islands first (so overlaps never double-count), then a "
    "map-side sequence-explode over each island's day span and a "
    "partially-aggregated rollup; the explode multiplies rows only by "
    "days-per-island (bounded), never shuffles unaggregated.",
    oracle=_COVERAGE_ORACLE,
)
def q109_daily_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    merged = q108_interval_coalesce(spark, sf_dir).select(
        "user_id", F.col("start_ms").alias("ms"), F.col("end_ms").alias("me")
    )
    day_no = F.explode(
        F.sequence(
            idiv(F.col("ms"), _DAY_MS),
            idiv(F.col("me") - 1, _DAY_MS),
        )
    ).alias("day_no")
    days = merged.select("user_id", "ms", "me", day_no)
    covered = F.least(F.col("me"), (F.col("day_no") + 1) * _DAY_MS) - F.greatest(
        F.col("ms"), F.col("day_no") * _DAY_MS
    )
    return days.groupBy("user_id", "day_no").agg(
        F.sum(covered).alias("covered_ms")
    )


# --------------------------------------------------------------------------
# Forward as-of join (next event at-or-after each probe)
# --------------------------------------------------------------------------

_ASOF_FWD_ORACLE = """
WITH v AS (
  SELECT user_id, ts, min(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id,
       epoch_ms(p.ts) AS purchase_ms,
       v.view_event_id,
       epoch_ms(v.ts) AS view_ms
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
"""


@register(
    "q132_asof_forward",
    "join",
    "FORWARD as-of join: each purchase matched to the earliest view "
    "at-or-after it per user (the post-event next-touch lookup — q38's "
    "mirror). Same one-exchange union shape, but the carry runs forward: "
    "first(ignorenulls) over (current row .. unbounded following), with "
    "purchases sorted before same-timestamp views so the at-or-after "
    "inclusive bound holds and ties resolve to the min view event_id via "
    "the sort key — no inequality theta-join, no pre-dedupe shuffle.",
    oracle=_ASOF_FWD_ORACLE,
)
def q132_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # side=0 sorts purchase rows before view rows at equal ts (inclusive
    # v.ts >= p.ts), and same-(user, ts) views order by event_id
    # ascending so the forward-first picks the min id — the tie rule —
    # inside the single user_id exchange.
    p = purchases.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("view_event_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    v = views.select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("view_event_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    u = p.unionByName(v)
    return (
        u.withColumn("nv_id", F.first("view_event_id", ignorenulls=True).over(w))
        .withColumn("nv_ts", F.first("view_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.unix_millis("ts").alias("purchase_ms"),
            F.col("nv_id").alias("view_event_id"),
            F.unix_millis("nv_ts").alias("view_ms"),
        )
    )
