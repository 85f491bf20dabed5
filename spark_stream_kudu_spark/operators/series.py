"""Signal-smoothing time-series operators (round-3 session 3).

Complements the q70-q72 family (operators/analytics.py) with the two
standard per-key series transforms a telemetry / feature pipeline runs
after gap analysis:

- ``q73_ewma`` — exponentially weighted moving average over a trailing
  ROWS frame. EWMA is recursive (``s_i = a*v_i + (1-a)*s_{i-1}``), which
  SQL windows can't express directly; the engine folds the trailing
  window's values with a native higher-order function
  (``collect_list`` over the frame + ``F.aggregate``), and the DuckDB
  oracle mirrors it with ``list()`` + ``list_reduce`` — the same
  left-fold with first-element seed, so results are bit-identical.
  Truncating to the last ``_EWMA_WINDOW`` observations bounds state
  (``(1-a)^20`` < 0.1% weight) and is exactly what makes the operator
  stream-liftable with a keyed ring buffer.
- ``q74_linear_interp`` — gap-fill onto the dense daily grid with
  *linear interpolation* between the surrounding observations (the
  TimescaleDB ``interpolate()`` analog; ``q70_gapfill_locf`` is the
  step-function sibling). Single pass: ``lead()`` pairs each
  observation with its successor, then the half-open run
  ``[day, next_day)`` explodes map-side with each generated day
  carrying BOTH endpoints — no dense-grid self-join, no second scan.

Scale notes (100 TB): both operators shuffle once, keyed by their
series key (event_type / user_id), and the per-row fold state is
O(window). A skewed key salts by coarse time bucket exactly as the
q72 docstring prescribes. The interpolation explode is map-side after
the window; generated rows never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround, sql_fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.functions.lineage import pin as _pin

_EWMA_WINDOW = 20  # trailing observations; (1-alpha)^20 ~ 0.08% residual weight
_EWMA_ALPHA = 0.3

_EWMA_ORACLE = f"""
WITH w AS (
  SELECT event_id, event_type, value,
         list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW) AS vals
  FROM events
)
SELECT event_id, event_type, value,
       {sql_fround(
           f"list_reduce(vals, (acc, x) -> {_EWMA_ALPHA}*x + {1 - _EWMA_ALPHA}*acc)", 4
       )} AS ewma
FROM w
"""


@register(
    "q73_ewma",
    "timeseries",
    f"Exponentially weighted moving average per event type: recursive "
    f"smoothing (s = {_EWMA_ALPHA}*v + {1 - _EWMA_ALPHA}*s) is inexpressible "
    f"as a plain window aggregate, so the trailing {_EWMA_WINDOW}-row frame "
    "is collected in frame order and left-folded with a native higher-order "
    "aggregate() — JVM-side, no Python, O(window) per row. The truncated "
    "frame bounds state and is the exact shape that lifts to a streaming "
    "ring buffer (cf. stream_zscore_anomaly_e2e). One window shuffle by "
    "event_type.",
    oracle=_EWMA_ORACLE,
    bench=True,
)
def q73_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_WINDOW - 1), 0)
    )
    vals = F.collect_list("value").over(frame)
    ev = ev.select("event_id", "event_type", "value", vals.alias("vals"))
    a = F.lit(_EWMA_ALPHA)
    # Left fold seeded with the oldest value in the frame — the same
    # fold (accumulator-first, first-element seed) as DuckDB's
    # list_reduce, so the doubles are bit-identical across engines.
    ewma = F.aggregate(
        F.slice(F.col("vals"), F.lit(2), F.size("vals") - 1),
        F.element_at("vals", 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return ev.select(
        "event_id", "event_type", "value", fround(ewma, 4).alias("ewma")
    )


_INTERP_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         {sql_fround("sum(value)", 2)} AS day_rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), runs AS (
  SELECT user_id, day, day_rev,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nday,
         lead(day_rev) OVER (PARTITION BY user_id ORDER BY day) AS nrev
  FROM daily
), grid AS (
  SELECT user_id, day, day_rev, nday, nrev,
         CAST(unnest(generate_series(
             CAST(day AS TIMESTAMP),
             CAST(coalesce(nday - 1, day) AS TIMESTAMP),
             INTERVAL 1 DAY)) AS DATE) AS gday
  FROM runs
)
SELECT user_id, gday AS day,
       CAST(gday <> day AS INT) AS filled,
       {sql_fround(
           "day_rev + coalesce((nrev - day_rev)"
           " * (CAST(date_diff('day', day, gday) AS DOUBLE)"
           " / date_diff('day', day, nday)), 0.0)", 4
       )} AS rev_interp
FROM grid
"""


@register(
    "q74_linear_interp",
    "timeseries",
    "Dense daily revenue series per user with LINEAR interpolation across "
    "gaps (the step-function sibling is q70_gapfill_locf): lead() pairs "
    "each observed day with its successor, the half-open run [day, "
    "next_day) explodes map-side with both endpoint values in-row, and "
    "each gap day computes day_rev + (next_rev - day_rev) * elapsed/span. "
    "One aggregate shuffle + one window shuffle, both keyed by user; "
    "generated rows never shuffle and there is no dense-grid self-join.",
    oracle=_INTERP_ORACLE,
    bench=True,
)
def q74_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(fround(F.sum("value"), 2).alias("day_rev"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    runs = daily.select(
        "user_id",
        "day",
        "day_rev",
        F.lead("day").over(w).alias("nday"),
        F.lead("day_rev").over(w).alias("nrev"),
    )
    grid = runs.select(
        "user_id",
        "day",
        "day_rev",
        "nday",
        "nrev",
        F.explode(
            F.sequence(
                F.col("day"),
                F.coalesce(F.date_sub("nday", 1), F.col("day")),
                F.expr("interval 1 day"),
            )
        ).alias("gday"),
    )
    frac = F.datediff("gday", "day").cast("double") / F.datediff("nday", "day")
    interp = F.col("day_rev") + F.coalesce(
        (F.col("nrev") - F.col("day_rev")) * frac, F.lit(0.0)
    )
    return grid.select(
        "user_id",
        F.col("gday").alias("day"),
        (F.col("gday") != F.col("day")).cast("int").alias("filled"),
        fround(interp, 4).alias("rev_interp"),
    )


# --------------------------------------------------------------------------
# q124: CUSUM change-point statistic (drift detection on daily series)
# --------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS x_e4
  FROM events
  GROUP BY 1, 2
),
ref AS (
  SELECT event_type,
         CAST(CAST(sum(x_e4) AS BIGINT) // CAST(count(*) AS BIGINT) AS BIGINT) AS k_e4
  FROM daily GROUP BY event_type
),
cs AS (
  SELECT d.event_type, d.day, d.x_e4, r.k_e4,
         CAST(sum(d.x_e4 - r.k_e4) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM daily d JOIN ref r USING (event_type)
)
SELECT event_type, day, x_e4,
       CAST(cum - least(0, min(cum) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )) AS BIGINT) AS cusum_e4
FROM cs
"""


@register(
    "q124_cusum_changepoint",
    "series",
    "One-sided CUSUM drift statistic per (event_type, day): "
    "S_t = max(0, S_{t-1} + x_t - k) rewritten as the prefix identity "
    "cumsum - running-min(cumsum) — the recursive reset becomes two "
    "stock window passes over ONE (event_type, day) partitioning, no "
    "recursion, no UDF. k is each type's integer mean daily volume; "
    "a sustained upward level shift makes S_t grow linearly while "
    "noise keeps it near 0 — the sequential monitoring statistic "
    "behind drift alarms. Integer 1e4-scaled end to end, so both "
    "engines agree bit-for-bit.",
    oracle=_CUSUM_ORACLE,
)
def q124_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB: the daily rollup is the only corpus-sized shuffle;
    the CUSUM windows run over |types| x |days| rows. The same prefix
    identity runs incrementally in streaming form (per-type running
    (cum, min_cum) state), composing with the anomaly family."""
    from pyspark.sql import Window

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("long")).alias("x_e4")
    )
    ref = daily.groupBy("event_type").agg(
        F.expr("sum(x_e4) div count(*)").alias("k_e4")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = (
        daily.join(F.broadcast(ref), "event_type")  # bounded: |event_types|
        .withColumn("cum", F.sum(F.col("x_e4") - F.col("k_e4")).over(w))
    )
    # the empty prefix contributes min 0 (S_0 = 0): without it the first
    # rows of a rising series would be flattened to 0 — textbook CUSUM
    # is cum - min(0, running_min(cum)).
    return cs.select(
        "event_type",
        "day",
        "x_e4",
        (F.col("cum") - F.least(F.lit(0), F.min("cum").over(w))).alias(
            "cusum_e4"
        ),
    )


# --------------------------------------------------------------------------
# q140: Holt double-exponential smoothing (level + trend forecast)
# --------------------------------------------------------------------------

# Dyadic smoothing constants: every recursion step is the same short
# sequence of IEEE-double operations in both engines, so the fold is
# bit-identical end to end (and with power-of-two constants the early
# iterates are exactly representable).
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.25

_HOLT_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
  FROM daily
), rec AS (
  SELECT event_type, 1 AS i,
         CAST(cents AS DOUBLE) AS level, CAST(0 AS DOUBLE) AS trend
  FROM seq WHERE i = 1
  UNION ALL
  SELECT s.event_type, s.i,
         {_HOLT_ALPHA} * s.cents + {1 - _HOLT_ALPHA} * (r.level + r.trend),
         {_HOLT_BETA} * (({_HOLT_ALPHA} * s.cents
             + {1 - _HOLT_ALPHA} * (r.level + r.trend)) - r.level)
           + {1 - _HOLT_BETA} * r.trend
  FROM rec r JOIN seq s ON s.event_type = r.event_type AND s.i = r.i + 1
), last AS (
  SELECT event_type, CAST(max(i) AS BIGINT) AS n_obs FROM seq GROUP BY 1
)
SELECT r.event_type, l.n_obs,
       {sql_fround("r.level / 100.0", 4)} AS level_dollars,
       {sql_fround("r.trend / 100.0", 4)} AS trend_dollars,
       {sql_fround("(r.level + r.trend) / 100.0", 4)} AS forecast_dollars
FROM rec r JOIN last l ON r.event_type = l.event_type AND r.i = l.n_obs
"""


@register(
    "q140_holt_forecast",
    "timeseries",
    f"Holt double-exponential smoothing (alpha={_HOLT_ALPHA}, "
    f"beta={_HOLT_BETA}) over per-type daily totals: coupled level+trend "
    "recursion that neither SQL windows nor a single higher-order fold "
    "can express — the grouped-map applyInPandas tier (one Arrow kernel "
    "per series key, sorted fold, two floats of state). The oracle runs "
    "the SAME recursion as a recursive CTE; dyadic smoothing constants "
    "make every step the same short IEEE sequence in both engines, so "
    "the fold is bit-identical without integer scaling. Output: final "
    "level/trend and the one-step-ahead forecast per type. The stream "
    "reduces to |types| x |days| rows before the kernel; per-series "
    "state is O(1) — the operator lifts to applyInPandasWithState with "
    "the same two floats.",
    oracle=_HOLT_ORACLE,
)
def q140_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )

    out_schema = T.StructType(
        [
            T.StructField("event_type", T.StringType()),
            T.StructField("n_obs", T.LongType()),
            T.StructField("level_dollars", T.DoubleType()),
            T.StructField("trend_dollars", T.DoubleType()),
            T.StructField("forecast_dollars", T.DoubleType()),
        ]
    )

    def holt(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("d")
        xs = [float(c) for c in pdf["cents"]]
        level, trend = holt_fold(xs)

        def fr4(v):
            return math.floor(v / 100.0 * 1e4 + 0.5) / 1e4

        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_obs": [len(xs)],
                "level_dollars": [fr4(level)],
                "trend_dollars": [fr4(trend)],
                "forecast_dollars": [fr4(level + trend)],
            }
        )

    return daily.groupBy("event_type").applyInPandas(holt, out_schema)


def holt_fold(xs: list[float]) -> tuple[float, float]:
    """The Holt recursion as a pure fold — seeded (x0, 0), then the
    textbook coupled update. Exactly the operation sequence the oracle's
    recursive CTE runs, so both engines produce bit-identical doubles."""
    level, trend = xs[0], 0.0
    for x in xs[1:]:
        new_level = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (level + trend)
        trend = _HOLT_BETA * (new_level - level) + (1 - _HOLT_BETA) * trend
        level = new_level
    return level, trend


# --------------------------------------------------------------------------
# q183: classical seasonal decomposition (trend / weekly seasonal / residual)
# --------------------------------------------------------------------------

_SEAS_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), t AS (
  SELECT day, cnt,
         CAST(sum(cnt) OVER w AS BIGINT)  AS s7,
         CAST(count(*) OVER w AS BIGINT)  AS n7
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), d AS (
  SELECT day, cnt,
         (s7 * 1000000) // 7 AS trend_e6,
         cnt * 1000000 - (s7 * 1000000) // 7 AS detr_e6,
         CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT) AS wd
  FROM t WHERE n7 = 7
), seas AS (
  SELECT wd, CAST(sum(detr_e6) // count(*) AS BIGINT) AS seasonal_e6
  FROM d GROUP BY wd
)
SELECT d.day, d.cnt,
       CAST(d.trend_e6 AS BIGINT)                 AS trend_e6,
       s.seasonal_e6,
       CAST(d.detr_e6 - s.seasonal_e6 AS BIGINT)  AS resid_e6
FROM d JOIN seas s ON s.wd = d.wd
"""


@register(
    "q183_seasonal_decompose",
    "series",
    "Classical additive seasonal decomposition of the daily event "
    "series: trend = centered 7-row moving average (full windows "
    "only), weekly seasonal = mean detrended value per weekday "
    "(weekday as epoch-day mod 7 — engine-neutral, unlike dayofweek's "
    "differing origins), residual = detrended minus seasonal. All "
    "three components are e6-scaled integers: the only divisions are "
    "integer div by 7 and by the per-weekday count, and BOTH engines "
    "truncate integer division toward zero, so every component is "
    "bit-identical — no float surface anywhere, unlike textbook STL. "
    "The daily rollup is one partial-agg shuffle of the event stream; "
    "the moving-average window runs over |days| rows (calendar-"
    "bounded — thousands of rows even at 100 TB of events, the "
    "deliberate contrast to q181's bucketed fact window), and the "
    "7-row seasonal table broadcasts back. Extends the family: q73 "
    "EWMA, q140 Holt, q129 seasonal-naive eval, q139 autocorrelation.",
    oracle=_SEAS_ORACLE,
)
def q183_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return seasonal_decompose_from_daily(daily)


def seasonal_decompose_from_daily(daily: DataFrame) -> DataFrame:
    """Decompose ANY (day, cnt) daily series — the one-shot rollup
    (q183) or an additively-maintained streaming store
    (stream_seasonal_e2e): plain count addition is the daily-rollup
    merge, so both arrive at the identical series and therefore the
    identical integer-exact components.

    Bounded-window invariant (same contract as two_phase_rowid,
    layout.py): ``w7`` is an unpartitioned ``Window.orderBy`` and
    therefore plans a SinglePartition exchange — but it runs over the
    DAILY ROLLUP, never the event fact, so the single task sees at most
    |days| rows (calendar-bounded: ~36.5k rows for a century — KBs even
    at 100 TB of events). Plan-asserted in tests/test_plans.py::
    test_seasonal_single_partition_windows_are_rollup_only.

    The detrended table ``d`` is consumed twice (the per-weekday
    seasonal aggregate and the final join) and Spark's ReuseExchange
    does NOT dedupe the two subtrees — without a lineage cut the EVENT
    FACT would be scanned and rolled up twice (measured: 2 parquet
    scans in the executed plan). ``d`` is |days| rows, so an eager
    localCheckpoint costs KBs and halves the fact cost at any scale."""
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "cnt",
        F.sum("cnt").over(w7).cast("long").alias("s7"),
        F.count(F.lit(1)).over(w7).cast("long").alias("n7"),
    ).filter(F.col("n7") == 7)
    d = _pin(t.select(
        "day",
        "cnt",
        F.expr("(s7 * 1000000) div 7").cast("long").alias("trend_e6"),
        F.expr("cnt * 1000000 - (s7 * 1000000) div 7")
        .cast("long")
        .alias("detr_e6"),
        F.expr("CAST(datediff(day, DATE '1970-01-01') % 7 AS BIGINT)").alias(
            "wd"
        ),
    ))
    seas = d.groupBy("wd").agg(
        F.expr("sum(detr_e6) div count(*)").cast("long").alias("seasonal_e6")
    )
    return d.join(F.broadcast(seas), "wd").select(  # bounded: 7 weekday rows
        "day",
        "cnt",
        "trend_e6",
        "seasonal_e6",
        (F.col("detr_e6") - F.col("seasonal_e6")).cast("long").alias("resid_e6"),
    )
