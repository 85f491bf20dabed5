"""Distribution-drift monitoring, affinity mining, and series
diagnostics (round-3 sessions 4+).

A 100 TB training-data pipeline re-ingests sources continuously; the
operators here answer "did the data change shape?" before a bad batch
poisons a training run — the monitoring layer the reference's static
demo pipeline (src/main/python/kafka_to_kudu.py:25-53) has no analog
for, expressed Spark-first:

- Drift monitors: ``q125_psi_drift`` (PSI over fixed-edge bins with
  Laplace smoothing), ``q126_chisq_drift`` (categorical
  goodness-of-fit), ``q127_ks_drift`` (two-sample KS via one
  RANGE-frame ECDF window) — each with a streaming twin in
  streaming/drift.py sharing its tagging + finalize helpers.
- Affinity / value analytics: ``q128_brand_affinity`` (market-basket
  lift with basket-local pair expansion), ``q133_decayed_leaderboard``
  (exact dyadic half-life weights), ``q144_rfm_segmentation``
  (recency/frequency/monetary quintiles).
- Series diagnostics: ``q129_seasonal_naive_eval`` (forecast
  backtest), ``q139_autocorrelation`` and ``q141_cross_correlation``
  (within- and cross-series structure from DECIMAL(38,0) exact
  moments), ``q142_mutual_information`` (non-linear dependence),
  ``q143_motif_discovery`` (closest window pair, exact integer
  distances), ``q145_zipf_fit`` (vocabulary power-law),
  ``q146_fano_factor`` (daily-count burstiness),
  ``q147_vocab_drift`` (set-based vocabulary churn + Jaccard), and
  ``q148_behavior_entropy`` (per-user Shannon diversity).

Determinism contract (the house rule, cf. statistics.py): every
aggregate that feeds a float expression is an exact integer (counts,
cents-quantized sums), so both engines run float math once on
bit-identical operands; transcendental outputs (ln in PSI/MI/Zipf, the
ratio sums in MAPE) follow the text_domain_kl precedent — fround(6)
absorbs accumulation ulps, and the values are never decimal tie
points. Every query here is additionally pinned against a from-scratch
plain-Python computation in tests/test_drift.py.

Scale notes (100 TB): every operator reduces the fact stream to a tiny
rollup (|types| x |bins| counts, |types| x |days| cents totals,
per-user aggregates, or the |vocab| table) in one partially-aggregated
shuffle before any expensive step; the quadratics (motif windows,
basket pairs) live on row-local arrays bounded by series length or
basket size, never on row counts. Nothing moves a fact table more
than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.lineage import pin as _pin
from spark_stream_kudu_spark.functions.ranks import (
    exact_ntile,
    two_phase_order_stats,
)
from spark_stream_kudu_spark.functions.rounding import fround, idiv, sql_fround
from spark_stream_kudu_spark.functions.textutil import sql_tokens as _sql_tokens
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

# Two-phase rank bucketing constants (see functions/ranks.py): domain-
# constant coarse strides over the rank metric plus a key stride that
# splits unbounded tie masses (the freq = 1 Zipf mass, zero-spend
# users) across parallel sub-buckets.
_RANK_CENT_STRIDE = 100_000
_RANK_FREQ_STRIDE = 64
_RANK_KEY_STRIDE = 4096


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# q125: Population Stability Index (reference vs current period)
# --------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16"  # first half = reference, second = current
_PSI_BINS = 10
_PSI_BIN_CENTS = 5000  # fixed-width 50.00 bins over [0, 500)

_PSI_ORACLE = f"""
WITH tagged AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS period,
         least(CAST(floor(value * 100 + 0.5) AS BIGINT) // {_PSI_BIN_CENTS},
               {_PSI_BINS - 1}) AS bin
  FROM events
), counts AS (
  SELECT event_type, period, bin, count(*) AS c
  FROM tagged GROUP BY 1, 2, 3
), grid AS (
  SELECT t.event_type, b.bin
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(0, {_PSI_BINS - 1})) AS bin) b
), filled AS (
  SELECT g.event_type, g.bin,
         CAST(coalesce(max(c) FILTER (period = 0), 0) AS BIGINT) AS ca,
         CAST(coalesce(max(c) FILTER (period = 1), 0) AS BIGINT) AS cb
  FROM grid g LEFT JOIN counts c
    ON g.event_type = c.event_type AND g.bin = c.bin
  GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM filled GROUP BY 1
)
SELECT f.event_type, t.na AS n_ref, t.nb AS n_cur,
       {sql_fround(
           "sum(((f.cb + 1.0) / (t.nb + " + str(_PSI_BINS) + ")"
           " - (f.ca + 1.0) / (t.na + " + str(_PSI_BINS) + "))"
           " * ln(((f.cb + 1.0) / (t.nb + " + str(_PSI_BINS) + "))"
           " / ((f.ca + 1.0) / (t.na + " + str(_PSI_BINS) + "))))", 6)} AS psi
FROM filled f JOIN totals t ON f.event_type = t.event_type
GROUP BY 1, 2, 3
"""


@register(
    "q125_psi_drift",
    "drift",
    "Population Stability Index per event type: cents-quantized values "
    f"land in {_PSI_BINS} fixed-width bins (fixed edges — no data-dependent "
    "quantile edges, so reference and current bin identically), Laplace +1 "
    "smoothing keeps empty bins finite, PSI = sum((pb-pa)*ln(pb/pa)) over "
    "the dense type x bin grid. The event stream reduces to |types|x|bins| "
    "integer counts in one partially-aggregated shuffle; the PSI fold runs "
    "over that tiny grid. The reference period's counts are exactly the "
    "kind of re-aggregatable partial a daily monitoring job persists.",
    oracle=_PSI_ORACLE,
)
def q125_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    counts = psi_tag_columns(ev).groupBy("event_type", "period", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    return psi_from_counts(counts)


def psi_tag_columns(df: DataFrame) -> DataFrame:
    """Project a raw events frame to (event_type, period, bin) with the
    canonical split/bin rules — shared by the batch query and the
    streaming twin's per-batch partials so the two can never diverge."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return df.select(
        "event_type",
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 0)
        .otherwise(1)
        .alias("period"),
        F.least(cents / F.lit(_PSI_BIN_CENTS), F.lit(_PSI_BINS - 1))
        .cast("long")
        .alias("bin"),
    )


def psi_from_counts(counts: DataFrame) -> DataFrame:
    """Finalize PSI from a (event_type, period, bin, c) count table —
    the re-aggregatable partial both the batch query and the streaming
    sink produce. Densifies to the full type x bin grid (empty bins
    still contribute through the Laplace smoothing), then folds."""
    grid = (
        counts.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_PSI_BINS - 1))).alias("bin"),
        )
    )
    filled = (
        grid.join(counts, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(F.max(F.when(F.col("period") == 0, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("ca"),
            F.coalesce(F.max(F.when(F.col("period") == 1, F.col("c"))), F.lit(0))
            .cast("long")
            .alias("cb"),
        )
    )
    wt = Window.partitionBy("event_type")
    na = F.sum("ca").over(wt)
    nb = F.sum("cb").over(wt)
    pa = (F.col("ca") + F.lit(1.0)) / (na + F.lit(_PSI_BINS))
    pb = (F.col("cb") + F.lit(1.0)) / (nb + F.lit(_PSI_BINS))
    per_bin = filled.select(
        "event_type",
        na.cast("long").alias("n_ref"),
        nb.cast("long").alias("n_cur"),
        ((pb - pa) * F.log(pb / pa)).alias("contrib"),
    )
    return per_bin.groupBy("event_type", "n_ref", "n_cur").agg(
        fround(F.sum("contrib"), 6).alias("psi")
    )


# --------------------------------------------------------------------------
# q126: chi-square goodness-of-fit on the event-type mix
# --------------------------------------------------------------------------

_CHISQ_ORACLE = f"""
WITH counts AS (
  SELECT event_type,
         CAST(count(*) FILTER (ts < TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS ca,
         CAST(count(*) FILTER (ts >= TIMESTAMP '{_DRIFT_SPLIT}') AS BIGINT) AS cb
  FROM events GROUP BY 1
), totals AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM counts
)
SELECT c.event_type,
       c.cb AS n_observed,
       {sql_fround("(c.ca * 1.0 / t.na) * t.nb", 4)} AS n_expected,
       CASE WHEN c.ca = 0 THEN NULL ELSE {sql_fround(
           "(c.cb - (c.ca * 1.0 / t.na) * t.nb)"
           " * (c.cb - (c.ca * 1.0 / t.na) * t.nb)"
           " / ((c.ca * 1.0 / t.na) * t.nb)", 6)} END AS chisq_contrib,
       CAST(CASE WHEN c.ca = 0 THEN 1 ELSE 0 END AS BIGINT) AS novel
FROM counts c CROSS JOIN totals t
"""


@register(
    "q126_chisq_drift",
    "drift",
    "Chi-square goodness-of-fit of the current period's event-type mix "
    "against the reference period's proportions: expected count = reference "
    "share x current total, contribution = (O-E)^2/E per category. One "
    "partially-aggregated count shuffle over |types| groups; the totals row "
    "is a broadcastable scalar. The per-category contributions are the "
    "monitoring artifact (which category drifted), and their sum against a "
    "critical value is the alert bit.",
    oracle=_CHISQ_ORACLE,
)
def q126_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = F.lit(_DRIFT_SPLIT).cast("timestamp")
    counts = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("ts") < split, 1)).alias("ca"),
        F.count(F.when(F.col("ts") >= split, 1)).alias("cb"),
    )
    return chisq_from_counts(counts)


def chisq_from_counts(counts: DataFrame) -> DataFrame:
    """Finalize the chi-square contributions from a (event_type, ca, cb)
    category-count table — the re-aggregatable partial both the batch
    query and the streaming twin's additive store produce.

    A category absent from the reference period (ca=0) has expected=0,
    where (O-E)^2/E is undefined — and it is exactly the case a drift
    monitor must surface, so it gets an explicit ``novel`` flag and a
    NULL contribution (deterministic in both engines; DuckDB would
    otherwise return inf where Spark returns NULL)."""
    wall = Window.partitionBy()
    na = F.sum("ca").over(wall)
    nb = F.sum("cb").over(wall)
    expected = (F.col("ca") * F.lit(1.0) / na) * nb
    dev = F.col("cb") - expected
    return counts.select(
        "event_type",
        F.col("cb").alias("n_observed"),
        fround(expected, 4).alias("n_expected"),
        F.when(F.col("ca") > 0, fround(dev * dev / expected, 6)).alias(
            "chisq_contrib"
        ),
        (F.col("ca") == 0).cast("bigint").alias("novel"),
    )


# --------------------------------------------------------------------------
# q127: two-sample Kolmogorov-Smirnov statistic
# --------------------------------------------------------------------------

_KS_ORACLE = f"""
WITH tagged AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS is_b
  FROM events
), cum AS (
  SELECT event_type, cents,
         CAST(sum(is_a) OVER (PARTITION BY event_type ORDER BY cents
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
         CAST(sum(is_b) OVER (PARTITION BY event_type ORDER BY cents
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
         CAST(sum(is_a) OVER (PARTITION BY event_type) AS BIGINT) AS na,
         CAST(sum(is_b) OVER (PARTITION BY event_type) AS BIGINT) AS nb
  FROM tagged
)
SELECT event_type, max(na) AS n_ref, max(nb) AS n_cur,
       {sql_fround(
           "max(abs(cum_a * 1.0 / na - cum_b * 1.0 / nb))", 6)} AS ks_stat
FROM cum GROUP BY 1
"""


@register(
    "q127_ks_drift",
    "drift",
    "Two-sample Kolmogorov-Smirnov statistic per event type: union both "
    "periods' cents-quantized values with 0/1 sample tags, one RANGE-frame "
    "cumulative sum per tag gives both ECDFs at every observed value (the "
    "RANGE frame absorbs ties — both engines see the CDF *after* all equal "
    "values), KS = max |F_a - F_b|. One window shuffle by event type; at "
    "scale the per-type value stream would pre-aggregate to (type, cents, "
    "tag counts) first — same one-shuffle shape, smaller window input.",
    oracle=_KS_ORACLE,
)
def q127_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    tagged = ks_tag_columns(_events(spark, sf_dir))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = tagged.select(
        "event_type",
        F.sum("is_a").over(wcum).alias("cum_a"),
        F.sum("is_b").over(wcum).alias("cum_b"),
        F.sum("is_a").over(wall).alias("na"),
        F.sum("is_b").over(wall).alias("nb"),
    )
    gap = F.abs(
        F.col("cum_a") * F.lit(1.0) / F.col("na")
        - F.col("cum_b") * F.lit(1.0) / F.col("nb")
    )
    return cum.groupBy("event_type").agg(
        F.max("na").alias("n_ref"),
        F.max("nb").alias("n_cur"),
        fround(F.max(gap), 6).alias("ks_stat"),
    )


def ks_tag_columns(df: DataFrame) -> DataFrame:
    """Project a raw events frame to (event_type, cents, is_a, is_b) with
    the canonical split/quantization rules — shared by the batch query
    and the streaming twin's per-batch partials."""
    split = F.lit(_DRIFT_SPLIT).cast("timestamp")
    return df.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.when(F.col("ts") < split, 1).otherwise(0).alias("is_a"),
        F.when(F.col("ts") < split, 0).otherwise(1).alias("is_b"),
    )


def ks_from_value_counts(counts: DataFrame) -> DataFrame:
    """Finalize KS from a (event_type, cents, a, b) value histogram —
    the pre-aggregated scale form (ECDFs only change at distinct
    values, so this is value-identical to the per-row finalize)."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("a").over(wcum).alias("cum_a"),
        F.sum("b").over(wcum).alias("cum_b"),
        F.sum("a").over(wall).alias("na"),
        F.sum("b").over(wall).alias("nb"),
    )
    gap = F.abs(
        F.col("cum_a") * F.lit(1.0) / F.col("na")
        - F.col("cum_b") * F.lit(1.0) / F.col("nb")
    )
    return cum.groupBy("event_type").agg(
        F.max("na").alias("n_ref"),
        F.max("nb").alias("n_cur"),
        fround(F.max(gap), 6).alias("ks_stat"),
    )


# --------------------------------------------------------------------------
# q128: market-basket brand affinity (support + lift)
# --------------------------------------------------------------------------

_AFFINITY_MIN_PAIR = 5

_AFFINITY_ORACLE = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), marginals AS (
  SELECT brand, CAST(count(*) AS BIGINT) AS n_brand FROM baskets GROUP BY 1
), total AS (
  SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM baskets
), pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, CAST(count(*) AS BIGINT) AS n_pair
  FROM baskets a JOIN baskets b
    ON a.okey = b.okey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING count(*) >= {_AFFINITY_MIN_PAIR}
)
SELECT p.brand_a, p.brand_b, p.n_pair,
       {sql_fround(
           "(p.n_pair * 1.0 * t.n_orders) / (ma.n_brand * 1.0 * mb.n_brand)",
           6)} AS lift
FROM pairs p
JOIN marginals ma ON p.brand_a = ma.brand
JOIN marginals mb ON p.brand_b = mb.brand
CROSS JOIN total t
"""


@register(
    "q128_brand_affinity",
    "drift",
    "Market-basket affinity mining: the lineitem x part join (part "
    "broadcasts) groups into one sorted distinct-brand array per order — "
    "a single shuffle keyed on the order key — then pairs expand "
    "basket-locally from the array (bounded by (brands per order)^2, "
    "classic market-basket, never corpus-quadratic; no self-join, no "
    f"sort-merge). Support floor {_AFFINITY_MIN_PAIR}; lift = "
    "P(a,b)/(P(a)P(b)) from integer counts with the |brands|-row "
    "marginals broadcast back onto the pair table.",
    oracle=_AFFINITY_ORACLE,
)
def q128_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    grouped = _pin(
        # part is entity-scale: un-hinted (stats/AQE decide).
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .groupBy("okey")
        .agg(F.array_sort(F.collect_set("brand")).alias("brands"))
        # The basket table feeds marginals, the order total AND the
        # pair expansion; ReuseExchange does not dedupe the subtrees,
        # so without the cut the lineitem x part join ran 4x
        # (measured: 4 scans of each). |orders| rows — cheap to pin.
    )
    marginals = grouped.select(F.explode("brands").alias("brand")).groupBy(
        "brand"
    ).agg(F.count(F.lit(1)).alias("n_brand"))
    total = grouped.agg(F.count(F.lit(1)).alias("n_orders"))
    # Basket-local pair expansion: for each i, pair brands[i] with every
    # later element of the sorted array (brand_a < brand_b by construction).
    pair_expr = F.expr(
        "flatten(transform(brands, (x, i) -> "
        "transform(slice(brands, i + 2, size(brands)), "
        "y -> struct(x AS brand_a, y AS brand_b))))"
    )
    pairs = (
        grouped.select(F.explode(pair_expr).alias("p"))
        .select("p.brand_a", "p.brand_b")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _AFFINITY_MIN_PAIR)
    )
    ma = marginals.select(
        F.col("brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    mb = marginals.select(
        F.col("brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ma), "brand_a")  # bounded: |brands| marginals
        .join(F.broadcast(mb), "brand_b")  # bounded: |brands| marginals
        .join(F.broadcast(total))  # bounded: 1-row total
        .select(
            "brand_a",
            "brand_b",
            "n_pair",
            fround(
                (F.col("n_pair") * F.lit(1.0) * F.col("n_orders"))
                / (F.col("n_a") * F.lit(1.0) * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# q129: seasonal-naive forecast backtest (MAE / MAPE)
# --------------------------------------------------------------------------

_SEASON_DAYS = 7

_FORECAST_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), joined AS (
  SELECT cur.event_type, cur.d, cur.cents AS actual, prev.cents AS forecast
  FROM daily cur JOIN daily prev
    ON cur.event_type = prev.event_type AND cur.d = prev.d + {_SEASON_DAYS}
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       {sql_fround("sum(abs(actual - forecast)) / count(*) / 100.0", 4)} AS mae,
       {sql_fround("sum(abs(actual - forecast) * 1.0 / actual) / count(*)", 6)}
         AS mape
FROM joined GROUP BY 1
"""


@register(
    "q129_seasonal_naive_eval",
    "drift",
    "Forecast-accuracy backtest: the seasonal-naive forecast (same weekday "
    f"last week, lag {_SEASON_DAYS} days) for per-type daily totals, scored "
    "with MAE and MAPE. Daily totals are cents-quantized BIGINTs — exact "
    "under any distributed merge order — so the calendar self-join (an "
    "equi-join on (type, day-7); missing days simply don't match, in both "
    "engines) compares identical integers, and only the final MAE/MAPE "
    "division is float. The event stream reduces to |types| x |days| rows "
    "in one partially-aggregated shuffle before any join; at 100 TB the "
    "daily table is the persisted monitoring artifact and the backtest "
    "never rescans the raw stream.",
    oracle=_FORECAST_ORACLE,
)
def q129_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    cur = daily.select(
        "event_type", "d", F.col("cents").alias("actual")
    )
    prev = daily.select(
        F.col("event_type").alias("et_p"),
        (F.col("d") + F.lit(_SEASON_DAYS)).alias("d_p"),
        F.col("cents").alias("forecast"),
    )
    joined = cur.join(
        prev, (cur.event_type == prev.et_p) & (cur.d == prev.d_p)
    )
    err = F.abs(F.col("actual") - F.col("forecast"))
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        fround(F.sum(err) / F.count(F.lit(1)) / F.lit(100.0), 4).alias("mae"),
        fround(
            F.sum(err * F.lit(1.0) / F.col("actual")) / F.count(F.lit(1)), 6
        ).alias("mape"),
    )


# --------------------------------------------------------------------------
# q133: exponentially-decayed leaderboard (dyadic weights, pure integer)
# --------------------------------------------------------------------------

_DECAY_ASOF = "2024-01-31"  # scoring instant (end of the fixture month)
_DECAY_HALFLIFE_DAYS = 7
_DECAY_MAX_K = 4  # floor(30 / 7) — weights span 2^0 .. 2^-4
_DECAY_TOPK = 20

_DECAY_ORACLE = f"""
WITH scored AS (
  SELECT user_id,
         CAST(sum(
           CAST(1 AS BIGINT) << CAST({_DECAY_MAX_K} - least(
             date_diff('day', CAST(ts AS DATE), DATE '{_DECAY_ASOF}')
               // {_DECAY_HALFLIFE_DAYS},
             {_DECAY_MAX_K}) AS INT)
         ) AS BIGINT) AS score_q,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT user_id, n_events, score_q,
       score_q / {2 ** _DECAY_MAX_K}.0 AS decayed_score
FROM scored
ORDER BY score_q DESC, user_id ASC
LIMIT {_DECAY_TOPK}
"""


@register(
    "q133_decayed_leaderboard",
    "drift",
    f"Exponentially time-decayed activity leaderboard: each event weighs "
    f"2^-k where k = floor(age_days / {_DECAY_HALFLIFE_DAYS}) half-lives at "
    f"the scoring instant, capped at {_DECAY_MAX_K}. The decay weights are "
    f"dyadic rationals, so scores accumulate as EXACT integers in units of "
    f"2^-{_DECAY_MAX_K} (score_q) — merge-order-invariant like every "
    "integer partial in this engine, with the float score derived only at "
    "presentation (an exact power-of-two division, bit-identical in both "
    "engines). One partially-aggregated shuffle over |users| groups + the "
    f"top-{_DECAY_TOPK} sort with a deterministic (score, user_id) "
    "tie-break. The recency-weighted trending pattern without any "
    "transcendental exp() in the aggregate.",
    oracle=_DECAY_ORACLE,
)
def q133_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    age_days = F.datediff(
        F.lit(_DECAY_ASOF).cast("date"), F.col("ts").cast("date")
    )
    # Integral div (round-11): the oracle's `// 7` truncates toward
    # zero; the old float floor() rounded down — identical on the
    # fixture's non-negative ages, and idiv now matches the declared
    # oracle semantics on the FULL domain (a post-asof timestamp no
    # longer diverges) while staying exact past 2^53.
    k = F.least(
        idiv(age_days, _DECAY_HALFLIFE_DAYS), F.lit(_DECAY_MAX_K).cast("long")
    )
    shifted = ev.select(
        "user_id", (F.lit(_DECAY_MAX_K) - k).cast("int").alias("shift")
    )
    weight_q = F.expr("shiftleft(CAST(1 AS BIGINT), shift)")
    scored = shifted.groupBy("user_id").agg(
        F.sum(weight_q).alias("score_q"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        scored.select(
            "user_id",
            "n_events",
            "score_q",
            (F.col("score_q") / F.lit(float(2 ** _DECAY_MAX_K))).alias(
                "decayed_score"
            ),
        )
        .orderBy(F.desc("score_q"), F.asc("user_id"))
        .limit(_DECAY_TOPK)
    )


# --------------------------------------------------------------------------
# q139: autocorrelation function of daily totals (lags 1..7)
# --------------------------------------------------------------------------

_ACF_MAX_LAG = 7

_ACF_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), lags AS (
  SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag
), pairs AS (
  SELECT cur.event_type, l.lag,
         CAST(prev.cents AS DECIMAL(38,0)) AS x,
         CAST(cur.cents AS DECIMAL(38,0)) AS y
  FROM daily cur
  JOIN lags l ON true
  JOIN daily prev
    ON prev.event_type = cur.event_type AND cur.d = prev.d + l.lag
), moments AS (
  SELECT event_type, lag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, CAST(n AS BIGINT) AS n_pairs,
       {sql_fround(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           "   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)} AS acf
FROM moments
"""


@register(
    "q139_autocorrelation",
    "drift",
    f"Autocorrelation function of per-type daily totals at lags "
    f"1..{_ACF_MAX_LAG} — the seasonality diagnostic that justifies "
    "q129's seasonal-naive lag choice (a weekly cycle shows as an ACF "
    "peak at lag 7). Daily totals are cents-exact BIGINTs; each lag's "
    "Pearson correlation finalizes from DECIMAL(38,0) moments over the "
    "lag-joined pairs (the q75 discipline: exact integer sufficient "
    "statistics, float once at the end). The event stream reduces to "
    "|types| x |days| rows before the lag expansion, so the "
    f"{_ACF_MAX_LAG}-way join touches only the tiny daily table.",
    oracle=_ACF_ORACLE,
)
def q139_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    dec = "decimal(38,0)"
    cur = daily.select(
        "event_type", "d", F.col("cents").cast(dec).alias("y")
    ).withColumn("lag", F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))))
    prev = daily.select(
        F.col("event_type").alias("et_p"),
        F.col("d").alias("d_p"),
        F.col("cents").cast(dec).alias("x"),
    )
    pairs = cur.join(
        prev,
        (cur.event_type == prev.et_p) & (cur.d == prev.d_p + cur.lag),
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov_n = nd * F.col("sxy").cast("double") - sxd * syd
    varx_n = nd * F.col("sxx").cast("double") - sxd * sxd
    vary_n = nd * F.col("syy").cast("double") - syd * syd
    return m.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        fround(cov_n / F.sqrt(varx_n * vary_n), 6).alias("acf"),
    )


# --------------------------------------------------------------------------
# q141: cross-correlation (lead-lag) between event-type daily series
# --------------------------------------------------------------------------

_XCORR_MAX_LAG = 3

_XCORR_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), lags AS (
  SELECT unnest(generate_series(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG})) AS lag
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         CAST(a.cents AS DECIMAL(38,0)) AS x,
         CAST(b.cents AS DECIMAL(38,0)) AS y
  FROM daily a
  JOIN lags l ON true
  JOIN daily b
    ON b.event_type > a.event_type AND b.d = a.d + l.lag
), moments AS (
  SELECT type_a, type_b, lag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY 1, 2, 3
)
SELECT type_a, type_b, lag, CAST(n AS BIGINT) AS n_pairs,
       {sql_fround(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           "   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)} AS xcorr
FROM moments
"""


@register(
    "q141_cross_correlation",
    "drift",
    f"Lead-lag cross-correlation between every unordered pair of "
    f"event-type daily series at lags -{_XCORR_MAX_LAG}..{_XCORR_MAX_LAG}: "
    "corr(a_t, b_(t+lag)) tells which series LEADS which (the peak lag's "
    "sign) — the causal-screening diagnostic beside q139's "
    "within-series ACF. Same discipline: cents-exact daily totals, "
    "DECIMAL(38,0) moments per (pair, lag), one float finalize. The "
    "lag-pair join touches only the |types| x |days| rollup.",
    oracle=_XCORR_ORACLE,
)
def q141_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    dec = "decimal(38,0)"
    a = daily.select(
        F.col("event_type").alias("type_a"),
        "d",
        F.col("cents").cast(dec).alias("x"),
    ).withColumn(
        "lag", F.explode(F.sequence(F.lit(-_XCORR_MAX_LAG), F.lit(_XCORR_MAX_LAG)))
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("d").alias("d_b"),
        F.col("cents").cast(dec).alias("y"),
    )
    pairs = a.join(
        b,
        (b.type_b > a.type_a) & (b.d_b == a.d + a.lag),
    )
    m = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov_n = nd * F.col("sxy").cast("double") - sxd * syd
    varx_n = nd * F.col("sxx").cast("double") - sxd * sxd
    vary_n = nd * F.col("syy").cast("double") - syd * syd
    return m.select(
        "type_a",
        "type_b",
        "lag",
        F.col("n").alias("n_pairs"),
        fround(cov_n / F.sqrt(varx_n * vary_n), 6).alias("xcorr"),
    )


# --------------------------------------------------------------------------
# q142: mutual information between event type and user-activity decile
# --------------------------------------------------------------------------

_MI_DECILES = 10

_MI_ORACLE = f"""
WITH user_counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev
  FROM events GROUP BY 1
), deciled AS (
  SELECT user_id,
         ntile({_MI_DECILES}) OVER (ORDER BY n_ev DESC, user_id ASC) AS decile
  FROM user_counts
), cells AS (
  SELECT d.decile, e.event_type, CAST(count(*) AS BIGINT) AS c
  FROM events e JOIN deciled d ON d.user_id = e.user_id
  GROUP BY 1, 2
), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
marg_d AS (SELECT decile, CAST(sum(c) AS BIGINT) AS cd FROM cells GROUP BY 1),
marg_t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY 1)
SELECT CAST(max(t.n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_cells,
       {sql_fround(
           "sum((cl.c * 1.0 / t.n) * ln((cl.c * 1.0 * t.n)"
           " / (md.cd * 1.0 * mt.ct)))", 6)} AS mi_nats
FROM cells cl
JOIN marg_d md ON md.decile = cl.decile
JOIN marg_t mt ON mt.event_type = cl.event_type
CROSS JOIN tot t
"""


@register(
    "q142_mutual_information",
    "drift",
    "Mutual information between user-activity decile and event type — "
    "the dependence screen that catches associations a correlation "
    "misses (MI sees any deviation from independence, not just linear). "
    f"Users rank into {_MI_DECILES} deciles by event count (NTILE under "
    "a TOTAL (count DESC, user_id) order — deterministic — rebuilt "
    "exactly from a TWO-PHASE global rank, functions/ranks.py: freq-"
    "stride coarse buckets, tie sub-buckets by key stride, so the "
    "|users| rollup and its freq = 1 Zipf mass never funnel through "
    "one window task), the contingency cells aggregate once, and MI = "
    "sum p_ij ln(p_ij/(p_i p_j)) folds over |deciles| x |types| "
    "integer cells with broadcast marginals. The decile map joins back "
    "to events UNHINTED on user_id — |users|-sized, so the planner "
    "(AQE) picks broadcast only when it actually fits. At 100 TB the "
    "stream reduces to per-user counts, then to the tiny contingency "
    "table; MI == 0 iff independent.",
    oracle=_MI_ORACLE,
)
def q142_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    user_counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_ev"))
    # Global order (n_ev DESC, user_id ASC) as lex buckets.
    staged = user_counts.select(
        "user_id",
        F.expr(f"-(n_ev div {_RANK_FREQ_STRIDE})").alias("__b1"),
        (-F.col("n_ev")).alias("__negf"),
        F.expr(f"user_id div {_RANK_KEY_STRIDE}").alias("__ub"),
    )
    ranked = two_phase_order_stats(
        staged,
        "__b1",
        [F.asc("user_id")],
        b2=["__negf", "__ub"],
        rank_alias="__rk",
        n_alias="__n",
    )
    deciled = ranked.select(
        "user_id",
        exact_ntile(F.col("__rk"), F.col("__n"), _MI_DECILES)
        .cast("int")
        .alias("decile"),
    )
    cells = (
        ev.join(deciled, "user_id")
        .groupBy("decile", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wall = Window.partitionBy()
    wd2 = Window.partitionBy("decile")
    wt2 = Window.partitionBy("event_type")
    n = F.sum("c").over(wall)
    cd = F.sum("c").over(wd2)
    ct = F.sum("c").over(wt2)
    contrib = (F.col("c") * F.lit(1.0) / n) * F.log(
        (F.col("c") * F.lit(1.0) * n) / (cd * F.lit(1.0) * ct)
    )
    scored = cells.select(n.alias("n_all"), contrib.alias("mi_c"))
    return scored.agg(
        F.max("n_all").alias("n_events"),
        F.count(F.lit(1)).alias("n_cells"),
        fround(F.sum("mi_c"), 6).alias("mi_nats"),
    )


# --------------------------------------------------------------------------
# q143: time-series motif discovery (matrix-profile-lite)
# --------------------------------------------------------------------------

_MOTIF_W = 7  # window length (days)

_MOTIF_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), lists AS (
  SELECT event_type, list(cents ORDER BY d) AS xs FROM daily GROUP BY 1
), pos AS (
  SELECT event_type, xs,
         unnest(generate_series(1, len(xs) - {2 * _MOTIF_W} + 1)) AS i
  FROM lists
), pairs AS (
  SELECT event_type, i, unnest(generate_series(i + {_MOTIF_W}, len(xs) - {_MOTIF_W} + 1)) AS j, xs
  FROM pos
), scored AS (
  SELECT event_type, i, j,
         CAST(list_sum(list_transform(generate_series(0, {_MOTIF_W - 1}),
              k -> (xs[i + k] - xs[j + k]) * (xs[i + k] - xs[j + k])))
              AS BIGINT) AS dist
  FROM pairs
), ranked AS (
  SELECT event_type, i, j, dist,
         row_number() OVER (PARTITION BY event_type
             ORDER BY dist ASC, i ASC, j ASC) AS rk
  FROM scored
)
SELECT event_type,
       CAST(i AS BIGINT) AS pos_a, CAST(j AS BIGINT) AS pos_b, dist
FROM ranked WHERE rk = 1
"""


@register(
    "q143_motif_discovery",
    "drift",
    f"Time-series motif discovery (matrix-profile-lite): per event type, "
    f"the closest pair of non-overlapping {_MOTIF_W}-day windows of the "
    "daily-total series under exact integer squared distance — the "
    "repeated-pattern detector behind seasonality mining and anomaly "
    "templates. The series reduces to one sorted cents array per type "
    "(|days| elements); window-pair scoring is row-local array "
    "arithmetic over O(|days|^2) positions of a 30-element array, and "
    "the argmin resolves ties deterministically by (dist, i, j). At "
    "100 TB the daily rollup is the only input — the quadratic lives "
    "on a per-series array that fits in a register file, never on rows.",
    oracle=_MOTIF_ORACLE,
)
def q143_motif_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    lists = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "cents"))).alias("pairs_arr")
    ).select(
        "event_type",
        F.expr("transform(pairs_arr, p -> p.cents)").alias("xs"),
    )
    w = _MOTIF_W
    # A series shorter than two windows has no motif pair. Without this
    # filter Spark's sequence(1, size-2w+1) would be DESCENDING (garbage
    # i/j whose out-of-bounds element_at yields null dists sorting
    # first) while DuckDB's generate_series is empty — the filter makes
    # both engines emit no row for such a type.
    lists = lists.filter(F.size("xs") >= 2 * w)
    pos = lists.select(
        "event_type",
        "xs",
        F.explode(F.expr(f"sequence(1, size(xs) - {2 * w} + 1)")).alias("i"),
    )
    pairs = pos.select(
        "event_type",
        "xs",
        "i",
        F.explode(F.expr(f"sequence(i + {w}, size(xs) - {w} + 1)")).alias("j"),
    )
    # element_at is 1-based like DuckDB's list indexing (bare xs[i] in
    # Spark SQL is 0-based — a cross-engine off-by-one trap).
    dist = F.expr(
        f"aggregate(sequence(0, {w - 1}), CAST(0 AS BIGINT), "
        "(acc, k) -> acc + "
        "(element_at(xs, CAST(i + k AS INT)) - element_at(xs, CAST(j + k AS INT)))"
        " * (element_at(xs, CAST(i + k AS INT)) - element_at(xs, CAST(j + k AS INT))))"
    )
    scored = pairs.select("event_type", "i", "j", dist.alias("dist"))
    wrk = Window.partitionBy("event_type").orderBy(
        F.asc("dist"), F.asc("i"), F.asc("j")
    )
    return (
        scored.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("i").cast("long").alias("pos_a"),
            F.col("j").cast("long").alias("pos_b"),
            "dist",
        )
    )


# --------------------------------------------------------------------------
# q144: RFM segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

_RFM_ASOF = "2024-01-31"
_RFM_TILES = 5

_RFM_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         date_diff('day', CAST(max(ts) AS DATE), DATE '{_RFM_ASOF}') AS rec_days,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), scored AS (
  SELECT user_id, cents,
         ntile({_RFM_TILES}) OVER (ORDER BY rec_days ASC, user_id ASC) AS r_score,
         ntile({_RFM_TILES}) OVER (ORDER BY freq DESC, user_id ASC) AS f_score,
         ntile({_RFM_TILES}) OVER (ORDER BY cents DESC, user_id ASC) AS m_score
  FROM per_user
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cents) AS BIGINT) AS segment_cents
FROM scored GROUP BY 1, 2, 3
"""


@register(
    "q144_rfm_segmentation",
    "drift",
    f"RFM segmentation: per-user recency (days since last event at a "
    "fixed scoring instant), frequency, and monetary value scored into "
    f"{_RFM_TILES} quintiles under TOTAL orders (metric + user_id "
    "tiebreak — deterministic in both engines), then segment cells "
    "aggregated with exact cents totals. All three quintiles come "
    "from ONE melted two-phase rank pass (functions/ranks.py, round-8 "
    "verdict item 3): the pinned |users| rollup unpivots to 3|users| "
    "(metric_tag, stride, user) rows via stack, the kernel ranks them "
    "under the composite coarse bucket (tag, stride) — recency by "
    "day, frequency by freq stride, monetary by cent stride, each "
    "with key-stride tie sub-buckets — in a SINGLE leaf-count shuffle "
    "+ offset join (vs three of each before), and per-metric ranks "
    "fall out arithmetically: every tag holds exactly |users| rows, "
    "so rank_m = rank - tag_idx*(n/3) and n_m = n/3. NTILE is rebuilt "
    "exactly from (rank_m, n_m); one groupBy(user_id) re-pivots the "
    "three scores (replacing two |users| joins). Raw events are "
    "touched exactly once.",
    oracle=_RFM_ORACLE,
)
def q144_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    per_user = _pin(ev.groupBy("user_id").agg(
        F.datediff(
            F.lit(_RFM_ASOF).cast("date"), F.max("ts").cast("date")
        ).alias("rec_days"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents"),
    ))

    # Melt: one row per (user, metric), each carrying its coarse
    # stride bucket and the metric value negated for DESC orders
    # (recency is ASC and day-grain, so its fine key is a constant 0
    # — ties split purely on the user-id stride, same as before).
    melted = per_user.select(
        "user_id",
        "cents",
        F.expr(f"user_id div {_RANK_KEY_STRIDE}").alias("__ub"),
        F.expr(
            "stack(3, "
            "0L, CAST(rec_days AS BIGINT), 0L, "
            f"1L, -(freq div {_RANK_FREQ_STRIDE}), -freq, "
            f"2L, -(cents div {_RANK_CENT_STRIDE}), -cents"
            ") AS (__m, __b1s, __negm)"
        ),
    )
    # pin=False: melted is a cheap stack projection of the ALREADY
    # pinned per_user rollup.
    ranked = two_phase_order_stats(
        melted,
        ["__m", "__b1s"],
        [F.asc("user_id")],
        b2=["__negm", "__ub"],
        rank_alias="__rk",
        n_alias="__n",
        pin=False,
    )
    # Exactly |users| rows per tag, so the global (tag, ...) rank
    # localizes per metric by subtracting the tag's base offset.
    # Integral `div` keeps the per-tag count exact by construction
    # (round-9 advice) instead of leaning on double being exact < 2^53.
    n_m = F.expr("__n div 3")
    rank_m = F.col("__rk") - F.col("__m") * n_m
    score = exact_ntile(rank_m, n_m, _RFM_TILES).cast("int")
    scored = ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("__m") == 0, score)).alias("r_score"),
        F.max(F.when(F.col("__m") == 1, score)).alias("f_score"),
        F.max(F.when(F.col("__m") == 2, score)).alias("m_score"),
        F.max("cents").alias("cents"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").alias("segment_cents"),
    )


# --------------------------------------------------------------------------
# q145: Zipf-exponent fit over the corpus vocabulary
# --------------------------------------------------------------------------

_ZIPF_ORACLE = f"""
WITH tok AS (
  SELECT unnest({_sql_tokens('text')}) AS t FROM documents
), vocab AS (
  SELECT t, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY 1
), ranked AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, t ASC) AS rank
  FROM vocab
), logs AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(freq AS DOUBLE)) AS y
  FROM ranked
), moments AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM logs
)
SELECT CAST(n AS BIGINT) AS n_tokens_distinct,
       {sql_fround("(n * sxy - sx * sy) / (n * sxx - sx * sx)", 6)} AS zipf_slope,
       {sql_fround("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n",
                   6)} AS zipf_intercept
FROM moments
"""


@register(
    "q145_zipf_fit",
    "drift",
    "Zipf-exponent fit: least-squares slope of ln(freq) on ln(rank) over "
    "the corpus vocabulary — the power-law diagnostic a tokenizer/vocab "
    "budget decision reads (natural corpora slope toward -1; this "
    "synthetic corpus is flatter, which is exactly what the query "
    "reveals). Ranks come from a TOTAL (freq DESC, token) order, "
    "rebuilt TWO-PHASE (functions/ranks.py): freq-stride coarse "
    "buckets, the freq = 1 Zipf tail split across token-prefix "
    "sub-buckets, size-gated prefix offsets — a web-scale vocabulary "
    "never funnels through one ranking task. The log-moment sums "
    "follow the text_domain_kl transcendental precedent (fround "
    "absorbs accumulation ulps). One vocab shuffle; the regression "
    "runs over |vocab| rows, never the corpus.",
    oracle=_ZIPF_ORACLE,
)
def q145_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.textutil import tokens

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Global order (freq DESC, t ASC) as lex buckets; ties (the Zipf
    # tail) sub-bucket by 2-char token prefix, which coarsens binary
    # string order (UTF-8 byte order == code-point order).
    staged = vocab.select(
        "t",
        "freq",
        F.expr(f"-(freq div {_RANK_FREQ_STRIDE})").alias("__b1"),
        (-F.col("freq")).alias("__negf"),
        F.substring("t", 1, 2).alias("__tp"),
    )
    ranked = two_phase_order_stats(
        staged,
        "__b1",
        [F.asc("t")],
        b2=["__negf", "__tp"],
        rank_alias="__rk",
    )
    logs = ranked.select(
        F.log(F.col("__rk").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = logs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_tokens_distinct"),
        fround(slope, 6).alias("zipf_slope"),
        fround((F.col("sy") - slope * F.col("sx")) / n, 6).alias("zipf_intercept"),
    )


# --------------------------------------------------------------------------
# q146: Fano factor (burstiness) of daily event counts
# --------------------------------------------------------------------------

_FANO_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), moments AS (
  SELECT event_type, count(*) AS d,
         CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(n * n) AS BIGINT) AS ss
  FROM daily GROUP BY 1
)
SELECT event_type, CAST(d AS BIGINT) AS n_days, s AS n_events,
       floor(((ss * 1.0 * d - s * 1.0 * s) / (d * 1.0 * (d - 1)))
             / (s * 1.0 / d) * 1000000 + 0.5) / 1000000 AS fano
FROM moments
WHERE d >= 2
"""


@register(
    "q146_fano_factor",
    "drift",
    "Fano factor (variance-to-mean ratio) of daily event counts per "
    "type — the burstiness screen: ~1 for a Poisson arrival process, "
    ">1 for bursty/overdispersed traffic, <1 for regular. Sample "
    "variance and mean finalize from exact integer count moments "
    "(sum, sum of squares) in one partially-aggregated shuffle over "
    "|types| x |days| rows.",
    oracle=_FANO_ORACLE,
)
def q146_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    # Sample variance needs d >= 2; a single-day series would divide by
    # zero (Spark NULL vs DuckDB inf — engine-dependent), so both sides
    # exclude it rather than emit an engine-shaped value.
    m = m.filter(F.col("d") >= 2)
    dd = F.col("d").cast("double")
    sd = F.col("s").cast("double")
    ssd = F.col("ss").cast("double")
    var = (ssd * dd - sd * sd) / (dd * (dd - 1))
    mean = sd / dd
    return m.select(
        "event_type",
        F.col("d").alias("n_days"),
        F.col("s").alias("n_events"),
        fround(var / mean, 6).alias("fano"),
    )


# --------------------------------------------------------------------------
# q147: vocabulary drift (set-based, reference vs current period... of
# the documents corpus split by doc_id parity as the two "crawls")
# --------------------------------------------------------------------------

_VOCABDRIFT_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT unnest({_sql_tokens('text')}) AS t
  FROM documents WHERE doc_id % 2 = 0
), b AS (
  SELECT DISTINCT unnest({_sql_tokens('text')}) AS t
  FROM documents WHERE doc_id % 2 = 1
), f AS (
  SELECT coalesce(a.t, b.t) AS t,
         (a.t IS NOT NULL) AS in_a, (b.t IS NOT NULL) AS in_b
  FROM a FULL OUTER JOIN b ON a.t = b.t
)
SELECT CAST(count(*) FILTER (in_a AND in_b) AS BIGINT) AS n_shared,
       CAST(count(*) FILTER (in_a AND NOT in_b) AS BIGINT) AS n_retired,
       CAST(count(*) FILTER (in_b AND NOT in_a) AS BIGINT) AS n_new,
       floor(count(*) FILTER (in_a AND in_b) * 1.0 / count(*)
             * 1000000 + 0.5) / 1000000 AS jaccard
FROM f
"""


@register(
    "q147_vocab_drift",
    "drift",
    "Set-based vocabulary drift between two corpus slices (doc_id-parity "
    "halves standing in for consecutive crawls): shared / retired / new "
    "token counts and the Jaccard overlap of the vocabularies — the "
    "SET complement to the distributional drift monitors (a vocabulary "
    "can keep its distribution while churning its members, and vice "
    "versa). Two distinct-token aggregations + one full-outer join on "
    "the |vocab|-sized sets; the corpus is scanned once per slice and "
    "never joined row-to-row.",
    oracle=_VOCABDRIFT_ORACLE,
)
def q147_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.textutil import tokens

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    def vocab(parity: int):
        return (
            docs.filter(F.col("doc_id") % 2 == parity)
            .select(F.explode(tokens(F.col("text"))).alias("t"))
            .distinct()
        )
    a = vocab(0).withColumnRenamed("t", "ta")
    b = vocab(1).withColumnRenamed("t", "tb")
    f = a.join(b, a.ta == b.tb, "full_outer").select(
        F.col("ta").isNotNull().alias("in_a"),
        F.col("tb").isNotNull().alias("in_b"),
    )
    shared = F.count(F.when(F.col("in_a") & F.col("in_b"), 1))
    return f.agg(
        shared.alias("n_shared"),
        F.count(F.when(F.col("in_a") & ~F.col("in_b"), 1)).alias("n_retired"),
        F.count(F.when(F.col("in_b") & ~F.col("in_a"), 1)).alias("n_new"),
        fround(shared * F.lit(1.0) / F.count(F.lit(1)), 6).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# q148: per-user behavioral entropy
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = """
WITH cells AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), totals AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1
)
SELECT c.user_id, max(t.n) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       floor(-sum((c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n))
             * 1000000 + 0.5) / 1000000 AS entropy_nats
FROM cells c JOIN totals t ON t.user_id = c.user_id
GROUP BY c.user_id
"""


@register(
    "q148_behavior_entropy",
    "drift",
    "Per-user behavioral entropy: Shannon entropy of each user's "
    "event-type distribution (0 = single-action bots, ln|types| = "
    "uniform explorers) — the per-entity diversity feature a "
    "segmentation or bot screen consumes. One (user, type) count "
    "shuffle; per-user totals join back on the same key; the ln fold "
    "runs over |users| x |types| integer cells.",
    oracle=_ENTROPY_ORACLE,
)
def q148_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cells = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    wt = Window.partitionBy("user_id")
    n = F.sum("c").over(wt)
    p = F.col("c") * F.lit(1.0) / n
    scored = cells.select(
        "user_id", n.alias("n_u"), (p * F.log(p)).alias("plogp")
    )
    return scored.groupBy("user_id").agg(
        F.max("n_u").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        fround(-F.sum("plogp"), 6).alias("entropy_nats"),
    )


# --------------------------------------------------------------------------
# q149: exact inter-event gap percentiles (latency-report shape)
# --------------------------------------------------------------------------

_GAPPCT_ORACLE = """
WITH ordered AS (
  SELECT event_type,
         epoch_ms(ts) - lag(epoch_ms(ts))
             OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
  FROM events
), gaps AS (
  SELECT event_type, CAST(gap_ms AS BIGINT) AS gap_ms
  FROM ordered WHERE gap_ms IS NOT NULL
), cum AS (
  SELECT event_type, gap_ms,
         CAST(count(*) OVER (PARTITION BY event_type ORDER BY gap_ms
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_n,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM gaps
)
SELECT event_type, max(n) AS n_gaps,
       CAST(min(CASE WHEN cum_n * 100 >= n * 50 THEN gap_ms END) AS BIGINT)
         AS p50_ms,
       CAST(min(CASE WHEN cum_n * 100 >= n * 90 THEN gap_ms END) AS BIGINT)
         AS p90_ms,
       CAST(min(CASE WHEN cum_n * 100 >= n * 99 THEN gap_ms END) AS BIGINT)
         AS p99_ms
FROM cum GROUP BY event_type
"""


@register(
    "q149_gap_percentiles",
    "drift",
    "Exact inter-arrival percentile report per event type (the latency-"
    "SLO shape): consecutive-event gaps in integer milliseconds ((ts, "
    "event_id)-ordered lag), then p50/p90/p99 as the smallest gap whose "
    "RANGE-frame cumulative count reaches the quantile threshold — the "
    "q134 lower-quantile selection rule generalized to three quantiles "
    "in ONE pass (conditional mins over the cumulative column, no "
    "re-sort per quantile). Two window shuffles on the same key; all "
    "integer arithmetic, no approx_percentile error bars.",
    oracle=_GAPPCT_ORACLE,
)
def q149_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    worder = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "event_type",
            (F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(worder)).alias(
                "gap_ms"
            ),
        )
        .filter(F.col("gap_ms").isNotNull())
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("gap_ms")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = gaps.select(
        "event_type",
        "gap_ms",
        F.count(F.lit(1)).over(wcum).alias("cum_n"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )

    def pct(q: int):
        return F.min(
            F.when(F.col("cum_n") * 100 >= F.col("n") * q, F.col("gap_ms"))
        ).alias(f"p{q}_ms")

    return cum.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"), pct(50), pct(90), pct(99)
    )


# --------------------------------------------------------------------------
# q150: new-vs-returning daily users (growth accounting)
# --------------------------------------------------------------------------

_NEWRET_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS first_day
  FROM events GROUP BY 1
), active AS (
  SELECT DISTINCT CAST(e.ts AS DATE) AS day, e.user_id, f.first_day
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
)
SELECT day,
       CAST(count(*) FILTER (day = first_day) AS BIGINT) AS n_new,
       CAST(count(*) FILTER (day > first_day) AS BIGINT) AS n_returning,
       CAST(count(*) AS BIGINT) AS n_active
FROM active GROUP BY day
"""


@register(
    "q150_new_vs_returning",
    "drift",
    "Growth accounting: per day, how many active users are NEW (first "
    "ever event that day) vs RETURNING — the first-touch daily split "
    "every growth dashboard leads with. One per-user min(ts) rollup "
    "joined back onto the distinct (day, user) activity set; both "
    "shuffles key on user_id, and the |users|-sized first-seen table "
    "broadcasts at dimension scale. The batch form of the stream_first_"
    "seen keyed-state dedup.",
    oracle=_NEWRET_ORACLE,
)
def q150_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    active = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        # first_seen is a |users| rollup (corpus-scaling): un-hinted —
        # AQE broadcasts it from runtime size at test SF and falls back
        # to a user_id-co-partitioned shuffle join at 100 TB.
        .join(first_seen, "user_id")
    )
    return active.groupBy("day").agg(
        F.count(F.when(F.col("day") == F.col("first_day"), 1)).alias("n_new"),
        F.count(F.when(F.col("day") > F.col("first_day"), 1)).alias("n_returning"),
        F.count(F.lit(1)).alias("n_active"),
    )


# --------------------------------------------------------------------------
# q151: integer-exact peak detection over daily series
# --------------------------------------------------------------------------

_PEAK_ORACLE = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), ctx AS (
  SELECT event_type, d, cents,
         lag(cents)  OVER (PARTITION BY event_type ORDER BY d) AS prev,
         lead(cents) OVER (PARTITION BY event_type ORDER BY d) AS next,
         CAST(sum(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM daily
)
SELECT event_type, CAST(d AS BIGINT) AS d, cents
FROM ctx
WHERE prev IS NOT NULL AND next IS NOT NULL
  AND cents > prev AND cents > next
  AND cents * n > s
ORDER BY event_type, d
"""


@register(
    "q151_peak_detection",
    "drift",
    "Integer-exact peak detection over per-type daily totals: a day is a "
    "peak iff it strictly exceeds both neighbors AND the series mean — "
    "with the mean test cross-multiplied (cents * n > sum) so the whole "
    "predicate is BIGINT comparisons, no float mean, no epsilon. One "
    "window shuffle carrying lag/lead and the per-type running totals; "
    "the spike shortlist an alerting pipeline pages on, computed from "
    "the same |types| x |days| rollup as the other series diagnostics.",
    oracle=_PEAK_ORACLE,
)
def q151_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "d"
        ),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    worder = Window.partitionBy("event_type").orderBy("d")
    wall = Window.partitionBy("event_type")
    ctx = daily.select(
        "event_type",
        F.col("d").cast("long").alias("d"),
        "cents",
        F.lag("cents").over(worder).alias("prev"),
        F.lead("cents").over(worder).alias("next"),
        F.sum("cents").over(wall).alias("s"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    return (
        ctx.filter(
            F.col("prev").isNotNull()
            & F.col("next").isNotNull()
            & (F.col("cents") > F.col("prev"))
            & (F.col("cents") > F.col("next"))
            & (F.col("cents") * F.col("n") > F.col("s"))
        )
        .select("event_type", "d", "cents")
        .orderBy("event_type", "d")
    )


# --------------------------------------------------------------------------
# q152: weekday seasonality index
# --------------------------------------------------------------------------

_WEEKDAY_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), tagged AS (
  SELECT event_type, isodow(day) AS weekday, cents FROM daily
), agg AS (
  SELECT event_type, weekday,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(cents) AS BIGINT) AS wd_cents
  FROM tagged GROUP BY 1, 2
), tot AS (
  SELECT event_type,
         CAST(sum(wd_cents) AS BIGINT) AS all_cents,
         CAST(sum(n_days) AS BIGINT) AS all_days
  FROM agg GROUP BY 1
)
SELECT a.event_type, CAST(a.weekday AS BIGINT) AS weekday, a.n_days,
       floor((a.wd_cents * 1.0 / a.n_days)
             / (t.all_cents * 1.0 / t.all_days) * 1000000 + 0.5) / 1000000
         AS seasonal_index
FROM agg a JOIN tot t ON t.event_type = a.event_type
"""


@register(
    "q152_weekday_index",
    "drift",
    "Weekday seasonality index: per (type, ISO weekday), the ratio of "
    "the weekday's mean daily total to the series' overall mean daily "
    "total (1.0 = no weekday effect) — the multiplicative S component a "
    "classical decomposition divides out, and the factor a capacity "
    "planner staffs by. Both means are ratios of exact integers, so the "
    "final division operates on identical doubles in both engines. Two "
    "tiny aggregations over the daily rollup.",
    oracle=_WEEKDAY_ORACLE,
)
def q152_weekday_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("cents")
    )
    agg = daily.groupBy(
        "event_type", F.dayofweek(F.date_sub("day", 1)).cast("long").alias("weekday")
    ).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cents").alias("wd_cents"),
    )
    wall = Window.partitionBy("event_type")
    all_cents = F.sum("wd_cents").over(wall)
    all_days = F.sum("n_days").over(wall)
    idx = (F.col("wd_cents") * F.lit(1.0) / F.col("n_days")) / (
        all_cents * F.lit(1.0) / all_days
    )
    return agg.select(
        "event_type", "weekday", "n_days", fround(idx, 6).alias("seasonal_index")
    )


# --------------------------------------------------------------------------
# q153: cohort LTV curve (cumulative revenue by signup-week cohort age)
# --------------------------------------------------------------------------

_LTV_ORACLE = """
WITH first_seen AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(min(ts) AS DATE)) // 7
           AS cohort_week
  FROM events GROUP BY 1
), rev AS (
  SELECT f.cohort_week,
         date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) // 7
           - f.cohort_week AS age_week,
         CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  GROUP BY 1, 2
), sized AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
  FROM first_seen GROUP BY 1
)
SELECT r.cohort_week, r.age_week, s.n_users,
       CAST(sum(r2.cents) AS BIGINT) AS cum_cents,
       floor(sum(r2.cents) * 1.0 / s.n_users / 100.0 * 10000 + 0.5) / 10000
         AS ltv_dollars_per_user
FROM rev r
JOIN rev r2 ON r2.cohort_week = r.cohort_week AND r2.age_week <= r.age_week
JOIN sized s ON s.cohort_week = r.cohort_week
GROUP BY r.cohort_week, r.age_week, s.n_users
"""


@register(
    "q153_cohort_ltv",
    "drift",
    "Cohort LTV curve: users grouped by signup week (first event), "
    "revenue accumulated by cohort age in weeks, reported as cumulative "
    "dollars per cohort member — the lifetime-value ramp a payback-"
    "period decision reads, the revenue companion to q54's retention "
    "counts. Exact cents throughout; the per-(cohort, age) rollup is "
    "tiny, so the cumulative step (a triangular self-join in the "
    "oracle, one window pass in the engine) never touches raw events.",
    oracle=_LTV_ORACLE,
)
def q153_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # Integral div (round-11): the oracle's `// 7` (truncation), exact
    # past 2^53; identical to the old floor() on the fixture's
    # non-negative day offsets.
    week = lambda c: idiv(
        F.datediff(c.cast("date"), F.lit("2024-01-01").cast("date")), 7
    )
    # first_seen is consumed twice (join side + cohort sizing) and
    # ReuseExchange does not dedupe the subtrees — without the cut the
    # event fact was scanned 3x (measured). The per-user rollup is the
    # table the query already assumes broadcastable, so the eager
    # checkpoint is cheap and events scan once per remaining consumer.
    first_seen = _pin(ev.groupBy("user_id").agg(
        week(F.min("ts")).alias("cohort_week")
    ))
    rev = (
        # first_seen is a |users| rollup (corpus-scaling): un-hinted
        # (the pinned plan reports no stats, so AQE decides at runtime).
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            (week(F.col("ts")) - F.col("cohort_week")).alias("age_week"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "cents"
            )
        )
    )
    sized = first_seen.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_users"))
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_week")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.select(
        "cohort_week", "age_week", F.sum("cents").over(wcum).alias("cum_cents")
    )
    scale = F.lit(10000.0)
    return cum.join(F.broadcast(sized), "cohort_week").select(  # bounded: |weeks|
        "cohort_week",
        "age_week",
        "n_users",
        "cum_cents",
        (
            F.floor(
                F.col("cum_cents") * F.lit(1.0) / F.col("n_users") / F.lit(100.0)
                * scale
                + F.lit(0.5)
            )
            / scale
        ).alias("ltv_dollars_per_user"),
    )


# --------------------------------------------------------------------------
# q154: stickiness (average DAU over WAU per week)
# --------------------------------------------------------------------------

_STICKY_ORACLE = """
WITH act AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week,
         user_id
  FROM events
), dau AS (
  SELECT week, day, CAST(count(*) AS BIGINT) AS dau
  FROM act GROUP BY 1, 2
), wk AS (
  SELECT week,
         CAST(sum(dau) AS BIGINT) AS active_user_days,
         CAST(count(*) AS BIGINT) AS n_days
  FROM dau GROUP BY 1
), wau AS (
  SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau FROM act GROUP BY 1
)
SELECT k.week, k.n_days, w.wau,
       floor((k.active_user_days * 1.0 / k.n_days) / w.wau
             * 1000000 + 0.5) / 1000000 AS stickiness
FROM wk k JOIN wau w ON w.week = k.week
"""


@register(
    "q154_stickiness",
    "drift",
    "Stickiness (DAU/WAU): per week, the average daily active users "
    "divided by the week's distinct actives — 1/7 means users show up "
    "once a week, 1.0 means every active user comes every day; the "
    "engagement-frequency metric beside q150's new/returning split. "
    "Both numerator and denominator are exact integers from one "
    "distinct (day, user) activity set; the final division runs on "
    "identical doubles in both engines.",
    oracle=_STICKY_ORACLE,
)
def q154_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    act = _pin(ev.select(
        F.col("ts").cast("date").alias("day"),
        # Integral div (round-11): the oracle's `// 7`, see q153.
        idiv(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")), 7
        ).alias("week"),
        "user_id",
    ).distinct())
    # act feeds both DAU and WAU; without the lineage cut the fact was
    # scanned and re-distincted twice (ReuseExchange does not dedupe).
    dau = act.groupBy("week", "day").agg(F.count(F.lit(1)).alias("dau"))
    wk = dau.groupBy("week").agg(
        F.sum("dau").alias("active_user_days"),
        F.count(F.lit(1)).alias("n_days"),
    )
    wau = act.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    return wk.join(F.broadcast(wau), "week").select(  # bounded: |weeks|
        "week",
        "n_days",
        "wau",
        fround(
            (F.col("active_user_days") * F.lit(1.0) / F.col("n_days"))
            / F.col("wau"),
            6,
        ).alias("stickiness"),
    )


# --------------------------------------------------------------------------
# q155: ABC-XYZ inventory classification (integer-exact thresholds)
# --------------------------------------------------------------------------

_ABC_A_PCT = 80  # cumulative revenue share boundary for class A
_ABC_B_PCT = 95  # ... and for class B
_XYZ_YEARS = 7  # demand observed over 1995..2001 (missing years = 0)

_ABCXYZ_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT)) AS BIGINT) AS rev_e4,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
), yearly AS (
  SELECT l_partkey, year(l_shipdate) AS y,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
), moments AS (
  SELECT l_partkey,
         CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(q * q) AS BIGINT) AS ss
  FROM yearly GROUP BY 1
), ranked AS (
  SELECT p.l_partkey, p.qty, m.s, m.ss,
         sum(p.rev_e4) OVER (ORDER BY p.rev_e4 DESC, p.l_partkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev,
         sum(p.rev_e4) OVER () AS total_rev
  FROM per_part p JOIN moments m ON m.l_partkey = p.l_partkey
), classed AS (
  SELECT CASE WHEN cum_rev * 100 <= total_rev * {_ABC_A_PCT} THEN 'A'
              WHEN cum_rev * 100 <= total_rev * {_ABC_B_PCT} THEN 'B'
              ELSE 'C' END AS abc_class,
         -- CV^2 = (n*SS - S^2) / S^2 over n={_XYZ_YEARS} demand years
         -- (missing years contribute 0 to S and SS); thresholds 0.25
         -- and 1.0 cross-multiply to pure integer comparisons.
         CASE WHEN ({_XYZ_YEARS} * ss - s * s) * 4 <= s * s THEN 'X'
              WHEN {_XYZ_YEARS} * ss - s * s <= s * s THEN 'Y'
              ELSE 'Z' END AS xyz_class,
         qty
  FROM ranked
)
SELECT abc_class, xyz_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(qty) AS BIGINT) AS total_qty
FROM classed GROUP BY 1, 2
"""


@register(
    "q155_abc_xyz",
    "drift",
    "ABC-XYZ inventory classification: parts ranked into A/B/C by "
    f"cumulative revenue share ({_ABC_A_PCT}/{_ABC_B_PCT}% boundaries, "
    "deterministic rank tiebreak) and into X/Y/Z by demand variability — "
    "the squared coefficient of variation of yearly quantities "
    "(missing years = zero demand) with the 0.25 / 1.0 thresholds "
    "CROSS-MULTIPLIED into pure BIGINT comparisons, so the entire "
    "classification is integer-exact with no float CV and no epsilon. "
    "The planning grid (count + volume per cell) every inventory policy "
    "starts from. Aggregate-then-rank, then TWO-PHASE: the cumulative "
    "revenue comes from the shared kernel (functions/ranks.py — "
    "dollar-stride coarse buckets over rev_e4, tie sub-buckets by key "
    "stride, size-gated prefix offsets), so no window ever sees the "
    "|parts| rollup in one partition.",
    oracle=_ABCXYZ_ORACLE,
)
def q155_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    # ONE lineitem scan and NO self-join: the (part, year) grain
    # subsumes both rollups — per-part revenue/quantity re-aggregate
    # from exact integer yearly partials (associative), the CV moments
    # read the yearly grain, and s (sum of yearly demand) IS qty, so a
    # single two-level aggregation chain produces every column the
    # classification needs.
    yearly = li.groupBy("l_partkey", F.year("l_shipdate").alias("y")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q"),
        F.sum(rev).alias("r"),
    )
    stats = yearly.groupBy("l_partkey").agg(
        F.sum("r").alias("rev_e4"),
        F.sum("q").alias("qty"),
        F.sum(F.col("q") * F.col("q")).alias("ss"),
    )
    # Global order (rev_e4 DESC, l_partkey ASC) as lex buckets; the
    # metric is e4-scaled so the $100 stride is 1,000,000.
    staged = stats.select(
        "l_partkey",
        "rev_e4",
        "qty",
        F.col("qty").alias("s"),
        "ss",
        F.expr(f"-(rev_e4 div {_RANK_CENT_STRIDE * 10})").alias("__b1"),
        (-F.col("rev_e4")).alias("__negv"),
        F.expr(f"l_partkey div {_RANK_KEY_STRIDE}").alias("__kb"),
    )
    ranked = two_phase_order_stats(
        staged,
        "__b1",
        [F.asc("l_partkey")],
        b2=["__negv", "__kb"],
        value_col="rev_e4",
        rank_alias="__rk",
        cumsum_alias="cum_rev",
        total_alias="total_rev",
    ).select("qty", "s", "ss", "cum_rev", "total_rev")
    disp = F.lit(_XYZ_YEARS) * F.col("ss") - F.col("s") * F.col("s")
    classed = ranked.select(
        F.when(
            F.col("cum_rev") * 100 <= F.col("total_rev") * _ABC_A_PCT, "A"
        )
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * _ABC_B_PCT, "B")
        .otherwise("C")
        .alias("abc_class"),
        F.when(disp * 4 <= F.col("s") * F.col("s"), "X")
        .when(disp <= F.col("s") * F.col("s"), "Y")
        .otherwise("Z")
        .alias("xyz_class"),
        "qty",
    )
    return classed.groupBy("abc_class", "xyz_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("qty").alias("total_qty"),
    )
