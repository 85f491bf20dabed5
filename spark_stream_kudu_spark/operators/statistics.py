"""Distributed statistical aggregates with exact-integer partials
(round-3 session 3).

Floating-point aggregation order differs between a 1000-executor Spark
job and any single-node engine, so naive ``corr()``/``regr_slope()``
outputs can never be hash-compared across engines — and worse, are not
even reproducible across two runs of the *same* cluster job (partial
sums merge in scheduling order). The engine therefore computes second-
moment statistics the way its centroid kernel does (similarity.py:481):
quantize the decimal-exact inputs to scaled integers, accumulate the
five sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy) as DECIMAL(38,0)
— associative, commutative, EXACT under any merge order — and run
floating-point math only once, at finalize, on identical operands in
both engines. This is also the right 100 TB design: the partials are
tiny, map-side-combinable, and re-aggregatable (a per-day stats table
rolls up to per-month by summing the same six columns).

- ``q75_stats_agg`` — per-group correlation + least-squares regression
  of extended price on quantity over lineitem (corr, slope, intercept),
  finalized from exact integer moments.
- ``q76_histogram`` — fixed-width 20-bin histogram of the events value
  stream: global [min, max] from one aggregate (a broadcastable
  single row), bucket index by identical float arithmetic in both
  engines, count per bucket. The profiling/data-quality kernel
  (equi-width; the equi-depth sibling is ntile/approx_percentile,
  cf. q35/q36).

Scale notes (100 TB): q75 is one partially-aggregated shuffle over
|groups| rows of six integer columns. q76 is two scans (stats + bucket
counts) with the single stats row broadcast; bucket count output is
|bins| rows. Neither moves the fact table more than once per scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.ranks import (
    exact_ntile,
    two_phase_order_stats,
)
from spark_stream_kudu_spark.functions.rounding import fround, idiv, sql_fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

# Two-phase rank bucketing constants shared by the entity-rollup rank
# queries (q110/q135/q136): a $1000 cent-stride coarse bucket over the
# metric (domain constant, scan-local — the q184 precedent) and a
# 4096-key stride refining TIES on the metric, so even an unbounded tie
# mass (e.g. millions of zero-spend users) splits across sub-buckets
# instead of serializing one window task.
_RANK_CENT_STRIDE = 100_000
_RANK_KEY_STRIDE = 4096

# --------------------------------------------------------------------------
# q75: exact-moment correlation / regression
# --------------------------------------------------------------------------

_STATS_ORACLE = f"""
WITH moments AS (
  SELECT l_returnflag,
         count(*) AS n,
         sum(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS sx,
         sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             AS DECIMAL(38,0))) AS sy,
         sum(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             AS DECIMAL(38,0))) AS sxx,
         sum(CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             AS DECIMAL(38,0))) AS syy,
         sum(CAST(CAST(l_quantity AS BIGINT)
             * CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             AS DECIMAL(38,0))) AS sxy
  FROM lineitem
  GROUP BY 1
), fin AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx_n,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary_n,
         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
  FROM moments
)
SELECT l_returnflag, n,
       {sql_fround("cov_n / sqrt(varx_n * vary_n)", 6)} AS corr_qty_price,
       {sql_fround("(cov_n / varx_n) / 100.0", 4)} AS slope_dollars_per_qty,
       {sql_fround("((syd - (cov_n / varx_n) * sxd) / CAST(n AS DOUBLE)) / 100.0", 4)}
         AS intercept_dollars
FROM fin
"""


@register(
    "q75_stats_agg",
    "statistics",
    "Per-group correlation + least-squares regression (price on quantity) "
    "from EXACT integer sufficient statistics: inputs quantize to scaled "
    "integers (quantity integral, price in cents), the five moments "
    "accumulate as DECIMAL(38,0) — associative and exact under any "
    "distributed merge order, unlike naive float corr() which is not even "
    "run-to-run reproducible on a cluster — and float math happens once at "
    "finalize on identical operands in both engines. One partially-"
    "aggregated shuffle over |groups| rows of six integer columns; the "
    "moments table is re-aggregatable (day -> month rollup by summing).",
    oracle=_STATS_ORACLE,
)
def q75_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    dec = "decimal(38,0)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((y * y).cast(dec)).alias("syy"),
        F.sum((x * y).cast(dec)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov_n = nd * F.col("sxy").cast("double") - sxd * syd
    varx_n = nd * F.col("sxx").cast("double") - sxd * sxd
    vary_n = nd * F.col("syy").cast("double") - syd * syd
    slope = cov_n / varx_n
    return m.select(
        "l_returnflag",
        "n",
        fround(cov_n / F.sqrt(varx_n * vary_n), 6).alias("corr_qty_price"),
        fround(slope / 100.0, 4).alias("slope_dollars_per_qty"),
        fround(((syd - slope * sxd) / nd) / 100.0, 4).alias(
            "intercept_dollars"
        ),
    )


# --------------------------------------------------------------------------
# q76: fixed-width histogram
# --------------------------------------------------------------------------

_N_BINS = 20

_HIST_ORACLE = f"""
WITH stats AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
), bucketed AS (
  SELECT least({_N_BINS - 1},
               CAST(floor((value - lo) / ((hi - lo) / {_N_BINS})) AS BIGINT))
           AS bucket,
         lo, hi
  FROM events CROSS JOIN stats
)
SELECT bucket,
       {sql_fround(f"lo + bucket * ((hi - lo) / {_N_BINS})", 6)} AS edge_lo,
       {sql_fround(f"lo + (bucket + 1) * ((hi - lo) / {_N_BINS})", 6)} AS edge_hi,
       count(*) AS n
FROM bucketed
GROUP BY 1, 2, 3
"""


@register(
    "q76_histogram",
    "statistics",
    f"Fixed-width {_N_BINS}-bin histogram of the event value stream: global "
    "[min, max] from one aggregate (a single broadcast row), bucket index "
    "by identical float arithmetic in both engines (top edge clamped into "
    "the last bin), count per bucket with map-side partial aggregation "
    f"over at most {_N_BINS} groups. The equi-width profiling kernel; "
    "equi-depth is the ntile/approx_percentile sibling (q35/q36).",
    oracle=_HIST_ORACLE,
)
def q76_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / _N_BINS
    bucket = F.least(
        F.lit(_N_BINS - 1),
        # float-by-design: value/lo/width are genuinely double (equi-width
        # bins over a float metric); oracle applies the identical expression
        F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
    )
    edge = lambda b: F.col("lo") + b * ((F.col("hi") - F.col("lo")) / _N_BINS)
    return (
        ev.crossJoin(F.broadcast(stats))  # bounded: 1-row min/max
        .groupBy(bucket.alias("bucket"), "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            fround(edge(F.col("bucket")), 6).alias("edge_lo"),
            fround(edge(F.col("bucket") + 1), 6).alias("edge_hi"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# emb_dim_stats: per-dimension embedding mean/std (standard-scaler kernel)
# --------------------------------------------------------------------------

_EMB_DIM = 64  # embeddings fixture dimension (FIXTURES.md §B)
_EMB_SCALE = 1 << 20  # power-of-two scaling: exact on floats

_DIM_STATS_ORACLE = f"""
WITH comps AS (
  SELECT CAST(i - 1 AS INTEGER) AS pos,
         CAST(floor(embedding[i] * {_EMB_SCALE}) AS BIGINT) AS c
  FROM embeddings, generate_series(1, {_EMB_DIM}) AS t(i)
), moments AS (
  SELECT pos,
         count(*) AS n_vectors,
         sum(CAST(c AS DECIMAL(38,0))) AS sx,
         sum(CAST(c * c AS DECIMAL(38,0))) AS sxx
  FROM comps GROUP BY pos
)
SELECT pos, n_vectors,
       {sql_fround(f"CAST(sx AS DOUBLE) / n_vectors / {_EMB_SCALE}", 6)} AS mean,
       {sql_fround(
           f"sqrt((n_vectors * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           f" / (CAST(n_vectors AS DOUBLE) * n_vectors)) / {_EMB_SCALE}", 6)} AS std
FROM moments
"""


@register(
    "emb_dim_stats",
    "statistics",
    "Per-dimension embedding mean/std — the standard-scaler fit over an "
    "array<float> feature column (whitening / normalization before ANN "
    "indexing or model training). Components quantize to 2^20-scaled "
    "integers (exact power-of-two float scaling, floor to BIGINT identical "
    "in both engines) and the first/second moments accumulate as "
    "DECIMAL(38,0) — associative and exact under any distributed merge "
    "order, so a 1000-executor fit is bit-reproducible. At 100 TB the "
    "posexplode stream is 64x rows but map-side partial aggregation "
    "collapses it to 64 rows per partition before the single shuffle; the "
    "64-row (mean, std) result broadcasts back for the transform step. "
    "Re-aggregatable: per-shard moment tables roll up by summing.",
    oracle=_DIM_STATS_ORACLE,
    bench=True,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    c = F.floor(F.col("comp") * _EMB_SCALE).cast("long")
    dec = "decimal(38,0)"
    m = (
        emb.select(F.posexplode("embedding").alias("pos", "comp"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(c.cast(dec)).alias("sx"),
            F.sum((c * c).cast(dec)).alias("sxx"),
        )
    )
    nd = F.col("n_vectors").cast("double")
    sxd = F.col("sx").cast("double")
    var_nn = (nd * F.col("sxx").cast("double") - sxd * sxd) / (nd * nd)
    return m.select(
        "pos",
        "n_vectors",
        fround(sxd / nd / _EMB_SCALE, 6).alias("mean"),
        fround(F.sqrt(var_nn) / _EMB_SCALE, 6).alias("std"),
    )


# --------------------------------------------------------------------------
# q89: winsorization (quantile clamping)
# --------------------------------------------------------------------------

_WINSOR_LO, _WINSOR_HI = 0.05, 0.95

_WINSOR_ORACLE = f"""
WITH bounds AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, {_WINSOR_LO}) AS lo,
         quantile_cont(l_extendedprice, {_WINSOR_HI}) AS hi
  FROM lineitem GROUP BY 1
),
clamped AS (
  SELECT l.l_returnflag,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS raw_cents,
         CAST(floor(least(greatest(l.l_extendedprice, b.lo), b.hi) * 100 + 0.5)
              AS BIGINT) AS win_cents,
         CAST(l.l_extendedprice < b.lo AS INT) AS clo,
         CAST(l.l_extendedprice > b.hi AS INT) AS chi
  FROM lineitem l JOIN bounds b USING (l_returnflag)
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(clo) AS BIGINT) AS n_clamped_lo,
       CAST(sum(chi) AS BIGINT) AS n_clamped_hi,
       {sql_fround("sum(raw_cents) * 1.0 / count(*) / 100", 4)} AS mean_raw,
       {sql_fround("sum(win_cents) * 1.0 / count(*) / 100", 4)} AS mean_winsorized
FROM clamped
GROUP BY 1
"""


@register(
    "q89_winsorize",
    "statistics",
    f"Winsorization: clamp each group's values into its exact "
    f"[p{int(_WINSOR_LO * 100)}, p{int(_WINSOR_HI * 100)}] quantile band "
    "and report raw vs clamped means plus clamp counts — the outlier-"
    "robust normalization step before loss-sensitive statistics (Spark "
    "percentile() == DuckDB quantile_cont, the q37-proven pairing; means "
    "from exact integer cents). Two passes over the group: one quantile "
    "aggregate producing a |groups|-row bounds table that BROADCASTS "
    "back, one clamp+aggregate — the fact table shuffles once.",
    oracle=_WINSOR_ORACLE,
)
def q89_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, {_WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(l_extendedprice, {_WINSOR_HI})").alias("hi"),
    )
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(bounds), "l_returnflag"  # bounded: |returnflags|
    )
    win = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_extendedprice") < F.col("lo")).cast("int")).alias(
            "n_clamped_lo"
        ),
        F.sum((F.col("l_extendedprice") > F.col("hi")).cast("int")).alias(
            "n_clamped_hi"
        ),
        fround(F.sum(cents(F.col("l_extendedprice"))) * 1.0 / F.count(F.lit(1)) / 100, 4).alias(
            "mean_raw"
        ),
        fround(F.sum(cents(win)) * 1.0 / F.count(F.lit(1)) / 100, 4).alias(
            "mean_winsorized"
        ),
    )


# --------------------------------------------------------------------------
# q103: robust outliers via median absolute deviation (MAD)
# --------------------------------------------------------------------------

_MAD_K = 3.0  # flag |x - median| > K * MAD

_MAD_ORACLE = f"""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
med AS (
  SELECT event_type, median(v) AS med_v FROM cents GROUP BY 1
),
mad AS (
  SELECT c.event_type, m.med_v, median(abs(c.v - m.med_v)) AS mad_v
  FROM cents c JOIN med m USING (event_type)
  GROUP BY 1, 2
)
SELECT c.event_id, c.event_type,
       {sql_fround("c.v / 100.0", 2)} AS value,
       {sql_fround("m.med_v / 100.0", 2)} AS median_value,
       {sql_fround("m.mad_v / 100.0", 2)} AS mad_value
FROM cents c JOIN mad m USING (event_type)
WHERE abs(c.v - m.med_v) > {_MAD_K} * m.mad_v
"""


@register(
    "q103_mad_outliers",
    "statistics",
    f"Robust outlier detection: flag values more than {_MAD_K}x the "
    "median absolute deviation from their group median — the robust "
    "sibling of z-scoring (q72): a burst of outliers inflates mean and "
    "stddev and hides itself, but breaks down the median/MAD pair only "
    "past 50% contamination. Exact integer cents; two small group "
    "aggregates (median, then MAD) produce a |groups|-row table that "
    "BROADCASTS back over one fact scan — the fact table shuffles zero "
    "times. Spark medians via percentile() == DuckDB median (the "
    "q37-proven pairing).",
    oracle=_MAD_ORACLE,
)
def q103_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    med = cents.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("med_v")
    )
    mad = (
        cents.join(F.broadcast(med), "event_type")  # bounded: |event_types|
        .groupBy("event_type", "med_v")
        .agg(F.expr("percentile(abs(v - med_v), 0.5)").alias("mad_v"))
    )
    return (
        cents.join(F.broadcast(mad), "event_type")  # bounded: |event_types|
        .filter(F.abs(F.col("v") - F.col("med_v")) > _MAD_K * F.col("mad_v"))
        .select(
            "event_id",
            "event_type",
            fround(F.col("v") / 100.0, 2).alias("value"),
            fround(F.col("med_v") / 100.0, 2).alias("median_value"),
            fround(F.col("mad_v") / 100.0, 2).alias("mad_value"),
        )
    )


# --------------------------------------------------------------------------
# q110: decile gains table (lift analysis)
# --------------------------------------------------------------------------

_GAINS_ORACLE = f"""
WITH user_value AS (
  SELECT user_id,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS purchase_cents
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT *, ntile(5) OVER (ORDER BY purchase_cents DESC, user_id ASC) AS bucket
  FROM user_value
),
per_bucket AS (
  SELECT bucket,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(purchase_cents) AS BIGINT) AS bucket_cents
  FROM ranked GROUP BY bucket
)
SELECT bucket, n_users, bucket_cents,
       {sql_fround(
           "sum(bucket_cents) OVER (ORDER BY bucket ASC "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0 "
           "/ sum(bucket_cents) OVER ()", 6)} AS cum_share
FROM per_bucket
"""


@register(
    "q110_gains_table",
    "statistics",
    "Decile/quintile gains table (lift analysis): users ranked by "
    "purchase value into 5 equal-count buckets (deterministic ntile "
    "tie-break), each bucket's revenue and the cumulative share — 'the "
    "top 20% of users drive X% of revenue', the targeting/prioritization "
    "report of every growth team and the evaluation chart of every "
    "propensity model. The per-user rollup shuffles once; the quintile "
    "comes from a TWO-PHASE global rank (cent-stride coarse buckets + "
    "key-stride tie sub-buckets, functions/ranks.py) with NTILE(5) "
    "reconstructed exactly from (rank, n) — no window ever funnels the "
    "|users| rollup (or its zero-spend tie mass) through one task. The "
    "final cumulative window runs over the 5 bucket rows only.",
    oracle=_GAINS_ORACLE,
)
def q110_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    uv = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("purchase_cents")
    )
    # Global order (purchase_cents DESC, user_id ASC) as lex(b1, *b2,
    # user_id): negated stride, negated exact value, key stride.
    staged = uv.select(
        "user_id",
        "purchase_cents",
        F.expr(f"-(purchase_cents div {_RANK_CENT_STRIDE})").alias("__b1"),
        (-F.col("purchase_cents")).alias("__negc"),
        F.expr(f"user_id div {_RANK_KEY_STRIDE}").alias("__ub"),
    )
    ranked = two_phase_order_stats(
        staged,
        "__b1",
        [F.asc("user_id")],
        b2=["__negc", "__ub"],
        rank_alias="__rk",
        n_alias="__n",
    )
    per_bucket = (
        ranked.withColumn(
            "bucket",
            exact_ntile(F.col("__rk"), F.col("__n"), 5).cast("int"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("purchase_cents").alias("bucket_cents"),
        )
    )
    w_cum = Window.orderBy(F.col("bucket").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    return per_bucket.select(
        "bucket",
        "n_users",
        "bucket_cents",
        fround(
            F.sum("bucket_cents").over(w_cum) * 1.0
            / F.sum("bucket_cents").over(w_all),
            6,
        ).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# q111: A/B test analysis (two-proportion z-test on hash-split arms)
# --------------------------------------------------------------------------


def _ab_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    arm = f"CASE WHEN ({sql_md5_int32('CAST(user_id AS VARCHAR)')} % 2) = 0 THEN 'A' ELSE 'B' END"
    return f"""
WITH per_user AS (
  SELECT user_id, {arm} AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' AND value > 150
                       THEN 1 ELSE 0 END) AS BIGINT) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY arm
),
wide AS (
  SELECT
    max(CASE WHEN arm = 'A' THEN n_users END) AS na,
    max(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
    max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
    max(CASE WHEN arm = 'B' THEN n_converted END) AS cb
  FROM arms
)
SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
       {sql_fround("ca * 1.0 / na", 6)} AS rate_a,
       {sql_fround("cb * 1.0 / nb", 6)} AS rate_b,
       {sql_fround(
           "(ca * 1.0 / na - cb * 1.0 / nb) / "
           "sqrt(((ca + cb) * 1.0 / (na + nb)) * (1 - (ca + cb) * 1.0 / (na + nb)) "
           "* (1.0 / na + 1.0 / nb))", 4)} AS z_stat
FROM wide
"""


@register(
    "q111_ab_test",
    "statistics",
    "A/B experiment readout: users split into two arms by key hash (the "
    "same deterministic assignment the sampling family uses — stable "
    "under re-partitioning and re-runs, which per-partition RNG "
    "assignment is NOT), per-arm conversion (a high-value purchase), and the "
    "pooled two-proportion z-statistic. Float math only at finalize on "
    "identical integer operands. One per-user rollup shuffle + a "
    "two-row arm aggregate; the experimentation kernel with the "
    "assignment-determinism property experiments actually require.",
    oracle=_ab_oracle(),
)
def q111_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        md5_int32(F.col("user_id").cast("string")) % 2 == 0, "A"
    ).otherwise("B")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            ((F.col("event_type") == "purchase") & (F.col("value") > 150)).cast(
                "long"
            )
        ).alias("converted")
    ).select(arm.alias("arm"), "converted")
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("conv_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("conv_b"),
    )
    ra = F.col("conv_a") * 1.0 / F.col("n_a")
    rb = F.col("conv_b") * 1.0 / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    z = (ra - rb) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        fround(ra, 6).alias("rate_a"),
        fround(rb, 6).alias("rate_b"),
        fround(z, 4).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Poisson bootstrap replicates (confidence intervals at corpus scale)
# --------------------------------------------------------------------------

_BOOT_B = 16  # replicates
# Truncated-Poisson(1) weights via thresholds on md5 mod 1000:
# P(0)=0.368, P(1)=0.368, P(2)=0.264 (mass of >=2 folded into 2).
_BOOT_P0 = 368
_BOOT_P1 = 736


def _boot_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    h = sql_md5_int32("concat(CAST(doc_id AS VARCHAR), ':', CAST(b AS VARCHAR))")
    return f"""
WITH r AS (
  SELECT d.doc_id, d.n_chars, t.b,
         CASE WHEN {h} % 1000 < {_BOOT_P0} THEN 0
              WHEN {h} % 1000 < {_BOOT_P1} THEN 1
              ELSE 2 END AS w
  FROM documents d, generate_series(0, {_BOOT_B - 1}) AS t(b)
)
SELECT CAST(b AS BIGINT) AS replicate,
       CAST(sum(w) AS BIGINT) AS n_sampled,
       CAST(sum(w * n_chars) AS BIGINT) AS chars_total
FROM r
GROUP BY b
"""


@register(
    "stats_bootstrap_replicates",
    "statistics",
    f"Poisson-bootstrap replicates: every document contributes a "
    f"deterministic truncated-Poisson(1) weight to each of {_BOOT_B} "
    "replicates (portable hash of (doc_id, replicate) — no resampling "
    "pass, no shared RNG state), giving per-replicate corpus totals "
    "whose spread is the bootstrap standard error. THE way to put a "
    "confidence interval on a statistic of data too large to resample: "
    "one scan, weights computed row-locally, one partially-aggregated "
    "shuffle of B partials per partition; replicate draws are "
    "independent of partitioning, so the CI is reproducible anywhere.",
    oracle=_boot_oracle(),
)
def stats_bootstrap_replicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    reps = d.select(
        "doc_id",
        "n_chars",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BOOT_B - 1)),
                lambda b: md5_int32(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        b.cast("string"),
                    )
                )
                % 1000,
            )
        ).alias("b", "hmod"),
    ).select(
        "n_chars",
        F.col("b").cast("long").alias("replicate"),
        F.when(F.col("hmod") < _BOOT_P0, 0)
        .when(F.col("hmod") < _BOOT_P1, 1)
        .otherwise(2)
        .alias("w"),
    )
    return reps.groupBy("replicate").agg(
        F.sum("w").alias("n_sampled"),
        F.sum(F.col("w") * F.col("n_chars")).alias("chars_total"),
    )


# --------------------------------------------------------------------------
# q134: weighted median (exact lower weighted median per group)
# --------------------------------------------------------------------------

_WMEDIAN_ORACLE = """
WITH items AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
), ordered AS (
  SELECT l_returnflag, price_cents, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         sum(w) OVER (PARTITION BY l_returnflag) AS total_w
  FROM items
)
SELECT l_returnflag,
       CAST(max(total_w) AS BIGINT) AS total_weight,
       CAST(min(price_cents) AS BIGINT) AS median_cents,
       min(price_cents) / 100.0 AS weighted_median
FROM ordered
WHERE cum_w * 2 >= total_w
GROUP BY l_returnflag
"""


@register(
    "q134_weighted_median",
    "statistics",
    "Exact weighted median (lower): per return flag, the smallest price "
    "whose running quantity-weight reaches half the group's total — one "
    "RANGE-frame cumulative window (ties absorbed identically in both "
    "engines: the frame includes ALL rows at the same price, so the "
    "cumulative weight at a price point is well-defined regardless of "
    "intra-price row order), then a min over the qualifying suffix. All "
    "arithmetic is exact integers (price cents, integral quantity "
    "weights); the only float is the final exact /100 presentation "
    "division. One window shuffle by group; at scale the items would "
    "pre-aggregate to (group, price, sum w) first — same shape, smaller "
    "window input.",
    oracle=_WMEDIAN_ORACLE,
)
def q134_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    ordered = items.select(
        "l_returnflag",
        "price_cents",
        F.sum("w").over(wcum).alias("cum_w"),
        F.sum("w").over(wall).alias("total_w"),
    )
    return (
        ordered.filter(F.col("cum_w") * 2 >= F.col("total_w"))
        .groupBy("l_returnflag")
        .agg(
            F.max("total_w").alias("total_weight"),
            F.min("price_cents").alias("median_cents"),
            (F.min("price_cents") / F.lit(100.0)).alias("weighted_median"),
        )
    )


# --------------------------------------------------------------------------
# q135/q136: revenue concentration — Pareto deciles and Gini coefficient
# --------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT o_custkey, rev_cents,
         row_number() OVER (ORDER BY rev_cents DESC, o_custkey ASC) AS rk,
         count(*) OVER () AS n,
         sum(rev_cents) OVER () AS total
  FROM cust
), cum AS (
  SELECT ((rk - 1) * 10 // n) + 1 AS decile, rev_cents, total,
         sum(rev_cents) OVER (ORDER BY rk
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
  FROM ranked
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(rev_cents) AS BIGINT) AS decile_rev_cents,
       CAST(max(cum_rev) AS BIGINT) AS cum_rev_cents,
       floor(max(cum_rev) * 1.0 / max(total) * 1000000 + 0.5) / 1000000
         AS cum_share
FROM cum GROUP BY 1
"""


@register(
    "q135_pareto_curve",
    "statistics",
    "Revenue concentration (Pareto/ABC audit): customers ranked by exact "
    "cents revenue descending (custkey tie-break), bucketed into rank "
    "deciles, with each decile's revenue and the cumulative share at its "
    "boundary — the 80/20 curve as a declared query. All integers until "
    "the final share division of two exact BIGINTs. Aggregate-then-rank, "
    "then TWO-PHASE: the customer rollup is one partially-aggregated "
    "shuffle; rank AND running revenue come from the shared two-phase "
    "kernel (functions/ranks.py — cent-stride coarse buckets, tie "
    "sub-buckets, size-gated prefix offsets), so no window ever sees the "
    "|customers| rollup in one partition — at 100 TB both the rank and "
    "the cumulative sum stay parallel across strides.",
    oracle=_PARETO_ORACLE,
)
def q135_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
            "rev_cents"
        )
    )
    # Global order (rev_cents DESC, o_custkey ASC) as lex buckets:
    # negated cent stride, negated exact value, key stride.
    staged = cust.select(
        "o_custkey",
        "rev_cents",
        F.expr(f"-(rev_cents div {_RANK_CENT_STRIDE})").alias("__b1"),
        (-F.col("rev_cents")).alias("__negv"),
        F.expr(f"o_custkey div {_RANK_KEY_STRIDE}").alias("__kb"),
    )
    ranked = two_phase_order_stats(
        staged,
        "__b1",
        [F.asc("o_custkey")],
        b2=["__negv", "__kb"],
        value_col="rev_cents",
        rank_alias="rk",
        n_alias="n",
        cumsum_alias="cum_rev",
        total_alias="total",
    )
    cum = ranked.select(
        # Integral div (round-11): the oracle's `(rk - 1) * 10 // n`;
        # rank and count are non-negative, exact past 2^53.
        idiv((F.col("rk") - 1) * 10, F.col("n")).alias("decile_0"),
        "rev_cents",
        "total",
        "cum_rev",
    ).select(
        (F.col("decile_0") + 1).alias("decile"), "rev_cents", "total", "cum_rev"
    )
    return cum.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_cents").alias("decile_rev_cents"),
        F.max("cum_rev").alias("cum_rev_cents"),
        fround(F.max("cum_rev") * F.lit(1.0) / F.max("total"), 6).alias("cum_share"),
    )


_GINI_ORACLE = """
WITH cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT rev_cents,
         row_number() OVER (ORDER BY rev_cents ASC, o_custkey ASC) AS i,
         count(*) OVER () AS n
  FROM cust
)
SELECT CAST(max(n) AS BIGINT) AS n_customers,
       CAST(sum(rev_cents) AS BIGINT) AS total_cents,
       floor((2.0 * sum(CAST(i AS BIGINT) * rev_cents)
              / (max(n) * 1.0 * sum(rev_cents))
              - (max(n) + 1.0) / max(n)) * 1000000 + 0.5) / 1000000 AS gini
FROM ranked
"""


@register(
    "q136_gini",
    "statistics",
    "Gini coefficient of customer revenue: G = 2*sum(i*x_i)/(n*sum(x)) "
    "- (n+1)/n over ascending-sorted exact cents (custkey tie-break — "
    "ties contribute identically under any stable rank assignment since "
    "equal x share the bracket sum). The rank-weighted sum accumulates "
    "as exact integers; float math happens once at finalize on identical "
    "operands. Aggregate-then-rank like the Pareto curve, with the rank "
    "from the shared TWO-PHASE kernel (functions/ranks.py — cent-stride "
    "coarse buckets, tie sub-buckets, size-gated prefix offsets): no "
    "window ever sees the |customers| rollup in one partition.",
    oracle=_GINI_ORACLE,
)
def q136_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
            "rev_cents"
        )
    )
    # Global order (rev_cents ASC, o_custkey ASC) as lex buckets.
    staged = cust.select(
        "o_custkey",
        "rev_cents",
        F.expr(f"rev_cents div {_RANK_CENT_STRIDE}").alias("__b1"),
        F.expr(f"o_custkey div {_RANK_KEY_STRIDE}").alias("__kb"),
    )
    ranked = two_phase_order_stats(
        staged,
        "__b1",
        [F.asc("o_custkey")],
        b2=["rev_cents", "__kb"],
        rank_alias="i",
        n_alias="n",
    ).select("rev_cents", "i", "n")
    nmax = F.max("n")
    total = F.sum("rev_cents")
    gini = (
        F.lit(2.0) * F.sum(F.col("i") * F.col("rev_cents"))
        / (nmax * F.lit(1.0) * total)
        - (nmax + F.lit(1.0)) / nmax
    )
    return ranked.agg(
        nmax.alias("n_customers"),
        total.alias("total_cents"),
        fround(gini, 6).alias("gini"),
    )


# --------------------------------------------------------------------------
# q163: log-linear histogram quantile sketch (HdrHistogram/DDSketch family)
# --------------------------------------------------------------------------

_HQ_SUB = 16  # linear sub-buckets per power-of-two octave
_HQ_PCTS = (50, 90, 99)

_HQ_ORACLE = f"""
WITH c AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE floor(value * 100 + 0.5) >= 1
), r AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type, CAST(p.pct AS BIGINT) AS pct,
       CAST(max(n) AS BIGINT) AS n_values,
       CAST(min(CASE WHEN rn = CAST(ceil(p.pct * n / 100.0) AS BIGINT)
                     THEN cents END) AS BIGINT) AS exact_q_cents,
       CAST(1 AS BIGINT) AS bound_ok
FROM r CROSS JOIN (SELECT unnest([{", ".join(str(p) for p in _HQ_PCTS)}]) AS pct) p
GROUP BY 1, 2
"""


def hq_bin_columns(cents_col):
    """Integer-exact log-linear bucketing: octave k = floor(log2 cents)
    via length(bin(x)) - 1 (identical in Spark and DuckDB), then
    ``_HQ_SUB`` LINEAR sub-buckets inside the octave — every boundary
    is the exact rational 2^k * (SUB + s) / SUB, so bucket assignment
    is pure BIGINT arithmetic with no ln()/float boundary drift.
    Returns (bin_id, lo16, hi16) where lo16/hi16 are 16x the bin
    bounds (kept scaled so the bound check stays integral)."""
    k = (F.length(F.expr(f"bin({cents_col})")) - 1).cast("int")
    base = F.expr(f"shiftleft(CAST(1 AS BIGINT), length(bin({cents_col})) - 1)")
    # Integral div (round-11, verdict residual): the docstring's "pure
    # BIGINT arithmetic" promise previously leaked through a double
    # division (exact only below 2^53); operands are non-negative
    # (cents >= base by construction of the octave).
    s = idiv((F.col(cents_col) - base) * _HQ_SUB, base)
    bin_id = (k.cast("long") * _HQ_SUB + s).alias("bin_id")
    lo16 = (base * (F.lit(_HQ_SUB) + s)).alias("lo16")
    hi16 = (base * (F.lit(_HQ_SUB + 1) + s)).alias("hi16")
    return bin_id, lo16, hi16


def hq_quantiles_from_bins(bins: DataFrame, exact: DataFrame) -> DataFrame:
    """Finalize quantiles from a (event_type, bin_id, lo16, hi16, c)
    count grid — the shared path for the batch sketch and the
    streaming twin's additive store. For each target percentile the
    selected bin is the first whose cumulative count reaches
    ceil(pct*n/100); the exact anchor must land inside that bin's
    [lo16/16, hi16/16) bounds, asserted in scaled integers."""
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = bins.select(
        "event_type",
        "bin_id",
        "lo16",
        "hi16",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    # One explode instead of a |pcts|-way union of tagged copies
    # (round-11): the union duplicated the whole bins subtree — count
    # grid aggregate plus both windows — once per percentile in the
    # physical plan (ReuseExchange did not dedupe it). Exploding a
    # literal percentile array produces the identical row multiset
    # (cum x pcts) from ONE evaluation of the subtree.
    pcts = cum.select(
        "*",
        F.explode(
            F.array([F.lit(p).cast("long") for p in _HQ_PCTS])
        ).alias("pct"),
    ).withColumn(
        "target",
        # float-by-design: oracle computes ceil(pct * n / 100.0) in double
        F.ceil(F.col("pct") * F.col("n") / F.lit(100.0)).cast("long"),
    )
    wsel = Window.partitionBy("event_type", "pct").orderBy("bin_id")
    selected = (
        pcts.filter(F.col("cum") >= F.col("target"))
        .withColumn("rk", F.row_number().over(wsel))
        .filter(F.col("rk") == 1)
        .select("event_type", "pct", "lo16", "hi16", F.col("n").alias("n_values"))
    )
    joined = selected.join(exact, ["event_type", "pct"])
    q16 = F.col("exact_q_cents") * 16
    ok = ((F.col("lo16") <= q16) & (q16 < F.col("hi16"))).cast("bigint")
    return joined.select(
        "event_type", "pct", "n_values", "exact_q_cents", ok.alias("bound_ok")
    )


def hq_exact_anchors(ev: DataFrame) -> DataFrame:
    """Exact lower quantiles per type — the oracle-reproducible anchor."""
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    c = ev.select("event_type", cents.alias("cents")).filter(F.col("cents") >= 1)
    wrn = Window.partitionBy("event_type").orderBy("cents")
    wall = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(wrn).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    # One pass instead of a |pcts|-way union of filters (round-11): the
    # union evaluated the rank subtree — a full per-type sort of every
    # event row — once per percentile (measured: 5 parquet scans and 5
    # sort+window chains of the events table in q163's plan). A per-row
    # array filter keeps the percentiles each row anchors (usually
    # none; at most a few on tiny types), then explodes only those —
    # identical row multiset, ONE sort.
    pct_arr = F.array([F.lit(p).cast("long") for p in _HQ_PCTS])
    anchored = r.select(
        "event_type",
        "cents",
        F.filter(
            pct_arr,
            lambda p: F.col("rn")
            # float-by-design: oracle computes ceil(pct * n / 100.0) in double
            == F.ceil(p * F.col("n") / F.lit(100.0)).cast("long"),
        ).alias("ps"),
    ).filter(F.size("ps") > 0)
    return anchored.select(
        "event_type",
        F.explode("ps").alias("pct"),
        F.col("cents").alias("exact_q_cents"),
    )


@register(
    "q163_histogram_quantiles",
    "statistics",
    f"Log-linear histogram quantile sketch (the HdrHistogram/DDSketch "
    f"family): values bucket into {_HQ_SUB} linear sub-buckets per "
    "power-of-two octave with PURE INTEGER boundary arithmetic (octave "
    "from length(bin(x)) — no ln(), so no float boundary drift between "
    "engines), counts reduce to a tiny additive (type, bin) grid, and "
    "each percentile reads off the first bin whose cumulative count "
    "reaches its rank target — relative error bounded by the 1/16 "
    "sub-bucket width. Exact lower-quantile anchors ride along with a "
    "flag asserting each anchor lands inside its selected bin, so the "
    "hash verifies the whole sketch pipeline (bucket map, merge, "
    "cumulative select). This is the production percentile path at "
    "100 TB: the bin grid is re-aggregatable (counts add across "
    "partitions, hours, days), unlike percentile_approx whose "
    "partials cannot be stored and re-merged across queries.",
    oracle=_HQ_ORACLE,
)
def q163_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    c = ev.select("event_type", cents.alias("cents")).filter(F.col("cents") >= 1)
    bin_id, lo16, hi16 = hq_bin_columns("cents")
    bins = (
        c.select("event_type", bin_id, lo16, hi16)
        .groupBy("event_type", "bin_id", "lo16", "hi16")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return hq_quantiles_from_bins(bins, hq_exact_anchors(ev))
