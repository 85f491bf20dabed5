"""Round-3 session-2 analytics operators.

Time-series and corpus analytics that a training-data / telemetry
pipeline runs on top of the relational core, each with a DuckDB oracle
twin:

- ``q70_gapfill_locf`` — gap-fill a per-key daily series onto a dense
  date grid (``sequence`` + explode, no driver loop) and fill missing
  days by last-observation-carried-forward; the TimescaleDB
  ``time_bucket_gapfill``/``locf`` analog.
- ``q71_event_transitions`` — first-order Markov transition counts
  between consecutive event types per user (one window shuffle, one
  partial-aggregated count shuffle); behavioral-analytics kernel.
- ``q72_zscore_anomaly`` — rolling z-score outlier detection over a
  trailing ROWS window per event type (the streaming-friendly frame:
  bounded state, no future peeking).
- ``text_lm_score`` — unigram language-model surprisal per document
  (avg -ln p(token) under the corpus unigram distribution); the classic
  cheap "perplexity-ish" quality signal for pre-training corpora. The
  only corpus-sized shuffle is the token count; the vocab table and the
  total-count scalar broadcast back.
- ``sample_weighted`` — deterministic probability-proportional-to-size
  (PPS) Bernoulli sampling: inclusion iff
  ``md5_uint32(key) % M < weight * c`` — exact integer arithmetic, so
  membership is reproducible across engines, partitionings, and
  re-runs, with Horvitz-Thompson weights emitted for unbiased
  downstream estimates.

Scale notes (100 TB): gap-fill grids are |keys| x |days| — generated
rows never shuffle (explode is map-side; the join keys on (user, day)
already carry the grid's partitioning). Transition counting and
z-scores shuffle once by their partition key. LM scoring broadcasts
|vocab| rows, never the corpus. PPS sampling is scan-local and pushes
its predicate into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.hashing import md5_int32, sql_md5_int32
from spark_stream_kudu_spark.functions.rounding import fround, idiv, sql_fround
from spark_stream_kudu_spark.functions.textutil import sql_tokens, tokens
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.functions.lineage import pin as _pin


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "events")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Gap-fill + last-observation-carried-forward
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = f"""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         {sql_fround("sum(value)", 2)} AS day_rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT g.user_id, g.day,
       CAST(daily.day_rev IS NULL AS INT) AS filled,
       coalesce(last_value(daily.day_rev IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS rev_locf
FROM grid g
LEFT JOIN daily ON g.user_id = daily.user_id AND g.day = daily.day
"""


@register(
    "q70_gapfill_locf",
    "timeseries",
    "Dense daily revenue series per user, single-pass: aggregate purchases "
    "to days, lead() to each observation's successor day, then explode "
    "sequence(day, next_day - 1) — every generated gap day CARRIES its "
    "observation's value, so gap-filling and last-observation-carried-"
    "forward fuse into one map-side Generate. The time_bucket_gapfill/locf "
    "analog with exactly one scan, one aggregate shuffle, and one window "
    "shuffle (both keyed by user) — no dense-grid self-join, no second "
    "pass over the fact table.",
    oracle=_GAPFILL_ORACLE,
)
def q70_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(fround(F.sum("value"), 2).alias("day_rev"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    # Each observed day owns the half-open run [day, next_day); the last
    # observation owns only itself (the grid ends at max(day)).
    runs = daily.withColumn(
        "run_end",
        F.coalesce(
            F.date_sub(F.lead("day").over(w), 1), F.col("day")
        ),
    )
    return runs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("run_end"), F.expr("interval 1 day"))
        ).alias("grid_day"),
        "day",
        "day_rev",
    ).select(
        "user_id",
        F.col("grid_day").alias("day"),
        (F.col("grid_day") != F.col("day")).cast("int").alias("filled"),
        F.col("day_rev").alias("rev_locf"),
    )


# --------------------------------------------------------------------------
# Markov transition counts
# --------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM ordered WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


@register(
    "q71_event_transitions",
    "timeseries",
    "First-order Markov transition matrix of user event sequences: lag() "
    "per user over (ts, event_id) — the unique-ordering tie-break that keeps "
    "both engines deterministic — then count (prev, next) pairs. One window "
    "shuffle by user_id, one partially-aggregated count shuffle over at most "
    "|event_types|^2 groups.",
    oracle=_TRANSITIONS_ORACLE,
)
def q71_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection
# --------------------------------------------------------------------------

_Z_WINDOW = 50  # trailing observations per event type
_Z_MIN_PREV = 20  # warm-up: need this many priors before scoring
_Z_THRESHOLD = 2.5

_ZSCORE_ORACLE = f"""
WITH w AS (
  SELECT event_id, event_type, value,
         avg(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_Z_WINDOW} PRECEDING AND 1 PRECEDING) AS mu,
         stddev_samp(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_Z_WINDOW} PRECEDING AND 1 PRECEDING) AS sd,
         count(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_Z_WINDOW} PRECEDING AND 1 PRECEDING) AS n_prev
  FROM events
)
SELECT event_id, event_type, value,
       {sql_fround("(value - mu) / sd", 4)} AS z
FROM w
WHERE n_prev >= {_Z_MIN_PREV} AND sd > 1e-9
  AND abs((value - mu) / sd) > {_Z_THRESHOLD}
"""


@register(
    "q72_zscore_anomaly",
    "timeseries",
    f"Rolling z-score outliers: per event type, each value scored against "
    f"the trailing {_Z_WINDOW}-observation mean/stddev (ROWS frame ending at "
    f"1 PRECEDING — no self-inclusion, no future peeking, so the same logic "
    f"lifts to a stateful streaming operator with bounded state), flag "
    f"|z| > {_Z_THRESHOLD} after a {_Z_MIN_PREV}-row warm-up. One window "
    f"shuffle by event_type; skewed types would salt by coarse time bucket.",
    oracle=_ZSCORE_ORACLE,
)
def q72_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    frame = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_WINDOW, -1)
    )
    z = (F.col("value") - F.avg("value").over(frame)) / F.stddev_samp(
        "value"
    ).over(frame)
    return (
        ev.select(
            "event_id",
            "event_type",
            "value",
            F.count("value").over(frame).alias("n_prev"),
            F.stddev_samp("value").over(frame).alias("sd"),
            z.alias("z_raw"),
        )
        .filter(
            (F.col("n_prev") >= _Z_MIN_PREV)
            & (F.col("sd") > 1e-9)
            & (F.abs("z_raw") > _Z_THRESHOLD)
        )
        .select("event_id", "event_type", "value", fround("z_raw", 4).alias("z"))
    )


# --------------------------------------------------------------------------
# Unigram LM surprisal (quality scoring)
# --------------------------------------------------------------------------

_LM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens("text")}) AS tok FROM documents
), tc AS (
  SELECT tok, count(*) AS c FROM toks GROUP BY 1
), tot AS (
  SELECT count(*) AS n FROM toks
)
SELECT t.doc_id, count(*) AS n_tokens,
       {sql_fround("avg(-ln(tc.c / tot.n))", 6)} AS lm_score
FROM toks t JOIN tc ON t.tok = tc.tok CROSS JOIN tot
GROUP BY 1
"""


@register(
    "text_lm_score",
    "text",
    "Unigram LM surprisal per document: corpus token counts (the one "
    "corpus-sized shuffle), then avg -ln p(token) per doc with the vocab "
    "table and total-count scalar broadcast back onto the exploded tokens — "
    "the cheap perplexity proxy used to quality-filter pre-training data "
    "(low = stereotyped/boilerplate, high = rare-token noise). Surprisal "
    "values are irrational, so ulp-level accumulation differences sit far "
    "from fround tie points at 6 decimals.",
    oracle=_LM_ORACLE,
)
def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.lineage import pin as _pin

    docs = _docs(spark, sf_dir)
    # Lazy pins (round-11): the exploded token table feeds the vocab
    # aggregate AND the scoring join, and the vocab feeds its total AND
    # the join — the plan tokenized the corpus three times (3 parquet
    # scans -> 1). Compute-once via pin(eager=False), no barrier.
    toks = _pin(
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        ),
        eager=False,
    )
    tc = _pin(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")), eager=False
    )
    # Total token count derives from the vocab aggregate (sum of counts),
    # not a third corpus pass — the shared tc subtree's shuffle is reused.
    tot = tc.agg(F.sum("c").alias("n"))
    return (
        # tc is |vocab| (corpus-scaling): un-hinted — its groupBy
        # exchange co-partitions with this join key, so the planner
        # reuses the shuffle / AQE broadcasts from runtime size.
        toks.join(tc, "tok")
        .join(F.broadcast(tot))  # bounded: 1-row total
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            fround(F.avg(-F.log(F.col("c") / F.col("n"))), 6).alias("lm_score"),
        )
    )


# --------------------------------------------------------------------------
# Weighted (PPS) deterministic sampling
# --------------------------------------------------------------------------

_PPS_MOD = 100_000
_PPS_SCALE = 100  # inclusion prob = n_chars * 100 / 100_000 = n_chars / 1000

_PPS_ORACLE = f"""
SELECT doc_id, n_chars,
       n_chars / 1000.0 AS p_include,
       1000.0 / n_chars AS ht_weight
FROM documents
WHERE {sql_md5_int32("CAST(doc_id AS VARCHAR)")} % {_PPS_MOD}
      < n_chars * {_PPS_SCALE}
"""


@register(
    "sample_weighted",
    "sampling",
    "Probability-proportional-to-size Bernoulli sample: include a document "
    f"iff md5_uint32(key) % {_PPS_MOD} < n_chars * {_PPS_SCALE} — inclusion "
    "probability scales with document length using EXACT integer "
    "arithmetic, so membership is bit-reproducible across engines and "
    "partitionings (no RNG, no float threshold). Emits the inclusion "
    "probability and Horvitz-Thompson weight (1/p) so downstream "
    "aggregates stay unbiased. Scan-local; the predicate pushes down.",
    oracle=_PPS_ORACLE,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    h = md5_int32(F.col("doc_id").cast("string")) % _PPS_MOD
    return docs.filter(h < F.col("n_chars") * _PPS_SCALE).select(
        "doc_id",
        "n_chars",
        (F.col("n_chars") / F.lit(1000.0)).alias("p_include"),
        (F.lit(1000.0) / F.col("n_chars")).alias("ht_weight"),
    )


# --------------------------------------------------------------------------
# q81: bloom-filter pre-filtered join
# --------------------------------------------------------------------------

_BLOOM_ORACLE = """
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
"""


_BLOOM_BUCKETS = 1 << 16  # compressed key space for the membership pre-filter


@register(
    "q81_bloom_join",
    "analytics",
    "Membership-pre-filtered join (manual runtime filter): the selective "
    "side (urgent orders) compresses its join keys into distinct hash "
    f"buckets (md5 % {_BLOOM_BUCKETS} — a one-hash bloom filter whose "
    "'bits' are a broadcastable distinct-bucket set), and the fact scan "
    "is semi-join-pruned against that broadcast BEFORE the join shuffle. "
    "False positives (bucket collisions) pass the pre-filter but are "
    "dropped by the exact join, so the result is EXACTLY the plain join "
    "— which is what the oracle checks. The declared form of Spark's "
    "runtime-filter optimization: at 100 TB shuffle volume drops from "
    "|fact| to ~|matching fact| rows for one tiny broadcast; the win "
    "grows with fact:build selectivity skew.",
    oracle=_BLOOM_ORACLE,
    bench=True,
)
def q81_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    buckets = (
        o.select(
            (md5_int32(F.col("o_orderkey").cast("string")) % _BLOOM_BUCKETS).alias("b")
        ).distinct()
    )
    pruned = li.join(
        F.broadcast(buckets),  # bounded: <= _BLOOM_BUCKETS distinct rows
        (md5_int32(F.col("l_orderkey").cast("string")) % _BLOOM_BUCKETS) == F.col("b"),
        "left_semi",
    )
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    return (
        pruned.join(o.select("o_orderkey"), pruned["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# q82: market share (TPC-H Q8 shape)
# --------------------------------------------------------------------------

_SHARE_NATION = "CHINA"

_SHARE_ORACLE = f"""
SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       {sql_fround(
           "sum(CASE WHEN n.n_name = '" + _SHARE_NATION + "' THEN "
           "CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT) "
           "ELSE 0 END) * 1.0 / "
           "sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT))", 6)}
         AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY 1
"""


@register(
    "q82_market_share",
    "analytics",
    f"Market share (TPC-H Q8 shape): {_SHARE_NATION}'s fraction of total "
    "revenue per order year — conditional numerator and unconditional "
    "denominator in ONE aggregation pass (no second scan, no self-join), "
    "revenue in exact integer cents so the ratio is engine-stable. Joins "
    "flow fact -> orders (shuffle on orderkey) with customer and nation "
    "broadcast; one final one-shuffle rollup on year.",
    oracle=_SHARE_ORACLE,
)
def q82_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        # customer is entity-scale: un-hinted (stats/AQE decide).
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .select(
            F.year("o_orderdate").alias("o_year"),
            rev.alias("rev_cents"),
            F.col("n_name"),
        )
    )
    num = F.sum(
        F.when(F.col("n_name") == _SHARE_NATION, F.col("rev_cents")).otherwise(F.lit(0))
    )
    den = F.sum("rev_cents")
    return j.groupBy("o_year").agg(
        fround(num * 1.0 / den, 6).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# q83: rolling median over a trailing bounded frame
# --------------------------------------------------------------------------

_MEDIAN_FRAME = 50  # trailing window: current row + 49 preceding

_ROLLMED_ORACLE = f"""
SELECT event_id, event_type,
       {sql_fround(
           "median(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER "
           "(PARTITION BY event_type ORDER BY ts ASC, event_id ASC "
           f"ROWS BETWEEN {_MEDIAN_FRAME - 1} PRECEDING AND CURRENT ROW) / 100.0", 2)}
         AS rolling_median
FROM events
"""


@register(
    "q83_rolling_median",
    "analytics",
    f"Rolling median of event value over a trailing {_MEDIAN_FRAME}-row "
    "frame per event type — the robust (outlier-immune) sibling of the "
    "rolling mean/z-score (q72). Spark has no native windowed median, so "
    "the engine composes collect_list over the bounded frame + array_sort "
    "+ exact middle-element arithmetic on integer cents (identical in "
    "both engines; even-sized frames average the two middles). State per "
    f"row is bounded by the {_MEDIAN_FRAME}-row frame — O(frame), not "
    "O(partition) — so the window scales to arbitrarily long histories; "
    "one shuffle on the partition key.",
    oracle=_ROLLMED_ORACLE,
)
def q83_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-(_MEDIAN_FRAME - 1), Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(cents).over(w))
    n = F.size(arr)
    # Median picks via integral div (round-11, verdict residual): n is
    # the non-negative frame size, idiv == the old double-div + cast.
    mid_hi = F.element_at(arr, (idiv(n, 2) + 1).cast("int"))
    mid_lo = F.element_at(arr, idiv(n + 1, 2).cast("int"))
    med_cents = (mid_lo + mid_hi) / 2.0
    return ev.select(
        "event_id",
        "event_type",
        fround(med_cents / 100.0, 2).alias("rolling_median"),
    )


# --------------------------------------------------------------------------
# q84: trending items (top-k per time window)
# --------------------------------------------------------------------------

_TREND_K = 3

_TREND_ORACLE = f"""
WITH w AS (
  SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket_ms
                               ORDER BY n_events DESC, event_type ASC) AS rank
  FROM w
)
SELECT bucket_ms, event_type, n_events, rank FROM r WHERE rank <= {_TREND_K}
"""


@register(
    "q84_trending",
    "analytics",
    f"Trending items: top-{_TREND_K} event types per hourly window by "
    "count, deterministic tie-break — the leaderboard/trending kernel "
    "(windowed heavy hitters). One partially-aggregated count shuffle on "
    "(window, item), then a rank window over the already-aggregated "
    "|windows| x |types| rows — the expensive stage is the count, and it "
    "map-side combines; the rank never touches raw events. The batch twin "
    "of a per-window streaming leaderboard (same aggregate under a "
    "tumbling event-time window).",
    oracle=_TREND_ORACLE,
    bench=True,
)
def q84_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    counts = (
        ev.groupBy(
            F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias("bucket_ms"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("bucket_ms").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TREND_K)
        .select("bucket_ms", "event_type", "n_events", "rank")
    )


# --------------------------------------------------------------------------
# q87: skyline / Pareto front
# --------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents,
         CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
           AS day_no
  FROM orders
)
SELECT a.o_orderkey, a.o_custkey, a.price_cents, a.day_no
FROM o a
WHERE NOT EXISTS (
  SELECT 1 FROM o b
  WHERE b.day_no < a.day_no AND b.price_cents >= a.price_cents
)
"""


@register(
    "q87_skyline",
    "analytics",
    "2-D skyline (Pareto front): orders not dominated by any EARLIER "
    "order of equal-or-higher price (minimize date, maximize price) — "
    "the multi-objective shortlist query. The oracle states it as the "
    "textbook O(n^2) NOT EXISTS; the engine exploits that the RANGE "
    "frame ending one day earlier makes the dominating max a pure "
    "function of the DAY (same-day rows never dominate each other, "
    "matching the strict inequality): per-day maxima aggregate "
    "scan-locally, an exclusive prefix max runs over the |days|-row "
    "rollup only (the one bounded single-partition window), and the "
    "broadcast prior-max joins back for a scan-local filter — the fact "
    "table is never globally sorted at all (the previous form's global "
    "RANGE window WAS a single-partition funnel: Spark plans any "
    "unpartitioned window as Exchange SinglePartition, range-"
    "partitioned sorts exist only for ORDER BY).",
    oracle=_SKYLINE_ORACLE,
)
def q87_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("day_no"),
    )
    day_max = o.groupBy("day_no").agg(
        F.max("price_cents").alias("__day_max")
    )
    w_prior = Window.orderBy("day_no").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = day_max.select(
        "day_no", F.max("__day_max").over(w_prior).alias("prior_max")
    )
    return (
        o.join(F.broadcast(prior), "day_no")  # bounded: |days| rollup
        .filter(
            F.col("prior_max").isNull()
            | (F.col("price_cents") > F.col("prior_max"))
        )
        .select("o_orderkey", "o_custkey", "price_cents", "day_no")
    )


# --------------------------------------------------------------------------
# q88: time-weighted average (TWAP)
# --------------------------------------------------------------------------

_TWAP_ORACLE = f"""
WITH seg AS (
  SELECT user_id, value, epoch_ms(ts) AS t0,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(t1 - t0) AS BIGINT) AS span_ms,
       {sql_fround(
           "sum(CAST(floor(value * 10000 + 0.5) AS BIGINT) * (t1 - t0)) * 1.0 "
           "/ sum(t1 - t0) / 10000", 6)} AS twap
FROM seg WHERE t1 IS NOT NULL
GROUP BY user_id
"""


@register(
    "q88_twap",
    "analytics",
    "Time-weighted average value per user (TWAP): each observation holds "
    "until the next one (lead over the per-user timeline), so the mean "
    "weights each value by its holding duration — the correct average "
    "for irregularly-sampled series, where the arithmetic mean "
    "over-weights bursts. Numerator accumulates exact integer "
    "(value_e4 x duration_ms) products; ONE window shuffle + one "
    "aggregate on the same user_id partitioning, so Catalyst plans a "
    "single exchange. The financial/telemetry downsampling kernel "
    "(TWAP/VWAP family).",
    oracle=_TWAP_ORACLE,
)
def q88_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("v_e4"),
        F.unix_millis("ts").alias("t0"),
        F.lead(F.unix_millis("ts")).over(w).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    dur = F.col("t1") - F.col("t0")
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(dur).alias("span_ms"),
            fround(
                F.sum(F.col("v_e4") * dur) * 1.0 / F.sum(dur) / 10000, 6
            ).alias("twap"),
        )
    )


# --------------------------------------------------------------------------
# q90: unpivot / melt (wide -> long reshape)
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
WITH parts AS (
  SELECT 'extended_cents' AS component,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  UNION ALL
  SELECT 'discount_cents',
         CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'tax_cents',
         CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100 + 0.5) AS BIGINT)
  FROM lineitem
)
SELECT component,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM parts GROUP BY component
"""


@register(
    "q90_unpivot",
    "analytics",
    "Unpivot / melt (wide -> long reshape): each line item's three charge "
    "components become three (component, cents) rows via the native "
    "unpivot operator (Expand node — map-side, zero shuffle), then roll "
    "up per component. The inverse of q33_pivot, closing the reshape "
    "surface; the oracle states it as the classic 3x UNION ALL re-scan, "
    "the engine scans ONCE. Long-form output is what feature stores and "
    "plotting/QA pipelines ingest.",
    oracle=_UNPIVOT_ORACLE,
)
def q90_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")
    wide = li.select(
        cents(F.col("l_extendedprice")).alias("extended_cents"),
        cents(F.col("l_extendedprice") * F.col("l_discount")).alias("discount_cents"),
        cents(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")
        ).alias("tax_cents"),
    )
    long = wide.unpivot(
        [], ["extended_cents", "discount_cents", "tax_cents"], "component", "cents"
    )
    return long.groupBy("component").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("total_cents"),
    )


# --------------------------------------------------------------------------
# q91: period-over-period growth
# --------------------------------------------------------------------------

_GROWTH_ORACLE = f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(month(o_orderdate) AS INTEGER) AS o_month,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_year, o_month, revenue_cents,
       {sql_fround(
           "(revenue_cents - lag(revenue_cents) OVER (ORDER BY o_year, o_month))"
           " * 1.0 / lag(revenue_cents) OVER (ORDER BY o_year, o_month)", 6)}
         AS mom_growth
FROM monthly
"""


@register(
    "q91_growth",
    "analytics",
    "Period-over-period growth: monthly revenue with month-over-month "
    "percentage change (lag over the aggregated series). The global-"
    "ordering window runs over |months| rows — the fact table never "
    "enters the single-partition window, only the partially-aggregated "
    "rollup does (aggregate first, window the rollup: the pattern that "
    "keeps trend reporting cheap at any fact scale). First month's "
    "growth is NULL by definition and preserved.",
    oracle=_GROWTH_ORACLE,
)
def q91_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias(
            "revenue_cents"
        )
    )
    w = Window.orderBy("o_year", "o_month")
    prev = F.lag("revenue_cents").over(w)
    return monthly.select(
        "o_year",
        "o_month",
        "revenue_cents",
        fround((F.col("revenue_cents") - prev) * 1.0 / prev, 6).alias("mom_growth"),
    )


# --------------------------------------------------------------------------
# q92: max concurrency (sweep-line over implied intervals)
# --------------------------------------------------------------------------

_CONC_HOLD_MS = 1_800_000  # each event holds a session open 30 min

_CONC_ORACLE = f"""
WITH pts AS (
  SELECT user_id, epoch_ms(ts) AS t, 1 AS delta FROM events
  UNION ALL
  SELECT user_id, epoch_ms(ts) + {_CONC_HOLD_MS}, -1 FROM events
),
sweep AS (
  SELECT user_id,
         sum(delta) OVER (PARTITION BY user_id ORDER BY t ASC, delta ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS active
  FROM pts
)
SELECT user_id, CAST(max(active) AS BIGINT) AS max_concurrent
FROM sweep GROUP BY user_id
"""


@register(
    "q92_max_concurrency",
    "analytics",
    "Maximum concurrent open sessions per user (each event holds a "
    "30-minute interval): the classic sweep-line — unpivot each interval "
    "to (+1 start, -1 end) points, running sum per user with ends "
    "ordered before starts at the same instant (back-to-back intervals "
    "do not overlap), max of the running count. O(n log n) via one "
    "window sort instead of the quadratic interval self-join; point "
    "generation is a map-side Expand, so the plan is one shuffle on "
    "user_id. The double-booking / capacity-planning kernel.",
    oracle=_CONC_ORACLE,
)
def q92_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    t = F.unix_millis("ts")
    pts = ev.select(
        "user_id", t.alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        ev.select(
            "user_id",
            (t + F.lit(_CONC_HOLD_MS)).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("delta").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.withColumn("active", F.sum("delta").over(w))
        .groupBy("user_id")
        .agg(F.max("active").alias("max_concurrent"))
    )


# --------------------------------------------------------------------------
# q94: sequential pattern detection (CEP / MATCH_RECOGNIZE analog)
# --------------------------------------------------------------------------

_CEP_HORIZON_MS = 3_600_000  # view must precede purchase by <= 1h

_CEP_ORACLE = f"""
SELECT p.event_id AS purchase_id, p.user_id, epoch_ms(p.ts) AS purchase_ms
FROM events p
WHERE p.event_type = 'purchase'
  AND EXISTS (
    SELECT 1 FROM events v
    WHERE v.user_id = p.user_id AND v.event_type = 'view'
      AND v.ts <= p.ts
      AND epoch_ms(v.ts) >= epoch_ms(p.ts) - {_CEP_HORIZON_MS}
      AND NOT EXISTS (
        SELECT 1 FROM events s
        WHERE s.user_id = p.user_id AND s.event_type = 'signup'
          AND s.ts > v.ts AND s.ts <= p.ts
      )
  )
"""


@register(
    "q94_cep_pattern",
    "analytics",
    "Sequential pattern detection (the MATCH_RECOGNIZE / CEP shape): "
    "purchases preceded by a view within 1h with NO signup between that "
    "view and the purchase. The oracle states it as nested correlated "
    "EXISTS / NOT EXISTS (quadratic-ish); the engine runs ONE ordered "
    "window pass per user carrying the most-recent view and signup "
    "timestamps forward — the pattern holds iff the last view is in the "
    "horizon and no signup follows it (equivalent because any qualifying "
    "view may be replaced by the LATEST qualifying view). The carried "
    "maxima use a RANGE frame over epoch-ms, so every same-millisecond "
    "event is visible to the purchase exactly as the oracle's v.ts <= "
    "p.ts / s.ts <= p.ts bounds see it, and a signup at the view's own "
    "millisecond does not invalidate (ls <= lv keeps, mirroring the "
    "oracle's strict s.ts > v.ts) — no reliance on fixture timing. This is "
    "how sequence-pattern queries stay single-shuffle at 100 TB: carry "
    "pattern state down the partition, never self-join the event log.",
    oracle=_CEP_ORACLE,
)
def q94_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # RANGE frame over epoch-ms: every event at the purchase's own
    # millisecond is inside the frame regardless of event_id order —
    # the exact visibility of the oracle's v.ts <= p.ts / s.ts <= p.ts
    # bounds, so parity holds even with same-instant ties.
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("t_ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_ms")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = base.select(
        "event_id",
        "user_id",
        "event_type",
        "t_ms",
        F.max(F.when(F.col("event_type") == "view", F.col("t_ms")))
        .over(w)
        .alias("lv"),
        F.max(F.when(F.col("event_type") == "signup", F.col("t_ms")))
        .over(w)
        .alias("ls"),
    )
    # ls <= lv keeps: a signup at the latest view's own millisecond does
    # NOT invalidate (the oracle's inner NOT EXISTS is strict, s.ts >
    # v.ts); any signup strictly after the latest view does.
    return (
        marked.filter(
            (F.col("event_type") == "purchase")
            & F.col("lv").isNotNull()
            & (F.col("lv") >= F.col("t_ms") - _CEP_HORIZON_MS)
            & (F.col("ls").isNull() | (F.col("ls") <= F.col("lv")))
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("t_ms").alias("purchase_ms"),
        )
    )


# --------------------------------------------------------------------------
# q97: gap detection (missing-data report)
# --------------------------------------------------------------------------

_GAP_MIN_MS = 3_600_000  # report silences longer than 1 hour

_GAP_ORACLE = f"""
WITH seg AS (
  SELECT user_id, event_id, epoch_ms(ts) AS t0,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1
  FROM events
)
SELECT user_id, event_id AS last_event_id,
       t0 AS gap_start_ms, t1 AS gap_end_ms,
       CAST(t1 - t0 AS BIGINT) AS gap_ms
FROM seg
WHERE t1 IS NOT NULL AND t1 - t0 > {_GAP_MIN_MS}
"""


@register(
    "q97_gap_report",
    "analytics",
    "Missing-data gap report: per-user silences longer than 1h, each as "
    "(last event before the gap, gap bounds, duration) — the inverse of "
    "gap-fill (q70: synthesize the missing grid; q97: ALERT on it), the "
    "sensor-outage / feed-health query. One lead() window per user, "
    "filter on the gap length; one shuffle, output is |gaps| rows.",
    oracle=_GAP_ORACLE,
)
def q97_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_millis("ts")
    seg = ev.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        t.alias("gap_start_ms"),
        F.lead(t).over(w).alias("gap_end_ms"),
    )
    return seg.filter(
        F.col("gap_end_ms").isNotNull()
        & (F.col("gap_end_ms") - F.col("gap_start_ms") > _GAP_MIN_MS)
    ).select(
        "user_id",
        "last_event_id",
        "gap_start_ms",
        "gap_end_ms",
        (F.col("gap_end_ms") - F.col("gap_start_ms")).alias("gap_ms"),
    )


# --------------------------------------------------------------------------
# q100: null-handling semantics (the cross-engine divergence corners)
# --------------------------------------------------------------------------

_NULLSEM_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS k,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) END AS v
  FROM orders
)
SELECT coalesce(CAST(k % 3 AS VARCHAR), 'NULL_KEY') AS key_group,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(v) AS BIGINT) AS n_nonnull_v,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_v,
       CAST(sum(v) AS BIGINT) AS sum_v,
       floor(avg(v) * 100 + 0.5) / 100 AS avg_v,
       CAST(min(v) AS BIGINT) AS min_v,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_v
FROM base
GROUP BY 1
"""


@register(
    "q100_null_semantics",
    "analytics",
    "Null-handling semantics pinned end to end: NULL grouping keys form "
    "their own group (not dropped), count(*) counts them while count(v) "
    "and count(DISTINCT v) skip NULL values, sum/avg/min ignore NULLs "
    "(avg divides by the non-null count, not the row count), and NULLs "
    "inside aggregation never poison the result. These are the corners "
    "where engines historically diverge and silently corrupt reports — "
    "declared as a query so the contract is hash-checked, not assumed.",
    oracle=_NULLSEM_ORACLE,
)
def q100_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    k = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(F.col("o_custkey"))
    v = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    )
    base = o.select(k.alias("k"), v.alias("v"))
    return (
        base.groupBy(
            F.coalesce((F.col("k") % 3).cast("string"), F.lit("NULL_KEY")).alias(
                "key_group"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_nonnull_v"),
            F.count_distinct(F.col("v")).alias("n_distinct_v"),
            F.sum("v").alias("sum_v"),
            fround(F.avg("v"), 2).alias("avg_v"),
            F.min("v").alias("min_v"),
            F.sum(F.col("v").isNull().cast("long")).alias("n_null_v"),
        )
    )


# --------------------------------------------------------------------------
# q104: percent-of-parent hierarchy shares
# --------------------------------------------------------------------------

_HIER_ORACLE = f"""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, revenue_cents,
       {sql_fround(
           "revenue_cents * 1.0 / sum(revenue_cents) OVER (PARTITION BY region)", 6)}
         AS share_of_region,
       {sql_fround("revenue_cents * 1.0 / sum(revenue_cents) OVER ()", 6)}
         AS share_of_total
FROM rev
"""


@register(
    "q104_hierarchy_share",
    "analytics",
    "Percent-of-parent contribution analysis: each nation's revenue as a "
    "share of its region and of the world — two window totals over the "
    "ALREADY-AGGREGATED |nations|-row rollup (aggregate first, window "
    "the rollup: the fact table feeds one partially-aggregated shuffle "
    "and never enters a window). Dimensions broadcast. The drill-down "
    "contribution report every OLAP deployment serves.",
    oracle=_HIER_ORACLE,
)
def q104_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        # customer is entity-scale: un-hinted (stats/AQE decide).
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])  # bounded: |regions|
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents")
        )
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        "revenue_cents",
        fround(
            F.col("revenue_cents") * 1.0 / F.sum("revenue_cents").over(w_region), 6
        ).alias("share_of_region"),
        fround(
            F.col("revenue_cents") * 1.0 / F.sum("revenue_cents").over(w_all), 6
        ).alias("share_of_total"),
    )


# --------------------------------------------------------------------------
# q105: top navigation paths (sessionized path extraction)
# --------------------------------------------------------------------------

_PATH_GAP_MS = 1_800_000  # same 30-min session gap as q52
_TOP_PATHS = 10

_PATHS_ORACLE = f"""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= {_PATH_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM o
),
paths AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
  FROM s GROUP BY user_id, sess_id
),
counted AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
  FROM paths GROUP BY path
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path ASC) AS rank
  FROM counted
)
SELECT path, n_sessions, rank FROM ranked WHERE rank <= {_TOP_PATHS}
"""


@register(
    "q105_top_paths",
    "analytics",
    f"Top-{_TOP_PATHS} navigation paths: sessionize (the q52 gap rule), "
    "assemble each session's ordered event-type path (sort_array over "
    "(ts, event_id, type) structs -> join — the deterministic ordered "
    "string_agg composition from q67), count path frequencies, rank. "
    "Product-analytics' most-common-journeys report. The path table is "
    "one shuffle keyed by (user, session); the count collapses to "
    "|distinct paths| rows map-side before its shuffle; the final rank "
    "windows only the top table.",
    oracle=_PATHS_ORACLE,
    bench=True,
)
def q105_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    o = ev.withColumn(
        "new_sess",
        (F.lag("ts").over(w).isNull() | (gap >= _PATH_GAP_MS)).cast("int"),
    )
    s = o.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    paths = (
        s.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.unix_millis("ts").alias("t"),
                                F.col("event_id").alias("eid"),
                                F.col("event_type").alias("et"),
                            )
                        )
                    ),
                    lambda x: x["et"],
                ),
                ">",
            ).alias("path")
        )
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    wr = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return (
        counted.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _TOP_PATHS)
        .select("path", "n_sessions", "rank")
    )


# --------------------------------------------------------------------------
# q113: conversion latency distribution (view -> purchase time)
# --------------------------------------------------------------------------

_LATENCY_ORACLE = f"""
WITH marked AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS t_ms,
         max(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) OVER w AS lv,
         max(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END) OVER w AS ls
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
conv AS (
  SELECT t_ms - lv AS latency_ms
  FROM marked
  WHERE event_type = 'purchase'
    AND lv IS NOT NULL
    AND lv >= t_ms - {_CEP_HORIZON_MS}
    AND (ls IS NULL OR ls <= lv)
)
SELECT CAST(count(*) AS BIGINT) AS n_conversions,
       CAST(min(latency_ms) AS BIGINT) AS min_ms,
       {sql_fround("quantile_cont(latency_ms, 0.5)", 1)} AS p50_ms,
       {sql_fround("quantile_cont(latency_ms, 0.9)", 1)} AS p90_ms,
       CAST(max(latency_ms) AS BIGINT) AS max_ms
FROM conv
"""


@register(
    "q113_conversion_latency",
    "analytics",
    "Conversion-latency distribution: for every q94-qualified "
    "view->purchase match, the elapsed time from the qualifying view, "
    "summarized as count/min/exact-median/p90/max — the 'how long does "
    "intent take to convert' product metric that windowed funnels "
    "cannot answer. Matches come from the same single carried-state "
    "window pass as q94 (no event-log self-join); the latency column is "
    "|conversions|-sized before the tiny percentile aggregate "
    "(Spark percentile == DuckDB quantile_cont, q37-proven).",
    oracle=_LATENCY_ORACLE,
)
def q113_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # Same RANGE-frame-over-ms / ls <= lv match semantics as q94, so
    # the latency distribution is over exactly the q94 match set even
    # under same-instant ties.
    base = ev.select("event_type", F.unix_millis("ts").alias("t_ms"), "user_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_ms")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = base.select(
        "event_type",
        "t_ms",
        F.max(F.when(F.col("event_type") == "view", F.col("t_ms")))
        .over(w)
        .alias("lv"),
        F.max(F.when(F.col("event_type") == "signup", F.col("t_ms")))
        .over(w)
        .alias("ls"),
    )
    conv = marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("lv").isNotNull()
        & (F.col("lv") >= F.col("t_ms") - _CEP_HORIZON_MS)
        & (F.col("ls").isNull() | (F.col("ls") <= F.col("lv")))
    ).select((F.col("t_ms") - F.col("lv")).alias("latency_ms"))
    return conv.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.min("latency_ms").alias("min_ms"),
        fround(F.expr("percentile(latency_ms, 0.5)"), 1).alias("p50_ms"),
        fround(F.expr("percentile(latency_ms, 0.9)"), 1).alias("p90_ms"),
        F.max("latency_ms").alias("max_ms"),
    )


# --------------------------------------------------------------------------
# q115: last-touch revenue attribution
# --------------------------------------------------------------------------

_ATTR_ORACLE = f"""
WITH p AS (
  SELECT event_id, user_id, epoch_ms(ts) AS t_ms,
         CAST(floor(value * 10000 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS t_ms
  FROM events WHERE event_type <> 'purchase'
), joined AS (
  SELECT p.event_id, p.v, t.event_type,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY t.t_ms DESC NULLS LAST, t.event_id DESC NULLS LAST
         ) AS rk
  FROM p LEFT JOIN t
    ON t.user_id = p.user_id
   AND t.t_ms <= p.t_ms
   AND t.t_ms >= p.t_ms - {_CEP_HORIZON_MS}
)
SELECT coalesce(event_type, 'organic') AS touch_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(v) AS BIGINT) AS revenue_e4
FROM joined WHERE rk = 1
GROUP BY 1
"""


@register(
    "q115_attribution",
    "analytics",
    "Last-touch revenue attribution: every purchase credits its most "
    "recent non-purchase touchpoint within the 1h horizon (else "
    "'organic'), rolled up to credited revenue per channel. The oracle "
    "is the textbook purchase x touch join + row_number pick; the "
    "engine carries max(struct(t_ms, event_id, type)) down each user's "
    "RANGE-framed window — struct ordering makes the same-instant "
    "tie-break (latest event_id) explicit, one shuffle on user_id, and "
    "the event log is never self-joined. Same carried-state shape as "
    "the q94 CEP family: at 100 TB attribution is a window pass, not a "
    "fact-x-fact join.",
    oracle=_ATTR_ORACLE,
)
def q115_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis("ts").alias("t_ms"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_ms")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_touch = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("t_ms", "event_id", F.col("event_type").alias("touch")),
        )
    ).over(w)
    credited = base.select(
        "event_type",
        "t_ms",
        "v",
        last_touch.alias("lt"),
    ).filter(F.col("event_type") == "purchase")
    touch_type = F.when(
        F.col("lt").isNotNull()
        & (F.col("lt.t_ms") >= F.col("t_ms") - _CEP_HORIZON_MS),
        F.col("lt.touch"),
    ).otherwise(F.lit("organic"))
    return credited.groupBy(touch_type.alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("v").alias("revenue_e4"),
    )


# --------------------------------------------------------------------------
# q119: null-safe join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

_NULLSAFE_ORACLE = """
WITH a AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey % 100 END AS k
  FROM orders
),
b AS (
  SELECT CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_custkey % 100 END AS k
  FROM customer
)
SELECT coalesce(CAST(a.k AS VARCHAR), 'NULL_KEY') AS key_repr,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
GROUP BY 1
"""


@register(
    "q119_null_safe_join",
    "join",
    "Null-safe equi-join: <=> (IS NOT DISTINCT FROM) makes NULL keys "
    "join each other — plain = silently drops every NULL row, the "
    "classic lost-rows bug when join keys are sparse. Spark still plans "
    "this as a HASH join (null-safe keys hash like values), not a "
    "nested loop; the NULL bucket is one hot key, the same skew AQE "
    "splits. Aggregated to per-key pair counts so the contract is the "
    "multiplicity, not a blown-up row set.",
    oracle=_NULLSAFE_ORACLE,
)
def q119_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_custkey") % 100)
        .alias("ka")
    )
    b = c.select(
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("c_custkey") % 100)
        .alias("kb")
    )
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
        .groupBy(
            F.coalesce(F.col("ka").cast("string"), F.lit("NULL_KEY")).alias(
                "key_repr"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# q120: higher-order-function pipeline vs window-function oracle
# --------------------------------------------------------------------------

_HOF_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         lag(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ) AS prev_cents
  FROM orders
)
SELECT o_custkey AS custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(max(cents - prev_cents) AS BIGINT) AS max_jump_cents
FROM o
GROUP BY o_custkey
HAVING count(*) >= 2
"""


@register(
    "q120_hof_order_jumps",
    "scalar",
    "Largest jump between a customer's consecutive order totals, "
    "computed with HIGHER-ORDER array functions (collect into a "
    "date-sorted struct array, zip_with adjacent slices, array_max) "
    "and hash-checked against the classic lag()-window oracle — the "
    "nested/denormalized data-modeling surface (one row per customer "
    "holding an ordered array) proven value-equal to the flat window "
    "form. One groupBy shuffle; the fold is row-local Catalyst.",
    oracle=_HOF_ORACLE,
)
def q120_hof_order_jumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    nested = (
        o.select(
            "o_custkey",
            F.struct(
                F.col("o_orderdate"), F.col("o_orderkey"), cents.alias("cents")
            ).alias("rec"),
        )
        .groupBy("o_custkey")
        .agg(F.sort_array(F.collect_list("rec")).alias("recs"))
        .filter(F.size("recs") >= 2)
    )
    prices = F.transform("recs", lambda r: r["cents"])
    jumps = F.zip_with(
        F.slice(prices, 2, F.size("recs") - 1),
        F.slice(prices, 1, F.size("recs") - 1),
        lambda cur, prev: cur - prev,
    )
    return nested.select(
        F.col("o_custkey").alias("custkey"),
        F.size("recs").cast("long").alias("n_orders"),
        F.array_max(jumps).alias("max_jump_cents"),
    )


# --------------------------------------------------------------------------
# q121: event-time lateness audit (how big must the watermark be?)
# --------------------------------------------------------------------------

_LATENESS_ORACLE = """
WITH a AS (
  SELECT epoch_ms(ts) AS t_ms,
         max(epoch_ms(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS high_water
  FROM events
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN high_water > t_ms THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(high_water - t_ms) AS BIGINT) AS max_late_ms,
       floor(CAST(percentile_cont(0.95) WITHIN GROUP (ORDER BY high_water - t_ms) AS DOUBLE) * 10 + 0.5) / 10 AS p95_late_ms,
       CAST(sum(CASE WHEN high_water - t_ms > 3600000 THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_1h
FROM a
"""


@register(
    "q121_lateness_audit",
    "analytics",
    "Event-time out-of-orderness audit: replaying the log in arrival "
    "order (event_id), each event's lateness is the running event-time "
    "high-water-mark minus its own timestamp — count/p95/max plus how "
    "many land beyond the 1h watermark the streaming twins use. This is "
    "the measurement that JUSTIFIES a watermark delay choice (and "
    "predicts stream_late_audit_e2e's drop count) instead of guessing "
    "it. The running max is associative, so it runs TWO-PHASE over "
    "arrival-order buckets (event_id strides): fine buckets compute "
    "their max in a scan-local aggregate, coarse buckets prefix-max "
    "those in one bounded window, fine buckets prefix-max within each "
    "coarse bucket in parallel, and each event combines its bucket's "
    "broadcast incoming high-water with a bucket-LOCAL running max — "
    "no window ever orders the event stream in one partition; the two "
    "stride levels keep every boundary summary recursively bounded at "
    "100 TB.",
    oracle=_LATENESS_ORACLE,
)
def q121_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    # Arrival-order bucket hierarchy: 2^16 events per fine bucket,
    # 2^12 fine buckets per coarse bucket. The sentinel stands in for
    # -infinity on the first bucket (no incoming high-water); any real
    # epoch-millis value exceeds it.
    lo = F.lit(-(1 << 62))
    a0 = ev.select(
        F.unix_millis("ts").alias("t_ms"),
        "event_id",
        F.expr("event_id div 65536").alias("__b2"),
        F.expr("event_id div 268435456").alias("__b1"),
    )
    # Pinned: the coarse rollup and the within-coarse prefix both
    # consume the fine-bucket maxima; unpinned, each branch re-scans
    # events (round-7 duplicate-scan convention; |fine buckets| rows).
    fine = _pin(a0.groupBy("__b1", "__b2").agg(
        F.max("t_ms").alias("__m2")
    ))
    # Exclusive prefix max over |coarse| rows — the only global window.
    w1 = Window.orderBy("__b1").rowsBetween(Window.unboundedPreceding, -1)
    coarse = fine.groupBy("__b1").agg(F.max("__m2").alias("__m1"))
    hw1 = coarse.select("__b1", F.max("__m1").over(w1).alias("__hw1"))
    # Exclusive prefix max within each coarse bucket — parallel.
    w2 = (
        Window.partitionBy("__b1")
        .orderBy("__b2")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    incoming = (
        fine.select("__b1", "__b2", F.max("__m2").over(w2).alias("__hw2"))
        .join(F.broadcast(hw1), "__b1")  # bounded: |coarse buckets|
        .select(
            "__b1",
            "__b2",
            F.greatest(
                F.coalesce("__hw1", lo), F.coalesce("__hw2", lo)
            ).alias("__hw_in"),
        )
    )
    # Bucket-local running max, lifted by the incoming mark. The
    # incoming table is |fine buckets| = n/2^16 rows — corpus-scaling —
    # so it is NOT broadcast-hinted: AQE broadcasts it from its actual
    # runtime size and degrades to a shuffled join past the threshold
    # (hw1 above IS hinted: |coarse| rows, bounded by construction).
    w_in = (
        Window.partitionBy("__b1", "__b2")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    a = a0.join(incoming, ["__b1", "__b2"]).select(
        "t_ms",
        F.greatest(F.max("t_ms").over(w_in), F.col("__hw_in")).alias(
            "high_water"
        ),
    )
    late = (F.col("high_water") - F.col("t_ms")).alias("late_ms")
    return a.select(late).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("late_ms") > 0, 1).otherwise(0)).alias("n_late"),
        F.max("late_ms").alias("max_late_ms"),
        fround(F.expr("percentile(late_ms, 0.95)"), 1).alias("p95_late_ms"),
        F.sum(F.when(F.col("late_ms") > 3_600_000, 1).otherwise(0)).alias(
            "n_beyond_1h"
        ),
    )


# --------------------------------------------------------------------------
# q166: FIFO lot allocation (cumulative-interval matching)
# --------------------------------------------------------------------------

_FIFO_ORACLE = """
WITH base AS (
  SELECT l_partkey AS part, l_orderkey AS okey, l_linenumber AS line,
         l_shipdate AS ship, l_linestatus AS st,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
  FROM lineitem
),
supply AS (
  SELECT part, okey AS s_okey, line AS s_line,
         CAST(sum(qty) OVER w AS BIGINT) AS s_hi,
         CAST(sum(qty) OVER w - qty AS BIGINT) AS s_lo
  FROM base WHERE st = 'F'
  WINDOW w AS (PARTITION BY part ORDER BY ship, okey, line)
),
demand AS (
  SELECT part, okey AS d_okey, line AS d_line,
         CAST(sum(qty) OVER w AS BIGINT) AS d_hi,
         CAST(sum(qty) OVER w - qty AS BIGINT) AS d_lo
  FROM base WHERE st = 'O'
  WINDOW w AS (PARTITION BY part ORDER BY ship, okey, line)
)
SELECT s.part, s.s_okey, s.s_line, d.d_okey, d.d_line,
       CAST(least(s.s_hi, d.d_hi) - greatest(s.s_lo, d.d_lo) AS BIGINT)
         AS alloc_qty
FROM supply s JOIN demand d
  ON d.part = s.part AND s.s_lo < d.d_hi AND d.d_lo < s.s_hi
"""


@register(
    "q166_fifo_allocation",
    "analytics",
    "FIFO lot allocation (inventory cost assignment / order fulfilment "
    "matching): per part, completed line items ('F') form supply lots "
    "and open ones ('O') form demands, both laid out on a cumulative "
    "quantity axis by ship-date order; a lot funds a demand exactly "
    "where their cumulative intervals overlap, so the classic "
    "sequential match becomes ONE per-key range join on interval "
    "overlap with allocated = least(hi,hi) - greatest(lo,lo) — no "
    "driver loop, no recursion, no quadratic self-scan (each side is "
    "sorted once by a window cumsum; the join's per-part output is "
    "linear-ish because FIFO intervals interleave, not cross-product). "
    "All-integer quantities end to end; (shipdate, orderkey, "
    "linenumber) is a unique order so RANGE and ROWS frames agree "
    "across engines.",
    oracle=_FIFO_ORACLE,
)
def q166_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_partkey").alias("part"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        F.col("l_shipdate").alias("ship"),
        F.col("l_linestatus").alias("st"),
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
    )
    w = Window.partitionBy("part").orderBy("ship", "okey", "line")
    hi = F.sum("qty").over(w).cast("long")

    def side(st: str, p: str) -> DataFrame:
        return (
            base.filter(F.col("st") == st)
            .withColumn(f"{p}_hi", hi)
            .withColumn(f"{p}_lo", (F.col(f"{p}_hi") - F.col("qty")).cast("long"))
            .select(
                "part",
                F.col("okey").alias(f"{p}_okey"),
                F.col("line").alias(f"{p}_line"),
                f"{p}_lo",
                f"{p}_hi",
            )
        )

    s, d = side("F", "s"), side("O", "d")
    return s.join(
        d,
        (s["part"] == d["part"])
        & (s["s_lo"] < d["d_hi"])
        & (d["d_lo"] < s["s_hi"]),
    ).select(
        s["part"],
        "s_okey",
        "s_line",
        "d_okey",
        "d_line",
        (F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo"))
        .cast("long")
        .alias("alloc_qty"),
    )


# --------------------------------------------------------------------------
# q171: exact money proration (per-order Hamilton allocation)
# --------------------------------------------------------------------------

_PRORATE_ORACLE = """
WITH w AS (
  SELECT l_orderkey AS okey, l_linenumber AS line,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS wt
  FROM lineitem
),
t AS (
  SELECT o_orderkey AS okey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total
  FROM orders
),
j AS (
  SELECT w.okey, w.line, w.wt, t.total,
         CAST(sum(w.wt) OVER (PARTITION BY w.okey) AS BIGINT) AS wsum
  FROM w JOIN t ON t.okey = w.okey
),
b AS (
  SELECT okey, line, total,
         CAST(total * wt // wsum AS BIGINT) AS base,
         CAST((total * wt) % wsum AS BIGINT) AS rem
  FROM j
),
r AS (
  SELECT okey, line, total, base,
         CAST(total - sum(base) OVER (PARTITION BY okey) AS BIGINT) AS leftover,
         row_number() OVER (PARTITION BY okey ORDER BY rem DESC, line ASC) AS rk
  FROM b
)
SELECT okey, line,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_cents
FROM r
"""


@register(
    "q171_proration",
    "analytics",
    "Exact money proration: each order's total (cents) is allocated "
    "across its line items proportionally to extended price using "
    "largest-remainder (Hamilton) rounding — integer base shares "
    "total*w div W, then the leftover cents go to the largest "
    "remainders (deterministic line-number tiebreak), so per-order "
    "allocations sum to the order total EXACTLY, always — the "
    "cost-allocation / revenue-attribution kernel naive per-row "
    "rounding gets wrong by a cent in ways that never reconcile. Pure "
    "BIGINT arithmetic end to end; one fact-side shuffle on the order "
    "key shared by the join and both windows (Catalyst reuses the "
    "partitioning), output is |lineitem|-sized.",
    oracle=_PRORATE_ORACLE,
)
def q171_proration(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    w = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("wt"),
    )
    t = o.select(
        F.col("o_orderkey").alias("okey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("total"),
    )
    wk = Window.partitionBy("okey")
    j = w.join(t, "okey").withColumn("wsum", F.sum("wt").over(wk).cast("long"))
    b = j.select(
        "okey",
        "line",
        "total",
        F.expr("total * wt div wsum").cast("long").alias("base"),
        ((F.col("total") * F.col("wt")) % F.col("wsum")).cast("long").alias("rem"),
    )
    rk = Window.partitionBy("okey").orderBy(F.desc("rem"), F.asc("line"))
    r = b.select(
        "okey",
        "line",
        "base",
        (F.col("total") - F.sum("base").over(wk)).cast("long").alias("leftover"),
        F.row_number().over(rk).alias("rk"),
    )
    return r.select(
        "okey",
        "line",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("alloc_cents"),
    )


# --------------------------------------------------------------------------
# q176: quota-diversified top-k (global ranking with per-group caps)
# --------------------------------------------------------------------------

_DTK_PER_NATION = 2
_DTK_LIMIT = 20

_DTK_ORACLE = f"""
WITH rev AS (
  SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
capped AS (
  SELECT *, row_number() OVER (PARTITION BY nationkey
                               ORDER BY rev_cents DESC, custkey ASC)
              AS nation_rank
  FROM rev
)
SELECT custkey, CAST(nationkey AS BIGINT) AS nationkey, rev_cents,
       CAST(nation_rank AS BIGINT) AS nation_rank,
       CAST(row_number() OVER (ORDER BY rev_cents DESC, custkey ASC)
            AS BIGINT) AS global_rank
FROM capped
WHERE nation_rank <= {_DTK_PER_NATION}
ORDER BY global_rank
LIMIT {_DTK_LIMIT}
"""


@register(
    "q176_diversified_topk",
    "analytics",
    f"Quota-diversified top-k: the global top-{_DTK_LIMIT} customers by "
    f"revenue with AT MOST {_DTK_PER_NATION} per nation — the "
    "leaderboard/recommendation shape where raw top-k collapses onto "
    "one dominant group and a per-group quota forces coverage. "
    "Aggregate-then-rank: the per-nation cap is a partitioned window "
    "over the |customers| rollup (never raw orders), and only the "
    "capped survivors — bounded by quota x |nations| rows — enter the "
    "global ranking window, so the single-partition sort sees "
    f"{_DTK_PER_NATION} x |nations| rows, not the corpus. "
    "Deterministic tiebreaks throughout.",
    oracle=_DTK_ORACLE,
)
def q176_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rev = (
        # customer is entity-scale: un-hinted (stats/AQE decide).
        o.join(c.select("c_custkey", "c_nationkey"),
               o["o_custkey"] == F.col("c_custkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_nationkey").alias("nationkey"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("rev_cents")
        )
    )
    wn = Window.partitionBy("nationkey").orderBy(
        F.desc("rev_cents"), F.asc("custkey")
    )
    capped = rev.withColumn("nation_rank", F.row_number().over(wn)).filter(
        F.col("nation_rank") <= _DTK_PER_NATION
    )
    wg = Window.orderBy(F.desc("rev_cents"), F.asc("custkey"))
    return (
        capped.withColumn("global_rank", F.row_number().over(wg))
        .filter(F.col("global_rank") <= _DTK_LIMIT)
        .select(
            "custkey",
            F.col("nationkey").cast("long").alias("nationkey"),
            "rev_cents",
            F.col("nation_rank").cast("long").alias("nation_rank"),
            F.col("global_rank").cast("long").alias("global_rank"),
        )
    )


# --------------------------------------------------------------------------
# q184: exact equi-depth binning — two-phase global rank, no global sort
# --------------------------------------------------------------------------

# Value-range pre-buckets for the rank's first phase: $1000 strides over
# the cent-scaled price. The stride is a domain constant (not data-
# derived), so phase-1 bucketing is a scan-local map; skew across
# strides only widens one bucket's window, never a global funnel.
_EQD_STRIDE_E2 = 100_000
_EQD_K = 10

_EQD_ORACLE = f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS price_e2, o_orderkey
  FROM orders
), r AS (
  SELECT price_e2,
         CAST(row_number() OVER (ORDER BY price_e2, o_orderkey) AS BIGINT)
           AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM o
)
SELECT CAST(((rnk - 1) * {_EQD_K}) // n AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT)      AS n_orders,
       CAST(min(price_e2) AS BIGINT) AS min_price_e2,
       CAST(max(price_e2) AS BIGINT) AS max_price_e2,
       CAST(sum(price_e2) AS BIGINT) AS sum_price_e2
FROM r GROUP BY 1
"""


@register(
    "q184_equidepth_bins",
    "analytics",
    f"EXACT equi-depth decile binning of orders by total price without "
    "a global sort: phase 1 counts rows per $1000 value stride (a "
    "domain-constant pre-bucket — scan-local map, no data-derived "
    "boundaries) and prefix-sums the tiny stride table into exclusive "
    "rank offsets; phase 2 ranks within each stride in parallel "
    "(window partitioned by stride, ties broken by order key) and "
    f"adds the broadcast offset; decile = ((rank-1)*{_EQD_K}) div n. "
    "Every bin then reports exact depth and cent-scaled min/max/sum — "
    "equi-DEPTH boundaries (same rows per bin), where q76's histogram "
    "is equi-WIDTH and q163's sketch is approximate. The q181 "
    "two-phase-rank machinery applied to a VALUE axis instead of a "
    "time axis: the same pattern that makes exact gains tables / "
    "quantile features feasible at 100 TB, where a naive "
    "ntile()/row_number() OVER (ORDER BY price) funnels the table "
    "through one task. Oracle ranks flat and applies the identical "
    "decile formula.",
    oracle=_EQD_ORACLE,
)
def q184_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("price_e2"),
        "o_orderkey",
    ).withColumn("stride", F.expr(f"price_e2 div {_EQD_STRIDE_E2}"))
    counts = o.groupBy("stride").agg(F.count(F.lit(1)).alias("cnt"))
    w_pre = Window.orderBy("stride").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "stride",
        F.coalesce(F.sum("cnt").over(w_pre), F.lit(0)).cast("long").alias("off"),
        F.sum(F.col("cnt")).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n"),
    )
    w_in = Window.partitionBy("stride").orderBy("price_e2", "o_orderkey")
    ranked = o.join(F.broadcast(offsets), "stride").select(  # bounded: |price strides|
        "price_e2",
        (F.col("off") + F.row_number().over(w_in)).cast("long").alias("rnk"),
        "n",
    )
    return (
        ranked.groupBy(
            F.expr(f"((rnk - 1) * {_EQD_K}) div n").cast("long").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("price_e2").cast("long").alias("min_price_e2"),
            F.max("price_e2").cast("long").alias("max_price_e2"),
            F.sum("price_e2").cast("long").alias("sum_price_e2"),
        )
    )
