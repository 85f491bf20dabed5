"""Deterministic sampling and dataset splitting.

A training-data pipeline needs *reproducible* row selection — Spark's
``df.sample`` draws from a per-partition RNG whose output changes with
partitioning, so it can never be oracle-checked or replayed stably
across cluster layouts. The engine's primitive instead hashes a stable
row key: ``md5_uint32(key) % 100`` gives each row a deterministic
percentile, independent of partitioning, executor count, or engine
(SURVEY.md §2.4 extension surface; the md5 primitive is the same one
the dedup family uses, functions/hashing.py).

At 100 TB this is the only sampling that composes: the predicate pushes
into the scan (no pre-shuffle), re-runs select identical rows for
incremental jobs, and split membership never silently shifts when the
cluster re-partitions data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.hashing import md5_int32, sql_md5_int32
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

SAMPLE_PCT = 10
TRAIN_PCT, VALID_PCT = 80, 10  # remainder = test


def _pct(col):
    """Deterministic 0-99 percentile of a row from its key."""
    return md5_int32(col.cast("string")) % 100


def _sql_pct(expr: str) -> str:
    return f"({sql_md5_int32(f'CAST({expr} AS VARCHAR)')} % 100)"


_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE {_sql_pct("doc_id")} < {SAMPLE_PCT}
"""


@register(
    "sample_hash_bernoulli",
    "sampling",
    f"Deterministic {SAMPLE_PCT}% Bernoulli sample by key hash — reproducible "
    "across partitionings/engines (unlike df.sample's per-partition RNG); the "
    "hash predicate is partition-local and evaluated at the scan.",
    oracle=_SAMPLE_ORACLE,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    return d.filter(_pct(F.col("doc_id")) < SAMPLE_PCT).select(
        "doc_id", "lang", "n_chars"
    )


_SPLIT_ORACLE = f"""
SELECT CASE WHEN {_sql_pct("doc_id")} < {TRAIN_PCT} THEN 'train'
            WHEN {_sql_pct("doc_id")} < {TRAIN_PCT + VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
"""


@register(
    "split_train_test",
    "sampling",
    f"Deterministic train/valid/test split ({TRAIN_PCT}/{VALID_PCT}/"
    f"{100 - TRAIN_PCT - VALID_PCT}) by key hash, with per-(split, lang) "
    "size accounting. Split membership is a pure function of the key: "
    "stable under re-partitioning, incremental appends, and engine swaps.",
    oracle=_SPLIT_ORACLE,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    pct = _pct(F.col("doc_id"))
    split = (
        F.when(pct < TRAIN_PCT, "train")
        .when(pct < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Stratified sampling (per-stratum rates)
# --------------------------------------------------------------------------

# Per-language sampling rates: downsample the dominant stratum, keep
# rare strata whole — the standard corpus-rebalancing move.
STRATA_PCT: dict[str, int] = {"en": 10, "es": 25, "de": 50}
DEFAULT_PCT = 100  # strata not listed are kept in full


def _strata_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in STRATA_PCT.items()
    )
    return f"CASE {whens} ELSE {DEFAULT_PCT} END"


_STRATIFIED_ORACLE = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(sum(n_chars) AS BIGINT) AS chars_sampled
FROM documents
WHERE {_sql_pct("doc_id")} < ({_strata_case_sql()})
GROUP BY lang
"""


@register(
    "sample_stratified",
    "sampling",
    "Stratified deterministic sampling: each stratum (language) gets its "
    "own keep-rate via one CASE over the same key-hash percentile — "
    "downsample the dominant stratum, keep the tail whole. Still a pure "
    "scan-local predicate (no shuffle, no per-stratum pass), still "
    "reproducible under any partitioning; rates change per deployment "
    "without touching the mechanism.",
    oracle=_STRATIFIED_ORACLE,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(DEFAULT_PCT)
    for k, v in reversed(STRATA_PCT.items()):
        rate = F.when(F.col("lang") == k, v).otherwise(rate)
    return (
        d.filter(_pct(F.col("doc_id")) < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("chars_sampled"),
        )
    )


# --------------------------------------------------------------------------
# Cluster-aware (leakage-free) train/test split
# --------------------------------------------------------------------------


def _cluster_split_oracle() -> str:
    # Deferred import keeps module load order irrelevant; the CTE body is
    # the same verified near-dup graph the dedup family is checked on.
    from spark_stream_kudu_spark.operators.dedup import _CC_CTE_BODY

    pct = _sql_pct("cluster_id")
    return f"""
WITH RECURSIVE {_CC_CTE_BODY},
clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
)
SELECT CASE WHEN {pct} < {TRAIN_PCT} THEN 'train'
            WHEN {pct} < {TRAIN_PCT + VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split,
       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM clusters c JOIN documents d USING (doc_id)
GROUP BY 1
"""


@register(
    "sample_cluster_split",
    "sampling",
    "Leakage-free train/valid/test split: membership hashes the near-dup "
    "CLUSTER id (min-label connected component over verified MinHash-LSH "
    "pairs), not the document id — so two near-duplicate documents can "
    "never land on opposite sides of the split, the classic train/test "
    "contamination vector a per-doc hash split cannot prevent. Composes "
    "two already-oracle-checked operators (dedup_clusters -> hash split); "
    "checked against one recursive-CTE oracle. At 100 TB the cluster map "
    "is the dedup pipeline's existing output joined back by doc_id; the "
    "split itself adds one scan-local hash predicate and a one-shuffle "
    "rollup.",
    oracle=_cluster_split_oracle(),
)
def sample_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.operators.dedup import dedup_clusters

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    clusters = dedup_clusters(spark, sf_dir)
    pct = _pct(F.col("cluster_id"))
    split = (
        F.when(pct < TRAIN_PCT, "train")
        .when(pct < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
    )
    return (
        clusters.join(d.select("doc_id", "n_chars"), "doc_id")
        .select(split.alias("split"), "cluster_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count_distinct(F.col("cluster_id")).alias("n_clusters"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Fixed-count-per-stratum deterministic sampling
# --------------------------------------------------------------------------

PER_STRATUM_N = 20


def _fixed_sample_oracle() -> str:
    pct_expr = sql_md5_int32("CAST(doc_id AS VARCHAR)")
    return f"""
WITH ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY {pct_expr} ASC, doc_id ASC) AS rk
  FROM documents
)
SELECT lang, doc_id, n_chars
FROM ranked WHERE rk <= {PER_STRATUM_N}
"""


@register(
    "sample_fixed_per_stratum",
    "sampling",
    f"Deterministic fixed-count sample: exactly {PER_STRATUM_N} documents "
    "per language, chosen by ranking each stratum on the key hash — the "
    "reservoir-sampling contract (uniform within stratum, exact output "
    "size) without reservoir state: membership is a pure function of "
    "the keys present, reproducible across engines and partitionings, "
    "and stable under reruns. One window shuffle on the stratum key; "
    "at 100 TB strata rank in parallel and the hash order means no "
    "secondary scan for randomization. The eval-set construction "
    "primitive (fixed-size per-language holdouts).",
    oracle=_fixed_sample_oracle(),
)
def sample_fixed_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    h = md5_int32(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PER_STRATUM_N)
        .drop("rk")
    )


# --------------------------------------------------------------------------
# Exact integer quota apportionment (largest-remainder / Hamilton method)
# --------------------------------------------------------------------------

_QUOTA_BUDGET = 1000  # training-slot budget to apportion across sources

_QUOTA_ORACLE = f"""
WITH src AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM src),
q AS (
  SELECT s.source, s.chars,
         CAST((s.chars * {_QUOTA_BUDGET}) // t.total AS BIGINT) AS floor_slots,
         CAST((s.chars * {_QUOTA_BUDGET}) % t.total AS BIGINT) AS remainder
  FROM src s CROSS JOIN tot t
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY remainder DESC, source ASC) AS rk,
         CAST({_QUOTA_BUDGET} - sum(floor_slots) OVER () AS BIGINT) AS shortfall
  FROM q
)
SELECT source, chars, floor_slots,
       CAST(floor_slots + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS BIGINT)
         AS slots
FROM ranked
"""


@register(
    "sample_quota_allocation",
    "sampling",
    f"Exact integer quota apportionment: a budget of {_QUOTA_BUDGET} "
    "training slots split across sources proportionally to corpus "
    "bytes by the largest-remainder (Hamilton) method — floor "
    "allocations plus one extra slot to the largest fractional "
    "remainders (ties -> source name) until the budget is EXACTLY "
    "spent. Naive per-source rounding over- or under-spends the "
    "budget; this never does (sum(slots) == budget is pinned by an "
    "invariant test). Pure integer arithmetic end to end — the data-"
    "mixing quota step that must be bit-identical between the planner "
    "and the sampler.",
    oracle=_QUOTA_ORACLE,
)
def sample_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy(source) shuffle; the |sources|-row allocation then
    runs in a single-partition window (the corpus never enters it) —
    the same bounded-small-table pattern as text_vocab/q62."""
    from pyspark.sql import Window

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    tot = src.agg(F.sum("chars").alias("total"))
    q = src.crossJoin(F.broadcast(tot)).select(  # bounded: 1-row total
        "source",
        "chars",
        F.expr(f"(chars * {_QUOTA_BUDGET}) div total").alias("floor_slots"),
        ((F.col("chars") * _QUOTA_BUDGET) % F.col("total")).alias("remainder"),
    )
    w_rank = Window.orderBy(F.desc("remainder"), F.asc("source"))
    w_all = Window.partitionBy()
    ranked = q.select(
        "source",
        "chars",
        "floor_slots",
        F.row_number().over(w_rank).alias("rk"),
        (F.lit(_QUOTA_BUDGET) - F.sum("floor_slots").over(w_all)).alias(
            "shortfall"
        ),
    )
    return ranked.select(
        "source",
        "chars",
        "floor_slots",
        (
            F.col("floor_slots")
            + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)
        ).alias("slots"),
    )


# --------------------------------------------------------------------------
# Temporal holdout split (time-based eval split, leakage-aware)
# --------------------------------------------------------------------------

_TH_TRAIN_PCT = 80

_TH_ORACLE = f"""
WITH r AS (
  SELECT event_type, ts,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
b AS (
  SELECT event_type,
         min(CASE WHEN rn > n * {_TH_TRAIN_PCT} // 100 THEN ts END) AS boundary,
         CAST(max(n) AS BIGINT) AS n_events
  FROM r GROUP BY event_type
)
SELECT e.event_type,
       b.n_events,
       CAST(epoch_ms(b.boundary) AS BIGINT) AS boundary_ms,
       CAST(count(*) FILTER (WHERE e.ts < b.boundary) AS BIGINT) AS n_train,
       CAST(count(*) FILTER (WHERE e.ts >= b.boundary) AS BIGINT) AS n_test
FROM events e JOIN b ON b.event_type = e.event_type
GROUP BY e.event_type, b.n_events, b.boundary
"""


@register(
    "sample_temporal_holdout",
    "sampling",
    f"Temporal holdout split: per event type, the last "
    f"~{100 - _TH_TRAIN_PCT}% of events BY EVENT TIME become the test "
    "set — the split a forecasting/recommendation eval must use, "
    "because hash splits leak the future into training. The boundary "
    f"is the first timestamp past the {_TH_TRAIN_PCT}% rank (computed "
    "with a deterministic (ts, event_id) order), and membership is a "
    "pure ts comparison against that broadcast |types|-row boundary "
    "table — scan-local, reproducible, and auditable (boundary_ms is "
    "part of the output contract). Train/test counts may deviate from "
    "80/20 exactly when ties straddle the rank — the boundary rule, "
    "not a quota, is the contract.",
    oracle=_TH_ORACLE,
)
def sample_temporal_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    wrn = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wall = Window.partitionBy("event_type")
    r = ev.select(
        "event_type",
        "ts",
        F.row_number().over(wrn).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    b = r.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn") > F.expr(f"n * {_TH_TRAIN_PCT} div 100"), F.col("ts")
            )
        ).alias("boundary"),
        F.max("n").cast("long").alias("n_events"),
    )
    joined = ev.join(F.broadcast(b), "event_type")  # bounded: |event_types|
    return joined.groupBy("event_type", "n_events", "boundary").agg(
        F.sum((F.col("ts") < F.col("boundary")).cast("long")).alias("n_train"),
        F.sum((F.col("ts") >= F.col("boundary")).cast("long")).alias("n_test"),
    ).select(
        "event_type",
        "n_events",
        F.unix_millis("boundary").alias("boundary_ms"),
        "n_train",
        "n_test",
    )
