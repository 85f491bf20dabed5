"""Round-2 extension queries, registered after the core families.

New operators land here (not in their thematic modules) so the
front-of-registry correctness window stays stable across rounds; they
rotate forward once verified.

Contents:
- ``q64b_running_distinct_bounded`` — the bounded-state running
  distinct count (the scale path for q64_running_distinct, whose exact
  expanding-frame variant carries O(distinct-domain) state per row).
- ``dedup_embedding_rplsh`` — embedding-cosine near-dup pairs blocked
  by random-hyperplane LSH buckets: the 100 TB replacement for
  ``dedup_embedding_cosine``'s label blocking (labels are a fixture
  convenience; hyperplane buckets exist for any corpus).
- ``q66_hll_partial_merge`` — explicit sketch partial/merge: per-group
  HLL sketches union-merged to a global estimate, the re-aggregatable
  distinct-count path (rollup tables keep sketches, not counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround
from spark_stream_kudu_spark.functions.vectors import cosine_similarity
from spark_stream_kudu_spark.operators.similarity import (
    _DIM,
    _SCALE,
    _plane_hash_sql,
    _plane_ints,
    N_PLANES,
)
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Bounded running distinct (the scale path for q64)
# --------------------------------------------------------------------------

_WINDOW_MS = 3_600_000  # 1 hour

_Q64B_ORACLE = f"""
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
       CAST(count(DISTINCT event_type) OVER w AS BIGINT) AS n_types_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN {_WINDOW_MS} PRECEDING AND CURRENT ROW)
"""


@register(
    "q64b_running_distinct_bounded",
    "window",
    "Running distinct event-type count over a RANGE-bounded 1-hour frame — "
    "the bounded-state variant of q64_running_distinct: per-row state is "
    "capped by the window duration x event rate, independent of total "
    "history length, so the operator survives unbounded user histories "
    "at 100 TB. RANGE frame over epoch millis; peers (equal timestamps) "
    "share a frame on both engines by definition.",
    oracle=_Q64B_ORACLE,
)
def q64b_running_distinct_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-_WINDOW_MS, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_types_1h"),
    )


# --------------------------------------------------------------------------
# Embedding near-dup with hyperplane-LSH blocking (scale path)
# --------------------------------------------------------------------------

_COS_THRESHOLD = 0.3

_EMB_RPLSH_ORACLE = f"""
WITH d AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS vi
  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, {_DIM - 1})) AS i) g
),
dots AS (
  SELECT vec_id,
         {", ".join(f"sum(vi * {_plane_hash_sql(i)}) AS dot_{i}" for i in range(N_PLANES))}
  FROM d GROUP BY vec_id
),
sig AS (
  SELECT vec_id,
         {" + ".join(f"(CASE WHEN dot_{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(N_PLANES))}
           AS bucket
  FROM dots
),
e AS (
  SELECT s.vec_id, s.bucket, CAST(em.embedding AS DOUBLE[]) AS v
  FROM sig s JOIN embeddings em USING (vec_id)
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor((list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))
             * 1000000 + 0.5) / 1000000 AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE (list_dot_product(a.v, b.v) /
       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) > {_COS_THRESHOLD}
"""


@register(
    "dedup_embedding_rplsh",
    "dedup",
    "Embedding-cosine near-dup pairs blocked by random-hyperplane LSH "
    f"buckets ({N_PLANES} deterministic md5-derived planes, sign-bit "
    "signature): the self-join shuffles on the bucket key (~1/2^planes of "
    "all pairs ever compared), signatures computed row-locally in the scan "
    "projection — the 100 TB replacement for label blocking. The oracle "
    "mirrors the index construction bit-for-bit (exact scaled-integer "
    "plane dots), so even the approximate path is value-checked.",
    oracle=_EMB_RPLSH_ORACLE,
)
def dedup_embedding_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    scaled = F.transform(
        "embedding", lambda v: F.floor(v.cast("double") * _SCALE).cast("long")
    )
    bucket = None
    for i in range(N_PLANES):
        plane = F.array(*[F.lit(p).cast("long") for p in _plane_ints(i)])
        dot = F.aggregate(
            F.zip_with(F.col("scaled"), plane, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    ebkt = e.withColumn("scaled", scaled).select(
        "vec_id", "embedding", bucket.alias("bucket")
    )
    a = ebkt.select(
        F.col("vec_id").alias("vec_a"),
        F.col("bucket").alias("ba"),
        F.col("embedding").alias("va"),
    )
    b = ebkt.select(
        F.col("vec_id").alias("vec_b"),
        F.col("bucket").alias("bb"),
        F.col("embedding").alias("vb"),
    )
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cos > _COS_THRESHOLD)
        .select("vec_a", "vec_b", fround(cos, 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# HLL sketch partial/merge (re-aggregatable distinct counts)
# --------------------------------------------------------------------------


@register(
    "q66_hll_partial_merge",
    "aggregation",
    "Explicit sketch partial/merge: per-nation HLL sketches of the customer "
    "key domain (hll_sketch_agg), union-merged to region and global "
    "estimates (hll_union_agg) — the re-aggregatable distinct-count path: "
    "a 100 TB rollup stores sketches, re-merges at query time, and never "
    "rescans raw data. Approximate by contract (Datasketches HLL has no "
    "DuckDB twin), so rows-only check; the exact twin is q13.",
    oracle=None,
)
def q66_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    partials = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "n_name")
        .agg(F.hll_sketch_agg("c_custkey").alias("sk"))
    )
    per_region = partials.groupBy("n_regionkey").agg(
        F.hll_union_agg("sk").alias("rsk"), F.count(F.lit(1)).alias("n_nations")
    )
    return per_region.select(
        "n_regionkey",
        "n_nations",
        F.hll_sketch_estimate("rsk").alias("approx_customers"),
    ).orderBy("n_regionkey")
