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
- ``text_chunking`` — context-length splitting of token streams into
  fixed-size training chunks (row-local, shuffle-free).
- ``pipeline_sequence_pack`` — running-token-sum bin packing of docs
  into ~capacity-token training sequences over parallel hash-bucket
  streams (the distributed first-fit approximation).
- ``text_contamination`` — n-gram overlap scan of training docs against
  a held-out benchmark set (eval-leakage filter); benchmark shingles
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import ceil_div, fround, idiv
from spark_stream_kudu_spark.functions.vectors import cosine_similarity
from spark_stream_kudu_spark.operators.similarity import (
    _DIM,
    _SCALE,
    _hyperplane_bucket,
    _plane_hash_sql,
    _plane_ints,
    N_PLANES,
)
from spark_stream_kudu_spark.functions.hashing import md5_int32, sql_md5_int32
from spark_stream_kudu_spark.functions.textutil import (
    sql_tokens,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.functions.lineage import pin as _pin


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
    bucket = _hyperplane_bucket([_plane_ints(i) for i in range(N_PLANES)])
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
    "key domain (hll_sketch_agg), union-merged to region estimates "
    "(hll_union_agg) — the re-aggregatable distinct-count path: a 100 TB "
    "rollup stores sketches, re-merges at query time, and never rescans "
    "raw data. Oracle-checkable via exact anchors: the per-region exact "
    "distinct count is emitted alongside a BIGINT flag asserting the "
    "merged estimate sits within 5% of it (Datasketches HLL lgK=12 keeps "
    "error ~1.6%); DuckDB computes the same anchors plus literal 1, so "
    "the hash verifies both the anchor and the bound claim.",
    oracle="""
SELECT n.n_regionkey,
       CAST(count(DISTINCT n.n_nationkey) AS BIGINT) AS n_nations,
       CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS exact_customers,
       CAST(1 AS BIGINT) AS est_ok
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_regionkey
""",
)
def q66_hll_partial_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])  # bounded: |nations|
    partials = joined.groupBy("n_regionkey", "n_name").agg(
        F.hll_sketch_agg("c_custkey").alias("sk")
    )
    per_region = partials.groupBy("n_regionkey").agg(
        F.hll_union_agg("sk").alias("rsk"), F.count(F.lit(1)).alias("n_nations")
    )
    exact = joined.groupBy("n_regionkey").agg(
        F.count_distinct("c_custkey").alias("exact_customers")
    )
    est = F.hll_sketch_estimate("rsk")
    ok = (
        F.abs(est - F.col("exact_customers"))
        <= F.greatest(F.lit(1.0), F.lit(0.05) * F.col("exact_customers"))
    ).cast("bigint")
    return (
        per_region.join(exact, "n_regionkey")
        .select("n_regionkey", "n_nations", "exact_customers", ok.alias("est_ok"))
        .orderBy("n_regionkey")
    )


# --------------------------------------------------------------------------
# Document chunking (context-length splitting)
# --------------------------------------------------------------------------

CHUNK_TOKENS = 64  # tokens per training chunk

_CHUNK_ORACLE = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
c AS (
  SELECT doc_id,
         unnest(generate_series(0, CAST(ceil(len(t) * 1.0 / {CHUNK_TOKENS}) AS INT) - 1)) AS chunk_id,
         t
  FROM tok
)
SELECT doc_id, chunk_id,
       len(t[chunk_id * {CHUNK_TOKENS} + 1 : (chunk_id + 1) * {CHUNK_TOKENS}]) AS n_chunk_tokens,
       md5(array_to_string(t[chunk_id * {CHUNK_TOKENS} + 1 : (chunk_id + 1) * {CHUNK_TOKENS}], ' ')) AS chunk_md5
FROM c
"""


@register(
    "text_chunking",
    "text",
    f"Context-length chunking: each document's token stream split into "
    f"consecutive {CHUNK_TOKENS}-token chunks (last chunk ragged) — the "
    "standard pre-training splitter. Row-local array expressions (sequence + "
    "slice + posexplode): no shuffle at all; output scales with corpus size, "
    "state with document length. Chunk content is value-checked via md5.",
    oracle=_CHUNK_ORACLE,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_chunks = ceil_div(F.size("t"), CHUNK_TOKENS).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("t"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS),
    )
    return (
        d.select("doc_id", toks.alias("t"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(
            "doc_id",
            "chunk_id",
            F.size("chunk").cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_md5"),
        )
    )


# --------------------------------------------------------------------------
# Sequence packing (bin packing short docs into training sequences)
# --------------------------------------------------------------------------

PACK_CAPACITY = 512  # tokens per packed training sequence
PACK_BUCKETS = 32  # parallel packing streams (one running sum each)

_PACK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         {sql_md5_int32('CAST(doc_id AS VARCHAR)')} % {PACK_BUCKETS} AS bucket,
         len({sql_tokens('text')}) AS n_tokens
  FROM documents
),
runs AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_tokens
  FROM tok
),
binned AS (
  SELECT bucket,
         CAST(floor(coalesce(prior_tokens, 0) / {PACK_CAPACITY}) AS BIGINT) AS bin_id,
         doc_id, n_tokens
  FROM runs
)
SELECT bucket, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_packed,
       min(doc_id) AS first_doc
FROM binned
GROUP BY bucket, bin_id
"""


@register(
    "pipeline_sequence_pack",
    "text",
    f"Sequence packing: documents assigned to ~{PACK_CAPACITY}-token training "
    "sequences by a running token sum (the streaming first-fit "
    "approximation), parallelized over "
    f"{PACK_BUCKETS} deterministic hash buckets so no single ordered stream "
    "bottlenecks — each bucket is one window partition, so the whole packer "
    "is one shuffle + one window pass + one aggregation, scale-free in "
    "corpus size. Bucket assignment uses the engine-portable md5-derived "
    "hash (functions.hashing) so the oracle reproduces it exactly.",
    oracle=_PACK_ORACLE,
)
def pipeline_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    base = d.select(
        "doc_id",
        F.pmod(md5_int32(F.col("doc_id").cast("string")), F.lit(PACK_BUCKETS)).alias(
            "bucket"
        ),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = base.select(
        "bucket",
        idiv(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)), PACK_CAPACITY)
        .alias("bin_id"),
        "doc_id",
        "n_tokens",
    )
    return binned.groupBy("bucket", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_packed"),
        F.min("doc_id").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# Benchmark contamination detection
# --------------------------------------------------------------------------

CONTAM_SHINGLE_N = 4
_BENCH_MOD = 10  # doc_id % 10 == 0 stands in for the benchmark/eval set

_CONTAM_ORACLE = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
sh AS (
  SELECT doc_id, unnest(list_distinct({sql_word_shingles('t', CONTAM_SHINGLE_N)})) AS s
  FROM tok
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % {_BENCH_MOD} <> 0)
SELECT train.doc_id, CAST(count(DISTINCT train.s) AS BIGINT) AS n_shared_ngrams
FROM train JOIN bench ON train.s = bench.s
GROUP BY train.doc_id
"""


@register(
    "text_contamination",
    "text",
    f"Benchmark-contamination scan: training docs sharing any "
    f"{CONTAM_SHINGLE_N}-gram with the held-out benchmark set (stand-in: "
    f"doc_id % {_BENCH_MOD} == 0) — the eval-leakage filter every training "
    "corpus needs. Shingle sets are row-local; the benchmark shingle side is "
    "tiny and BROADCAST, so the scan is one pass over training shingles with "
    "a map-side join + one groupBy(doc) shuffle.",
    oracle=_CONTAM_ORACLE,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(tokens(F.col("text")), CONTAM_SHINGLE_N))
        ).alias("s"),
    )
    bench = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0).select("s").distinct()
    )
    train = sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        # bench is a corpus-fraction shingle set (corpus-scaling):
        # un-hinted — AQE broadcasts at test SF, shuffles at 100 TB.
        train.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count_distinct("s").alias("n_shared_ngrams"))
    )


# --------------------------------------------------------------------------
# Ordered string aggregation (LISTAGG / string_agg surface)
# --------------------------------------------------------------------------

_STRAGG_ORACLE = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS n_custs,
       string_agg(c.c_name, '|' ORDER BY c.c_name) AS cust_names
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE c.c_acctbal > 9900
GROUP BY n.n_name
"""


@register(
    "q67_string_agg",
    "aggregation",
    "Ordered string aggregation (ANSI LISTAGG / string_agg): top-balance "
    "customer names concatenated in deterministic order per nation. Spark "
    "has no ordered string_agg, so it composes sort_array(collect_list()) + "
    "array_join — exact parity with DuckDB's ORDER BY variant. collect_list "
    "is bounded here by the selective filter; at scale cap the group size "
    "or switch to a top-k window first.",
    oracle=_STRAGG_ORACLE,
)
def q67_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.filter(F.col("c_acctbal") > 9900)
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])  # bounded: |nations|
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias(
                "cust_names"
            ),
        )
    )


# --------------------------------------------------------------------------
# Dedup cluster-size histogram (pipeline observability)
# --------------------------------------------------------------------------


def _cluster_stats_oracle() -> str:
    from spark_stream_kudu_spark.operators.dedup import _CC_CTE_BODY

    return f"""
WITH RECURSIVE {_CC_CTE_BODY},
clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
sizes AS (SELECT cluster_id, count(*) AS csize FROM clusters GROUP BY cluster_id)
SELECT CAST(csize AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(csize) AS BIGINT) AS n_docs
FROM sizes
GROUP BY csize
"""


@register(
    "dedup_cluster_stats",
    "dedup",
    "Near-dup cluster-size histogram: how many clusters of each size the "
    "verified-pair graph produces, and how many docs they hold — the "
    "observability readout a dedup pipeline publishes per run (a sudden "
    "mega-cluster = boilerplate contamination; all-singletons = broken "
    "candidate generation). Two tiny aggregations over the cluster "
    "assignment; cost is dominated by (and shared with) dedup_clusters.",
    oracle=_cluster_stats_oracle(),
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    )


# --------------------------------------------------------------------------
# Multi-grain sketch rollup: one sketch table answers every grain
# --------------------------------------------------------------------------


@register(
    "q106_sketch_grains",
    "aggregation",
    "Multi-grain distinct-user counts from ONE sketch table: events "
    "sketch once at (day, event_type) grain (hll_sketch_agg of user_id), "
    "then per-day, per-type, and global estimates all re-merge from "
    "those partials (hll_union_agg) — three grains, zero re-scans of "
    "the raw events. The continuous-aggregate pattern for distinct "
    "counts, which do NOT sum across groups the way counts do (a user "
    "active on two days is one user, not two): only sketch union gives "
    "re-aggregation. Oracle-checkable via exact anchors: each grain row "
    "carries the exact distinct count plus a BIGINT flag asserting the "
    "merged estimate is within 5% of it (lgK=12 keeps error ~1.6%); "
    "DuckDB computes the same anchors and literal 1s. At 100 TB the "
    "(day, type) sketch table IS the stored rollup; every dashboard "
    "grain is a cheap merge over it — the exact twin here exists only "
    "so the gate sees sketch regressions as red rows.",
    oracle="""
SELECT 'day' AS grain, CAST(CAST(ts AS DATE) AS VARCHAR) AS key,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(1 AS BIGINT) AS est_ok
FROM events GROUP BY 2
UNION ALL
SELECT 'event_type', event_type, CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(1 AS BIGINT)
FROM events GROUP BY 2
UNION ALL
SELECT 'total', '*', CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(1 AS BIGINT)
FROM events
""",
)
def q106_sketch_grains(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Exactly TWO fact scans, each lineage-cut before its multiple
    # consumers (ReuseExchange does not dedupe the subtrees — without
    # the cuts this plan scanned events 6x, measured): the (day, type)
    # sketch rollup that all three grains re-merge from, and the
    # distinct (day, type, user) triple table that all three EXACT
    # anchors reduce (any grain's count(DISTINCT user) over the triples
    # equals it over raw events, since every (grain, user) pair
    # survives the projection). The anchor scan exists only for the
    # gate; production ships the sketch table alone.
    base = _pin(
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    triples = _pin(
        ev.select(F.to_date("ts").alias("day"), "event_type", "user_id")
        .distinct()
    )

    def _ok():
        est = F.hll_sketch_estimate("g")
        return (
            F.abs(est - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), F.lit(0.05) * F.col("exact_users"))
        ).cast("bigint")

    exact_day = triples.groupBy("day").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    per_day = (
        base.groupBy("day")
        .agg(F.hll_union_agg("sk").alias("g"))
        .join(exact_day, "day")
        .select(
            F.lit("day").alias("grain"),
            F.col("day").cast("string").alias("key"),
            "exact_users",
            _ok().alias("est_ok"),
        )
    )
    exact_type = triples.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    per_type = (
        base.groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("g"))
        .join(exact_type, "event_type")
        .select(
            F.lit("event_type").alias("grain"),
            F.col("event_type").alias("key"),
            "exact_users",
            _ok().alias("est_ok"),
        )
    )
    total = (
        base.agg(F.hll_union_agg("sk").alias("g"))
        .crossJoin(
            F.broadcast(  # bounded: 1-row exact count
                triples.agg(F.count_distinct("user_id").alias("exact_users"))
            )
        )
        .select(
            F.lit("total").alias("grain"),
            F.lit("*").alias("key"),
            "exact_users",
            _ok().alias("est_ok"),
        )
    )
    return per_day.unionByName(per_type).unionByName(total)


# --------------------------------------------------------------------------
# Overlapping (strided) chunking — the RAG retrieval splitter
# --------------------------------------------------------------------------

_OV_SIZE = 32   # tokens per chunk
_OV_STRIDE = 24  # stride; overlap = _OV_SIZE - _OV_STRIDE tokens

_OV_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS tk FROM documents
),
e AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(0, (len(tk) - 1) // {_OV_STRIDE}),
           i -> {{'chunk_id': CAST(i AS BIGINT),
                  'n_tokens': CAST(len(tk[i * {_OV_STRIDE} + 1 :
                                          i * {_OV_STRIDE} + {_OV_SIZE}])
                                   AS BIGINT),
                  'chunk_md5': md5(array_to_string(
                      tk[i * {_OV_STRIDE} + 1 : i * {_OV_STRIDE} + {_OV_SIZE}],
                      ' '))}})) AS c
  FROM t
)
SELECT doc_id, c.chunk_id AS chunk_id, c.n_tokens AS n_tokens,
       c.chunk_md5 AS chunk_md5
FROM e
"""


@register(
    "text_chunk_overlap",
    "text",
    f"Overlapping strided chunking (the RAG retrieval splitter): "
    f"{_OV_SIZE}-token chunks every {_OV_STRIDE} tokens, so consecutive "
    f"chunks share {_OV_SIZE - _OV_STRIDE} tokens and no sentence is "
    "ever split across a hard boundary without appearing whole in a "
    "neighbor — the retrieval-recall insurance non-overlapping "
    "pre-training chunks (text_chunking) don't need. Row-local "
    "sequence + slice expansion, zero shuffles; chunk content is "
    "value-checked via md5 so the slicing arithmetic itself is "
    "hash-verified cross-engine.",
    oracle=_OV_ORACLE,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    withs = d.select("doc_id", toks.alias("tk"))
    chunk = F.explode(
        F.transform(
            F.sequence(
                F.lit(0), idiv(F.size("tk") - 1, _OV_STRIDE).cast("int")
            ),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.size(F.slice("tk", i * _OV_STRIDE + 1, _OV_SIZE))
                .cast("long")
                .alias("n_tokens"),
                F.md5(
                    F.concat_ws(" ", F.slice("tk", i * _OV_STRIDE + 1, _OV_SIZE))
                ).alias("chunk_md5"),
            ),
        )
    )
    return withs.select("doc_id", chunk.alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"),
    )
