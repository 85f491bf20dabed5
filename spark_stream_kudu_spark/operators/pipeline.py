"""Round-3 training-data pipeline operators.

Additions to the LLM-data-pipeline surface (north star), each with a
DuckDB oracle twin:

- ``text_repetition`` — Gopher-style repetition quality filters
  (distinct-token ratio, top-token ratio, duplicate-bigram ratio) as
  row-local array expressions; the standard "drop boilerplate/spam"
  pre-training filter.
- ``text_collocations`` — corpus-level bigram collocations scored by
  PMI (pointwise mutual information); one bigram-count shuffle, vocab
  sides broadcast.
- ``text_url_normalize`` — URL canonicalization (scheme/www/query
  stripping, host extraction) + per-domain corpus stats; the
  common-crawl-style provenance rollup. The fixture corpus carries no
  URL column, so a deterministic URL is synthesized from
  (source, lang, doc_id) identically in both engines — the mechanism
  (normalize → group by registered domain) is the contract.
- ``sim_topk_quantized`` — int8 embedding quantization + top-k cosine
  over the quantized vectors using EXACT integer dot products; the
  4x-memory / integer-SIMD scale path for ANN, with quantization error
  observable against the float oracle twins (sim_topk_bruteforce).
- ``q68_scd2_history`` — change-log → SCD2 (type-2 slowly-changing
  dimension) interval table: collapse consecutive identical states,
  derive valid_from/valid_to/is_current with lag/lead windows. The
  batch generalization of the reference's keyed-upsert time series
  (kafka_to_kudu.py:40-53 — each upsert is a new "current" version).
- ``q69_merge_upsert`` — batch MERGE INTO: keyed base snapshot merged
  with an update set (matched -> update, unmatched -> insert), the
  batch twin of streaming/sinks.py::merge_by_key (reference upsert
  semantics, java KafkaToKuduJava.java:113-127).

All operators scale scan-local or with exactly one keyed shuffle; no
Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround
from spark_stream_kudu_spark.functions.textutil import sql_tokens, tokens
from spark_stream_kudu_spark.functions.vectors import sql_dot
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Gopher-style repetition filters
# --------------------------------------------------------------------------

# Keep thresholds (Gopher-flavored, tuned to the synthetic corpus so the
# flag is non-vacuous at every fixture scale).
_REP_MAX_TOP_TOKEN = 0.20  # most frequent token > 20% of doc -> drop
_REP_MIN_DISTINCT = 0.30  # < 30% distinct tokens -> drop

_REPETITION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
g AS (
  SELECT doc_id, t,
         list_transform(list_slice(t, 1, len(t)-1), (x, i) -> x || ' ' || t[i+1]) AS big
  FROM tok
),
m AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         len(list_distinct(t)) * 1.0 / len(t) AS distinct_token_ratio,
         list_max(list_transform(list_distinct(t),
                                 d -> len(list_filter(t, x -> x = d))))
           * 1.0 / len(t) AS top_token_ratio,
         CASE WHEN len(big) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(big)) * 1.0 / len(big) END
           AS dup_bigram_ratio
  FROM g
)
SELECT doc_id, n_tokens,
       floor(distinct_token_ratio * 10000 + 0.5) / 10000 AS distinct_token_ratio,
       floor(top_token_ratio * 10000 + 0.5) / 10000      AS top_token_ratio,
       floor(dup_bigram_ratio * 10000 + 0.5) / 10000     AS dup_bigram_ratio,
       (top_token_ratio <= {_REP_MAX_TOP_TOKEN}
        AND distinct_token_ratio >= {_REP_MIN_DISTINCT})  AS keep
FROM m
"""


def _bigrams(t: Column) -> Column:
    """Adjacent-token bigrams as space-joined strings (row-local)."""
    # slice element i (0-based) is t[i+1] (1-based); its successor is
    # t[i+2] — same construction as the oracle's 1-based list lambda.
    return F.transform(
        F.slice(t, 1, F.size(t) - 1),
        lambda x, i: F.concat_ws(" ", x, F.element_at(t, i + 2)),
    )


def mode_count(t: Column) -> Column:
    """Count of the most frequent element of array ``t`` — the longest
    equal run of the sorted array, found by a single linear fold
    (acc = last element seen, current run, best run). O(n log n) per
    row vs the O(distinct * n) transform/filter nesting, which on
    book-length documents dominates the whole suite."""

    def step(acc: Column, x: Column) -> Column:
        cur = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            cur.alias("cur"),
            F.greatest(acc["best"], cur).alias("best"),
        )

    return F.aggregate(
        F.array_sort(t),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
        ),
        step,
        lambda acc: acc["best"],
    )


@register(
    "text_repetition",
    "text",
    "Gopher-style repetition quality filters: distinct-token ratio, "
    "top-token frequency ratio, duplicate-bigram ratio, and the keep/drop "
    "flag they imply — the standard boilerplate/spam pre-training filter. "
    "All metrics are row-local array expressions (the per-doc mode count "
    "sorts the token array and takes the longest equal run via a linear "
    "fold — O(n log n) per document, never corpus-sized), so at 100 TB "
    "this runs inside the parquet scan with zero shuffles and prunes to "
    "(doc_id, text).",
    oracle=_REPETITION_ORACLE,
    bench=True,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    # Spread the thin projection before the CPU-heavy per-doc map
    # (tokenize + array_sort fold): the one-file fixture scan would
    # otherwise serialize it on a single task (no-op at real scale).
    base = spread_small_scan(d.select("doc_id", "text")).select(
        "doc_id", t.alias("t")
    ).withColumn("big", _bigrams(F.col("t")))
    distinct_ratio = F.size(F.array_distinct("t")) * F.lit(1.0) / F.size("t")
    top_ratio = mode_count(F.col("t")) * F.lit(1.0) / F.size("t")
    dup_bigram = F.when(F.size("big") == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct("big")) * F.lit(1.0) / F.size("big")
    )
    m = base.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        distinct_ratio.alias("distinct_token_ratio"),
        top_ratio.alias("top_token_ratio"),
        dup_bigram.alias("dup_bigram_ratio"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        fround(F.col("distinct_token_ratio"), 4).alias("distinct_token_ratio"),
        fround(F.col("top_token_ratio"), 4).alias("top_token_ratio"),
        fround(F.col("dup_bigram_ratio"), 4).alias("dup_bigram_ratio"),
        (
            (F.col("top_token_ratio") <= _REP_MAX_TOP_TOKEN)
            & (F.col("distinct_token_ratio") >= _REP_MIN_DISTINCT)
        ).alias("keep"),
    )


# --------------------------------------------------------------------------
# Bigram collocations by PMI
# --------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP = 20

_COLLOCATIONS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens("text")} AS t FROM documents
),
big AS (
  SELECT unnest(list_transform(list_slice(t, 1, len(t)-1),
                               (x, i) -> x || ' ' || t[i+1])) AS bigram
  FROM tok
),
bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS n_xy FROM big GROUP BY bigram),
uni AS (SELECT unnest(t) AS term FROM tok),
uc AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY term),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_uni FROM uc),
tot2 AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_big FROM bc),
sc AS (
  SELECT bc.bigram, bc.n_xy, ux.n AS n_x, uy.n AS n_y,
         floor(ln((bc.n_xy * 1.0 / tot2.n_big) /
                  ((ux.n * 1.0 / tot.n_uni) * (uy.n * 1.0 / tot.n_uni)))
               * 10000 + 0.5) / 10000 AS pmi
  FROM bc
  JOIN uc ux ON ux.term = split_part(bc.bigram, ' ', 1)
  JOIN uc uy ON uy.term = split_part(bc.bigram, ' ', 2)
  CROSS JOIN tot CROSS JOIN tot2
  WHERE bc.n_xy >= {_PMI_MIN_COUNT}
)
SELECT bigram, n_xy, n_x, n_y, pmi, rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS rank FROM sc
) WHERE rank <= {_PMI_TOP}
"""


@register(
    "text_collocations",
    "text",
    f"Corpus bigram collocations scored by PMI, top {_PMI_TOP} with a "
    f"min-count floor of {_PMI_MIN_COUNT} — the n-gram language-model "
    "statistic behind tokenizer-vocabulary and phrase-mining passes. One "
    "corpus-sized shuffle (the bigram groupBy); unigram counts are "
    "vocab-sized and broadcast back; the totals are 1-row broadcasts. The "
    "final global top-k ranks only the filtered collocation table.",
    oracle=_COLLOCATIONS_ORACLE,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.lineage import pin as _pin

    d = _docs(spark, sf_dir)
    t = tokens(F.col("text"))
    # Lazy pins (round-11): the token table feeds BOTH count chains and
    # the unigram vocab feeds three consumers (ux, uy, the total) — the
    # plan tokenized the corpus five times (5 parquet scans). One
    # tokenize pass + one vocab aggregate now serve all consumers
    # (compute-once via pin(eager=False), no blocking barrier); flat at
    # fixture scale, x5 -> x1 corpus passes at 100 TB. In production
    # the vocab table IS a stored artifact of the corpus-stats job.
    tok = _pin(d.select("doc_id", t.alias("t")), eager=False)
    bc = (
        tok.select(F.explode(_bigrams(F.col("t"))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    uc = _pin(
        tok.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n")),
        eager=False,
    )
    tot = uc.agg(F.sum("n").alias("n_uni"))
    tot2 = bc.agg(F.sum("n_xy").alias("n_big"))
    ux = uc.select(F.col("term").alias("term_x"), F.col("n").alias("n_x"))
    uy = uc.select(F.col("term").alias("term_y"), F.col("n").alias("n_y"))
    sc = (
        bc.filter(F.col("n_xy") >= _PMI_MIN_COUNT)
        .withColumn("term_x", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .withColumn("term_y", F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)))
        # ux/uy are |vocab| (corpus-scaling): un-hinted — stats/AQE
        # broadcast them at test SF, shuffle on the term key at scale.
        .join(ux, "term_x")
        .join(uy, "term_y")
        .join(F.broadcast(tot))   # bounded: 1-row total
        .join(F.broadcast(tot2))  # bounded: 1-row total
    )
    pmi = fround(
        F.log(
            (F.col("n_xy") * F.lit(1.0) / F.col("n_big"))
            / (
                (F.col("n_x") * F.lit(1.0) / F.col("n_uni"))
                * (F.col("n_y") * F.lit(1.0) / F.col("n_uni"))
            )
        ),
        4,
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("bigram").asc())
    return (
        sc.select("bigram", "n_xy", "n_x", "n_y", pmi.alias("pmi"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PMI_TOP)
    )


# --------------------------------------------------------------------------
# URL normalization + per-domain stats
# --------------------------------------------------------------------------

# Deterministic URL synthesis — the corpus has no URL column; both
# engines derive the identical value so the normalization mechanism is
# what gets checked.
_URL_SQL = (
    "'HTTPS://WWW.' || source || (CASE doc_id % 3 WHEN 0 THEN '.com' "
    "WHEN 1 THEN '.org' ELSE '.net' END) || '/' || lang || '/doc-' || "
    "doc_id || '?session=' || (doc_id % 7) || '#frag'"
)

_URL_ORACLE = f"""
WITH u AS (
  SELECT doc_id, n_chars, lang, {_URL_SQL} AS url FROM documents
),
n AS (
  SELECT doc_id, n_chars, lang,
         regexp_replace(regexp_replace(lower(url), '^[a-z]+://', ''),
                        '[?#].*$', '') AS no_scheme
  FROM u
),
c AS (
  SELECT doc_id, n_chars, lang,
         regexp_replace(split_part(no_scheme, '/', 1), '^www\\.', '') AS host,
         no_scheme AS canonical_path
  FROM n
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       min(canonical_path) AS sample_path
FROM c
GROUP BY host
"""


@register(
    "text_url_normalize",
    "text",
    "URL canonicalization + per-domain corpus rollup: lowercase, strip "
    "scheme / 'www.' / query-string / fragment, extract the host, then "
    "group the corpus by domain (doc count, char volume, language spread) "
    "— the common-crawl provenance profile that drives per-domain "
    "sampling weights. Normalization is scan-local regex; the rollup is "
    "one domain-keyed shuffle whose cardinality is |domains|, not |docs|.",
    oracle=_URL_ORACLE,
)
def text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.when(F.col("doc_id") % 3 == 0, ".com")
        .when(F.col("doc_id") % 3 == 1, ".org")
        .otherwise(".net"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id"),
        F.lit("?session="),
        F.col("doc_id") % 7,
        F.lit("#frag"),
    )
    no_scheme = F.regexp_replace(
        F.regexp_replace(F.lower(url), r"^[a-z]+://", ""), r"[?#].*$", ""
    )
    host = F.regexp_replace(F.split_part(no_scheme, F.lit("/"), F.lit(1)), r"^www\.", "")
    c = d.select(
        host.alias("host"),
        no_scheme.alias("canonical_path"),
        "n_chars",
        "lang",
    )
    return c.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.min("canonical_path").alias("sample_path"),
    )


# --------------------------------------------------------------------------
# int8-quantized cosine top-k
# --------------------------------------------------------------------------

_QN_QUERIES = 8  # same query set as sim_topk_bruteforce
_QN_TOP_K = 5

# Per-vector symmetric int8 quantization: scale = 127 / max|v|,
# q_i = clamp(floor(v_i * scale + 0.5), -127, 127). Quantized cosine
# uses INTEGER dot products (exact in both engines — no float
# accumulation), scales cancel in the ratio.
_QUANT_SQL = (
    "list_transform(CAST({v} AS DOUBLE[]), x -> CAST(greatest(-127, least(127, "
    "floor(x * (127.0 / greatest(list_max(list_transform(CAST({v} AS DOUBLE[]), "
    "y -> abs(y))), 1e-12)) + 0.5))) AS BIGINT))"
)

_QUANTIZED_ORACLE = f"""
WITH q8 AS (
  SELECT vec_id, {_QUANT_SQL.format(v="embedding")} AS qv FROM embeddings
),
q AS (SELECT vec_id AS qid, qv AS qqv FROM q8 WHERE vec_id < {_QN_QUERIES}),
s AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         floor({sql_dot("q.qqv", "e.qv")} /
               (sqrt({sql_dot("q.qqv", "q.qqv")}) * sqrt({sql_dot("e.qv", "e.qv")}))
               * 1000000 + 0.5) / 1000000 AS cosine_q
  FROM q JOIN q8 e ON e.vec_id <> q.qid
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine_q DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT qid, neighbor_id, cosine_q, rank FROM r WHERE rank <= {_QN_TOP_K}
"""


def _quantize(v: Column) -> Column:
    dv = F.transform(v, lambda x: x.cast("double"))
    max_abs = F.greatest(
        F.array_max(F.transform(dv, lambda y: F.abs(y))), F.lit(1e-12)
    )
    scale = F.lit(127.0) / max_abs
    return F.transform(
        dv,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x * scale + F.lit(0.5)))
        ).cast("long"),
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


@register(
    "sim_topk_quantized",
    "similarity",
    f"Top-{_QN_TOP_K} cosine neighbors over int8-QUANTIZED embeddings "
    "(per-vector symmetric scale, clamp to ±127): the 4x-memory / "
    "integer-SIMD ANN scale path. Scores are integer dot products — exact "
    "in both engines, zero float-accumulation noise — with scales "
    "cancelling in the cosine ratio; only the final divide is floating "
    "point. Same broadcast-queries x partition-local-corpus plan as the "
    "float baseline; quantization error is observable by diffing against "
    "sim_topk_bruteforce on the same query set.",
    oracle=_QUANTIZED_ORACLE,
)
def sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _quantize(F.col("embedding")).alias("qv")
    )
    q = e.filter(F.col("vec_id") < _QN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qqv")
    )
    idot = _int_dot(F.col("qqv"), F.col("qv")).cast("double")
    cos_q = idot / (
        F.sqrt(_int_dot(F.col("qqv"), F.col("qqv")).cast("double"))
        * F.sqrt(_int_dot(F.col("qv"), F.col("qv")).cast("double"))
    )
    scored = e.join(
        F.broadcast(q),  # bounded: fixed _QN_QUERIES query set (non-equi probe)
        F.col("vec_id") != F.col("qid"),
    ).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        fround(cos_q, 6).alias("cosine_q"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine_q").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _QN_TOP_K)
        .select("qid", "neighbor_id", "cosine_q", "rank")
    )


# --------------------------------------------------------------------------
# SCD2: change log -> versioned interval table
# --------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH ch AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
kept AS (
  SELECT user_id, event_id, ts, event_type
  FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state,
       epoch_ms(ts) AS valid_from_ms,
       epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
FROM kept
"""


@register(
    "q68_scd2_history",
    "relational",
    "Change-log -> SCD2 (type-2 slowly-changing dimension): per key, drop "
    "rows whose state equals the previous state (lag), then derive "
    "[valid_from, valid_to) intervals and the is_current flag (lead). The "
    "batch generalization of the reference's keyed upsert time series "
    "(each Kudu upsert supersedes the previous 'current' row, "
    "kafka_to_kudu.py:40-53). Two window passes over the SAME "
    "partitioning (user_id), so Catalyst plans ONE shuffle; state is "
    "row-local within the partition — scales to any key cardinality.",
    oracle=_SCD2_ORACLE,
)
def q68_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.withColumn("prev_type", F.lag("event_type").over(w))
    kept = ch.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_id", "ts", "event_type")
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return kept.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_millis("ts").alias("valid_from_ms"),
        F.unix_millis(nxt).alias("valid_to_ms"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Batch MERGE INTO (keyed snapshot + update set)
# --------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH upd AS (
  SELECT o_custkey AS custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spent_cents
  FROM orders
  GROUP BY o_custkey
),
base AS (
  SELECT c_custkey AS custkey, c_name AS name,
         CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents
  FROM customer
)
SELECT COALESCE(b.custkey, u.custkey) AS custkey,
       COALESCE(b.name, 'unknown-' || u.custkey) AS name,
       COALESCE(b.acctbal_cents, 0) + COALESCE(u.spent_cents, 0) AS balance_cents,
       COALESCE(u.n_orders, 0) AS n_orders,
       CASE WHEN b.custkey IS NULL THEN 'insert'
            WHEN u.custkey IS NULL THEN 'keep'
            ELSE 'update' END AS merge_action
FROM base b FULL OUTER JOIN upd u ON u.custkey = b.custkey
"""


@register(
    "q69_merge_upsert",
    "relational",
    "Batch MERGE INTO: a keyed base snapshot (customer) merged with a "
    "derived update set (per-customer order totals) — matched keys update "
    "the balance, unmatched updates insert, untouched rows pass through, "
    "with the action tagged per row. The batch twin of the streaming "
    "upsert sink (streaming/sinks.py::merge_by_key) and of Kudu's "
    "INSERT/UPSERT surface (KafkaToKuduJava.java:113-127). Money is "
    "integer cents so both engines agree exactly. One shuffle for the "
    "update aggregation + one full-outer merge join on the key; at 100 TB "
    "both sides hash-partition on custkey (no broadcast — both sides are "
    "table-sized), the exact shape Delta/Iceberg MERGE plans.",
    oracle=_MERGE_ORACLE,
    bench=True,
)
def q69_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    upd = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spent_cents"),
    )
    base = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )
    b = base.alias("b")
    u = upd.alias("u")
    merged = b.join(u, F.col("b.custkey") == F.col("u.custkey"), "full_outer")
    return merged.select(
        F.coalesce(F.col("b.custkey"), F.col("u.custkey")).alias("custkey"),
        F.coalesce(
            F.col("b.name"), F.concat(F.lit("unknown-"), F.col("u.custkey"))
        ).alias("name"),
        (
            F.coalesce(F.col("b.acctbal_cents"), F.lit(0))
            + F.coalesce(F.col("u.spent_cents"), F.lit(0))
        ).alias("balance_cents"),
        F.coalesce(F.col("u.n_orders"), F.lit(0)).alias("n_orders"),
        F.when(F.col("b.custkey").isNull(), "insert")
        .when(F.col("u.custkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    )


# --------------------------------------------------------------------------
# Point-in-time (time-travel) join against the SCD2 dimension history
# --------------------------------------------------------------------------

_PIT_LAG_MS = 1_800_000  # probe: state as of 30 minutes before each event

_PIT_ORACLE = f"""
WITH ch AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
kept AS (
  SELECT user_id, event_id, ts, event_type
  FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
),
scd2 AS (
  SELECT user_id, event_type AS state,
         epoch_ms(ts) AS valid_from_ms,
         epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms
  FROM kept
),
probes AS (
  SELECT event_id, user_id, epoch_ms(ts) - {_PIT_LAG_MS} AS probe_ms
  FROM events
)
SELECT p.event_id, p.user_id, p.probe_ms, s.state AS state_at_probe
FROM probes p
LEFT JOIN scd2 s
  ON s.user_id = p.user_id
 AND s.valid_from_ms <= p.probe_ms
 AND (s.valid_to_ms IS NULL OR p.probe_ms < s.valid_to_ms)
"""


@register(
    "q79_pit_join",
    "temporal",
    "Point-in-time (time-travel) join: each probe row resolves the SCD2 "
    "dimension state that was valid at its timestamp (here: each event "
    "asks what the user's state was 30 minutes earlier; probes before "
    "the first interval resolve to NULL, preserved by a left join in the "
    "oracle). NOT executed as the oracle's interval theta-join — SCD2 "
    "intervals are contiguous per key, so the engine runs it as an AS-OF "
    "join: union interval-starts with probes, ONE window sort per key, "
    "carry the latest state forward. One shuffle on user_id, no "
    "nested-loop, state row-local — the warehouse 'reproduce features as "
    "of training time' kernel that prevents feature leakage from future "
    "dimension updates.",
    oracle=_PIT_ORACLE,
)
def q79_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    kept = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
        .select(
            "user_id",
            F.unix_millis("ts").alias("t_ms"),
            F.col("event_type").alias("state"),
            F.col("event_id").alias("ord"),
        )
    )
    probes = ev.select(
        "event_id",
        "user_id",
        (F.unix_millis("ts") - F.lit(_PIT_LAG_MS)).alias("t_ms"),
    )
    # As-of union: interval starts sort before probes at the same
    # timestamp (tag 0 < 1), last(state) ignoring nulls carries the
    # currently-valid state into each probe row. The change event_id
    # ("ord") is the third sort key so that two state changes at the
    # same millisecond resolve deterministically to the higher event_id
    # — exactly the state the oracle's lead()-derived intervals keep
    # (the lower id's interval is zero-length and matches no probe).
    combined = kept.select(
        "user_id", "t_ms", F.lit(0).alias("tag"), "ord",
        F.lit(None).cast("long").alias("event_id"), "state"
    ).unionByName(
        probes.select(
            "user_id", "t_ms", F.lit(1).alias("tag"),
            F.col("event_id").alias("ord"), "event_id",
            F.lit(None).cast("string").alias("state")
        )
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("t_ms", "tag", "ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = combined.withColumn(
        "state_at_probe", F.last("state", ignorenulls=True).over(wc)
    )
    return carried.filter(F.col("tag") == 1).select(
        "event_id", "user_id", F.col("t_ms").alias("probe_ms"), "state_at_probe"
    )


# --------------------------------------------------------------------------
# Snapshot diff (table reconciliation between two versions)
# --------------------------------------------------------------------------

# v2 is derived deterministically from v1 (orders) by key-hash
# percentile: <5 removed, 5-14 price-bumped 10%, >=97 re-keyed as inserts.
_DIFF_REMOVE_PCT = 5
_DIFF_CHANGE_PCT = 15
_DIFF_INSERT_PCT = 97
_DIFF_KEY_OFFSET = 100_000_000


def _diff_pct_sql(expr: str) -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    return f"({sql_md5_int32(f'CAST({expr} AS VARCHAR)')} % 100)"


_SNAPDIFF_ORACLE = f"""
WITH v1 AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders
),
v2 AS (
  SELECT okey,
         status,
         CASE WHEN {_diff_pct_sql("okey")} BETWEEN {_DIFF_REMOVE_PCT} AND {_DIFF_CHANGE_PCT - 1}
              THEN CAST(floor(price_cents * 1.1 + 0.5) AS BIGINT)
              ELSE price_cents END AS price_cents
  FROM v1
  WHERE {_diff_pct_sql("okey")} >= {_DIFF_REMOVE_PCT}
  UNION ALL
  SELECT okey + {_DIFF_KEY_OFFSET}, status, price_cents
  FROM v1 WHERE {_diff_pct_sql("okey")} >= {_DIFF_INSERT_PCT}
),
d AS (
  SELECT coalesce(v1.okey, v2.okey) AS okey,
         coalesce(v2.status, v1.status) AS status,
         CASE WHEN v1.okey IS NULL THEN 'added'
              WHEN v2.okey IS NULL THEN 'removed'
              WHEN v1.price_cents <> v2.price_cents THEN 'changed'
              ELSE 'unchanged' END AS change_type,
         coalesce(v2.price_cents, 0) - coalesce(v1.price_cents, 0) AS delta_cents
  FROM v1 FULL OUTER JOIN v2 ON v1.okey = v2.okey
)
SELECT change_type, status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(delta_cents) AS BIGINT) AS delta_cents
FROM d
GROUP BY 1, 2
"""


@register(
    "q80_snapshot_diff",
    "pipeline",
    "Snapshot reconciliation: diff two versions of a keyed table into "
    "added / removed / changed / unchanged classes with per-class row "
    "counts and value deltas (v2 here is derived deterministically from "
    "v1 by key-hash so the diff is oracle-checkable: 5% removed, 10% "
    "price-bumped, 3% re-keyed inserts). One full-outer join on the key "
    "+ one rollup — the audit primitive behind incremental-load "
    "validation and CDC backfill checks. At 100 TB both sides shuffle "
    "once on the key; with both snapshots bucket-layouted on the key "
    "(sources/bucketed.py) the join is zero-shuffle, and comparing row "
    "FINGERPRINTS (md5 of the value columns, dedup_fingerprint) instead "
    "of each column cuts the compare to one string per row.",
    oracle=_SNAPDIFF_ORACLE,
    bench=True,
)
def q80_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    v1 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("price_cents"),
    )
    pct = md5_int32(F.col("okey").cast("string")) % 100
    surv = v1.filter(pct >= _DIFF_REMOVE_PCT).select(
        "okey",
        "status",
        F.when(
            pct.between(_DIFF_REMOVE_PCT, _DIFF_CHANGE_PCT - 1),
            F.floor(F.col("price_cents") * 1.1 + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.col("price_cents"))
        .alias("price_cents"),
    )
    inserts = v1.filter(pct >= _DIFF_INSERT_PCT).select(
        (F.col("okey") + _DIFF_KEY_OFFSET).alias("okey"), "status", "price_cents"
    )
    v2 = surv.unionByName(inserts)
    a = v1.alias("a")
    b = v2.alias("b")
    d = a.join(b, F.col("a.okey") == F.col("b.okey"), "full_outer").select(
        F.coalesce(F.col("b.status"), F.col("a.status")).alias("status"),
        F.when(F.col("a.okey").isNull(), "added")
        .when(F.col("b.okey").isNull(), "removed")
        .when(F.col("a.price_cents") != F.col("b.price_cents"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce(F.col("b.price_cents"), F.lit(0))
            - F.coalesce(F.col("a.price_cents"), F.lit(0))
        ).alias("delta_cents"),
    )
    return d.groupBy("change_type", "status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("delta_cents").alias("delta_cents"),
    )


# --------------------------------------------------------------------------
# Incremental corpus ingest (dedup new batch against the historical store)
# --------------------------------------------------------------------------

_INGEST_SPLIT_PCT = 70  # docs below this key-hash percentile are "historical"


def _ingest_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    pct = f"({sql_md5_int32('CAST(doc_id AS VARCHAR)')} % 100)"
    fp = "md5(concat_ws(' ', list_sort(list_distinct({toks}))))".format(
        toks=sql_tokens("text")
    )
    return f"""
WITH fps AS (
  SELECT doc_id, source, {pct} AS pct, {fp} AS fp FROM documents
),
hist AS (SELECT DISTINCT fp FROM fps WHERE pct < {_INGEST_SPLIT_PCT}),
batch AS (SELECT * FROM fps WHERE pct >= {_INGEST_SPLIT_PCT}),
marked AS (
  SELECT b.doc_id, b.source, b.fp,
         CAST(h.fp IS NOT NULL AS INT) AS dup_hist,
         CAST(row_number() OVER (PARTITION BY b.fp ORDER BY b.doc_id) > 1 AS INT)
           AS dup_batch
  FROM batch b LEFT JOIN hist h ON h.fp = b.fp
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_batch,
       CAST(sum(dup_hist) AS BIGINT) AS n_dup_vs_history,
       CAST(sum(CASE WHEN dup_hist = 0 THEN dup_batch ELSE 0 END) AS BIGINT)
         AS n_dup_within_batch,
       CAST(sum(CASE WHEN dup_hist = 0 AND dup_batch = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ingested
FROM marked
GROUP BY source
"""


@register(
    "pipeline_incremental_ingest",
    "pipeline",
    "Incremental corpus ingest: a new document batch (a deterministic "
    f"{100 - _INGEST_SPLIT_PCT}% key-hash slice standing in for today's "
    "crawl) dedupes against the HISTORICAL store's content fingerprints "
    "(canonical-token md5, the dedup_fingerprint primitive) and within "
    "itself (first-seen-by-id wins), reporting per-source ingest / "
    "dup-vs-history / dup-within-batch counts. The daily production "
    "loop: history contributes only its fingerprint column (at 100 TB a "
    "pre-computed fingerprint table partitioned by fp prefix), the "
    "anti-join shuffles on fp, and the batch — the small side — windows "
    "once. Never rescans historical text.",
    oracle=_ingest_oracle(),
)
def pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text")))))
    )
    fps = d.select(
        "doc_id",
        "source",
        (md5_int32(F.col("doc_id").cast("string")) % 100).alias("pct"),
        fp.alias("fp"),
    )
    hist = (
        fps.filter(F.col("pct") < _INGEST_SPLIT_PCT)
        .select(F.col("fp").alias("hfp"))
        .distinct()
    )
    batch = fps.filter(F.col("pct") >= _INGEST_SPLIT_PCT)
    w = Window.partitionBy("fp").orderBy("doc_id")
    marked = (
        batch.join(hist, batch["fp"] == hist["hfp"], "left")
        .withColumn("dup_hist", F.col("hfp").isNotNull().cast("int"))
        .withColumn("dup_batch", (F.row_number().over(w) > 1).cast("int"))
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum("dup_hist").alias("n_dup_vs_history"),
        F.sum(
            F.when(F.col("dup_hist") == 0, F.col("dup_batch")).otherwise(F.lit(0))
        ).alias("n_dup_within_batch"),
        F.sum(
            ((F.col("dup_hist") == 0) & (F.col("dup_batch") == 0)).cast("int")
        ).alias("n_ingested"),
    )


# --------------------------------------------------------------------------
# Sequence training examples (context window -> next-event target)
# --------------------------------------------------------------------------

_SEQ_CONTEXT = 3  # context length (events) per training example

_SEQ_EXAMPLES_ORACLE = f"""
WITH o AS (
  SELECT user_id, event_id, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(event_type, 3) OVER w AS y,
         lead(event_id, 3) OVER w AS target_event_id
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS example_id,
       concat_ws('>', event_type, t1, t2) AS context,
       y AS target,
       target_event_id
FROM o WHERE y IS NOT NULL
"""


@register(
    "pipeline_sequence_examples",
    "pipeline",
    f"Training-example construction from event sequences: every position "
    f"in each user's ordered stream yields a ({_SEQ_CONTEXT}-event "
    "context, next-event target) pair — the sliding-window next-token "
    "dataset shape, via lead() over ONE per-user window (no self-joins, "
    "no explode; examples overlap but each row is produced once). One "
    "shuffle on user_id; example count = |events| - 3 per user, "
    "generated at scan parallelism. Downstream splits hash the "
    "example_id with the leakage-free cluster split machinery.",
    oracle=_SEQ_EXAMPLES_ORACLE,
)
def pipeline_sequence_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("event_type", 3).over(w).alias("y"),
        F.lead("event_id", 3).over(w).alias("target_event_id"),
    )
    return o.filter(F.col("y").isNotNull()).select(
        "user_id",
        F.col("event_id").alias("example_id"),
        F.concat_ws(">", "event_type", "t1", "t2").alias("context"),
        F.col("y").alias("target"),
        "target_event_id",
    )


# --------------------------------------------------------------------------
# Targeted deletion (right-to-be-forgotten) with audit
# --------------------------------------------------------------------------


def _deletion_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    row = (
        "concat_ws('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR), "
        "event_type, CAST(epoch_ms(ts) AS VARCHAR))"
    )
    h = sql_md5_int32(row)
    return f"""
WITH survivors AS (
  SELECT * FROM events WHERE user_id % 10 <> 3
)
SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n_before,
       CAST((SELECT count(*) FROM events WHERE user_id % 10 = 3) AS BIGINT)
         AS n_deleted,
       CAST(count(*) AS BIGINT) AS n_after,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_after,
       CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR) AS digest_after
FROM survivors
"""


@register(
    "pipeline_targeted_deletion",
    "pipeline",
    "Targeted deletion (right-to-be-forgotten): drop every event of a "
    "deletion set (deterministic user_id % 10 = 3 stands in for the "
    "request list) and emit the compliance audit row — counts before/"
    "deleted/after plus the surviving table's content digest (q99 "
    "convention), so the deletion is VERIFIABLE later: re-digest and "
    "compare, no row-level inspection. At 100 TB the deletion set "
    "broadcasts into an anti-join predicate evaluated at the scan "
    "(partition rewrite only where matches exist); the digest doubles "
    "as the proof-of-erasure artifact regulators ask for.",
    oracle=_deletion_oracle(),
)
def pipeline_targeted_deletion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    survivors = ev.filter(F.col("user_id") % 10 != 3)
    row = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
        F.unix_millis("ts").cast("string"),
    )
    before = ev.agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum((F.col("user_id") % 10 == 3).cast("long")).alias("n_deleted"),
    )
    after = survivors.agg(
        F.count(F.lit(1)).alias("n_after"),
        F.count_distinct(F.col("user_id")).alias("n_users_after"),
        F.sum(md5_int32(row).cast("decimal(38,0)"))
        .cast("string")
        .alias("digest_after"),
    )
    return before.crossJoin(after)


# --------------------------------------------------------------------------
# Per-key rate limiting / quota sampling
# --------------------------------------------------------------------------

_RATE_LIMIT_N = 3  # keep at most N events per (event_type, hour)

_RATE_LIMIT_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
         row_number() OVER (
           PARTITION BY event_type, date_trunc('hour', ts)
           ORDER BY ts ASC, event_id ASC
         ) AS rk
  FROM events
)
SELECT user_id, event_id, event_type, ts_ms
FROM ranked WHERE rk <= {_RATE_LIMIT_N}
"""


@register(
    "pipeline_rate_limit",
    "pipeline",
    f"Per-key quota sampling: keep the first {_RATE_LIMIT_N} events per "
    "(event type, hour), dropping the rest — the deterministic batch form of "
    "ingestion rate limiting / per-entity data capping (bounding any "
    "single entity's contribution to a training corpus is the "
    "anti-dominance sibling of dedup). First-N-by-time is a pure "
    "rank-and-filter over one (event_type, hour-bucket) window — one shuffle, "
    "deterministic under replay, and the kept set only grows forward in "
    "time, so incremental runs never revoke earlier decisions.",
    oracle=_RATE_LIMIT_ORACLE,
)
def pipeline_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "event_type", F.date_trunc("hour", F.col("ts"))
    ).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _RATE_LIMIT_N)
        .select("user_id", "event_id", "event_type", F.unix_millis("ts").alias("ts_ms"))
    )


# --------------------------------------------------------------------------
# CDC apply with inserts, updates, AND deletes
# --------------------------------------------------------------------------


def _cdc_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    pct = f"({sql_md5_int32('CAST(o_orderkey AS VARCHAR)')} % 100)"
    return f"""
WITH base AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE {pct} < 80
),
changes AS (
  SELECT o_orderkey AS okey,
         CASE WHEN {pct} >= 80 THEN 'I'
              WHEN {pct} < 10 THEN 'D'
              ELSE 'U' END AS op,
         o_orderstatus AS status,
         CASE WHEN {pct} >= 80
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
              ELSE CAST(floor(o_totalprice * 110 + 0.5) AS BIGINT) END AS price_cents
  FROM orders WHERE {pct} >= 80 OR {pct} < 20
),
applied AS (
  SELECT coalesce(c.okey, b.okey) AS okey,
         coalesce(c.status, b.status) AS status,
         coalesce(c.price_cents, b.price_cents) AS price_cents,
         c.op
  FROM base b FULL OUTER JOIN changes c ON c.okey = b.okey
  WHERE c.op IS NULL OR c.op <> 'D'
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_cents) AS BIGINT) AS total_cents,
       CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
       CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
FROM applied
GROUP BY status
"""


@register(
    "pipeline_cdc_apply",
    "pipeline",
    "Full CDC apply — inserts, updates, AND deletes in one pass: an "
    "op-coded change set (I/U/D, derived deterministically by key hash "
    "so the oracle can mirror it) merges into the base snapshot via one "
    "full-outer join; D rows drop, U rows replace, I rows append, "
    "untouched base rows carry through. Completes the change-capture "
    "family: q69 is upsert-only MERGE, q80 diffs snapshots, this APPLIES "
    "a change log with the full op vocabulary. One shuffle on the key "
    "for each side; with both sides bucket-layouted the apply is "
    "zero-shuffle — the nightly-compaction shape of every CDC lakehouse "
    "table.",
    oracle=_cdc_oracle(),
    bench=True,
)
def pipeline_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    pct = md5_int32(F.col("o_orderkey").cast("string")) % 100
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    bumped = F.floor(F.col("o_totalprice") * 110 + F.lit(0.5)).cast("long")
    base = o.filter(pct < 80).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        cents.alias("price_cents"),
    )
    changes = o.filter((pct >= 80) | (pct < 20)).select(
        F.col("o_orderkey").alias("okey"),
        F.when(pct >= 80, "I").when(pct < 10, "D").otherwise("U").alias("op"),
        F.col("o_orderstatus").alias("status"),
        F.when(pct >= 80, cents).otherwise(bumped).alias("price_cents"),
    )
    b = base.alias("b")
    c = changes.alias("c")
    applied = (
        b.join(c, F.col("b.okey") == F.col("c.okey"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("c.status"), F.col("b.status")).alias("status"),
            F.coalesce(F.col("c.price_cents"), F.col("b.price_cents")).alias(
                "price_cents"
            ),
            F.col("c.op").alias("op"),
        )
    )
    return applied.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price_cents").alias("total_cents"),
        F.sum((F.col("op") == "I").cast("long")).alias("n_inserted"),
        F.sum((F.col("op") == "U").cast("long")).alias("n_updated"),
    )


# --------------------------------------------------------------------------
# Incremental materialized-view maintenance (aggregate MV + delta merge)
# --------------------------------------------------------------------------

# Deterministic base/delta split of the order fact stream: the delta
# batch is ~10% of orders, standing in for "what arrived since the MV
# was last refreshed".
_MV_DELTA_MOD = 10
_MV_DELTA_REM = 7

_MV_ORACLE = """
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY 1
"""


def _mv_store_path(sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"ssk_mv_segment_{tag}")


def _mv_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The segment-grain aggregate MV over the base (pre-delta) orders."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % _MV_DELTA_MOD != _MV_DELTA_REM
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        # customer is entity-scale: un-hinted (stats/AQE decide).
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
        )
    )


def mv_prepare(spark: SparkSession, sf_dir: str) -> None:
    """One-time MV refresh: materialize the base aggregate to the store.

    Idempotent per (process, sf_dir); mirrors the deployment where the
    MV lives in a table and only deltas are aggregated per refresh.
    """
    import os
    import uuid

    from spark_stream_kudu_spark.operators.layout import _promote_staging

    tune_session(spark)
    path = _mv_store_path(sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        _mv_base(spark, sf_dir).coalesce(1).write.mode("overwrite").parquet(
            staging
        )
        _promote_staging(staging, path, marker)


@register(
    "mv_incremental_join",
    "pipeline",
    "Incremental materialized-view maintenance: the segment-grain "
    "join-aggregate MV is READ from its store (materialized once by the "
    "prepare step) and merged with the aggregate of ONLY the delta batch "
    "(~10% of orders) — a unionByName + re-aggregate on the MV grain, so "
    "refresh cost scales with the delta, not the fact table. The oracle "
    "is the full recompute over all orders; the driver hash therefore "
    "checks THE invariant of incremental view maintenance: "
    "merge(MV_base, agg(delta)) == full_recompute. SUM/COUNT are "
    "self-mergeable; the dimension side broadcasts in both paths. At "
    "100 TB the delta path touches gigabytes where recompute touches "
    "the world.",
    oracle=_MV_ORACLE,
    prepare=mv_prepare,
)
def mv_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    mv_prepare(spark, sf_dir)
    stored = spark.read.parquet(_mv_store_path(sf_dir))
    delta_o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % _MV_DELTA_MOD == _MV_DELTA_REM
    )
    c = load_table(spark, sf_dir, "customer")
    delta_mv = (
        # customer is entity-scale: un-hinted (stats/AQE decide).
        delta_o.join(c, delta_o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
        )
    )
    return (
        stored.unionByName(delta_mv)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("revenue_cents").alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# Training-shard export manifest (deterministic sharding + per-shard digest)
# --------------------------------------------------------------------------

_N_SHARDS = 16


def _shard_export_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    shard = f"{sql_md5_int32('CAST(doc_id AS VARCHAR)')} % {_N_SHARDS}"
    row = (
        "concat_ws('|', CAST(doc_id AS VARCHAR), md5(text), "
        "coalesce(lang, ''), coalesce(source, ''), CAST(n_chars AS VARCHAR))"
    )
    h = sql_md5_int32(row)
    return f"""
SELECT CAST({shard} AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR) AS digest_sum
FROM documents
GROUP BY 1
"""


@register(
    "pipeline_shard_export",
    "pipeline",
    f"Training-shard export manifest: every document is assigned to one "
    f"of {_N_SHARDS} shards by a portable content-independent hash of "
    "its id (uniform, deterministic, engine-agnostic — the same "
    "expression is the repartition key the shard writer uses), and each "
    "shard gets a row count, byte total, and an order-independent "
    "DECIMAL(38,0) content digest (q99's convention). This is the "
    "manifest a downstream trainer verifies before reading a shard — "
    "corrupted, truncated, or re-ordered exports change the digest, "
    "re-partitioned ones do not.",
    oracle=_shard_export_oracle(),
)
def pipeline_shard_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one partially-aggregated groupBy(shard) shuffle of
    {_N_SHARDS} partial rows per partition — at 100 TB the manifest
    costs a scan, and the writer reuses the identical shard expression
    in repartition(shard) so manifest and export cannot diverge."""
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents")
    shard = md5_int32(F.col("doc_id").cast("string")) % _N_SHARDS
    row = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.md5("text"),
        F.coalesce(F.col("lang"), F.lit("")),
        F.coalesce(F.col("source"), F.lit("")),
        F.col("n_chars").cast("string"),
    )
    h = md5_int32(row)
    return (
        d.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(h.cast("decimal(38,0)")).cast("string").alias("digest_sum"),
        )
    )


# --------------------------------------------------------------------------
# Retraction-aware incremental aggregate maintenance (IVM with deletes)
# --------------------------------------------------------------------------


def _ivm_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    pct = f"({sql_md5_int32('CAST(o_orderkey AS VARCHAR)')} % 100)"
    return f"""
WITH base AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE {pct} < 80
),
changes AS (
  SELECT o_orderkey AS okey,
         CASE WHEN {pct} >= 80 THEN 'I'
              WHEN {pct} < 10 THEN 'D'
              ELSE 'U' END AS op,
         o_orderstatus AS status,
         CASE WHEN {pct} >= 80
              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
              ELSE CAST(floor(o_totalprice * 110 + 0.5) AS BIGINT) END AS price_cents
  FROM orders WHERE {pct} >= 80 OR {pct} < 20
),
applied AS (
  SELECT coalesce(c.status, b.status) AS status,
         coalesce(c.price_cents, b.price_cents) AS price_cents
  FROM base b FULL OUTER JOIN changes c ON c.okey = b.okey
  WHERE c.op IS NULL OR c.op <> 'D'
)
SELECT status,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(price_cents) AS BIGINT) AS total_cents
FROM applied
GROUP BY status
"""


@register(
    "pipeline_ivm_retraction",
    "pipeline",
    "Retraction-aware incremental view maintenance: the stored per-"
    "status aggregate MV is updated from the SAME I/U/D change log as "
    "pipeline_cdc_apply WITHOUT re-aggregating the base — inserts add "
    "(+1, +cents), deletes RETRACT the old row's contribution "
    "(-1, -old_cents), updates contribute the value delta (0, new-old) "
    "— the full retraction algebra insert-only IVM "
    "(mv_incremental_join) cannot express. Old values for D/U come "
    "from one keyed join of the change set against the base (touches "
    "changed keys only; bucket-layouted it is zero-shuffle), then all "
    "deltas and the stored MV sum-merge in one |statuses|-sized "
    "aggregate. The oracle recomputes the aggregate from the fully "
    "applied state: equality PROVES incremental == full recompute, "
    "which is the entire point of maintaining an MV at 100 TB where "
    "the recompute is the thing you can no longer afford.",
    oracle=_ivm_oracle(),
)
def pipeline_ivm_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32
    from spark_stream_kudu_spark.functions.lineage import pin as _pin

    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    pct = md5_int32(F.col("o_orderkey").cast("string")) % 100
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    bumped = F.floor(F.col("o_totalprice") * 110 + F.lit(0.5)).cast("long")
    # ONE slice source (round-12): base and changes are projections of
    # the same orders slice, and every union branch below re-derived
    # them — 6 pruned parquet scans of orders (+ 6 md5 classifier
    # evaluations) in the plan. Lazy-pin the classified slice once; the
    # branches become cheap filters over the checkpointed rows. Same
    # expressions over the same rows, so results are unchanged.
    src = _pin(
        o.select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_orderstatus").alias("status"),
            cents.alias("__cents"),
            bumped.alias("__bumped"),
            pct.alias("__pct"),
        ),
        eager=False,
    )
    p = F.col("__pct")
    base = src.filter(p < 80).select(
        "okey", "status", F.col("__cents").alias("price_cents")
    )
    changes = src.filter((p >= 80) | (p < 20)).select(
        "okey",
        F.when(p >= 80, "I").when(p < 10, "D").otherwise("U").alias("op"),
        "status",
        F.when(p >= 80, F.col("__cents")).otherwise(F.col("__bumped")).alias(
            "price_cents"
        ),
    )
    # The stored MV (in production: read from the keyed store, not
    # recomputed — recomputed here once so the query is self-contained).
    mv = base.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("dn"),
        F.sum("price_cents").cast("long").alias("dcents"),
    )
    # Old values for retraction: change keys joined against the base.
    old = changes.filter(F.col("op") != "I").join(
        base.select("okey", F.col("price_cents").alias("old_cents")), "okey"
    )
    ins = changes.filter(F.col("op") == "I").select(
        "status",
        F.lit(1).cast("long").alias("dn"),
        F.col("price_cents").cast("long").alias("dcents"),
    )
    dels = old.filter(F.col("op") == "D").select(
        "status",
        F.lit(-1).cast("long").alias("dn"),
        (-F.col("old_cents")).cast("long").alias("dcents"),
    )
    upd = old.filter(F.col("op") == "U").select(
        "status",
        F.lit(0).cast("long").alias("dn"),
        (F.col("price_cents") - F.col("old_cents")).cast("long").alias("dcents"),
    )
    return (
        mv.unionByName(ins)
        .unionByName(dels)
        .unionByName(upd)
        .groupBy("status")
        .agg(
            F.sum("dn").cast("long").alias("n_rows"),
            F.sum("dcents").cast("long").alias("total_cents"),
        )
    )
