"""Corpus-curation operators: target-mixture resampling (round-3 s3).

``sample_domain_mix`` is the data-mixing kernel of a pre-training
pipeline: given a target share per source domain, compute per-domain
sampling rates that reshape the corpus's token mass toward the target
under a global token budget, then select documents with the same
deterministic hash-Bernoulli primitive the sampling family uses
(operators/sampling.py) so membership is reproducible across engines,
partitionings, and re-runs.

Rates are derived from corpus statistics, not hand-tuned: with
``chars_d`` the observed token mass of domain ``d``, a global budget
``B = 60%`` of total mass, and target share ``w_d``, the keep rate is
``min(1, B*w_d / chars_d)`` — domains over-represented relative to
their target get down-sampled, under-represented ones keep everything
(up-sampling/repetition is a separate epoch-level concern). The rate is
quantized to an integer per-myriad threshold so the membership test
(``md5_uint32(doc_id) % 10000 < thr``) is exact integer arithmetic.

The demo target mix is deliberately skewed (share of ``srcK``
proportional to ``K+1``) so the operator visibly reshapes the uniform
fixture; a production run would broadcast-join a tiny target-weights
table instead — same plan shape.

Scale notes (100 TB): one aggregate shuffle over |domains| groups to
get the stats, the |domains|-row rate table broadcasts back, and the
membership predicate is scan-local — the corpus itself never shuffles.
The output is the per-domain audit table (realized vs target mass),
which is what the pipeline logs; the sampled corpus itself is the same
scan with the audit aggregation dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.hashing import md5_int32, sql_md5_int32
from spark_stream_kudu_spark.functions.rounding import fround, idiv, sql_fround
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

# Global token budget = BUDGET_NUM/BUDGET_DEN of total corpus mass,
# computed in exact integer arithmetic.
_BUDGET_NUM, _BUDGET_DEN = 3, 5
# Target share of srcK is (K+1)/_SHARE_DEN (sum over the 20 fixture
# sources = 210/210 = 1).
_SHARE_DEN = 210

_MIX_ORACLE = f"""
WITH stats AS (
  SELECT source,
         CAST(substr(source, 4) AS INT) + 1 AS kk,
         count(*) AS n_docs,
         sum(n_chars) AS chars_d
  FROM documents GROUP BY 1, 2
), rates AS (
  SELECT source, kk, n_docs, chars_d,
         CAST(floor(least(
             1.0,
             (CAST((sum(chars_d) OVER ()) * {_BUDGET_NUM} // {_BUDGET_DEN}
                   AS DOUBLE) * (CAST(kk AS DOUBLE) / {_SHARE_DEN}.0))
             / CAST(chars_d AS DOUBLE)
         ) * 10000 + 0.5) AS BIGINT) AS thr
  FROM stats
)
SELECT r.source,
       {sql_fround(f"CAST(kk AS DOUBLE) / {_SHARE_DEN}.0", 4)} AS target_share,
       r.thr AS sample_permyriad,
       r.n_docs,
       count(*) FILTER (
           {sql_md5_int32("CAST(d.doc_id AS VARCHAR)")} % 10000 < r.thr
       ) AS n_sampled,
       CAST(coalesce(sum(d.n_chars) FILTER (
           {sql_md5_int32("CAST(d.doc_id AS VARCHAR)")} % 10000 < r.thr
       ), 0) AS BIGINT) AS chars_sampled
FROM documents d JOIN rates r ON d.source = r.source
GROUP BY 1, 2, 3, 4
"""


@register(
    "sample_domain_mix",
    "sampling",
    "Target-mixture corpus resampling (pre-training data mixing): "
    f"per-domain keep rate min(1, budget*share/mass) under a "
    f"{_BUDGET_NUM * 100 // _BUDGET_DEN}% global token budget, quantized to "
    "an integer per-myriad threshold so the hash-Bernoulli membership test "
    "is exact integer arithmetic — reproducible across engines and "
    "partitionings. One |domains|-group aggregate shuffle; the rate table "
    "broadcasts back and the membership predicate is scan-local, so the "
    "corpus never shuffles. Output is the per-domain audit table "
    "(target vs realized mass).",
    oracle=_MIX_ORACLE,
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")

    stats = docs.groupBy(
        "source",
        (F.substring("source", 4, 10).cast("int") + 1).alias("kk"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_d"),
    )
    # Global window over the already-aggregated |domains|-row table —
    # the single-partition exchange moves ~20 rows, not the corpus.
    wall = F.sum("chars_d").over(Window.partitionBy())
    budget = F.expr(f"div(total_chars * {_BUDGET_NUM}, {_BUDGET_DEN})")
    rate = F.least(
        F.lit(1.0),
        (budget.cast("double") * (F.col("kk").cast("double") / _SHARE_DEN))
        / F.col("chars_d").cast("double"),
    )
    rates = (
        stats.withColumn("total_chars", wall)
        .withColumn(
            "thr", F.floor(rate * 10000 + F.lit(0.5)).cast("long")
        )
        .select("source", "kk", "n_docs", "thr")
    )

    member = md5_int32(F.col("doc_id").cast("string")) % 10000 < F.col("thr")
    return (
        docs.join(F.broadcast(rates), "source")  # bounded: |sources|
        .groupBy(
            "source",
            fround(F.col("kk").cast("double") / _SHARE_DEN, 4).alias(
                "target_share"
            ),
            F.col("thr").alias("sample_permyriad"),
            "n_docs",
        )
        .agg(
            F.count(F.when(member, 1)).alias("n_sampled"),
            F.coalesce(
                F.sum(F.when(member, F.col("n_chars"))), F.lit(0)
            ).alias("chars_sampled"),
        )
    )


# --------------------------------------------------------------------------
# Vocabulary construction (tokenizer-training kernel)
# --------------------------------------------------------------------------

_VOCAB_TOP = 200
_VOCAB_SHARDS = 16  # token-hash shards for the phase-1 local rank

_VOCAB_ORACLE = f"""
WITH tok AS (
  SELECT unnest({sql_tokens("text")}) AS token FROM documents
), counts AS (
  SELECT token, count(*) AS n FROM tok GROUP BY 1
), ranked AS (
  SELECT token, n,
         row_number() OVER (ORDER BY n DESC, token) AS rank,
         sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER () AS total
  FROM counts
)
SELECT rank, token, n,
       {sql_fround("CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)", 6)}
         AS cum_share
FROM ranked
WHERE rank <= {_VOCAB_TOP}
"""


@register(
    "text_vocab",
    "text",
    f"Vocabulary construction (tokenizer-training kernel): corpus token "
    f"counts (the one corpus-sized shuffle, map-side combined), ranked by "
    f"(count DESC, token) with cumulative corpus coverage, truncated to the "
    f"top {_VOCAB_TOP} via SKEW-SAFE two-phase top-k (the q187 shard-"
    f"superset pattern): phase 1 ranks within {_VOCAB_SHARDS} token-hash "
    f"shards in parallel keeping each shard's local top {_VOCAB_TOP} — "
    "exact because every global top-k token is its own shard's top-k — "
    f"and phase 2 re-ranks the <= {_VOCAB_SHARDS}x{_VOCAB_TOP} "
    "survivors. The cumulative coverage at rank r <= top-k sums only "
    "higher-ranked tokens, all of which survive phase 1, so cum_share "
    "is exact over survivors; the corpus total is a 1-row broadcast "
    "aggregate. A web-scale vocabulary (10^8+ types) never funnels "
    "through one ranking task — only the bounded survivor set does. "
    "cum_share tells you the coverage a V-token vocabulary buys (the "
    "BPE/unigram-LM truncation decision).",
    oracle=_VOCAB_ORACLE,
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    counts = _pin(
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        # Pinned: the corpus total and the shard ranking both consume
        # the vocab table, and an unpinned one re-tokenizes the whole
        # corpus per branch (round-7 duplicate-scan convention).
    )
    total = counts.agg(F.sum("n").alias("__total"))
    # Phase 1: shard-local rank — parallel across token-hash shards.
    shard = F.pmod(F.xxhash64("token"), F.lit(_VOCAB_SHARDS))
    w_local = Window.partitionBy(shard).orderBy(
        F.col("n").desc(), F.col("token").asc()
    )
    survivors = (
        counts.withColumn("__lrk", F.row_number().over(w_local))
        .filter(F.col("__lrk") <= _VOCAB_TOP)
        .drop("__lrk")
    )
    # Phase 2: global rank + cumulative over the bounded survivor set.
    w_rank = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    return (
        survivors.join(F.broadcast(total))  # bounded: 1-row total
        .select(
            F.row_number().over(w_rank).alias("rank"),
            "token",
            "n",
            fround(
                F.sum("n").over(w_cum).cast("double")
                / F.col("__total").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .filter(F.col("rank") <= _VOCAB_TOP)
    )


# --------------------------------------------------------------------------
# Boilerplate passage detection (cross-document repeated n-grams)
# --------------------------------------------------------------------------

_BP_N = 8  # shingle width (tokens)
_BP_MIN_DOCS = 3  # boilerplate = shingle appearing in >= this many docs

_BOILERPLATE_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         unnest({sql_word_shingles(sql_tokens("text"), _BP_N)}) AS shingle
  FROM documents
)
SELECT {sql_md5_int32("shingle")} AS fp,
       min(shingle) AS sample_shingle,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_total
FROM sh
GROUP BY 1
HAVING count(DISTINCT doc_id) >= {_BP_MIN_DOCS}
"""


@register(
    "text_boilerplate",
    "text",
    f"Boilerplate passage detection: {_BP_N}-token shingles exploded per "
    f"document, grouped by their 8-byte md5 fingerprint (the 100 TB shuffle "
    "key — fixed-width instead of the full passage string), emitting "
    f"passages that recur across >= {_BP_MIN_DOCS} distinct documents with "
    "doc-frequency and total-occurrence counts. One partially-aggregated "
    "shuffle; shingling is row-local (no shuffle before the hash). The "
    "removal pass is the same scan anti-joined on fp. Headers/footers/"
    "navigation chrome are the classic crawl-corpus contaminant this finds.",
    oracle=_BOILERPLATE_ORACLE,
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), _BP_N)).alias("shingle"),
    )
    return (
        sh.groupBy(md5_int32(F.col("shingle")).alias("fp"))
        .agg(
            F.min("shingle").alias("sample_shingle"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .filter(F.col("n_docs") >= _BP_MIN_DOCS)
    )


# --------------------------------------------------------------------------
# Quality-decile curriculum binning (data-mixing schedule construction)
# --------------------------------------------------------------------------

# Epoch multiplier per decile: the top deciles are repeated more often
# in the training mix (quality-weighted epochs, the DoReMi/CCNet-style
# curriculum knob). Pure integer function of the bin for determinism.
_CURR_DECILES = [i / 10 for i in range(1, 10)]

_CURRICULUM_ORACLE = f"""
WITH th AS (
  SELECT quantile_cont(n_chars, {_CURR_DECILES}) AS t FROM documents
), binned AS (
  SELECT d.doc_id, d.n_chars,
         len(list_filter(th.t, x -> d.n_chars > x)) AS bin
  FROM documents d CROSS JOIN th
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       CAST(1 + bin // 3 AS BIGINT) AS epochs,
       CAST(sum(n_chars) * (1 + bin // 3) AS BIGINT) AS chars_effective
FROM binned GROUP BY bin
"""


@register(
    "quality_curriculum",
    "sampling",
    "Quality-decile curriculum construction: exact corpus deciles of the "
    "quality proxy (n_chars) become bin edges, every document is binned "
    "scan-locally against the BROADCAST 9-value threshold array, and the "
    "per-bin schedule assigns integer epoch multipliers (top deciles "
    "repeated more — the quality-weighted mixing knob). NOT an NTILE "
    "over the corpus: a global NTILE is a single-partition sort of "
    "everything, while this is one tiny percentile aggregate + a "
    "row-local array comparison + one |bins|-group rollup — the shape "
    "that survives 100 TB. Output is the per-bin audit (docs, raw and "
    "epoch-weighted token mass).",
    oracle=_CURRICULUM_ORACLE,
)
def quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    th = docs.agg(
        F.percentile(F.col("n_chars"), F.array(*[F.lit(p) for p in _CURR_DECILES]))
        .alias("t")
    )
    binned = docs.crossJoin(F.broadcast(th)).select(  # bounded: 1-row thresholds
        "n_chars",
        F.size(F.filter("t", lambda x: F.col("n_chars") > x))
        .cast("long")
        .alias("bin"),
    )
    # Integral div (round-11): the oracle's `bin // 3`; bin is a
    # non-negative decile index, exact by construction.
    epochs = (F.lit(1) + idiv(F.col("bin"), 3)).cast("long")
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_total"),
        epochs.alias("epochs"),
        (F.sum("n_chars") * epochs).alias("chars_effective"),
    )
