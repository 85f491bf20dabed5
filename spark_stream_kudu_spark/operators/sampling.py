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
