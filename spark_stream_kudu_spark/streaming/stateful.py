"""Custom stateful streaming operator: cross-batch first-seen dedup.

The reference's only state is the DStream window's retained RDDs
(kafka_to_kudu.py:20 — re-unioned every batch, SURVEY.md §2.2
"Streaming: stateful ops"); it has no keyed user state. This module
adds the canonical keyed-state operator a training-data ingest pipeline
needs: **emit each key's first occurrence, suppress every later one,
across micro-batches** — exact streaming dedup, the stateful sibling of
``operators/dedup.py``.

Spark-first shape: ``groupBy(keys).applyInPandasWithState`` — Arrow
batches per key group, one boolean-ish state row per key in the state
store. State size is O(distinct keys), not O(rows): at 100 TB the
state store shards by the grouping key across executors, and a
watermark-based state TTL (``GroupStateTimeout.EventTimeTimeout``)
bounds it for unbounded key spaces; here keys are finite so NoTimeout.

Batch-mode twin: "first occurrence per key" over a bounded table is
the window rank-1 query (``stream_first_seen``), which the DuckDB
oracle checks; the streaming test replays the same rows in event-time
order and asserts the stateful operator converges to exactly that
result, plus suppression across batch boundaries that batch mode
cannot express.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

KEYS = ["user_id", "event_type"]

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("first_ms", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def first_seen_stateful(events: DataFrame) -> DataFrame:
    """Streaming first-seen dedup on a *streaming* DataFrame of events
    (``ts`` timestamp, ``user_id``, ``event_type``, ``event_id``).

    Each (user_id, event_type) key emits exactly one row — its first
    occurrence in stream order (ties within a batch broken by
    (ts, event_id)) — and is then tombstoned in the state store.
    """
    import pandas as pd

    def fn(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state
    ) -> Iterator["pd.DataFrame"]:
        if state.exists:
            # Key already emitted in an earlier batch: drain and drop.
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            cand = pdf.sort_values(["ts", "event_id"]).iloc[0]
            if first is None or (cand["ts"], cand["event_id"]) < (
                first["ts"],
                first["event_id"],
            ):
                first = cand
        if first is None:
            return
        state.update((True,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_type": [key[1]],
                "event_id": [first["event_id"]],
                "first_ms": [int(first["ts"].value // 1_000_000)],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.groupBy(*KEYS)
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_FIRST_SEEN_ORACLE = """
SELECT user_id, event_type, event_id, epoch_ms(ts) AS first_ms
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, event_type ORDER BY ts, event_id
  ) AS rn
  FROM events
)
WHERE rn = 1
"""


@register(
    "stream_first_seen",
    "streaming",
    "First-seen dedup, batch twin of the applyInPandasWithState streaming "
    "operator (streaming/stateful.py): first event per (user_id, event_type) "
    "by (ts, event_id) order. The streaming form keeps O(distinct keys) state "
    "sharded by key; this bounded form is the window rank-1 query.",
    oracle=_FIRST_SEEN_ORACLE,
    bench=True,
)
def stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(*KEYS).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_millis("ts").alias("first_ms"))
    )


def dedup_within_watermark(events: DataFrame, horizon: str = "10 minutes") -> DataFrame:
    """Built-in streaming exact dedup: drop re-deliveries of the same
    ``event_id`` arriving within the watermark horizon.

    Complements ``first_seen_stateful``: this is Spark's native
    ``dropDuplicatesWithinWatermark`` — state is bounded by the horizon
    (old keys age out with the watermark), which is the right tool for
    at-least-once sources (Kafka redelivery, reference O1) where dupes
    arrive close together; the custom stateful operator is for
    *unbounded* first-seen semantics."""
    return events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
