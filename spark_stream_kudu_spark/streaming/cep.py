"""Stateful streaming sequential-pattern detection — the streaming lift
of ``q94_cep_pattern`` (view -> purchase within 1h, no signup between).

The batch operator carries the latest view/signup timestamps down each
user's ordered event sequence; that carry is exactly two longs of keyed
state, so the operator lifts to ``applyInPandasWithState``: per user,
each arriving row first evaluates the pattern against the carried
state (purchases emit if the last view is inside the horizon and newer
than the last signup), then updates the state. State is O(|users|) x
two longs — independent of stream age — and patterns SPAN micro-batch
boundaries (a week-1 view can qualify a week-2 purchase), which is the
continuity the oracle check pins: a run that dropped state between
batches would miss every cross-batch match.

Determinism: the replay stages time-ordered weekly micro-batches and
rows sort by (ts, event_id) inside each batch — the same total order
the batch window uses.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_stream_kudu_spark.operators.analytics import (
    _CEP_HORIZON_MS,
    _CEP_ORACLE,
)
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.streaming.workdir import (
    new_run_dir,
    stage_time_split_batches,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_ms", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_view_ms", T.LongType()),
        T.StructField("last_signup_ms", T.LongType()),
    ]
)


def cep_stateful(events: DataFrame) -> DataFrame:
    """Emit qualifying purchases from a *streaming* events DataFrame
    (``ts``, ``event_id``, ``user_id``, ``event_type``), carrying each
    user's latest view/signup epoch-ms as keyed state across batches."""
    import pandas as pd

    def fn(
        key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state
    ) -> Iterator["pd.DataFrame"]:
        lv, ls = (state.get if state.exists else (None, None))
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if not chunks:
            if state.exists:
                state.update((lv, ls))
            return
        batch = pd.concat(chunks).sort_values(["ts", "event_id"])
        out_ids: list[int] = []
        out_ms: list[int] = []
        for eid, ts, et in zip(
            batch["event_id"], batch["ts"], batch["event_type"]
        ):
            t_ms = int(ts.value // 1_000_000)
            if et == "view":
                lv = t_ms
            elif et == "signup":
                ls = t_ms
            elif et == "purchase":
                if (
                    lv is not None
                    and lv >= t_ms - _CEP_HORIZON_MS
                    and (ls is None or ls < lv)
                ):
                    out_ids.append(int(eid))
                    out_ms.append(t_ms)
        state.update((lv, ls))
        if out_ids:
            yield pd.DataFrame(
                {
                    "purchase_id": out_ids,
                    "user_id": [key[0]] * len(out_ids),
                    "purchase_ms": out_ms,
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_cep_e2e",
    "streaming",
    "END-TO-END stateful streaming pattern detection (CEP): the q94 "
    "view->purchase-without-signup pattern evaluated on a live replay "
    "via applyInPandasWithState — each user's latest view/signup "
    "timestamps are TWO LONGS of keyed state (O(|users|), independent "
    "of stream age), and matches span micro-batch boundaries, which the "
    "oracle (the batch q94 SQL) pins: dropping state between batches "
    "would lose every cross-week match. At 100 TB/day this is the shape "
    "CEP runs in production — per-key state carry, never a join against "
    "the event history.",
    oracle=_CEP_ORACLE,
)
def stream_cep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    base = new_run_dir("cep")
    src = stage_time_split_batches(
        ev, base, ["2024-01-08", "2024-01-15", "2024-01-22"]
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    matches = cep_stateful(stream)
    out = os.path.join(base, "out")
    q = (
        matches.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select("purchase_id", "user_id", "purchase_ms")
