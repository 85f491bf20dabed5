"""Stream-stream interval join with watermark-bounded state.

The reference never joins streams — its pipeline is one Kafka topic end
to end (src/main/python/kafka_to_kudu.py:19) — but the declared
streaming surface (SURVEY.md §2.2) generalizes it, and correlating two
live streams (views with purchases, requests with responses) is the
canonical two-stream workload. Idiomatic Structured Streaming form:

- BOTH sides carry a watermark, and the join condition is key equality
  plus a bounded time interval. That pair of constraints is what lets
  the state store evict: a buffered row can be dropped as soon as the
  other side's watermark passes its interval end, so state is
  O(input rate x (horizon + watermark delay)) — independent of how long
  the streams have been running. An unbounded-condition stream-stream
  join would buffer both streams forever.
- Append output mode: a joined row is final once emitted (late rows
  beyond the watermark are dropped, the same late-data contract as the
  windowed aggregates in traffic.py).

The batch twin of this operator is the bucketized range join
``q39_range_join`` (operators/temporal.py), which the DuckDB oracle
checks; the streaming form is asserted end-to-end against the
equivalent batch join in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_HORIZON_SEC = 3600  # right row must precede left row by <= 1h
DEFAULT_WATERMARK = "2 hours"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_sec: int = DEFAULT_HORIZON_SEC,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Inner-join ``right`` rows onto ``left`` rows with the same ``key``
    where ``right_ts`` falls in ``[left_ts - horizon_sec, left_ts]``.

    Works identically for streaming and batch inputs (watermarks are
    no-ops in batch) — the property the tests exploit to oracle the
    streaming result against the batch plan.
    """
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = rw.withColumnRenamed(key, f"r_{key}")
    cond = (
        (lw[key] == r[f"r_{key}"])
        & (r[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {horizon_sec} SECONDS"))
        & (r[right_ts] <= lw[left_ts])
    )
    return lw.join(r, cond, "inner").drop(f"r_{key}")


def interval_join_left_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_sec: int = DEFAULT_HORIZON_SEC,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Left-outer variant: every ``left`` row emits; unmatched rows
    carry nulls on the right side. In streaming, an unmatched left row
    can only be declared final once the right watermark has passed its
    interval end — so outer results trail the inner ones by the
    watermark delay, and the state/eviction story is identical to the
    inner join. The 'purchases with NO prior view' shape (attribution
    gaps, timeout detection) that an inner join silently drops."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = rw.withColumnRenamed(key, f"r_{key}")
    cond = (
        (lw[key] == r[f"r_{key}"])
        & (r[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {horizon_sec} SECONDS"))
        & (r[right_ts] <= lw[left_ts])
    )
    return lw.join(r, cond, "left_outer").drop(f"r_{key}")


def interval_join_full_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_sec: int = DEFAULT_HORIZON_SEC,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Full-outer variant, closing the Spark-supported stream-stream
    join matrix (inner / left-outer / full-outer): every row on EITHER
    side emits — matched pairs once, unmatched rows with nulls across
    the other side, on BOTH sides (left rows with no right match AND
    right rows with no left match). Each side's unmatched rows finalize
    once the opposite watermark passes their interval bound, so both
    emit-on-timeout paths are live; state/eviction is identical to the
    inner join — O(rate x (horizon + delay)), independent of stream
    age. The join key is re-exposed as ``key`` via COALESCE across the
    two sides (a right-only row has a null left key)."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r = rw.withColumnRenamed(key, f"r_{key}")
    cond = (
        (lw[key] == r[f"r_{key}"])
        & (r[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {horizon_sec} SECONDS"))
        & (r[right_ts] <= lw[left_ts])
    )
    return (
        lw.join(r, cond, "full_outer")
        .withColumn(key, F.coalesce(lw[key], r[f"r_{key}"]))
        .drop(f"r_{key}")
    )
