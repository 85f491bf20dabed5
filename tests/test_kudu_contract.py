"""Contract tests for the jar-gated Kudu sink adapter.

No Kudu jar or cluster exists in this environment, so these pin the
adapter's *non-JVM surface*: availability probing, the clean failure
mode without the jar, the O7 empty-batch guard, and interface
compatibility with UpsertParquetSink (both are foreachBatch callables
with a ``read`` method, so ``run_traffic_pipeline`` takes either).
"""

import inspect

import pytest

from spark_stream_kudu_spark.streaming.kudu import (
    KUDU_FORMAT,
    KuduUpsertSink,
    kudu_available,
)
from spark_stream_kudu_spark.streaming.sinks import UpsertParquetSink


def test_kudu_not_available_without_jar(spark):
    assert kudu_available(spark) is False


def test_sink_raises_cleanly_without_jar(spark):
    sink = KuduUpsertSink(master="kudu-master:7051", table="traffic_conditions")
    batch = spark.createDataFrame([(1700000000000, 3.5)], "as_of_time long, avg double")
    with pytest.raises(RuntimeError, match="kudu-spark datasource"):
        sink(batch, batch_id=0)


def test_empty_batch_is_noop_without_jar(spark):
    """O7 empty-batch guard fires before the jar probe: an empty batch
    never raises, matching the reference's rdd.isEmpty() guard
    (kafka_to_kudu.py:23)."""
    sink = KuduUpsertSink(master="kudu-master:7051", table="traffic_conditions")
    empty = spark.createDataFrame([], "as_of_time long, avg double")
    assert sink(empty, batch_id=0) is None


def test_interface_matches_parquet_sink():
    """Both sinks are drop-in foreachBatch targets: callable(batch_df,
    batch_id) plus read(spark). Extra parameters are allowed only with
    defaults — foreachBatch calls with exactly (batch_df, batch_id)."""
    for cls in (KuduUpsertSink, UpsertParquetSink):
        sig = inspect.signature(cls.__call__)
        call_params = list(sig.parameters)
        assert call_params[:3] == ["self", "batch_df", "batch_id"]
        for p in list(sig.parameters.values())[3:]:
            assert p.default is not inspect.Parameter.empty, p.name
        read_params = list(inspect.signature(cls.read).parameters)
        assert read_params == ["self", "spark"]


def test_format_is_the_public_kudu_datasource():
    assert KUDU_FORMAT == "org.apache.kudu.spark.kudu"
