"""Contract tests for the jar-gated Kafka source (reference O1).

No broker or spark-sql-kafka jar exists in this environment (the
reference runs against a live topic: README.md:18-23,
kafka_to_kudu.py:19), so these pin the source's *non-broker surface*:
the deployment option dict, the clean jar-missing failure, and parity
between the option builder and what a deployed reader would receive —
the mirror of test_kudu_contract.py for the pipeline's front door.
"""

import pytest

from spark_stream_kudu_spark.streaming.traffic import (
    KAFKA_FORMAT,
    kafka_available,
    kafka_source_options,
    kafka_traffic_source,
)


def test_kafka_not_available_without_jar(spark):
    assert kafka_available(spark) is False


def test_source_raises_cleanly_without_jar(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_traffic_source(spark, "broker-1:9092,broker-2:9092")


def test_option_dict_matches_documented_deployment_config():
    """The full production option surface, spelled exactly as the Kafka
    source expects it (option names are case-sensitive strings — a typo
    here only surfaces at deploy time, which is why the dict is pinned)."""
    opts = kafka_source_options(
        "broker-1:9092,broker-2:9092",
        topic="traffic",
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
        fail_on_data_loss=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "traffic",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",
        "failOnDataLoss": "false",
    }
    # Every value must already be a string: readStream.options() does
    # no coercion for the kafka source.
    assert all(isinstance(v, str) for v in opts.values())


def test_option_defaults_match_dstream_semantics():
    """Defaults mirror the reference's direct stream: start at latest,
    tolerate retention expiry, bounded catch-up batches."""
    opts = kafka_source_options("b:9092")
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "false"
    assert opts["subscribe"] == "traffic"
    assert int(opts["maxOffsetsPerTrigger"]) > 0


def test_uncapped_trigger_omits_the_option():
    opts = kafka_source_options("b:9092", max_offsets_per_trigger=None)
    assert "maxOffsetsPerTrigger" not in opts


def test_format_is_the_builtin_kafka_source():
    assert KAFKA_FORMAT == "kafka"
