"""Size-gated join strategy for the iterative graph family.

The per-round |nodes|-table join in PageRank / label propagation must
broadcast below the session's autoBroadcastJoinThreshold and fall back
to a shuffled hash join above it — coded, not a docstring promise.
These tests pin (1) the threshold parser, (2) the physical plan each
side of the gate actually produces, and (3) that the shuffled variant
computes bit-identical results on the real queries.
"""

from __future__ import annotations

import pytest

from spark_stream_kudu_spark.functions.joins import (
    broadcast_threshold_bytes,
    gated_broadcast,
)
from spark_stream_kudu_spark.registry import load_all

ALL = load_all()


def _final_plan(df) -> str:
    # Materialize first so AQE has finalized its join choice.
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def restore_threshold(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_threshold_parser_handles_all_conf_shapes(spark, restore_threshold):
    for raw, expect in [
        ("10485760b", 10 * 1 << 20),
        ("10MB", 10 * 1 << 20),
        ("1g", 1 << 30),
        ("-1", -1),
        ("524288", 524288),
    ]:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
        assert broadcast_threshold_bytes(spark) == expect, raw


def test_small_side_broadcasts_under_threshold(spark):
    big = spark.range(0, 20000).selectExpr("id AS k", "id % 7 AS v")
    small = spark.range(0, 200).selectExpr("id AS node")
    gated = gated_broadcast(small, 200, spark)
    joined = big.join(gated, big["k"] == gated["node"])
    assert "BroadcastHashJoin" in _final_plan(joined)


def test_large_side_switches_to_shuffled_hash(spark):
    big = spark.range(0, 20000).selectExpr("id AS k", "id % 7 AS v")
    small = spark.range(0, 200).selectExpr("id AS node")
    # est_rows far past any threshold -> the gate must NOT broadcast.
    gated = gated_broadcast(small, 10**10, spark)
    joined = big.join(gated, big["k"] == gated["node"])
    plan = _final_plan(joined)
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_disabled_threshold_means_never_broadcast(spark, restore_threshold):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    big = spark.range(0, 20000).selectExpr("id AS k", "id % 7 AS v")
    small = spark.range(0, 200).selectExpr("id AS node")
    gated = gated_broadcast(small, 10, spark)
    joined = big.join(gated, big["k"] == gated["node"])
    plan = _final_plan(joined)
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


@pytest.mark.parametrize("name", ["q86_pagerank", "q137_label_propagation"])
def test_graph_loops_identical_across_gate(spark, sf_smoke, restore_threshold, name):
    """Integer-exact iterative loops must produce bit-identical output
    whether the gate picks broadcast (default threshold) or shuffled
    hash (threshold disabled) — the switch changes the physical plan,
    never the result."""
    spec = ALL[name]
    base = {tuple(r) for r in spec.builder(spark, sf_smoke).collect()}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    shuffled = {tuple(r) for r in spec.builder(spark, sf_smoke).collect()}
    assert base == shuffled
    assert len(base) > 0


def test_schema_derived_bytes_per_row_wide_row_degrades(
    spark, restore_threshold
):
    """Round-9 verdict item 3: the gate's footprint estimate is
    schema-derived, so a WIDE row — an embedding array column — must
    flip to shuffle_hash at a threshold the old flat 64-byte constant
    would have broadcast under, while a narrow (id, value) table keeps
    the historical floor (identical estimate, identical plans)."""
    from pyspark.sql import functions as F

    from spark_stream_kudu_spark.functions.joins import (
        DEFAULT_BYTES_PER_ROW,
        schema_bytes_per_row,
    )

    narrow = spark.range(0, 1000).selectExpr("id AS node", "id % 7 AS v")
    assert schema_bytes_per_row(narrow) == DEFAULT_BYTES_PER_ROW

    wide = spark.range(0, 1000).select(
        F.col("id").alias("node"),
        F.expr(
            "transform(sequence(1, 128), x -> CAST(x AS FLOAT))"
        ).alias("embedding"),
    )
    per_row = schema_bytes_per_row(wide)
    assert per_row >= 10 * DEFAULT_BYTES_PER_ROW, per_row

    # Threshold between the constant's estimate (1000*64 = 64 KB:
    # fits) and the schema estimate (>= 640 KB: does not fit).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(256 << 10))
    est_rows = 1000
    gated = gated_broadcast(wide, est_rows, spark)
    big = spark.range(0, 20000).selectExpr("id AS k")
    plan = big.join(
        gated, big["k"] == gated["node"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, (
        "wide-row table broadcast under a threshold only the flat "
        "constant fits — the schema-derived estimate is not applied"
    )
    # ...and the narrow table still broadcasts at that same threshold.
    gated_n = gated_broadcast(narrow, est_rows, spark)
    plan_n = big.join(
        gated_n, big["k"] == gated_n["node"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_n
