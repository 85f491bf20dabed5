"""Central query registry — the engine's declared operator contract.

Every operator family (SURVEY.md §2.4) registers one or more named
queries here. Each entry carries:

- ``builder(spark, sf_dir) -> DataFrame``: the Spark-first
  implementation (DataFrame/SQL; Catalyst plans it).
- ``oracle``: equivalent ANSI SQL the DuckDB oracle runs over the same
  parquet tables; ``None`` for genuinely non-SQL-expressible operators
  (the driver then records a weaker rows-only check).

Column names are part of the contract: builders alias every computed
column to the same name the oracle SQL uses, because the correctness
gate hashes values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str
    description: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    bench: bool = False  # include in the headline bench suite
    tags: tuple[str, ...] = field(default_factory=tuple)
    # One-time idempotent setup (e.g. writing a bucketed/partitioned
    # table layout) amortized over every later run of the query. The
    # bench harness invokes it OUTSIDE the timed region — layout is a
    # write-time decision; the timed query measures execution. Builders
    # still call it internally so correctness runs need no extra step.
    prepare: Callable[[SparkSession, str], None] | None = None


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    category: str,
    description: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
    prepare: Callable[[SparkSession, str], None] | None = None,
):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name, category, description, fn, oracle, bench, tags, prepare
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules (triggering registration) and return
    the full registry.

    Ordering is deliberate: the driver's correctness gate walks the
    registry front-to-back with a bounded window (~50 queries/round), so
    families whose driver-side evidence is thinnest register first.
    Current rotation: the newest zero-driver-row additions (analytics,
    statistics, profiling, graph, streaming e2e, pipeline) lead; the
    relational core (49/50 green in CORRECTNESS_r01) trails.

    NEXT-ROUND ROTATION NOTE: once the current window earns green rows,
    move the still-unchecked families forward — dedup_* (positions
    ~50-70), text_*, multimodal_*, sampling (incl. sample_cluster_split),
    layout (q55/q58/q85/q96), temporal (q38-q41, q52-q54, q59, q64),
    similarity tail (emb_pq_codes, sim_topk_pq_adc, sim_recall_eval,
    sim_topk_ivf_adc) — and retire proven rows to the back. Coverage
    accumulates across rounds; no single round can check all ~165.
    """
    import spark_stream_kudu_spark.operators.analytics  # noqa: F401
    import spark_stream_kudu_spark.streaming.anomaly  # noqa: F401
    import spark_stream_kudu_spark.operators.series  # noqa: F401
    import spark_stream_kudu_spark.operators.curation  # noqa: F401
    import spark_stream_kudu_spark.operators.statistics  # noqa: F401
    import spark_stream_kudu_spark.operators.profiling  # noqa: F401
    import spark_stream_kudu_spark.operators.graph  # noqa: F401
    import spark_stream_kudu_spark.streaming.transitions  # noqa: F401
    import spark_stream_kudu_spark.streaming.cep  # noqa: F401
    import spark_stream_kudu_spark.streaming.scd2  # noqa: F401
    import spark_stream_kudu_spark.streaming.parity_extra  # noqa: F401
    import spark_stream_kudu_spark.operators.pipeline  # noqa: F401
    import spark_stream_kudu_spark.streaming.extensions  # noqa: F401
    import spark_stream_kudu_spark.operators.sketches  # noqa: F401
    import spark_stream_kudu_spark.operators.extensions  # noqa: F401
    import spark_stream_kudu_spark.operators.dedup  # noqa: F401
    import spark_stream_kudu_spark.operators.similarity  # noqa: F401
    import spark_stream_kudu_spark.operators.text  # noqa: F401
    import spark_stream_kudu_spark.operators.multimodal  # noqa: F401
    import spark_stream_kudu_spark.operators.sampling  # noqa: F401
    import spark_stream_kudu_spark.operators.layout  # noqa: F401
    import spark_stream_kudu_spark.operators.temporal  # noqa: F401
    import spark_stream_kudu_spark.streaming.queries  # noqa: F401
    import spark_stream_kudu_spark.streaming.stateful  # noqa: F401
    import spark_stream_kudu_spark.operators.advanced  # noqa: F401
    import spark_stream_kudu_spark.operators.relational  # noqa: F401
    import spark_stream_kudu_spark.operators.subqueries  # noqa: F401

    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
