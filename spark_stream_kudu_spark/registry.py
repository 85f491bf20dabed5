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


# Explicit front-of-registry ordering for the driver's bounded
# correctness window (~50 queries/round). Round-6 rotation: the 50
# names that led the round-5 list all earned green driver rows in
# CORRECTNESS_r05 (50/50 green) and have dropped out (they now trail
# in registration order like every other driver-green query). What
# remains is exactly the 68-query backlog with NO driver CORRECTNESS
# row after round 5 — all pytest-oracle-green at three scales —
# ordered oldest-debt-first per the round-4 verdict: q143-q155 and the
# round-4 registrations first, then the round-5 additions. Round-6
# additions append at the END of this list so the driver drains the
# oldest debt before ever seeing new surface; the round-6 window takes
# the front 50, round 7 the rest.
_WINDOW_PRIORITY: tuple[str, ...] = (
    "q143_motif_discovery",
    "q144_rfm_segmentation",
    "q145_zipf_fit",
    "q146_fano_factor",
    "q147_vocab_drift",
    "q148_behavior_entropy",
    "q149_gap_percentiles",
    "q150_new_vs_returning",
    "q151_peak_detection",
    "q152_weekday_index",
    "q153_cohort_ltv",
    "q154_stickiness",
    "q155_abc_xyz",
    # round-4 additions (registered this round, zero driver rows yet)
    "q156_hierarchy_closure",
    "q157_topk_rank_error",
    "stream_topk_e2e",
    "text_bm25_search",
    "q158_min_cost_supplier",
    "q159_order_priority_check",
    "q160_product_profit",
    "q161_important_stock",
    "q162_excess_suppliers",
    "q163_histogram_quantiles",
    "stream_quantile_e2e",
    "pipeline_incremental_lsh",
    "stream_incremental_dedup_e2e",
    "q164_map_functions",
    "text_feature_hash",
    "q165_shortest_paths",
    "dedup_edit_distance",
    "sim_recall_truncated",
    "q166_fifo_allocation",
    "q167_orc_roundtrip",
    "q168_skew_audit",
    "multimodal_blockhash_neardup",
    "q169_partition_digests",
    "q170_schema_evolution",
    "q171_proration",
    "dedup_golden_record",
    "q172_federated_union",
    "q173_resharding_plan",
    "emb_norm_stats_pandas",
    "stream_skew_audit_e2e",
    "text_skipgram_pairs",
    "text_chunk_overlap",
    "pipeline_ivm_retraction",
    "q174_k_anonymity",
    "q175_data_contract",
    "q176_diversified_topk",
    "sample_temporal_holdout",
    "text_dataset_card",
    "stream_contract_gate_e2e",
    "sim_hybrid_rrf",
    "multimodal_byte_histogram",
    "dedup_clusters_starcontraction",
    "dedup_lsh_tuning_curve",
    "stream_ivm_retraction_e2e",
    # round-5 additions (registered this round, zero driver rows yet) —
    # appended BEHIND the backlog so the oldest debt drains first
    "multimodal_decode_ppm",
    "multimodal_thumbnail_ppm",
    "stream_full_outer_interval_join_e2e",
    "multimodal_audio_wav",
    "multimodal_video_demux",
    "stream_media_decode_e2e",
    "q177_compaction_plan",
    "q178_countmin_frequency",
    "stream_countmin_e2e",
    "dedup_exact_substring",
    "stream_substring_audit_e2e",
    # round-6 additions (registered this round, zero driver rows yet) —
    # appended BEHIND the backlog so the oldest debt drains first
    "q179_bitmap_rollup",
    "stream_bitmap_distinct_e2e",
    "q180_clustering_coefficient",
    "q181_global_rowid",
    "q182_encoding_advisor",
    "q183_seasonal_decompose",
    "q184_equidepth_bins",
    "stream_global_rowid_e2e",
    "q185_bitmap_set_ops",
    "q186_fd_audit",
    "stream_seasonal_e2e",
    "q187_topk_skewsafe",
    "q188_chunk_dedup",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules (triggering registration) and return
    the full registry.

    Ordering is deliberate: the driver's correctness gate walks the
    registry front-to-back with a bounded window (~50 queries/round), so
    families whose driver-side evidence is thinnest come first. The
    explicit ``_WINDOW_PRIORITY`` list holds every query still lacking a
    driver CORRECTNESS row after rounds 1-5 (68 queries), oldest debt
    first, with round-6 additions appended at the end — the round-6
    window drains the front 50, round 7 the rest; everything already
    driver-green trails behind in registration order. Coverage
    accumulates across rounds.
    """
    import spark_stream_kudu_spark.operators.analytics  # noqa: F401
    import spark_stream_kudu_spark.operators.drift  # noqa: F401
    import spark_stream_kudu_spark.streaming.drift  # noqa: F401
    import spark_stream_kudu_spark.streaming.anomaly  # noqa: F401
    import spark_stream_kudu_spark.operators.series  # noqa: F401
    import spark_stream_kudu_spark.operators.curation  # noqa: F401
    import spark_stream_kudu_spark.operators.statistics  # noqa: F401
    import spark_stream_kudu_spark.operators.profiling  # noqa: F401
    import spark_stream_kudu_spark.operators.graph  # noqa: F401
    import spark_stream_kudu_spark.streaming.transitions  # noqa: F401
    import spark_stream_kudu_spark.streaming.attribution  # noqa: F401
    import spark_stream_kudu_spark.streaming.sessions  # noqa: F401
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

    missing = [n for n in _WINDOW_PRIORITY if n not in _REGISTRY]
    if missing:  # defensive: a renamed query must not silently drop out
        raise KeyError(f"window-priority names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _WINDOW_PRIORITY}
    ordered.update(
        (n, spec) for n, spec in _REGISTRY.items() if n not in ordered
    )
    return ordered


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
