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
# correctness window (~50 queries/round). Round-3 rotation: every name
# here has had ZERO driver CORRECTNESS rows across rounds 1-2 (plus
# q36_approx_sketches, whose r01 row was an ERR and whose fix was never
# re-checked). The dedup / similarity / text-core / multimodal /
# sampling / traffic-parity families lead, per the round-2 verdict.
# Names not listed keep registration order behind these; queries with
# green rows from r01/r02 trail at the very back.
_WINDOW_PRIORITY: tuple[str, ...] = (
    # r01 ERR whose fix never re-entered a window
    "q36_approx_sketches",
    # dedup family (13) — zero driver rows ever
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_signatures",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_rplsh",
    "dedup_verified_pairs",
    "dedup_clusters",
    "dedup_cluster_stats",
    "pipeline_corpus_clean",
    # similarity family (12) — only sim_topk_quantized has a row
    "sim_topk_bruteforce",
    "sim_topk_pandas",
    "sim_topk_ivf",
    "sim_topk_rplsh",
    "sim_topk_rplsh_multi",
    "emb_label_centroids",
    "emb_knn_classify",
    "emb_pq_codes",
    "sim_topk_pq_adc",
    "sim_topk_ivf_adc",
    "sim_recall_eval",
    "sim_recall_eval_full",
    # text core (11) — zero driver rows ever
    "text_tfidf",
    "text_langid",
    "text_quality",
    "text_tokens",
    "text_rolling_hash",
    "text_regex_scan",
    "text_edit_distance",
    "text_domain_kl",
    "text_normalize",
    "text_chunking",
    "text_contamination",
    # multimodal (4) — zero driver rows ever
    "multimodal_meta",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_resize_stub",
    # sampling stragglers (2); sample_domain_mix carries the oracle
    # BIGINT-cast fix for its r02 repr-only hash mismatch
    "sample_cluster_split",
    "sample_domain_mix",
    # the reference's own pipeline (kafka_to_kudu parity) — never had
    # a driver row (7)
    "traffic_parse_csv",
    "q29_traffic_parity",
    "q30_tumbling_window",
    "q31_sliding_window",
    "q32_session_window",
    "streaming_upsert_merge",
    "stream_traffic_pipeline",
    # ---- 50 above; below queues for the window's tail / round 4 ----
    # temporal family — zero driver rows ever
    "q38_asof_join",
    "q39_range_join",
    "q40_correlated_subquery",
    "q41_range_frame",
    "q52_sessionize",
    "q53_event_funnel",
    "q54_cohort_retention",
    "q59_multires_rollup",
    "q64_running_distinct",
    "q64b_running_distinct_bounded",
    # layout + roundtrip sources
    "q55_bucketed_join",
    "q58_partitioned_scan",
    "q85_zorder_scan",
    "q96_ivf_partitioned_scan",
    "q101_json_roundtrip",
    "q102_csv_roundtrip",
    # sampling core
    "sample_hash_bernoulli",
    "split_train_test",
    "sample_stratified",
    "sample_fixed_per_stratum",
    # pipeline batch ops
    "q80_snapshot_diff",
    "pipeline_incremental_ingest",
    "pipeline_sequence_examples",
    "pipeline_targeted_deletion",
    "pipeline_rate_limit",
    "pipeline_cdc_apply",
    "pipeline_sequence_pack",
    # sketches / extensions stragglers
    "q66_hll_partial_merge",
    "q67_string_agg",
    "q106_sketch_grains",
    # streaming e2e — three of these shapes went driver-green in r02
    "stream_first_seen",
    "stream_interval_join_e2e",
    "stream_watermark_dedup_e2e",
    "stream_session_window_e2e",
    "stream_rollup_incremental_e2e",
    "stream_enrich_static_e2e",
    "stream_trending_e2e",
    "stream_outer_interval_join_e2e",
    "stream_digest_e2e",
    "stream_ann_e2e",
    "stream_rate_limit_e2e",
    "stream_scd2_e2e",
    # ---- round-3 additions (registered this round, zero driver rows
    # yet) — queued behind the earlier backlog, ahead of everything
    # already driver-green, so rounds 4-5 windows drain them in order.
    "dedup_containment",
    "dedup_prefix_filter",
    "dedup_recall_eval",
    "pipeline_contrastive_triplets",
    "emb_kmeans_lloyd",
    "sim_topk_ivf_trained",
    "text_bpe_merge",
    "text_pii_redact",
    "quality_curriculum",
    "multimodal_byte_stats",
    "pipeline_shard_export",
    "mv_incremental_join",
    "q114_triangle_count",
    "q115_attribution",
    "q116_intersect_all",
    "q117_except_all",
    "q118_dpp_join",
    "q119_null_safe_join",
    "q120_hof_order_jumps",
    "stream_late_audit_e2e",
    "stream_attribution_e2e",
    "stream_transitions_restart_e2e",
    "q121_lateness_audit",
    "q122_returned_items",
    "q123_supplier_diversity",
    "stream_hll_e2e",
    "stream_session_ttl_e2e",
    "stats_bootstrap_replicates",
    "sample_quota_allocation",
    "q124_cusum_changepoint",
    "stream_cusum_e2e",
    "text_langid_eval",
    "q125_psi_drift",
    "q126_chisq_drift",
    "q127_ks_drift",
    "q128_brand_affinity",
    "q129_seasonal_naive_eval",
    "stream_psi_drift_e2e",
    "q130_promo_revenue",
    "q131_late_priority",
    "text_bpe_encode",
    "q132_asof_forward",
    "q133_decayed_leaderboard",
    "q134_weighted_median",
    "q135_pareto_curve",
    "q136_gini",
    "q137_label_propagation",
    "stream_ks_drift_e2e",
    "q138_heavy_hitters_mg",
    "stream_chisq_drift_e2e",
    "q139_autocorrelation",
    "q140_holt_forecast",
    "stream_holt_e2e",
    "q141_cross_correlation",
    "q142_mutual_information",
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
)


def load_all() -> dict[str, QuerySpec]:
    """Import all operator modules (triggering registration) and return
    the full registry.

    Ordering is deliberate: the driver's correctness gate walks the
    registry front-to-back with a bounded window (~50 queries/round), so
    families whose driver-side evidence is thinnest come first. The
    explicit ``_WINDOW_PRIORITY`` list (124 names) leads with the 92
    queries that had no driver CORRECTNESS row after rounds 1-2, then
    queues the round-3 additions — rounds 3-5 windows drain it in
    order; everything already driver-green trails behind
    in registration order. Coverage accumulates across rounds.
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
