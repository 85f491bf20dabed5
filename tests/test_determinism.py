"""Merge-order invariance: queries documented as bit-reproducible
across cluster merge orders must return IDENTICAL rows when the
shuffle partitioning changes.

Changing spark.sql.shuffle.partitions re-buckets every exchange, which
permutes aggregation merge order — exactly what differs between two
cluster runs (or between local[32] and a 1000-executor deployment).
Float aggregation is not associative, so any float sum hiding in a
"integer-exact" query shows up here as a flipped low bit or a reordered
tie; the integer/decimal designs the docstrings claim must survive
unchanged.
"""

import pytest

from spark_stream_kudu_spark.registry import load_all

ALL = load_all()

# Queries whose docstrings claim merge-order-invariant (integer/decimal
# exact) results — one per family: PageRank, LPA, hierarchy closure,
# k-means, digest, exact-moment stats, decayed leaderboard, weighted
# median, CUSUM, Space-Saving top-k anchors, BM25 (fixed-order float),
# salted agg, LSH pair set.
CLAIMED_INVARIANT = [
    "q86_pagerank",
    "q137_label_propagation",
    "q156_hierarchy_closure",
    "emb_kmeans_lloyd",
    "q99_table_digest",
    "q75_stats_agg",
    "q133_decayed_leaderboard",
    "q134_weighted_median",
    "q124_cusum_changepoint",
    "q157_topk_rank_error",
    "text_bm25_search",
    "q42_salted_agg",
    "dedup_minhash_pairs",
    # round-4 session additions claiming integer-exactness
    "q165_shortest_paths",
    "q166_fifo_allocation",
    "q169_partition_digests",
    "q171_proration",
    "multimodal_blockhash_neardup",
    "text_skipgram_pairs",
    "q175_data_contract",
    "text_dataset_card",
    "sim_hybrid_rrf",
    # round-5 additions claiming integer-exactness: the materialized
    # partsupp stand-in (integer cents/quantity rollups re-summed) and
    # the multimodal container kernels (exact per-channel byte sums)
    "q158_min_cost_supplier",
    "q161_important_stock",
    "q162_excess_suppliers",
    "multimodal_decode_ppm",
    "multimodal_audio_wav",
    "multimodal_video_demux",
    # late round-5 additions claiming integer-exactness: Count-Min
    # (cell-wise long sums + exact anchors) and the exact-substring
    # audit (span counts, interval-union lengths, micro-unit fractions)
    "q178_countmin_frequency",
    "dedup_exact_substring",
    # round-6 additions claiming integer-exactness: bitmap rollup
    # (bitwise OR is commutative/associative/idempotent, popcount sums
    # are integer), per-node clustering coefficient (e6 integer div),
    # the two-phase rank pair (total-order rank is partitioning-
    # independent), the encoding advisor (tie-broken run counts), and
    # the seasonal decomposition (all-integer components)
    "q179_bitmap_rollup",
    "q180_clustering_coefficient",
    "q181_global_rowid",
    "q182_encoding_advisor",
    "q183_seasonal_decompose",
    "q184_equidepth_bins",
    "q187_topk_skewsafe",
    "q188_chunk_dedup",
    # round-7 additions claiming integer-exactness: the compaction
    # execution (order-independent DECIMAL(38,0) digests + exact
    # counts) and the k-core trajectory (pure set/count peeling)
    "q189_compaction_execute",
    "q190_kcore",
    # round-7 SemDeDup: exact integer squared-L2 priority + exact
    # rational cosine threshold over q8-quantized integers; the
    # streaming twin's additive credit store is batch-slicing- and
    # partitioning-independent by the same argument
    "dedup_semantic",
    "stream_semantic_dedup_e2e",
    # round-7 resharding execution: order-independent DECIMAL(38,0)
    # digests + exact counts over a deterministic HRW assignment
    "q191_resharding_execute",
    # round-8 two-phase kernel migrations: global ranks under a TOTAL
    # order are partitioning-independent, NTILE is an exact integer
    # function of (rank, n), running/grand sums are exact longs, and
    # the single float step (a share/Gini finalize or an exact integer
    # percentile) runs once on identical operands. The skyline filter
    # and the rate-limit audit are pure integer comparisons.
    "q110_gains_table",
    "q121_lateness_audit",
    "q135_pareto_curve",
    "q136_gini",
    "q144_rfm_segmentation",
    "q155_abc_xyz",
    "text_vocab",
    "q87_skyline",
    "stream_rate_limit_resume_e2e",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", [n for n in CLAIMED_INVARIANT if n in ALL])
def test_result_invariant_under_repartitioning(spark, sf_smoke, name):
    spec = ALL[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _rows(spec.builder(spark, sf_smoke))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _rows(spec.builder(spark, sf_smoke))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name} changed under repartitioning"
    assert len(a) > 0
