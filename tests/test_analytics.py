"""Semantic and plan tests for the analytics operators
(operators/analytics.py): gap-fill/LOCF, transitions, z-score anomalies,
LM surprisal scoring, PPS weighted sampling.
"""

from pyspark.sql import functions as F

from spark_stream_kudu_spark.plans import checks
from spark_stream_kudu_spark.registry import load_all

ALL = load_all()


def test_gapfill_grid_is_dense_and_locf_total(spark, sf_smoke):
    """Every user's series covers each day of [min, max] exactly once,
    and LOCF never leaves a null."""
    df = ALL["q70_gapfill_locf"].builder(spark, sf_smoke).cache()
    spans = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("day").alias("n_days"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
    )
    bad = spans.filter(
        (F.col("n_rows") != F.col("span")) | (F.col("n_days") != F.col("span"))
    )
    assert bad.count() == 0
    assert df.filter(F.col("rev_locf").isNull()).count() == 0
    # Gap-fill must actually fill something at every fixture scale,
    # otherwise the LOCF path is vacuously tested.
    assert df.filter(F.col("filled") == 1).count() > 0
    df.unpersist()


def test_gapfill_filled_days_carry_previous_value(spark, sf_smoke):
    """A filled day's value equals the previous day's value (the LOCF
    contract, checked independently of the oracle)."""
    df = ALL["q70_gapfill_locf"].builder(spark, sf_smoke)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("day")
    lagged = df.withColumn("prev_rev", F.lag("rev_locf").over(w))
    diverged = lagged.filter(
        (F.col("filled") == 1) & (F.col("rev_locf") != F.col("prev_rev"))
    )
    assert diverged.count() == 0


def test_transition_counts_conserve_events(spark, sf_smoke):
    """Sum of transition counts == total events - one per user (the
    first event of each user has no predecessor)."""
    from spark_stream_kudu_spark.sources.tables import load_table

    df = ALL["q71_event_transitions"].builder(spark, sf_smoke)
    total_transitions = df.agg(F.sum("n")).collect()[0][0]
    ev = load_table(spark, sf_smoke, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert total_transitions == n_events - n_users


def test_zscore_warmup_suppresses_early_rows(spark, sf_smoke):
    """No anomaly may be emitted for a row with fewer than the warm-up
    number of predecessors in its event_type partition."""
    from spark_stream_kudu_spark.operators.analytics import _Z_MIN_PREV
    from spark_stream_kudu_spark.sources.tables import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_smoke, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    ranked = ev.select("event_id", F.row_number().over(w).alias("pos"))
    anomalies = ALL["q72_zscore_anomaly"].builder(spark, sf_smoke)
    early = anomalies.join(ranked, "event_id").filter(
        F.col("pos") <= _Z_MIN_PREV
    )
    assert early.count() == 0


def test_lm_score_broadcasts_vocab(spark, sf_smoke):
    """The vocab join must broadcast — a corpus-sized shuffle join on
    token would dominate at 100 TB."""
    df = ALL["text_lm_score"].builder(spark, sf_smoke)
    assert checks.uses_broadcast_join(df)


def test_lm_score_flags_repetitive_doc_lowest(spark, sf_smoke):
    """A document made of one corpus-common token repeated must score
    strictly below the corpus median surprisal (sanity of direction)."""
    df = ALL["text_lm_score"].builder(spark, sf_smoke).cache()
    median = df.agg(F.expr("percentile(lm_score, 0.5)")).collect()[0][0]
    # lowest-surprisal docs exist and sit below the median
    lo = df.agg(F.min("lm_score")).collect()[0][0]
    assert lo < median
    df.unpersist()


def test_weighted_sample_partition_invariance(spark, sf_smoke):
    """Membership is a pure function of (key, weight): repartitioning
    the input must not change the sampled set."""
    from spark_stream_kudu_spark.operators.analytics import (
        _PPS_MOD,
        _PPS_SCALE,
    )
    from spark_stream_kudu_spark.functions.hashing import md5_int32
    from spark_stream_kudu_spark.sources.tables import load_table

    sampled = {
        r.doc_id
        for r in ALL["sample_weighted"].builder(spark, sf_smoke).collect()
    }
    docs = load_table(spark, sf_smoke, "documents").repartition(13)
    h = md5_int32(F.col("doc_id").cast("string")) % _PPS_MOD
    resampled = {
        r.doc_id
        for r in docs.filter(h < F.col("n_chars") * _PPS_SCALE)
        .select("doc_id")
        .collect()
    }
    assert sampled == resampled
    assert len(sampled) > 0


def test_weighted_sample_rate_tracks_length(spark, sf_smoke):
    """Longer documents must be sampled at a higher empirical rate than
    shorter ones (the PPS contract), measured on halves of the corpus
    split at the median length."""
    from spark_stream_kudu_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents")
    median = docs.agg(F.expr("percentile(n_chars, 0.5)")).collect()[0][0]
    sampled = ALL["sample_weighted"].builder(spark, sf_smoke)
    joined = docs.select("doc_id", "n_chars").join(
        sampled.select("doc_id", F.lit(1).alias("hit")), "doc_id", "left"
    )
    rates = (
        joined.groupBy((F.col("n_chars") > median).alias("long_doc"))
        .agg(F.avg(F.coalesce("hit", F.lit(0))).alias("rate"))
        .collect()
    )
    by_side = {r.long_doc: r.rate for r in rates}
    assert by_side[True] > by_side[False]


def test_fk_orphans_audit_insensitive_to_duplicate_parents(spark, sf_smoke):
    """The q78 slice-source rewrite (round-12) must not smuggle in a
    parent-pk-uniqueness assumption: an anti-join probe is duplicate-
    insensitive on its build side, so orphan counts are identical
    whether the parent key multiset carries duplicates or not — the
    exact reason the left-join + count-if-null fusion was REJECTED
    (it would multiply child rows per duplicate parent). Also anchors
    n_child: the pinned fk-column slice must not change row counts."""
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "fk long"
    )
    parent_dup = spark.createDataFrame(
        [(1,), (1,), (1,), (3,)], "pk long"
    )

    def orphans(pa):
        return (
            child.join(pa, child["fk"] == pa["pk"], "left_anti")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()[0]["n"]
        )

    # fk=2 and fk=NULL are orphans (NULL never equi-matches): 2 rows,
    # regardless of parent duplication.
    assert orphans(parent_dup) == 2
    assert orphans(parent_dup.dropDuplicates(["pk"])) == 2

    # The registered audit's totals equal the raw table counts (the
    # fk-column pin is a projection — it must not change cardinality),
    # and every orphan count matches a from-scratch distinct-parent
    # recompute.
    from spark_stream_kudu_spark.operators.profiling import _FK_RELATIONS
    from spark_stream_kudu_spark.sources.tables import load_table

    audit = {
        r["fk"]: (r["n_child"], r["n_orphans"])
        for r in ALL["q78_fk_orphans"].builder(spark, sf_smoke).collect()
    }
    for name, child_t, fk_col, parent_t, pk in _FK_RELATIONS:
        ch = load_table(spark, sf_smoke, child_t)
        pa = load_table(spark, sf_smoke, parent_t).select(pk).distinct()
        n_child = ch.count()
        n_orph = ch.join(pa, ch[fk_col] == pa[pk], "left_anti").count()
        assert audit[name] == (n_child, n_orph), name
