"""Semantic invariants that hold regardless of data: internal
consistency between related queries and self-consistency within one
result. These catch logic errors the oracle can't (an oracle with the
same bug passes parity; an invariant violation is unambiguous).
"""

from pyspark.sql import functions as F

from spark_stream_kudu_spark.registry import load_all

ALL = load_all()


def test_funnel_is_monotone(spark, sf_smoke):
    """Each funnel stage can only lose users: n_signup >= n_view >=
    n_click >= n_purchase."""
    row = ALL["q53_event_funnel"].builder(spark, sf_smoke).collect()[0]
    assert row.n_signup >= row.n_view >= row.n_click >= row.n_purchase
    assert row.n_purchase >= 0


def test_sessionize_conserves_events(spark, sf_smoke):
    """Sessions partition the event log: per-session counts sum to the
    table's row count, and every session has positive length and
    non-negative duration."""
    sess = ALL["q52_sessionize"].builder(spark, sf_smoke)
    from spark_stream_kudu_spark.sources.tables import load_table

    total = load_table(spark, sf_smoke, "events").count()
    agg = sess.agg(
        F.sum("n_events").alias("n"),
        F.min("n_events").alias("mn"),
        F.min(F.col("end_ms") - F.col("start_ms")).alias("mind"),
    ).collect()[0]
    assert agg.n == total
    assert agg.mn >= 1
    assert agg.mind >= 0


def test_multires_rollup_levels_agree(spark, sf_smoke):
    """Every resolution of the continuous aggregate must total
    identically — re-aggregation loses nothing."""
    df = ALL["q59_multires_rollup"].builder(spark, sf_smoke)
    totals = {
        r.resolution: (r.n, r.v)
        for r in df.groupBy("resolution")
        .agg(F.sum("n_events").alias("n"), F.sum("value_e4").alias("v"))
        .collect()
    }
    assert totals["1m"] == totals["1h"] == totals["1d"]


def test_retention_bounded_by_cohort(spark, sf_smoke):
    df = ALL["q54_cohort_retention"].builder(spark, sf_smoke)
    bad = df.filter(
        (F.col("retained") > F.col("cohort_size")) | (F.col("cohort_size") <= 0)
    ).count()
    assert bad == 0


def test_percent_of_total_sums_to_one(spark, sf_smoke):
    """Shares are floor-rounded at 1e-6, so the sum lands within
    |groups| ulps of exactly 1."""
    df = ALL["q62_percent_of_total"].builder(spark, sf_smoke)
    rows = df.collect()
    assert abs(sum(r.share for r in rows) - 1.0) <= len(rows) * 1e-6


def test_knn_votes_bounded(spark, sf_smoke):
    from spark_stream_kudu_spark.operators.similarity import TOP_K

    df = ALL["emb_knn_classify"].builder(spark, sf_smoke)
    bad = df.filter((F.col("n_votes") < 1) | (F.col("n_votes") > TOP_K)).count()
    assert bad == 0


def test_topk_per_group_at_most_k(spark, sf_smoke):
    from spark_stream_kudu_spark.operators.advanced import _TOPK_PER_GROUP

    df = ALL["q46_topk_per_group"].builder(spark, sf_smoke)
    per_group = df.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert per_group.filter(F.col("n") > _TOPK_PER_GROUP).count() == 0


def test_salted_join_equals_plain_join(spark, sf_smoke):
    """The salted plan must be bit-identical to the straightforward join
    (already oracle-checked; this asserts it against Spark's own plain
    plan too, independent of DuckDB)."""
    from spark_stream_kudu_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events")
    o = load_table(spark, sf_smoke, "orders")
    dim = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spend_cents")
    )
    plain = (
        ev.join(dim, ev.user_id == dim.o_custkey)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_e4"),
            F.sum("spend_cents").alias("spend_cents"),
        )
    )
    salted = ALL["q56_salted_skew_join"].builder(spark, sf_smoke)
    key = lambda rows: {r.event_type: (r.n_events, r.value_e4, r.spend_cents) for r in rows}
    assert key(salted.collect()) == key(plain.collect())


def test_chunking_conserves_tokens(spark, sf_smoke):
    """Chunks partition each doc's token stream: per-doc chunk tokens sum
    to the doc's token count, and every non-final chunk is full."""
    from pyspark.sql import functions as F

    from spark_stream_kudu_spark.operators.extensions import CHUNK_TOKENS
    from spark_stream_kudu_spark.registry import load_all

    specs = load_all()
    chunks = specs["text_chunking"].builder(spark, sf_smoke)
    toks = specs["text_tokens"].builder(spark, sf_smoke)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("chunk_total"),
        F.max("chunk_id").alias("last_chunk"),
    )
    joined = per_doc.join(toks.select("doc_id", F.col("ws_tokens").alias("n_tokens")), "doc_id").collect()
    assert joined, "no docs"
    for r in joined:
        assert r["chunk_total"] == r["n_tokens"]
    partial = chunks.filter(
        (F.col("n_chunk_tokens") < CHUNK_TOKENS)
    ).groupBy("doc_id").count().collect()
    # at most one ragged chunk per document
    assert all(r["count"] == 1 for r in partial)


def test_sequence_pack_conserves_docs_and_bounds_bins(spark, sf_smoke):
    """Packing conserves documents, and no bin overflows by more than
    one straddling document (the first-fit running-sum guarantee)."""
    from pyspark.sql import functions as F

    from spark_stream_kudu_spark.operators.extensions import PACK_CAPACITY
    from spark_stream_kudu_spark.registry import load_all

    specs = load_all()
    packed = specs["pipeline_sequence_pack"].builder(spark, sf_smoke)
    toks = specs["text_tokens"].builder(spark, sf_smoke)
    n_docs = toks.count()
    agg = packed.agg(
        F.sum("n_docs").alias("docs"), F.max("tokens_packed").alias("max_bin")
    ).collect()[0]
    assert agg["docs"] == n_docs
    max_doc = toks.agg(F.max("ws_tokens")).collect()[0][0]
    assert agg["max_bin"] < PACK_CAPACITY + max_doc


def test_cluster_split_has_no_leakage(spark, sf_smoke):
    """No near-dup cluster straddles train/valid/test: split is a pure
    function of cluster_id, so each cluster maps to exactly one split —
    the contamination guarantee a per-doc hash split cannot give. Also:
    the three splits together conserve the document count."""
    from spark_stream_kudu_spark.operators.dedup import dedup_clusters
    from spark_stream_kudu_spark.operators.sampling import (
        TRAIN_PCT,
        VALID_PCT,
        _pct,
    )
    from spark_stream_kudu_spark.sources.tables import load_table

    clusters = dedup_clusters(spark, sf_smoke)
    pct = _pct(F.col("cluster_id"))
    split = (
        F.when(pct < TRAIN_PCT, "train")
        .when(pct < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
    )
    per_cluster = (
        clusters.select("cluster_id", split.alias("split"))
        .groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0

    summary = ALL["sample_cluster_split"].builder(spark, sf_smoke)
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert summary.agg(F.sum("n_docs")).collect()[0][0] == n_docs


def test_recall_eval_bounded_and_exact_grain(spark, sf_smoke):
    """Recall is in [0, 1], every (method, query) pair is present, and
    the exact arm always contributes exactly TOP_K ground-truth rows."""
    from spark_stream_kudu_spark.operators.similarity import N_QUERIES, TOP_K

    rows = ALL["sim_recall_eval"].builder(spark, sf_smoke).collect()
    assert len(rows) == 2 * N_QUERIES
    for r in rows:
        assert r.n_exact == TOP_K
        assert 0 <= r.n_hits <= r.n_exact
        assert 0.0 <= r.recall <= 1.0


def test_pq_codes_valid_and_error_nonnegative(spark, sf_smoke):
    """Every PQ code must name a real codebook centroid and quantization
    error is non-negative; a vector that IS a centroid should code to
    itself in every subspace with zero error."""
    from spark_stream_kudu_spark.operators.similarity import _PQ_MOD

    rows = ALL["emb_pq_codes"].builder(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        for s in range(4):
            assert r[f"code_{s}"] % _PQ_MOD == 0
        assert r.quant_err >= 0
    self_coded = [r for r in rows if r.vec_id % _PQ_MOD == 0]
    for r in self_coded:
        assert r.quant_err == 0
        assert all(r[f"code_{s}"] == r.vec_id for s in range(4))


def test_table_digest_is_partition_invariant(spark, sf_smoke):
    """The q99 digest must not change when the input is re-partitioned —
    the order-independence claim, checked directly: hash-sum the same
    rows under a different partitioning and compare."""
    from spark_stream_kudu_spark.functions.hashing import md5_int32
    from spark_stream_kudu_spark.sources.tables import load_table

    base = ALL["q99_table_digest"].builder(spark, sf_smoke).collect()[0]

    o = load_table(spark, sf_smoke, "orders").repartition(7, "o_orderstatus")
    row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )
    alt = o.agg(
        F.sum(md5_int32(row).cast("decimal(38,0)")).cast("string").alias("digest_sum")
    ).collect()[0]
    assert alt.digest_sum == base.digest_sum


def test_sketch_grains_near_exact_counts(spark, sf_smoke):
    """Every sketch-merged estimate must sit within 5% of the exact
    distinct count at its grain (default lgK keeps HLL error ~1.6%) —
    pinning that union-merge re-aggregates correctly, which summing
    per-group distinct counts would NOT. The query now self-reports the
    bound via est_ok (hash-checked at the gate); here we independently
    recompute the exact anchors and require every flag to be 1."""
    from spark_stream_kudu_spark.sources.tables import load_table

    rows = {
        (r.grain, r.key): r
        for r in ALL["q106_sketch_grains"].builder(spark, sf_smoke).collect()
    }
    ev = load_table(spark, sf_smoke, "events")
    exact_day = {
        ("day", str(r.day)): r.n
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact_type = {
        ("event_type", r.event_type): r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    exact = {**exact_day, **exact_type}
    exact[("total", "*")] = ev.agg(F.count_distinct("user_id")).collect()[0][0]
    assert set(rows) == set(exact)
    for k, e in exact.items():
        assert rows[k].exact_users == e, (k, rows[k].exact_users, e)
        assert rows[k].est_ok == 1, k


def test_no_oracle_emits_hugeint_or_decimal(sf_smoke):
    """Every oracle's DuckDB result schema must be free of HUGEINT /
    UHUGEINT / DECIMAL columns. DuckDB's sum(BIGINT) widens to HUGEINT,
    which the correctness gate's canonicalizer represents as float64
    while Spark emits int64 — values match but hashes differ (the
    sample_domain_mix r02 red row). Wrapping the aggregate in
    CAST(... AS BIGINT) fixes it; this audit keeps the footgun out of
    all future oracles. Schema-only: ``con.sql(...)`` binds lazily, so
    this checks 189 oracles without executing them."""
    from spark_stream_kudu_spark.plans.oracle import duckdb_connection

    con = duckdb_connection(sf_smoke)
    try:
        offenders = []
        for name, spec in ALL.items():
            if spec.oracle is None:
                continue
            rel = con.sql(spec.oracle)
            for c, t in zip(rel.columns, (str(t).upper() for t in rel.types)):
                if t in ("HUGEINT", "UHUGEINT") or t.startswith("DECIMAL"):
                    offenders.append((name, c, t))
        assert not offenders, f"oracles with repr-unstable column types: {offenders}"
    finally:
        con.close()


# --------------------------------------------------------------------------
# Lloyd k-means: exact-integer determinism and Lloyd-step semantics
# --------------------------------------------------------------------------

def test_kmeans_partition_invariant_and_separates_planted_clusters(spark):
    """Quantized-integer Lloyd must be bit-identical under any physical
    partitioning (the whole point of the 2^20 scaling), and two planted
    far-apart blobs must end up in different clusters with exact
    centroid means."""
    from spark_stream_kudu_spark.operators.similarity import lloyd_rounds

    dim = 4
    rows = []
    # seeds 0 and 1 are one member of each blob (vec_id < k init)
    for i in range(40):
        blob = i % 2
        base = 10.0 if blob else -10.0
        # deterministic jitter, exactly representable offsets
        jit = (i // 2) * 0.25
        rows.append((i, [base + jit, base - jit, base, base + 0.5 * blob]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out1 = {
        (r["cluster_id"], r["pos"]): (r["comp_q20"], r["n_members"])
        for r in lloyd_rounds(emb, 2, 2).collect()
    }
    out2 = {
        (r["cluster_id"], r["pos"]): (r["comp_q20"], r["n_members"])
        for r in lloyd_rounds(emb.repartition(7), 2, 2).collect()
    }
    assert out1 == out2
    assert len(out1) == 2 * dim
    # each blob has 20 members and the two centroids are far apart
    counts = {cid: n for (cid, _), (_, n) in out1.items()}
    assert sorted(counts.values()) == [20, 20]
    c0 = out1[(0, 0)][0] / (1 << 20)
    c1 = out1[(1, 0)][0] / (1 << 20)
    assert abs(c0 - c1) > 15  # -10ish vs +10ish on dim 0


def test_kmeans_chained_rounds_bit_identical_to_per_round_sync(
    spark, monkeypatch
):
    """The round-12 driver-sync batching (rounds chained in the DAG via
    _km_assign_chained, collect every _KM_SYNC_INTERVAL rounds) must
    produce BIT-identical centroids to the per-round-collect loop
    (_KM_SYNC_INTERVAL=1 reproduces it exactly: every round takes the
    literal fast path and syncs). Run enough rounds that both the
    chained path and a mid-loop re-sync are exercised."""
    import spark_stream_kudu_spark.operators.similarity as sim

    rows = []
    for i in range(60):
        blob = i % 3
        base = [-8.0, 0.5, 9.0][blob]
        jit = (i // 3) * 0.125
        rows.append((i, [base + jit, base - jit, base * 0.5, base + 0.25 * blob]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def run(interval, rounds):
        monkeypatch.setattr(sim, "_KM_SYNC_INTERVAL", interval)
        return sorted(
            (r["cluster_id"], r["pos"], r["comp_q20"], r["n_members"])
            for r in sim.lloyd_rounds(emb, 3, rounds).collect()
        )

    for rounds in (2, 5):
        per_round = run(1, rounds)  # the pre-round-12 loop, exactly
        chained = run(4, rounds)  # chained rounds + one mid re-sync at 5
        assert per_round == chained, f"rounds={rounds}: centroids diverged"


def test_bpe_merge_greedy_nonoverlap_semantics(spark):
    """'b b b b b' under top pair (b,b) must merge greedily left-to-right
    without overlap: 2 merges, not 4 — the property both engines'
    replace() share and the oracle comparison silently depends on."""
    from spark_stream_kudu_spark.operators.text import bpe_merge_step

    docs = spark.createDataFrame(
        [(0, "s", "b b b b b"), (1, "s", "a b c")],
        "doc_id long, source string, text string",
    )
    [row] = bpe_merge_step(docs).collect()
    assert row["merged_pair"] == "b b"
    assert row["pair_count"] == 4       # counting phase counts overlaps
    assert row["n_merges"] == 2         # application is non-overlapping
    assert row["tokens_before"] == 8
    assert row["tokens_after"] == 6


def test_shard_manifest_invariant_under_physical_layout(spark, sf_smoke):
    """The export manifest (shard membership, counts, digests) is a pure
    function of table CONTENT: recomputing it from a repartitioned /
    re-ordered copy of documents must give byte-identical rows — the
    property that lets a reader verify a shard written by any writer."""
    from pyspark.sql import functions as F

    from spark_stream_kudu_spark.operators.pipeline import _N_SHARDS
    from spark_stream_kudu_spark.registry import get

    base = get("pipeline_shard_export").builder(spark, sf_smoke)
    rows1 = {r["shard"]: (r["n_docs"], r["chars_total"], r["digest_sum"])
             for r in base.collect()}
    assert len(rows1) == _N_SHARDS

    from spark_stream_kudu_spark.functions.hashing import md5_int32
    from spark_stream_kudu_spark.sources.tables import load_table

    d = load_table(spark, sf_smoke, "documents").repartition(13).sortWithinPartitions(
        F.desc("doc_id")
    )
    shard = md5_int32(F.col("doc_id").cast("string")) % _N_SHARDS
    row = F.concat_ws(
        "|",
        F.col("doc_id").cast("string"),
        F.md5("text"),
        F.coalesce(F.col("lang"), F.lit("")),
        F.coalesce(F.col("source"), F.lit("")),
        F.col("n_chars").cast("string"),
    )
    redo = (
        d.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(md5_int32(row).cast("decimal(38,0)")).cast("string").alias("digest_sum"),
        )
    )
    rows2 = {r["shard"]: (r["n_docs"], r["chars_total"], r["digest_sum"])
             for r in redo.collect()}
    assert rows1 == rows2


def test_registry_window_priority_leads_load_order():
    """The driver's bounded correctness window reads the registry
    front-to-back; the LIVE part of the priority prefix (names without
    a driver row from the prefix's build round or later — the prefix is
    self-retiring) must stay pinned at the front, and every priority
    name must carry an oracle so its row is a full value check."""
    from spark_stream_kudu_spark.registry import (
        _PRIORITY_BUILT_FOR_ROUND,
        _WINDOW_PRIORITY,
        _driver_row_rounds,
        load_all,
    )

    specs = load_all()
    names = list(specs)
    rounds = _driver_row_rounds()
    live = [
        n
        for n in _WINDOW_PRIORITY
        if rounds.get(n, 0) < _PRIORITY_BUILT_FOR_ROUND
    ]
    assert names[: len(live)] == live
    # Since round 4 EVERY registered query carries an oracle — the
    # sketch family (incl. the streaming HLL twin) via exact-anchor +
    # bound-flag outputs. No rows-only exceptions remain.
    missing_oracle = [n for n in _WINDOW_PRIORITY if specs[n].oracle is None]
    assert missing_oracle == [], missing_oracle
    assert all(spec.oracle is not None for spec in specs.values())


def test_registry_priority_prefix_self_retires(monkeypatch):
    """Once the driver certifies a prefixed name (a CORRECTNESS row from
    the prefix's build round or later), it must drop back into the
    staleness-ordered tail automatically — the next round's window then
    leads with the still-unchecked names (e.g. this round's
    registrations) without a manual prefix rewrite."""
    from spark_stream_kudu_spark import registry

    real_rounds = registry._driver_row_rounds()
    certified = list(registry._WINDOW_PRIORITY)[:50]
    fake = dict(real_rounds)
    fake.update({n: registry._PRIORITY_BUILT_FOR_ROUND for n in certified})
    monkeypatch.setattr(registry, "_driver_row_rounds", lambda: fake)

    names = list(registry.load_all())
    expected_live = [
        n
        for n in registry._WINDOW_PRIORITY
        if fake.get(n, 0) < registry._PRIORITY_BUILT_FOR_ROUND
    ]
    assert names[: len(expected_live)] == expected_live
    # the freshly-certified names moved behind every staler row
    tail = names[len(expected_live) :]
    first_certified = min(tail.index(n) for n in certified)
    stalest_round = min(
        fake.get(n, 0) for n in tail[: first_certified or 1]
    )
    assert stalest_round < registry._PRIORITY_BUILT_FOR_ROUND


def test_q36_sketch_estimates_near_exact(spark, sf_smoke):
    """q36 self-reports its sketch error bounds as hash-checked BIGINT
    flags; pin here that the flags are all 1 and the exact anchors
    match an independent exact aggregation — a sketch regression must
    show up both at the driver gate and in pytest."""
    from pyspark.sql import functions as F

    from spark_stream_kudu_spark.sources.tables import load_table

    rows = {
        r["l_returnflag"]: r
        for r in ALL["q36_approx_sketches"].builder(spark, sf_smoke).collect()
    }
    li = load_table(spark, sf_smoke, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_suppkey").alias("supps"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, a in rows.items():
        e = exact[flag]
        assert a["exact_parts"] == e["parts"]
        assert a["exact_supps"] == e["supps"]
        for c in ("parts_ok", "supps_ok", "p50_ok", "p95_ok"):
            assert a[c] == 1, (flag, c)


def test_quota_allocation_spends_budget_exactly(spark, sf_smoke):
    """Largest-remainder apportionment must spend the budget EXACTLY
    (naive rounding doesn't), never hand a source a negative or
    super-proportional+1 allocation, and preserve monotonicity: a
    source with more bytes never gets fewer slots."""
    from spark_stream_kudu_spark.operators.sampling import _QUOTA_BUDGET

    rows = ALL["sample_quota_allocation"].builder(spark, sf_smoke).collect()
    assert sum(r["slots"] for r in rows) == _QUOTA_BUDGET
    for r in rows:
        assert 0 <= r["slots"] - r["floor_slots"] <= 1
    by_chars = sorted(rows, key=lambda r: (r["chars"], r["source"]))
    for a, b in zip(by_chars, by_chars[1:]):
        if b["chars"] > a["chars"]:
            assert b["slots"] >= a["slots"] - 1  # Hamilton is near-monotone


def test_cusum_window_identity_equals_textbook_recursion(spark, sf_smoke):
    """The window identity (cum - least(0, running_min)) must equal the
    textbook recursion S_t = max(0, S_{t-1} + x_t - k) recomputed in
    plain Python per event_type — the independent pin that caught the
    missing empty-prefix term (an error both the engine AND its oracle
    shared, invisible to parity)."""
    rows = sorted(
        ALL["q124_cusum_changepoint"].builder(spark, sf_smoke).collect(),
        key=lambda r: (r["event_type"], r["day"]),
    )
    from collections import defaultdict

    series = defaultdict(list)
    for r in rows:
        series[r["event_type"]].append(r)
    for et, rs in series.items():
        total = sum(r["x_e4"] for r in rs)
        k = total // len(rs)
        s = 0
        for r in rs:
            s = max(0, s + r["x_e4"] - k)
            assert s == r["cusum_e4"], (et, r["day"], s, r["cusum_e4"])


def test_bpe_encode_matches_pure_python_trainer(spark, sf_smoke):
    """The 3-round BPE loop (text_bpe_encode) equals a from-scratch
    plain-Python trainer on the raw fixture: same merge table in the
    same order, same per-source token compression. Python's str.replace
    shares the greedy non-overlapping left-to-right semantics, so this
    pins the whole loop, not just one round."""
    import re
    from collections import Counter, defaultdict

    import duckdb

    from spark_stream_kudu_spark.operators.text import _BPE_ROUNDS
    from spark_stream_kudu_spark.registry import load_all

    con = duckdb.connect()
    raw = con.sql(
        f"SELECT doc_id, source, lower(trim(text)) FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    docs = {
        doc_id: (src, "|" + "||".join(re.split(r"\s+", txt)) + "|")
        for doc_id, src, txt in raw
    }
    n0 = {doc_id: s.count("||") + 1 for doc_id, (_, s) in docs.items()}
    merges = []
    for _ in range(_BPE_ROUNDS):
        pc: Counter = Counter()
        for _, (_, s) in docs.items():
            tk = s[1:-1].split("||")
            for x, y in zip(tk, tk[1:]):
                pc[f"{x} {y}"] += 1
        top = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(top)
        a, b = top.split(" ")
        docs = {
            d: (src, s.replace(f"|{a}||{b}|", f"|{a}_{b}|"))
            for d, (src, s) in docs.items()
        }
    per_source: dict = defaultdict(lambda: [0, 0])
    for doc_id, (src, s) in docs.items():
        before = n0[doc_id]
        after = s.count("||") + 1 if len(s) > 2 else 0
        per_source[src][0] += before
        per_source[src][1] += after
    rows = load_all()["text_bpe_encode"].builder(spark, sf_smoke).collect()
    for r in rows:
        for i, m in enumerate(merges):
            assert r[f"merge_{i + 1}"] == m
        b, a = per_source[r["source"]]
        assert (r["tokens_before"], r["tokens_after"]) == (b, a), r["source"]
        assert r["n_merges"] == b - a


def test_promo_and_late_shapes_are_consistent(spark, sf_smoke):
    """q130: promo revenue is a subset of total and the pct matches the
    exact integer ratio. q131: every late line is counted exactly once
    across the high/low split."""
    from spark_stream_kudu_spark.registry import load_all

    ALL = load_all()
    [r] = ALL["q130_promo_revenue"].builder(spark, sf_smoke).collect()
    assert 0 < r["promo_rev_e4"] < r["total_rev_e4"]
    import math

    expect = math.floor(
        100.0 * r["promo_rev_e4"] / r["total_rev_e4"] * 1e6 + 0.5
    ) / 1e6
    assert r["promo_pct"] == expect

    rows = ALL["q131_late_priority"].builder(spark, sf_smoke).collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    total = sum(r["high_line_count"] + r["low_line_count"] for r in rows)
    import duckdb

    con = duckdb.connect()
    [(late,)] = con.sql(
        f"""SELECT count(*) FROM '{sf_smoke}/lineitem.parquet' l
            JOIN '{sf_smoke}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY"""
    ).fetchall()
    con.close()
    assert total == late


def test_forward_asof_is_next_view_at_or_after(spark, sf_smoke):
    """q132: every matched view is the user's earliest view with
    view_ms >= purchase_ms (min event_id on ties), checked against a
    plain-Python scan of the raw fixture."""
    import duckdb

    from spark_stream_kudu_spark.registry import load_all

    con = duckdb.connect()
    views = con.sql(
        f"""SELECT user_id, epoch_ms(ts), event_id
            FROM '{sf_smoke}/events.parquet' WHERE event_type = 'view'"""
    ).fetchall()
    con.close()
    by_user: dict = {}
    for uid, ms, eid in views:
        by_user.setdefault(uid, []).append((ms, eid))
    rows = load_all()["q132_asof_forward"].builder(spark, sf_smoke).collect()
    assert rows
    n_matched = 0
    for r in rows:
        cand = [
            (ms, eid)
            for ms, eid in by_user.get(r["user_id"], [])
            if ms >= r["purchase_ms"]
        ]
        if not cand:
            assert r["view_event_id"] is None and r["view_ms"] is None
            continue
        ms, eid = min(cand)
        assert (r["view_ms"], r["view_event_id"]) == (ms, eid)
        n_matched += 1
    assert n_matched > 0


def test_label_propagation_matches_python(spark, sf_smoke):
    """3 synchronous LPA rounds in plain Python (same graph, same
    max-weight/min-label rule) produce the same community table."""
    from collections import defaultdict

    import duckdb

    from spark_stream_kudu_spark.operators.graph import _LP_ROUNDS, _SUPP_OFFSET
    from spark_stream_kudu_spark.registry import load_all

    con = duckdb.connect()
    e0 = con.sql(
        f"""SELECT o.o_custkey, l.l_suppkey + {_SUPP_OFFSET}, count(*)
            FROM '{sf_smoke}/lineitem.parquet' l
            JOIN '{sf_smoke}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2"""
    ).fetchall()
    cn = dict(
        con.sql(
            f"SELECT c_custkey, c_nationkey FROM '{sf_smoke}/customer.parquet'"
        ).fetchall()
    )
    sn = dict(
        con.sql(
            f"SELECT s_suppkey, s_nationkey FROM '{sf_smoke}/supplier.parquet'"
        ).fetchall()
    )
    con.close()
    edges: dict = defaultdict(list)  # dst -> [(src, w)]
    nodes = set()
    for c, s, w in e0:
        edges[s].append((c, w))
        edges[c].append((s, w))
        nodes.update((c, s))
    labels = {
        n: (cn[n] if n < _SUPP_OFFSET else sn[n - _SUPP_OFFSET]) for n in nodes
    }
    for _ in range(_LP_ROUNDS):
        nxt = {}
        for n in nodes:
            ws: dict = defaultdict(int)
            for src, w in edges[n]:
                ws[labels[src]] += w
            nxt[n] = min(ws.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = nxt
    expect: dict = defaultdict(lambda: [0, None, None])
    for n, lb in labels.items():
        e = expect[lb]
        e[0] += 1
        e[1] = n if e[1] is None else min(e[1], n)
        e[2] = n if e[2] is None else max(e[2], n)
    rows = load_all()["q137_label_propagation"].builder(spark, sf_smoke).collect()
    got = {
        r["community"]: [r["n_nodes"], r["min_node"], r["max_node"]] for r in rows
    }
    assert got == dict(expect)


def test_misra_gries_kernel_bound_and_completeness():
    """The MG kernel (pure function, no Spark needed): state never
    exceeds k counters, and every item with frequency > n/k survives —
    exercised on adversarial data that forces heavy eviction, plus a
    seeded random stream."""
    import random

    import pandas as pd

    from spark_stream_kudu_spark.operators.sketches import _MG_K, mg_summarize

    # Adversarial: one hot item buried in a flood of singletons.
    stream = ["hot"] * 500 + [f"u{i}" for i in range(5000)]
    random.Random(7).shuffle(stream)
    out = list(mg_summarize(iter([pd.DataFrame({"item": stream[:3000]}),
                                  pd.DataFrame({"item": stream[3000:]})])))
    survivors = set(out[0]["item"]) if out else set()
    assert len(survivors) <= _MG_K
    assert "hot" in survivors  # freq 500/5500 >> 1/30

    # Seeded random Zipf-ish stream: verify the guarantee holds exactly.
    rng = random.Random(42)
    items = [f"t{min(int(rng.paretovariate(1.0)), 60)}" for _ in range(20000)]
    from collections import Counter

    freq = Counter(items)
    n = len(items)
    must_survive = {i for i, c in freq.items() if c * _MG_K > n}
    out = list(mg_summarize(iter([pd.DataFrame({"item": items})])))
    survivors = set(out[0]["item"]) if out else set()
    assert len(survivors) <= _MG_K
    assert must_survive <= survivors


def test_mg_query_matches_exact_python(spark, sf_smoke):
    """q138's final output equals the exact heavy-hitter set computed in
    plain Python (MG is candidates-only; the result is exact)."""
    import re
    from collections import Counter

    import duckdb

    from spark_stream_kudu_spark.operators.sketches import _MG_K
    from spark_stream_kudu_spark.registry import load_all

    con = duckdb.connect()
    texts = con.sql(
        f"SELECT lower(trim(text)) FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    freq: Counter = Counter()
    for (txt,) in texts:
        freq.update(re.split(r"\s+", txt))
    n = sum(freq.values())
    expect = {i: c for i, c in freq.items() if c * _MG_K > n}
    rows = load_all()["q138_heavy_hitters_mg"].builder(spark, sf_smoke).collect()
    assert {r["item"]: r["cnt"] for r in rows} == expect
    for r in rows:
        assert r["n_total"] == n


def test_space_saving_kernel_invariants():
    """The batched Space-Saving kernel (pure function): est >= true >=
    est - err for every kept item, any absent item's true count <=
    absent_ub, state bounded at 2m counters — on adversarial data that
    forces repeated compaction, across multiple batches."""
    import random
    from collections import Counter

    import pandas as pd

    from spark_stream_kudu_spark.operators.sketches import _SS_M, ss_summarize

    rng = random.Random(11)
    items = ["hot_a"] * 900 + ["hot_b"] * 700 + [
        f"t{min(int(rng.paretovariate(0.7)), 2000)}" for _ in range(30000)
    ]
    rng.shuffle(items)
    freq = Counter(items)
    chunks = [items[i : i + 7000] for i in range(0, len(items), 7000)]
    out = list(
        ss_summarize(
            iter(pd.DataFrame({"item": c, "pid": 3}) for c in chunks)
        )
    )
    assert len(out) == 1
    summ = out[0]
    assert len(summ) <= 2 * _SS_M
    absent_ub = int(summ["absent_ub"].iloc[0])
    kept = {}
    for _, r in summ.iterrows():
        kept[r["item"]] = (int(r["est"]), int(r["err"]))
        assert r["pid"] == 3
    for item, true in freq.items():
        if item in kept:
            est, err = kept[item]
            assert est >= true, item
            assert est - err <= true, item
        else:
            assert true <= absent_ub, (item, true, absent_ub)
    assert "hot_a" in kept and "hot_b" in kept


def test_topk_rank_error_flags_all_green(spark, sf_smoke):
    """q157's sketch claims must hold on the fixture: every exact top-k
    item is covered by the Space-Saving candidate union and its exact
    count sits inside the merged [lower, upper] bound."""
    rows = ALL["q157_topk_rank_error"].builder(spark, sf_smoke).collect()
    from spark_stream_kudu_spark.operators.sketches import _SS_K

    assert len(rows) == _SS_K
    assert all(r["covered_ok"] == 1 for r in rows)
    assert all(r["bound_ok"] == 1 for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, _SS_K + 1))


def test_hierarchy_closure_root_sees_everything(spark, sf_smoke):
    """Pointer-doubling closure sanity, independent of the oracle: the
    root manager (custkey 1) has every other customer as a descendant,
    its subtree total equals the exact corpus balance of keys >= 2,
    and the max depth equals floor(log2(max key)) — the k div 2 chain
    length."""
    from spark_stream_kudu_spark.sources.tables import load_table

    rows = {
        r["manager"]: r
        for r in ALL["q156_hierarchy_closure"].builder(spark, sf_smoke).collect()
    }
    c = load_table(spark, sf_smoke, "customer")
    agg = c.filter(F.col("c_custkey") >= 2).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents"),
        F.max("c_custkey").alias("mx"),
    ).collect()[0]
    root = rows[1]
    assert root["n_reports"] == agg["n"]
    assert root["subtree_cents"] == agg["cents"]
    assert root["max_depth"] == int(agg["mx"]).bit_length() - 1


def test_fifo_allocation_conserves_quantity(spark, sf_smoke):
    """FIFO interval matching is conservative: per part, the allocated
    total equals min(total supply, total demand) exactly — nothing is
    created, nothing double-counted — and every allocation is a
    positive quantity no larger than either side's lot."""
    from spark_stream_kudu_spark.sources.tables import load_table

    out = ALL["q166_fifo_allocation"].builder(spark, sf_smoke)
    assert out.filter(F.col("alloc_qty") <= 0).count() == 0
    alloc = {
        r["part"]: r["s"]
        for r in out.groupBy("part").agg(F.sum("alloc_qty").alias("s")).collect()
    }
    li = load_table(spark, sf_smoke, "lineitem")
    qty = F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long")
    sides = {
        r["l_partkey"]: (r["supply"] or 0, r["demand"] or 0)
        for r in li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "F", qty)).alias("supply"),
            F.sum(F.when(F.col("l_linestatus") == "O", qty)).alias("demand"),
        )
        .collect()
    }
    for part, (supply, demand) in sides.items():
        assert alloc.get(part, 0) == min(supply, demand), part


def test_shortest_paths_fixed_point_properties(spark, sf_smoke):
    """SSSP sanity independent of the oracle: every source node has
    distance 0, every reported distance is non-negative, and one more
    relaxation round would not improve any reported distance that has
    an in-edge from another reported node (the bounded-horizon fixed
    point on the fixture, whose graph diameter is < the round count)."""
    out = {
        r["node"]: r["dist_cents"]
        for r in ALL["q165_shortest_paths"].builder(spark, sf_smoke).collect()
    }
    from spark_stream_kudu_spark.operators.graph import _SUPP_OFFSET
    from spark_stream_kudu_spark.sources.tables import load_table

    sources = [n for n in out if n < _SUPP_OFFSET and n % 20 == 0]
    assert sources, "no source nodes in output"
    assert all(out[n] == 0 for n in sources)
    assert all(v >= 0 for v in out.values())
    li = load_table(spark, sf_smoke, "lineitem")
    o = load_table(spark, sf_smoke, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.min(cents).alias("w"))
        .collect()
    )
    edges = [(r["src"], r["dst"], r["w"]) for r in e0]
    edges += [(d, s, w) for s, d, w in edges]
    for s, d, w in edges:
        if s in out:
            assert out.get(d, out[s] + w) <= out[s] + w, (s, d)


def test_proration_sums_exactly_to_order_total(spark, sf_smoke):
    """Hamilton proration is exact: per order, allocated cents sum to
    the order's total cents with zero residue, and every allocation is
    within 1 cent of the unrounded proportional share."""
    from spark_stream_kudu_spark.sources.tables import load_table

    out = ALL["q171_proration"].builder(spark, sf_smoke)
    sums = {
        r["okey"]: r["s"]
        for r in out.groupBy("okey").agg(F.sum("alloc_cents").alias("s")).collect()
    }
    o = load_table(spark, sf_smoke, "orders")
    totals = {
        r["o_orderkey"]: r["t"]
        for r in o.select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("t"),
        ).collect()
    }
    assert sums, "no prorated orders"
    for okey, s in sums.items():
        assert s == totals[okey], okey


def test_golden_record_election_is_well_formed(spark, sf_smoke):
    """Exactly one golden per cluster; the golden is a cluster member
    with maximal n_chars (min doc_id on ties); cluster_size sums back
    to the corpus size."""
    from spark_stream_kudu_spark.sources.tables import load_table

    rows = ALL["dedup_golden_record"].builder(spark, sf_smoke).collect()
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == len(n_chars)
    for cid, members in by_cluster.items():
        goldens = [m for m in members if m["is_golden"]]
        assert len(goldens) == 1, cid
        g = goldens[0]
        best = max(
            (m["doc_id"] for m in members),
            key=lambda d: (n_chars[d], -d),
        )
        assert g["doc_id"] == best == g["golden_id"]
        assert all(m["golden_id"] == g["doc_id"] for m in members)
        assert all(m["cluster_size"] == len(members) for m in members)


def test_rendezvous_moves_only_to_the_added_shard(spark, sf_smoke):
    """HRW property: growing 8 -> 9 shards, a key either keeps its
    shard or moves to the NEW shard (index 8) — never between old
    shards — and the reported moved count matches."""
    from spark_stream_kudu_spark.operators.layout import (
        _RS_NEW,
        _RS_OLD,
        _hrw_assign,
    )
    from spark_stream_kudu_spark.sources.tables import load_table

    c = load_table(spark, sf_smoke, "customer")
    old = {r["key"]: r["old_shard"] for r in _hrw_assign(c, _RS_OLD, "old_shard").collect()}
    new = {r["key"]: r["new_shard"] for r in _hrw_assign(c, _RS_NEW, "new_shard").collect()}
    moved = 0
    for k, o in old.items():
        n = new[k]
        if n != o:
            moved += 1
            assert n == _RS_OLD, (k, o, n)  # only the added shard wins
    rep = {
        r["strategy"]: r["n_moved"]
        for r in ALL["q173_resharding_plan"].builder(spark, sf_smoke).collect()
    }
    assert rep["rendezvous"] == moved


def test_k_anonymity_generalization_only_helps(spark, sf_smoke):
    """Level-1 (region) groups contain their level-0 (nation) groups:
    n_level1 >= n_level0 always; a combo is flagged only if BOTH
    levels are under k."""
    from spark_stream_kudu_spark.operators.profiling import _KANON_K

    for r in ALL["q174_k_anonymity"].builder(spark, sf_smoke).collect():
        assert r["n_level1"] >= r["n_level0"]
        if r["at_risk"]:
            assert r["n_level0"] < _KANON_K and r["n_level1"] < _KANON_K
        if not r["at_risk"]:
            assert (
                r["n_level0"] >= _KANON_K or r["n_level1"] >= _KANON_K
            )


def test_diversified_topk_respects_quota_and_order(spark, sf_smoke):
    """No nation exceeds its quota; global ranks are 1..20 in strictly
    decreasing (rev, -custkey) order."""
    from spark_stream_kudu_spark.operators.analytics import (
        _DTK_LIMIT,
        _DTK_PER_NATION,
    )

    rows = sorted(
        ALL["q176_diversified_topk"].builder(spark, sf_smoke).collect(),
        key=lambda r: r["global_rank"],
    )
    assert [r["global_rank"] for r in rows] == list(range(1, _DTK_LIMIT + 1))
    per_nation = {}
    for r in rows:
        per_nation[r["nationkey"]] = per_nation.get(r["nationkey"], 0) + 1
    assert max(per_nation.values()) <= _DTK_PER_NATION
    for a, b in zip(rows, rows[1:]):
        assert (a["rev_cents"], -a["custkey"]) > (b["rev_cents"], -b["custkey"])


def test_star_contraction_collapses_a_long_chain_fast(spark):
    """The O(log n) claim, pinned: a 64-node path graph (diameter 63,
    the propagation algorithm's worst case) collapses to ONE component
    within the 12-round fixed-point bound, labels all equal to the
    chain minimum."""
    from spark_stream_kudu_spark.operators.dedup import (
        star_contraction_components,
    )

    n = 64
    d = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = star_contraction_components(d, pairs).collect()
    assert len(out) == n
    assert all(r["cluster_id"] == 0 for r in out)


def test_star_contraction_agrees_with_propagation(spark, sf_smoke):
    """Both CC algorithms produce identical (doc_id, cluster_id) maps
    on the verified near-dup graph."""
    a = sorted(
        tuple(r)
        for r in ALL["dedup_clusters"].builder(spark, sf_smoke).collect()
    )
    b = sorted(
        tuple(r)
        for r in ALL["dedup_clusters_starcontraction"]
        .builder(spark, sf_smoke)
        .collect()
    )
    assert a == b


def test_temporal_holdout_partitions_cleanly(spark, sf_smoke):
    """Train + test partition every type's events exactly, and the
    boundary separates them: all train events strictly before it, all
    test events at-or-after it."""
    from pyspark.sql import functions as SF

    from spark_stream_kudu_spark.sources.tables import load_table

    rows = ALL["sample_temporal_holdout"].builder(spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    for r in rows:
        assert r["n_train"] + r["n_test"] == r["n_events"], r
        assert r["n_train"] > 0 and r["n_test"] > 0, r
        split = ev.filter(SF.col("event_type") == r["event_type"]).select(
            SF.max(
                SF.when(
                    SF.unix_millis("ts") < r["boundary_ms"], SF.unix_millis("ts")
                )
            ).alias("max_train"),
            SF.min(
                SF.when(
                    SF.unix_millis("ts") >= r["boundary_ms"], SF.unix_millis("ts")
                )
            ).alias("min_test"),
        ).collect()[0]
        assert split["max_train"] < r["boundary_ms"] <= split["min_test"]


def test_rrf_fusion_is_well_formed(spark, sf_smoke):
    """Per query: fused ranks are 1..k; every contribution comes from
    at most the two arms; a candidate in both arms outranks the same
    single-arm score by construction (its rrf_e9 is a two-term sum)."""
    from spark_stream_kudu_spark.operators.similarity import (
        _RRF_K,
        _RRF_SCALE,
        TOP_K,
    )

    rows = ALL["sim_hybrid_rrf"].builder(spark, sf_smoke).collect()
    max_single = _RRF_SCALE // (_RRF_K + 1)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
        assert 1 <= r["n_arms"] <= 2
        if r["n_arms"] == 1:
            assert r["rrf_e9"] <= max_single
        else:
            assert r["rrf_e9"] <= 2 * max_single
    for qid, rs in by_q.items():
        assert sorted(x["fused_rank"] for x in rs) == list(range(1, TOP_K + 1)), qid


def test_federated_union_covers_all_three_formats(spark, sf_smoke):
    """Every priority class drew rows from parquet AND csv AND jsonl."""
    rows = ALL["q172_federated_union"].builder(spark, sf_smoke).collect()
    assert rows and all(r["n_formats"] == 3 for r in rows)


def test_schema_evolution_surfaces_legacy_class(spark, sf_smoke):
    """The merged read yields both the LEGACY class (nulls from old
    files) and every evolved priority, and row totals match orders."""
    from spark_stream_kudu_spark.sources.tables import load_table

    rows = {r["priority"]: r["n_orders"] for r in
            ALL["q170_schema_evolution"].builder(spark, sf_smoke).collect()}
    assert "LEGACY" in rows and len(rows) == 6
    total = load_table(spark, sf_smoke, "orders").count()
    assert sum(rows.values()) == total


# --------------------------------------------------------------------------
# Multimodal container synthesis: the JVM-side binary encoders (hex/unhex
# little-endian header math, header concat, pixel tiling) must produce
# byte-identical containers to straightforward pure-Python encoders —
# pinning the synthesis itself, not just the decoded feature sums.
# --------------------------------------------------------------------------


def _py_encode_ppm(text: str) -> bytes:
    import hashlib

    md5 = hashlib.md5(text.encode()).hexdigest()
    w = int(md5[0:2], 16) % 8 + 4
    h = int(md5[2:4], 16) % 8 + 4
    need = w * h * 3
    reps = -(-need // len(text))
    pix = (text * reps)[:need].encode()
    return b"P6\n%d %d\n255\n" % (w, h) + pix


def _py_encode_wav(text: str) -> bytes:
    import hashlib

    md5 = hashlib.md5(text.encode()).hexdigest()
    ns = int(md5[4:7], 16) % 113 + 16
    reps = -(-ns // len(text))
    samples = (text * reps)[:ns].encode()
    fmt = (
        (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt \
        + b"data" + ns.to_bytes(4, "little")
    return b"RIFF" + (36 + ns).to_bytes(4, "little") + body + samples


def test_spark_container_encoders_match_python_bytes(spark, sf_smoke):
    """encode_ppm / encode_wav (native-expression synthesis) produce
    byte-identical containers to the plain-Python encoders for every
    document in the fixture."""
    from spark_stream_kudu_spark.operators.multimodal import (
        encode_ppm,
        encode_wav,
    )
    from spark_stream_kudu_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    texts = {r["doc_id"]: r["text"] for r in docs.limit(50).collect()}
    sub = docs.filter(docs.doc_id.isin(*texts))
    for enc, py in ((encode_ppm, _py_encode_ppm), (encode_wav, _py_encode_wav)):
        got = {r["doc_id"]: bytes(r["payload"]) for r in enc(sub).collect()}
        for doc_id, text in texts.items():
            if not text:
                continue
            assert got[doc_id] == py(text), (enc.__name__, doc_id)


def test_substring_audit_semantics_handcrafted(spark):
    """Pin the exact-substring audit's SEMANTICS (not just oracle
    parity) on handcrafted documents: a verbatim copy pair is fully
    covered, within-doc repetition alone is NOT duplication (spans
    must appear in >= 2 DISTINCT docs), a partial overlap covers
    exactly the shared window, and a short doc (< k tokens) reports
    zeros but still appears."""
    from spark_stream_kudu_spark.operators.dedup import (
        _SUBSTR_K,
        substr_audit_from_spans,
        substr_doc_sizes,
        substr_spans,
    )

    assert _SUBSTR_K == 8, "expected widths below assume k=8"
    w = [f"w{i}" for i in range(12)]          # 12 distinct tokens
    copy_text = " ".join(w)                   # docs 1 and 2: verbatim copy
    rep = " ".join(["r0 r1 r2 r3 r4 r5 r6 r7"] * 2)  # doc 3: self-repeat only
    # doc 4 shares exactly tokens w2..w9 (one 8-window) with doc 1/2,
    # embedded in otherwise-unique context
    partial = " ".join(["x0", "x1"] + w[2:10] + ["x2", "x3"])
    short = "s0 s1 s2"                        # doc 5: < k tokens
    d = spark.createDataFrame(
        [(1, copy_text), (2, copy_text), (3, rep), (4, partial), (5, short)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["dup_spans"], r["dup_tokens"], r["dup_frac_x1e6"])
        for r in substr_audit_from_spans(substr_spans(d), substr_doc_sizes(d)).collect()
    }
    # copies: every one of the 12-8+1=5 spans duplicated, all 12 tokens covered
    assert out[1] == (12, 5, 12, 1000000)
    assert out[2] == (12, 5, 12, 1000000)
    # self-repetition: the repeated 8-gram lives in ONE doc -> zero
    assert out[3] == (16, 0, 0, 0)
    # partial: exactly the one shared window w2..w9 -> 1 span, 8 tokens,
    # floor(8e6/12) of the 12-token doc
    assert out[4] == (12, 1, 8, 666666)
    # short doc appears with zeros
    assert out[5] == (3, 0, 0, 0)


# --------------------------------------------------------------------------
# SemDeDup: full pipeline vs an independent pure-Python recomputation
# --------------------------------------------------------------------------

def test_dedup_semantic_matches_pure_python_pipeline(spark):
    """Recompute the ENTIRE SemDeDup decision in plain Python integers
    from the raw parquet — 2-round integer Lloyd from vec_id<k seeds,
    nearest-centroid assignment with distance, q8 dominated rule — and
    demand bit-equality with the Spark query. Independent of both Spark
    AND the DuckDB oracle (triple verification of the decision vector)."""
    import math

    import pyarrow.parquet as pq

    from spark_stream_kudu_spark.operators import dedup as D
    from spark_stream_kudu_spark.operators import similarity as S
    from spark_stream_kudu_spark.registry import load_all

    sf_dir = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    vecs = {
        int(v): [math.floor(float(x) * S._SCALE) for x in e]
        for v, e in zip(t["vec_id"], t["embedding"])
    }

    def assign(cents):
        # nearest centroid by exact integer squared-L2, ties -> low cid
        out = {}
        for v, x in vecs.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(x, c)), cid)
                for cid, c in cents.items()
            )
            out[v] = best  # (dist, cid)
        return out

    def update(assigned):
        sums, counts = {}, {}
        for v, (_, cid) in assigned.items():
            counts[cid] = counts.get(cid, 0) + 1
            s = sums.setdefault(cid, [0] * len(vecs[v]))
            for p, comp in enumerate(vecs[v]):
                s[p] += comp
        # exact floor-division mean (Python // IS floor division)
        return {cid: [c // counts[cid] for c in s] for cid, s in sums.items()}

    cents = {v: vecs[v] for v in range(S._KM_K)}
    for _ in range(S._KM_ROUNDS):
        cents = update(assign(cents))
    a3 = assign(cents)

    x8 = {
        int(v): [math.floor(float(x) * D._SEM_SCALE) for x in e]
        for v, e in zip(t["vec_id"], t["embedding"])
    }
    n8 = {v: sum(c * c for c in x) for v, x in x8.items()}
    expected = {}
    for v in vecs:
        d_v, cid_v = a3[v][0], a3[v][1]
        doms = 0
        for u in vecs:
            if u == v or a3[u][1] != cid_v:
                continue
            d_u = a3[u][0]
            if not (d_u > d_v or (d_u == d_v and u < v)):
                continue
            dot = sum(a * b for a, b in zip(x8[u], x8[v]))
            if dot > 0 and (
                D._SEM_TAU_DEN**2 * dot * dot
                >= D._SEM_TAU_NUM**2 * n8[u] * n8[v]
            ):
                doms += 1
        expected[v] = (cid_v, d_v, doms, 1 if doms else 0)

    got = {
        int(r["vec_id"]): (
            int(r["cluster_id"]),
            int(r["cdist_q20"]),
            int(r["n_dominators"]),
            int(r["pruned"]),
        )
        for r in load_all()["dedup_semantic"].builder(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(p for (_, _, _, p) in got.values()) > 0  # prune is exercised

    # The streaming twin's distinctive path — a LATER-arriving vector
    # (vec_id % 4 staging order) dominating an already-stored member,
    # retroactively flipping it to pruned — must be exercised by this
    # fixture, or the twin's oracle equality stops testing retroactive
    # updates. Verified here against the same pure-Python ground truth.
    late_flips = 0
    for v in vecs:
        d_v, cid_v = a3[v][0], a3[v][1]
        for u in vecs:
            if u == v or a3[u][1] != cid_v or u % 4 <= v % 4:
                continue
            d_u = a3[u][0]
            if not (d_u > d_v or (d_u == d_v and u < v)):
                continue
            dot = sum(a * b for a, b in zip(x8[u], x8[v]))
            if dot > 0 and (
                D._SEM_TAU_DEN**2 * dot * dot
                >= D._SEM_TAU_NUM**2 * n8[u] * n8[v]
            ):
                late_flips += 1
    assert late_flips > 0, "fixture lost its cross-batch late-dominator pairs"


def test_bpe_batched_matches_pure_python_trainer(spark, sf_smoke):
    """The batched BPE trainer (text_bpe_batched — top-K candidates,
    greedy disjoint pick of up to M merges, one chained rewrite per
    super-round) equals a from-scratch plain-Python trainer with the
    IDENTICAL declared semantics: same kept merges per round, same
    per-source token compression. The greedy selection is re-derived
    here independently (not imported) so a drift in either side fails."""
    import re
    from collections import Counter, defaultdict

    import duckdb

    from spark_stream_kudu_spark.operators.text import (
        _BPE_BATCH_K,
        _BPE_BATCH_M,
        _BPE_BATCH_SUPER,
    )
    from spark_stream_kudu_spark.registry import load_all

    con = duckdb.connect()
    raw = con.sql(
        f"SELECT doc_id, source, lower(trim(text)) FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    docs = {
        doc_id: (src, "|" + "||".join(re.split(r"\s+", txt)) + "|")
        for doc_id, src, txt in raw
    }
    n0 = {doc_id: s.count("||") + 1 for doc_id, (_, s) in docs.items()}
    rounds: list[list[str]] = []
    for _ in range(_BPE_BATCH_SUPER):
        pc: Counter = Counter()
        for _, (_, s) in docs.items():
            if len(s) <= 2:
                continue
            tk = s[1:-1].split("||")
            for x, y in zip(tk, tk[1:]):
                pc[f"{x} {y}"] += 1
        cand = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        cand = [p for p, _ in cand[:_BPE_BATCH_K]]
        chosen: list[str] = []
        used: set = set()
        for pr in cand:
            if len(chosen) >= _BPE_BATCH_M:
                break
            a, b = pr.split(" ")
            if a in used or b in used:
                continue
            chosen.append(pr)
            used.update((a, b))
        rounds.append(chosen)
        for pr in chosen:
            a, b = pr.split(" ")
            docs = {
                d: (src, s.replace(f"|{a}||{b}|", f"|{a}_{b}|"))
                for d, (src, s) in docs.items()
            }
    per_source: dict = defaultdict(lambda: [0, 0])
    for doc_id, (src, s) in docs.items():
        after = s.count("||") + 1 if len(s) > 2 else 0
        per_source[src][0] += n0[doc_id]
        per_source[src][1] += after
    rows = load_all()["text_bpe_batched"].builder(spark, sf_smoke).collect()
    for r in rows:
        for i, ms in enumerate(rounds):
            assert r[f"merges_r{i + 1}"] == ",".join(ms), (i, ms)
        b, a = per_source[r["source"]]
        assert (r["tokens_before"], r["tokens_after"]) == (b, a), r["source"]
        assert r["n_merges"] == b - a


def test_udtf_token_runs_whitespace_edge_parity(spark, tmp_path):
    """The UDTF tokenizer mirrors the DuckDB oracle on the whitespace
    edges the fixture never exercises (round-10 advice): trailing
    tabs/newlines (SQL trim strips spaces ONLY) and NBSP (DuckDB \\s is
    ASCII — Unicode whitespace stays inside tokens). A bare Python
    .strip() / Unicode \\s would diverge on every one of these rows."""
    import duckdb

    from spark_stream_kudu_spark.registry import load_all

    rows = [
        (1, "plain plain text"),
        (2, "tab\tseparated\ttokens\t"),       # trailing tab survives trim
        (3, "line\nbreaks\nhere\n"),           # trailing newline survives
        (4, "  leading and trailing spaces  "),  # spaces DO trim
        (5, "nbsp joined tokens"),        # NBSP is NOT a separator
        (6, "a a\ta  a"),                      # runs across mixed seps
        (7, ""),                               # empty -> one '' token
    ]
    sf = str(tmp_path / "sf_udtf")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    spec = load_all()["text_udtf_token_runs"]
    got = sorted(map(tuple, spec.builder(spark, sf).collect()))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))
    con.close()
    assert got == want
