"""Semantic and plan tests for the drift-monitoring / affinity operators
(operators/drift.py): PSI, chi-square, KS, brand affinity, seasonal-naive
backtest. Each statistic is additionally pinned against a from-scratch
plain-Python computation over the raw fixture — independent of both the
Spark implementation and the DuckDB oracle SQL.
"""

import math
from collections import Counter, defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_stream_kudu_spark.plans import checks
from spark_stream_kudu_spark.registry import load_all

ALL = load_all()

SPLIT_MS = 1705363200000  # 2024-01-16 00:00:00 UTC in epoch ms


@pytest.fixture(scope="module")
def raw_events(sf_smoke):
    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT event_type, epoch_ms(ts) AS t_ms,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(ts AS DATE) AS day
            FROM '{sf_smoke}/events.parquet'"""
    ).fetchall()
    con.close()
    return rows


def test_psi_matches_textbook_recursion(spark, sf_smoke, raw_events):
    """PSI per type == the textbook sum over a dense 10-bin grid with
    Laplace +1 smoothing, computed in plain Python from the raw rows."""
    bins = 10
    ca: dict = defaultdict(Counter)
    cb: dict = defaultdict(Counter)
    for et, t_ms, cents, _day in raw_events:
        b = min(cents // 5000, bins - 1)
        (ca if t_ms < SPLIT_MS else cb)[et][b] += 1
    expected = {}
    for et in set(ca) | set(cb):
        na = sum(ca[et].values())
        nb = sum(cb[et].values())
        psi = 0.0
        for b in range(bins):
            pa = (ca[et][b] + 1.0) / (na + bins)
            pb = (cb[et][b] + 1.0) / (nb + bins)
            psi += (pb - pa) * math.log(pb / pa)
        expected[et] = (na, nb, math.floor(psi * 1e6 + 0.5) / 1e6)
    got = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["psi"])
        for r in ALL["q125_psi_drift"].builder(spark, sf_smoke).collect()
    }
    assert got == expected


def test_chisq_contributions_sum_to_statistic(spark, sf_smoke, raw_events):
    """Chi-square contributions match (O-E)^2/E computed in plain Python,
    and expected counts sum to the current-period total."""
    ca: Counter = Counter()
    cb: Counter = Counter()
    for et, t_ms, _cents, _day in raw_events:
        (ca if t_ms < SPLIT_MS else cb)[et] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    rows = ALL["q126_chisq_drift"].builder(spark, sf_smoke).collect()
    assert {r["event_type"] for r in rows} == set(ca) | set(cb)
    for r in rows:
        e = (ca[r["event_type"]] / na) * nb
        contrib = (cb[r["event_type"]] - e) ** 2 / e
        assert r["n_observed"] == cb[r["event_type"]]
        assert r["n_expected"] == pytest.approx(e, abs=1e-4)
        assert r["chisq_contrib"] == pytest.approx(contrib, abs=1e-6)
    assert sum(r["n_expected"] for r in rows) == pytest.approx(nb, abs=1e-2)


def test_ks_matches_ecdf_scan(spark, sf_smoke, raw_events):
    """KS per type == max |F_a - F_b| from a plain-Python ECDF sweep."""
    a: dict = defaultdict(list)
    b: dict = defaultdict(list)
    for et, t_ms, cents, _day in raw_events:
        (a if t_ms < SPLIT_MS else b)[et].append(cents)
    expected = {}
    for et in set(a) | set(b):
        sa, sb = sorted(a[et]), sorted(b[et])
        na, nb = len(sa), len(sb)
        d = 0.0
        for v in sorted(set(sa) | set(sb)):
            fa = sum(1 for x in sa if x <= v) / na
            fb = sum(1 for x in sb if x <= v) / nb
            d = max(d, abs(fa - fb))
        expected[et] = (na, nb, math.floor(d * 1e6 + 0.5) / 1e6)
    got = {
        r["event_type"]: (r["n_ref"], r["n_cur"], r["ks_stat"])
        for r in ALL["q127_ks_drift"].builder(spark, sf_smoke).collect()
    }
    assert got == expected


def test_ks_bounds_and_nonvacuous(spark, sf_smoke):
    """0 <= KS <= 1, and the two halves genuinely differ somewhere
    (a KS of exactly 0 everywhere would make the drift check vacuous)."""
    rows = ALL["q127_ks_drift"].builder(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ks_stat"] <= 1.0
    assert any(r["ks_stat"] > 0 for r in rows)


def test_affinity_lift_identity(spark, sf_smoke):
    """lift * P(a) * P(b) == P(a,b) exactly (integer cross-check), and
    the pair support respects the floor."""
    df = ALL["q128_brand_affinity"].builder(spark, sf_smoke)
    rows = df.collect()
    assert rows
    con = duckdb.connect()
    marg = dict(
        con.sql(
            f"""SELECT brand, count(*) FROM (
                  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
                  FROM '{sf_smoke}/lineitem.parquet'
                  JOIN '{sf_smoke}/part.parquet' ON l_partkey = p_partkey)
                GROUP BY 1"""
        ).fetchall()
    )
    n_orders = con.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM '{sf_smoke}/lineitem.parquet'"
    ).fetchone()[0]
    con.close()
    for r in rows:
        assert r["n_pair"] >= 5
        assert r["brand_a"] < r["brand_b"]
        lift = (r["n_pair"] * n_orders) / (marg[r["brand_a"]] * marg[r["brand_b"]])
        assert r["lift"] == pytest.approx(lift, abs=1e-6)


def test_affinity_broadcasts_dims(spark, sf_smoke):
    """part and the marginals join as broadcasts; the only shuffle keys
    are the order key and the pair key."""
    df = ALL["q128_brand_affinity"].builder(spark, sf_smoke)
    assert checks.uses_broadcast_join(df)
    assert not checks.python_eval_nodes(df)


def test_seasonal_naive_alignment(spark, sf_smoke, raw_events):
    """The backtest compares day d against day d-7 of the same type:
    recompute MAE from plain-Python daily totals."""
    import datetime

    daily: dict = defaultdict(int)
    for et, _t_ms, cents, day in raw_events:
        d = (day - datetime.date(2024, 1, 1)).days
        daily[(et, d)] += cents
    per_type_err: dict = defaultdict(list)
    for (et, d), cents in daily.items():
        prev = daily.get((et, d - 7))
        if prev is not None:
            per_type_err[et].append(abs(cents - prev))
    rows = ALL["q129_seasonal_naive_eval"].builder(spark, sf_smoke).collect()
    got = {r["event_type"]: (r["n_days"], r["mae"]) for r in rows}
    for et, errs in per_type_err.items():
        mae = math.floor(sum(errs) / len(errs) / 100.0 * 1e4 + 0.5) / 1e4
        assert got[et] == (len(errs), mae)


def test_stream_psi_equals_batch(spark, sf_smoke):
    """The streaming PSI monitor (hash-sliced 4-batch replay through the
    additive count store) produces exactly the batch q125 rows — the
    batch-slicing-independence the additive-merge design guarantees."""
    batch = {
        tuple(r) for r in ALL["q125_psi_drift"].builder(spark, sf_smoke).collect()
    }
    streamed = {
        tuple(r)
        for r in ALL["stream_psi_drift_e2e"].builder(spark, sf_smoke).collect()
    }
    assert streamed == batch


def test_drift_queries_stay_jvm_side(spark, sf_smoke):
    """No Python eval nodes in any drift-family plan — everything runs
    in whole-stage codegen."""
    for name in (
        "q125_psi_drift",
        "q126_chisq_drift",
        "q127_ks_drift",
        "q129_seasonal_naive_eval",
    ):
        df = ALL[name].builder(spark, sf_smoke)
        assert not checks.python_eval_nodes(df), name


def test_psi_identity_is_zero(spark):
    """PSI of a distribution against itself is exactly 0: feed a frame
    whose two halves are value-identical (same rows mirrored across the
    split) and assert psi == 0.0 for every type."""
    import datetime

    rows = []
    eid = 0
    for et in ("a", "b"):
        for v in (10.0, 120.5, 333.25, 499.99, 10.0):
            for half_day in (1, 20):  # one copy each side of Jan 16
                rows.append(
                    (eid, datetime.datetime(2024, 1, half_day), 0, et, v, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from spark_stream_kudu_spark.operators.drift import (
        psi_from_counts,
        psi_tag_columns,
    )
    from pyspark.sql import functions as F

    counts = psi_tag_columns(df).groupBy("event_type", "period", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    out = {r["event_type"]: r for r in psi_from_counts(counts).collect()}
    for et in ("a", "b"):
        assert out[et]["n_ref"] == out[et]["n_cur"] == 5
        assert out[et]["psi"] == 0.0


def test_decayed_leaderboard_matches_python(spark, sf_smoke):
    """Decayed scores equal a plain-Python recomputation (integer
    2^(K-k) weights), and the top-k ordering respects the
    (score DESC, user_id ASC) tie-break."""
    import datetime

    from spark_stream_kudu_spark.operators.drift import (
        _DECAY_ASOF,
        _DECAY_HALFLIFE_DAYS,
        _DECAY_MAX_K,
        _DECAY_TOPK,
    )

    con = duckdb.connect()
    evs = con.sql(
        f"SELECT user_id, CAST(ts AS DATE) FROM '{sf_smoke}/events.parquet'"
    ).fetchall()
    con.close()
    asof = datetime.date.fromisoformat(_DECAY_ASOF)
    scores: dict = defaultdict(lambda: [0, 0])
    for uid, day in evs:
        k = min((asof - day).days // _DECAY_HALFLIFE_DAYS, _DECAY_MAX_K)
        scores[uid][0] += 1 << (_DECAY_MAX_K - k)
        scores[uid][1] += 1
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:_DECAY_TOPK]
    rows = ALL["q133_decayed_leaderboard"].builder(spark, sf_smoke).collect()
    assert [(r["user_id"], r["score_q"], r["n_events"]) for r in rows] == [
        (uid, sq, n) for uid, (sq, n) in expect
    ]
    for r in rows:
        assert r["decayed_score"] == r["score_q"] / (1 << _DECAY_MAX_K)


def test_weighted_median_matches_python(spark, sf_smoke):
    """The lower weighted median equals a plain-Python sort + cumulative
    weight scan per group."""
    con = duckdb.connect()
    items = con.sql(
        f"""SELECT l_returnflag,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                   CAST(l_quantity AS BIGINT)
            FROM '{sf_smoke}/lineitem.parquet'"""
    ).fetchall()
    con.close()
    groups: dict = defaultdict(list)
    for rf, cents, w in items:
        groups[rf].append((cents, w))
    expect = {}
    for rf, rows_ in groups.items():
        rows_.sort()
        total = sum(w for _, w in rows_)
        cum = 0
        for cents, w in rows_:
            cum += w
            if cum * 2 >= total:
                expect[rf] = (total, cents)
                break
    got = {
        r["l_returnflag"]: (r["total_weight"], r["median_cents"])
        for r in ALL["q134_weighted_median"].builder(spark, sf_smoke).collect()
    }
    assert got == expect


def test_pareto_and_gini_match_python(spark, sf_smoke):
    """Pareto cumulative shares and the Gini coefficient equal a
    plain-Python recomputation from per-customer exact cents totals —
    and the two queries agree with each other (decile revenues sum to
    the Gini query's total)."""
    con = duckdb.connect()
    cust = con.sql(
        f"""SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                   AS BIGINT)) AS BIGINT)
            FROM '{sf_smoke}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    con.close()
    n = len(cust)
    total = sum(c for _, c in cust)

    desc = sorted(cust, key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    decile_rev: dict = defaultdict(int)
    decile_cum: dict = {}
    decile_n: dict = defaultdict(int)
    for rk0, (_, c) in enumerate(desc):
        d = (rk0 * 10) // n + 1
        cum += c
        decile_rev[d] += c
        decile_cum[d] = cum
        decile_n[d] += 1
    rows = ALL["q135_pareto_curve"].builder(spark, sf_smoke).collect()
    got = {
        r["decile"]: (r["n_customers"], r["decile_rev_cents"], r["cum_rev_cents"])
        for r in rows
    }
    assert got == {
        d: (decile_n[d], decile_rev[d], decile_cum[d]) for d in decile_rev
    }
    for r in rows:
        assert r["cum_share"] == math.floor(
            got[r["decile"]][2] / total * 1e6 + 0.5
        ) / 1e6
    # top decile must dominate (concentration is real, not vacuous)
    assert got[1][1] > total / 10

    asc = sorted(cust, key=lambda kv: (kv[1], kv[0]))
    sxi = sum((i + 1) * c for i, (_, c) in enumerate(asc))
    gini = 2.0 * sxi / (n * 1.0 * total) - (n + 1.0) / n
    [g] = ALL["q136_gini"].builder(spark, sf_smoke).collect()
    assert g["n_customers"] == n and g["total_cents"] == total
    assert g["gini"] == math.floor(gini * 1e6 + 0.5) / 1e6
    assert 0.0 <= g["gini"] < 1.0


def test_stream_ks_equals_batch(spark, sf_smoke):
    """The streaming KS monitor (hash-sliced replay through the additive
    value-histogram store) produces exactly the batch q127 rows."""
    batch = {
        tuple(r) for r in ALL["q127_ks_drift"].builder(spark, sf_smoke).collect()
    }
    streamed = {
        tuple(r)
        for r in ALL["stream_ks_drift_e2e"].builder(spark, sf_smoke).collect()
    }
    assert streamed == batch


def test_stream_chisq_equals_batch(spark, sf_smoke):
    """The streaming chi-square monitor produces exactly the batch q126
    rows — drift trio slicing-independence, third instance."""
    batch = {
        tuple(r) for r in ALL["q126_chisq_drift"].builder(spark, sf_smoke).collect()
    }
    streamed = {
        tuple(r)
        for r in ALL["stream_chisq_drift_e2e"].builder(spark, sf_smoke).collect()
    }
    assert streamed == batch


def test_acf_matches_python_and_bounds(spark, sf_smoke, raw_events):
    """ACF at each lag equals a plain-Python Pearson correlation over
    the lag-joined daily totals, and every value lies in [-1, 1]."""
    import datetime

    daily: dict = defaultdict(int)
    for et, _t_ms, cents, day in raw_events:
        d = (day - datetime.date(2024, 1, 1)).days
        daily[(et, d)] += cents
    rows = ALL["q139_autocorrelation"].builder(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        pairs = [
            (daily[(r["event_type"], d - r["lag"])], cents)
            for (et, d), cents in daily.items()
            if et == r["event_type"] and (et, d - r["lag"]) in daily
        ]
        n = len(pairs)
        assert r["n_pairs"] == n
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        acf = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert r["acf"] == math.floor(acf * 1e6 + 0.5) / 1e6


def test_xcorr_matches_python(spark, sf_smoke, raw_events):
    """Cross-correlation at each (pair, lag) equals a plain-Python
    Pearson over the lag-joined daily totals; zero-lag values are
    symmetric in the pair by construction."""
    import datetime

    daily: dict = defaultdict(int)
    for et, _t_ms, cents, day in raw_events:
        d = (day - datetime.date(2024, 1, 1)).days
        daily[(et, d)] += cents
    rows = ALL["q141_cross_correlation"].builder(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["type_a"] < r["type_b"]
        pairs = [
            (cents, daily[(r["type_b"], d + r["lag"])])
            for (et, d), cents in daily.items()
            if et == r["type_a"] and (r["type_b"], d + r["lag"]) in daily
        ]
        n = len(pairs)
        assert r["n_pairs"] == n
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        xc = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )
        assert r["xcorr"] == math.floor(xc * 1e6 + 0.5) / 1e6


def test_mutual_information_matches_python_and_nonneg(spark, sf_smoke):
    """MI equals the plain-Python contingency computation (same decile
    rule) and is non-negative (information inequality)."""
    con = duckdb.connect()
    evs = con.sql(
        f"SELECT user_id, event_type FROM '{sf_smoke}/events.parquet'"
    ).fetchall()
    con.close()
    uc: Counter = Counter(u for u, _ in evs)
    ranked = sorted(uc.items(), key=lambda kv: (-kv[1], kv[0]))
    n_users = len(ranked)
    decile_of: dict = {}
    # ntile semantics: first (n_users % 10) tiles get ceil size
    base, extra = divmod(n_users, 10)
    idx = 0
    for tile in range(1, 11):
        size = base + (1 if tile <= extra else 0)
        for uid, _ in ranked[idx : idx + size]:
            decile_of[uid] = tile
        idx += size
    cells: Counter = Counter((decile_of[u], t) for u, t in evs)
    n = sum(cells.values())
    md: Counter = Counter()
    mt: Counter = Counter()
    for (d, t), c in cells.items():
        md[d] += c
        mt[t] += c
    mi = sum(
        (c / n) * math.log((c * n) / (md[d] * mt[t]))
        for (d, t), c in cells.items()
    )
    [r] = ALL["q142_mutual_information"].builder(spark, sf_smoke).collect()
    assert r["n_events"] == n
    assert r["n_cells"] == len(cells)
    assert r["mi_nats"] == math.floor(mi * 1e6 + 0.5) / 1e6
    assert r["mi_nats"] >= 0.0


def test_motif_matches_python(spark, sf_smoke, raw_events):
    """The motif (closest non-overlapping 7-day window pair) equals a
    plain-Python exhaustive scan over the daily series."""
    import datetime

    daily: dict = defaultdict(int)
    for et, _t_ms, cents, day in raw_events:
        d = (day - datetime.date(2024, 1, 1)).days
        daily[(et, d)] += cents
    series: dict = defaultdict(list)
    for (et, d), cents in sorted(daily.items()):
        series[et].append(cents)
    w = 7
    expect = {}
    for et, xs in series.items():
        best = None
        n = len(xs)
        for i in range(0, n - 2 * w + 1):
            for j in range(i + w, n - w + 1):
                dist = sum((xs[i + k] - xs[j + k]) ** 2 for k in range(w))
                cand = (dist, i + 1, j + 1)  # 1-based like the query
                if best is None or cand < best:
                    best = cand
        expect[et] = best
    got = {
        r["event_type"]: (r["dist"], r["pos_a"], r["pos_b"])
        for r in ALL["q143_motif_discovery"].builder(spark, sf_smoke).collect()
    }
    assert got == expect


def test_rfm_conserves_users_and_money(spark, sf_smoke):
    """RFM cells partition the user base exactly: user counts sum to
    |users|, segment cents sum to the exact corpus total, and every
    score is a valid quintile."""
    rows = ALL["q144_rfm_segmentation"].builder(spark, sf_smoke).collect()
    assert rows
    con = duckdb.connect()
    [(n_users, total_cents)] = con.sql(
        f"""SELECT count(DISTINCT user_id),
                   sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
            FROM '{sf_smoke}/events.parquet'"""
    ).fetchall()
    con.close()
    assert sum(r["n_users"] for r in rows) == n_users
    assert sum(r["segment_cents"] for r in rows) == total_cents
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5


def test_zipf_and_fano_match_python(spark, sf_smoke, raw_events):
    """Zipf slope/intercept equal a plain-Python log-log least squares
    over the vocabulary, and the Fano factor equals variance/mean of
    daily counts — both from independently recomputed inputs."""
    import datetime
    import re

    con = duckdb.connect()
    texts = con.sql(
        f"SELECT lower(trim(text)) FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    con.close()
    freq: Counter = Counter()
    for (txt,) in texts:
        freq.update(re.split(r"\s+", txt))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    [r] = ALL["q145_zipf_fit"].builder(spark, sf_smoke).collect()
    assert r["n_tokens_distinct"] == n
    assert r["zipf_slope"] == math.floor(slope * 1e6 + 0.5) / 1e6
    assert r["zipf_intercept"] == math.floor(intercept * 1e6 + 0.5) / 1e6
    assert r["zipf_slope"] < 0  # frequency falls with rank

    daily: Counter = Counter()
    for et, _t_ms, _cents, day in raw_events:
        daily[(et, day)] += 1
    per_type: dict = defaultdict(list)
    for (et, _day), c in daily.items():
        per_type[et].append(c)
    got = {
        r["event_type"]: (r["n_days"], r["n_events"], r["fano"])
        for r in ALL["q146_fano_factor"].builder(spark, sf_smoke).collect()
    }
    for et, counts in per_type.items():
        d = len(counts)
        s = sum(counts)
        ss = sum(c * c for c in counts)
        var = (ss * d - s * s) / (d * (d - 1))
        fano = var / (s / d)
        assert got[et] == (d, s, math.floor(fano * 1e6 + 0.5) / 1e6)


def test_vocab_drift_and_entropy_match_python(spark, sf_smoke):
    """Vocabulary drift counts equal a plain-Python set computation, and
    per-user entropy equals the textbook Shannon formula (bounded by
    ln of the user's type count)."""
    import re

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, lower(trim(text)) FROM '{sf_smoke}/documents.parquet'"
    ).fetchall()
    evs = con.sql(
        f"SELECT user_id, event_type FROM '{sf_smoke}/events.parquet'"
    ).fetchall()
    con.close()

    va: set = set()
    vb: set = set()
    for doc_id, txt in docs:
        (va if doc_id % 2 == 0 else vb).update(re.split(r"\s+", txt))
    [r] = ALL["q147_vocab_drift"].builder(spark, sf_smoke).collect()
    assert r["n_shared"] == len(va & vb)
    assert r["n_retired"] == len(va - vb)
    assert r["n_new"] == len(vb - va)
    assert r["jaccard"] == math.floor(
        len(va & vb) / len(va | vb) * 1e6 + 0.5
    ) / 1e6

    cells: Counter = Counter(evs)
    per_user: dict = defaultdict(dict)
    for (u, t), c in cells.items():
        per_user[u][t] = c
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["entropy_nats"])
        for r in ALL["q148_behavior_entropy"].builder(spark, sf_smoke).collect()
    }
    for u, tc in per_user.items():
        n = sum(tc.values())
        ent = -sum((c / n) * math.log(c / n) for c in tc.values())
        assert got[u] == (n, len(tc), math.floor(ent * 1e6 + 0.5) / 1e6)
        assert got[u][2] <= math.log(len(tc)) + 1e-9


def test_gap_percentiles_and_growth_match_python(spark, sf_smoke):
    """q149's exact lower quantiles and q150's daily new/returning split
    both equal plain-Python recomputations from the raw fixture."""
    con = duckdb.connect()
    evs = con.sql(
        f"""SELECT event_type, epoch_ms(ts), event_id, user_id, CAST(ts AS DATE)
            FROM '{sf_smoke}/events.parquet' ORDER BY ts, event_id"""
    ).fetchall()
    con.close()

    gaps: dict = defaultdict(list)
    last: dict = {}
    for et, ms, eid, _u, _day in evs:
        if et in last:
            gaps[et].append(ms - last[et])
        last[et] = ms
    got = {
        r["event_type"]: r
        for r in ALL["q149_gap_percentiles"].builder(spark, sf_smoke).collect()
    }
    for et, gs in gaps.items():
        gs.sort()
        n = len(gs)
        r = got[et]
        assert r["n_gaps"] == n
        for q in (50, 90, 99):
            # smallest gap whose cumulative count reaches ceil(q% of n)
            idx = -(-n * q // 100) - 1
            assert r[f"p{q}_ms"] == gs[idx], (et, q)

    first_day: dict = {}
    active: set = set()
    for _et, _ms, _eid, u, day in evs:
        if u not in first_day:
            first_day[u] = day
        active.add((day, u))
    per_day: dict = defaultdict(lambda: [0, 0])
    for day, u in active:
        per_day[day][0 if day == first_day[u] else 1] += 1
    got2 = {
        r["day"]: (r["n_new"], r["n_returning"], r["n_active"])
        for r in ALL["q150_new_vs_returning"].builder(spark, sf_smoke).collect()
    }
    assert got2 == {
        d: (new, ret, new + ret) for d, (new, ret) in per_day.items()
    }
    # every user is new exactly once across the month
    assert sum(v[0] for v in got2.values()) == len(first_day)


def test_peaks_and_weekday_index_match_python(spark, sf_smoke, raw_events):
    """Peak rows equal a plain-Python neighbor+mean scan (integer
    cross-multiplied), and the weekday indexes weight-average to 1."""
    import datetime

    daily: dict = defaultdict(int)
    for et, _t_ms, cents, day in raw_events:
        d = (day - datetime.date(2024, 1, 1)).days
        daily[(et, d)] += cents
    series: dict = defaultdict(dict)
    for (et, d), cents in daily.items():
        series[et][d] = cents
    expect = set()
    for et, by_day in series.items():
        days = sorted(by_day)
        s = sum(by_day.values())
        n = len(days)
        for k in range(1, len(days) - 1):
            d = days[k]
            c = by_day[d]
            if (
                c > by_day[days[k - 1]]
                and c > by_day[days[k + 1]]
                and c * n > s
            ):
                expect.add((et, d, c))
    got = {
        (r["event_type"], r["d"], r["cents"])
        for r in ALL["q151_peak_detection"].builder(spark, sf_smoke).collect()
    }
    assert got == expect

    rows = ALL["q152_weekday_index"].builder(spark, sf_smoke).collect()
    per_type: dict = defaultdict(list)
    for r in rows:
        assert 1 <= r["weekday"] <= 7
        per_type[r["event_type"]].append((r["n_days"], r["seasonal_index"]))
    for et, items in per_type.items():
        total_days = sum(n for n, _ in items)
        # day-weighted mean of indexes == 1 (each index is wd_mean/all_mean)
        weighted = sum(n * ix for n, ix in items) / total_days
        assert abs(weighted - 1.0) < 1e-4


def test_ltv_monotone_and_stickiness_bounds(spark, sf_smoke):
    """LTV curves are non-decreasing in cohort age (cumulative money
    can't shrink) and reconcile to the exact corpus total; stickiness
    lies in (1/7, 1] with exact integer inputs."""
    rows = ALL["q153_cohort_ltv"].builder(spark, sf_smoke).collect()
    assert rows
    per_cohort: dict = defaultdict(list)
    for r in rows:
        per_cohort[r["cohort_week"]].append((r["age_week"], r["cum_cents"]))
    final_total = 0
    for _c, curve in per_cohort.items():
        curve.sort()
        for (a1, c1), (a2, c2) in zip(curve, curve[1:]):
            assert a1 < a2 and c1 <= c2
        final_total += curve[-1][1]
    con = duckdb.connect()
    [(total,)] = con.sql(
        f"""SELECT sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
            FROM '{sf_smoke}/events.parquet'"""
    ).fetchall()
    con.close()
    assert final_total == total

    for r in ALL["q154_stickiness"].builder(spark, sf_smoke).collect():
        assert 1.0 / r["n_days"] - 1e-9 <= r["stickiness"] <= 1.0


def test_abc_xyz_partitions_parts_and_a_dominates(spark, sf_smoke):
    """The ABC-XYZ grid partitions the part set exactly (counts sum to
    |parts with sales|), and class A carries at least the A-threshold
    share of revenue by construction."""
    rows = ALL["q155_abc_xyz"].builder(spark, sf_smoke).collect()
    assert rows
    con = duckdb.connect()
    [(n_parts, total_qty)] = con.sql(
        f"""SELECT count(DISTINCT l_partkey),
                   sum(CAST(l_quantity AS BIGINT))
            FROM '{sf_smoke}/lineitem.parquet'"""
    ).fetchall()
    con.close()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["total_qty"] for r in rows) == total_qty
    for r in rows:
        assert r["abc_class"] in {"A", "B", "C"}
        assert r["xyz_class"] in {"X", "Y", "Z"}
