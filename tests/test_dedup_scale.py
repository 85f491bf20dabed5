"""Skew/scale behavior of the MinHash-LSH candidate generation.

An adversarial duplicate mega-cluster (one page duplicated hundreds of
thousands of times in a crawl) lands all its docs in the same LSH
buckets. The capped path must bound emitted pairs (no O(b^2) clique)
while keeping the cluster one connected component so downstream
clustering is unchanged.
"""

import pytest

from spark_stream_kudu_spark.operators.dedup import (
    BUCKET_CAP,
    minhash_bucket_overflow,
    minhash_lsh_pairs,
)
from spark_stream_kudu_spark.sources.tables import load_table

N_DUP = 300
N_UNIQUE = 20
CAP = 16

_DUP_TEXT = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "every single morning before sunrise without fail"
)


@pytest.fixture(scope="module")
def skewed_docs(spark):
    rows = [(i, _DUP_TEXT) for i in range(N_DUP)]
    rows += [
        (N_DUP + i, f"unique document number {i} talks about topic {i * 7} "
                    f"and subject {i * 13} in considerable detail")
        for i in range(N_UNIQUE)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fixture_buckets_below_cap(spark, sf_oracle):
    """The all-pairs DuckDB oracle is exact only while real fixture
    buckets stay under the cap — pin that assumption at the oracle SF."""
    docs = load_table(spark, sf_oracle, "documents")
    overflow = minhash_bucket_overflow(docs, cap=BUCKET_CAP).count()
    assert overflow == 0


def test_skew_bucket_pairs_bounded(spark, skewed_docs):
    pairs = minhash_lsh_pairs(skewed_docs, cap=CAP).collect()
    dup_pairs = [
        p for p in pairs if p["doc_a"] < N_DUP and p["doc_b"] < N_DUP
    ]
    clique = N_DUP * (N_DUP - 1) // 2
    # The salted pass caps per-bucket output at ~b*cap pairs, far below
    # the b^2/2 clique that would OOM a task at crawl scale.
    assert 0 < len(dup_pairs) < N_DUP * CAP
    assert len(dup_pairs) < clique // 4


def test_skew_bucket_stays_connected(spark, skewed_docs):
    pairs = minhash_lsh_pairs(skewed_docs, cap=CAP).collect()
    parent = {i: i for i in range(N_DUP)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = p["doc_a"], p["doc_b"]
        if a < N_DUP and b < N_DUP:
            parent[find(a)] = find(b)
    roots = {find(i) for i in range(N_DUP)}
    assert len(roots) == 1  # anchor linking keeps the mega-cluster whole


def test_overflow_diagnostic_reports_mega_buckets(spark, skewed_docs):
    rows = minhash_bucket_overflow(skewed_docs, cap=CAP).collect()
    # the duplicate cluster overflows in every band
    assert len(rows) >= 1
    assert all(r["bucket_size"] >= N_DUP for r in rows)


def test_capped_equals_uncapped_below_cap(spark, skewed_docs):
    """With a cap above the largest bucket, the salted path is never
    taken and the output is the exact clique set."""
    exact = {
        (p["doc_a"], p["doc_b"])
        for p in minhash_lsh_pairs(skewed_docs, cap=10_000).collect()
    }
    capped = {
        (p["doc_a"], p["doc_b"])
        for p in minhash_lsh_pairs(skewed_docs, cap=CAP).collect()
    }
    assert capped <= exact
    # uncapped emits the full clique for the duplicate cluster
    assert len(exact) >= N_DUP * (N_DUP - 1) // 2


# --------------------------------------------------------------------------
# Prefix-filtered exact similarity join: zero false negatives by theorem;
# pin it empirically against the naive all-pairs computation, including
# the edge shapes the prefix bound has to survive.
# --------------------------------------------------------------------------

def _naive_jaccard_pairs(rows, n, t):
    """Reference all-pairs shingle Jaccard in plain Python."""
    import itertools

    def shingles(text):
        toks = text.strip().lower().split()
        if len(toks) >= n:
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        return {" ".join(toks)}

    sets = {i: shingles(txt) for i, txt in rows}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter / union >= t:
            out.add((a, b))
    return out


def test_prefix_filter_equals_naive_all_pairs(spark):
    from spark_stream_kudu_spark.operators.dedup import (
        SHINGLE_N,
        prefix_filter_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),                                  # \
        (1, base),                                  #  identical pair (J=1)
        (2, base + " lambda"),                      # near-dup of 0/1
        (3, "alpha beta gamma"),                    # strict subset, small
        (4, "one two"),                             # below SHINGLE_N tokens
        (5, "one two"),                             # identical tiny doc
        (6, "totally different words entirely here unrelated content"),
        (7, "zeta eta theta iota kappa alpha beta gamma delta epsilon"),
    ]
    t = 0.5
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (p["doc_a"], p["doc_b"])
        for p in prefix_filter_pairs(docs, t).collect()
    }
    want = _naive_jaccard_pairs(rows, SHINGLE_N, t)
    assert got == want
    assert (0, 1) in got and (4, 5) in got  # the edge shapes actually fired


def test_prefix_filter_no_cartesian_plan(spark, sf_smoke):
    from spark_stream_kudu_spark.operators.dedup import dedup_prefix_filter
    from spark_stream_kudu_spark.plans import checks

    plan = checks.formatted_plan(dedup_prefix_filter(spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
