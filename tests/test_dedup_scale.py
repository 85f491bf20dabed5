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
