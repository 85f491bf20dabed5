"""Property test for the LSH bucket cap across cap settings.

tests/test_dedup_scale.py pins the skew behavior at cap=16; this drives
mega-buckets PAST the cap at several cap settings (16/64/256) and with
several duplicate-cluster sizes, asserting the two invariants that make
capped LSH safe at crawl scale:

1. pair volume: a duplicate cluster of s docs emits at most s*cap
   candidate pairs (vs the s*(s-1)/2 clique), and a cluster at or
   under the cap emits EXACTLY its clique (no recall loss where the
   oracle checks exact parity);
2. connectivity: anchor replication keeps every cluster one connected
   component under re-bucketing, so downstream clustering is unchanged
   at any cap.
"""

import pytest

from spark_stream_kudu_spark.operators.dedup import minhash_lsh_pairs

# Three duplicate clusters chosen to straddle every tested cap:
# 45 (< 64 and 256, > 16), 300 (> 64), 620 (> 256).
CLUSTER_SIZES = [45, 300, 620]
UNIQUE = 30

_TEMPLATES = [
    "the quick brown fox jumps over the lazy dog near the river bank "
    "every single morning before sunrise without fail",
    "pack my box with five dozen liquor jugs said the sphinx of black "
    "quartz while judging my vow quite carefully indeed",
    "a stitch in time saves nine but a rolling stone gathers no moss "
    "according to the oldest proverbs in the village book",
]


@pytest.fixture(scope="module")
def clustered_docs(spark):
    rows = []
    doc_id = 0
    bounds = []
    for size, text in zip(CLUSTER_SIZES, _TEMPLATES):
        start = doc_id
        for _ in range(size):
            rows.append((doc_id, text))
            doc_id += 1
        bounds.append((start, doc_id))
    for i in range(UNIQUE):
        rows.append(
            (
                doc_id,
                f"unique document number {i} covers topic {i * 7} and "
                f"subject {i * 13} plus theme {i * 29} in detail",
            )
        )
        doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string"), bounds


def _components(pairs, lo, hi):
    parent = {i: i for i in range(lo, hi)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n_pairs = 0
    for a, b in pairs:
        if lo <= a < hi and lo <= b < hi:
            n_pairs += 1
            parent[find(a)] = find(b)
    return len({find(i) for i in range(lo, hi)}), n_pairs


@pytest.mark.parametrize("cap", [16, 64, 256])
def test_cap_bounds_pairs_and_preserves_connectivity(spark, clustered_docs, cap):
    docs, bounds = clustered_docs
    pairs = [
        (p["doc_a"], p["doc_b"])
        for p in minhash_lsh_pairs(docs, cap=cap).collect()
    ]
    for (lo, hi), size in zip(bounds, CLUSTER_SIZES):
        n_comp, n_pairs = _components(pairs, lo, hi)
        assert n_comp == 1, (cap, size, "cluster split into components")
        clique = size * (size - 1) // 2
        if size <= cap:
            # one salt group -> exact all-pairs clique, zero recall loss
            assert n_pairs == clique, (cap, size)
        else:
            assert 0 < n_pairs <= size * cap, (cap, size, n_pairs)
            assert n_pairs < clique, (cap, size)
