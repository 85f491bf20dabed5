"""Deduplication operators — the LLM-data-pipeline extension family.

Five dedup strategies over ``documents`` / ``embeddings``, all
Spark-first and all oracle-checked:

- exact (hash-groupBy on the raw text)
- fingerprint (sorted-distinct-token canonicalization -> md5)
- MinHash signatures + LSH band-join candidate pairs
- n-gram Jaccard verification
- SimHash (32-bit) signatures + Hamming-LSH pairs
- embedding-cosine near-dup pairs (label-blocked)

Design for 100 TB:
- Every per-document computation (tokens, shingles, hashes, signatures)
  is a row-local native Catalyst expression — no Python workers, no
  shuffle, scales linearly with input splits.
- Candidate generation is the classic LSH reduction: explode to
  (band, band_key) and self-join — the only shuffle, keyed by band
  hash, which is uniformly distributed by construction. Exact-duplicate
  clusters make popular buckets; AQE skew-join handles them.
- Verification (Jaccard / Hamming / cosine) runs only on candidate
  pairs, never all-pairs. The oracle queries use modulo blocking where
  an unfiltered pair space would be quadratic.

The portable hash primitive is md5-derived (functions.hashing) so the
DuckDB oracle reproduces every signature bit-for-bit; at production
scale you'd swap in xxhash64 via the same expression shape.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.hashing import (
    MERSENNE_P,
    md5_int32,
    minhash_params,
    sql_md5_int32,
)
from spark_stream_kudu_spark.functions.lineage import (
    CKPT_INTERVAL,
    RELIABLE_CKPT_ENV,
    configure_reliable_checkpoints,
    cut_lineage,
    pin as _pin,
)
from spark_stream_kudu_spark.functions.rounding import ceil_div, fround, sql_fround
from spark_stream_kudu_spark.functions.textutil import (
    sql_tokens,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

NUM_HASHES = 12
BANDS = 4
ROWS_PER_BAND = 3
SHINGLE_N = 3
SIMHASH_BITS = 32


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "documents")


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

_EXACT_ORACLE = """
SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS keeper_id
FROM documents
GROUP BY md5(text)
"""


@register(
    "dedup_exact",
    "dedup",
    "Exact duplicate detection: hash-groupBy on content, keeper = min doc_id. "
    "One shuffle on the content hash; at 100 TB group by md5 prefix buckets first.",
    oracle=_EXACT_ORACLE,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5("text").alias("text_md5")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("keeper_id"),
    )


# --------------------------------------------------------------------------
# Fingerprint dedup (canonicalized token-set hash)
# --------------------------------------------------------------------------

_FP_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct({sql_tokens('text')})), ' ')) AS fingerprint
  FROM documents
)
SELECT doc_id, fingerprint,
       min(doc_id) OVER (PARTITION BY fingerprint) AS keeper_id,
       (doc_id <> min(doc_id) OVER (PARTITION BY fingerprint)) AS is_dup
FROM f
"""


@register(
    "dedup_fingerprint",
    "dedup",
    "Document fingerprinting: sorted distinct-token canonical form -> md5; marks "
    "each doc as keeper/dup within its fingerprint group (window min).",
    oracle=_FP_ORACLE,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col("text"))))))
    w = Window.partitionBy("fingerprint")
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper_id"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(d: DataFrame) -> DataFrame:
    """doc_id + NUM_HASHES min-hash columns over SHINGLE_N-token shingles.

    Explode-based: one row per shingle, each shingle md5-hashed exactly
    once, then a single groupBy(doc_id) computes all NUM_HASHES minima
    in one pass (map-side partial aggregation).

    Why not nested array expressions (array_min over transform)? Each
    signature column would inline and re-evaluate the md5 shingle array
    — lambda-bound subtrees defeat Catalyst's subexpression elimination
    — multiplying the dominant md5/concat cost by NUM_HASHES (measured
    ~100x slower at sf0.1). The explode form is also the shape that
    scales: shingle rows stream through one shuffle keyed by doc_id,
    with combine-side minima keeping shuffle volume at
    O(docs x NUM_HASHES) regardless of document length.
    """
    # The fixture documents table is one small parquet file -> one input
    # split, while the work below is CPU-heavy per row (shingle
    # explosion + md5). spread_small_scan shuffles only the thin
    # (doc_id, text) projection to full parallelism — and is a NO-OP at
    # real scale where the table already arrives in many splits, so no
    # full-corpus shuffle is baked into the plan.
    from spark_stream_kudu_spark.session import spread_small_scan

    sh = spread_small_scan(d.select("doc_id", "text")).select(
        "doc_id",
        F.explode(word_shingles(tokens(F.col("text")), SHINGLE_N)).alias("s"),
    )
    h = sh.select("doc_id", md5_int32(F.col("s")).alias("h"))
    return _sig_minima(h)


def _sig_minima(h: DataFrame) -> DataFrame:
    """(doc_id, h) shingle-hash rows -> doc_id + NUM_HASHES minima (one
    groupBy, map-side partial aggregation)."""
    return h.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh_{k}")
            for k, (a, b) in enumerate(minhash_params(NUM_HASHES))
        ]
    )


def shingle_table(d: DataFrame) -> DataFrame:
    """(doc_id, s): the DISTINCT shingle array per document, spread to
    full parallelism — the single corpus tokenize+shingle pass the
    generate (MinHash signature) and verify (exact set-arithmetic)
    stages of one query share when it is pinned. In production this IS
    a stored table (the shingle index the verify stage reads), so a
    pin of it mirrors the deployment."""
    from spark_stream_kudu_spark.session import spread_small_scan

    return spread_small_scan(d.select("doc_id", "text")).select(
        "doc_id",
        F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_N)).alias("s"),
    )


def minhash_signatures_from_shingles(sh: DataFrame) -> DataFrame:
    """Signatures from a prebuilt (doc_id, s) distinct-shingle table
    (shingle_table). Bit-identical to minhash_signatures by
    construction: every signature column is a min over
    (a*h + b) % MERSENNE_P, and a min is insensitive to duplicate
    inputs, so hashing each DISTINCT shingle once yields the same
    minima as hashing every occurrence — while md5-hashing fewer rows.
    Lets one query compute signatures AND the exact verify from a
    single pinned tokenize+shingle pass instead of re-scanning the
    corpus for each."""
    h = sh.select("doc_id", F.explode("s").alias("s")).select(
        "doc_id", md5_int32(F.col("s")).alias("h")
    )
    return _sig_minima(h)


def _sql_minhash_cte() -> str:
    """Shared oracle CTE producing doc_id + mh_0..mh_{n-1}."""
    toks = sql_tokens("text")
    shingles = sql_word_shingles("t", SHINGLE_N)
    h_item = sql_md5_int32("x")
    sig_cols = ",\n         ".join(
        f"list_min(list_transform(h, v -> ({a} * v + {b}) % {MERSENNE_P})) AS mh_{k}"
        for k, (a, b) in enumerate(minhash_params(NUM_HASHES))
    )
    return f"""
tok AS (SELECT doc_id, {toks} AS t FROM documents),
sh  AS (SELECT doc_id, {shingles} AS s FROM tok),
hs  AS (SELECT doc_id, list_transform(s, x -> {h_item}) AS h FROM sh),
sig AS (SELECT doc_id,
         {sig_cols}
        FROM hs)"""


def _sql_bands_cte() -> str:
    """Shared oracle CTE: sig -> (doc_id, band, bkey) LSH band keys.

    One definition for the five oracles that band the minhash signature
    — a banding-layout change edits exactly one place.
    """
    return (
        "bands AS (\n  "
        + " UNION ALL ".join(
            f"SELECT doc_id, {j} AS band, md5(concat_ws('_', "
            + ", ".join(f"mh_{j * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
            + ")) AS bkey FROM sig"
            for j in range(BANDS)
        )
        + "\n)"
    )


_MH_SIG_ORACLE = f"""
WITH {_sql_minhash_cte()}
SELECT * FROM sig
"""


@register(
    "dedup_minhash_signatures",
    "dedup",
    f"MinHash signatures ({NUM_HASHES} hashes, {SHINGLE_N}-token shingles, md5-based "
    "universal hash family) — the dense per-document verification of the MinHash "
    "machinery; every signature value oracle-checked.",
    oracle=_MH_SIG_ORACLE,
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(_docs(spark, sf_dir))


def _band_key_cols() -> list[F.Column]:
    cols = []
    for j in range(BANDS):
        parts = [F.col(f"mh_{j * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        cols.append(F.md5(F.concat_ws("_", *parts)).alias(f"band_{j}"))
    return cols


_MH_PAIRS_ORACLE = f"""
WITH {_sql_minhash_cte()},
{_sql_bands_cte()}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
"""


# Max docs per LSH bucket that get the exact all-pairs (clique) treatment.
# One adversarial duplicate cluster (boilerplate duplicated 10M times in a
# crawl) would otherwise emit O(b^2) pairs from a single bucket and OOM the
# task. Fixture bucket sizes stay far below this (asserted in
# tests/test_invariants.py), so the DuckDB all-pairs oracle remains exact.
BUCKET_CAP = 64


def _in_bucket_combos(ids: F.Column) -> F.Column:
    """All ordered pairs (doc_a < doc_b) within a sorted id array."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def minhash_lsh_pairs(
    d: DataFrame, cap: int = BUCKET_CAP, sig: DataFrame | None = None
) -> DataFrame:
    """LSH candidate pairs with a bucket-size cap.

    ``d`` is ONLY used to build signatures when ``sig`` is None: a
    caller supplying a prebuilt signature frame (the round-11 shared
    tokenize+shingle pass) must build it from the same corpus — ``d``
    is ignored in that case and nothing here can cross-check the two
    (round-11 advice: don't desynchronize them).

    Candidate generation never materializes a whole bucket as one array
    row — that (a ``collect_list`` over an adversarial mega-bucket) is
    itself the OOM at crawl scale, regardless of how the pairs are then
    enumerated. Instead:

    1. bucket stats (size, min doc_id = anchor) via a plain count/min
       aggregation — constant memory per bucket;
    2. each doc takes a deterministic salt in [0, ceil((size-1)/cap));
       the anchor replicates into EVERY salt group (``sequence`` +
       explode);
    3. one groupBy (band, bkey, salt) collects only bounded <=cap+1
       sub-groups, and in-group combinations emit the pairs.

    Buckets of <=cap docs have exactly one salt group, so their output
    is the exact all-pairs clique (what the DuckDB oracle checks at
    fixture scale). Oversized buckets emit O(b*cap) pairs instead of
    O(b^2), and because every sub-group contains the anchor, the bucket
    stays one connected component — downstream clustering
    (dedup_clusters) sees the same components. That recall trade only
    activates on >cap buckets, whose members are near-certain duplicates
    anyway; enumerating every pair adds nothing clustering needs.
    """
    bands = _minhash_bands(d, sig=sig)
    stats = (
        bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("bsize"), F.min("doc_id").alias("anchor"))
        .filter(F.col("bsize") >= 2)
    )
    joined = bands.join(stats, ["band", "bkey"])  # inner: singleton buckets drop
    n_salts = ceil_div(F.col("bsize") - 1, cap).cast("int")
    # One branch, no union: the anchor explodes into every salt group,
    # everyone else into exactly one — a conditional salt array keeps
    # the whole pipeline a single plan (no duplicated join subtree).
    salted = joined.select(
        "band",
        "bkey",
        "doc_id",
        F.explode(
            F.when(
                F.col("doc_id") == F.col("anchor"),
                F.sequence(F.lit(0), n_salts - 1),
            ).otherwise(F.array(F.pmod(F.hash("doc_id"), n_salts)))
        ).alias("salt"),
    )
    groups = (
        salted.groupBy("band", "bkey", "salt")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    return (
        groups.select(F.explode(_in_bucket_combos(F.col("ids"))).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def minhash_bucket_overflow(d: DataFrame, cap: int = BUCKET_CAP) -> DataFrame:
    """Diagnostic: LSH buckets exceeding the cap — (band, bkey,
    bucket_size). Pipelines surface this count instead of silently
    degrading recall."""
    bands = _minhash_bands(d)
    return (
        bands.groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > cap)
    )


@register(
    "dedup_minhash_pairs",
    "dedup",
    f"MinHash-LSH candidate pairs: {BANDS} bands x {ROWS_PER_BAND} rows; docs whose "
    "signatures collide in any band become candidates (the scalable near-dup "
    "reduction: explode to (band, key), one self-join shuffle, distinct pairs). "
    f"Buckets over {BUCKET_CAP} docs are salt-re-bucketed with an anchor doc "
    "(bounded pairs, connectivity preserved).",
    oracle=_MH_PAIRS_ORACLE,
    bench=True,
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # Lazy-pin the signature table: the band table is consumed twice
    # (bucket stats + join back) and each consumption re-ran the whole
    # scan->tokenize->md5->groupBy chain (plan showed the subtree
    # duplicated; ReuseExchange can't fire across the differing
    # projections). The lazy pin materializes inside the first action
    # and the second consumer reads it back — no blocking driver job,
    # one signature pass (census 18 -> 14 stages).
    sig = _pin(minhash_signatures(d), eager=False)
    return minhash_lsh_pairs(d, sig=sig)


def _minhash_bands(d: DataFrame, sig: DataFrame | None = None) -> DataFrame:
    # ``sig``: a precomputed (typically pinned) signature table. The
    # band table is consumed twice by every caller (bucket stats + the
    # join back), and without a pinned sig each consumption re-runs the
    # whole scan->tokenize->md5->groupBy chain (no ReuseExchange: the
    # two subtrees project differently).
    if sig is None:
        sig = minhash_signatures(d)
    for j, col in enumerate(_band_key_cols()):
        sig = sig.withColumn(f"band_{j}", col)
    pairs = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("band"), F.col(f"band_{j}").alias("bkey"))
                    for j in range(BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
    return pairs


# --------------------------------------------------------------------------
# n-gram Jaccard (verification stage)
# --------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
sh AS (SELECT doc_id, list_distinct({sql_word_shingles('t', SHINGLE_N)}) AS s FROM tok)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
              len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND a.doc_id % 97 = b.doc_id % 97
"""


@register(
    "dedup_ngram_jaccard",
    "dedup",
    f"BLOCKED DEMO of the exact {SHINGLE_N}-gram Jaccard verify kernel: "
    "the mod-97 blocking here samples ~1/97 of all pairs purely to keep "
    "this standalone registration oracle-checkable — it is NOT the "
    "production candidate generator and must not be benchmarked as the "
    "verify stage. The production path is dedup_verified_pairs / "
    "pipeline_corpus_clean, where the SAME set-arithmetic kernel "
    "(native array expressions) scores only MinHash-LSH candidate "
    "pairs.",
    oracle=_JACCARD_ORACLE,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    sh = d.select(
        "doc_id",
        F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_N)).alias("s"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_distinct(F.array_intersect(F.col("a.s"), F.col("b.s"))))
    union = F.size(F.array_distinct(F.concat(F.col("a.s"), F.col("b.s"))))
    return (
        a.join(
            b,
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.doc_id") % 97 == F.col("b.doc_id") % 97),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            fround(inter * F.lit(1.0) / union, 6).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_SIMHASH_CTE = f"""
tok AS (SELECT doc_id, unnest(list_distinct({sql_tokens('text')})) AS tk FROM documents),
h AS (SELECT doc_id, {sql_md5_int32('tk')} AS hv FROM tok),
v AS (SELECT doc_id, i, sum(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS i) g
      GROUP BY doc_id, i),
sim AS (SELECT doc_id,
               CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
        FROM v GROUP BY doc_id)"""

_SIMHASH_ORACLE = f"""
WITH {_SIMHASH_CTE}
SELECT * FROM sim
"""


def _simhash_df(d: DataFrame) -> DataFrame:
    """32-bit SimHash per doc: explode distinct tokens, per-bit votes,
    majority sign -> bit. One groupBy(doc_id) shuffle with map-side
    combine; skew-free (keys are doc ids)."""
    from spark_stream_kudu_spark.session import spread_small_scan

    toks = spread_small_scan(d.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("tk")
    )
    h = toks.select("doc_id", md5_int32(F.col("tk")).alias("hv"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("hv").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    sim_expr = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(SIMHASH_BITS)
        ],
    )
    return votes.select("doc_id", sim_expr.cast("long").alias("simhash"))


@register(
    "dedup_simhash",
    "dedup",
    f"{SIMHASH_BITS}-bit SimHash signatures: per-token md5 hash, per-bit majority "
    "vote (explode + groupBy with map-side combine).",
    oracle=_SIMHASH_ORACLE,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_df(_docs(spark, sf_dir))


_SIMHASH_PAIRS_ORACLE = f"""
WITH {_SIMHASH_CTE},
bands AS (
  SELECT doc_id, simhash, j, (simhash >> (8 * j)) & 255 AS bkey
  FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) g
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b
  ON a.j = b.j AND a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
"""


@register(
    "dedup_simhash_pairs",
    "dedup",
    "Hamming-LSH near-dup pairs over SimHash: band the 32-bit signature into 4 "
    "bytes, self-join on any equal byte (pigeonhole: hamming<=6 pairs often share "
    "a byte), verify exact Hamming distance via bit_count(xor).",
    oracle=_SIMHASH_PAIRS_ORACLE,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = _simhash_df(_docs(spark, sf_dir))
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.shiftright(F.col("simhash"), 8 * j)
                        .bitwiseAND(F.lit(255))
                        .alias("bkey"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.j").alias("j"), F.col("bb.bkey").alias("bkey"))
    a, b = bands.alias("a"), bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(hamming <= 6)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
    )


# --------------------------------------------------------------------------
# Embedding-cosine near-dup
# --------------------------------------------------------------------------

_EMB_COS_ORACLE = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       floor((list_dot_product(a.v, b.v) /
              (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))))
             * 1000000 + 0.5) / 1000000 AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE (list_dot_product(a.v, b.v) /
       (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) > 0.3
"""


@register(
    "dedup_embedding_cosine",
    "dedup",
    "Embedding-cosine near-dup pairs with label blocking (in production: LSH or IVF "
    "cluster blocking) — double-precision dot products as native array expressions.",
    oracle=_EMB_COS_ORACLE,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.vectors import cosine_similarity

    tune_session(spark)
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("embedding").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("embedding").alias("vb")
    )
    cos = cosine_similarity(F.col("va"), F.col("vb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .filter(cos > 0.3)
        .select("vec_a", "vec_b", fround(cos, 6).alias("cosine"))
    )


# --------------------------------------------------------------------------
# Composed near-dup pipeline: LSH candidates -> exact-Jaccard verify
# --------------------------------------------------------------------------

JACCARD_THRESHOLD = 0.5

_VERIFIED_ORACLE = f"""
WITH {_sql_minhash_cte()},
{_sql_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sh2 AS (
  SELECT doc_id, list_distinct({sql_word_shingles(sql_tokens('text'), SHINGLE_N)}) AS s
  FROM documents
),
v AS (
  SELECT c.doc_a, c.doc_b,
         floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
                len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM cand c JOIN sh2 a ON a.doc_id = c.doc_a JOIN sh2 b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_verified_pairs",
    "dedup",
    "The composed near-dup pipeline: MinHash-LSH candidate generation -> exact "
    f"{SHINGLE_N}-gram Jaccard verification -> threshold {JACCARD_THRESHOLD}. "
    "The verify join touches only LSH candidates (near-output-size), never "
    "all pairs — the full production flow (generate cheap, verify exact) as "
    "one declared query.",
    oracle=_VERIFIED_ORACLE,
)
def dedup_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # ONE corpus tokenize+shingle pass for the whole query: the lazy
    # pinned shingle table feeds BOTH the signature chain (min over hashed
    # distinct shingles is bit-identical to min over all occurrences —
    # see minhash_signatures_from_shingles) and the two exact-verify
    # sides; the lazy pinned signature table stops the band table's double
    # consumption (bucket stats + join back) re-running the chain.
    # Before: four tokenize passes per run (census 9 jobs / 23 stages /
    # 102 tasks -> 7 / 16 / 69). Lazy pins (pin(eager=False)), not
    # eager: an eager pin's barrier serialized work that overlaps on
    # idle cores (measured losing — the section-12 recall-curve
    # lesson); lazy keeps the compute-once cut and the mode seam.
    sh = _pin(shingle_table(d), eager=False)
    sig = _pin(minhash_signatures_from_shingles(sh), eager=False)
    cand = minhash_lsh_pairs(d, sig=sig)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_distinct(F.concat(F.col("sa"), F.col("sb"))))
    jac = fround(inter * F.lit(1.0) / union, 6)
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# --------------------------------------------------------------------------
# Asymmetric containment (sub/superset detection over LSH candidates)
# --------------------------------------------------------------------------

# Containment C(A,B) = |shingles(A) n shingles(B)| / |shingles(A)| —
# catches "document A is quoted/embedded inside B" even when Jaccard is
# low because B is much larger. Classification threshold:
CONTAINMENT_THRESHOLD = 0.5

_CONTAIN_ORACLE = f"""
WITH {_sql_minhash_cte()},
{_sql_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sh2 AS (
  SELECT doc_id, list_distinct({sql_word_shingles(sql_tokens('text'), SHINGLE_N)}) AS s
  FROM documents
),
c AS (
  SELECT c.doc_a, c.doc_b,
         floor(len(list_intersect(a.s, b.s)) * 1.0 / len(a.s)
               * 1000000 + 0.5) / 1000000 AS containment_a,
         floor(len(list_intersect(a.s, b.s)) * 1.0 / len(b.s)
               * 1000000 + 0.5) / 1000000 AS containment_b
  FROM cand c JOIN sh2 a ON a.doc_id = c.doc_a JOIN sh2 b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, containment_a, containment_b,
       CASE WHEN containment_a >= {CONTAINMENT_THRESHOLD}
             AND containment_b >= {CONTAINMENT_THRESHOLD} THEN 'mutual'
            WHEN containment_a >= {CONTAINMENT_THRESHOLD} THEN 'a_in_b'
            ELSE 'b_in_a' END AS relation
FROM c
WHERE greatest(containment_a, containment_b) >= {CONTAINMENT_THRESHOLD}
"""


@register(
    "dedup_containment",
    "dedup",
    "Asymmetric shingle containment over MinHash-LSH candidates: "
    "C(A,B) = |A n B| / |A| in both directions, classifying pairs as "
    "mutual near-dups or sub/superset inclusions (a quoted or embedded "
    "document that symmetric Jaccard under-scores because the host is "
    "much larger). Same generate-cheap/verify-exact shape as "
    "dedup_verified_pairs: the exact set arithmetic touches only the "
    "LSH candidate pairs, never all pairs — 100 TB-safe by the same "
    "bucket-cap argument.",
    oracle=_CONTAIN_ORACLE,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # Shared lazy pinned shingle/signature pass — same restructure and
    # rationale as dedup_verified_pairs (one corpus tokenize instead of
    # four).
    sh = _pin(shingle_table(d), eager=False)
    sig = _pin(minhash_signatures_from_shingles(sh), eager=False)
    cand = minhash_lsh_pairs(d, sig=sig)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    ca = fround(inter * F.lit(1.0) / F.size("sa"), 6)
    cb = fround(inter * F.lit(1.0) / F.size("sb"), 6)
    thr = F.lit(CONTAINMENT_THRESHOLD)
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
    )
    relation = (
        F.when(
            (F.col("containment_a") >= thr) & (F.col("containment_b") >= thr),
            "mutual",
        )
        .when(F.col("containment_a") >= thr, "a_in_b")
        .otherwise("b_in_a")
    )
    return scored.filter(
        F.greatest("containment_a", "containment_b") >= thr
    ).select("doc_a", "doc_b", "containment_a", "containment_b", relation.alias("relation"))


# --------------------------------------------------------------------------
# Dedup clusters: connected components over verified pairs (iterative)
# --------------------------------------------------------------------------

_MAX_CC_ITERATIONS = 15

# Reliable-checkpoint wiring (env var + lineage-cut policy) lives in
# functions/lineage.py, shared with the PageRank loop in graph.py.
_RELIABLE_CKPT_ENV = RELIABLE_CKPT_ENV
_CKPT_INTERVAL = CKPT_INTERVAL


def propagate_min_labels(
    labels: DataFrame,
    edges: DataFrame,
    max_iter: int = _MAX_CC_ITERATIONS,
    reliable_checkpoint: bool = False,
    checkpoint_interval: int = _CKPT_INTERVAL,
) -> DataFrame:
    """Connected components via iterative min-label propagation.

    ``labels``: (node, lab) initial labels; ``edges``: (src, dst),
    directed (callers pass both directions). Converges in O(diameter)
    rounds; raises RuntimeError if labels are still changing after
    ``max_iter`` rounds — a too-deep component must fail loudly, not
    silently return wrong cluster ids.

    With ``reliable_checkpoint`` (requires ``setCheckpointDir``), every
    ``checkpoint_interval``-th round uses a reliable checkpoint instead
    of ``localCheckpoint``, bounding recomputation on executor loss.
    """

    def _cut_lineage(df: DataFrame, round_no: int) -> DataFrame:
        # Lazy cut (round-11): the per-round convergence probe below is
        # the materializing action — the old eager cut ran the same
        # computation as a separate blocking job first (2 jobs -> 1).
        return cut_lineage(
            df, round_no, reliable_checkpoint, checkpoint_interval, eager=False
        )

    converged = False
    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"))
        )
        new_labels = _cut_lineage(new_labels, i)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected-components did not converge in {max_iter} rounds; "
            "a component with min-label eccentricity beyond the bound would "
            "otherwise yield wrong cluster ids — raise max_iter"
        )
    return labels

# Shared CTE body: minhash sigs -> LSH bands -> verified edges ->
# recursive reachability. Reused by the composed corpus-clean pipeline.
_CC_CTE_BODY = f"""{_sql_minhash_cte()},
{_sql_bands_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sh2 AS (
  SELECT doc_id, list_distinct({sql_word_shingles(sql_tokens('text'), SHINGLE_N)}) AS s
  FROM documents
),
verified AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sh2 a ON a.doc_id = c.doc_a JOIN sh2 b ON b.doc_id = c.doc_b
  WHERE (len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
         len(list_distinct(list_concat(a.s, b.s)))) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM verified
  UNION ALL SELECT doc_b, doc_a FROM verified
),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
)"""

_CLUSTERS_ORACLE = f"""
WITH RECURSIVE {_CC_CTE_BODY}
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
"""


@register(
    "dedup_clusters",
    "dedup",
    "Connected components over the verified near-dup graph: iterative "
    "min-label propagation (Spark DataFrame loop, converges in O(diameter) "
    "rounds, raises loudly on non-convergence; set "
    f"{_RELIABLE_CKPT_ENV} for reliable checkpoints every few rounds at "
    "cluster scale). The oracle is a recursive CTE over the same edges — an "
    "iterative algorithm still hash-checked end-to-end. Singleton docs are "
    "their own cluster.",
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    pairs = dedup_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    # The edge set is reused every iteration — materialize it once
    # instead of recomputing the whole LSH+verify pipeline per round.
    edges = _pin(edges)
    labels = d.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("lab"))
    labels = propagate_min_labels(
        labels, edges, reliable_checkpoint=configure_reliable_checkpoints(spark)
    )
    return labels.select(F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id"))


# --------------------------------------------------------------------------
# Composed corpus-clean pipeline (the flagship end-to-end extension op)
# --------------------------------------------------------------------------

_MIN_QUALITY_E4 = 5000  # keep docs with quality_score >= 0.5
_MIN_TOKENS = 10

_CLEAN_ORACLE = f"""
WITH RECURSIVE {{cc_body}},
clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
q AS (
  SELECT doc_id, n_tokens,
         CAST(floor(quality_score * 10000 + 0.5) AS BIGINT) AS quality_e4
  FROM ({{quality_sql}})
),
joined AS (
  SELECT d.doc_id, d.source, c.cluster_id, q.quality_e4, q.n_tokens
  FROM documents d
  JOIN clusters c ON c.doc_id = d.doc_id
  JOIN q ON q.doc_id = d.doc_id
),
rep AS (
  SELECT *, row_number() OVER (
    PARTITION BY cluster_id ORDER BY quality_e4 DESC, doc_id ASC
  ) AS rk
  FROM joined
),
kept AS (
  SELECT * FROM rep
  WHERE rk = 1 AND quality_e4 >= {_MIN_QUALITY_E4} AND n_tokens >= {_MIN_TOKENS}
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       CAST(sum(quality_e4) AS BIGINT) AS quality_e4_sum
FROM kept
GROUP BY source
"""


@register(
    "pipeline_corpus_clean",
    "dedup",
    "The composed training-corpus cleaning pipeline, end to end in one "
    "declared query: MinHash-LSH near-dup clusters -> highest-quality "
    "representative per cluster (window argmax, deterministic tie-break) -> "
    "quality + length filters -> per-source corpus stats. Every stage is "
    "an already-oracle-checked operator (dedup_clusters, text_quality); "
    "this proves they COMPOSE, hash-checked against a single recursive-CTE "
    "DuckDB oracle. At 100 TB the cluster step checkpoints per iteration "
    "and everything downstream is one shuffle per keyed stage on shrinking "
    "data.",
    oracle=_CLEAN_ORACLE.format(
        cc_body=_CC_CTE_BODY,
        quality_sql=__import__(
            "spark_stream_kudu_spark.operators.text", fromlist=["_QUALITY_ORACLE"]
        )._QUALITY_ORACLE,
    ),
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from spark_stream_kudu_spark.operators.text import text_quality

    d = _docs(spark, sf_dir)
    clusters = dedup_clusters(spark, sf_dir)
    q = text_quality(spark, sf_dir).select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("quality_score") * 10000 + 0.5).cast("long").alias("quality_e4"),
    )
    joined = (
        d.select("doc_id", "source")
        .join(clusters, "doc_id")
        .join(q, "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_e4").desc(), F.col("doc_id").asc()
    )
    kept = (
        joined.withColumn("rk", F.row_number().over(w))
        .filter(
            (F.col("rk") == 1)
            & (F.col("quality_e4") >= _MIN_QUALITY_E4)
            & (F.col("n_tokens") >= _MIN_TOKENS)
        )
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
        F.sum("quality_e4").alias("quality_e4_sum"),
    )


# --------------------------------------------------------------------------
# Prefix-filtered EXACT set-similarity join (PPJoin-style)
# --------------------------------------------------------------------------

_PREFIX_ORACLE = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
sh AS (SELECT doc_id, list_distinct({sql_word_shingles('t', SHINGLE_N)}) AS s FROM tok),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.doc_a, c.doc_b,
         floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
                len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_prefix_filter",
    "dedup",
    f"EXACT Jaccard-threshold (>= {JACCARD_THRESHOLD}) set-similarity self-"
    "join via PPJoin-style prefix filtering — the exact-recall counterpart "
    "to the probabilistic MinHash-LSH path (dedup_verified_pairs can miss a "
    "qualifying pair; this cannot). Shingles are globally ordered rarest-"
    "first by document frequency; a doc only probes on its prefix (the "
    "|S| - ceil(t*|S|) + 1 rarest shingles), which provably covers every "
    "pair with J >= t; a size filter (t*|A| <= |B| <= |A|/t) and PPJoin's "
    "positional filter (overlap upper bound at the pair's first shared "
    "shingle — prunes 60% of surviving candidates on this corpus) drop "
    "the rest before the exact verify. The oracle is the obviously-"
    "correct spec: candidates = every pair sharing ANY shingle (complete "
    "for any t > 0), then exact Jaccard.",
    oracle=_PREFIX_ORACLE,
)
def dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style exact similarity join (Xiao et al., WWW'08 — public).

    Scale design (100 TB): the document-frequency table is the shingle
    vocabulary — joined (AQE picks broadcast vs sort-merge by its actual
    size), never collected. Prefix probing inverts the usual skew story:
    the GLOBAL rarest-first order puts precisely the lowest-df shingles
    into prefixes, so per-shingle join fanout is anti-correlated with
    popularity; residual hot prefixes (boilerplate-heavy corpora) are
    AQE skew-split. Shuffles: df groupBy, per-doc re-sort groupBy, the
    prefix equi-join, and the two verify joins — all on keys, no
    all-pairs stage anywhere. The reference
    (src/main/python/kafka_to_kudu.py) has no dedup surface; this
    extends the declared contract (SURVEY.md §2.4).
    """
    return prefix_filter_pairs(_docs(spark, sf_dir), JACCARD_THRESHOLD)


def prefix_filter_pairs(d: DataFrame, t: float) -> DataFrame:
    """Exact J >= t pairs of ``(doc_id, text)`` rows via prefix filtering."""
    # Spread the corpus across every core BEFORE tokenizing (the
    # dominant per-row cost — one unsplittable scan partition would
    # serialize it on a single task; no-op at real scale, see
    # session.spread_small_scan). Measured 18.4s -> 6.3s at sf0.1.
    from spark_stream_kudu_spark.session import spread_small_scan

    d = spread_small_scan(d.select("doc_id", "text"))
    sh = d.select(
        "doc_id",
        F.array_distinct(word_shingles(tokens(F.col("text")), SHINGLE_N)).alias("s"),
    )
    # The exploded (doc, shingle) stream feeds BOTH the document-
    # frequency rollup and the rarest-first re-sort, and ReuseExchange
    # does not dedupe the subtrees (measured: 0 ReusedExchange, the
    # corpus tokenized per consumer) — pin it once. This is the
    # inverted-index materialization every dedup pipeline stores
    # anyway; at 100 TB it trades one local write for a repeated
    # full-corpus tokenize+shingle pass. Lazy (round-11): both pins'
    # consumers live in the query's final job, so the first action
    # materializes them in place — two blocking driver barriers
    # removed (census 10 jobs / 130 tasks -> 8 / 92, results equal).
    ex = _pin(sh.select("doc_id", F.explode("s").alias("g")), eager=False)
    df_counts = ex.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    # Rarest-first total order (df, then shingle text) — identical for
    # every document, which is what the prefix-filter guarantee needs.
    # `ranked` is consumed THREE times (prefix probe + both verify
    # sides) — pinned for the same reason as `ex` (the docstring's
    # "runs once" claim is made literal by the checkpoint; without it
    # the whole scan->tokenize->df->sort chain re-ran per consumer:
    # 8 corpus scans measured for this one query).
    ranked = _pin(
        ex.join(df_counts, "g")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "g"))).alias("ordered"))
        .select(
            "doc_id",
            F.transform("ordered", lambda x: x["g"]).alias("os"),
            F.size("ordered").alias("n"),
        ),
        eager=False,
    )
    # Probe prefix: |S| - ceil(t*|S|) + 1 rarest shingles. J(A,B) >= t
    # forces |A n B| >= t*max(|A|,|B|), so two qualifying prefixes must
    # intersect; anything missed here would contradict the overlap bound.
    prefix_len = (F.col("n") - F.ceil(F.col("n") * F.lit(t)) + 1).cast("int")
    pe = ranked.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("os", 1, prefix_len)).alias("pos", "g"),
    )
    a, b = pe.alias("a"), pe.alias("b")
    matches = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(
            (F.col("b.n") >= F.ceil(F.col("a.n") * F.lit(t)))
            & (F.col("a.n") >= F.ceil(F.col("b.n") * F.lit(t)))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
    )
    # PPJoin positional filter: at the pair's globally-FIRST shared
    # shingle (min by prefix position — valid because both lists carry
    # the same global order, so no shared shingle precedes it), the
    # overlap can't exceed 1 + min(tokens after it on each side). A
    # qualifying pair needs overlap >= t/(1+t) * (|A|+|B|), so pairs
    # whose bound falls short are pruned BEFORE the exact verify join —
    # the filter only ever drops non-qualifying candidates (the
    # completeness property test fuzzes this). The epsilon guards float
    # rounding of the threshold; the bound itself is exact integers.
    first = matches.groupBy("doc_a", "doc_b").agg(
        F.min(F.struct("pa", "pb", "na", "nb")).alias("m")
    )
    ubound = F.lit(1) + F.least(
        F.col("m.na") - F.col("m.pa") - 1, F.col("m.nb") - F.col("m.pb") - 1
    )
    alpha = F.lit(t / (1.0 + t)) * (F.col("m.na") + F.col("m.nb"))
    cand = first.where(ubound + F.lit(1e-9) >= alpha).select("doc_a", "doc_b")
    # Verify against the ORDERED shingle arrays from `ranked`, not a
    # re-derivation of `sh` from raw text: intersection size is
    # order-independent and `os` is distinct, so |A u B| = |A| + |B| -
    # |A n B| (inclusion-exclusion — no union array ever built). Reusing
    # `ranked` (checkpointed above) serves the probe and both verify
    # sides from one materialization — the scan + tokenize + shingle +
    # df-rank work runs ONCE (ReuseExchange was measured NOT to dedupe
    # the identical subplans, so the pin is what actually saves the
    # repeated corpus passes at 100 TB).
    ra = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("os").alias("sa"),
        F.col("n").alias("na"),
    )
    rb = ranked.select(
        F.col("doc_id").alias("doc_b"), F.col("os").alias("sb"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = fround(inter * F.lit(1.0) / (F.col("na") + F.col("nb") - inter), 6)
    return (
        cand.join(ra, "doc_a")
        .join(rb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= F.lit(t))
    )


# --------------------------------------------------------------------------
# LSH recall evaluation against the EXACT prefix-filter ground truth
# --------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH {_sql_minhash_cte()},
{_sql_bands_cte()},
lcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
dsh AS (
  SELECT doc_id, list_distinct({sql_word_shingles(sql_tokens('text'), SHINGLE_N)}) AS s
  FROM documents
),
lv AS (
  SELECT c.doc_a, c.doc_b,
         floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
                len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM lcand c JOIN dsh a ON a.doc_id = c.doc_a JOIN dsh b ON b.doc_id = c.doc_b
),
lsh_pairs AS (SELECT doc_a, doc_b FROM lv WHERE jaccard >= {JACCARD_THRESHOLD}),
pex AS (SELECT doc_id, unnest(s) AS g FROM dsh),
pcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM pex a JOIN pex b ON a.g = b.g AND a.doc_id < b.doc_id
),
pv AS (
  SELECT c.doc_a, c.doc_b,
         floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
                len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM pcand c JOIN dsh a ON a.doc_id = c.doc_a JOIN dsh b ON b.doc_id = c.doc_b
),
true_pairs AS (SELECT doc_a, doc_b FROM pv WHERE jaccard >= {JACCARD_THRESHOLD}),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS c
  FROM true_pairs t JOIN lsh_pairs l ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b
)
SELECT 'minhash_lsh' AS method,
       CAST((SELECT count(*) FROM true_pairs) AS BIGINT) AS n_true_pairs,
       CAST((SELECT count(*) FROM lsh_pairs) AS BIGINT) AS n_found_pairs,
       (SELECT c FROM hits) AS n_hits,
       floor(((SELECT c FROM hits) * 1.0 /
              (SELECT count(*) FROM true_pairs)) * 1000000 + 0.5) / 1000000 AS recall
"""


@register(
    "dedup_recall_eval",
    "dedup",
    f"MinHash-LSH recall audit against EXACT ground truth: the verified "
    f"LSH pipeline (dedup_verified_pairs) scored against the complete "
    f"J >= {JACCARD_THRESHOLD} pair set from the prefix-filter join "
    "(dedup_prefix_filter) — the production quality dial for banding "
    "parameters. Verified-LSH precision is 1.0 by construction (every "
    "emitted pair is exact-verified), so the number that matters is "
    "recall; banding theory predicts it from (bands, rows) and this "
    "query MEASURES it. Mirrors sim_recall_eval's exact-vs-approx "
    "pattern, now for dedup.",
    oracle=_RECALL_ORACLE,
)
def dedup_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both arms are already-registered oracle-checked queries; this
    proves they compose. All three counts come from ONE full-outer join
    of the two pair sets, so each arm's pipeline is instantiated once in
    the plan (not once per aggregate) — at 100 TB the comparison costs
    one join of two near-output-sized sets, and the corpus is scanned
    only by the arms. (Verified-LSH pairs are provably a subset of the
    exact set; n_found_pairs is still counted independently so a
    violation would surface as n_found > n_hits.)"""
    exact = dedup_prefix_filter(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_exact")
    )
    approx = dedup_verified_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_lsh")
    )
    both = exact.join(approx, ["doc_a", "doc_b"], "full_outer")
    return both.agg(
        F.count("in_exact").alias("n_true_pairs"),
        F.count("in_lsh").alias("n_found_pairs"),
        F.count(F.when(F.col("in_exact").isNotNull() & F.col("in_lsh").isNotNull(), 1)).alias("n_hits"),
    ).select(
        F.lit("minhash_lsh").alias("method"),
        "n_true_pairs",
        "n_found_pairs",
        "n_hits",
        fround(F.col("n_hits") * F.lit(1.0) / F.col("n_true_pairs"), 6).alias(
            "recall"
        ),
    )


# --------------------------------------------------------------------------
# Contrastive training triplets from exact near-dup pairs
# --------------------------------------------------------------------------

_TRIPLET_ORACLE = f"""
WITH tok AS (SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
sh AS (SELECT doc_id, list_distinct({sql_word_shingles('t', SHINGLE_N)}) AS s FROM tok),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
),
v AS (
  SELECT c.doc_a, c.doc_b,
         floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
                len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000 AS jaccard
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
),
pos AS (SELECT doc_a, doc_b, jaccard FROM v WHERE jaccard >= {JACCARD_THRESHOLD}),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT doc_a AS anchor, doc_b AS positive,
       CASE
         WHEN (doc_a * 31 + doc_b) % n_docs NOT IN (doc_a, doc_b)
           THEN (doc_a * 31 + doc_b) % n_docs
         WHEN ((doc_a * 31 + doc_b) + 1) % n_docs NOT IN (doc_a, doc_b)
           THEN ((doc_a * 31 + doc_b) + 1) % n_docs
         ELSE ((doc_a * 31 + doc_b) + 2) % n_docs
       END AS negative,
       jaccard
FROM pos CROSS JOIN n
"""


@register(
    "pipeline_contrastive_triplets",
    "pipeline",
    "Contrastive-training triplet construction: every EXACT near-dup "
    f"pair (prefix-filter ground truth, J >= {JACCARD_THRESHOLD}) "
    "becomes an (anchor, positive) pair, and the negative is a "
    "deterministic modular pick over the dense doc-id space, stepped "
    "past collisions — the embedding-model training-data op (simCSE-"
    "style positives from near-dups, uniform negatives), reproducible "
    "bit-for-bit so the oracle can check it. In production negatives "
    "come from a hash-bucketed sample of the anchor's shard (same "
    "expression shape); hard-negative mining composes with "
    "sim_topk_* on the anchor embedding.",
    oracle=_TRIPLET_ORACLE,
)
def pipeline_contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    pos = dedup_prefix_filter(spark, sf_dir)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    c0 = (F.col("doc_a") * 31 + F.col("doc_b")) % F.col("n_docs")
    c1 = (F.col("doc_a") * 31 + F.col("doc_b") + 1) % F.col("n_docs")
    c2 = (F.col("doc_a") * 31 + F.col("doc_b") + 2) % F.col("n_docs")
    hit = lambda c: (c != F.col("doc_a")) & (c != F.col("doc_b"))  # noqa: E731
    return pos.crossJoin(F.broadcast(n)).select(  # bounded: 1-row count
        F.col("doc_a").alias("anchor"),
        F.col("doc_b").alias("positive"),
        F.when(hit(c0), c0).when(hit(c1), c1).otherwise(c2).alias("negative"),
        "jaccard",
    )


# --------------------------------------------------------------------------
# Incremental LSH maintenance: new-batch docs vs the existing index
# --------------------------------------------------------------------------

_INCR_LSH_ORACLE = f"""
WITH {_sql_minhash_cte()},
{_sql_bands_cte()},
cand AS (
  SELECT DISTINCT nb.doc_id AS n, ob.doc_id AS m
  FROM bands nb JOIN bands ob
    ON nb.band = ob.band AND nb.bkey = ob.bkey
  WHERE nb.doc_id % 4 = 3 AND ob.doc_id <> nb.doc_id
    AND (ob.doc_id % 4 <> 3 OR ob.doc_id < nb.doc_id)
),
sh2 AS (
  SELECT doc_id, list_distinct({sql_word_shingles(sql_tokens('text'), SHINGLE_N)}) AS s
  FROM documents
)
SELECT c.n AS doc_id, c.m AS matched_doc,
       floor((len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
              len(list_distinct(list_concat(a.s, b.s)))) * 1000000 + 0.5) / 1000000
         AS jaccard
FROM cand c JOIN sh2 a ON a.doc_id = c.n JOIN sh2 b ON b.doc_id = c.m
WHERE (len(list_distinct(list_intersect(a.s, b.s))) * 1.0 /
       len(list_distinct(list_concat(a.s, b.s)))) >= {JACCARD_THRESHOLD} - 1e-12
"""


@register(
    "pipeline_incremental_lsh",
    "pipeline",
    "Incremental near-dup index maintenance: an arriving batch (doc_id "
    "% 4 = 3 stands in for today's crawl) is checked against the "
    "EXISTING signature index plus earlier arrivals within the batch — "
    "new-doc bands join the full band table, so candidate generation "
    "touches only buckets containing a new doc and existing-vs-"
    "existing pairs are NEVER re-enumerated. That asymmetry is the "
    "whole point at 100 TB: daily dedup cost scales with the batch, "
    "not the corpus (the batch twin of dedup_verified_pairs, whose "
    "full-corpus pass runs once at bootstrap). Candidates verify with "
    "the exact Jaccard kernel at the same threshold; output is every "
    "(new doc, earlier match) pair — min(matched_doc) per doc is the "
    "canonical dup-of decision. A production deployment applies the "
    "same bucket-cap salting as minhash_lsh_pairs to the band join; "
    "at fixture scale buckets sit under the cap (pinned by "
    "test_fixture_buckets_below_cap) so the uncapped join is exact "
    "here, keeping the oracle an equality check.",
    oracle=_INCR_LSH_ORACLE,
)
def pipeline_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # Both band-join sides and both verify sides re-ran the full
    # scan->tokenize->minhash chain (ReuseExchange dedupes none of it;
    # 4 corpus scans measured). One lazy pinned shingle pass now feeds the
    # signature chain AND the verify sides (bit-identical — min over
    # distinct shingles, see minhash_signatures_from_shingles), and the
    # lazy pinned signature table serves both band-join sides; the band
    # explode itself is a scan-local projection of the cut. In
    # production shingles and signatures ARE stored tables (the index
    # this query maintains), so the pins mirror the deployment exactly.
    # Census 10 jobs / 134 tasks -> 7 / 100; A/B min 2.10 -> 1.59 s.
    sh = _pin(shingle_table(d), eager=False)
    sig = _pin(minhash_signatures_from_shingles(sh), eager=False)
    bands = _minhash_bands(d, sig=sig)
    is_new = F.col("doc_id") % 4 == 3
    nb = bands.filter(is_new).select(
        F.col("doc_id").alias("n"), "band", "bkey"
    )
    ob = bands.select(F.col("doc_id").alias("m"), "band", "bkey")
    cand = (
        nb.join(ob, ["band", "bkey"])
        .filter(
            (F.col("m") != F.col("n"))
            & ((F.col("m") % 4 != 3) | (F.col("m") < F.col("n")))
        )
        .select("n", "m")
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("n"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("m"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.array_distinct(F.concat(F.col("sa"), F.col("sb"))))
    raw = inter * F.lit(1.0) / union
    return (
        cand.join(a, "n")
        .join(b, "m")
        .filter(raw >= JACCARD_THRESHOLD - 1e-12)
        .select(
            F.col("n").alias("doc_id"),
            F.col("m").alias("matched_doc"),
            fround(raw, 6).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Edit-distance verify over LSH candidates (entity-resolution stage)
# --------------------------------------------------------------------------

# Levenshtein on full documents is O(len_a * len_b) per pair — hostile at
# corpus scale AND unnecessary: near-dup candidates that agree nowhere in
# their first _EDIT_CLIP chars are not the record-linkage case this stage
# exists for. Clipping bounds per-pair cost to a constant, so the verify
# stage's total cost is O(|candidates|), same as the Jaccard verify.
_EDIT_CLIP = 120
_EDIT_SIM_THRESHOLD = 0.4

_EDIT_ORACLE = f"""
WITH {{mh}},
{{bands}},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
clip AS (
  SELECT doc_id, substr(text, 1, {_EDIT_CLIP}) AS t FROM documents
),
v AS (
  SELECT c.doc_a, c.doc_b,
         CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
         CAST(greatest(length(a.t), length(b.t)) AS BIGINT) AS max_len
  FROM cand c JOIN clip a ON a.doc_id = c.doc_a
              JOIN clip b ON b.doc_id = c.doc_b
)
SELECT doc_a, doc_b, edit_dist,
       {sql_fround('1.0 - edit_dist * 1.0 / max_len', 6)} AS edit_sim,
       (edit_dist * 1.0 / max_len <= {1 - _EDIT_SIM_THRESHOLD}) AS is_match
FROM v
"""


@register(
    "dedup_edit_distance",
    "dedup",
    "Entity-resolution verify stage: exact Levenshtein edit distance over "
    "the MinHash-LSH candidate pairs (never all pairs), on a "
    f"{_EDIT_CLIP}-char clip so per-pair cost is a constant and the "
    "stage stays O(|candidates|) — the record-linkage / fuzzy-match "
    "counterpart to the set-based Jaccard verify (typo-level edits move "
    "edit similarity smoothly where shingle Jaccard cliffs). Emits every "
    "candidate with its distance, normalized similarity and match flag, "
    "so downstream thresholds are a filter, not a re-scan. Native JVM "
    "levenshtein in Spark, same function in DuckDB; candidate join is "
    "two broadcast-sized hash joins against the clipped projection.",
    oracle=_EDIT_ORACLE.format(mh=_sql_minhash_cte(), bands=_sql_bands_cte()),
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    # Lazy-pin signatures — same band-table double-consumption fix as
    # dedup_minhash_pairs (the verify here reads clips, not shingles,
    # so only the signature cut applies).
    cand = minhash_lsh_pairs(
        d, sig=_pin(minhash_signatures(d), eager=False)
    )
    clip = d.select("doc_id", F.substring("text", 1, _EDIT_CLIP).alias("t"))
    a = clip.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    b = clip.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    dist = F.levenshtein(F.col("ta"), F.col("tb")).cast("long")
    max_len = F.greatest(F.length("ta"), F.length("tb")).cast("long")
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            dist.alias("edit_dist"),
            fround(1.0 - dist * F.lit(1.0) / max_len, 6).alias("edit_sim"),
            (dist * F.lit(1.0) / max_len <= F.lit(1 - _EDIT_SIM_THRESHOLD)).alias(
                "is_match"
            ),
        )
    )


# --------------------------------------------------------------------------
# Golden-record selection (the entity-resolution merge step)
# --------------------------------------------------------------------------

_GOLDEN_ORACLE = f"""
WITH RECURSIVE {_CC_CTE_BODY},
clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
),
j AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars,
         CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
           AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT doc_id, cluster_id, cluster_size,
       CAST(min(CASE WHEN rk = 1 THEN doc_id END)
            OVER (PARTITION BY cluster_id) AS BIGINT) AS golden_id,
       (rk = 1) AS is_golden
FROM j
"""


@register(
    "dedup_golden_record",
    "dedup",
    "Entity-resolution merge step: every near-dup cluster (connected "
    "component over the LSH->verified pair graph, reusing "
    "dedup_clusters) elects ONE golden record — the most complete "
    "member (max n_chars, min doc_id tiebreak) — and every document "
    "maps to (entity, golden, is_golden). This is the survivorship "
    "policy a dedup pipeline applies after matching: keep the golden "
    "doc, redirect the rest. Cost beyond clustering is one window pass "
    "over |docs| keyed by cluster id; singletons are their own golden "
    "record. Oracle replays the same election over DuckDB's recursive "
    "component closure.",
    oracle=_GOLDEN_ORACLE,
)
def dedup_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    clusters = dedup_clusters(spark, sf_dir)
    j = clusters.join(d.select("doc_id", "n_chars"), "doc_id")
    wc = Window.partitionBy("cluster_id")
    rk = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
    )
    out = j.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(wc).cast("long").alias("cluster_size"),
        rk.alias("rk"),
    )
    return out.select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.min(F.when(F.col("rk") == 1, F.col("doc_id")))
        .over(wc)
        .cast("long")
        .alias("golden_id"),
        (F.col("rk") == 1).alias("is_golden"),
    )


# --------------------------------------------------------------------------
# Connected components via large-star/small-star contraction
# --------------------------------------------------------------------------

_STAR_MAX_ROUNDS = 12


def _canon_pairs(e: DataFrame) -> DataFrame:
    """Undirected edge set normalized to (a < b), deduplicated."""
    return (
        e.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )


def star_contraction_components(
    d: DataFrame, pairs: DataFrame, max_rounds: int = _STAR_MAX_ROUNDS
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (the O(log n)-round MapReduce CC algorithm): each round
    rewires every node toward the minimum of its neighborhood, so
    component depth roughly HALVES per round — a path graph that costs
    O(diameter) rounds under min-label propagation costs O(log n) here.
    Rounds are two grouped aggregations + joins over the edge list;
    convergence = the canonical edge set reaching a fixed point (then
    every edge touches its component's minimum, and labels read off in
    one pass). Raises if the fixed point is not reached in
    ``max_rounds`` — wrong cluster ids must never ship silently."""
    canon = _pin(_canon_pairs(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ))

    def _digest(e: DataFrame) -> tuple[int, int]:
        """(row count, order-independent xxhash64 checksum) in one
        1-row aggregate job over the checkpointed edge set — the cheap
        NECESSARY condition for the fixed point; never trusted alone
        (a colliding checksum must not end the loop early), only used
        to skip the exact set-equality join on rounds that visibly
        still moved."""
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                # decimal(38,0) sum: exact and overflow-free under ANSI
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return int(r["n"]), int(r["h"])

    prev_digest = _digest(canon)
    converged = False
    # Per-node neighborhood minimum as a WINDOW over the edge list
    # partitioned by u (round-11): the min-groupBy + join-back pair
    # needed one exchange for the aggregate AND one for re-attaching
    # the result to every edge row; a min().over(partitionBy(u))
    # computes the same per-u minimum and attaches it in the SAME
    # exchange (guide §2.4 — a window keyed like the aggregation it
    # follows needs no second shuffle), and the edge list is scanned
    # once instead of twice. Min over a partition equals min over the
    # grouped set, so every per-round edge set — and therefore the
    # digest trajectory and the fixed point — is unchanged.
    from pyspark.sql import Window

    w_u = Window.partitionBy("u")
    for i in range(max_rounds):
        e = _sym(canon)
        # large-star: every neighbor v > u rewires to min({u} u N(u)).
        # The window runs over ALL of N(u) (before the v > u filter),
        # exactly like the old m_all aggregate.
        large = (
            e.withColumn("mu", F.least(F.col("u"), F.min("v").over(w_u)))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("mu").alias("b"))
        )
        # Normalize large-star output WITHOUT a distinct(): the only
        # consumers are min-windows in the small-star step, and min
        # over a multiset equals min over its set — duplicate edges
        # change no result. Saves one full shuffle per round; the
        # round's OUTPUT (new_canon) still deduplicates, so the
        # fixed-point set equality is unaffected.
        e2 = _sym(
            large.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            ).filter(F.col("a") != F.col("b"))
        )
        # small-star: neighbors v < u (and u itself) rewire to
        # min({u} u {v in N(u): v < u}). The windowed ``lesser`` rows
        # carry (v, mu) directly; the per-u row the old m_less union
        # branch added is the distinct (u, mu) projection — computed
        # under the window's own hash(u) partitioning, so the distinct
        # adds no exchange.
        lw = e2.filter(F.col("v") < F.col("u")).withColumn(
            "mu", F.least(F.col("u"), F.min("v").over(w_u))
        )
        small = (
            lw.select(F.col("v").alias("a"), F.col("mu").alias("b"))
            .unionByName(
                lw.select("u", "mu")
                .distinct()
                .select(F.col("u").alias("a"), F.col("mu").alias("b"))
            )
        )
        new_canon = _canon_pairs(
            small.select(F.col("a").alias("u"), F.col("b").alias("v"))
        )
        # Lazy cut (round-11): the digest aggregate below is the
        # round's materializing action — the old eager cut ran the
        # same computation as a separate blocking job first.
        new_canon = cut_lineage(new_canon, i, False, local_interval=1, eager=False)
        # Fixed-point test, two tiers (was two exceptAll count jobs per
        # round): a 1-row digest aggregate rules out rounds that still
        # moved; only a digest match runs the EXACT set-equality check —
        # one full-outer join on the edge key (both sides are canonical
        # distinct sets, so a missing row on either side is the only
        # way they differ). Convergence is never declared on the
        # checksum alone.
        new_digest = _digest(new_canon)
        same = False
        if new_digest == prev_digest:
            mismatch = (
                new_canon.withColumn("_l", F.lit(1))
                .join(
                    canon.withColumn("_r", F.lit(1)), ["a", "b"], "full_outer"
                )
                .filter(F.col("_l").isNull() | F.col("_r").isNull())
                .limit(1)
            )
            same = mismatch.count() == 0
        prev_digest = new_digest
        canon = new_canon
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"star contraction did not reach a fixed point in {max_rounds} rounds"
        )
    # At the fixed point every edge is (component_min, member):
    # label(x) = min(x, min neighbor); untouched nodes are singletons.
    lab = (
        _sym(canon)
        .groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(
            F.col("u").alias("doc_id"),
            F.least(F.col("u"), F.col("mv")).alias("cluster_id"),
        )
    )
    return (
        d.select("doc_id")
        .join(lab, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        )
    )


@register(
    "dedup_clusters_starcontraction",
    "dedup",
    "Connected components over the SAME verified near-dup graph as "
    "dedup_clusters, by alternating large-star/small-star contraction — "
    "the O(log n)-round algorithm (each round halves component depth by "
    "rewiring every node toward its neighborhood minimum) vs min-label "
    "propagation's O(diameter) rounds. On a 100 TB web/citation graph "
    "whose components can be long chains, the round count is the "
    "wall-clock: log2(n) rounds beat diameter rounds by orders of "
    "magnitude. Fixed point detected on the canonical edge set; "
    "identical (doc_id, cluster_id) contract and SAME recursive-CTE "
    "oracle as the propagation variant, so both algorithms are "
    "hash-pinned to the same answer.",
    oracle=_CLUSTERS_ORACLE,
)
def dedup_clusters_starcontraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    pairs = dedup_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return star_contraction_components(d, pairs)


# --------------------------------------------------------------------------
# LSH tuning curve: measured recall/candidate cost per (bands, rows)
# --------------------------------------------------------------------------

# Each config re-bands the SAME 12 minhash values, so the measured curve
# isolates the banding choice: more bands x fewer rows = higher recall
# AND more candidates (the S-curve steepens left), and this query
# reports where each configuration actually lands on THIS corpus —
# the measurement behind choosing (b, r), instead of trusting the
# 1-(1-s^r)^b formula's assumptions.
_TUNE_CONFIGS = ((2, 6), (3, 4), (4, 3), (6, 2))


def _tune_bands_sql(b: int, r: int) -> str:
    return (
        " UNION ALL ".join(
            f"SELECT doc_id, {j} AS band, md5(concat_ws('_', "
            + ", ".join(f"mh_{j * r + k}" for k in range(r))
            + ")) AS bkey FROM sig"
            for j in range(b)
        )
    )


def _tune_oracle() -> str:
    arms = []
    for b, r in _TUNE_CONFIGS:
        arms.append(
            f"""(
  WITH bands{b} AS ({_tune_bands_sql(b, r)}),
  cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands{b} a JOIN bands{b} b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
  )
  SELECT {b} AS bands, {r} AS rows_per_band,
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
         CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
         CAST((SELECT count(*) FROM cand c
               JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
              AS BIGINT) AS n_found
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM {a} arm{i}" for i, a in enumerate(arms))
    return f"""
WITH {_sql_minhash_cte()},
truth AS ({_PREFIX_ORACLE.strip()})
SELECT bands, rows_per_band, n_candidates, n_truth, n_found,
       CAST(n_found * 1000000 // n_truth AS BIGINT) AS recall_x1e6
FROM ({union})
"""


@register(
    "dedup_lsh_tuning_curve",
    "dedup",
    "LSH tuning curve: the SAME 12 minhash values re-banded at (2,6), "
    "(3,4), (4,3) and (6,2), each configuration measured for candidate "
    "count and recall against the EXACT Jaccard >= 0.5 ground truth "
    "(dedup_prefix_filter, zero false negatives) — the S-curve in "
    "practice, on this corpus, instead of the 1-(1-s^r)^b formula's "
    "idealized assumptions. This is the measurement a deployment runs "
    "on a corpus sample before fixing production (b, r): recall you "
    "need vs candidate volume you can afford. On THIS fixture the "
    "curve is flat (its near-dups are near-identical, so every arm "
    "scores full recall with zero spurious candidates — a bimodal "
    "similarity distribution, itself a corpus finding); on a crawl "
    "corpus with mid-similarity mass the arms separate, which is what "
    "the harness exists to show. Signatures compute once; "
    "each arm is one band explode + self-join + two counts; ground "
    "truth computes once and broadcasts into every arm's intersection.",
    oracle=_tune_oracle(),
)
def dedup_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    sig = _pin(minhash_signatures(d))
    truth = _pin(
        dedup_prefix_filter(spark, sf_dir)
        .select("doc_a", "doc_b")
    )
    n_truth_df = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    out = None
    for b, r in _TUNE_CONFIGS:
        keyed = sig.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    "_",
                                    *[F.col(f"mh_{j * r + k}") for k in range(r)],
                                )
                            ).alias("bkey"),
                        )
                        for j in range(b)
                    ]
                )
            ).alias("bb"),
        ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))
        a = keyed.select(
            F.col("doc_id").alias("doc_a"), F.col("band").alias("ba"), F.col("bkey").alias("ka")
        )
        bb = keyed.select(
            F.col("doc_id").alias("doc_b"), F.col("band").alias("bbd"), F.col("bkey").alias("kb")
        )
        cand = (
            a.join(
                bb,
                (F.col("ba") == F.col("bbd"))
                & (F.col("ka") == F.col("kb"))
                & (F.col("doc_a") < F.col("doc_b")),
            )
            .select("doc_a", "doc_b")
            .distinct()
        )
        found = cand.join(truth, ["doc_a", "doc_b"]).agg(
            F.count(F.lit(1)).cast("long").alias("n_found")
        )
        n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        arm = (
            n_cand.crossJoin(F.broadcast(n_truth_df))  # bounded: 1-row truth count
            .crossJoin(F.broadcast(found))  # bounded: 1-row hit count
            .select(
                F.lit(b).cast("int").alias("bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_candidates",
                "n_truth",
                "n_found",
                F.expr("n_found * 1000000 div n_truth")
                .cast("long")
                .alias("recall_x1e6"),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# --------------------------------------------------------------------------
# Exact-substring duplication audit (Lee et al. 2022, Spark-first)
# --------------------------------------------------------------------------

_SUBSTR_K = 8  # span width in tokens; production corpora use ~50

_SUBSTR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
), g AS (
  SELECT doc_id,
         unnest(generate_series(1, greatest(len(t) - {_SUBSTR_K} + 1, 0))) AS pos,
         unnest(list_transform(
           generate_series(1, greatest(len(t) - {_SUBSTR_K} + 1, 0)),
           i -> {sql_md5_int32(f"array_to_string(t[i:i+{_SUBSTR_K - 1}], ' ')")}
         )) AS gh
  FROM tok
), dup AS (
  SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
), hits AS (
  SELECT doc_id, pos, pos + {_SUBSTR_K} AS e FROM g JOIN dup USING (gh)
), uni AS (
  SELECT doc_id, pos, e,
         max(e) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM hits
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS dup_spans,
         CAST(sum(greatest(0, e - greatest(pos, coalesce(pmax, 0)))) AS BIGINT)
           AS dup_tokens
  FROM uni GROUP BY doc_id
)
SELECT tok.doc_id,
       CAST(len(tok.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.dup_spans, 0) AS BIGINT) AS dup_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(coalesce(p.dup_tokens, 0) * 1000000 // len(tok.t) AS BIGINT)
         AS dup_frac_x1e6
FROM tok LEFT JOIN per_doc p ON tok.doc_id = p.doc_id
"""


@register(
    "dedup_exact_substring",
    "dedup",
    f"Exact-substring duplication audit at {_SUBSTR_K}-token span "
    "granularity (the Lee et al. 2022 'Deduplicating Training Data "
    "Makes Language Models Better' operation, re-expressed Spark-first: "
    "a hash aggregation over fixed-width token spans replaces the "
    "suffix array — same spans found, embarrassingly parallel instead "
    "of a global sort). Every doc's token spans fingerprint row-locally "
    f"(sequence/transform/slice + md5_int32, no explode until the span "
    "table); a span held by >= 2 DISTINCT docs is duplicated text, and "
    "each doc reports its duplicated-span count plus the number of "
    "TOKENS covered by at least one duplicated span — an exact interval "
    "union via one running-max window per doc (gaps-and-islands), not "
    "an approximation — and the integer-exact duplicated fraction in "
    "micro-units. This is the span-level complement to the doc-level "
    "MinHash family: it tells you WHICH text to cut (boilerplate, "
    "licenses, templated spans) rather than which documents pair up. "
    "At 100 TB the one heavy shuffle is the span-hash aggregation "
    "(|tokens| rows of (hash, doc) pairs, partial-agg map-side); "
    "within-doc work never shuffles, and the audit runs on 32-bit span "
    "fingerprints in both engines so the oracle is exact.",
    oracle=_SUBSTR_ORACLE,
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    d = spread_small_scan(_docs(spark, sf_dir).select("doc_id", "text"))
    return substr_audit_from_spans(substr_spans(d), substr_doc_sizes(d))


def substr_spans(d: DataFrame) -> DataFrame:
    """(doc_id, pos, gh) span-fingerprint rows of ``(doc_id, text)``
    rows: md5_int32 of each _SUBSTR_K-token window. Fingerprints stay
    row-local until the single explode; docs shorter than k tokens
    contribute no spans (empty array)."""
    k = _SUBSTR_K
    base = d.select("doc_id", tokens(F.col("text")).alias("t"))
    gh = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - k),
            lambda i: md5_int32(F.concat_ws(" ", F.slice(F.col("t"), i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return base.select(
        "doc_id", F.posexplode(gh).alias("pos0", "gh")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gh")


def substr_doc_sizes(d: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) for every document (including the short ones
    that contribute no spans — they still appear in the audit)."""
    return d.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )


def substr_audit_from_spans(g: DataFrame, sizes: DataFrame) -> DataFrame:
    """The span-level duplication audit given ANY validly-derived
    (doc_id, pos, gh) span table and (doc_id, n_tokens) sizes — the
    batch scan (dedup_exact_substring) or an incrementally-accumulated
    span store (stream_substring_audit_e2e): the audit is a pure
    function of the span fingerprints, so raw text never needs to be
    rescanned. A span in >= 2 distinct docs is duplicated text;
    coverage is the exact interval union per doc."""
    k = _SUBSTR_K
    dup = (
        g.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    hits = g.join(dup, "gh", "left_semi").select(
        "doc_id", "pos", (F.col("pos") + k).alias("e")
    )
    per_doc = interval_union_per_key(hits, "doc_id", "pos", "e").select(
        "doc_id",
        F.col("n_intervals").alias("dup_spans"),
        F.col("union_len").alias("dup_tokens"),
    )
    return (
        sizes.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_spans"), F.lit(0)).cast("long").alias("dup_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.expr("coalesce(dup_tokens, 0) * 1000000 div n_tokens")
            .cast("long")
            .alias("dup_frac_x1e6"),
        )
    )


def interval_union_per_key(
    iv: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Exact length of the union of half-open [start, end) intervals per
    key, in ONE running-max window pass (gaps-and-islands): each
    interval contributes the part of itself past the running maximum of
    all earlier ends — overlaps are never double-counted, contained
    intervals contribute 0. Requires non-negative integer bounds; returns
    (key, n_intervals, union_len). One shuffle on the key, O(1) state
    per row — the scale shape for span-coverage/occupancy audits."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(start), F.col(end))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.greatest(
        F.lit(0).cast("long"),
        F.col(end)
        - F.greatest(F.col(start), F.coalesce(F.max(end).over(w), F.lit(0))),
    )
    return (
        iv.select(key, contrib.alias("c"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("c").cast("long").alias("union_len"),
        )
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup): trained-cluster blocking + centroid-distance
# keep-priority (Abbas et al. 2023, arXiv:2303.09540)
# --------------------------------------------------------------------------

# Pair-test threshold tau = 2/5 as an exact rational: cos(i,j) >= 2/5
# <=> dot > 0 AND 25*dot^2 >= 4*|i|^2*|j|^2 over the q8-quantized
# integer vectors — both engines evaluate the identical integers, so
# the decision is bit-reproducible. Production SemDeDup runs tau ~0.95+
# on real web corpora; the synthetic fixture's within-cluster cosines
# top out at ~0.47/0.51/0.60 (sf0.001/0.01/0.1), so 2/5 is the
# fixture-pinned value that exercises the prune at every scale
# (20/26/277 of 500/500/2000 members pruned).
_SEM_TAU_NUM = 2
_SEM_TAU_DEN = 5
_SEM_SCALE = 256  # q8 component quantization: keeps 25*dot^2 in BIGINT
# Loud contract: |x8|^2 summed over 64 dims stays under 2^26 (components
# |x| <= 4.0) so 25*dot^2 <= 25*2^52 ~ 1.1e17 and 4*n8_i*n8_j <= 1.8e16
# both fit BIGINT exactly — a fixture violating it fails the job instead
# of silently wrapping (the bitmap kernel's assert pattern,
# sketches.py:591).
_SEM_N8_BOUND = 1 << 26


def _sem_oracle() -> str:
    from spark_stream_kudu_spark.operators.similarity import _DIM, _KMEANS_CTES

    dot = (
        f"list_sum(list_transform(generate_series(1,{_DIM}),"
        " t -> i.x8[t]*j.x8[t]))"
    )
    return f"""
WITH {_KMEANS_CTES},
c2 AS (
  SELECT cid,
         list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY pos) AS cq
  FROM u2 GROUP BY cid
),
a3d AS (
  SELECT vec_id, cid, d FROM (
    SELECT v.vec_id, c.cid,
           list_sum(list_transform(generate_series(1, {_DIM}),
                     i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) AS d,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, {_DIM}),
                       i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) ASC,
                      c.cid ASC) AS rn
    FROM vq v CROSS JOIN c2 c
  ) WHERE rn = 1
),
v8 AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(x*{_SEM_SCALE}) AS BIGINT)) AS x8
  FROM embeddings
),
m AS (
  SELECT a.vec_id, a.cid, a.d, v8.x8,
         list_sum(list_transform(v8.x8, x -> x*x)) AS n8
  FROM a3d a JOIN v8 USING(vec_id)
),
dom AS (
  SELECT j.vec_id, count(*) AS n_dominators
  FROM m i JOIN m j ON i.cid = j.cid
    AND (i.d > j.d OR (i.d = j.d AND i.vec_id < j.vec_id))
  WHERE {dot} > 0
    AND {_SEM_TAU_DEN * _SEM_TAU_DEN}*{dot}*{dot}
        >= {_SEM_TAU_NUM * _SEM_TAU_NUM}*i.n8*j.n8
  GROUP BY j.vec_id
)
SELECT m.vec_id,
       CAST(m.cid AS BIGINT) AS cluster_id,
       CAST(m.d AS BIGINT) AS cdist_q20,
       CAST(COALESCE(dom.n_dominators, 0) AS BIGINT) AS n_dominators,
       CAST(CASE WHEN dom.n_dominators IS NOT NULL THEN 1 ELSE 0 END
            AS BIGINT) AS pruned
FROM m LEFT JOIN dom USING(vec_id)
"""


def _sem_prepare(spark: SparkSession, sf_dir: str) -> None:
    from spark_stream_kudu_spark.operators.similarity import trained_codebook

    trained_codebook(spark, sf_dir)


@register(
    "dedup_semantic",
    "dedup",
    "SemDeDup semantic dedup: assign every vector to its TRAINED Lloyd "
    "cluster (the sim_topk_ivf_trained codebook, cached per fixture "
    "fingerprint), rank members by exact integer squared-L2 distance to "
    "their centroid, and prune any member tau-cosine-similar (tau=2/5, "
    "exact rational over q8-quantized integers) to a higher-priority "
    "member of the SAME cluster — priority = farthest-from-centroid "
    "first (the paper keeps the LOW-centroid-similarity representative), "
    "ties to the lower vec_id. Output: the full per-vector decision "
    "(cluster, centroid distance, dominator count, pruned flag), never "
    "just the removals, so the oracle checks every keep AND every prune.",
    oracle=_sem_oracle(),
    prepare=_sem_prepare,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup, Spark-shaped. At 100 TB: the codebook is trained once
    per index build (cached + prepare-warmed, the supply_table pattern)
    and broadcast as literal arrays; quantization, assignment, and the
    q8 self-norms are scan-local codegen'd expressions; the ONLY pair
    space is the within-cluster self-join keyed on cid — k scales with
    the corpus so per-cluster membership stays bounded, and the
    dominated-rule pair test (dot products as zip_with folds) never
    leaves the joined row. One cid-keyed shuffle each side + one
    keyed count + one left join back to the member table (pinned with
    an eager localCheckpoint: 3 consumers, trained assignment computed
    once). Cluster skew follows the LSH-bucket story: AQE skew-join,
    or a bucket cap if a production corpus degenerates.

    Decision rule (deterministic, not sequential-greedy): member j is
    pruned iff SOME higher-priority member i of its cluster has
    cos(i,j) >= tau. All arithmetic is exact integers, so the result is
    invariant under partitioning and matches DuckDB bit-for-bit."""
    from spark_stream_kudu_spark.operators.similarity import (
        _km_quantize,
        km_assign_dist,
        trained_codebook,
    )

    from spark_stream_kudu_spark.session import spread_small_scan

    tune_session(spark)
    # Spread the one-file embeddings scan BEFORE the CPU-heavy
    # row-local work (quantize + assignment + q8 norms) AND the pair
    # join that inherits its partitioning: the pinned member table
    # keeps the scan's partition count, so an unspread scan ran the
    # within-cluster pair decision (interpreted HOF dot products —
    # the query's dominant cost) on a fraction of the cores. Measured
    # 3.99 s -> 1.84 s min-of-3 at sf0.1 (results identical); no-op at
    # real scale where the table arrives in many splits.
    e = spread_small_scan(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )
    cents = trained_codebook(spark, sf_dir)
    assigned = km_assign_dist(_km_quantize(e), cents)
    n8_guarded = F.expr(
        f"COALESCE(CAST(assert_true(n8 <= {_SEM_N8_BOUND}, 'dedup_semantic: "
        "embedding magnitude violates the q8 overflow contract "
        f"(n8 > 2^26)') AS BIGINT), n8)"
    )
    m = _pin(
        assigned.select(
            "vec_id",
            F.col("cid").cast("long").alias("cluster_id"),
            F.col("cdist").alias("cdist_q20"),
            F.transform(
                "embedding",
                lambda x: F.floor(x * F.lit(float(_SEM_SCALE))).cast("long"),
            ).alias("x8"),
        )
        .withColumn(
            "n8",
            F.aggregate(
                F.transform("x8", lambda v: v * v),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        )
        .withColumn("n8", n8_guarded)
        # 3 consumers (both self-join sides + the final left join):
        # pin the trained assignment once, the stored-table stand-in
        # pattern (this IS the persisted cluster-membership table of a
        # real SemDeDup deployment).
    )
    return semantic_decision(spark, m, m.count())


def semantic_decision(
    spark: SparkSession, m: DataFrame, n_members: int
) -> DataFrame:
    """The SemDeDup dominated-rule decision over a member table
    ``(vec_id, cluster_id, cdist_q20, x8, n8)`` — the reusable kernel
    behind ``dedup_semantic`` (hypothesis-tested against a pure-Python
    mirror on arbitrary member tables, including cdist ties, zero
    vectors, and negative components, in tests/test_properties.py).

    The member table is typically a statless checkpoint, so the cid
    self-join would default to sort-merge over only |k| distinct keys.
    Gate the dominator side instead (``n_members`` is the caller's
    row count — free when m is materialized): dimension-scale corpora
    broadcast, web-scale corpora fall back to a shuffled hash join (no
    sort either way). ~1.2 KB/row for the two 64-long arrays."""
    from spark_stream_kudu_spark.functions.joins import gated_broadcast

    i = gated_broadcast(
        m.select(
            F.col("vec_id").alias("i_id"),
            F.col("cluster_id").alias("i_cid"),
            F.col("cdist_q20").alias("i_d"),
            F.col("x8").alias("i_x8"),
            F.col("n8").alias("i_n8"),
        ),
        n_members,
        spark,
        bytes_per_row=1200,
    )
    j = m.select(
        F.col("vec_id").alias("j_id"),
        F.col("cluster_id").alias("j_cid"),
        F.col("cdist_q20").alias("j_d"),
        F.col("x8").alias("j_x8"),
        F.col("n8").alias("j_n8"),
    )
    dot = F.aggregate(
        F.zip_with("i_x8", "j_x8", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    dom = (
        i.join(
            j,
            (F.col("i_cid") == F.col("j_cid"))
            & (
                (F.col("i_d") > F.col("j_d"))
                | ((F.col("i_d") == F.col("j_d")) & (F.col("i_id") < F.col("j_id")))
            ),
        )
        .withColumn("dot", dot)
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(_SEM_TAU_DEN * _SEM_TAU_DEN) * F.col("dot") * F.col("dot")
                >= F.lit(_SEM_TAU_NUM * _SEM_TAU_NUM) * F.col("i_n8") * F.col("j_n8")
            )
        )
        .groupBy(F.col("j_id").alias("vec_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_dominators"))
    )
    return (
        m.select("vec_id", "cluster_id", "cdist_q20")
        # dom has at most one 16-byte row per member — same gate, so the
        # decorate join is a broadcast (or shuffled hash at web scale),
        # never a sort-merge over statless checkpoint output.
        .join(gated_broadcast(dom, n_members, spark, bytes_per_row=16), "vec_id", "left")
        .select(
            "vec_id",
            "cluster_id",
            "cdist_q20",
            F.coalesce("n_dominators", F.lit(0).cast("long")).alias("n_dominators"),
            (F.coalesce("n_dominators", F.lit(0).cast("long")) > 0)
            .cast("long")
            .alias("pruned"),
        )
    )
