"""Physical-layout operators: bucketed co-located joins.

Generalizes the reference's hash-partitioned storage contract
(ddl/create_impala_kudu_table.sql:14 — ``PARTITION BY HASH PARTITIONS
4``) from a sink property into a join strategy: facts written bucketed
by their join key join with ZERO exchanges (asserted in
tests/test_plans.py::test_bucketed_join_is_shuffle_free).
"""

from __future__ import annotations

import atexit
import datetime
import glob
import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.bucketed import write_bucketed
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.functions.lineage import pin as _pin
from spark_stream_kudu_spark.functions.rounding import idiv

NUM_BUCKETS = 8  # test scale; at 100 TB size so max bucket file ~<=1 GB


_SWEPT_DEAD_DIRS = False


def _sweep_dead_bucketed_dirs() -> None:
    """Remove bucketed-warehouse dirs left by DEAD processes.

    Each process writes its bucketed copy under a pid-unique dir (see
    bucketed_pair); without a sweep every pytest/bench run would leave
    a full lineitem+orders copy in /tmp forever. A dir is reclaimed
    only when its embedded pid no longer exists (kill(pid, 0) fails),
    so a concurrently RUNNING process's copy is never touched — the
    no-clobber property the pid-unique scheme exists for. Registered
    work also cleans up after THIS process at exit. Runs once per
    process: the glob + liveness probes are cheap but bucketed_pair
    sits inside timed bench regions."""
    global _SWEPT_DEAD_DIRS
    if _SWEPT_DEAD_DIRS:
        return
    _SWEPT_DEAD_DIRS = True
    pattern = os.path.join(tempfile.gettempdir(), "ssk_bucketed_*_*")
    for path in glob.glob(pattern):
        pid_part = path.rsplit("_", 1)[-1]
        if not pid_part.isdigit() or int(pid_part) == os.getpid():
            continue
        try:
            os.kill(int(pid_part), 0)
        except ProcessLookupError:
            shutil.rmtree(path, ignore_errors=True)
        except PermissionError:
            # Pid exists but belongs to another user — leave it alone.
            pass
        except OverflowError:
            # All-digit suffix beyond the C pid range (a malformed or
            # adversarial /tmp name) — not a live pid of ours; skip it
            # rather than crash every process's sweep.
            pass


@atexit.register
def _cleanup_own_bucketed_dirs() -> None:
    own = os.path.join(
        tempfile.gettempdir(), f"ssk_bucketed_*_{os.getpid()}"
    )
    for path in glob.glob(own):
        shutil.rmtree(path, ignore_errors=True)


def bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """lineitem + orders from ``sf_dir``, both bucketed by order key.

    Idempotent per (process, sf_dir): the bucketed copy is written once
    into a session-temp warehouse and reused — mirroring the real
    deployment where bucketing is a write-time layout decision amortized
    over many queries.
    """
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    # The reuse check (catalog.tableExists) is PER-PROCESS, so a shared
    # path would buy nothing across processes while letting a second
    # process's mode("overwrite") clobber files a first process is
    # actively reading (the race class _promote_staging closes for the
    # parquet caches; saveAsTable binds table metadata to the path, so
    # staging+rename does not compose with it). A pid-unique warehouse
    # dir gives each process its own copy — same amortization, no race.
    base = os.path.join(
        tempfile.gettempdir(), f"ssk_bucketed_{tag}_{os.getpid()}"
    )
    _sweep_dead_bucketed_dirs()
    names = {}
    for tbl, keys in (("lineitem", ["l_orderkey"]), ("orders", ["o_orderkey"])):
        name = f"ssk_{tbl}_{tag}"
        path = os.path.join(base, tbl)
        if not spark.catalog.tableExists(name):
            write_bucketed(
                load_table(spark, sf_dir, tbl), name, path, keys, NUM_BUCKETS
            )
        names[tbl] = name
    return spark.table(names["lineitem"]), spark.table(names["orders"])


_Q55_ORACLE = """
SELECT o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT)
         AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderpriority
"""


@register(
    "q55_bucketed_join",
    "layout",
    "Fact-to-fact join on pre-bucketed tables: lineitem and orders stored "
    f"hash-bucketed+sorted by order key ({NUM_BUCKETS} buckets), so the join "
    "needs NO exchange and NO sort — bucket i of each side streams through a "
    "merge join. The write-once shuffle is amortized over every later join "
    "on the key, the bucketed analog of the reference's PARTITION BY HASH "
    "sink (ddl:14). Results identical to the unbucketed plan; only the "
    "physical layout differs.",
    oracle=_Q55_ORACLE,
    bench=True,
    prepare=lambda spark, sf_dir: bucketed_pair(spark, sf_dir) and None,
)
def q55_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = bucketed_pair(spark, sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
                .cast("long")
            ).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Date-partitioned layout -> partition-pruned scans
# --------------------------------------------------------------------------


def partitioned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events from ``sf_dir`` re-laid-out hive-partitioned by event date.

    Written once per (process, sf_dir) and reused. At 100 TB this is the
    standard time-series layout: a predicate on the partition column
    prunes whole directories at planning time (PartitionFilters in the
    scan), so a one-day query touches 1/Nth of the files no matter how
    large the table grows.
    """
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_part_events_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn("event_date", F.to_date("ts"))
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(staging)
        )
        _promote_staging(staging, path, marker)
    return spark.read.parquet(path)


_Q58_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4
FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts <  TIMESTAMP '2024-01-15 00:00:00'
GROUP BY event_type
"""


@register(
    "q58_partitioned_scan",
    "layout",
    "One-week aggregate over a date-partitioned event log: the predicate "
    "lands on the hive partition column, so planning prunes to 7 date "
    "directories (PartitionFilters, asserted in test_plans) and the "
    "executors never open the other files. Identical results to scanning "
    "the unpartitioned table (the oracle's form) — only IO differs.",
    oracle=_Q58_ORACLE,
    prepare=lambda spark, sf_dir: partitioned_events(spark, sf_dir) and None,
)
def q58_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = partitioned_events(spark, sf_dir)
    return (
        ev.filter(
            (F.col("event_date") >= F.lit("2024-01-08").cast("date"))
            & (F.col("event_date") < F.lit("2024-01-15").cast("date"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_e4"),
        )
    )


# --------------------------------------------------------------------------
# Z-order (Morton) clustering: multi-dimensional data skipping
# --------------------------------------------------------------------------

_Z_BITS = 8  # per-dimension bits after normalization; 16-bit code
_Z_EPOCH = "1995-01-01"  # day-number origin for the date dimension
_Z_FILES = 8


def _morton(a, b):
    """Interleave the low _Z_BITS bits of integer columns a (odd
    positions) and b (even positions) — a native Catalyst expression
    tree (2*_Z_BITS shift/mask terms, JVM-side, codegen-friendly);
    monotone in each input within a fixed other-input, which is what
    makes range predicates on either dimension prunable."""
    code = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        code = code.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i)
        )
    return code


def _zbucket(col, mn: int, mx: int):
    """Monotone map of [mn, mx] onto the 2^_Z_BITS bucket grid. Without
    this normalization the wider dimension's high bits dominate the
    interleave and the layout degrades to a single-column sort."""
    span = max(mx - mn + 1, 1)
    # Integral div (round-11): col is integer and col >= mn, so the
    # bucket id is exact long arithmetic — the old double route was
    # exact only below 2^53 and its rounding could (harmlessly but
    # needlessly) fuzz bucket boundaries. Same values on any input the
    # double form computed exactly, and strictly monotone either way.
    return idiv((col - F.lit(mn)) * (1 << _Z_BITS), span)


def zordered_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders re-laid-out Z-ordered on (o_custkey, order day).

    Each dimension is first normalized onto an equal-width bucket grid
    from its write-time min/max (one tiny agg — the stats pass every
    OPTIMIZE ZORDER implementation runs), then rows are range-
    partitioned and sorted by the Morton interleave, so each output file
    covers a compact RECTANGLE of (custkey, day) space and its parquet
    min/max footer stats prune 2-D box queries — the data-skipping
    layout for workloads that filter on BOTH dimensions, where a
    single-column sort only helps one. Written once per (process,
    sf_dir) and reused.
    """
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_zorder_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        o = load_table(spark, sf_dir, "orders")
        day = F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH).cast("date"))
        stats = o.agg(
            F.min("o_custkey").alias("cmn"),
            F.max("o_custkey").alias("cmx"),
            F.min(day).alias("dmn"),
            F.max(day).alias("dmx"),
        ).collect()[0]
        zcode = _morton(
            _zbucket(F.col("o_custkey"), stats.cmn, stats.cmx),
            _zbucket(day, stats.dmn, stats.dmx),
        )
        # INT96 timestamps carry no parquet min/max stats — write micros
        # so the date dimension is actually skippable from footers.
        prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            (
                o.withColumn("zcode", zcode)
                .repartitionByRange(_Z_FILES, "zcode")
                .sortWithinPartitions("zcode")
                .drop("zcode")
                .write.mode("overwrite")
                .parquet(staging)
            )
        finally:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
        _promote_staging(staging, path, marker)
    return spark.read.parquet(path)


_Q85_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_custkey BETWEEN 32 AND 95
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderpriority
"""


@register(
    "q85_zorder_scan",
    "layout",
    "2-D box query (custkey range x one order year) over the Z-ordered "
    "orders layout: rows are clustered by the Morton interleave of "
    "(o_custkey, order day), so every file covers a compact rectangle of "
    "the 2-D key space and parquet min/max stats skip files the box "
    "misses — on EITHER predicate dimension, which a single-column sort "
    "cannot give (clustering quality asserted from the real file footers "
    "in tests/test_plans.py). Results identical to scanning the plain "
    "table (the oracle's form); only IO differs. At 100 TB this is the "
    "lakehouse OPTIMIZE ZORDER pattern: one layout write amortized over "
    "every multi-dimensional slice query.",
    oracle=_Q85_ORACLE,
    bench=True,
    prepare=lambda spark, sf_dir: zordered_orders(spark, sf_dir) and None,
)
def q85_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = zordered_orders(spark, sf_dir)
    return (
        o.filter(
            F.col("o_custkey").between(32, 95)
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents"),
        )
    )


# --------------------------------------------------------------------------
# IVF-cluster-partitioned embedding layout: ANN probe as partition pruning
# --------------------------------------------------------------------------

_IVF_LAYOUT_MOD = 50  # must match similarity.IVF_MOD's construction


def ivf_partitioned_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings re-laid-out hive-partitioned by IVF cluster id.

    The 'cluster id becomes a partition key' half of the ANN scale
    story made physical: probing a query's inverted list is then a
    PLANNING-TIME partition prune (PartitionFilters), not a post-scan
    filter — a top-k probe reads 1/|centroids| of the files no matter
    how big the corpus grows. Assignment is the same deterministic
    nearest-centroid construction the sim_topk_ivf oracle mirrors.
    Written once per (process, sf_dir) and reused.
    """
    from spark_stream_kudu_spark.functions.vectors import cosine_similarity
    from spark_stream_kudu_spark.functions.rounding import fround

    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_ivfpart_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from pyspark.sql import Window

        e = load_table(spark, sf_dir, "embeddings")
        cent = e.filter(F.col("vec_id") % _IVF_LAYOUT_MOD == 0).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
        )
        csim = fround(cosine_similarity(F.col("embedding"), F.col("cv")), 6)
        w = Window.partitionBy("vec_id").orderBy(
            F.col("csim").desc(), F.col("cid").asc()
        )
        # |corpus|/_IVF_LAYOUT_MOD centroids scale with the corpus:
        # size-gate the broadcast (footer row count, no job) instead of
        # forcing it past any threshold (round-12).
        from spark_stream_kudu_spark.functions.joins import gated_broadcast
        from spark_stream_kudu_spark.sources.tables import table_num_rows

        n_cent = table_num_rows(sf_dir, "embeddings") // _IVF_LAYOUT_MOD + 1
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        (
            e.crossJoin(gated_broadcast(cent, n_cent, spark))
            .select("vec_id", "embedding", "label", "cid", csim.alias("csim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "label", F.col("cid").alias("cluster"))
            .write.mode("overwrite")
            .partitionBy("cluster")
            .parquet(staging)
        )
        _promote_staging(staging, path, marker)
    return spark.read.parquet(path)


_Q96_ORACLE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {_IVF_LAYOUT_MOD} = 0),
assign0 AS (
  SELECT e.vec_id, cent.cid,
         floor(((list_dot_product(e.v, cent.cv) /
                 (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cent.cv, cent.cv)))))
               * 1000000 + 0.5) / 1000000 AS csim
  FROM e CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
    FROM assign0
  ) WHERE rn = 1
)
SELECT CAST(a.cid AS BIGINT) AS cluster,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(min(a.vec_id) AS BIGINT) AS min_vec_id,
       CAST(max(a.vec_id) AS BIGINT) AS max_vec_id
FROM assign a
WHERE a.cid = 0
GROUP BY 1
"""


@register(
    "q96_ivf_partitioned_scan",
    "layout",
    "Inverted-list probe over the IVF-cluster-partitioned embedding "
    "layout: the cluster predicate lands on the hive partition column, "
    "so planning prunes to ONE cluster directory (PartitionFilters, "
    "asserted in test_plans) and executors never open the other "
    "clusters' files — the physical form of the ANN 'probe 1/N of the "
    "corpus' claim. Assignment identical to the sim_topk_ivf oracle "
    "construction; results equal scanning the unpartitioned table.",
    oracle=_Q96_ORACLE,
    prepare=lambda spark, sf_dir: ivf_partitioned_embeddings(spark, sf_dir) and None,
)
def q96_ivf_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ivf_partitioned_embeddings(spark, sf_dir)
    return (
        e.filter(F.col("cluster") == 0)
        .groupBy(F.col("cluster").cast("long").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
    )


# --------------------------------------------------------------------------
# JSON-lines source surface (schema-on-read round trip)
# --------------------------------------------------------------------------


def json_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders exported once to JSON-lines and read back with an explicit
    schema — the interchange-format ingest path (APIs, logs, vendor
    drops arrive as JSONL, not parquet). Timestamps are exported as
    epoch millis: JSON has no timestamp type, and epoch integers are
    the only representation that round-trips bit-exactly between
    engines. Explicit read schema (never inferSchema) — at 100 TB
    schema inference is a full extra pass and a silent-drift hazard."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_json_orders_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        o = load_table(spark, sf_dir, "orders")
        (
            o.select(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
                "o_orderpriority",
            )
            .write.mode("overwrite")
            .json(staging)
        )
        _promote_staging(staging, path, marker)
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate_ms long, o_orderpriority string"
    )
    return spark.read.schema(schema).json(path)


_Q101_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(min(epoch_ms(o_orderdate)) AS BIGINT) AS first_order_ms
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
"""


@register(
    "q101_json_roundtrip",
    "layout",
    "JSON-lines source surface: orders exported to JSONL once and read "
    "back with an EXPLICIT schema (inference is an extra full pass and a "
    "drift hazard at scale), timestamps as epoch millis (the only "
    "JSON-representable form that round-trips bit-exactly), then the "
    "same filtered aggregate as the parquet path. The oracle reads the "
    "original parquet — equality proves the interchange round trip is "
    "lossless, the ingest contract for API/log/vendor JSONL feeds.",
    oracle=_Q101_ORACLE,
    prepare=lambda spark, sf_dir: json_orders(spark, sf_dir) and None,
)
def q101_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = json_orders(spark, sf_dir)
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents"),
            F.min("o_orderdate_ms").alias("first_order_ms"),
        )
    )


# --------------------------------------------------------------------------
# CSV source surface (the reference's native wire format, as files)
# --------------------------------------------------------------------------


def csv_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders exported once to headerless CSV and read back with an
    explicit schema — the reference's native format (its Kafka payloads
    are CSV lines, kafka_to_kudu.py:31) as a file source. Strings in
    the fixture are comma-free identifiers so no quoting ambiguity;
    timestamps as epoch millis and money as integer cents, the two
    text-representable forms that round-trip bit-exactly."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_csv_orders_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        o = load_table(spark, sf_dir, "orders")
        (
            o.select(
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")
                .alias("o_totalprice_cents"),
                F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
                "o_orderpriority",
            )
            .write.mode("overwrite")
            .option("header", "false")
            .csv(staging)
        )
        _promote_staging(staging, path, marker)
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice_cents long, o_orderdate_ms long, o_orderpriority string"
    )
    return spark.read.schema(schema).option("header", "false").csv(path)


_Q102_ORACLE = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(max(epoch_ms(o_orderdate)) AS BIGINT) AS last_order_ms
FROM orders
GROUP BY o_orderstatus
"""


@register(
    "q102_csv_roundtrip",
    "layout",
    "CSV source surface: orders exported to headerless CSV (the "
    "reference's native wire format — its Kafka payloads are CSV lines) "
    "and read back with an explicit schema, money as integer cents and "
    "timestamps as epoch millis so text serialization is bit-exact. "
    "Aggregate checked against the original parquet via the oracle: the "
    "text round trip is lossless. Together with q101 (JSONL) this "
    "closes the interchange-format surface beside the parquet-native "
    "path.",
    oracle=_Q102_ORACLE,
    prepare=lambda spark, sf_dir: csv_orders(spark, sf_dir) and None,
)
def q102_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = csv_orders(spark, sf_dir)
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice_cents").alias("total_cents"),
        F.max("o_orderdate_ms").alias("last_order_ms"),
    )


# --------------------------------------------------------------------------
# Dynamic partition pruning: the dim-side filter prunes fact partitions
# --------------------------------------------------------------------------

_Q118_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS value_e4
FROM events
WHERE CAST(ts AS DATE) IN (
  SELECT DISTINCT CAST(ts AS DATE) FROM events WHERE day(ts) % 5 = 0
)
GROUP BY event_type
"""


@register(
    "q118_dpp_join",
    "layout",
    "Dynamic partition pruning: the date-partitioned event log joins a "
    "derived date dimension whose filter (day-of-month % 5 = 0) is NOT "
    "expressible as a static predicate on the partition column at plan "
    "time — Spark injects a dynamicpruning#N subquery into the fact "
    "scan's PartitionFilters, so the broadcast dim's build side decides "
    "AT RUNTIME which date directories are read. q58 is the static "
    "half of the story; this is the runtime half (star-schema joins at "
    "100 TB live on it). Plan-asserted in test_plans.",
    oracle=_Q118_ORACLE,
    prepare=lambda spark, sf_dir: partitioned_events(spark, sf_dir) and None,
)
def q118_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = partitioned_events(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .filter(F.dayofmonth("d") % 5 == 0)
        .distinct()
    )
    return (
        fact.join(F.broadcast(dim), fact["event_date"] == dim["d"])  # bounded: |days|
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_e4"),
        )
    )


# --------------------------------------------------------------------------
# ORC source surface (the columnar interchange sibling of parquet)
# --------------------------------------------------------------------------


def orc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders exported once to ORC with NATIVE types preserved (double
    prices, timestamp dates — no text re-encoding) and read back with an
    explicit schema. ORC is the second columnar interchange format a
    lakehouse ingests beside parquet (Hive/Trino estates export it);
    unlike the JSONL/CSV surfaces nothing is re-encoded, so the proof
    obligation is that doubles and timestamps survive the writer/reader
    pair bit-exactly."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_orc_orders_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(staging)
        _promote_staging(staging, path, marker)
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    return spark.read.schema(schema).orc(path)


_Q167_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(min(epoch_ms(o_orderdate)) AS BIGINT) AS first_order_ms,
       CAST(max(epoch_ms(o_orderdate)) AS BIGINT) AS last_order_ms
FROM orders
WHERE o_orderstatus <> 'P'
GROUP BY o_orderpriority
"""


@register(
    "q167_orc_roundtrip",
    "layout",
    "ORC source surface: orders exported once to ORC with native types "
    "(doubles and timestamps as-is — no text re-encoding, unlike the "
    "JSONL/CSV surfaces) and read back with an explicit schema, then a "
    "filtered aggregate converting to exact cents and epoch millis. The "
    "oracle reads the ORIGINAL parquet, so equality proves the ORC "
    "writer/reader pair round-trips doubles and timestamps bit-exactly "
    "— the ingest contract for Hive/Trino-estate ORC exports. Predicate "
    "and column pruning reach the ORC scan the same as parquet "
    "(vectorized reader, footer stats).",
    oracle=_Q167_ORACLE,
    prepare=lambda spark, sf_dir: orc_orders(spark, sf_dir) and None,
)
def q167_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = orc_orders(spark, sf_dir)
    return (
        o.filter(F.col("o_orderstatus") != "P")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("total_cents"),
            F.min(F.unix_millis("o_orderdate")).alias("first_order_ms"),
            F.max(F.unix_millis("o_orderdate")).alias("last_order_ms"),
        )
    )


# --------------------------------------------------------------------------
# q170: parquet schema evolution (mergeSchema over mixed-generation files)
# --------------------------------------------------------------------------


def evolved_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders written once as TWO parquet generations under one dataset
    root: even keys as the legacy schema (no priority column), odd keys
    as the evolved schema (priority added) — the schema-drift shape
    every long-lived ingest dataset develops. Read back with
    mergeSchema=true: Spark unions the footers into one schema and
    legacy files surface NULL for the added column."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_evolved_orders_{tag}")
    # Root marker written only after BOTH generations land, so a reader
    # can never see gen1 without gen2 (the per-gen _SUCCESS files alone
    # could).
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("price_cents"),
            "o_orderpriority",
        )
        o.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority").write.mode(
            "overwrite"
        ).parquet(os.path.join(staging, "gen1"))
        o.filter(F.col("o_orderkey") % 2 == 1).write.mode("overwrite").parquet(
            os.path.join(staging, "gen2")
        )
        with open(os.path.join(staging, "_SUCCESS"), "w"):
            pass
        _promote_staging(staging, path, marker)
    return spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen1"), os.path.join(path, "gen2")
    )


_Q170_ORACLE = """
SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'LEGACY'
            ELSE o_orderpriority END AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY 1
"""


@register(
    "q170_schema_evolution",
    "layout",
    "Parquet schema evolution: one dataset whose files span two schema "
    "generations (a column added mid-life), read with mergeSchema=true "
    "so the union schema applies and legacy files yield NULL for the "
    "added column; the aggregate folds those NULLs into an explicit "
    "LEGACY class. The oracle recomputes from the original single-"
    "generation table, proving no rows or values are lost across the "
    "schema boundary. At 100 TB, footer-merge cost is why mergeSchema "
    "is opt-in — production pins the evolved schema explicitly via "
    ".schema(...) once it stabilizes; both paths exercise the same "
    "reader surface.",
    oracle=_Q170_ORACLE,
    prepare=lambda spark, sf_dir: evolved_orders(spark, sf_dir) and None,
)
def q170_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = evolved_orders(spark, sf_dir)
    return (
        o.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("LEGACY")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").alias("total_cents"),
        )
    )


# --------------------------------------------------------------------------
# q172: federated multi-format union (one logical table, three sources)
# --------------------------------------------------------------------------

_Q172_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(count(DISTINCT CASE o_orderstatus
             WHEN 'O' THEN 'parquet' WHEN 'F' THEN 'csv'
             ELSE 'jsonl' END) AS BIGINT) AS n_formats
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "q172_federated_union",
    "layout",
    "Federated multi-format union: ONE logical orders table whose rows "
    "live in three physical formats (status 'O' in parquet, 'F' in the "
    "CSV export, 'P' in the JSONL export — the mid-migration state "
    "every lakehouse passes through), each read with its explicit "
    "schema, normalized to a common (key, priority, cents, format) "
    "shape scan-locally, unioned, and aggregated. The oracle reads the "
    "single-source original: equality proves the federation neither "
    "loses nor double-counts rows across formats, and n_formats "
    "confirms every priority class drew from all three sources. Union "
    "is plan-level concatenation (no shuffle of its own); each arm "
    "keeps its own pushed filter and pruned columns.",
    oracle=_Q172_ORACLE,
    prepare=lambda spark, sf_dir: (
        csv_orders(spark, sf_dir),
        json_orders(spark, sf_dir),
    )
    and None,
)
def q172_federated_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    pq = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.lit("parquet").alias("fmt"),
        )
    )
    cv = (
        csv_orders(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice_cents").alias("cents"),
            F.lit("csv").alias("fmt"),
        )
    )
    js = (
        json_orders(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "P")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.lit("jsonl").alias("fmt"),
        )
    )
    return (
        pq.unionByName(cv)
        .unionByName(js)
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
            F.count_distinct(F.col("fmt")).alias("n_formats"),
        )
    )


# --------------------------------------------------------------------------
# q173: resharding-plan audit (rendezvous hashing vs mod-hash movement)
# --------------------------------------------------------------------------

_RS_OLD = 8
_RS_NEW = 9


def _rs_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    h = sql_md5_int32("CAST(c_custkey AS VARCHAR) || '#' || CAST(t.s AS VARCHAR)")
    arm = """
  SELECT c_custkey AS key,
         CAST(min(CASE WHEN rk = 1 THEN s END) AS BIGINT) AS shard
  FROM (
    SELECT c_custkey, t.s,
           row_number() OVER (PARTITION BY c_custkey
                              ORDER BY {h} DESC, t.s ASC) AS rk
    FROM customer CROSS JOIN
         (SELECT unnest(generate_series(0, {n} - 1)) AS s) t
  ) GROUP BY c_custkey
"""
    return f"""
WITH hrw_old AS ({arm.format(h=h, n=_RS_OLD)}),
hrw_new AS ({arm.format(h=h, n=_RS_NEW)}),
hrw AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN o.shard <> n.shard THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved
  FROM hrw_old o JOIN hrw_new n ON n.key = o.key
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN c_custkey % {_RS_OLD} <> c_custkey % {_RS_NEW}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
  FROM customer
)
SELECT 'rendezvous' AS strategy, n_keys, n_moved,
       CAST(n_moved * 1000 // n_keys AS BIGINT) AS moved_x1000
FROM hrw
UNION ALL
SELECT 'mod', n_keys, n_moved, CAST(n_moved * 1000 // n_keys AS BIGINT)
FROM m
"""


def _hrw_assign(c: DataFrame, n_shards: int, out: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    exploded = c.select(
        F.col("c_custkey").alias("key"),
        F.explode(F.array(*[F.lit(s) for s in range(n_shards)])).alias("s"),
    ).withColumn(
        "h",
        md5_int32(
            F.concat(
                F.col("key").cast("string"), F.lit("#"), F.col("s").cast("string")
            )
        ),
    )
    w = Window.partitionBy("key").orderBy(F.desc("h"), F.asc("s"))
    return (
        exploded.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("key", F.col("s").cast("long").alias(out))
    )


@register(
    "q173_resharding_plan",
    "layout",
    f"Resharding-plan audit, {_RS_OLD} -> {_RS_NEW} shards: under "
    "rendezvous (highest-random-weight) hashing each key moves only if "
    "the ADDED shard wins its per-key hash tournament, so the expected "
    f"moved fraction is 1/{_RS_NEW} (~111 permille); under naive "
    "mod-hash placement nearly every key's residue changes (~8/9 "
    "move). The query computes both movement counts exactly — the "
    "decision table for scaling out a keyed store (state-store "
    "partitions, sink buckets, cache nodes) without mass data "
    "movement. HRW assignment is scan-local (|keys| x |shards| hash "
    "evaluations, argmax per key with deterministic ties); no "
    "coordination ring is stored anywhere — the hash IS the ring.",
    oracle=_rs_oracle(),
)
def q173_resharding_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    c = load_table(spark, sf_dir, "customer")
    old = _hrw_assign(c, _RS_OLD, "old_shard")
    new = _hrw_assign(c, _RS_NEW, "new_shard")
    hrw = (
        old.join(new, "key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(
                F.when(F.col("old_shard") != F.col("new_shard"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        )
        .select(
            F.lit("rendezvous").alias("strategy"),
            "n_keys",
            "n_moved",
            F.expr("n_moved * 1000 div n_keys").cast("long").alias("moved_x1000"),
        )
    )
    mod = (
        c.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(
                F.when(
                    F.col("c_custkey") % _RS_OLD != F.col("c_custkey") % _RS_NEW,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_moved"),
        ).select(
            F.lit("mod").alias("strategy"),
            "n_keys",
            "n_moved",
            F.expr("n_moved * 1000 div n_keys").cast("long").alias("moved_x1000"),
        )
    )
    return hrw.unionByName(mod)


# --------------------------------------------------------------------------
# Small-partition compaction planner (file-metadata-driven maintenance)
# --------------------------------------------------------------------------

# Bin-pack the hive partitions of the date-partitioned event log into
# this many compaction groups (scale-free: bins track total volume, so
# the plan is meaningful at every sf and at 100 TB alike).
COMPACTION_BINS = 8

_COMPACTION_ORACLE = f"""
WITH f AS (
  SELECT 'event_date=' || strftime(CAST(ts AS DATE), '%Y-%m-%d') AS part_dir,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
)
SELECT part_dir, n_rows,
       CAST((COALESCE(sum(n_rows) OVER (
               ORDER BY part_dir
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             * {COMPACTION_BINS}) // (sum(n_rows) OVER ()) AS BIGINT) AS bin_id
FROM f
"""


@register(
    "q177_compaction_plan",
    "layout",
    "Small-partition compaction planner: per-partition row volumes read "
    "from the date-partitioned table's OWN scan metadata "
    "(input_file_name grouped to the hive partition dir — no payload "
    f"columns read), then sequential bin-packing into {COMPACTION_BINS} "
    "volume-balanced compaction groups via an exact integer "
    "cumulative-share formula (bin = floor(rows_before * k / total)) — "
    "the maintenance plan that merges a year of too-small daily "
    "partitions into right-sized files WITHOUT moving any data at "
    "planning time. The oracle recomputes the identical plan from the "
    "raw events semantics (partition dir = event date by construction), "
    "so the metadata-derived and data-derived views are hash-pinned to "
    "agree. The planning windows run over |partitions| metadata rows "
    "(bounded by design), never event rows; at 100 TB the scan cost is "
    "footer counts only and the executed compaction (a later job) "
    "touches exactly the bins this plan names.",
    oracle=_COMPACTION_ORACLE,
    prepare=lambda spark, sf_dir: partitioned_events(spark, sf_dir) and None,
)
def q177_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = partitioned_events(spark, sf_dir)
    per_dir = (
        ev.groupBy(
            F.regexp_extract(
                F.input_file_name(), r"(event_date=[^/]+)/", 1
            ).alias("part_dir")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    # |partitions| metadata rows: the single-partition windows below are
    # bounded by design (they never see event rows).
    w_before = (
        Window.orderBy("part_dir")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = per_dir.select(
        "part_dir",
        "n_rows",
        (
            F.coalesce(F.sum("n_rows").over(w_before), F.lit(0))
            * COMPACTION_BINS
        ).cast("long").alias("share_num"),
        F.sum("n_rows").over(w_all).cast("long").alias("total_rows"),
    )
    # Exact integer floor division — no float surface in the bin cut.
    return staged.select(
        "part_dir",
        "n_rows",
        F.expr("share_num div total_rows").cast("long").alias("bin_id"),
    )


# --------------------------------------------------------------------------
# q181: global dense row-id assignment — two-phase, no single-partition sort
# --------------------------------------------------------------------------

_ROWID_ORACLE = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1
            AS BIGINT) AS rowid
FROM orders
"""


@register(
    "q181_global_rowid",
    "layout",
    "Global dense row ids 0..n-1 in (o_orderdate, o_orderkey) order "
    "WITHOUT the single-partition global sort a naive row_number() "
    "plans: phase 1 counts rows per day bucket and turns them into "
    "exclusive prefix offsets (a window over |days| rows — thousands, "
    "not billions; itself recursively bucketable if ever needed), "
    "phase 2 ranks WITHIN each day (parallel across days — the window "
    "partitions by bucket, so no task ever sees more than one day) "
    "and adds the broadcast offset: rowid = offset[day] + rank - 1. "
    "Within-day order (o_orderdate, o_orderkey) refines the bucket "
    "order, so concatenated bucket ranks equal the global ordering "
    "exactly. This is how stable surrogate keys / training-example "
    "ids are assigned at 100 TB: one shuffle of the fact by bucket, "
    "one tiny aggregate, zero driver-side loops — where "
    "monotonically_increasing_id() gives non-dense partition-dependent "
    "ids and row_number() without PARTITION BY funnels the table "
    "through one task.",
    oracle=_ROWID_ORACLE,
)
def q181_global_rowid(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.date_trunc("day", F.col("o_orderdate")).alias("bucket"),
    )
    return two_phase_rowid(o, "bucket", ["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", "rowid"
    )


def two_phase_rowid(
    df: DataFrame, bucket: str, order_cols: list[str], id_alias: str = "rowid"
) -> DataFrame:
    """0-based dense row ids in (bucket, *order_cols) order without a
    single-partition sort over ``df``: per-bucket counts prefix-sum into
    exclusive offsets (a window over |buckets| rows only), each bucket
    ranks internally in parallel, id = broadcast offset + rank - 1.

    ``bucket`` must coarsen the intended global order (every row of an
    earlier bucket precedes every row of a later one under
    ``order_cols``) and (bucket, *order_cols) must be a total order for
    the ids to be deterministic. Shared by q181 (time axis) and the
    streaming rowid twin (per micro-batch, plus a persistent offset).
    functions/ranks.py::two_phase_order_stats generalizes this kernel
    (second bucket level for unbounded tie masses, running sums, exact
    NTILE) — new rank/quantile work should build on that; this seam
    stays as q181's certified single-level form."""
    counts = df.groupBy(bucket).agg(F.count(F.lit(1)).alias("__n"))
    w_pre = Window.orderBy(bucket).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        bucket,
        F.coalesce(F.sum("__n").over(w_pre), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    w_in = Window.partitionBy(bucket).orderBy(*order_cols)
    return (
        df.join(F.broadcast(offsets), bucket)  # bounded: |day buckets| offsets
        .withColumn(
            id_alias,
            (F.col("__off") + F.row_number().over(w_in) - 1).cast("long"),
        )
        .drop("__off")
    )


# --------------------------------------------------------------------------
# q182: columnar encoding advisor — run/cardinality audit under layout order
# --------------------------------------------------------------------------

# Coarse bucket over the layout-order prefix: per-bucket run counting
# parallelizes, and only the |buckets|-row boundary summary crosses
# buckets (itself recursively bucketable). 512 orders/bucket keeps the
# summary tiny at every fixture scale while bounding per-task windows.
_ENC_BUCKET = 512

_ENC_ORACLE = """
WITH s AS (
  SELECT 'l_returnflag' AS col, CAST(ord(l_returnflag) AS BIGINT) AS val,
         l_orderkey AS okey, l_linenumber AS lineno FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', CAST(ord(l_linestatus) AS BIGINT),
         l_orderkey, l_linenumber FROM lineitem
  UNION ALL
  SELECT 'l_shipdate',
         CAST(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
              AS BIGINT),
         l_orderkey, l_linenumber FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_partkey, l_orderkey, l_linenumber FROM lineitem
), r AS (
  SELECT col, val,
         CASE WHEN lag(val) OVER w IS NULL OR lag(val) OVER w <> val
              THEN 1 ELSE 0 END AS new_run
  FROM s WINDOW w AS (PARTITION BY col ORDER BY okey, lineno, val)
), agg AS (
  SELECT col, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
         CAST(sum(new_run) AS BIGINT) AS n_runs
  FROM r GROUP BY col
)
SELECT col, n_rows, n_distinct, n_runs,
       CAST((n_rows * 100) // n_runs AS BIGINT) AS avg_run_e2,
       CASE WHEN (n_rows * 100) // n_runs >= 400 THEN 'rle'
            WHEN n_distinct * 50 <= n_rows THEN 'dictionary'
            ELSE 'plain' END AS advice
FROM agg
"""


@register(
    "q182_encoding_advisor",
    "layout",
    "Columnar encoding advisor: for four lineitem columns (flags, ship "
    "day, part key — all mapped injectively to BIGINT so both engines "
    "compare identical values) under the physical layout order "
    "(l_orderkey, l_linenumber), measure row count, distinct count, "
    "and RUN count (ties in the layout key are broken by the value "
    "itself, so the count is total-order deterministic in both "
    "engines), then recommend rle / dictionary / plain from "
    "integer thresholds (avg run >= 4 -> rle; distinct ratio <= 2% -> "
    "dictionary) — the write-time analysis behind parquet encoding "
    "choices and sort-key selection (pair with q85's z-order scan). "
    "Runs are counted two-phase so NO column funnels the fact through "
    f"one task: each {_ENC_BUCKET}-order bucket counts its runs in "
    "parallel (window partitioned by column x bucket), and a "
    "|buckets|-row boundary summary subtracts runs that continue "
    "across bucket edges (prev bucket's last value == next bucket's "
    "first). The oracle counts runs with one flat global window per "
    "column — same totals, scale-naive formulation — pinning the "
    "boundary arithmetic exactly.",
    oracle=_ENC_ORACLE,
)
def q182_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-window invariant (same contract as two_phase_rowid): the
    fact-side run-flag window partitions by (col, bucket) — no task sees
    more than one {col} x {_ENC_BUCKET}-order slice — and the boundary-
    stitch window ``wb`` partitions by col over the PER-BUCKET ROLLUP
    (|cols| x |buckets| rows, ~n_rows/512 — metadata-scale), so NO
    window in this plan runs SinglePartition over the fact (or at all).
    Plan-asserted in tests/test_plans.py::
    test_encoding_advisor_has_no_single_partition_exchange."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    s = li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.expr(
            "stack(4,"
            " 'l_returnflag', CAST(ascii(l_returnflag) AS BIGINT),"
            " 'l_linestatus', CAST(ascii(l_linestatus) AS BIGINT),"
            " 'l_shipdate', CAST(datediff(CAST(l_shipdate AS DATE),"
            "                             DATE '1970-01-01') AS BIGINT),"
            " 'l_partkey', l_partkey) AS (col, val)"
        ),
    ).withColumn("bucket", F.expr(f"okey div {_ENC_BUCKET}"))
    w = Window.partitionBy("col", "bucket").orderBy("okey", "lineno", "val")
    lagv = F.lag("val").over(w)
    flagged = s.select(
        "col",
        "bucket",
        "val",
        F.when(lagv.isNull() | (lagv != F.col("val")), 1)
        .otherwise(0)
        .alias("new_run"),
        F.struct("okey", "lineno", "val").alias("pos"),
    )
    per_bucket = flagged.groupBy("col", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("new_run").alias("runs_in"),
        F.min("pos").getField("val").alias("first_val"),
        F.max("pos").getField("val").alias("last_val"),
    )
    # Boundary summary: |cols| x |buckets| rows — a run continuing across
    # a bucket edge was double-counted as a new run in the later bucket.
    wb = Window.partitionBy("col").orderBy("bucket")
    stitched = per_bucket.select(
        "col",
        "n_rows",
        "runs_in",
        F.when(
            F.lag("last_val").over(wb) == F.col("first_val"), 1
        ).otherwise(0).alias("merged"),
    )
    distinct = (
        s.groupBy("col", "val")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("col")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
    )
    agg = (
        stitched.groupBy("col")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            (F.sum("runs_in") - F.sum("merged")).cast("long").alias("n_runs"),
        )
        .join(distinct, "col")
    )
    avg_run = F.expr("(n_rows * 100) div n_runs")
    return agg.select(
        "col",
        "n_rows",
        "n_distinct",
        "n_runs",
        avg_run.cast("long").alias("avg_run_e2"),
        F.when(avg_run >= 400, F.lit("rle"))
        .when(F.col("n_distinct") * 50 <= F.col("n_rows"), F.lit("dictionary"))
        .otherwise(F.lit("plain"))
        .alias("advice"),
    )


# --------------------------------------------------------------------------
# q188: content-addressable chunk dedup — storage-level blob dedup ratio
# --------------------------------------------------------------------------

_CHUNK_BYTES = 256

_CHUNK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, text FROM documents
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
), ch AS (
  SELECT source,
         md5(substr(text, j * {_CHUNK_BYTES} + 1, {_CHUNK_BYTES})) AS chash
  FROM d, LATERAL unnest(generate_series(
         0, CAST(ceil(length(text) / {_CHUNK_BYTES}.0) AS INT) - 1)) AS t(j)
)
SELECT source,
       CAST(count(*) AS BIGINT)               AS total_chunks,
       CAST(count(DISTINCT chash) AS BIGINT)  AS distinct_chunks,
       CAST(((count(*) - count(DISTINCT chash)) * 1000000)
            // count(*) AS BIGINT)            AS dedup_ratio_e6
FROM ch GROUP BY source
"""


@register(
    "q188_chunk_dedup",
    "layout",
    f"Content-addressable chunk-level dedup ratio per source: each "
    f"document's payload splits into fixed {_CHUNK_BYTES}-byte chunks "
    "addressed by their md5 (the storage layer's unit of identity in "
    "CAS / backup / blob-store dedup — borg/restic/VAST-style), and "
    "the ratio of duplicate chunk addresses measures what a "
    "dedup-aware store would NOT write. Pure Catalyst: chunking is "
    "sequence + transform + substr + md5 (JVM codegen, zero Python — "
    "where a naive implementation reaches for a per-row UDF), the "
    "explode is row-local, and the only shuffle is the (source, "
    "chash) distinct-aggregate, carrying 16-byte addresses, never "
    "payload bytes. The storage-level complement to the token-span "
    "audit (dedup_exact_substring: WHICH text is duplicated) and the "
    "doc-level MinHash family (which documents pair up): this one "
    "prices the BYTES a content-addressable store saves. ASCII guard "
    "as in the multimodal encoders, so char indexing == byte "
    "indexing in both engines.",
    oracle=_CHUNK_ORACLE,
)
def q188_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.session import spread_small_scan

    tune_session(spark)
    d = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )
    # Spread before the CPU-heavy chunk-hash map (one-file fixture scan
    # would serialize it; no-op at real scale).
    ch = spread_small_scan(d.select("source", "text")).select(
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(0,"
                f" int(ceil(length(text) / {_CHUNK_BYTES}.0)) - 1),"
                f" j -> md5(substr(text, j * {_CHUNK_BYTES} + 1,"
                f" {_CHUNK_BYTES})))"
            )
        ).alias("chash"),
    )
    return ch.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("total_chunks"),
        F.count_distinct("chash").cast("long").alias("distinct_chunks"),
        F.expr(
            "((count(1) - count(DISTINCT chash)) * 1000000) div count(1)"
        ).cast("long").alias("dedup_ratio_e6"),
    )


# --------------------------------------------------------------------------
# q189: compaction plan EXECUTION — the OPTIMIZE primitive q177 advises
# --------------------------------------------------------------------------

# Canonical event-row string for the order-independent content digest
# (q169's DECIMAL(38,0) md5 sum): every column canonicalized to an
# engine-neutral integer/string form — ts as epoch microseconds, value
# at e4 (the fixture's native 2-decimal precision), so the digest pins
# BYTE-level payload fidelity across the rewrite.
_EVENT_ROW_SPARK = (
    "concat_ws('|', CAST(event_id AS STRING), "
    "CAST(unix_micros(ts) AS STRING), CAST(user_id AS STRING), "
    "event_type, CAST(CAST(round(value * 10000) AS BIGINT) AS STRING), "
    "props)"
)
_EVENT_ROW_SQL = (
    "concat_ws('|', CAST(event_id AS VARCHAR), "
    "CAST(epoch_us(ts) AS VARCHAR), CAST(user_id AS VARCHAR), "
    "event_type, CAST(CAST(round(value * 10000) AS BIGINT) AS VARCHAR), "
    "props)"
)


def compaction_groups(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[datetime.date]]]:
    """The q177 plan collected and grouped by compaction bin. The
    collect is |partitions| METADATA rows (one per hive partition dir —
    calendar-bounded, never event rows), the same bounded-sentinel class
    as the registry's other driver-side collects."""
    rows = q177_compaction_plan(spark, sf_dir).collect()
    groups: dict[int, list[datetime.date]] = {}
    for r in rows:
        day = datetime.date.fromisoformat(r["part_dir"].split("=", 1)[1])
        groups.setdefault(int(r["bin_id"]), []).append(day)
    return sorted((b, sorted(ds)) for b, ds in groups.items())


def compaction_bin_scan(
    spark: SparkSession, sf_dir: str, dates: list[datetime.date]
) -> DataFrame:
    """One rewrite group's input: the partitioned source pruned to
    exactly the group's partition values. The IN-list lands on the hive
    partition column, so planning prunes to the flagged directories
    (PartitionFilters — asserted in tests/test_plans.py::
    test_compaction_rewrite_reads_only_flagged_partitions) and the
    rewrite never opens a byte outside its own group."""
    ev = partitioned_events(spark, sf_dir)
    return ev.filter(F.col("event_date").isin(dates))


def compacted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compacted layout: each q177 bin rewritten to ONE file under
    ``bin_id=K/``, written once per (process, sf_dir) with the
    staging + atomic-rename + marker-recheck protocol the supply cache
    uses. coalesce(1) per bin is the plan's own contract — bins track
    total volume, so one output file per bin IS the right-sized file
    the planner promised; at 100 TB the bin count (not the file count)
    scales with volume and each bin's rewrite is an independent,
    restartable job over only its own partitions."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_compacted_events_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        for bin_id, dates in compaction_groups(spark, sf_dir):
            (
                compaction_bin_scan(spark, sf_dir, dates)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(staging, f"bin_id={bin_id}"))
            )
        with open(os.path.join(staging, "_SUCCESS"), "w"):
            pass
        _promote_staging(staging, path, marker)
    return spark.read.parquet(path)


def _promote_staging(staging: str, path: str, marker: str) -> None:
    """Atomic-rename promotion with the marker-recheck protocol (the
    round-6-ADVICE-hardened form the supply cache uses,
    subqueries.py): a failed rename means EITHER a complete copy won
    the race (marker present under ``path`` — discard staging) OR a
    stale partial occupant blocks the path (no marker — displace it
    and retry; fail loudly rather than read an incomplete directory).

    The stale occupant is displaced by an atomic rename-ASIDE, not an
    in-place rmtree: rmtree left a long window (the whole deletion)
    during which a competitor's just-completed copy could be half-
    deleted and the path held nothing readable. With rename-aside the
    path is empty only between two rename syscalls, and the marker is
    re-checked immediately before the displacement so a competitor
    that completed after the first check keeps its copy (round-7
    ADVICE)."""
    try:
        os.rename(staging, path)
        return
    except OSError:
        pass
    if os.path.exists(marker):
        shutil.rmtree(staging, ignore_errors=True)
        return
    trash = f"{path}.stale.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    moved = False
    # Re-check at the last instant: between the check above and here a
    # competitor may have finished its own promotion.
    if not os.path.exists(marker):
        try:
            os.rename(path, trash)
            moved = True
        except OSError:
            # Occupant vanished (a competitor displaced it first) —
            # the path may simply be free now.
            pass
    try:
        os.rename(staging, path)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        if not os.path.exists(marker):
            raise RuntimeError(
                f"layout cache at {path} is incomplete "
                "(no _SUCCESS) and could not be replaced"
            )
    finally:
        if moved:
            shutil.rmtree(trash, ignore_errors=True)


_COMPACT_EXEC_ORACLE = f"""
WITH f AS (
  SELECT 'event_date=' || strftime(CAST(ts AS DATE), '%Y-%m-%d') AS part_dir,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM events GROUP BY 1
), plan AS (
  SELECT part_dir,
         CAST((COALESCE(sum(n_rows) OVER (
                 ORDER BY part_dir
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               * {COMPACTION_BINS}) // (sum(n_rows) OVER ()) AS BIGINT)
           AS bin_id
  FROM f
), m AS (
  SELECT CAST(substr(part_dir, 12) AS DATE) AS event_date, bin_id FROM plan
), agg AS (
  SELECT m.bin_id,
         CAST(count(DISTINCT CAST(e.ts AS DATE)) AS BIGINT) AS n_parts,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST({{h}} AS DECIMAL(38,0))) AS VARCHAR) AS digest
  FROM events e JOIN m ON m.event_date = CAST(e.ts AS DATE)
  GROUP BY 1
)
SELECT bin_id, n_parts, n_rows,
       CAST(1 AS BIGINT) AS n_files,
       digest,
       TRUE AS content_match
FROM agg
"""


def _compact_exec_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    return _COMPACT_EXEC_ORACLE.format(h=sql_md5_int32(_EVENT_ROW_SQL))


@register(
    "q189_compaction_execute",
    "layout",
    "EXECUTE the q177 compaction plan — the OPTIMIZE primitive: each "
    f"of the {COMPACTION_BINS} volume-balanced bins is rewritten to "
    "ONE right-sized file by a scan pruned to exactly that bin's hive "
    "partitions (PartitionFilters plan-asserted; the rewrite never "
    "reads outside its group), then the result PROVES itself: (a) "
    "content fidelity — the q169-style order-independent "
    "DECIMAL(38,0) md5 digest of every canonicalized event row, "
    "computed on BOTH the pre-compaction partitioned source and the "
    "compacted files, must match per bin (content_match), and (b) "
    "file-count reduction — n_files counts the compacted bin's actual "
    "files via input_file_name (1 per bin, vs one-or-more per daily "
    "partition before). The oracle recomputes the expected plan, row "
    "counts, and digests from raw events and pins n_files=1 / "
    "content_match=TRUE as literals, so ANY rewrite corruption or "
    "fragmentation hash-fails the gate. At 100 TB each bin rewrite is "
    "an independent restartable job reading only its own partitions; "
    "digesting is one scan-local map + per-bin sum on each side.",
    oracle=_compact_exec_oracle(),
    prepare=lambda spark, sf_dir: compacted_events(spark, sf_dir) and None,
)
def q189_compaction_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    # input_file_name() is non-deterministic to the analyzer — project
    # it to a column before aggregating over it.
    comp = compacted_events(spark, sf_dir).withColumn(
        "__file", F.input_file_name()
    )
    row_hash = md5_int32(F.expr(_EVENT_ROW_SPARK)).cast("decimal(38,0)")
    after = comp.groupBy(F.col("bin_id").cast("long").alias("bin_id")).agg(
        F.count_distinct("event_date").cast("long").alias("n_parts"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("__file").cast("long").alias("n_files"),
        F.sum(row_hash).cast("string").alias("digest"),
    )
    # Source side: the pre-compaction partitioned table, bins assigned
    # from the broadcast |partitions|-row plan map.
    plan_map = spark.createDataFrame(
        [
            (day, bin_id)
            for bin_id, dates in compaction_groups(spark, sf_dir)
            for day in dates
        ],
        "event_date date, bin_id long",
    )
    src = partitioned_events(spark, sf_dir).join(
        F.broadcast(plan_map), "event_date"  # bounded: |partitions| plan
    )
    before = src.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("src_rows"),
        F.sum(row_hash).cast("string").alias("src_digest"),
    )
    return after.join(before, "bin_id").select(
        "bin_id",
        "n_parts",
        "n_rows",
        "n_files",
        "digest",
        (
            (F.col("n_rows") == F.col("src_rows"))
            & (F.col("digest") == F.col("src_digest"))
        ).alias("content_match"),
    )


# --------------------------------------------------------------------------
# q191: resharding-plan EXECUTION — incremental scale-out via deletion
# vectors (the merge-on-read primitive behind the q173 movement audit)
# --------------------------------------------------------------------------

# Canonical customer-row string for the order-independent content digest
# (the q189 pattern): every column canonicalized to an engine-neutral
# integer/string form — acctbal at cents precision (the fixture's native
# 2-decimal scale, same round(x*100) form as q125/pipeline_snapshot).
_CUST_ROW_SPARK = (
    "concat_ws('|', CAST(c_custkey AS STRING), c_name, "
    "CAST(c_nationkey AS STRING), "
    "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS STRING), c_mktsegment)"
)
_CUST_ROW_SQL = (
    "concat_ws('|', CAST(c_custkey AS VARCHAR), c_name, "
    "CAST(c_nationkey AS VARCHAR), "
    "CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR), c_mktsegment)"
)

_CUST_COLS = ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")


def hrw_shard_col(n_shards: int, key: str = "c_custkey") -> Column:
    """Scan-local rendezvous (HRW) owner of ``key`` among ``n_shards``:
    argmax over s of (h(key#s) DESC, s ASC) as a greatest-of-structs
    fold — the same per-key tournament q173's windowed ``_hrw_assign``
    computes, but with ZERO shuffle: the hash IS the ring, so ownership
    is a row-local expression any scan evaluates in place (|shards|
    md5 evaluations per row, whole-stage codegen'd). Struct comparison
    is lexicographic, so (h, -s) makes greatest() break hash ties
    toward the LOWER shard id, exactly matching ORDER BY h DESC, s ASC."""
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    if n_shards == 1:  # greatest() needs >=2 columns; one shard owns all
        return F.lit(0).cast("long")
    cands = [
        F.struct(
            md5_int32(
                F.concat(
                    F.col(key).cast("string"), F.lit("#"), F.lit(str(s))
                )
            ).alias("h"),
            F.lit(-s).alias("negs"),
        )
        for s in range(n_shards)
    ]
    best = F.greatest(*cands)
    return (-best["negs"]).cast("long")


def sharded_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer laid out as the ``_RS_OLD``-shard rendezvous-keyed store
    (hive ``shard=K/`` dirs) that q173 plans the scale-out of — the
    'before' state of the resharding execution. Written once per
    (process, sf_dir) with the staging + atomic-rename + marker-recheck
    protocol. Shard assignment is the scan-local HRW expression, so the
    only data movement in the write is the partitionBy sink shuffle."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_sharded_customer_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        (
            load_table(spark, sf_dir, "customer")
            .select(*_CUST_COLS)
            .withColumn("shard", hrw_shard_col(_RS_OLD))
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(staging)
        )
        _promote_staging(staging, path, marker)
    return spark.read.parquet(path)


def resharding_overlay(spark: SparkSession, sf_dir: str) -> str:
    """EXECUTE the q173 scale-out (8 -> 9 shards) incrementally: ONE
    scan of the old store evaluates each row's HRW-9 owner scan-locally
    (no plan table is shipped — the hash is the ring), and the rows the
    ADDED shard wins (the plan's ~1/9 moved fraction) are (a) copied
    into ``newdata/`` under
    their new shard and (b) recorded as per-shard DELETION VECTORS
    (key lists) under ``tombstones/shard=K/`` — the merge-on-read
    mechanism (Delta/Iceberg deletion vectors): the ~8/9 of the store
    that did not move is NEVER rewritten. At 100 TB the rewrite IO is
    the moved fraction plus key-only tombstone metadata; a later
    compaction (the q189 primitive) folds tombstones into the base
    files. The moved set is pinned once (two sinks consume it), so the
    base store is scanned exactly once end to end."""
    tune_session(spark)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"ssk_reshard_overlay_{tag}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        staging = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        moved = _pin(
            sharded_customer(spark, sf_dir)
            .withColumn("new_shard", hrw_shard_col(_RS_NEW))
            .filter(F.col("new_shard") != F.col("shard"))
        )
        (
            moved.select(*_CUST_COLS, F.col("new_shard").alias("shard"))
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(staging, "newdata"))
        )
        (
            moved.select(F.col("c_custkey").alias("key"), "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(staging, "tombstones"))
        )
        # Table-metadata twin of a deletion-vector store's cardinality
        # stat: written once at reshard time (moved is already pinned,
        # so this count scans executor-local blocks, not the base
        # store), read by every merge-on-read view instead of
        # re-counting the tombstones per query.
        with open(os.path.join(staging, "tombstone_count.txt"), "w") as f:
            f.write(str(moved.count()))
        with open(os.path.join(staging, "_SUCCESS"), "w"):
            pass
        _promote_staging(staging, path, marker)
    return path


def resharded_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read view of the incrementally resharded store: base
    shards minus their deletion vectors, unioned with the new shard's
    data files. The tombstone side is key-only metadata (~1/9
    of the keys), applied as a size-gated anti-join per (shard, key) —
    broadcast at dimension scale, shuffled-hash past the gate, never a
    sort. The tombstone cardinality comes from the overlay's metadata
    file (written once at reshard time, the deletion-vector-store
    convention); only a pre-metadata overlay left by an older build
    falls back to counting."""
    from spark_stream_kudu_spark.functions.joins import gated_broadcast

    base = sharded_customer(spark, sf_dir)
    over = resharding_overlay(spark, sf_dir)
    newdata = spark.read.parquet(os.path.join(over, "newdata"))
    tomb = spark.read.parquet(os.path.join(over, "tombstones"))
    meta = os.path.join(over, "tombstone_count.txt")
    try:
        with open(meta) as f:
            n_tomb = int(f.read().strip())
    except (OSError, ValueError):
        n_tomb = tomb.count()
    live = base.join(
        gated_broadcast(
            tomb.select(F.col("key").alias("c_custkey"), "shard"),
            n_tomb,
            spark,
            bytes_per_row=16,
        ),
        ["c_custkey", "shard"],
        "left_anti",
    )
    cols = [*_CUST_COLS, F.col("shard").cast("long").alias("shard")]
    return live.select(*cols).unionByName(newdata.select(*cols))


def _reshard_exec_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    h = sql_md5_int32(
        "CAST(c_custkey AS VARCHAR) || '#' || CAST(t.s AS VARCHAR)"
    )
    arm = """
  SELECT c_custkey AS key,
         CAST(min(CASE WHEN rk = 1 THEN s END) AS BIGINT) AS shard
  FROM (
    SELECT c_custkey, t.s,
           row_number() OVER (PARTITION BY c_custkey
                              ORDER BY {h} DESC, t.s ASC) AS rk
    FROM customer CROSS JOIN
         (SELECT unnest(generate_series(0, {n} - 1)) AS s) t
  ) GROUP BY c_custkey
"""
    return f"""
WITH hrw_old AS ({arm.format(h=h, n=_RS_OLD)}),
hrw_new AS ({arm.format(h=h, n=_RS_NEW)}),
direct AS (
  SELECT n.shard,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CAST({sql_md5_int32(_CUST_ROW_SQL)} AS DECIMAL(38,0)))
              AS VARCHAR) AS digest
  FROM customer c JOIN hrw_new n ON n.key = c.c_custkey
  GROUP BY n.shard
),
tomb AS (
  SELECT o.shard, CAST(count(*) AS BIGINT) AS n_tombstones
  FROM hrw_old o JOIN hrw_new n USING (key)
  WHERE o.shard <> n.shard
  GROUP BY o.shard
)
SELECT d.shard, d.n_rows,
       CAST(COALESCE(t.n_tombstones, 0) AS BIGINT) AS n_tombstones,
       d.digest,
       TRUE AS content_match
FROM direct d LEFT JOIN tomb t USING (shard)
"""


@register(
    "q191_resharding_execute",
    "layout",
    f"EXECUTE the q173 resharding plan ({_RS_OLD} -> {_RS_NEW} shards) "
    "incrementally — the scale-out primitive for a keyed store: one "
    "scan of the old HRW-sharded store evaluates each row's new "
    "rendezvous owner scan-locally (the hash is the ring; no plan "
    "table ships), the moved rows (the plan's ~1/9 fraction — ONLY "
    "keys the ADDED shard wins) are copied to the new shard, and "
    "per-shard DELETION VECTORS (key-only tombstones) mask them in "
    "their old shards — merge-on-read, so 8/9 of the store is never "
    "rewritten. The result PROVES itself: the merge-on-read view "
    "(base minus tombstones union newdata) is digested per shard with "
    "the q169-style order-independent DECIMAL(38,0) md5 sum and "
    "compared against a FROM-SCRATCH HRW-9 assignment of the raw "
    "table computed in the same query (content_match), so a lost, "
    "duplicated, or mis-tombstoned row hash-fails the gate; the "
    "oracle recomputes per-shard rows/digests/tombstone counts "
    "independently and pins content_match=TRUE. At 100 TB: rewrite IO "
    "= moved fraction + key-only metadata, the tombstone mask is a "
    "size-gated anti-join (broadcast at dimension scale, shuffled-hash "
    "past the gate), and a later q189 compaction folds tombstones "
    "into the base files.",
    oracle=_reshard_exec_oracle(),
    prepare=lambda spark, sf_dir: resharding_overlay(spark, sf_dir) and None,
)
def q191_resharding_execute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    row_hash = md5_int32(F.expr(_CUST_ROW_SPARK)).cast("decimal(38,0)")
    inc = resharded_customer(spark, sf_dir).groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(row_hash).cast("string").alias("digest"),
    )
    tomb = (
        spark.read.parquet(
            os.path.join(resharding_overlay(spark, sf_dir), "tombstones")
        )
        .groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tombstones"))
    )
    # From-scratch side: raw customer assigned to HRW-9 scan-locally —
    # the ground truth the incremental store must reproduce exactly.
    direct = (
        load_table(spark, sf_dir, "customer")
        .withColumn("shard", hrw_shard_col(_RS_NEW))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("d_rows"),
            F.sum(row_hash).cast("string").alias("d_digest"),
        )
    )
    return (
        inc.join(tomb, "shard", "left")
        .join(direct, "shard")
        .select(
            "shard",
            "n_rows",
            F.coalesce("n_tombstones", F.lit(0).cast("long")).alias(
                "n_tombstones"
            ),
            "digest",
            (
                (F.col("n_rows") == F.col("d_rows"))
                & (F.col("digest") == F.col("d_digest"))
            ).alias("content_match"),
        )
    )
