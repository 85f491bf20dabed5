"""Data-quality profiling and referential-integrity auditing.

Before a 100 TB corpus feeds training, the pipeline profiles it: per-
column null/distinct/min/max (drift detection, schema sanity) and
cross-table foreign-key orphan counts (broken joins surface here, not
three stages downstream as silent row loss). Both are declared queries
with DuckDB oracles, same as every other operator.

- ``q77_profile`` — one-scan column profiler over ``orders``: every
  column's null count, exact distinct count, and min/max rendered to a
  deterministic string representation, unpivoted to one row per column.
  The Spark plan computes ALL per-column aggregates in a single
  aggregate over a single scan (the oracle's UNION ALL form re-scans per
  column; Catalyst does not have to). Distinct counts are exact here
  (oracle-comparable); at 100 TB swap ``approx_count_distinct`` into the
  same shape — the HLL sketch family (q36/q66) is the proven scale path.
- ``q78_fk_orphans`` — referential audit: child rows whose FK matches no
  parent row, per relation (lineitem->orders, lineitem->part,
  lineitem->supplier, orders->customer). Anti-join per relation; small
  parents broadcast, so the child table is scanned WITHOUT a shuffle for
  three of the four relations. A healthy corpus reports zeros — the
  query's value is that a non-zero ever becomes visible the day ingest
  breaks.

Reference parity: the reference's demo DDL declares PK/FK-style keyed
tables (reference kudu DDL; SURVEY.md §1.3) but never audits them — this
is the audit an engine at scale actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# q77: one-scan column profiler
# --------------------------------------------------------------------------

# Per-column deterministic string rendering: BIGINT/VARCHAR cast
# directly; DOUBLE via integer cents (float->string formatting differs
# across engines, integer strings do not); TIMESTAMP via an explicit
# format string.
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _profile_cols() -> list[tuple[str, str, str]]:
    """(column, spark_kind, duck_repr_sql) triples for orders."""
    return [
        ("o_orderkey", "int", "CAST({c} AS VARCHAR)"),
        ("o_custkey", "int", "CAST({c} AS VARCHAR)"),
        ("o_orderstatus", "str", "{c}"),
        (
            "o_totalprice",
            "cents",
            "CAST(CAST(floor({c} * 100 + 0.5) AS BIGINT) AS VARCHAR)",
        ),
        ("o_orderdate", "ts", f"strftime({{c}}, '{_TS_FMT_DUCK}')"),
        ("o_orderpriority", "str", "{c}"),
    ]


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min({repr_sql.format(c=c)}) AS min_repr,
       max({repr_sql.format(c=c)}) AS max_repr
FROM orders"""
    for c, _, repr_sql in _profile_cols()
)


def _spark_repr(col: str, kind: str):
    c = F.col(col)
    if kind == "int":
        return c.cast("string")
    if kind == "cents":
        return F.floor(c * 100 + F.lit(0.5)).cast("long").cast("string")
    if kind == "ts":
        return F.date_format(c, _TS_FMT_SPARK)
    return c


@register(
    "q77_profile",
    "profiling",
    "One-scan column profiler over orders: per-column null count, exact "
    "distinct count, and min/max rendered to engine-stable strings "
    "(integers and cents as integer strings, timestamps via explicit "
    "format — never raw float/timestamp casts, whose formatting is "
    "engine-specific), unpivoted to one row per column. Spark computes "
    "every column's aggregates in ONE aggregate over ONE scan; the "
    "multi-DISTINCT expand is bounded by |columns|. At 100 TB the same "
    "shape runs with approx_count_distinct (HLL, q36/q66 family) to drop "
    "the expand — profile output is |columns| rows either way. The "
    "drift-detection / schema-sanity kernel of a corpus intake pipeline.",
    oracle=_PROFILE_ORACLE,
)
def q77_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, kind, _ in _profile_cols():
        r = _spark_repr(c, kind)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(r).alias(f"{c}__min"),
            F.max(r).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c, _, _ in _profile_cols()
    )
    n = len(_profile_cols())
    return wide.selectExpr(
        f"stack({n}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_repr, max_repr)"
    )


# --------------------------------------------------------------------------
# q78: foreign-key orphan audit
# --------------------------------------------------------------------------

_FK_RELATIONS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
]

_FK_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS fk,
       CAST(count(*) AS BIGINT) AS n_child,
       CAST(count(*) FILTER (WHERE NOT EXISTS (
           SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk_col}
       )) AS BIGINT) AS n_orphans
FROM {child} c"""
    for name, child, fk_col, parent, pk in _FK_RELATIONS
)


@register(
    "q78_fk_orphans",
    "profiling",
    "Referential-integrity audit: per FK relation, how many child rows "
    "reference a missing parent (lineitem->orders/part/supplier, "
    "orders->customer). Each relation is one broadcast-anti-join count "
    "over the child scan — parents are dimension-sized, so the child "
    "table never shuffles; a same-fact-table relation at 100 TB falls "
    "back to a shuffled anti-join on the key. Healthy ingest reports "
    "zeros; the query exists so a broken feed surfaces HERE, not as "
    "silent row loss in a downstream inner join.",
    oracle=_FK_ORACLE,
)
def q78_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.lineage import pin as _pin

    tune_session(spark)
    # Shared slice sources (round-12): the old loop scanned each CHILD
    # twice per relation (anti-join probe + total count) — 6 lineitem
    # scans + 2 orders scans — and orders a third time as relation 1's
    # parent. One lazy-pinned fk-column projection per fact table feeds
    # every subtree instead: lineitem's three fk columns in one pass,
    # orders' (pk, fk) pair in one pass serving BOTH its child and
    # parent roles. The anti-join still runs against the raw parent
    # key multiset — no pk-uniqueness assumption is introduced (an
    # anti-join is duplicate-insensitive on its build side; property
    # test with duplicate parents in tests/test_analytics.py).
    li = _pin(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey"
        ),
        eager=False,
    )
    ords = _pin(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
        eager=False,
    )
    slices = {"lineitem": li, "orders": ords}
    out: DataFrame | None = None
    for name, child, fk_col, parent, pk in _FK_RELATIONS:
        ch = slices[child].select(fk_col)
        pa = (
            slices[parent]
            if parent in slices
            else load_table(spark, sf_dir, parent)
        ).select(pk)
        # Parent pk tables are entity-scale (customer/orders/part/
        # supplier): un-hinted, exactly the degrade-to-shuffled-anti
        # behavior the docstring promises at 100 TB.
        orphans = (
            ch.join(pa, ch[fk_col] == pa[pk], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk"), "n_orphans")
        )
        totals = ch.agg(F.count(F.lit(1)).alias("n_child")).select(
            F.lit(name).alias("fk"), "n_child"
        )
        rel = totals.join(orphans, "fk").select("fk", "n_child", "n_orphans")
        out = rel if out is None else out.unionByName(rel)
    return out


# --------------------------------------------------------------------------
# q93: Benford first-digit audit
# --------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS d
  FROM orders WHERE o_totalprice >= 1
),
obs AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY d
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs)
SELECT o.d AS digit, o.n,
       floor((o.n * 1.0 / t.total) * 1000000 + 0.5) / 1000000 AS obs_share,
       floor(ln(1.0 + 1.0 / o.d) / ln(10.0) * 1000000 + 0.5) / 1000000
         AS benford_share,
       floor(((o.n * 1.0 / t.total) - ln(1.0 + 1.0 / o.d) / ln(10.0))
             * 1000000 + 0.5) / 1000000 AS deviation
FROM obs o CROSS JOIN tot t
"""


@register(
    "q93_benford",
    "profiling",
    "Benford first-digit audit: observed leading-digit distribution of "
    "order totals vs the Benford expectation log10(1 + 1/d), with "
    "per-digit deviation — the classic fabricated-data / broken-generator "
    "screen for financial and telemetry feeds. First digit via integer "
    "string prefix (identical in both engines, no float log tricks); one "
    "map-side-combined count over 9 groups, the 1-row total broadcast "
    "back. Output is 9 rows regardless of input scale.",
    oracle=_BENFORD_ORACLE,
)
def q93_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    obs = o.select(d.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = obs.agg(F.sum("n").alias("total"))
    share = F.col("n") * 1.0 / F.col("total")
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        obs.crossJoin(F.broadcast(tot))  # bounded: 1-row total
        .select(
            "digit",
            "n",
            fround(share, 6).alias("obs_share"),
            fround(benford, 6).alias("benford_share"),
            fround(share - benford, 6).alias("deviation"),
        )
    )


# --------------------------------------------------------------------------
# q98: embedding-quality audit
# --------------------------------------------------------------------------

_EMB_AUDIT_DIM = 64
_EMB_AUDIT_SCALE = 1 << 20

_EMB_AUDIT_ORACLE = f"""
WITH comps AS (
  SELECT vec_id, label,
         CAST(floor(embedding[i] * {_EMB_AUDIT_SCALE}) AS BIGINT) AS c,
         len(embedding) AS dim
  FROM embeddings, generate_series(1, {_EMB_AUDIT_DIM}) AS t(i)
),
per_vec AS (
  SELECT vec_id, label,
         max(dim) AS dim,
         sum(c * c) AS norm2_int,
         CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_comps
  FROM comps GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN dim <> {_EMB_AUDIT_DIM} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad_dim,
       CAST(sum(CASE WHEN norm2_int = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_vectors,
       CAST(sum(CASE WHEN label IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_labels,
       CAST(sum(n_zero_comps) AS BIGINT) AS n_zero_components,
       floor(sqrt(min(norm2_int)) / {_EMB_AUDIT_SCALE}.0 * 1000000 + 0.5) / 1000000
         AS min_norm,
       floor(sqrt(max(norm2_int)) / {_EMB_AUDIT_SCALE}.0 * 1000000 + 0.5) / 1000000
         AS max_norm
FROM per_vec
"""


@register(
    "q98_embedding_audit",
    "profiling",
    "Embedding-quality audit before ANN indexing / training: vector "
    "count, wrong-dimension count, zero-vector count (cosine is "
    "undefined on them — they poison similarity search silently), null "
    "labels, zero components, and the norm range (2^20-scaled integer "
    "norms, exact and engine-identical). One posexplode + per-vector "
    "partial aggregate + one global rollup to a SINGLE audit row; the "
    "pre-flight check every embedding pipeline should gate ingest on.",
    oracle=_EMB_AUDIT_ORACLE,
)
def q98_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    e = load_table(spark, sf_dir, "embeddings")
    c = F.floor(F.col("comp") * _EMB_AUDIT_SCALE).cast("long")
    per_vec = (
        e.select(
            "vec_id", "label", F.size("embedding").alias("dim"),
            F.posexplode("embedding").alias("pos", "comp"),
        )
        .groupBy("vec_id", "label")
        .agg(
            F.max("dim").alias("dim"),
            F.sum(c * c).alias("norm2_int"),
            F.sum((c == 0).cast("long")).alias("n_zero_comps"),
        )
    )
    scale = float(_EMB_AUDIT_SCALE)
    return per_vec.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum((F.col("dim") != _EMB_AUDIT_DIM).cast("long")).alias("n_bad_dim"),
        F.sum((F.col("norm2_int") == 0).cast("long")).alias("n_zero_vectors"),
        F.sum(F.col("label").isNull().cast("long")).alias("n_null_labels"),
        F.sum("n_zero_comps").alias("n_zero_components"),
        fround(F.sqrt(F.min("norm2_int")) / scale, 6).alias("min_norm"),
        fround(F.sqrt(F.max("norm2_int")) / scale, 6).alias("max_norm"),
    )


# --------------------------------------------------------------------------
# q99: order-independent table content digest
# --------------------------------------------------------------------------


def _digest_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    row = (
        "concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
        "o_orderstatus, CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), "
        "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority)"
    )
    h = sql_md5_int32(row)
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR) AS digest_sum,
       CAST(max({h}) AS BIGINT) AS digest_max
FROM orders
"""


@register(
    "q99_table_digest",
    "profiling",
    "Order-independent table content digest: each row renders to a "
    "canonical string (integer cents, explicit timestamp format — the "
    "q77 engine-stable conventions), hashes to a uint32, and the table "
    "digest is the SUM of row hashes as DECIMAL(38,0) — commutative and "
    "associative, so ANY partitioning, engine, or merge order yields "
    "the identical digest. The replication/migration equality check "
    "that pairs with q80_snapshot_diff: digests differ -> run the diff "
    "to localize. One scan, map-side partial sums, single-row output; "
    "at 100 TB compute per-partition digests the same way and store "
    "them as a re-aggregatable digest table.",
    oracle=_digest_oracle(),
)
def q99_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    row = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
        F.col("o_orderpriority"),
    )
    h = md5_int32(row)
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).cast("string").alias("digest_sum"),
        F.max(h).alias("digest_max"),
    )


# --------------------------------------------------------------------------
# q107: join-fanout preflight audit
# --------------------------------------------------------------------------

_FANOUT_ORACLE = """
WITH l AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
  FROM orders GROUP BY 1
)
SELECT 'lineitem.l_orderkey' AS side,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(c) AS BIGINT) AS max_rows_per_key,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
       CAST(sum(c) AS BIGINT) AS n_rows
FROM l
UNION ALL
SELECT 'orders.o_orderkey',
       CAST(count(*) AS BIGINT),
       CAST(max(c) AS BIGINT),
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(c) AS BIGINT)
FROM o
"""


@register(
    "q107_join_fanout_audit",
    "profiling",
    "Join-explosion preflight: per join side, key count, MAX rows per "
    "key, duplicate-key count, and total rows — the product of the two "
    "max-rows-per-key numbers bounds the worst per-key fanout of the "
    "join, and a many-to-many surprise (both sides > 1) is the classic "
    "silent row-multiplication bug. Two partially-aggregated count "
    "shuffles over the key columns only (column pruning leaves the "
    "rest on disk); at 100 TB this audit is cheaper than one wrong "
    "join re-run, which is the point of running it first.",
    oracle=_FANOUT_ORACLE,
)
def q107_join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    out = None
    for side, tbl, key in [
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
    ]:
        per_key = (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        agg = per_key.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_rows_per_key"),
            F.sum((F.col("c") > 1).cast("long")).alias("n_dup_keys"),
            F.sum("c").alias("n_rows"),
        ).select(F.lit(side).alias("side"), "*")
        out = agg if out is None else out.unionByName(agg)
    return out


# --------------------------------------------------------------------------
# q112: semi-structured (JSON) validity audit
# --------------------------------------------------------------------------

_JSON_MANGLE_MOD = 9  # corrupt every 9th record to exercise the bad path

_JSON_AUDIT_ORACLE = f"""
WITH feed AS (
  SELECT event_type,
         CASE WHEN event_id % {_JSON_MANGLE_MOD} = 0 THEN props || 'x'
              ELSE props END AS payload
  FROM events
),
parsed AS (
  SELECT event_type,
         CASE WHEN json_valid(payload) THEN 1 ELSE 0 END AS ok,
         CASE WHEN json_valid(payload)
              THEN CAST(json_extract(payload, '$.k') AS BIGINT) END AS k
  FROM feed
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(1 - ok) AS BIGINT) AS n_malformed,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(count(k) AS BIGINT) AS n_k
FROM parsed
GROUP BY event_type
"""


@register(
    "q112_json_quality",
    "profiling",
    "Semi-structured feed audit: a JSON payload stream with injected "
    "corruption (every 9th record prefixed with garbage, deterministically, so the "
    "oracle can mirror the feed) is parsed with malformed records "
    "COUNTED per group rather than crashing the job or silently "
    "vanishing — the quarantine accounting every JSON ingest needs. "
    "Spark's PERMISSIVE from_json routes unparseable input into a "
    "corrupt-record probe column and DuckDB's json_valid gates "
    "extraction; both engines agree record by record, including valid "
    "records that merely lack the audited field. Valid records "
    "contribute exact integer field sums. "
    "Scan-local parse, one small rollup shuffle.",
    oracle=_JSON_AUDIT_ORACLE,
)
def q112_json_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    payload = F.when(
        F.col("event_id") % _JSON_MANGLE_MOD == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    parsed = ev.select(
        "event_type",
        F.from_json(
            payload,
            "k long, _malformed string",
            {"columnNameOfCorruptRecord": "_malformed"},
        ).alias("j"),
    )
    # Syntactic-validity gate: PERMISSIVE from_json routes unparseable
    # input into the corrupt-record column, so ok mirrors DuckDB's
    # json_valid exactly — a VALID record that merely lacks k stays ok
    # (null k, excluded from count(k)/sum(k) on both engines).
    ok = F.col("j._malformed").isNull()
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((~ok).cast("long")).alias("n_malformed"),
        F.sum(F.col("j.k")).alias("sum_k"),
        F.count(F.col("j.k")).alias("n_k"),
    )


# --------------------------------------------------------------------------
# q168: join-key skew audit (the salting / AQE-skew preflight)
# --------------------------------------------------------------------------

_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def skew_summary_from_counts(k: DataFrame, label: str) -> DataFrame:
    """One-row skew summary from a (key, n) count table — shared by the
    batch audit and the streaming twin's additive count store. Hottest
    key folds into the SAME aggregate via lexicographic struct max:
    (n, -key) orders by count then by MIN key on ties — no second
    pass, no join back against the key table."""
    return k.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_rows"),
        (-F.max(F.struct(F.col("n"), (-F.col("key")).alias("nk")))["nk"])
        .cast("long")
        .alias("hottest_key"),
    ).select(
        F.lit(label).alias("join_key"),
        "n_rows",
        "n_keys",
        "max_key_rows",
        "hottest_key",
        F.expr("max_key_rows * n_keys * 1000 div n_rows")
        .cast("long")
        .alias("skew_x1000"),
    )


def _skew_arm_sql(col: str) -> str:
    return f"""(
  WITH k AS (
    SELECT {col} AS key, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY {col}
  )
  SELECT '{col}' AS join_key,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_key_rows,
         CAST(min(key) FILTER (WHERE n = (SELECT max(n) FROM k)) AS BIGINT)
           AS hottest_key,
         CAST(max(n) * count(*) * 1000 // sum(n) AS BIGINT) AS skew_x1000
  FROM k
)"""


_SKEW_ORACLE = "\nUNION ALL\n".join(
    f"SELECT * FROM {_skew_arm_sql(c)} arm_{c}" for c in _SKEW_KEYS
)


@register(
    "q168_skew_audit",
    "profiling",
    "Join-key skew audit over the fact table's three join keys: per key "
    "column, total rows, distinct keys, the heaviest key's row count "
    "and identity (deterministic min-key tiebreak), and skew_x1000 = "
    "max_key_rows / avg_rows_per_key in exact integer permille — the "
    "preflight that decides whether a join needs salting or AQE skew "
    "splitting BEFORE a 100 TB shuffle discovers it the hard way "
    "(skew_x1000 near 1000 = uniform; a hot key shows up as orders of "
    "magnitude). Cost per column is one map-side-combined groupBy to "
    "|keys| rows plus a 1-row rollup; the hottest-key pick folds into "
    "that same aggregate as a lexicographic (n, -key) struct max — one "
    "pass over the |keys| table, no self-join, never re-scans the fact.",
    oracle=_SKEW_ORACLE,
)
def q168_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    out = None
    for col in _SKEW_KEYS:
        k = li.groupBy(F.col(col).alias("key")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        arm = skew_summary_from_counts(k, col)
        out = arm if out is None else out.unionByName(arm)
    return out


# --------------------------------------------------------------------------
# q169: Merkle-style partition digests (diff localization at scale)
# --------------------------------------------------------------------------

_PD_BUCKETS = 64


def _pd_oracle() -> str:
    from spark_stream_kudu_spark.functions.hashing import sql_md5_int32

    row = (
        "concat_ws('|', CAST(okey AS VARCHAR), status, "
        "CAST(price_cents AS VARCHAR))"
    )
    h = sql_md5_int32(row)
    bucket = f"({sql_md5_int32('CAST(okey AS VARCHAR)')} % {_PD_BUCKETS})"
    pct = f"({sql_md5_int32('CAST(okey AS VARCHAR)')} % 100)"
    return f"""
WITH v1 AS (
  SELECT o_orderkey AS okey, o_orderstatus AS status,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders
),
v2 AS (
  SELECT okey, status,
         CASE WHEN {pct} = 0
              THEN CAST(floor(price_cents * 1.1 + 0.5) AS BIGINT)
              ELSE price_cents END AS price_cents
  FROM v1
),
d1 AS (
  SELECT {bucket} AS bucket, CAST(count(*) AS BIGINT) AS n_rows_v1,
         CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR) AS digest_v1
  FROM v1 GROUP BY 1
),
d2 AS (
  SELECT {bucket} AS bucket, CAST(count(*) AS BIGINT) AS n_rows_v2,
         CAST(sum(CAST({h} AS DECIMAL(38,0))) AS VARCHAR) AS digest_v2
  FROM v2 GROUP BY 1
)
SELECT coalesce(d1.bucket, d2.bucket) AS bucket,
       n_rows_v1, n_rows_v2, digest_v1, digest_v2,
       (digest_v1 IS DISTINCT FROM digest_v2) AS differs
FROM d1 FULL OUTER JOIN d2 ON d1.bucket = d2.bucket
"""


@register(
    "q169_partition_digests",
    "profiling",
    f"Merkle-style partition digests: both snapshot versions reduce to "
    f"{_PD_BUCKETS} (bucket, count, order-independent digest) rows — "
    "the q99 DECIMAL(38,0) row-hash sum per key-hash bucket — and "
    "comparing digests localizes WHERE two 100 TB tables differ before "
    "any row-level diff runs: only flagged buckets (here the ~1% of "
    "keys whose derived v2 price changed) proceed to the q80 full-outer "
    "row diff, so anti-entropy repair exchanges KB of digests instead "
    "of re-shuffling both tables. Each side is one scan with map-side "
    "partial digest sums; the digest compare joins two "
    f"{_PD_BUCKETS}-row tables (broadcast). v2 is derived "
    "deterministically from v1 by key-hash so the whole chain is "
    "oracle-checkable.",
    oracle=_pd_oracle(),
)
def q169_partition_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_stream_kudu_spark.functions.hashing import md5_int32

    tune_session(spark)
    v1 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
    )
    pct = md5_int32(F.col("okey").cast("string")) % 100
    v2 = v1.select(
        "okey",
        "status",
        F.when(
            pct == 0,
            F.floor(F.col("price_cents") * 1.1 + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.col("price_cents"))
        .alias("price_cents"),
    )

    def digests(v: DataFrame, tag: str) -> DataFrame:
        row = F.concat_ws(
            "|",
            F.col("okey").cast("string"),
            F.col("status"),
            F.col("price_cents").cast("string"),
        )
        return (
            v.groupBy(
                (md5_int32(F.col("okey").cast("string")) % _PD_BUCKETS).alias(
                    "bucket"
                )
            )
            .agg(
                F.count(F.lit(1)).alias(f"n_rows_{tag}"),
                F.sum(md5_int32(row).cast("decimal(38,0)"))
                .cast("string")
                .alias(f"digest_{tag}"),
            )
        )
    d1, d2 = digests(v1, "v1"), digests(v2, "v2")
    return (
        d1.join(d2, d1["bucket"] == d2["bucket"], "full_outer")
        .select(
            F.coalesce(d1["bucket"], d2["bucket"]).alias("bucket"),
            "n_rows_v1",
            "n_rows_v2",
            "digest_v1",
            "digest_v2",
            (~F.col("digest_v1").eqNullSafe(F.col("digest_v2"))).alias("differs"),
        )
    )


# --------------------------------------------------------------------------
# q174: k-anonymity audit with one generalization step
# --------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
WITH l0 AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nk,
         CAST(count(*) AS BIGINT) AS n0
  FROM customer GROUP BY 1, 2
),
l1 AS (
  SELECT c.c_mktsegment AS segment, n.n_regionkey AS rk,
         CAST(count(*) AS BIGINT) AS n1
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
)
SELECT l0.segment, CAST(l0.nk AS BIGINT) AS nationkey,
       CAST(n.n_regionkey AS BIGINT) AS regionkey,
       l0.n0 AS n_level0,
       l1.n1 AS n_level1,
       CAST(CASE WHEN l0.n0 >= {_KANON_K} THEN 0 ELSE 1 END AS BIGINT)
         AS generalized,
       (CASE WHEN l0.n0 >= {_KANON_K} THEN l0.n0 ELSE l1.n1 END
        < {_KANON_K}) AS at_risk
FROM l0
JOIN nation n ON n.n_nationkey = l0.nk
JOIN l1 ON l1.segment = l0.segment AND l1.rk = n.n_regionkey
"""


@register(
    "q174_k_anonymity",
    "profiling",
    f"k-anonymity audit (k={_KANON_K}) over the (segment, nation) "
    "quasi-identifier with ONE generalization step: combos whose "
    "level-0 group is under k are re-tested at level 1 (nation "
    "generalized to region — the domain-hierarchy climb every k-anon "
    "algorithm makes), and only combos still under k after "
    "generalizing are flagged at_risk. The governance complement to "
    "PII redaction (text_pii_redact) and targeted deletion: before a "
    "dataset ships, this is the re-identification risk report. Two "
    "map-side-combined groupBys (|combos| rows each) + broadcast "
    "nation dim; output is |combos|-sized regardless of table size.",
    oracle=_KANON_ORACLE,
)
def q174_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    l0 = c.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_level0"))
    cr = c.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),  # bounded: |nations|
        c["c_nationkey"] == F.col("n_nationkey"),
    )
    l1 = cr.groupBy(
        F.col("c_mktsegment").alias("segment"),
        F.col("n_regionkey").alias("regionkey"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_level1"))
    dim = F.broadcast(  # bounded: |nations|
        n.select(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_regionkey").alias("regionkey"),
        )
    )
    joined = l0.join(dim, "nationkey").join(l1, ["segment", "regionkey"])
    effective = F.when(
        F.col("n_level0") >= _KANON_K, F.col("n_level0")
    ).otherwise(F.col("n_level1"))
    return joined.select(
        "segment",
        F.col("nationkey").cast("long").alias("nationkey"),
        F.col("regionkey").cast("long").alias("regionkey"),
        "n_level0",
        "n_level1",
        F.when(F.col("n_level0") >= _KANON_K, 0)
        .otherwise(1)
        .cast("long")
        .alias("generalized"),
        (effective < _KANON_K).alias("at_risk"),
    )


# --------------------------------------------------------------------------
# q175: declared data-contract validation (expectations-style report)
# --------------------------------------------------------------------------

_CONTRACT_ORACLE = """
SELECT 'o_totalprice_nonneg' AS rule,
       CAST(count(*) AS BIGINT) AS n_checked,
       CAST(count(*) FILTER (WHERE o_totalprice IS NULL
            OR o_totalprice < 0 OR o_totalprice > 10000000) AS BIGINT)
         AS n_violations
FROM orders
UNION ALL
SELECT 'o_orderstatus_domain',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_orderstatus IS NULL
            OR o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderdate_range',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_orderdate IS NULL
            OR o_orderdate < TIMESTAMP '1992-01-01'
            OR o_orderdate >= TIMESTAMP '2005-01-01') AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_orderpriority_format',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE o_orderpriority IS NULL
            OR NOT regexp_matches(o_orderpriority, '^[1-5]-')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'o_custkey_references_customer',
       CAST(count(*) AS BIGINT),
       CAST(count(*) FILTER (WHERE NOT EXISTS (
            SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
         AS BIGINT)
FROM orders o
"""


@register(
    "q175_data_contract",
    "profiling",
    "Declared data-contract validation (the expectations-style intake "
    "gate): five rules over orders — numeric range, categorical "
    "domain, timestamp window, regex format, and referential existence "
    "— each reported as (rule, n_checked, n_violations). A healthy "
    "feed reports zeros; the query exists so the day a producer "
    "breaks the contract, the break is a NAMED rule with a count, not "
    "a downstream mystery. The four row-local rules fold into ONE "
    "aggregate over ONE scan (conditional counts); the FK rule is a "
    "broadcast anti-join count — at 100 TB the whole report costs one "
    "pass over the fact plus a dimension broadcast.",
    oracle=_CONTRACT_ORACLE,
)
def q175_data_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def viol(cond) -> F.Column:
        return F.sum(cond.cast("long")).cast("long")

    n = F.count(F.lit(1)).cast("long")
    wide = o.agg(
        n.alias("n_checked"),
        viol(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") < 0)
            | (F.col("o_totalprice") > 10_000_000)
        ).alias("v_price"),
        viol(
            F.col("o_orderstatus").isNull()
            | ~F.col("o_orderstatus").isin("O", "F", "P")
        ).alias("v_status"),
        viol(
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") < F.lit("1992-01-01").cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit("2005-01-01").cast("timestamp"))
        ).alias("v_date"),
        viol(
            F.col("o_orderpriority").isNull()
            | ~F.col("o_orderpriority").rlike("^[1-5]-")
        ).alias("v_prio"),
    )
    rules = wide.selectExpr(
        "stack(4, "
        "'o_totalprice_nonneg', n_checked, v_price, "
        "'o_orderstatus_domain', n_checked, v_status, "
        "'o_orderdate_range', n_checked, v_date, "
        "'o_orderpriority_format', n_checked, v_prio"
        ") AS (rule, n_checked, n_violations)"
    )
    fk = (
        # customer is entity-scale: un-hinted (stats/AQE decide).
        o.join(cust, o["o_custkey"] == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .crossJoin(o.agg(F.count(F.lit(1)).cast("long").alias("n_checked")))
        .select(
            F.lit("o_custkey_references_customer").alias("rule"),
            "n_checked",
            "n_violations",
        )
    )
    return rules.unionByName(fk)


# --------------------------------------------------------------------------
# q186: functional-dependency audit — schema-constraint discovery
# --------------------------------------------------------------------------

# Candidate FDs declared up front (the audit VERIFIES, it does not mine
# the exponential FD lattice): one true key dependency and three
# plausible-but-false ones a schema reviewer would actually test.
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
)

_FD_ORACLE = " UNION ALL ".join(
    f"""
SELECT '{lhs}->{rhs}' AS fd,
       CAST(count(*) AS BIGINT)                            AS n_lhs,
       CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(max(k) AS BIGINT)                              AS max_rhs_per_lhs,
       CAST(CASE WHEN max(k) = 1 THEN 1 ELSE 0 END AS BIGINT) AS holds
FROM (SELECT {lhs}, CAST(count(DISTINCT {rhs}) AS BIGINT) AS k
      FROM {tbl} GROUP BY {lhs})
"""
    for tbl, lhs, rhs in _FD_CANDIDATES
)


@register(
    "q186_fd_audit",
    "profiling",
    "Functional-dependency audit: for each declared candidate FD "
    "(lhs -> rhs) report the number of lhs groups, how many violate "
    "(more than one distinct rhs), the worst fan-out, and a holds "
    "flag — the schema-constraint verification a data-contract "
    "reviewer runs before trusting a column as a join key or "
    "denormalization target (complements q78's referential orphan "
    "audit and q175's row-level contract gate with COLUMN-level "
    "dependency structure). Each candidate costs one "
    "partially-aggregated groupBy(lhs) + a 1-row rollup — "
    "verification of a declared list, NOT mining of the exponential "
    "FD lattice; at 100 TB each check is a single keyed shuffle of "
    "the (lhs, rhs) projection, embarrassingly parallel across "
    "candidates.",
    oracle=_FD_ORACLE,
)
def q186_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    out = None
    for tbl, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, tbl)
        per_lhs = t.groupBy(lhs).agg(
            F.count_distinct(rhs).cast("long").alias("k")
        )
        one = per_lhs.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum(F.when(F.col("k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("k").cast("long").alias("max_rhs_per_lhs"),
            F.when(F.max("k") == 1, 1).otherwise(0).cast("long").alias("holds"),
        )
        out = one if out is None else out.unionByName(one)
    return out
