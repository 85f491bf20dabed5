"""Batch parquet sources with a contract-first schema registry.

The reference mixes three schema styles (SURVEY.md §1.3): explicit
StructType (KafkaToKuduJava.java:97-99), inference from typed RDDs
(kafka_to_kudu.py:25-28), and external DDL (ddl/create_impala_kudu_table.sql:4-13).
This engine standardizes on explicit declared schemas: ``SCHEMAS`` is
the contract, ``load_table`` reads and (cheaply, from the parquet
footer) verifies it.

Scale notes: a plain ``spark.read.parquet`` keeps Catalyst free to push
filters and prune columns into the scan; never pre-collect or cache
here. At 100 TB the same call reads a partitioned directory tree and
partition pruning composes with the declared predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, dt, True) for n, dt in fields])


_LONG, _INT, _DBL, _STR, _TS = (
    T.LongType(),
    T.IntegerType(),
    T.DoubleType(),
    T.StringType(),
    T.TimestampType(),
)

# Declared engine-facing schemas (FIXTURES.md §B).  ``events.ts`` is
# declared as TimestampType even though the parquet footer holds
# TIMESTAMP(NANOS): the loader converts ns -> us with integer division,
# matching DuckDB's ns->us truncation bit-for-bit.
SCHEMAS: dict[str, T.StructType] = {
    "region": _schema(("r_regionkey", _INT), ("r_name", _STR)),
    "nation": _schema(("n_nationkey", _INT), ("n_name", _STR), ("n_regionkey", _INT)),
    "customer": _schema(
        ("c_custkey", _LONG),
        ("c_name", _STR),
        ("c_nationkey", _INT),
        ("c_acctbal", _DBL),
        ("c_mktsegment", _STR),
    ),
    "supplier": _schema(
        ("s_suppkey", _LONG), ("s_name", _STR), ("s_nationkey", _INT), ("s_acctbal", _DBL)
    ),
    "part": _schema(
        ("p_partkey", _LONG),
        ("p_name", _STR),
        ("p_brand", _STR),
        ("p_type", _STR),
        ("p_size", _INT),
        ("p_retailprice", _DBL),
    ),
    "orders": _schema(
        ("o_orderkey", _LONG),
        ("o_custkey", _LONG),
        ("o_orderstatus", _STR),
        ("o_totalprice", _DBL),
        ("o_orderdate", _TS),
        ("o_orderpriority", _STR),
    ),
    "lineitem": _schema(
        ("l_orderkey", _LONG),
        ("l_partkey", _LONG),
        ("l_suppkey", _LONG),
        ("l_linenumber", _INT),
        ("l_quantity", _DBL),
        ("l_extendedprice", _DBL),
        ("l_discount", _DBL),
        ("l_tax", _DBL),
        ("l_returnflag", _STR),
        ("l_linestatus", _STR),
        ("l_shipdate", _TS),
    ),
    "events": _schema(
        ("event_id", _LONG),
        ("ts", _TS),
        ("user_id", _LONG),
        ("event_type", _STR),
        ("value", _DBL),
        ("props", _STR),
    ),
    "documents": _schema(
        ("doc_id", _LONG),
        ("text", _STR),
        ("lang", _STR),
        ("source", _STR),
        ("n_chars", _LONG),
    ),
    "embeddings": _schema(
        ("vec_id", _LONG), ("embedding", T.ArrayType(T.FloatType())), ("label", _INT)
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one synthetic table; plain column-prunable parquet scan."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # The driver's events parquet stores TIMESTAMP(NANOS) -> read
        # raw ns as long (spark.sql.legacy.parquet.nanosAsLong, set by
        # tune_session), then truncate to microseconds with *integer*
        # division — a double division would lose precision above
        # 2^53 ns. Type-adaptive: an events table already written with
        # standard µs timestamps (user data, test fixtures) passes
        # through untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count of one source table from its parquet footers.

    Driver-side metadata read (no Spark job): footers already hold the
    per-row-group counts, so this is milliseconds regardless of table
    size — the same information Spark's own count-star metadata
    optimization uses. Feed it to ``functions.joins.gated_broadcast``
    as the row bound for derived tables whose cardinality is a known
    fraction of a source table (e.g. a ``vec_id % k == 0`` codebook is
    ceil(|embeddings| / k) rows).
    """
    import glob
    import os

    import pyarrow.parquet as pq

    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    root = os.path.join(sf_dir, f"{name}.parquet")
    files = (
        [root]
        if os.path.isfile(root)
        else sorted(glob.glob(os.path.join(root, "*.parquet")))
    )
    return sum(pq.read_metadata(f).num_rows for f in files)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view for the SQL-text entry point.

    Mirrors the reference's name-addressed relations
    (registerTempTable at kafka_to_kudu.py:30, KafkaToKuduJava.java:102).
    """
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
