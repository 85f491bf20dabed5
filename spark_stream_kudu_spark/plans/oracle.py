"""DuckDB-oracle comparison harness.

Mirrors the correctness gate: run a registered query on Spark and its
oracle SQL on DuckDB over the same parquet tables, then compare
row count + column names + order-insensitive values (columns sorted by
name, rows sorted canonically). Used by the test suite so every
operator is verified the same way the driver verifies it.
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from spark_stream_kudu_spark.registry import QuerySpec
from spark_stream_kudu_spark.sources.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the ten tables registered as views."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and 0.0
        return v + 0.0
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __repr__(self):  # pragma: no cover
        status = "OK" if self.ok else "FAIL"
        return f"<{self.name}: {status} spark={self.spark_rows} oracle={self.oracle_rows} {self.mismatches[:3]}>"


def compare_query(
    spark: SparkSession,
    spec: QuerySpec,
    sf_dir: str,
    con: duckdb.DuckDBPyConnection | None = None,
    float_ulps_note: bool = True,
) -> CompareResult:
    """Run spec on Spark and its oracle on DuckDB; compare canonically."""
    sdf = spec.builder(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)

    if spec.oracle is None:
        return CompareResult(spec.name, True, len(s_rows), -1, ["rows-only (no oracle)"])

    own = con is None
    con = con or duckdb_connection(sf_dir)
    try:
        cur = con.execute(spec.oracle)
        o_cols = [d[0] for d in cur.description]
        o_rows = [tuple(r) for r in cur.fetchall()]
    finally:
        if own:
            con.close()

    mismatches: list[str] = []
    sc, sr = canon_rows(s_cols, s_rows)
    oc, orr = canon_rows(o_cols, o_rows)
    if sc != oc:
        mismatches.append(f"columns differ: spark={sc} oracle={oc}")
    if len(sr) != len(orr):
        mismatches.append(f"row count differs: spark={len(sr)} oracle={len(orr)}")
    if not mismatches:
        for i, (a, b) in enumerate(zip(sr, orr)):
            if a != b:
                mismatches.append(f"row {i}: spark={a!r} oracle={b!r}")
                if len(mismatches) >= 5:
                    break
    return CompareResult(spec.name, not mismatches, len(sr), len(orr), mismatches)
