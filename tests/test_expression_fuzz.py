"""Cross-engine expression fuzz: the PORTABLE expression subset every
oracle is written in — the shared helper pairs (fround/sql_fround,
md5_int32/sql_md5_int32, tokens/sql_tokens) and the recurring idioms
(cents flooring, concat_ws row rendering, timestamp formatting under
the UTC session, integer div/% on non-negative longs, least/greatest,
bit_count(xor)) — evaluated on hypothesis-generated rows in BOTH
engines and compared exactly.

The fixed fixtures can only exercise the values they contain; this
fuzz walks the input space, so a latent divergence (a rounding tie, a
regex edge, a formatting difference) surfaces here as a failed example
instead of a red driver row three rounds later. Domains mirror the
documented contracts: cents flooring on quantized-decimal doubles, div
and % on non-negative integers (Spark truncates toward zero where
DuckDB floors — oracles only ever use non-negative operands, so the
fuzz pins exactly that domain).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.hashing import md5_int32, sql_md5_int32
from spark_stream_kudu_spark.functions.rounding import fround, sql_fround
from spark_stream_kudu_spark.functions.textutil import sql_tokens, tokens

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,|-_")
    ),
    min_size=0,
    max_size=40,
)
ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**12),        # a: non-negative long
        st.integers(min_value=1, max_value=10**6),         # b: positive long
        # quantized-decimal double (the money/measure domain the cents
        # idiom is documented for: 2-decimal values)
        st.integers(min_value=0, max_value=10**9).map(lambda c: c / 100.0),
        TEXT,                                              # s: string
        st.integers(min_value=0, max_value=4 * 10**9),     # t: epoch seconds
    ),
    min_size=1,
    max_size=10,
)


def _duck(rows: pd.DataFrame, sql: str):
    con = duckdb.connect()
    try:
        con.register("r", rows)
        return con.execute(sql).fetchall()
    finally:
        con.close()


@SETTINGS
@given(rows=ROWS)
def test_portable_expression_pairs_agree(spark, rows):
    pdf = pd.DataFrame(rows, columns=["a", "b", "c", "s", "t"])
    sdf = spark.createDataFrame(
        pdf, "a long, b long, c double, s string, t long"
    )
    got = sorted(
        tuple(r)
        for r in sdf.select(
            F.floor(F.col("c") * 100 + F.lit(0.5)).cast("long").alias("cents"),
            fround(F.col("c") / F.col("b"), 6).alias("fr"),
            md5_int32(F.col("s")).alias("h"),
            F.expr("a div b").cast("long").alias("d"),
            (F.col("a") % F.col("b")).cast("long").alias("m"),
            F.least("a", "b").cast("long").alias("lo"),
            F.bit_count(F.expr("a ^ b")).cast("long").alias("bits"),
            F.concat_ws("|", F.col("a").cast("string"), F.col("s")).alias("row"),
            F.date_format(F.timestamp_seconds("t"), "yyyy-MM-dd HH:mm:ss").alias(
                "ts"
            ),
            F.size(tokens(F.col("s"))).alias("ntok"),
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _duck(
            pdf,
            f"""
            SELECT CAST(floor(c * 100 + 0.5) AS BIGINT) AS cents,
                   {sql_fround('c / b', 6)} AS fr,
                   {sql_md5_int32('s')} AS h,
                   CAST(a // b AS BIGINT) AS d,
                   CAST(a % b AS BIGINT) AS m,
                   CAST(least(a, b) AS BIGINT) AS lo,
                   CAST(bit_count(xor(a, b)) AS BIGINT) AS bits,
                   CAST(a AS VARCHAR) || '|' || s AS row,
                   strftime(to_timestamp(t), '%Y-%m-%d %H:%M:%S') AS ts,
                   CAST(len({sql_tokens('s')}) AS BIGINT) AS ntok
            FROM r
            """,
        )
    )
    assert got == want
