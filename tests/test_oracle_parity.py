"""Oracle parity: every registered query with an oracle must match DuckDB
exactly — the same comparison the correctness gate runs (row count +
column names + order-insensitive canonical values).

Runs at sf0.001 by default (fast); set SPARK_GRAFT_SF_SMOKE=/root/testdata/sf0.01
to reproduce the gate's scale.
"""

import pytest

from spark_stream_kudu_spark.plans.oracle import compare_query, duckdb_connection
from spark_stream_kudu_spark.registry import load_all

ALL = load_all()


@pytest.fixture(scope="module")
def oracle_con(sf_smoke):
    con = duckdb_connection(sf_smoke)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(spark, sf_smoke, oracle_con, name):
    spec = ALL[name]
    res = compare_query(spark, spec, sf_smoke, con=oracle_con)
    assert res.ok, f"{name}: {res.mismatches}"
    if spec.oracle is not None:
        assert res.spark_rows == res.oracle_rows
        # Parity on an empty result proves nothing — every query must
        # select real rows at every fixture scale.
        assert res.spark_rows > 0, f"{name}: vacuous parity (0 rows)"
