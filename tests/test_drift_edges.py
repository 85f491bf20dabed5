"""Cross-engine edge cases in the drift family (round-3 ADVICE items).

The standard fixtures never trigger these paths (every type has 30
days, every category exists in both periods), so this test builds a
tiny adversarial events table on disk and runs BOTH the Spark builder
and the DuckDB oracle over it — the same comparison the driver gate
does, pointed at the data that used to diverge:

- q126: a category with zero reference-period rows (ca=0) must get an
  explicit novel=1 flag and NULL contribution in both engines, not a
  Spark-NULL-vs-DuckDB-inf split.
- q143: a series shorter than two motif windows must produce no row in
  both engines (Spark's descending sequence() used to emit garbage
  pairs where DuckDB's generate_series was empty).
- q146: a single-day series (sample variance undefined) must be
  excluded by both engines.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pytest

from spark_stream_kudu_spark.registry import load_all

ALL = load_all()

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def edge_sf(spark, sf_smoke, tmp_path_factory):
    """A copy of the smoke fixture whose events table is replaced by an
    adversarial one: type 'novel_cat' exists only after the drift
    split; type 'one_day' has a single day of data (and is also
    shorter than two motif windows); 'steady' is a normal 30-day
    series."""
    base = str(tmp_path_factory.mktemp("edge_sf"))
    for t in _TABLES:
        if t == "events":
            continue
        os.symlink(os.path.join(sf_smoke, f"{t}.parquet"),
                   os.path.join(base, f"{t}.parquet"))
    rows = []
    eid = 0
    for day in range(1, 31):
        ts = datetime.datetime(2024, 1, day, 12, 0, 0)
        for _ in range(3):
            rows.append((eid, ts, "steady", 1000 + eid % 7, 10.0 + eid % 5))
            eid += 1
        if day >= 20:  # only in the current period (split = Jan 16)
            rows.append((eid, ts, "novel_cat", 2000, 5.0))
            eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 10, 9, 0, 0), "one_day", 3000, 1.0))
    eid += 1
    rows.append((eid, datetime.datetime(2024, 1, 10, 15, 0, 0), "one_day", 3000, 2.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, user_id long, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "_ev"))
    import glob
    import shutil

    part = glob.glob(os.path.join(base, "_ev", "part-*.parquet"))[0]
    shutil.move(part, os.path.join(base, "events.parquet"))
    return base


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _compare(spark, sf_dir: str, name: str):
    spec = ALL[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    ddf = _oracle(sf_dir, spec.oracle)
    cols = sorted(sdf.columns)
    assert cols == sorted(ddf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    d = ddf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(d), (name, len(s), len(d))
    assert s.astype(str).equals(d.astype(str)), (
        name,
        s.head(10).to_string(),
        d.head(10).to_string(),
    )
    return sdf


def test_chisq_novel_category_flagged_not_inf(spark, edge_sf):
    out = _compare(spark, edge_sf, "q126_chisq_drift")
    by_type = {r.event_type: r for _, r in out.iterrows()}
    assert by_type["novel_cat"].novel == 1
    assert by_type["novel_cat"].chisq_contrib is None or (
        by_type["novel_cat"].chisq_contrib != by_type["novel_cat"].chisq_contrib
    )  # NULL/NaN, never inf
    assert by_type["steady"].novel == 0
    assert by_type["steady"].chisq_contrib == by_type["steady"].chisq_contrib


def test_motif_short_series_emits_no_row_in_both_engines(spark, edge_sf):
    out = _compare(spark, edge_sf, "q143_motif_discovery")
    types = set(out.event_type)
    assert "steady" in types  # 30 days >= 2 windows
    assert "one_day" not in types  # < 2 windows: no motif pair
    assert "novel_cat" not in types  # 11 days < 14: excluded too


def test_fano_single_day_series_excluded(spark, edge_sf):
    out = _compare(spark, edge_sf, "q146_fano_factor")
    types = set(out.event_type)
    assert "steady" in types
    assert "one_day" not in types  # d=1: sample variance undefined
