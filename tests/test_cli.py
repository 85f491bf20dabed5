"""The __main__ CLI: list/show/catalog are registry-only (no Spark);
run is exercised via the library path everywhere else."""

from spark_stream_kudu_spark.__main__ import main


def test_cli_list_filters_by_category(capsys):
    assert main(["list", "--category", "graph"]) == 0
    out = capsys.readouterr().out
    assert "q86_pagerank" in out and "q165_shortest_paths" in out
    assert "dedup_exact" not in out


def test_cli_show_prints_contract(capsys):
    assert main(["show", "q01_pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "category:    aggregation" in out
    assert "SELECT" in out  # oracle SQL included


def test_cli_catalog_covers_every_query(capsys):
    from spark_stream_kudu_spark.registry import load_all

    assert main(["catalog"]) == 0
    out = capsys.readouterr().out
    for name in load_all():
        assert f"`{name}`" in out


def test_generated_catalog_is_committed_in_sync(capsys):
    """QUERIES.md must match what `catalog` generates for the current
    registry — a new or renamed query without a regenerated index
    fails here instead of shipping a stale catalog."""
    assert main(["catalog"]) == 0
    generated = capsys.readouterr().out
    with open("QUERIES.md") as f:
        committed = f.read()
    assert committed == generated


def test_bench_suites_reference_only_registered_queries():
    """The driver records BENCH_r{N}.json from bench.py; a renamed or
    dropped query would otherwise break that run at round end, silently
    costing the round its perf artifact. Pin both frozen suites to the
    registry here instead."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import BENCH_V2, BENCH_V3, BENCH_V4, BENCH_V5

    from spark_stream_kudu_spark.registry import load_all

    all_q = load_all()
    missing_v2 = [n for n in BENCH_V2 if n not in all_q]
    assert not missing_v2, missing_v2
    assert len(BENCH_V2) == 15
    missing_v3 = [n for n in BENCH_V3 if n not in all_q]
    assert not missing_v3, missing_v3
    assert len(BENCH_V3) == 5
    missing_v4 = [n for n in BENCH_V4 if n not in all_q]
    assert not missing_v4, missing_v4
    assert len(BENCH_V4) == 5
    missing_v5 = [n for n in BENCH_V5 if n not in all_q]
    assert not missing_v5, missing_v5
    assert len(BENCH_V5) == 8
    n_bench = sum(1 for s in all_q.values() if s.bench)
    assert n_bench == 34, f"frozen headline suite changed size: {n_bench}"
