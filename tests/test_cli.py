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
