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


def test_calib_band_factor_agrees_with_suites_ok_flag():
    """Round-10 verdict (What's wrong #1): the artifact used to emit
    host_factor_spark_worst_suite in FACTOR units next to
    calib_spark_band in SECONDS — a reader comparing the two reached
    the opposite verdict from calib_spark_suites_ok (e.g. the r11
    close: worst-suite factor 1.58 vs band upper 1.30 reads
    out-of-band, while the 1.01 s probe behind it is comfortably in
    band). calib_spark_band_factor is the same interval in factor
    units; this pins the conversion and that both readings of any
    probe value agree with the seconds gate."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import (
        CALIB_SPARK_BAND,
        CALIB_SPARK_REF_SEC,
        band_in_factor_units,
    )

    band_f = band_in_factor_units()
    assert band_f == [
        round(b / CALIB_SPARK_REF_SEC, 3) for b in CALIB_SPARK_BAND
    ]
    assert band_f[0] < 1.0 < band_f[1]  # a nominal host must be in band
    # Representative probe readings (seconds): the r11-close per-suite
    # probes, the round-open burst (2.71 s -> factor 4.23), a cold-JVM
    # first run, and both band edges.
    for probe_sec in (1.01, 0.745, 0.59, 0.71, 2.706, 0.92, 0.40, 1.30, 0.39, 1.31):
        gate = CALIB_SPARK_BAND[0] <= probe_sec <= CALIB_SPARK_BAND[1]
        reader = band_f[0] <= round(probe_sec / CALIB_SPARK_REF_SEC, 3) <= band_f[1]
        assert reader == gate, probe_sec
