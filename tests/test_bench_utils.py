"""Measurement harness: reference percentile indices and CSV shape."""

import csv

from graphdb_for_drones_spark.bench_utils import benchmark_query, write_results_csv


def test_benchmark_query_protocol():
    calls = []
    res = benchmark_query(lambda: calls.append(1), iterations=10, warmup=2, scenario="t")
    assert len(calls) == 12  # warmup not timed but executed
    assert res.iterations == 10
    assert res.p50_ms <= res.p95_ms <= res.p99_ms
    assert res.tps > 0


COLUMNS = {
    "scenario", "scale_up", "depth", "p50_ms", "p95_ms", "p99_ms", "tps",
    # reference resource-usage metric (1 Hz CPU%/RSS, avg/max/p95)
    "cpu_avg_pct", "cpu_max_pct", "cpu_p95_pct",
    "rss_avg_mb", "rss_max_mb", "rss_p95_mb",
}


def test_csv_shape(tmp_path):
    res = benchmark_query(lambda: None, iterations=5, scenario="s", scale_up=100, depth=4)
    p = tmp_path / "out.csv"
    write_results_csv([res], str(p))
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["scenario"] == "s"
    assert set(rows[0]) == COLUMNS
    assert float(rows[0]["rss_avg_mb"]) > 0  # monitor actually sampled


def test_protocol_sweep_shapes(spark):
    from graphdb_for_drones_spark.bench_protocol import sweep

    rs = sweep(spark, [50], [2], iterations=2)
    assert {r.scenario for r in rs} == {
        "flat_chain", "hierarchy", "wot_chain", "abac",
    }
    for r in rs:
        row = r.row()
        assert set(row) == COLUMNS
        assert row["tps"] > 0
        assert row["rss_avg_mb"] and row["rss_avg_mb"] > 0
