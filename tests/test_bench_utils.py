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


def test_csv_shape(tmp_path):
    res = benchmark_query(lambda: None, iterations=5, scenario="s", scale_up=100, depth=4)
    p = tmp_path / "out.csv"
    write_results_csv([res], str(p))
    with open(p) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["scenario"] == "s"
    assert set(rows[0]) == {"scenario", "scale_up", "depth", "p50_ms", "p95_ms", "p99_ms", "tps"}


def test_protocol_sweep_shapes(spark):
    from graphdb_for_drones_spark.bench_protocol import sweep

    rs = sweep(spark, [50], [2], iterations=2)
    assert {r.scenario for r in rs} == {"flat_chain", "hierarchy", "wot_chain"}
    for r in rs:
        row = r.row()
        assert set(row) == {
            "scenario", "scale_up", "depth", "p50_ms", "p95_ms", "p99_ms", "tps",
        }
        assert row["tps"] > 0
