"""Engine facade: SQL passthrough, native recursive CTE parity with the
iterative kernel, measurement protocol."""

import pytest

from graphdb_for_drones_spark.api import DroneGraphEngine, get_bench_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    eng = DroneGraphEngine(spark, SF)
    eng.register_testdata()
    return eng


def test_sql_passthrough(engine):
    assert engine.sql("SELECT COUNT(*) AS n FROM region").first().n == 5


def test_native_recursive_equals_kernel(engine):
    deleg = engine.sql(
        "SELECT c_custkey AS drone_id, "
        "CONCAT('N', CAST(c_nationkey AS STRING)) AS hq_id FROM customer"
    )
    engine.register("delegation", deleg)
    native = engine.sql(get_bench_query("N3", 3)).first().chain_count
    kernel = engine.chain_count(deleg, "N3", 3)
    assert native == kernel > 0


def test_benchmark_protocol(engine):
    res = engine.benchmark(
        engine.sql("SELECT COUNT(*) AS n FROM nation"), iterations=3, scenario="s"
    )
    assert res.iterations == 3 and res.tps > 0
