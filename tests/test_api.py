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


def test_engine_facade_round2_surface(spark, sf_dir):
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.api import DroneGraphEngine

    eng = DroneGraphEngine(spark, sf_dir)
    # counter kernel through the facade
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    ).localCheckpoint()
    assert eng.traverse_counts(edges, ["a"], 2).count() == 2
    assert eng.path_count(edges, ["a"], "c", 2).first().path_count == 1
    # dedup + salted agg delegate correctly
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y z")], "doc_id long, text string"
    ).localCheckpoint()
    assert sorted(
        r.doc_id for r in eng.dedup_exact(docs).collect()
    ) == [1]
    got = eng.salted_agg(
        docs, ["text"], {"n": F.count(F.lit(1))}, salt_on="doc_id"
    ).first()
    assert got.n == 2


def test_package_shipping(spark):
    # workers must be able to import the package from any driver cwd
    # (pandas-UDF closures pickle by reference); ensure_package_shipped
    # zips the sources and addPyFile's them — idempotent per context
    import zipfile

    from graphdb_for_drones_spark import session as S

    S.ensure_package_shipped(spark)
    app = spark.sparkContext.applicationId
    assert app in S._SHIPPED
    S.ensure_package_shipped(spark)  # second call: no re-add, no error
    import glob
    import tempfile

    zips = glob.glob(
        tempfile.gettempdir() + "/graphdb_for_drones_spark-*.zip"
    )
    assert zips
    with zipfile.ZipFile(zips[0]) as zf:
        assert "graphdb_for_drones_spark/__init__.py" in zf.namelist()
        assert "graphdb_for_drones_spark/functions/crypto.py" in zf.namelist()


def test_run_recursive_row_limit_policy(spark):
    """VERDICT r8 #6: a >1M-accumulated-row native recursion must either
    succeed via the explicit opt-in or fail with the ENGINE's actionable
    message (naming the opt-in and the kernel route), never Spark's bare
    RECURSION_ROW_LIMIT_EXCEEDED.  The conf must be restored after the
    opt-in run (scoped escalation, not a silent global raise)."""
    import pytest

    from graphdb_for_drones_spark.api import (
        DroneGraphEngine,
        RecursionRowLimitExceeded,
        run_recursive,
    )

    eng = DroneGraphEngine(spark)
    # complete binary tree, depth 21: accumulated rows = 2^22 - 1 ≈ 4.2M
    depth = 21
    n_edges = 2 ** (depth + 1) - 2
    spark.range(2, n_edges + 2).selectExpr(
        "CAST(id / 2 AS BIGINT) AS src", "id AS dst"
    ).createOrReplaceTempView("tree_edges")
    q = """
WITH RECURSIVE walk AS (
  SELECT CAST(1 AS BIGINT) AS node
  UNION ALL
  SELECT e.dst FROM tree_edges e JOIN walk w ON e.src = w.node
)
SELECT COUNT(*) AS n FROM walk"""

    conf_key = "spark.sql.cteRecursionRowLimit"
    before = spark.conf.get(conf_key)
    # default limit (1M): engine message, not Spark's
    with pytest.raises(RecursionRowLimitExceeded, match="recursion_row_limit"):
        run_recursive(spark, q)
    with pytest.raises(RecursionRowLimitExceeded, match="traverse"):
        eng.run_recursive(q)
    # opt-in: succeeds, exact accumulated count, conf restored after
    rows = eng.run_recursive(q, recursion_row_limit=8_000_000)
    assert rows[0].n == 2 ** (depth + 1) - 1
    assert spark.conf.get(conf_key) == before
