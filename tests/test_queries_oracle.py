"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet, compare row
count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

from graphdb_for_drones_spark.catalog import TABLES
from graphdb_for_drones_spark.plans import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(ORACLES[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert [c.lower() for c in sdf.columns] == duck_cols, "column names differ"
    assert len(spark_rows) == len(duck_rows), "row count differs"
    a, b = normalize(spark_rows), normalize(duck_rows)
    for ra, rb in zip(a, b):
        assert len(ra) == len(rb)
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9), (
                    name,
                    ra,
                    rb,
                )
            else:
                assert va == vb, (name, ra, rb)
