"""Mutation layer: delete/update/upsert/redelegate rewrites preserve the
reference's workload semantics (M3–M8)."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.fixtures import flat_delegation
from graphdb_for_drones_spark.mutation import (
    create_edges_from,
    delete_by_keys,
    delete_edges_to,
    redelegate,
    upsert,
)


@pytest.fixture()
def delegation(spark):
    return flat_delegation(spark, n=100, hq_id="HQ1")


def test_redelegate_chunk(spark, delegation):
    # 03_equalization: UPDATE delegation SET hq_id=%s WHERE drone_id=ANY(%s)
    moved = redelegate(delegation, list(range(30)), "HQ2")
    counts = {r.hq_id: r.n for r in moved.groupBy("hq_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {"HQ1": 70, "HQ2": 30}


def test_delete_by_keys(spark, delegation):
    out = delete_by_keys(delegation, [1, 2, 3], "drone_id")
    assert out.count() == 97
    assert out.filter(F.col("drone_id").isin(1, 2, 3)).count() == 0


def test_delete_with_predicate(spark, delegation):
    # DELETE ... WHERE drone_id = ANY(...) AND hq_id = 'HQX' → no rows match
    out = delete_by_keys(delegation, [1, 2], "drone_id", F.col("hq_id") == "HQX")
    assert out.count() == 100


def test_upsert_latest_wins(spark, delegation):
    updates = spark.createDataFrame(
        [(1, "HQ9"), (999, "HQ9")], "drone_id long, hq_id string"
    )
    out = upsert(delegation, updates, ["drone_id"])
    assert out.count() == 101  # 100 existing, 1 inserted (999), 1 replaced
    got = {r.drone_id: r.hq_id for r in out.filter(F.col("drone_id").isin(1, 999)).collect()}
    assert got == {1: "HQ9", 999: "HQ9"}


def test_edge_delete_create_roundtrip(spark):
    edges = spark.createDataFrame(
        [("HQ1", f"D{i}", "DELEGATES") for i in range(10)],
        "src string, dst string, label string",
    ).coalesce(1).localCheckpoint()
    # 02_topology_dynamic scenario: delete a chunk's edges, re-create from HQ2
    chunk = [f"D{i}" for i in range(4)]
    cut = delete_edges_to(edges, chunk, "DELEGATES")
    assert cut.count() == 6
    redone = create_edges_from(cut, "HQ2", chunk)
    assert redone.count() == 10
    assert redone.filter((F.col("src") == "HQ2")).count() == 4


def test_set_vertex_property_bulk(spark):
    # M9: MATCH (d:Drone) SET d.hqId = 'HQ1'
    # (reference 02_topology_dynamic/setup_scenario_c.py:103)
    from graphdb_for_drones_spark.mutation import set_vertex_property

    vertices = spark.createDataFrame(
        [
            ("D1", "Drone", "HQ_old"),
            ("D2", "Drone", None),
            ("HQ1", "HQ", None),
        ],
        "id string, label string, hqId string",
    ).localCheckpoint()
    out = set_vertex_property(vertices, "Drone", "hqId", "HQ1")
    got = {r.id: r.hqId for r in out.collect()}
    # every Drone updated (including null-valued), other labels untouched
    assert got == {"D1": "HQ1", "D2": "HQ1", "HQ1": None}
    assert out.count() == 3  # no rows created or dropped


def test_set_vertex_property_new_column(spark):
    from graphdb_for_drones_spark.mutation import set_vertex_property

    vertices = spark.createDataFrame(
        [("D1", "Drone"), ("HQ1", "HQ")], "id string, label string"
    ).localCheckpoint()
    out = set_vertex_property(vertices, "Drone", "hqId", "HQ1")
    got = {r.id: r.hqId for r in out.collect()}
    assert got == {"D1": "HQ1", "HQ1": None}  # new property born null elsewhere
