"""The engine-side (spark.range) fixture twins must be ROW-IDENTICAL to
the driver-built originals — the scale sweep's correctness assertions
are only meaningful if the big graphs have exactly the reference shape."""

from graphdb_for_drones_spark.fixtures import (
    abac_tables,
    abac_tables_dist,
    delegation_hierarchy,
    delegation_hierarchy_edges_dist,
    flat_delegation,
    flat_delegation_dist,
    web_trust_chain,
    web_trust_chain_dist,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_flat_delegation_dist_identical(spark):
    assert _rows(flat_delegation_dist(spark, 37)) == _rows(
        flat_delegation(spark, 37)
    )


def test_web_trust_chain_dist_identical(spark):
    assert _rows(web_trust_chain_dist(spark, 13)) == _rows(
        web_trust_chain(spark, 13)
    )


def test_hierarchy_edges_dist_identical(spark):
    h = delegation_hierarchy(
        spark, num_regional=3, num_unit=5, num_squad=8, drones_per_squad=2
    )
    got = delegation_hierarchy_edges_dist(
        spark, num_regional=3, num_unit=5, num_squad=8, drones_per_squad=2
    )
    assert _rows(got) == _rows(h.delegation_relation)


def test_abac_tables_dist_identical(spark):
    a = abac_tables(spark, num_users=23, num_groups=5)
    b = abac_tables_dist(spark, num_users=23, num_groups=5)
    for field in ("user", "group", "resource", "member", "subgroup", "permission"):
        assert _rows(getattr(b, field)) == _rows(getattr(a, field)), field
