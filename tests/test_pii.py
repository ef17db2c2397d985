"""PII detection/redaction operator contracts on planted fixtures
(the catalog's customer_pii_scrub entry is oracle-checked in
tests/test_queries_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators import pii


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t, "g") for i, t in enumerate(texts)],
        "id long, text string, grp string",
    )
    return df.localCheckpoint()


def test_detectors_on_planted_fixtures(spark):
    df = _rows(
        spark,
        [
            "contact alice@example.com or bob.smith+x@sub.domain.org",
            "call 25-989-741-2988 now",
            "host 192.168.0.1 and 10.0.0.255",
            "ssn 123-45-6789 leaked",
            "Customer#000000042 ordered from Supplier#000000007",
            "nothing sensitive here",
        ],
    )
    out = df.select(
        "id",
        *[
            pii.pii_count(F.col("text"), k).alias(k)
            for k in ("email", "phone", "ipv4", "ssn", "entity_id")
        ],
    )
    got = {r.id: r for r in out.collect()}
    assert got[0].email == 2
    assert got[1].phone == 1
    assert got[2].ipv4 == 2
    assert got[3].ssn == 1
    assert got[4].entity_id == 2
    assert all(
        getattr(got[5], k) == 0
        for k in ("email", "phone", "ipv4", "ssn", "entity_id")
    )


def test_mask_pii_redacts_all_kinds(spark):
    df = _rows(
        spark,
        ["alice@example.com met Customer#000000042 at 10.0.0.1"],
    )
    masked = df.select(pii.mask_pii(F.col("text")).alias("m")).first().m
    assert masked == "[PII] met [PII] at [PII]"


def test_mask_pii_selected_kinds_only(spark):
    df = _rows(spark, ["alice@example.com met Customer#000000042"])
    masked = df.select(
        pii.mask_pii(F.col("text"), ("entity_id",)).alias("m")
    ).first().m
    assert masked == "alice@example.com met [PII]"


def test_pii_stats_rollup(spark):
    df = _rows(
        spark,
        [
            "alice@example.com and bob@x.io",
            "clean row",
            "Customer#000000001",
        ],
    )
    row = pii.pii_stats(df, "text", "grp").collect()[0]
    assert row.n_rows == 3
    assert row.n_email == 2
    assert row.n_entity_id == 1
    assert row.n_rows_with_pii == 2
