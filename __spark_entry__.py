"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship traversal query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator inventory of
graphdb_for_drones_spark.plans (SURVEY.md §2) for the DuckDB correctness
gate at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graphdb_for_drones_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: recursive delegation traversal + mission-fact join
    (scenario A of the reference, 01_multi_layer/benchmark_scenario_a.py)."""
    return QUERIES["mission_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
