"""Shared helpers for the incremental-guard family (dedup_guard,
linkage_guard): persistent-index reads that distinguish "not created
yet" from "broken"."""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession


def read_parquet_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet(path)``, or None iff the path does not exist
    yet (the guards' first batch).  Any OTHER failure re-raises: a
    transient storage error swallowed here would silently drop every
    cross-batch match of the micro-batch — permanent recall loss the
    drain-equals-batch-sweep invariant cannot detect after the fact."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as ex:
        if ex.getErrorClass() == "PATH_NOT_FOUND":
            return None
        raise
