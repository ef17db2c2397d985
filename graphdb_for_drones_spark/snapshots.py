"""On-disk versioned snapshot storage — the restart-surviving version
story for mutation-while-querying (SURVEY §7.4-5).

The reference interleaves committed chunked updates with timed reads;
its committed state lives in PostgreSQL
(02_topology_dynamic/benchmark_scenario_a.py:25-46), so a measurement
can always name the transaction it read.  The Spark-native equivalent
here is a directory-versioned parquet table with a manifest:

    <root>/
      v=1/           one immutable parquet dir per committed version
      v=2/
      manifest.json  {"current": 2, "versions": [1, 2]}

Commit protocol (the Delta/Iceberg ordering, minus the transaction
log's generality): data files are fully written FIRST, the manifest is
swapped LAST via an atomic file rename — a version is visible if and
only if the manifest names it, so readers (including readers in a new
session, or a new process after a restart) never observe a partial
snapshot.  Versions are immutable once published; a pin is just a
version number, valid forever.

At cluster scale the same layout works on an object store (rename of a
single small manifest object); the per-version dirs are plain parquet,
so every reader optimization (pruning, pushdown) applies unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Versioned parquet snapshots under one root directory."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": None, "versions": []}
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._manifest_path)  # atomic publish

    # -- public API ----------------------------------------------------
    def versions(self) -> list[int]:
        return list(self._read_manifest()["versions"])

    def current_version(self) -> int | None:
        return self._read_manifest()["current"]

    def path_for(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    def commit(self, df: DataFrame) -> int:
        """Write ``df`` as the next version and publish it.  The parquet
        dir is complete before the manifest rename, so a crash mid-commit
        leaves an orphan data dir, never a readable partial version."""
        manifest = self._read_manifest()
        version = (manifest["current"] or 0) + 1
        df.write.mode("overwrite").parquet(self.path_for(version))
        manifest["versions"].append(version)
        manifest["current"] = version
        self._write_manifest(manifest)
        return version

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a pinned version (default: current).  Valid in any
        session/process — the pin is on-disk state only."""
        manifest = self._read_manifest()
        if version is None:
            version = manifest["current"]
        if version is None or version not in manifest["versions"]:
            raise ValueError(
                f"version {version!r} not committed at {self.root} "
                f"(have {manifest['versions']})"
            )
        return spark.read.parquet(self.path_for(version))


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Keyed table reconciliation FROM snapshot ``a`` TO snapshot ``b``
    — the data-diff primitive a CDC pipeline runs to validate an apply
    (and a training pipeline runs between corpus versions): per key,
    classify ``added`` (in b only), ``removed`` (in a only),
    ``changed`` (both, any value column differs — NULL-SAFE struct
    comparison, so NULL→value and value→NULL count as changes) or
    ``unchanged``, and return ONE row of exact counts
    (n_a, n_b, added, removed, changed, unchanged).

    Plan shape at 100 TB: each side reduces to (key, value-struct) —
    column-pruned scans — then ONE full-outer join on the key
    (co-partitioned exchange both sides) and a single global count
    aggregate with map-side combine; no row ever leaves its key
    partition.  Value columns that need order-independent exactness
    across engines (float aggregates) must be pre-reduced to exact
    types by the caller — the diff itself is pure comparison."""
    from pyspark.sql import functions as F

    ka = a.select(*key_cols, F.struct(*value_cols).alias("__va"))
    kb = b.select(*key_cols, F.struct(*value_cols).alias("__vb"))
    j = ka.join(kb, list(key_cols), "full_outer")
    in_a = F.col("__va").isNotNull()
    in_b = F.col("__vb").isNotNull()
    changed = in_a & in_b & ~F.col("__va").eqNullSafe(F.col("__vb"))
    unchanged = in_a & in_b & F.col("__va").eqNullSafe(F.col("__vb"))
    # coalesce: a diff of two EMPTY snapshots is all-zeros, not all-NULL
    cnt = lambda c: F.coalesce(  # noqa: E731
        F.sum(F.when(c, 1).otherwise(0)), F.lit(0)
    ).cast("long")
    return j.agg(
        cnt(in_a).alias("n_a"),
        cnt(in_b).alias("n_b"),
        cnt(~in_a & in_b).alias("added"),
        cnt(in_a & ~in_b).alias("removed"),
        cnt(changed).alias("changed"),
        cnt(unchanged).alias("unchanged"),
    )
