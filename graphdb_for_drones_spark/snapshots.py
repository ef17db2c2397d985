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
