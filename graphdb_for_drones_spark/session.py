"""SparkSession factory with scale-oriented defaults.

Tuned for the driver harness (local[N], single JVM) but every knob is the
one you would also set on a 1000-executor cluster: AQE on (runtime re-plan,
skew-join splitting), sensible shuffle partitioning, Arrow for the few
pandas-UDF paths, and broadcast threshold high enough that dimension tables
(region/nation at any SF) always broadcast.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# applicationIds whose workers already received the package zip
_SHIPPED: set[str] = set()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package's sources to the executors' Python workers.

    A pandas-UDF closure defined at module level pickles BY REFERENCE
    (module + name), so the worker must be able to ``import
    graphdb_for_drones_spark`` — true when the driver's cwd is the repo
    root (workers inherit it), false from any other cwd, and never
    guaranteed on a real cluster.  This is the library-side equivalent
    of ``spark-submit --py-files``: zip the package once (content-hashed
    name, so re-ships of identical code are no-ops even across driver
    processes) and ``addPyFile`` it; Spark appends the zip to every
    worker's sys.path.  Idempotent per SparkContext."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    names = []
    for root, _dirs, files in sorted(os.walk(pkg_dir)):
        for f in sorted(files):
            if f.endswith(".py"):
                names.append(os.path.join(root, f))
    h = hashlib.sha256()
    for p in names:
        with open(p, "rb") as fh:
            h.update(p.encode())
            h.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"graphdb_for_drones_spark-{h.hexdigest()[:16]}.zip",
    )
    if not os.path.exists(zpath):
        tmp = f"{zpath}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in names:
                arc = os.path.join(
                    "graphdb_for_drones_spark", os.path.relpath(p, pkg_dir)
                )
                zf.write(p, arc)
        os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    _SHIPPED.add(app)


def get_spark(
    app_name: str = "graphdb_for_drones_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    On a real cluster, omit ``master`` and submit via spark-submit; the
    configs below are cluster-size independent (AQE coalesces shuffle
    partitions at runtime, so ``shuffle_partitions`` is an upper bound,
    not a commitment).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r13 (guide §2.2/§2.5): AQE's parallelism-first coalescing is
        # overridden by the 1 MB minPartitionSize floor, which coalesced
        # compute-DENSE shuffles (pair verification reading 9 MB of
        # shingle arrays, 11.6 s CPU) onto 8 of 32 cores.  A 256 KB
        # floor lets such stages keep cluster parallelism while truly
        # tiny shuffles still collapse; at real scale the 64 MB advisory
        # size dominates and this floor is irrelevant.  Measured:
        # ngram_jaccard_prefix 3.8→1.9 s, minhash_pairs 3.2→2.5 s,
        # overhead-bound entries unchanged (A/B in OPTIMIZATION_r13.md).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # InferFiltersFromGenerate adds `size(arr) > 0 AND isnotnull(arr)`
        # under every explode; predicate pushdown then RE-SUBSTITUTES the
        # staged array expression into that filter and pushes it below the
        # spread exchange — so every shingle/gram pipeline evaluated its
        # whole hash fold TWICE, once single-threaded before the
        # repartition (found via per-stage REST metrics on the 13-gram
        # entry: two 1-task stages at ~3.6 s CPU each whose only job was
        # scan + filter + shuffle-write of 5k rows).  Our generator inputs
        # are never empty by construction (short docs carry a whole-text
        # shingle), so the inferred filter can only cost.  Correctness is
        # conf-independent — a plain session just pays the double fold.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
