"""PySpark-native analytics engine with the workload surface of
Sam-7878/graphdb_for_drones (reference at /root/reference, studied for
behavior only — all execution here is Spark DataFrame / SQL / Structured
Streaming).

The reference is a benchmark+demo suite that drives external engines
(PostgreSQL, AgensGraph, SQLite, Kafka).  This package IS the engine those
demos outsource to: property-graph traversal, DID/VC verification, mutation
workloads, CDC streaming, and the measurement harness — re-expressed
Spark-first, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from graphdb_for_drones_spark.session import get_spark  # noqa: F401
from graphdb_for_drones_spark.graph import DroneGraph  # noqa: F401

__version__ = "0.1.0"
