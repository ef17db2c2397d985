from graphdb_for_drones_spark.operators import dedup, similarity, text  # noqa: F401
