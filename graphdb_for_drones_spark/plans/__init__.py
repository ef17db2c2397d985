from graphdb_for_drones_spark.plans.queries import QUERIES, ORACLES  # noqa: F401
