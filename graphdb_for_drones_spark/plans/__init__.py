from graphdb_for_drones_spark.plans.queries import QUERIES, ORACLES
from graphdb_for_drones_spark.plans.llm_queries import LLM_QUERIES, LLM_ORACLES
from graphdb_for_drones_spark.plans.extra_queries import (
    EXTRA_QUERIES,
    EXTRA_ORACLES,
)

QUERIES = {**QUERIES, **LLM_QUERIES, **EXTRA_QUERIES}
ORACLES = {**ORACLES, **LLM_ORACLES, **EXTRA_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
