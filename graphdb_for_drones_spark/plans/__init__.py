from graphdb_for_drones_spark.plans.queries import QUERIES, ORACLES
from graphdb_for_drones_spark.plans.llm_queries import LLM_QUERIES, LLM_ORACLES

QUERIES = {**QUERIES, **LLM_QUERIES}
ORACLES = {**ORACLES, **LLM_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
