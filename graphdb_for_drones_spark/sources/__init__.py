from graphdb_for_drones_spark.sources.io import (  # noqa: F401
    read_json_docs,
    read_jdbc_table,
    write_csv_results,
    write_json_docs,
)
