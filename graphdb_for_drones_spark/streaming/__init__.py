from graphdb_for_drones_spark.streaming.cdc import (  # noqa: F401
    DEBEZIUM_SCHEMA,
    apply_cdc_batch,
    encode_envelope,
    parse_envelope,
    read_cdc_file_stream,
    read_cdc_kafka_stream,
    start_cdc_apply,
)
