from graphdb_for_drones_spark.functions.crypto import (  # noqa: F401
    canonical_json_udf,
    sha256_hex,
    sign_ed25519_udf,
    verify_ed25519_udf,
    verify_vc_udf,
)
