from odl_etl_spark.functions.hashing import DEFAULT_SALT, salted_sha256  # noqa: F401
