from odl_etl_spark.operators.asof import asof_join  # noqa: F401
