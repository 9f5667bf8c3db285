from odl_etl_spark.io.sources import TABLES, load_table, load_tables, register_views  # noqa: F401
