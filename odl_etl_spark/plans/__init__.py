from odl_etl_spark.plans.inspect import (  # noqa: F401
    FACT_TABLES,
    audit_fact_broadcasts,
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    has_pushed_filters,
    pruned_columns,
    shuffle_count,
)
