from odl_etl_spark.streaming.source import events_stream  # noqa: F401
from odl_etl_spark.streaming.windows import (  # noqa: F401
    session_agg,
    sliding_agg,
    tumbling_agg,
)
from odl_etl_spark.streaming.dedup import dedup_stream  # noqa: F401
