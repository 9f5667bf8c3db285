from odl_etl_spark.pipelines.user_map import run_user_map  # noqa: F401
from odl_etl_spark.pipelines.artifact_sync import run_artifact_sync  # noqa: F401
