"""odl_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capability classes of
``mitodl/odl-etl`` (extract / transform / load ETL pipelines; see
``SURVEY.md``), generalized into a declarative DataFrame/SQL analytics
engine plus the LLM-training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB data lake needs.

Design rules (see SURVEY.md §4.2, §7):
  * DataFrame/SQL everywhere; Catalyst plans, never hand-scheduled RDDs.
  * Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only
    where expressions can't express the semantics.
  * Every relational operator is stock Catalyst — our work is operator
    *composition* (as-of join, MinHash-LSH, cosine top-k) and scale
    posture (AQE, broadcast dims, partitioned writes), not planner code.
"""

__version__ = "0.1.0"

from odl_etl_spark.session import get_spark  # noqa: F401
