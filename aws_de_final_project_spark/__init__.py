"""aws_de_final_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``zcauchon/AWS_DE_Final_Project`` (an AWS
Glue/Athena/Lambda ETL + analytics stack over the Chicago-crimes
dataset), extended with the operators a large-scale LLM training-data
pipeline needs (dedup, similarity search, multimodal columns, text
analysis).

Design stance (see SURVEY.md §7):

* Everything declarative: DataFrame / Spark SQL, optimized by Catalyst.
  Zero custom planner rules are needed for parity (SURVEY.md §4).
* The reference's AWS orchestration (EventBridge/CloudTrail/Glue
  workflow triggers, ``CDK/cdk/cdk_stack.py:175-291``) collapses into
  ordinary Python control flow in :mod:`.pipeline`.
* Scale posture: partitioned columnar storage, broadcast dimension
  joins, AQE, LSH instead of O(n^2) similarity — designed for a
  1000-executor cluster even though tests run on ``local[32]``.
"""

__version__ = "0.1.0"

from aws_de_final_project_spark.session import get_spark  # noqa: F401
