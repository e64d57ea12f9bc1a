"""PySpark-native analytics engine with the capabilities of the
reference self-healing GCP data pipeline (see SURVEY.md).

Everything here is a declarative Spark plan: DataFrame/SQL in,
DataFrame out. Catalyst picks the physical strategy; operators only
shape the logical plan (broadcast hints, partitioning, pushdown-
friendly predicates).
"""

from selfhealingdatapipeline_gcp_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
