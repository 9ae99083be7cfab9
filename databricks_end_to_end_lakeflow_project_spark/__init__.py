"""PySpark-native lakehouse analytics engine.

A brand-new, idiomatic PySpark implementation of the capabilities of the
reference medallion-lakehouse project (``saikumar1182/
Databricks-End-to-End-Lakeflow-Project``, surveyed in ``SURVEY.md``):

- medallion pipeline runtime (bronze streaming ingest -> silver SCD1 CDC
  tables -> gold star schema), built as a DLT-style declarative DAG over
  Structured Streaming + batch DataFrames;
- a generic relational operator library (joins, aggregations, windows,
  set ops, scalar function packs) expressed with the DataFrame API so
  Catalyst owns the optimization;
- large-scale training-data-pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis,
  and multimodal-column plumbing.

Everything here derives from the public Apache Spark API; nothing is
ported from the reference's runtime (which delegates execution to
Databricks Spark/DLT — see SURVEY.md §4).
"""

from databricks_end_to_end_lakeflow_project_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
