"""PySpark-native geospatial lakehouse engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference spatial lakehouse
(aoneil42/Iceberg-Geospatial-API-Server) on Apache Spark:
DataFrame/SQL planning via Catalyst, geometry as WKB binary columns
with numpy-vectorized codecs, and large-scale LLM-data-pipeline
operators (dedup, ANN, text analysis, multimodal plumbing).
"""

from iceberg_geospatial_api_server_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
