"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference pipeline (V1R4V/Data-Pipeline-with-HDFS-SQL-Integration).

Architecture: DataFrame/SQL plans optimized by Catalyst; no custom
execution engine. The reference's three verbs (DbToHdfs,
BlockLocations, CalcAvgLoan — see SURVEY.md §3) become `api.Pipeline`
methods; its operator surface (SURVEY.md §2) plus large-scale
training-data extensions (dedup, similarity search, text analysis,
multimodal, streaming) are exposed as named queries in
`registry.QUERIES`, each paired with a DuckDB oracle for correctness
checking.
"""

from data_pipeline_with_hdfs_sql_integration_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
