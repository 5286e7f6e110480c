"""Window-function breadth: lag/lead/ntile/first_value.

Complements plans/analytics.py's row_number/running-sum windows
(SURVEY.md §2 lists window functions as absent from the reference).
Determinism rule for every window here: the ORDER BY ends with a
unique key (o_orderkey), so ties cannot reorder across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.registry import query
from data_pipeline_with_hdfs_sql_integration_spark.session import apply_runtime_confs


@query(
    "window_lag_lead_ntile",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(lag(o_totalprice) OVER w AS DOUBLE) AS prev_price,
               CAST(lead(o_totalprice) OVER w AS DOUBLE) AS next_price,
               CAST(ntile(4) OVER w AS INTEGER) AS quartile,
               first_value(o_orderdate) OVER w AS first_order_date
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead/ntile/first_value over per-customer order history, "
    "ordered by (date, orderkey) so the frame is total and the result "
    "engine-independent. One shuffle on o_custkey + per-partition sort; "
    "all four functions share a single window spec, so Spark evaluates "
    "them in one Window operator pass.",
    tags=("window",),
)
def window_lag_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("o_orderdate").over(w).alias("first_order_date"),
    )
