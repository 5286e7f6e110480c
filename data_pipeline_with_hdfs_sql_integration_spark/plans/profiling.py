"""Data-quality profiling: per-column statistics in long form.

The profile every ingestion pipeline runs before trusting a feed:
row/null/distinct counts and min/max per column, one output row per
column. Built from explicit aggregates (not df.summary(), whose
approximate quantiles are seed-dependent and un-oracle-able). All
columns profile in a single pass — one aggregate node computes every
(col × stat) cell, so the fact table is scanned once no matter how
wide the profile is.

String form for min/max keeps the row shape uniform across column
types; numerics go through DECIMAL so both engines print identical
text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.registry import query
from data_pipeline_with_hdfs_sql_integration_spark.session import apply_runtime_confs


@query(
    "profile_orders",
    oracle="""
        SELECT 'o_orderkey' AS col, count(*) AS n_rows,
               count(o_orderkey) AS n_present,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_value,
               CAST(max(o_orderkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
               CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate', count(*), count(o_orderdate),
               count(DISTINCT o_orderdate),
               CAST(min(o_orderdate) AS VARCHAR),
               CAST(max(o_orderdate) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*), count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
    """,
    doc="Per-column data-quality profile of orders (long form: one row "
    "per column with row/present/distinct counts and min/max as text). "
    "All four columns profile in ONE aggregate over ONE scan — the "
    "20-cell profile costs the same shuffle as a single count.",
    tags=("profiling", "quality"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    o = load(spark, sf_dir, "orders")
    # min/max aggregate on the NATIVE type (numeric/timestamp order,
    # not lexicographic), then the one-row result is stringified.
    stringify: dict[str, object] = {
        "o_orderkey": lambda c: c.cast("string"),
        "o_totalprice": lambda c: c.cast("decimal(18,2)").cast("string"),
        "o_orderdate": lambda c: c.cast("string"),
        "o_orderpriority": lambda c: c,
    }
    specs = list(stringify.items())
    agg_cols: list[Column] = []
    for name, to_s in specs:
        agg_cols += [
            F.count("*").alias(f"{name}__n_rows"),
            F.count(name).alias(f"{name}__n_present"),
            F.countDistinct(name).alias(f"{name}__n_distinct"),
            to_s(F.min(name)).alias(f"{name}__min"),
            to_s(F.max(name)).alias(f"{name}__max"),
        ]
    wide = o.agg(*agg_cols)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("col"),
                F.col(f"{name}__n_rows").alias("n_rows"),
                F.col(f"{name}__n_present").alias("n_present"),
                F.col(f"{name}__n_distinct").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_value"),
                F.col(f"{name}__max").alias("max_value"),
            )
            for name, _ in specs
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
