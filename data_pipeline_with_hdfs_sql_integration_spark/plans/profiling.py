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


@query(
    "audit_referential_integrity",
    oracle="""
        SELECT 'lineitem->orders' AS relation,
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans
        UNION ALL
        SELECT 'orders->customer',
               CAST((SELECT count(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        UNION ALL
        SELECT 'customer->nation',
               CAST((SELECT count(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
        UNION ALL
        SELECT 'nation->region',
               CAST((SELECT count(*) FROM nation n
                     WHERE NOT EXISTS (SELECT 1 FROM region r
                                       WHERE r.r_regionkey = n.n_regionkey)) AS BIGINT)
        UNION ALL
        SELECT 'lineitem->part',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM part p
                                       WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
        UNION ALL
        SELECT 'lineitem->supplier',
               CAST((SELECT count(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                       WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
        ORDER BY relation
    """,
    doc="Referential-integrity audit: orphan counts for every foreign-key "
    "edge of the star schema in one result. Each check is a LEFT ANTI "
    "join count; dimension parents broadcast explicitly, fact-sized "
    "parents (orders, customer) shuffle — AQE downgrades those to "
    "broadcast at small SF on its own. The data-quality guard an ETL "
    "pipeline runs after every load; the reference has no integrity "
    "checking at all (it trusts MySQL's dump, server.py:33-39).",
    tags=("profiling", "quality"),
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)

    def orphans(
        name: str,
        child: DataFrame,
        ckey: str,
        parent: DataFrame,
        pkey: str,
        small_parent: bool,
    ) -> DataFrame:
        # Broadcast only parents that stay small at any scale (the
        # dimension tables). Fact-sized parents (orders, customer)
        # must shuffle-anti-join — forcing a broadcast there would be
        # the classic does-not-survive-100TB bug; AQE still downgrades
        # to broadcast at small SF on its own.
        keys = parent.select(pkey)
        if small_parent:
            keys = F.broadcast(keys)
        n = child.join(keys, child[ckey] == F.col(pkey), "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        return n.select(F.lit(name).alias("relation"), "n_orphans")

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")
    checks = [
        orphans("lineitem->orders", li, "l_orderkey", orders, "o_orderkey", False),
        orphans("orders->customer", orders, "o_custkey", customer, "c_custkey", False),
        orphans("customer->nation", customer, "c_nationkey", nation, "n_nationkey", True),
        orphans("nation->region", nation, "n_regionkey", region, "r_regionkey", True),
        orphans("lineitem->part", li, "l_partkey", part, "p_partkey", True),
        orphans("lineitem->supplier", li, "l_suppkey", supplier, "s_suppkey", True),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("relation")
