"""Deterministic sampling operators.

`df.sample()` is seed-dependent *per partition layout*, so its output
changes with split planning — useless for a cross-engine oracle and
dangerous for reproducible 100 TB pipelines (a repartition silently
changes the sample). These operators hash the row KEY instead: a row
is in the sample iff h(key) mod D < rate·D. Fully deterministic,
partition-layout-independent, cheap (one affine mod per row, inside
codegen), and the sample is stable under re-runs, engine changes, and
data re-layout — the property a training-data pipeline actually needs.

h(k) = (A·k + B) mod P with P = 1e9+7 (same constants as
functions/textfns.py MinHash family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.functions.textfns import MOD
from data_pipeline_with_hdfs_sql_integration_spark.registry import query
from data_pipeline_with_hdfs_sql_integration_spark.session import apply_runtime_confs

HASH_A = 104_729
HASH_B = 12_345


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key."""
    return ((key.cast("long") * HASH_A + HASH_B) % MOD) % buckets


def sql_hash_bucket(expr: str, buckets: int = 100) -> str:
    return f"(((CAST({expr} AS BIGINT) * {HASH_A} + {HASH_B}) % {MOD}) % {buckets})"


@query(
    "sample_hash_bernoulli",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sampled_price
        FROM orders
        WHERE {sql_hash_bucket('o_orderkey')} < 10
        GROUP BY o_orderstatus
    """,
    doc="Deterministic 10% Bernoulli sample of orders keyed by "
    "h(o_orderkey): the filter is an arithmetic predicate, so it rides "
    "the normal scan (no shuffle, no RNG state), and the same 10% of "
    "keys is selected no matter how the data is partitioned or which "
    "engine runs it — reproducible subsampling for 100 TB pipelines.",
    tags=("sampling",),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    o = load(spark, sf_dir, "orders").filter(hash_bucket(F.col("o_orderkey")) < 10)
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sampled_price"),
    )


@query(
    "sample_stratified",
    oracle=f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_sampled
        FROM customer
        WHERE {sql_hash_bucket('c_custkey')} <
              CASE c_mktsegment WHEN 'BUILDING' THEN 40
                                WHEN 'MACHINERY' THEN 20
                                ELSE 5 END
        GROUP BY c_mktsegment
    """,
    doc="Stratified deterministic sampling: per-stratum rates (40% "
    "BUILDING, 20% MACHINERY, 5% rest) applied via the same key hash — "
    "the Spark analog of df.sampleBy, minus the seed/partition "
    "nondeterminism. Rates are a CASE over the stratum column; still a "
    "pure scan-side predicate.",
    tags=("sampling", "stratified"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    rate = (
        F.when(F.col("c_mktsegment") == "BUILDING", 40)
        .when(F.col("c_mktsegment") == "MACHINERY", 20)
        .otherwise(5)
    )
    c = load(spark, sf_dir, "customer").filter(hash_bucket(F.col("c_custkey")) < rate)
    return c.groupBy("c_mktsegment").agg(F.count("*").alias("n_sampled"))


@query(
    "sample_split_manifest",
    oracle=f"""
        WITH tagged AS (
            SELECT source,
                   CASE WHEN {sql_hash_bucket('doc_id')} < 90 THEN 'train'
                        WHEN {sql_hash_bucket('doc_id')} < 95 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        )
        SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
        FROM tagged GROUP BY source, split
    """,
    doc="Deterministic 90/5/5 train/val/test split manifest: each "
    "document's split comes from the Knuth hash of its KEY, so the "
    "assignment is (a) partition-layout independent, (b) stable "
    "across reruns and engines, (c) structurally disjoint+exhaustive "
    "— one bucket value, one CASE arm. The per-(source, split) "
    "manifest is what a training job consumes; leakage checks reduce "
    "to hash-bucket arithmetic instead of set intersections "
    "(split_leakage_audit is the content-level complement). Map-side "
    "tag + tiny aggregate, no data movement at any scale.",
    tags=("sampling", "training", "split"),
)
def sample_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    d = load(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
    )
    return (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
