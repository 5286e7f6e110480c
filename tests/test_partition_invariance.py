"""Partition-layout invariance: the engine's order-independence
claims (exact integer/decimal sums, sequential-fold float math),
exercised by running float- and fold-sensitive queries under different
shuffle-partition counts and asserting bit-identical results.

A query whose aggregation depends on partial-combine order (e.g. a
naive float sum) would produce different low bits under 3 vs 17
shuffle partitions; every query here must not.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR

#: Queries whose numeric paths are the most exposed to combine-order:
#: decimal/integer-sum aggregates, sequential-fold cosines, fixed-point
#: LM scores, exact-integer variance, ppm probabilities, grouped-map
#: least squares.
SENSITIVE = [
    "agg_pricing_summary",
    "sim_cosine_topk",
    "quality_lm_bigram",
    "anomaly_zscore_orders",
    "events_markov_transitions",
    "grouped_linreg_trend",
    "agg_skew_kurtosis",
    "rollup_downsample_extrema",
    "agg_skyline_2d",
    # round-6 additions with combine-order-exposed numerics: the
    # covariance matrix (split-cast doubles of DECIMAL(38,0) sums),
    # the fixed-point temperature-mix quotas, sketch-MAD's integer
    # ceil-rank medians, and the incremental-refresh decimal merge.
    "agg_covariance_matrix",
    "mix_temperature_sampling",
    "anomaly_mad_sketch",
    "rollup_incremental_refresh",
]


def _run_sorted(spark, name: str):
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    df = all_queries()[name].fn(spark, SF_DIR)
    return sorted(
        tuple(str(x) for x in row) for row in df.select(*sorted(df.columns)).collect()
    )


@pytest.mark.parametrize("name", SENSITIVE)
def test_shuffle_partition_invariance(spark, name):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        few = _run_sorted(spark, name)
        spark.conf.set(key, "17")
        many = _run_sorted(spark, name)
    finally:
        spark.conf.set(key, before)
    assert few == many, f"{name} is partition-layout dependent"
