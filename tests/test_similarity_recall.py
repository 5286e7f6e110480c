"""ANN quality gate: recall@10 of each approximate tier against the
exact brute-force top-k. Catches silently-broken index parameters (a
mis-tuned radius or plane count that returns plausible-but-wrong
neighbors would pass a parity-less smoke test)."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _recall(spark, ann_name: str, k: int = 10) -> float:
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    qs = all_queries()
    exact = [r["vec_id"] for r in qs["sim_cosine_topk"].fn(spark, SF_DIR).collect()][:k]
    got = [r["vec_id"] for r in qs[ann_name].fn(spark, SF_DIR).collect()][:k]
    return len(set(got) & set(exact)) / k


def test_lsh_recall_floor(spark):
    assert _recall(spark, "sim_ann_lsh") >= 0.7


def test_ivf_recall_floor(spark):
    assert _recall(spark, "sim_ann_ivf") >= 0.7


def test_pq_recall_floor(spark):
    assert _recall(spark, "sim_ann_pq") >= 0.7
