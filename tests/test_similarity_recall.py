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


# Floors sit below the values measured at the test SF (lsh 0.9,
# ivf 0.9, pq 1.0 with the 8x16 codebook at PQ_CAND=300) so a silent
# quality regression trips before it reaches parity-passing-but-wrong
# territory, while one borderline tie stays survivable.
def test_lsh_recall_floor(spark):
    assert _recall(spark, "sim_ann_lsh") >= 0.8


def test_ivf_recall_floor(spark):
    assert _recall(spark, "sim_ann_ivf") >= 0.8


def test_pq_recall_floor(spark):
    assert _recall(spark, "sim_ann_pq") >= 0.8


def test_semantic_dedup_detection_floor(spark):
    """End-to-end SemDeDup detection recall under the DEFAULT query:
    share of exact above-threshold duplicate pairs (bounded-subset
    ground truth, dedup_embedding_cosine) whose higher-id endpoint
    dedup_semantic actually drops. Round 5 shipped single-probe at
    0.217 — a dedup stage silently missing 78% of known duplicates;
    P=2 measured 0.5 at sf0.1, the round-7 P=3 default measures 0.87.
    Floor 0.75 (the round-6 verdict's target): a regression back to
    boundary-loss territory trips here before it reaches a
    parity-green-but-useless release."""
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    from tests.conftest import SF_DIR_MID

    qs = all_queries()
    pairs = [
        (r["vec_a"], r["vec_b"])
        for r in qs["dedup_embedding_cosine"].fn(spark, SF_DIR_MID).collect()
    ]
    assert pairs, "ground-truth pair set is empty at the test SF"
    keep = {
        r["vec_id"]: r["keep"]
        for r in qs["dedup_semantic"].fn(spark, SF_DIR_MID).collect()
    }
    detection = sum(1 for a, b in pairs if keep.get(max(a, b)) == 0) / len(pairs)
    assert detection >= 0.75, f"SemDeDup default detection recall {detection:.3f} < 0.75"


def test_batch_ann_recall_floor(spark):
    """Mean recall@10 of the banded-bucket BATCH path across its whole
    query set, against a NumPy exact ranking (same rounding + tie-break).
    Measured ~0.97 at sf0.001; floor matches the other tiers."""
    import numpy as np
    import pyarrow.parquet as pq

    from data_pipeline_with_hdfs_sql_integration_spark.plans.dedup import BATCH_QUERY_MOD
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    ids = t.vec_id.to_numpy()
    m = np.stack(t.embedding.to_numpy()).astype(np.float64)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    got: dict[int, list[int]] = {}
    for r in all_queries()["sim_ann_lsh_batch"].fn(spark, SF_DIR).collect():
        got.setdefault(r.query_id, []).append(r.vec_id)
    recalls = []
    for q in sorted(set(ids[ids % BATCH_QUERY_MOD == 0])):
        qi = np.where(ids == q)[0][0]
        cos = mn @ mn[qi]
        cos[qi] = -2  # exclude self
        order = np.lexsort((ids, -np.round(cos, 6)))
        exact = set(ids[order[:10]])
        recalls.append(len(exact & set(got.get(q, []))) / 10)
    assert sum(recalls) / len(recalls) >= 0.8
