"""Inter-query concurrency parity: the reference serves up to 10
concurrent RPC handler threads over one process (server.py:151,
``ThreadPoolExecutor(max_workers=10)``) — SURVEY.md §3 calls this the
reference's only parallelism model. The Spark engine must likewise
serve concurrent queries from ONE SparkSession (thread-safe driver,
independent jobs) and return exactly the results each query returns
when run alone."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tests.conftest import SF_DIR


def _q(name):
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    return all_queries()[name]


# A mix of shapes: scan-agg, broadcast join, window, cache read, text.
_NAMES = [
    "o09_avg_int_trunc",
    "o02_broadcast_join",
    "window_topk_per_group",
    "agg_pricing_summary",
    "text_token_stats",
    "join_region_revenue",
    "o03_band_filter",
    "agg_filtered_counts",
]


def _rows(spark, name):
    df = _q(name).fn(spark, SF_DIR)
    return sorted(tuple(str(x) for x in r) for r in df.select(*sorted(df.columns)).collect())


def test_concurrent_queries_match_solo_results(spark):
    solo = {n: _rows(spark, n) for n in _NAMES}
    # 8 queries x 2 waves on 10 threads — deliberately oversubscribed
    # like the reference's handler pool.
    with ThreadPoolExecutor(max_workers=10) as pool:
        futures = [(n, pool.submit(_rows, spark, n)) for n in _NAMES * 2]
        for n, fut in futures:
            assert fut.result(timeout=300) == solo[n], n
