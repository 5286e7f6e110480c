"""Query plan modules. Importing them populates the registry."""

from __future__ import annotations

_LOADED = False


def load_all_plans() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from data_pipeline_with_hdfs_sql_integration_spark.plans import (  # noqa: F401
        analytics,
        analytics_extra,
        analytics_more,
        analytics_tpch,
        analytics_tpch2,
        analytics_tpch3,
        cache_queries,
        cleaning,
        clustering,
        core_queries,
        dedup,
        event_analytics,
        formats,
        graph,
        grouped_map,
        json_queries,
        linkage,
        merge_ops,
        multimodal,
        overlap,
        profiling,
        rollup_hypertable,
        sampling,
        scalarfns,
        sessionize,
        similarity,
        sketches,
        streaming_queries,
        subqueries,
        temporal,
        text_analysis,
        training_prep,
        udtf_queries,
        window_fns,
    )

    # Cross-module compositions that embed other queries' oracle text
    # register after every plan module has finished importing.
    similarity._register_pipeline_embedding_curation()
