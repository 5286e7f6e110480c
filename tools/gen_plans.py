"""Regenerate PLANS.md (explain-formatted trees for representative
queries). Run from the repo root: python tools/gen_plans.py"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The generation logic lives inline here so the artifact and generator
# stay in one place.
from pyspark.sql import SparkSession

from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

PICKS = [
    ("o03_band_filter", "band predicate pushed to the parquet reader"),
    ("o02_broadcast_join", "dimension join resolves to BroadcastHashJoin"),
    ("agg_pricing_summary", "partial (map-side) + final hash aggregation"),
    ("join_revenue_topk", "3-way join + TakeOrderedAndProject top-k"),
    ("subq_exists_priority", "EXISTS decorrelated to LeftSemi with pushed filters"),
    ("layout_partition_pruning", "PartitionFilters prune the day-partitioned layout"),
    ("sim_cosine_topk", "broadcast query vector; per-partition top-k heaps"),
    ("dedup_minhash_lsh", "persisted signatures; band-bucket equi-join"),
    ("q19_disjunctive_predicates", "OR-of-ANDs normalized; residual disjunction post-join"),
    ("window_range_frame", "value-based RANGE frame window, one shuffle on the partition key"),
    ("q2_min_cost_supplier", "derived partsupp + per-part min share one shuffle key; dims broadcast"),
    ("pack_sequences", "per-shard window (Exchange on shard key), no global sort; the lower Exchange is the small-input repartition guard, a no-op at scale"),
    ("contamination_ngram", "eval grams broadcast; corpus side never shuffles"),
    ("sim_quantized_topk", "integer dot folds over int8 vectors; TakeOrderedAndProject top-k"),
    ("dedup_ngram_jaccard", "persisted hash tables; id-only prefix join before array fetch"),
    ("scd2_order_priority", "both window passes share ONE sort/exchange on (custkey, time)"),
    ("graph_pagerank", "per-round InMemoryRelation barrier; edges><ranks BHJ + one groupBy(dst) shuffle per round"),
    ("fuzzy_match_partnames", "blocked fuzzy join: equi-join on the blocking key, NO cartesian; edit-distance verify post-join"),
    ("sim_ann_pq", "PQ ADC search: broadcast 128-row LUT (8 subspaces x 16 codes) joined to the codes scan, exact BIGINT sums, TakeOrderedAndProject candidates"),
    ("layout_dynamic_partition_pruning", "dynamicpruningexpression subquery in the fact scan's PartitionFilters, fed by the broadcast tier='hot' dim"),
    ("layout_bucketed_join", "both sides read pre-bucketed+sorted (SelectedBucketsCount); the only Exchange is the final aggregate's"),
    ("dedup_embedding_lsh", "signature persist barrier; band bucket equi-join candidates; exact cosine verify joins fetch only candidate vectors"),
    ("layout_zorder_pruning", "reads the grid-normalized Morton layout; the 2-D box predicate reaches PushedFilters over the z-sorted files"),
    ("dedup_semantic", "cell-keyed equi-self-join (no cartesian) over the stored IVF assignments; verdict via left join on vec_id"),
    ("quality_lm_bigram", "one exploded pass -> persisted per-doc bigram multiset; LM tables derived by re-aggregation; vocab-keyed joins"),
    ("pipeline_training_corpus", "all gates map-side in ONE scan; persisted slim survivors feed dedup + manifest; sha256 shuffle key"),
    ("diff_snapshots", "FULL OUTER co-partitioned on the key; unchanged rows filtered inside the join output, no second pass"),
    ("sql_lateral_topk", "correlated LATERAL decorrelated: WindowGroupLimit pushes rank<=2 below the sort; broadcast join back"),
    ("text_winnowing", "relational winnowing: every window pass (lead, frame-min, counts) rides ONE hashpartitioning(doc_id) exchange"),
    ("sim_grid_neighbors", "grid spatial join: 9-cell explode on one side, equi-join on cell id — no CartesianProduct, radius check post-join"),
    ("graph_triangle_count", "degree-oriented triangles: wedge join keyed on center, closing-edge equi-join; persisted k-NN edge build"),
    ("sketch_bloom_membership", "bloom build = explode + bit_or groupBy; probe joins the broadcast 64-word filter"),
    ("agg_skyline_2d", "Pareto front as ONE running-max window over the price sort — no quadratic NOT-EXISTS join"),
    ("temporal_interval_overlap", "interval x interval: hour-bucket explode, (user, bucket) equi-join, exact overlap post-filter, pair distinct"),
    ("mine_association_pairs", "basket-keyed pair join (items-per-basket bounded fanout); rule metrics over the |types|^2 relation"),
]


def main(sf: str = "/root/testdata/sf0.01") -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out = [
        "# PLANS — explain(formatted) evidence for representative queries",
        "",
        "Generated from the committed code at sf0.01 (regenerate with",
        "`python tools/gen_plans.py`). What to look for is noted per plan;",
        "tests/test_plan_shape.py asserts these properties mechanically.",
        "",
    ]
    for name, note in PICKS:
        df = qs[name].fn(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("\n\n")[0]
        # Cap pathological trees: iterative queries (pagerank) nest the
        # executed AQE history of every pinned InMemoryRelation — 4k+
        # lines of cache internals that drown the operator shape the
        # artifact exists to show. The live plan stays asserted by
        # tests/test_plan_shape.py; the dump is evidence, not data.
        lines = tree.splitlines()
        if len(lines) > 400:
            tree = "\n".join(
                lines[:400]
                + [f"... [{len(lines) - 400} lines truncated: cached-relation/AQE internals]"]
            )
        evidence = [
            ln.strip()
            for ln in plan.splitlines()
            if any(k in ln for k in ("PushedFilters", "PartitionFilters", "ReadSchema"))
            and ln.strip() not in ("PushedFilters: []", "PartitionFilters: []")
        ]
        out += [f"## {name}", "", f"*{note}*", "", "```", tree]
        if evidence:
            out += ["", "-- scan details --"]
            out += [e if len(e) < 150 else e[:147] + "..." for e in evidence]
        out += ["```", ""]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text("\n".join(out))


if __name__ == "__main__":
    main()
