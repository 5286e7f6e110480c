"""Second tranche of analytics breadth: CUBE, pivot (conditional
aggregation), exact distinct counts, exact percentiles. Same parity
rules as plans/analytics.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.registry import query
from data_pipeline_with_hdfs_sql_integration_spark.session import apply_runtime_confs

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all 2^k grouping-set combinations in one pass (map-side "
    "expansion, single scan of the fact).",
    tags=("analytics", "agg"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "agg_pivot_segments",
    oracle=f"""
        SELECT c_nationkey,
               {", ".join(f"CAST(count(*) FILTER (c_mktsegment = '{s}') AS BIGINT) AS n_{s.lower()}" for s in SEGMENTS)}
        FROM customer
        GROUP BY c_nationkey
    """,
    doc="Pivot via conditional aggregation (count FILTER per segment) — "
    "the portable spelling of groupBy().pivot(); one hash aggregate, "
    "columns fixed at plan time (required for a stable schema at scale).",
    tags=("analytics", "agg"),
)
def agg_pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            *[
                F.count(F.when(F.col("c_mktsegment") == s, 1)).alias(f"n_{s.lower()}")
                for s in SEGMENTS
            ]
        )
    )


@query(
    "agg_distinct_counts",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Exact multi-distinct aggregation: Spark plans an Expand + "
    "two-phase aggregate; for sketch-based cardinality at 100 TB see "
    "approx_count_distinct (rows-only, engine-specific sketches).",
    tags=("analytics", "agg"),
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_percentiles",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.95), 4) AS p95
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Exact percentiles (linear interpolation at index p*(n-1) — the "
    "same formula as DuckDB's quantile_cont; rounded before compare). "
    "PLAN SHAPE (round-10 sf10 finding): Spark's exact `percentile` "
    "aggregate is an ObjectHashAggregate that accumulates EVERY value "
    "into per-partial OpenHashMaps and merges them single-threaded per "
    "group — 38-140 s at sf10 (15 M rows, 95% distinct values, so "
    "map-side combine cannot shrink it). Rewritten as distributed "
    "ORDER STATISTICS: a two-phase global row_number over the total "
    "order (status, price) (operators/global_rank.py — "
    "repartitionByRange, partition-local sorts, driver pulls one count "
    "per partition), per-group ranks by subtracting the per-group "
    "offset (one row per GROUP collected — bounded by group count, "
    "never data), then the floor/ceil(p*(n-1)) rows are filtered out "
    "and linearly interpolated. Identical values (A/B-matched at sf10 "
    "to 4 dp), 2.2x faster there (17.7 s vs 37.9 s warm), and no "
    "operator holds a whole group in memory — the shape that survives "
    "100 TB, where the accumulate-everything aggregate cannot. The "
    "approx swap (percentile_approx, mergeable t-digest) remains the "
    "right tool when 1e-3 relative error is acceptable.",
    tags=("analytics", "agg"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_with_hdfs_sql_integration_spark.operators.global_rank import (
        global_row_number,
    )

    apply_runtime_confs(spark)
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    ranked = global_row_number(
        o, [("o_orderstatus", "asc"), ("o_totalprice", "asc")], alias="gr"
    )
    # One row per GROUP to the driver (3-5 statuses) — the same bounded
    # legitimacy class as the per-partition count pull inside
    # global_row_number. Offsets turn the global rank into a per-group
    # 1-based rank; lo/hi/frac are the order-statistic indices of the
    # p*(n-1) interpolation.
    counts = sorted(
        (r["o_orderstatus"], r["n"])
        for r in o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    import math

    rows, acc = [], 0
    for status, n in counts:
        spec = [status, acc]
        for p in (0.5, 0.95):
            k = p * (n - 1)
            spec += [math.floor(k) + 1, math.ceil(k) + 1, k - math.floor(k)]
        rows.append(tuple(spec))
        acc += n
    idx = spark.createDataFrame(
        rows,
        "o_orderstatus string, off long, lo_p50 long, hi_p50 long,"
        " fr_p50 double, lo_p95 long, hi_p95 long, fr_p95 double",
    )
    j = ranked.join(F.broadcast(idx), "o_orderstatus")
    rn = F.col("gr") - F.col("off")
    picked = j.filter(
        (rn == F.col("lo_p50")) | (rn == F.col("hi_p50"))
        | (rn == F.col("lo_p95")) | (rn == F.col("hi_p95"))
    ).withColumn("rn", rn)

    def interp(tag: str):
        lo = F.max(F.when(F.col("rn") == F.col(f"lo_{tag}"), F.col("o_totalprice")))
        hi = F.max(F.when(F.col("rn") == F.col(f"hi_{tag}"), F.col("o_totalprice")))
        return F.round(lo + (hi - lo) * F.first(F.col(f"fr_{tag}")), 4).alias(tag)

    return picked.groupBy("o_orderstatus").agg(interp("p50"), interp("p95"))


@query(
    "agg_approx_distinct",
    oracle="""
        SELECT o_orderstatus,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
               abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
                   <= 0.05 * count(DISTINCT o_custkey) AS hll_within_5pct
        FROM orders
        GROUP BY o_orderstatus
    """,
    doc="Approximate distinct (HyperLogLog++): mergeable sketch, "
    "map-side partials — the cardinality tool at 100 TB. Raw sketch "
    "estimates are engine-specific, so the HASH-CHECKED contract is the "
    "error bound itself: each engine asserts ITS OWN HLL estimate lands "
    "within ±5% of the exact distinct count (Spark approx_count_distinct "
    "rsd=0.02 vs DuckDB approx_count_distinct), and the exact counts "
    "must agree bit-for-bit. A hash match therefore proves both "
    "sketches honest, not just that rows exist. PLAN SHAPE (round-10 "
    "sf10 finding): asking for countDistinct AND the sketch in ONE agg "
    "makes Spark's distinct-rewrite carry the rsd=0.02 sketch's ~1.5k "
    "long registers through a per-(status, custkey) partial aggregate "
    "— ~12 KB shuffled per distinct key, 88 s at sf10. Split them: "
    "exact distinct as the classic two-phase (status, custkey) "
    "group-count, the sketch as a plain per-status HLL agg (3 sketches "
    "total, merged map-side), joined on the 3-row result. Same "
    "estimate (HLL registers are duplicate-insensitive); measured at "
    "sf10: 88 s -> 5.0 s warm (18.7 s as a session's first query).",
    tags=("analytics", "agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    o = load(spark, sf_dir, "orders").select("o_orderstatus", "o_custkey")
    exact = (
        o.groupBy("o_orderstatus", "o_custkey")
        .agg(F.lit(1))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("exact_customers"))
    )
    approx = o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers")
    )
    return exact.join(approx, "o_orderstatus").select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= 0.05 * F.col("exact_customers")
        ).alias("hll_within_5pct"),
    )


@query(
    "agg_corr_price_qty",
    oracle="""
        WITH g AS (
            SELECT l_returnflag AS flag,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
                   CAST(l_quantity AS BIGINT) AS y
            FROM lineitem
        ), s AS (
            SELECT flag,
                   COUNT(*) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(CAST(x * y AS HUGEINT)) AS sxy,
                   SUM(CAST(x * x AS HUGEINT)) AS sxx,
                   SUM(CAST(y * y AS HUGEINT)) AS syy
            FROM g GROUP BY flag
        )
        SELECT flag,
               round((CAST(n AS DOUBLE)
                        * (CAST(sxy // 1099511627776 AS DOUBLE) * 1099511627776
                           + CAST(sxy % 1099511627776 AS DOUBLE))
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE)
                               * (CAST(sxx // 1099511627776 AS DOUBLE) * 1099511627776
                                  + CAST(sxx % 1099511627776 AS DOUBLE))
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE)
                                 * (CAST(syy // 1099511627776 AS DOUBLE) * 1099511627776
                                    + CAST(syy % 1099511627776 AS DOUBLE))
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                     6) AS corr_price_qty
        FROM s
        ORDER BY flag
    """,
    doc="Pearson correlation per group from exact integer sums (price "
    "cents BIGINT, cross/square sums in DECIMAL(38,0)) — the built-in "
    "corr() is a float reduction whose last ulps depend on partition "
    "merge order and would flake a value oracle; the sums formulation "
    "is order-independent and still one pass, map-side combinable.",
    tags=("agg", "stats"),
)
def agg_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load(spark, sf_dir, "lineitem")
    g = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    s = g.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    # split-cast: sxx/sxy exceed 2^53 at sf0.1 and the direct
    # DECIMAL(38,0)->double cast rounds differently across engines
    # (functions/numfns.py).
    from data_pipeline_with_hdfs_sql_integration_spark.functions.numfns import split_cast_double

    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    corr = F.round(
        (n * split_cast_double("sxy") - sx * sy)
        / F.sqrt(
            (n * split_cast_double("sxx") - sx * sx)
            * (n * split_cast_double("syy") - sy * sy)
        ),
        6,
    )
    return s.select("flag", corr.alias("corr_price_qty")).orderBy("flag")


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS INT)
                   AS grouping_id,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        ORDER BY grouping_id, priority, status
    """,
    doc="Explicit GROUPING SETS (not derivable from the rollup/cube "
    "queries: an arbitrary set list plus grouping_id disambiguation of "
    "real NULLs vs subtotal rows). One Expand + one hash aggregate — "
    "the shuffle carries |sets| x |groups| rows, constant in fact "
    "size after map-side combine.",
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_pipeline_with_hdfs_sql_integration_spark.catalog import register_views

    apply_runtime_confs(spark)
    register_views(spark, sf_dir)
    # groupingSets has no stable DataFrame builder pre-4.0 — the SQL
    # form IS the DataFrame plan (same Expand+Aggregate).
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS INT)
                   AS grouping_id,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        ORDER BY grouping_id, priority, status
        """
    )


@query(
    "agg_mode_per_group",
    oracle="""
        WITH counts AS (
            SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
            FROM customer GROUP BY c_mktsegment, c_nationkey
        ),
        ranked AS (
            SELECT c_mktsegment, c_nationkey, n,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY n DESC, c_nationkey ASC) AS rk
            FROM counts
        )
        SELECT c_mktsegment,
               CAST(c_nationkey AS BIGINT) AS mode_nationkey,
               n AS mode_count
        FROM ranked WHERE rk = 1
    """,
    doc="Statistical mode per group with a DETERMINISTIC tie-break "
    "(most-frequent nation per market segment): both engines' built-in "
    "mode()/any_value pick an arbitrary winner under ties, which flakes "
    "value comparison — so the mode is computed as count + row_number "
    "ordered (n DESC, key ASC). Two-level aggregation keeps it scalable: "
    "the first group-by reduces the fact to |segment x nation| rows "
    "map-side, the window runs over that tiny table.",
    tags=("agg", "window"),
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    apply_runtime_confs(spark)
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count("*").alias("n"))
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("c_nationkey").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").cast("long").alias("mode_nationkey"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "agg_hll_sketch_union",
    oracle="""
        WITH per_seg AS (
            SELECT c_mktsegment,
                   count(DISTINCT c_nationkey * 1000000 + c_custkey) AS exact_seg
            FROM customer GROUP BY c_mktsegment
        ),
        tot AS (
            SELECT count(DISTINCT c_nationkey * 1000000 + c_custkey) AS exact_total,
                   approx_count_distinct(c_nationkey * 1000000 + c_custkey) AS est_total
            FROM customer
        )
        SELECT p.c_mktsegment,
               CAST(p.exact_seg AS BIGINT) AS exact_seg,
               CAST(t.exact_total AS BIGINT) AS exact_total,
               abs(t.est_total - t.exact_total) <= 0.05 * t.exact_total
                   AS union_within_5pct
        FROM per_seg p CROSS JOIN tot t
    """,
    doc="HLL sketch UNION (Spark 3.5 Apache DataSketches surface): "
    "per-segment hll_sketch_agg partial sketches are MERGED with "
    "hll_union_agg and the union estimate must land within ±5% of the "
    "exact global distinct — the property that makes distinct-count "
    "rollups work at 100 TB (per-day/per-shard sketches persist as "
    "bytes; any coarser rollup is a cheap union over sketch bytes, "
    "never a re-scan; exact distinct does NOT decompose this way). "
    "Sketch bytes are engine-specific, so the contract mirrors "
    "agg_approx_distinct: exact counts match bit-for-bit, each engine "
    "asserts its own estimate's error bound (DuckDB has no sketch "
    "union over values — its global approx_count_distinct plays the "
    "merged-estimate role).",
    tags=("analytics", "agg", "approx", "sketch"),
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (F.col("c_nationkey") * 1_000_000 + F.col("c_custkey")).alias("k"),
    )
    seg = c.groupBy("c_mktsegment").agg(
        F.countDistinct("k").alias("exact_seg"),
        F.expr("hll_sketch_agg(k)").alias("sk"),
    )
    merged = seg.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_total")
    )
    exact_tot = c.agg(F.countDistinct("k").alias("exact_total"))
    return (
        seg.select("c_mktsegment", "exact_seg")
        .crossJoin(F.broadcast(exact_tot))
        .crossJoin(F.broadcast(merged))
        .select(
            "c_mktsegment",
            "exact_seg",
            "exact_total",
            (
                F.abs(F.col("est_total") - F.col("exact_total"))
                <= 0.05 * F.col("exact_total")
            ).alias("union_within_5pct"),
        )
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
        WITH q AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem
        ), s AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   sum(x) AS s1,
                   sum(x*x) AS s2,
                   sum(x*x*x) AS s3,
                   sum(x*x*x*x) AS s4
            FROM q GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               round((CAST(s3 AS DOUBLE)/n
                      - 3.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s2 AS DOUBLE)/n)
                      + 2.0*power(CAST(s1 AS DOUBLE)/n, 3))
                     / power(CAST(s2 AS DOUBLE)/n
                             - power(CAST(s1 AS DOUBLE)/n, 2), 1.5), 6) AS skewness,
               round((CAST(s4 AS DOUBLE)/n
                      - 4.0*(CAST(s1 AS DOUBLE)/n)*(CAST(s3 AS DOUBLE)/n)
                      + 6.0*power(CAST(s1 AS DOUBLE)/n, 2)*(CAST(s2 AS DOUBLE)/n)
                      - 3.0*power(CAST(s1 AS DOUBLE)/n, 4))
                     / power(CAST(s2 AS DOUBLE)/n
                             - power(CAST(s1 AS DOUBLE)/n, 2), 2) - 3.0, 6)
                   AS excess_kurtosis
        FROM s
    """,
    doc="Higher-moment profile (skewness + excess kurtosis) per return "
    "flag from EXACT integer power sums s1..s4 — engine-native "
    "skewness()/kurtosis() reduce floats in partition order and "
    "drift per topology, exactly like the variance case "
    "anomaly_zscore_orders pins. Quantities are small ints so x^4 "
    "sums stay far inside int64; the moment formulas run once per "
    "group on the 3-row aggregate, in identical expression text on "
    "both engines (shared double rounding at 6dp). At 100 TB this is "
    "one map-side-combined aggregate carrying 5 longs per group.",
    tags=("agg", "stats"),
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("x")
    )
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).alias("s4"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    m2r = F.col("s2").cast("double") / F.col("n")
    m3r = F.col("s3").cast("double") / F.col("n")
    m4r = F.col("s4").cast("double") / F.col("n")
    var = m2r - F.pow(mean, 2)
    skew = F.round((m3r - 3.0 * mean * m2r + 2.0 * F.pow(mean, 3)) / F.pow(var, 1.5), 6)
    kurt = F.round(
        (m4r - 4.0 * mean * m3r + 6.0 * F.pow(mean, 2) * m2r - 3.0 * F.pow(mean, 4))
        / F.pow(var, 2)
        - 3.0,
        6,
    )
    return s.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        skew.alias("skewness"),
        kurt.alias("excess_kurtosis"),
    )


@query(
    "agg_mean_family",
    oracle="""
        WITH q AS (
            SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
            FROM lineitem WHERE l_quantity >= 1
        )
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(x) AS DOUBLE) / count(*), 6) AS arith_mean,
               round(CAST(count(*) AS DOUBLE) * 1000000000000.0
                     / sum(1000000000000 // x), 6) AS harmonic_mean,
               round(exp(sum(round(ln(CAST(x AS DOUBLE)), 9)) / count(*)), 6)
                   AS geometric_mean
        FROM q GROUP BY l_returnflag
    """,
    doc="The Pythagorean mean family per return flag, each engineered "
    "for cross-engine determinism its own way: arithmetic from an "
    "exact BIGINT sum; harmonic from exact integer reciprocal "
    "fixed-points (1e12 div x — no float 1/x summation, whose "
    "partition order would drift); geometric from per-term "
    "round-9 logs of SMALL INTEGER arguments (<=50 distinct ln "
    "inputs, each computed identically by both engines' libm; the "
    "rounding absorbs any last-ulp residue before the "
    "order-independent sum). AM >= GM >= HM holds per group by "
    "construction — a free internal sanity invariant. One "
    "map-side-combined aggregate carrying 3 longs + 1 double.",
    tags=("agg", "stats"),
)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 1)
        .select("l_returnflag", F.col("l_quantity").cast("long").alias("x"))
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 6).alias("arith_mean"),
        F.round(
            F.count(F.lit(1)).cast("double")
            * 1_000_000_000_000.0
            / F.sum(F.expr("1000000000000L div x")),
            6,
        ).alias("harmonic_mean"),
        F.round(
            F.exp(F.sum(F.round(F.log(F.col("x").cast("double")), 9)) / F.count(F.lit(1))),
            6,
        ).alias("geometric_mean"),
    )


@query(
    "agg_covariance_matrix",
    oracle="""
        WITH v AS (
            SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                   CAST(round(l_discount * 100) AS BIGINT) AS d
            FROM lineitem
        ), s AS (
            SELECT count(*) AS n,
                   sum(q) AS sq, sum(p) AS sp, sum(d) AS sd,
                   sum(CAST(q*q AS HUGEINT)) AS sqq,
                   sum(CAST(q*p AS HUGEINT)) AS sqp,
                   sum(CAST(q*d AS HUGEINT)) AS sqd,
                   sum(CAST(p*p AS HUGEINT)) AS spp,
                   sum(CAST(p*d AS HUGEINT)) AS spd,
                   sum(CAST(d*d AS HUGEINT)) AS sdd
            FROM v
        )
        SELECT x, y, round(cov, 6) AS cov FROM (
            SELECT 'quantity' AS x, 'quantity' AS y,
                   ((CAST(sqq // 1099511627776 AS DOUBLE) * 1099511627776
                     + CAST(sqq % 1099511627776 AS DOUBLE))
                    - CAST(sq AS DOUBLE)*sq/n)/(n-1) AS cov FROM s
            UNION ALL SELECT 'quantity', 'price_cents',
                   ((CAST(sqp // 1099511627776 AS DOUBLE) * 1099511627776
                     + CAST(sqp % 1099511627776 AS DOUBLE))
                    - CAST(sq AS DOUBLE)*sp/n)/(n-1) FROM s
            UNION ALL SELECT 'quantity', 'discount_pct',
                   ((CAST(sqd // 1099511627776 AS DOUBLE) * 1099511627776
                     + CAST(sqd % 1099511627776 AS DOUBLE))
                    - CAST(sq AS DOUBLE)*sd/n)/(n-1) FROM s
            UNION ALL SELECT 'price_cents', 'price_cents',
                   ((CAST(spp // 1099511627776 AS DOUBLE) * 1099511627776
                     + CAST(spp % 1099511627776 AS DOUBLE))
                    - CAST(sp AS DOUBLE)*sp/n)/(n-1) FROM s
            UNION ALL SELECT 'price_cents', 'discount_pct',
                   ((CAST(spd // 1099511627776 AS DOUBLE) * 1099511627776
                     + CAST(spd % 1099511627776 AS DOUBLE))
                    - CAST(sp AS DOUBLE)*sd/n)/(n-1) FROM s
            UNION ALL SELECT 'discount_pct', 'discount_pct',
                   ((CAST(sdd // 1099511627776 AS DOUBLE) * 1099511627776
                     + CAST(sdd % 1099511627776 AS DOUBLE))
                    - CAST(sd AS DOUBLE)*sd/n)/(n-1) FROM s
        )
    """,
    doc="Sample covariance matrix (upper triangle, long form) over "
    "three lineitem numerics from EXACT integer sums and cross-"
    "products (cents/pct fixed-point, HUGEINT/DECIMAL(38) "
    "accumulators) — covar_samp() reduces floats in partition order "
    "and drifts per topology, the same failure mode the z-score and "
    "correlation queries pin. The final float conversion of each "
    "cross-product sum SPLIT-CASTS through (hi*2^40 + lo): past 2^53 "
    "a direct DECIMAL38/HUGEINT->double cast is rounded differently "
    "by the two engines (observed: one ulp apart on sum(p*p) at "
    "sf0.1), while both halves are exactly representable and the "
    "recombination is a single identical IEEE add. ONE aggregate pass "
    "computes all 9 sufficient statistics (the feature-covariance job "
    "a PCA/whitening step runs before training); the matrix assembly "
    "is driver-free arithmetic on a 1-row relation.",
    tags=("agg", "stats"),
)
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("p"),
        F.round(F.col("l_discount") * 100).cast("long").alias("d"),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    s = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(dec(F.col("q") * F.col("q"))).alias("sqq"),
        F.sum(dec(F.col("q") * F.col("p"))).alias("sqp"),
        F.sum(dec(F.col("q") * F.col("d"))).alias("sqd"),
        F.sum(dec(F.col("p") * F.col("p"))).alias("spp"),
        F.sum(dec(F.col("p") * F.col("d"))).alias("spd"),
        F.sum(dec(F.col("d") * F.col("d"))).alias("sdd"),
    )
    pairs = [
        ("quantity", "quantity", "sqq", "sq", "sq"),
        ("quantity", "price_cents", "sqp", "sq", "sp"),
        ("quantity", "discount_pct", "sqd", "sq", "sd"),
        ("price_cents", "price_cents", "spp", "sp", "sp"),
        ("price_cents", "discount_pct", "spd", "sp", "sd"),
        ("discount_pct", "discount_pct", "sdd", "sd", "sd"),
    ]
    rows = None
    # Split-cast: DECIMAL(38,0) -> double above 2^53 is rounded
    # differently by Spark (BigDecimal, half-even) and DuckDB (hugeint
    # float path) — hi = sum div 2^40 and lo = sum % 2^40 are both
    # exactly representable, hi*2^40 is an exact power-of-two scale,
    # and the one recombining add rounds identically under IEEE in
    # both engines. (Nonnegative sums, so div == floor division.)
    two40 = 1099511627776
    split_d = lambda c: (
        F.expr(f"CAST({c} div {two40} AS DOUBLE)") * two40
        + F.expr(f"CAST({c} % {two40} AS DOUBLE)")
    )
    for x, y, sxy, sx, sy in pairs:
        cov = F.round(
            (
                split_d(sxy)
                - F.col(sx).cast("double") * F.col(sy) / F.col("n")
            )
            / (F.col("n") - 1),
            6,
        )
        r = s.select(F.lit(x).alias("x"), F.lit(y).alias("y"), cov.alias("cov"))
        rows = r if rows is None else rows.unionByName(r)
    return rows
