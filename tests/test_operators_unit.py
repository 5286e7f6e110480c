"""Unit tests for the engine operators outside the oracle gate: the
partition-cache state machine, retry wrapper, block locations, and the
Pipeline facade (the reference's three verbs)."""

from __future__ import annotations

import glob
import os
import tempfile
import time

import pytest

from tests.conftest import SF_DIR


@pytest.fixture()
def cache(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.plans.cache_queries import build_cache

    return build_cache(spark, SF_DIR, tempfile.mkdtemp(prefix="dps_test_cache_"))


def test_cache_create_then_reuse(cache):
    first = cache.calc_avg(5)
    second = cache.calc_avg(5)
    assert first.source == "create" and second.source == "reuse"
    assert first.avg == second.avg and first.error == "" == second.error


def test_cache_recreate_on_corruption(cache):
    first = cache.calc_avg(10)
    for f in glob.glob(cache.partition_path(10) + "/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"garbage")
    third = cache.calc_avg(10)
    fourth = cache.calc_avg(10)
    assert third.source == "recreate" and fourth.source == "reuse"
    assert third.avg == first.avg == fourth.avg


def test_cache_empty_key_is_error_not_null(cache):
    # Reference: int(NaN) raises -> error response (server.py:145-147).
    r = cache.calc_avg(424242)
    assert r.error != "" and r.avg == 0 and r.source == ""


def test_cache_invalidate(cache):
    cache.calc_avg(5)
    cache.invalidate()
    assert cache.calc_avg(5).source == "create"


def test_avg_truncates_toward_zero(cache):
    # int() truncation parity with reference server.py:109.
    res = cache.calc_avg(5)
    row = (
        cache.main.filter(cache.main[cache.key_col] == 5)
        .agg({cache.value_col: "avg"})
        .collect()[0][0]
    )
    assert res.avg == int(row)


def test_retry_succeeds_after_failures():
    from data_pipeline_with_hdfs_sql_integration_spark.operators.retry import with_retry

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    t0 = time.monotonic()
    assert with_retry(flaky, attempts=5, sleep_s=0.01) == "ok"
    assert calls["n"] == 3 and time.monotonic() - t0 < 5


def test_retry_exhausts_and_raises():
    from data_pipeline_with_hdfs_sql_integration_spark.operators.retry import with_retry

    with pytest.raises(ValueError):
        with_retry(lambda: (_ for _ in ()).throw(ValueError("boom")), attempts=2, sleep_s=0.0)


def test_block_locations_local_fs(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.operators.block_locations import (
        block_histogram_dict,
        block_locations,
    )

    blocks = block_locations(spark, f"{SF_DIR}/lineitem.parquet")
    assert blocks and all(b["length"] > 0 for b in blocks)
    hist = block_histogram_dict(spark, f"{SF_DIR}/lineitem.parquet")
    assert sum(hist.values()) == len(blocks)


def test_pipeline_facade_end_to_end(spark):
    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.api import Pipeline
    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load

    root = tempfile.mkdtemp(prefix="dps_pipe_")
    pipe = Pipeline(
        spark=spark,
        main_path=os.path.join(root, "main.parquet"),
        cache_root=os.path.join(root, "partitions"),
        key_col="c_nationkey",
        value_col="o_totalprice",
    )
    orders = load(spark, SF_DIR, "orders")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    status = pipe.db_to_store(
        orders,
        band_col="o_totalprice",
        band=(1000.0, 400000.0),
        dim=cust,
        join_on=orders.o_custkey == cust.c_custkey,
        attempts=1,
        sleep_s=0.0,
    )
    assert status.startswith("Imported ") and "rows" in status
    res = pipe.calc_avg(5)
    assert res.source == "create" and res.avg > 0
    assert pipe.calc_avg(5).source == "reuse"
    hist = pipe.block_report()
    assert sum(hist.values()) >= 1


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
    from data_pipeline_with_hdfs_sql_integration_spark.operators.skew import salted_join

    orders = load(spark, SF_DIR, "orders").withColumnRenamed("o_custkey", "c_custkey")
    cust = load(spark, SF_DIR, "customer")
    plain = orders.join(cust, "c_custkey", "inner").select("o_orderkey", "c_nationkey")
    salted = salted_join(orders, cust, "c_custkey", n_salts=8).select("o_orderkey", "c_nationkey")
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_group_count_equals_plain(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
    from data_pipeline_with_hdfs_sql_integration_spark.operators.skew import salted_group_count

    cust = load(spark, SF_DIR, "customer")
    plain = {r["c_nationkey"]: r["count"] for r in cust.groupBy("c_nationkey").count().collect()}
    salted = {r["c_nationkey"]: r["n"] for r in salted_group_count(cust, "c_nationkey").collect()}
    assert plain == salted


def test_approx_distinct_within_error_bound(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    import pyspark.sql.functions as F

    rows = all_queries()["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    truth = {
        r["o_orderstatus"]: r["n"]
        for r in load(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert rows and len(rows) == len(truth)
    for r in rows:
        assert r["exact_customers"] == truth[r["o_orderstatus"]]
        assert r["hll_within_5pct"] is True, r


def test_cache_warm_all_layout_is_partition_pruned(spark):
    import tempfile

    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.plans.cache_queries import build_cache

    cache = build_cache(spark, SF_DIR, tempfile.mkdtemp(prefix="dps_warm_"))
    cache.warm_all()
    df = spark.read.parquet(cache.cache_root).filter(F.col(cache.key_col) == 5)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # The equality filter must prune at the partition level, not scan+filter.
    assert "PartitionFilters" in plan and "c_nationkey" in plan.split("PartitionFilters", 1)[1][:200]
    assert df.count() == cache.main.filter(F.col(cache.key_col) == 5).count()


def test_foreach_batch_exactly_once_sink(spark):
    import tempfile

    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.streaming.sinks import (
        read_final_epoch,
        stream_to_parquet_exactly_once,
    )
    from data_pipeline_with_hdfs_sql_integration_spark.streaming.windows import events_stream

    root = tempfile.mkdtemp(prefix="dps_sink_stream_")
    agg = events_stream(spark, SF_DIR).groupBy("event_type").agg(F.count("*").alias("n"))
    stream_to_parquet_exactly_once(agg, f"{root}/out", f"{root}/ckpt")
    result = {r["event_type"]: r["n"] for r in read_final_epoch(spark, f"{root}/out").collect()}

    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load

    expected = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events").groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert result == expected


def test_connected_components_known_graph(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.plans.clustering import connected_components

    # Components: {1,2,3,4} (chain), {10,11}, {20} absent (no edges -> not a node)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs, "a", "b").collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_streaming_checkpoint_resume_is_idempotent(spark):
    """Re-running a checkpointed availableNow query over an unchanged
    source must not duplicate or alter results (exactly-once resume)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.streaming.sinks import (
        read_final_epoch,
        stream_to_parquet_exactly_once,
    )
    from data_pipeline_with_hdfs_sql_integration_spark.streaming.windows import events_stream

    root = tempfile.mkdtemp(prefix="dps_resume_")
    build = lambda: (
        events_stream(spark, SF_DIR).groupBy("event_type").agg(F.count("*").alias("n"))
    )
    stream_to_parquet_exactly_once(build(), f"{root}/out", f"{root}/ckpt")
    first = {r["event_type"]: r["n"] for r in read_final_epoch(spark, f"{root}/out").collect()}
    epochs_before = sorted(os.listdir(f"{root}/out"))

    # Same checkpoint, same (exhausted) source: a resumed run must be a no-op.
    stream_to_parquet_exactly_once(build(), f"{root}/out", f"{root}/ckpt")
    second = {r["event_type"]: r["n"] for r in read_final_epoch(spark, f"{root}/out").collect()}
    assert first == second
    assert sorted(os.listdir(f"{root}/out")) == epochs_before


def test_zorder_colocates_2d_neighbours(spark):
    """Rows near in (x, y) must land near in z; a z-range window around
    a point must cover its 2D neighbourhood (the pruning property)."""
    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.operators.zorder import zorder2

    df = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    rows = {(r["x"], r["y"]): r["z"] for r in df.withColumn("z", zorder2(F.col("x"), F.col("y"))).collect()}
    # Python reference for a few points.
    def morton(x, y):
        z = 0
        for j in range(16):
            z += ((x >> j) & 1) << (2 * j)
            z += ((y >> j) & 1) << (2 * j + 1)
        return z
    for p in [(0, 0), (1, 0), (0, 1), (63, 63), (17, 42)]:
        assert rows[p] == morton(*p), p
    # Locality: a 4x4 tile occupies exactly 16 consecutive codes.
    tile = sorted(rows[(x, y)] for x in range(8, 12) for y in range(24, 28))
    assert tile == list(range(tile[0], tile[0] + 16))


def test_compact_parquet_reduces_files_preserves_rows(spark):
    import tempfile

    from data_pipeline_with_hdfs_sql_integration_spark.operators.maintenance import compact_parquet

    path = tempfile.mkdtemp(prefix="dps_compact_")
    spark.range(0, 10000).repartition(40).write.mode("overwrite").parquet(path)
    before, after = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert before == 40 and after == 1
    assert spark.read.parquet(path).count() == 10000


def test_incremental_ingest_high_watermark(spark):
    import tempfile

    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
    from data_pipeline_with_hdfs_sql_integration_spark.operators.maintenance import (
        incremental_ingest,
    )

    root = tempfile.mkdtemp(prefix="dps_incr_")
    dest, state = f"{root}/dest", f"{root}/state.json"
    ev = load(spark, SF_DIR, "events").select("event_id", "ts")
    cutoff = "2024-01-15 00:00:00"
    first = ev.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
    n1 = incremental_ingest(spark, first, "ts", dest, state)
    assert n1 == first.count() > 0
    # Second run over the FULL source ingests only post-watermark rows.
    n2 = incremental_ingest(spark, ev, "ts", dest, state)
    assert n1 + n2 == ev.count()
    assert spark.read.parquet(dest).count() == ev.count()
    # Third run: nothing new.
    assert incremental_ingest(spark, ev, "ts", dest, state) == 0


def test_ignore_corrupt_files_resilience(spark):
    """A torn/corrupt parquet part must be skippable without failing the
    whole scan (the storage-fault analog of the cache recreate path)."""
    import glob
    import tempfile

    import pytest
    from py4j.protocol import Py4JJavaError

    path = tempfile.mkdtemp(prefix="dps_corrupt_")
    source = spark.range(0, 1000).repartition(4)
    source.write.mode("overwrite").parquet(path)
    schema = source.schema
    victim = sorted(glob.glob(f"{path}/part-*.parquet"))[0]
    with open(victim, "wb") as f:
        f.write(b"not a parquet file")

    with pytest.raises(Exception):
        spark.read.schema(schema).parquet(path).count()  # default: fatal

    # Schema pinned (inference would read the corrupt footer before the
    # option applies); the scan then skips the torn part.
    n = (
        spark.read.schema(schema)
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
        .count()
    )
    assert 0 < n < 1000 and n % 250 == 0  # lost exactly the victim's rows


def test_exact_duplicates_are_found_by_minhash(spark, tmp_path):
    """Cross-operator invariant: byte-identical documents MUST surface
    as MinHash-LSH pairs with est_jaccard = 1.0 (identical text ⇒
    identical signatures ⇒ same buckets), and unrelated documents must
    not pair. Runs on a crafted corpus staged as a documents table."""
    from pyspark.sql import Row

    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy dog",   # dup of 0
        2: "completely unrelated text about spark shuffles and parquet",
        3: "completely unrelated text about spark shuffles and parquet",  # dup of 2
        4: "a third different document mentioning watermarks and joins",
    }
    rows = [
        Row(doc_id=i, text=t, lang="en", source="unit", n_chars=len(t))
        for i, t in texts.items()
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in all_queries()["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    assert pairs.get((0, 1)) == 1.0
    assert pairs.get((2, 3)) == 1.0
    for bad in [(0, 2), (0, 4), (2, 4), (1, 3)]:
        assert bad not in pairs
