"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the same configs are the ones that
matter on a multi-executor cluster (AQE, skew-join handling,
partition sizing, Arrow for the Pandas-UDF slow path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime (session-mutable) confs every query assumes. Applied both at
#: build time and defensively by `apply_runtime_confs` because the
#: driver may hand us a session we didn't build.
RUNTIME_CONFS = {
    # Deterministic timestamp semantics vs the DuckDB oracle (UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join splitting, plan re-opt. Critical
    # at 100 TB where static shuffle-partition counts are always wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the few Pandas-UDF code paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scan pushdown (defaults, pinned explicitly).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime row-level filtering: build a bloom filter from the small
    # side of a selective join and push it into the big side's scan —
    # at 100 TB this skips row groups a static plan can't.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Dynamic partition pruning (default on; pinned — it is the whole
    # point of the partitioned layouts in plans/analytics_extra.py).
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def jdbc_driver_jars() -> list[str]:
    """Locally-available JDBC driver jars to put on the session classpath.

    ``SPARK_GRAFT_JDBC_JARS`` (comma-separated) wins; otherwise probe the
    standard local artifact caches for a DuckDB JDBC driver — when one
    exists, the JDBC source (sources/jdbc.py) can run live end-to-end
    against a file-backed DuckDB database (tests/test_jdbc_live.py).
    """
    env = os.environ.get("SPARK_GRAFT_JDBC_JARS")
    if env is not None:
        return [p for p in env.split(",") if p]
    import glob

    out: list[str] = []
    for pat in (
        "~/.cache/coursier/**/duckdb_jdbc*.jar",
        "~/.ivy2/**/duckdb_jdbc*.jar",
        "~/.m2/**/duckdb_jdbc*.jar",
    ):
        out.extend(glob.glob(os.path.expanduser(pat), recursive=True))
    return sorted(out)[:1]


#: Parent dir of the vendored `google.protobuf` alias shim
#: (_vendor/google/__init__.py) that satisfies the
#: transformWithStateInPandas worker's protobuf import from the host's
#: google-cloud-sdk copy. See the shim's docstring for the mechanism.
TWS_VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_vendor")


def tws_ready(spark: SparkSession) -> bool:
    """True when transformWithStateInPandas can run in this
    environment; as a side effect, wires the vendored protobuf shim
    into the streaming Python worker's path.

    The worker is a fresh Python process needing `google.protobuf`
    (absent as a wheel here — no network; probed rounds 2/5/6). Round
    7 found a complete pure-Python protobuf runtime vendored inside
    the host google-cloud-sdk and aliased it via _vendor/google.
    Worker visibility: entries in `sc.environment` are forwarded into
    the spawned worker's env (verified empirically — setting it AFTER
    session build still reaches the worker), so no driver-env control
    is required. Returns False (callers keep their gate) when the
    cloud-sdk runtime is missing."""
    try:
        import sys

        if TWS_VENDOR_DIR not in sys.path:
            sys.path.insert(0, TWS_VENDOR_DIR)
        import google.protobuf  # noqa: F401  (the alias shim)
        from google.protobuf import descriptor  # noqa: F401
    except Exception:
        return False
    current = os.environ.get("PYTHONPATH", "")
    if TWS_VENDOR_DIR not in current.split(os.pathsep):
        current = os.pathsep.join(p for p in (TWS_VENDOR_DIR, current) if p)
        os.environ["PYTHONPATH"] = current
    spark.sparkContext.environment["PYTHONPATH"] = current
    return True


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set session-mutable confs on an externally-built session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — builder already set it
    return spark


def get_spark(app_name: str = "data_pipeline_with_hdfs_sql_integration_spark", shuffle_partitions: int | None = None) -> SparkSession:
    n = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # 128 MB input splits: the right default for large parquet scans.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Whole-stage-codegen source cache (static conf, default 100
        # entries): a session running this engine's full query surface
        # compiles hundreds of distinct codegen stages, and at 100
        # entries every re-run recompiles (janino, ~100-500 ms/stage)
        # instead of hitting the cache — measured as a session-wide
        # slowdown once the registry outgrew the default.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
    )
    jars = jdbc_driver_jars()
    if jars:
        builder = builder.config("spark.jars", ",".join(jars))
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
