"""Table catalog over the driver's parquet star schema.

The reference infers schemas end-to-end (SURVEY.md §1.3); we do the
same — parquet is self-describing — but pin the table *names* so every
query addresses tables identically to the DuckDB oracle views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    """A byte-size conf ('134217728', '134217728b', '128MB', ...) as int."""
    import re

    try:
        raw = spark.conf.get(key)
    except Exception:
        return default
    m = re.fullmatch(r"\s*(\d+)\s*([kmgtp]?b?)\s*", str(raw), re.IGNORECASE)
    if not m:
        return default
    mult = {"": 1, "b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40, "p": 1 << 50}
    return int(m.group(1)) * mult[m.group(2).lower().rstrip("b")]


def _estimated_scan_splits(spark: SparkSession, path: str) -> int:
    """Driver-side estimate of the scan's partition count from the file
    listing alone — no plan-to-RDD conversion, no job. Mirrors Spark's
    FilePartition bin-packing: files are chunked at maxPartitionBytes
    and packed with an openCostInBytes surcharge per file."""
    max_bytes = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 << 20)
    total = 0
    n_files = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                total += os.path.getsize(os.path.join(root, f))
                n_files += 1
    elif os.path.exists(path):
        total = os.path.getsize(path)
        n_files = 1
    else:  # non-local path (hdfs://, s3://...) — let Spark answer
        return -1
    return max(1, -(-(total + n_files * open_cost) // max_bytes))


def table_on_disk_bytes(sf_dir: str, name: str) -> int:
    """On-disk parquet size of a table from the driver's file listing —
    no Spark job. Returns -1 for non-local paths (hdfs://, s3://...),
    where the caller must NOT assume 'small'."""
    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
        return total
    if os.path.exists(path):
        return os.path.getsize(path)
    return -1


def broadcast_gate(sf_dir: str, name: str, limit_bytes: int = 64 << 20):
    """Identity-or-`F.broadcast` wrapper for frames DERIVED from table
    `name` (signatures, probe assignments, candidate sets — all a
    constant factor of the source row count).

    At test SFs the derived sides are kilobytes and every broadcast
    collapses a shuffle exchange into a map-side join — in local mode
    that's the difference between a 10-stage and a 3-stage plan. At
    100 TB the gate reads the source size from the driver listing
    (free) and returns identity, so the plan degrades to the
    shuffle-on-key equi-join it was designed as. Unknown (non-local)
    sizes count as LARGE — never assume broadcastable."""
    from pyspark.sql import functions as F

    size = table_on_disk_bytes(sf_dir, name)
    if 0 <= size <= limit_bytes:
        return F.broadcast
    return lambda df: df


def load_parallel(spark: SparkSession, sf_dir: str, name: str, key: str | None = None) -> DataFrame:
    """Scan with enough splits to keep every core busy.

    Per-row CPU-bound work (token/shingle hashing, vector math) on a
    small input (fewer splits than cores) leaves most of the cluster
    idle — repartition up to cluster parallelism, but ONLY then:
    `repartition` always materializes a full exchange, and at 100 TB
    the scan already yields thousands of splits, so an unconditional
    repartition would shuffle the whole input for nothing. The split
    count comes from the driver-side file listing (no job, no
    plan-to-RDD hop); only non-local paths fall back to asking Spark.

    ``key``: hash-partition the spread by this high-cardinality column
    instead of round-robin (guide §2.4 — two operations keyed the same
    way share one exchange): a caller whose downstream groupings are
    all keyed by ``key`` (or supersets of it) rides this single
    exchange end-to-end. Same small-input-only guard; at scale the
    scan-native layout is kept either way and downstream operators
    plan their own exchanges exactly as before.
    """
    df = load(spark, sf_dir, name)
    parallelism = spark.sparkContext.defaultParallelism
    splits = _estimated_scan_splits(spark, table_path(sf_dir, name))
    if splits < 0:
        splits = df.rdd.getNumPartitions()
    if splits < parallelism:
        df = df.repartition(parallelism, key) if key else df.repartition(parallelism)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Make `ts` a timestamp regardless of the fixture's physical layout.

    The schema is inferred, never declared (mirroring server.py:39,107),
    so the loader must adapt to whatever the generator wrote:
    - TIMESTAMP(NANOS) read as long (legacy.parquet.nanosAsLong):
      convert with exact integer division — double division would lose
      precision past 2^53 ns.
    - TIMESTAMP_NTZ (plain timestamp[us/ms] parquet): cast to the
      session-timezone TIMESTAMP. The session TZ is pinned to UTC
      (session.py), so the cast is value-preserving, and downstream
      event-time code (unix_micros, watermarks) expects TIMESTAMP.
    - TIMESTAMP: pass through.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with `ts` normalized to a timestamp (see
    normalize_events_ts). nanosAsLong stays on so a legacy
    TIMESTAMP(NANOS) fixture reads as long instead of erroring."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    return normalize_events_ts(df)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# One persisted copy per (application, key) for derived frames that
# MANY queries re-derive identically (the hashed-token/shingle base,
# parsed vector tables). Without the memo, every query call stacks a
# fresh persist of the same data in the CacheManager — never
# unpersisted, so a 79-query bench session accumulates dozens of
# identical cached copies, and the eviction/GC churn shows up as a
# session-wide slowdown (round 5: +31% on the common bench subset with
# zero plan changes). The accessor re-persists after an external
# clearCache, so callers may clear the session cache freely between
# queries to bound memory at one query's working set.
_MEMO_PERSIST: dict[tuple, DataFrame] = {}
_MEMO_LOCK = __import__("threading").Lock()


def memo_persist(spark: SparkSession, key: tuple, build) -> DataFrame:
    """Return the session's single persisted instance of the frame
    `build()` constructs, creating (and re-persisting, if a
    clearCache dropped it) on demand. `key` must determine the frame's
    content (e.g. ("shingle_base", sf_dir)).

    Entries are keyed by applicationId; on access, entries from OTHER
    appIds (dead JVMs after a session restart) are evicted so the memo
    can't grow for the life of the process or hand back DataFrames
    bound to a gone SparkContext. The check-then-insert is guarded by
    a lock for concurrent query builds (only the dict bookkeeping —
    `build()` runs outside the lock; a racing duplicate build loses
    the insert and its frame is simply never persisted)."""
    from pyspark.storagelevel import StorageLevel

    app_id = spark.sparkContext.applicationId
    full_key = (app_id, *key)
    with _MEMO_LOCK:
        stale = [k for k in _MEMO_PERSIST if k[0] != app_id]
        for k in stale:
            del _MEMO_PERSIST[k]
        df = _MEMO_PERSIST.get(full_key)
    if df is None:
        built = build()
        with _MEMO_LOCK:
            df = _MEMO_PERSIST.setdefault(full_key, built)
    lvl = df.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        df.persist(StorageLevel.MEMORY_AND_DISK)
    return df


# Wall-clock seconds spent *building* each derived store this process
# actually materialized (cache hits don't appear). bench.py emits this
# map so a bench regression caused by cold-store rebuild cost is
# localizable instantly instead of bleeding anonymously into whichever
# query triggered the build.
STORE_BUILD_TIMES: dict[str, float] = {}


def publish_store(store: str, write_fn) -> None:
    """Materialize a derived parquet store exactly once, atomically.

    Builds into a process-unique staging dir, then renames it into
    place — rename is atomic on a POSIX filesystem, so a concurrent
    builder (another test session, the driver) either wins the rename
    or finds the published store and discards its own staging copy.
    A plain write.mode('overwrite') straight to the store path would
    let two builders interleave files. No-op if already published.
    """
    import shutil
    import time

    if os.path.exists(os.path.join(store, "_SUCCESS")):
        return
    if os.path.exists(store):  # crashed/partial build from an old scheme
        # TOCTOU guard: between the _SUCCESS check above and this
        # removal, a concurrent builder may have atomically renamed a
        # COMPLETE store into place. Re-check _SUCCESS immediately
        # before removing, and only remove dirs that have had time to
        # settle — a complete store's mtime is its (recent) staging
        # build time, so the age gate alone protects it; a genuinely
        # dead partial ages past the grace period and gets cleaned by a
        # later call.
        if os.path.exists(os.path.join(store, "_SUCCESS")):
            return
        try:
            age = time.time() - os.stat(store).st_mtime
        except OSError:
            age = float("inf")  # vanished mid-probe: nothing to remove
        if age >= 60.0:
            shutil.rmtree(store, ignore_errors=True)
    staging = f"{store}.staging.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    t0 = time.monotonic()
    write_fn(staging)
    STORE_BUILD_TIMES[os.path.basename(store)] = round(
        STORE_BUILD_TIMES.get(os.path.basename(store), 0.0)
        + (time.monotonic() - t0),
        4,
    )
    try:
        os.rename(staging, store)
    except OSError:
        if os.path.exists(os.path.join(store, "_SUCCESS")):
            shutil.rmtree(staging, ignore_errors=True)  # raced: other builder won
        else:
            # Blocked by a partial the age gate spared; our build is
            # complete, so replace it (retry once — a publisher landing
            # in this gap wins and we discard our copy).
            shutil.rmtree(store, ignore_errors=True)
            try:
                os.rename(staging, store)
            except OSError:
                shutil.rmtree(staging, ignore_errors=True)


def clear_derived_stores(sf_dir: str) -> list[str]:
    """Remove every PUBLISHED derived store keyed to ``sf_dir`` (or
    its tables) so the next access rebuilds it in-process — which is
    what makes ``STORE_BUILD_TIMES`` populate. bench.py's cold-store
    pre-pass uses this: with /tmp warm across driver rounds, every
    build is a cache hit, ``store_build_s`` commits as ``{}``, and a
    regression caused by index-build cost can't be separated from
    query cost (the round-6 accounting contract). Matching is by the
    deterministic_tmp_dir digest of the SF's source paths — only this
    SF's derived artifacts are touched, never another session's.

    NOT safe while another process is mid-read on the same SF's
    stores (bench runs standalone; gate via
    SPARK_GRAFT_BENCH_COLD_STORES=0 when sharing the box)."""
    import glob
    import hashlib
    import shutil
    import tempfile

    sources = [sf_dir] + [table_path(sf_dir, t) for t in TABLES]
    removed: list[str] = []
    for src in sources:
        ap = os.path.abspath(src)
        try:
            st = os.stat(ap)
            token = f"{ap}|{st.st_mtime_ns}|{st.st_size}"
        except OSError:
            continue
        digest = hashlib.sha256(token.encode()).hexdigest()[:16]
        for d in glob.glob(
            os.path.join(tempfile.gettempdir(), f"dps_*_{digest}")
        ):
            shutil.rmtree(d, ignore_errors=True)
            removed.append(os.path.basename(d))
    return sorted(removed)


def params_digest(*params) -> str:
    """Short digest of the algorithm constants baked into a derived
    store (hyperplane values, hash seeds, k-means iteration counts...).
    Fold it into the store's `kind` so the cache key changes whenever
    the CONSTANTS change — a count alone can't (same plane count with
    different values must never serve stale signatures)."""
    import hashlib

    return hashlib.sha256(repr(params).encode()).hexdigest()[:8]


def deterministic_tmp_dir(kind: str, source_path: str) -> str:
    """Stable scratch dir for artifacts derived from `source_path`,
    keyed on the source's identity AND content version (mtime+size),
    so regenerated fixtures can never serve a stale derived copy."""
    import hashlib
    import tempfile

    ap = os.path.abspath(source_path)
    try:
        st = os.stat(ap)
        token = f"{ap}|{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        token = ap
    digest = hashlib.sha256(token.encode()).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"dps_{kind}_{digest}")
