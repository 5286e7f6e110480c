"""Table-maintenance operators: small-file compaction and incremental
(high-watermark) ingestion — the two jobs every long-lived parquet
dataset needs at 100 TB.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Rewrite a parquet dataset into ~target-sized files.

    Streaming ingestion leaves thousands of tiny files; scans then pay
    per-file open cost and lose row-group locality. Compaction reads
    the dataset, repartitions to ceil(bytes/target) and rewrites via a
    temp dir + atomic-ish swap. Returns (files_before, files_after).

    At scale: run per partition directory (day=...) so a compaction
    failure affects one partition, and size by the dataset's measured
    bytes, never a guessed row count.
    """

    def _files(p: str) -> list[str]:
        out = []
        for root, _dirs, names in os.walk(p):
            out += [os.path.join(root, n) for n in names if n.endswith(".parquet")]
        return out

    before = _files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    # Read exactly the files measured above (not the directory): a file
    # landing concurrently is neither compacted nor deleted — no
    # duplicate rows.
    df = spark.read.parquet(*before)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    # Swap order matters: move compacted files IN first (part names are
    # UUID-unique so they cannot collide), THEN delete the originals —
    # a crash mid-swap leaves duplicates (recoverable by re-running),
    # never data loss.
    for f in _files(tmp):
        os.rename(f, os.path.join(path, os.path.basename(f)))
    for f in before:
        os.remove(f)
    import shutil

    shutil.rmtree(tmp)
    return len(before), len(_files(path))


def incremental_ingest(
    spark: SparkSession,
    source: DataFrame,
    ts_col: str,
    dest_path: str,
    state_path: str,
) -> int:
    """High-watermark incremental load: append only rows with
    ts > last ingested ts, then persist the new watermark.

    The watermark lives in a tiny JSON state file (at scale: a
    transactional store). Re-running after success ingests nothing —
    idempotent; re-running after a crash BEFORE the state write
    re-ingests the last batch (at-least-once), which the downstream
    dedup/MERGE operators absorb. Returns rows ingested.
    """
    last: str | None = None
    if os.path.exists(state_path):
        last = json.load(open(state_path))["high_watermark"]
    batch = source if last is None else source.filter(F.col(ts_col) > F.lit(last).cast("timestamp"))
    # Pin the batch: count / write / max must see ONE evaluation. With
    # a live source (JDBC), three separate actions could each re-query
    # it and the persisted watermark could advance past rows that were
    # never written.
    batch = batch.persist()
    try:
        n = batch.count()
        if n:
            batch.write.mode("append").parquet(dest_path)
            hw = batch.agg(F.max(ts_col).cast("string")).collect()[0][0]
            json.dump({"high_watermark": hw}, open(state_path, "w"))
    finally:
        batch.unpersist()
    return n
