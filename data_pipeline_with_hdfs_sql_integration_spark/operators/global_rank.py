"""Distributed global row_number without a single-partition sort.

`Window.orderBy(...)` with no partitionBy moves the WHOLE relation
through one task (`WindowExec: No Partition Defined`) — fine for a few
thousand rows, a scale-killer for a rank over ~1e9 customers or a
web-scale vocabulary. This operator computes the identical global rank
in two phases:

1. `repartitionByRange` on the full sort key, so partition-id order IS
   sort order, then a per-partition `row_number` window keyed on
   `spark_partition_id()` — every sort is partition-local.
2. The global rank = local rank + (rows in all lower-id partitions).
   The per-partition counts are ONE ROW PER PARTITION — pulled to the
   driver (bounded by the cluster's partition count, never by data;
   the same legitimacy class as the k-means centroid pulls in
   plans/similarity.py) and re-attached as a literal lookup map.

The ranked frame is persisted before the counts job: range-partition
boundaries come from a sampling pass whose seed varies per job, so the
offsets job and the caller's downstream job MUST observe the same
physical partitioning — without the pin the two jobs could rank
against different boundaries and silently mis-rank boundary rows.

The reference has no window functions at all (SURVEY.md §2 "explicitly
absent"); this exists so the engine's ranking extensions hold their
shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame, order: list[tuple[str, str]], alias: str = "i"
) -> DataFrame:
    """Return `df` plus a 1-based global `alias` column equal to
    row_number() over the total order `order` ([(col, 'asc'|'desc')],
    later columns break ties), computed without any unpartitioned
    window or single-partition sort.

    Triggers one Spark job (the per-partition count pull) and persists
    the ranked intermediate for the caller's downstream job — callers
    following the repo convention never unpersist; the bench's
    between-query clearCache bounds the residue.
    """
    from pyspark.storagelevel import StorageLevel

    sort_cols = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order
    ]
    rp = df.repartitionByRange(*sort_cols).withColumn(
        "_gr_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_gr_pid").orderBy(*sort_cols)
    loc = rp.withColumn("_gr_r", F.row_number().over(w)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = {
        row["_gr_pid"]: row["cnt"]
        for row in loc.groupBy("_gr_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        off = F.coalesce(
            F.element_at(
                F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
                F.col("_gr_pid"),
            ),
            F.lit(0),
        )
    else:
        off = F.lit(0)
    return loc.withColumn(alias, (F.col("_gr_r") + off).cast("long")).drop(
        "_gr_pid", "_gr_r"
    )
