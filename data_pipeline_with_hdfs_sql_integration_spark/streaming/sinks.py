"""Streaming sinks beyond the memory sink: foreachBatch for
exactly-once delivery to batch-oriented targets.

foreachBatch hands each micro-batch to a function as a regular
DataFrame together with a monotonically increasing epoch id. Writing
to a path keyed by epoch (or MERGE-ing on a key) makes re-delivered
batches idempotent — Spark replays an epoch after failure, and the
overwrite of the same epoch dir yields the same bytes: effectively
exactly-once into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def stream_to_parquet_exactly_once(
    agg: DataFrame, out_root: str, checkpoint: str
) -> None:
    """Drive a (bounded) streaming aggregation into per-epoch parquet
    dirs. Re-running an epoch overwrites its own dir — idempotent."""

    def _write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_root}/epoch={epoch_id}")

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(_write_epoch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_final_epoch(spark: SparkSession, out_root: str) -> DataFrame:
    """Latest epoch's contents (complete mode ⇒ the final epoch is the
    whole result)."""
    import os
    import re

    epochs = [
        int(m.group(1))
        for d in os.listdir(out_root)
        if (m := re.match(r"epoch=(\d+)$", d))
    ]
    return spark.read.parquet(f"{out_root}/epoch={max(epochs)}")
