"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates with explicit GroupState — the building
block for operators Spark's built-in windows can't express (custom
eviction, per-key models, dedup-within-key, ...). Driven with
availableNow + memory sink, so on a bounded replay the emitted state
equals a batch group-by — which is how the oracle checks it.

Worker-closure rule: the state-update function is defined *inside*
the entry point so cloudpickle serializes it by value; a module-level
function would be pickled by reference and fail to import on Python
workers whose sys.path lacks the repo.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from data_pipeline_with_hdfs_sql_integration_spark.streaming.windows import events_stream

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_high_value", T.LongType()),
        T.StructField("last_event_type", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_high_value", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("last_event_type", T.StringType()),
    ]
)

HIGH_VALUE = 500.0  # inlined in the worker closure below


def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay → one emission per user with final totals."""

    def _update_user_state(key, pdf_iter, state):
        # Self-contained: stdlib/pandas + the state handle only.
        import pandas as pd

        n, hi, last_ts, last_type = state.get if state.exists else (0, 0, -1, "")
        for pdf in pdf_iter:
            n += len(pdf)
            hi += int((pdf["value"] > 500.0).sum())
            idx = pdf["ts"].astype("int64").idxmax()
            ts_max = int(pdf["ts"].astype("int64").loc[idx])
            if ts_max > last_ts:
                last_ts = ts_max
                last_type = str(pdf["event_type"].loc[idx])
        state.update((n, hi, last_ts, last_type))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_high_value": [hi],
                "last_event_type": [last_type],
            }
        )

    ev = events_stream(spark, sf_dir)
    agg = ev.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # availableNow may split the replay into several micro-batches, each
    # re-emitting a user's updated totals — keep the final (max-n) row.
    out = spark.table(name)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
