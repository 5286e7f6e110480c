"""Round-7 unit pins: ADVICE fixes + new scale-path siblings."""

import json
import os

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------ txlog
def test_txlog_replays_past_eight_digit_versions(spark, tmp_path):
    """The commit-name filter must accept 9+ digit versions (the writer
    formats {version:08d}, which widens at 10^8) and order them
    NUMERICALLY — lexicographic order would put 100000000 before
    99999999 and cap latest_version forever."""
    from data_pipeline_with_hdfs_sql_integration_spark.operators.txlog import TxTable

    t = TxTable(str(tmp_path / "tbl"))
    t.append(spark.range(2).withColumnRenamed("id", "n"))
    # Simulate a table that crossed the 10^8-version boundary: hand-place
    # an 8-digit and a 9-digit commit with the same shape as real ones.
    base = json.load(open(os.path.join(t.log_dir, "00000000.json")))
    for v in (99999999, 100000000):
        with open(os.path.join(t.log_dir, f"{v:08d}.json"), "w") as f:
            json.dump(base, f)
    assert t.latest_version() == 100000000
    names = t._commits()
    assert names[-1] == "100000000.json" and names[-2] == "99999999.json"
    # And the next append lands AFTER the 9-digit version.
    v = t.append(spark.range(1).withColumnRenamed("id", "n"))
    assert v == 100000001


# ----------------------------------------------------------- memo_persist
def test_memo_persist_evicts_stale_app_ids(spark):
    """Entries keyed by a dead application's id are evicted on access so
    the memo cannot grow unboundedly across session restarts."""
    from data_pipeline_with_hdfs_sql_integration_spark import catalog

    stale_key = ("app-dead-0000", "some_store", "/tmp/x")
    catalog._MEMO_PERSIST[stale_key] = spark.range(1)
    df = catalog.memo_persist(spark, ("r7_evict_probe",), lambda: spark.range(3))
    assert df.count() == 3
    assert stale_key not in catalog._MEMO_PERSIST
    live = (spark.sparkContext.applicationId, "r7_evict_probe")
    assert live in catalog._MEMO_PERSIST
    df.unpersist()
    catalog._MEMO_PERSIST.pop(live, None)
