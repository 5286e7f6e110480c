"""Skew mitigation for hot join/aggregation keys.

At 100 TB a county-style key (the reference's county_code — skewed by
construction, FIXTURES.md §C4) concentrates a shuffle partition on one
executor. Two engine-level tools beyond AQE's automatic skew-join
splitting (enabled in session.py):

- `salted_join`: explicit N-way salt of the large side + replication
  of the small side — for when the small side is too big to broadcast
  but small enough to replicate N×.
- `salted_group_count`: two-phase aggregation (salted partial →
  unsalted final) for hot-key group-bys whose aggregate is
  decomposable.

Both are deterministic (content-hash salts, not rand()) so retried
tasks produce identical output — a correctness requirement under
speculative execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys spread over n_salts
    sub-keys and the small side replicated once per salt.

    Shuffle key becomes (key, salt): a key holding P% of rows now maps
    to n_salts partitions instead of one.
    """
    non_key = [c for c in large.columns if c != key]
    salted_large = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key]) if non_key else F.xxhash64(F.col(key)), F.lit(n_salts)),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_large.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_group_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() in two phases: partial count per (key, salt)
    then final sum per key — the hot key's rows combine in parallel."""
    partial = (
        df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").cast("long").alias("n"))
