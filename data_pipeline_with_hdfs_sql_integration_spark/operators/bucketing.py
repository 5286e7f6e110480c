"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the single biggest join cost is shuffling the fact table.
Bucketing both join sides by the key at WRITE time
(``bucketBy(n, key).sortBy(key).saveAsTable``) lets every later join
on that key run with zero Exchange: bucket i of A joins bucket i of B
on the same executor. The write cost is paid once; every downstream
join, groupBy, or dedup on the bucket key is shuffle-free.

Local note: saveAsTable uses the session warehouse dir; callers pass a
database-qualified or plain table name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables; the plan must show no Exchange on
    either side (asserted in tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)
