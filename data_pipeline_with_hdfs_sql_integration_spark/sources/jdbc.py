"""JDBC source (SURVEY.md §2 O1): the reference pulls its extract from
MySQL with the whole SQL statement shipped to the database
(reference server.py:29-39). Spark equivalent, with both modes:

- ``query`` mode — exact reference parity: the statement (join +
  band filter included) executes inside the RDBMS, one result stream.
- ``table + predicates`` mode — the scale path: Spark plans the scan,
  pushes filters/pruning into the source, and reads N partitions in
  parallel via ``partitionColumn/lowerBound/upperBound/numPartitions``.

No MySQL exists in this environment, so there is no registered query;
tests cover option construction, and the callsite is
``api.Pipeline.db_to_store`` with a parquet source standing in.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str  # e.g. jdbc:mysql://host:3306/db
    user: str
    password: str
    driver: str = "com.mysql.cj.jdbc.Driver"
    extra: dict[str, str] = field(default_factory=dict)

    def _reader(self, spark: SparkSession):
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("user", self.user)
            .option("password", self.password)
            .option("driver", self.driver)
        )
        for k, v in self.extra.items():
            r = r.option(k, v)
        return r

    def query(self, spark: SparkSession, sql: str) -> DataFrame:
        """Reference-parity mode: ship the whole statement to the DB."""
        return self._reader(spark).option("query", sql).load()

    def table_partitioned(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str,
        lower_bound: int,
        upper_bound: int,
        num_partitions: int = 32,
    ) -> DataFrame:
        """Scale mode: parallel range-partitioned scan; Catalyst pushes
        filters/pruned columns into each partition's generated SQL."""
        return (
            self._reader(spark)
            .option("dbtable", table)
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
            .load()
        )
