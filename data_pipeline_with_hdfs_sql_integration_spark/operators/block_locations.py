"""Storage introspection: block/file → host histogram.

Reference behavior (server.py:70-93): WebHDFS GETFILEBLOCKLOCATIONS,
flatten each block's host list, count blocks per DataNode host.

Spark-native version: Hadoop ``FileSystem.getFileBlockLocations`` via
the JVM gateway — works uniformly for file://, hdfs://, s3a://. The
flatten+count runs as a DataFrame explode + hash aggregate (O12) so
the same code path scales to millions of blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def block_locations(spark: SparkSession, path: str) -> list[dict]:
    """Per-block host lists for every file under ``path``.

    Returns [{"file": str, "offset": int, "length": int, "hosts": [str]}].
    """
    fs, hpath, _ = _hadoop_fs(spark, path)
    out: list[dict] = []
    stack = [hpath]
    while stack:
        p = stack.pop()
        st = fs.getFileStatus(p)
        if st.isDirectory():
            for child in fs.listStatus(p):
                stack.append(child.getPath())
            continue
        for blk in fs.getFileBlockLocations(st, 0, st.getLen()):
            out.append(
                {
                    "file": st.getPath().toString(),
                    "offset": blk.getOffset(),
                    "length": blk.getLength(),
                    "hosts": list(blk.getHosts()),
                }
            )
    return out


def block_location_histogram(spark: SparkSession, path: str) -> DataFrame:
    """Host → block-count map (reference server.py:80-89) as a DataFrame."""
    blocks = block_locations(spark, path)
    if not blocks:
        return spark.createDataFrame([], "host string, n_blocks bigint")
    df = spark.createDataFrame([(b["hosts"],) for b in blocks], "hosts array<string>")
    return (
        df.select(F.explode("hosts").alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_blocks"))
    )


def block_histogram_dict(spark: SparkSession, path: str) -> dict[str, int]:
    """The reference's map<string,int32> response shape (lender.proto:10)."""
    return {r["host"]: r["n_blocks"] for r in block_location_histogram(spark, path).collect()}
