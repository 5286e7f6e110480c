"""Python UDTF (user-defined table function) surface.

Spark 4's @udtf classes are the table-valued escape hatch: one input
row → many output rows with typed columns, composed via LATERAL join.
Same production caveat as every Python path — row-at-a-time eval, so
keep it off the hot path (the engine's own explode/split queries stay
JVM-side); this exists to prove the extension surface works end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.registry import query
from data_pipeline_with_hdfs_sql_integration_spark.session import apply_runtime_confs

MAX_POS = 5


@query(
    "udtf_word_positions",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \\t\\n\\r]+'), x -> x <> '') AS ws
            FROM documents
        ),
        p AS (
            SELECT doc_id,
                   unnest(list_transform(ws[1:{MAX_POS}],
                          (x, i) -> struct_pack(pos := i - 1, word := x))) AS s
            FROM w
        )
        SELECT CAST(s.pos AS INTEGER) AS pos,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT s.word) AS BIGINT) AS n_distinct_words
        FROM p
        GROUP BY 1
    """,
    doc="Python UDTF: each document expands to its first five "
    "(position, word) pairs via a @udtf class in a LATERAL join, then "
    "an aggregate counts docs and distinct words per position. The "
    "UDTF class is defined in-function so cloudpickle ships it by "
    "value (workers never import this package). Whitespace split "
    "mirrors Python str.split() == regex [ \\t\\n\\r]+ with empties "
    "dropped, which the oracle reproduces.",
    tags=("udtf", "python"),
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    apply_runtime_confs(spark)

    @udtf(returnType=f"pos int, word string")
    class WordPositions:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split()):
                if i >= MAX_POS:
                    break
                yield i, w

    spark.udtf.register("dps_word_positions", WordPositions)
    load(spark, sf_dir, "documents").createOrReplaceTempView("dps_udtf_docs")
    expanded = spark.sql(
        "SELECT d.doc_id, t.pos, t.word "
        "FROM dps_udtf_docs d, LATERAL dps_word_positions(d.text) t"
    )
    return expanded.groupBy("pos").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("word").alias("n_distinct_words"),
    )
