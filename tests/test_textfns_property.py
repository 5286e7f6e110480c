"""Randomized three-way parity for the cross-engine hash primitives:
pure-Python reference == Spark HOF expression == DuckDB lambda, over
one batched round trip (one DF/SQL pass for all samples)."""

from __future__ import annotations

import random
import string

from tests.conftest import SF_DIR  # noqa: F401 (spark fixture import side)

MOD = 1_000_000_007
BASE = 31


def py_tokens(s: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def py_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    return h


def _samples(n: int = 200) -> list[str]:
    rng = random.Random(20260813)
    alphabet = string.ascii_letters + string.digits + " .,;:!?-_/"
    out = [""]
    out.append("a")
    out.append(" " * 5)
    out.append("!!!")
    for _ in range(n - len(out)):
        ln = rng.randint(0, 120)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def test_hash_and_tokens_three_way_parity(spark):
    import duckdb

    from data_pipeline_with_hdfs_sql_integration_spark.functions import textfns as tf
    from pyspark.sql import functions as F

    samples = _samples()
    sdf = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i int, s string")
    spark_rows = {
        r["i"]: (r["h"], r["toks"])
        for r in sdf.select(
            "i", tf.poly_hash_str(F.col("s")).alias("h"), tf.tokens(F.col("s")).alias("toks")
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, s) for i, s in enumerate(samples)])
    duck_rows = {
        i: (h, toks)
        for i, h, toks in con.execute(
            f"SELECT i, {tf.sql_poly_hash_str('s')}, {tf.sql_tokens('s')} FROM t"
        ).fetchall()
    }

    for i, s in enumerate(samples):
        py = (py_poly_hash(s), py_tokens(s))
        # DuckDB list_reduce folds over the ascii codes with a prepended 0;
        # for an empty string it returns the bare 0 seed.
        assert spark_rows[i][0] == py[0], f"spark hash mismatch on {s!r}"
        assert duck_rows[i][0] == py[0], f"duck hash mismatch on {s!r}"
        assert list(spark_rows[i][1]) == py[1], f"spark tokens mismatch on {s!r}"
        assert list(duck_rows[i][1]) == py[1], f"duck tokens mismatch on {s!r}"


def test_hash_sampling_invariant_under_repartition(spark):
    """The deterministic sampler must select the SAME keys no matter
    how the input is partitioned (the property seed-based df.sample
    lacks)."""
    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.plans.sampling import hash_bucket

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    picks = lambda d: {r["k"] for r in d.filter(hash_bucket(F.col("k")) < 10).collect()}
    base = picks(df)
    assert picks(df.repartition(17)) == base
    assert picks(df.repartition(1)) == base
    assert picks(df.repartitionByRange(5, "k")) == base
    assert 300 < len(base) < 700  # ~10% of 5000


def test_morton_roundtrip_hypothesis(spark):
    """Property: zorder2 is a bijective bit-interleave — decoding the
    code recovers (x, y) exactly for any 16-bit inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from data_pipeline_with_hdfs_sql_integration_spark.operators.zorder import BITS, zorder2

    def decode(z: int) -> tuple[int, int]:
        x = y = 0
        for j in range(BITS):
            x |= ((z >> (2 * j)) & 1) << j
            y |= ((z >> (2 * j + 1)) & 1) << j
        return x, y

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, (1 << BITS) - 1),
                              st.integers(0, (1 << BITS) - 1)),
                    min_size=1, max_size=8))
    def check(pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        for r in df.withColumn("z", zorder2(F.col("x"), F.col("y"))).collect():
            assert decode(r["z"]) == (r["x"], r["y"])

    check()
