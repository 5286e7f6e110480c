"""Semantic invariants for the cleaning operators — properties the
value-oracle confirms but cannot explain: scrub idempotence and
completeness, SCD2 interval laws, k-means partition totality."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _q(name):
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    return all_queries()[name]


def test_pii_scrub_masks_every_digit(spark):
    """After the full chain no digit survives anywhere, and re-running
    the chain on scrubbed text is a no-op (idempotence)."""
    from data_pipeline_with_hdfs_sql_integration_spark.plans import cleaning as cl

    line = F.concat(
        F.lit("uid="), F.col("user_id").cast("string"),
        F.lit(" mail=user"), F.col("user_id").cast("string"), F.lit("@example.com"),
        F.lit(" ip=10."), (F.col("user_id") % 256).cast("string"),
        F.lit("."), (F.col("event_id") % 256).cast("string"), F.lit(".7"),
        F.lit(" note="), F.col("event_type"), F.lit(" "), F.col("props"),
    )

    def scrub(col):
        col = F.regexp_replace(col, cl.RE_EMAIL, "<EMAIL>")
        col = F.regexp_replace(col, cl.RE_IPV4, "<IP>")
        return F.regexp_replace(col, cl.RE_DIGITS, "<NUM>")

    from data_pipeline_with_hdfs_sql_integration_spark.catalog import load

    ev = load(spark, SF_DIR, "events").limit(2000)
    out = ev.select(scrub(line).alias("s1")).select(
        "s1", scrub(F.col("s1")).alias("s2")
    )
    bad = out.filter(
        F.col("s1").rlike("[0-9]") | (F.col("s1") != F.col("s2"))
    ).count()
    assert bad == 0


def test_pii_scrub_counts_are_total(spark):
    """Each event contributes exactly one email and one IP; redaction
    counts must equal the event count per type."""
    rows = _q("pii_scrub_events").fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.emails_redacted == r.n_events, r
        assert r.ips_redacted == r.n_events, r
        assert r.nums_redacted > 0
        assert "<" not in r.event_type


def test_scd2_interval_laws(spark):
    """Per key: exactly one open (current) version, intervals chain
    with no gaps/overlaps, and consecutive versions differ in the
    tracked attribute."""
    rows = _q("scd2_order_priority").fn(spark, SF_DIR).collect()
    assert rows
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r.effective_from)
        open_versions = [r for r in versions if r.effective_to is None]
        assert len(open_versions) == 1, key
        assert versions[-1].is_current and versions[-1].effective_to is None
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.effective_to == nxt.effective_from, key  # chained
            assert prev.priority != nxt.priority, key  # real change points
            assert not prev.is_current


def test_kmeans_cells_partition_the_corpus(spark):
    """Cluster sizes sum to the corpus size; every cell is non-empty;
    cohesion sum is bounded by membership (cosine <= 1)."""
    import duckdb

    rows = _q("cluster_kmeans").fn(spark, SF_DIR).collect()
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchone()[0]
    assert sum(r.n_members for r in rows) == n_vecs
    for r in rows:
        assert r.n_members > 0
        assert r.sum_cos_fp <= r.n_members * 1_000_000
