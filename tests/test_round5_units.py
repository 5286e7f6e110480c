"""Round-5 unit suites: first-principles references for the bigram-LM
quality scorer and the grid-normalized Z-order scaling, plus a
consistency check between semantic dedup and the exact bounded
embedding-cosine baseline."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_lm_scores(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    """Pure-Python reference of quality_lm_bigram: returns
    doc_id -> (n_bigrams, avg_bigram_ppm) with the identical
    fixed-point integer arithmetic (floor division, ppm)."""
    toks = {
        d: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for d, s in texts.items()
    }
    toks = {d: t for d, t in toks.items() if len(t) >= 2}
    grams = {d: list(zip(t[:-1], t[1:])) for d, t in toks.items()}
    cab: Counter = Counter(g for gs in grams.values() for g in gs)
    ca: Counter = Counter()
    for (a, _b), k in cab.items():
        ca[a] += k
    p_ppm = {g: (k * 1_000_000) // ca[g[0]] for g, k in cab.items()}
    out = {}
    for d, gs in grams.items():
        n = len(gs)
        s = sum(p_ppm[g] for g in gs)
        out[d] = (n, s // n)
    return out


def test_quality_lm_bigram_matches_python_reference(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    want = _py_lm_scores(texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_bigram_ppm"])
        for r in all_queries()["quality_lm_bigram"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_quality_lm_bigram_hand_case():
    # "a b a b" -> bigrams (a,b) x2, (b,a) x1. c(a.)=2, c(b.)=1.
    # p(a,b) = 2*1e6 // 2 = 1_000_000; p(b,a) = 1*1e6 // 1 = 1_000_000.
    # Every bigram is fully predictable -> avg 1_000_000.
    ref = _py_lm_scores({1: "a b a b", 2: "x y"})
    assert ref[1] == (3, 1_000_000)
    # doc 2: single bigram (x,y), c(x.)=1 -> ppm 1_000_000.
    assert ref[2] == (1, 1_000_000)
    # A doc whose continuations are rare GIVEN a common first token
    # scores below the doc carrying the common continuation:
    # c(a->b)=4 of c(a->.)=7, vs c(a->x)=c(a->y)=c(a->z)=1 of 7.
    ref2 = _py_lm_scores({1: "a b a b a b a b", 3: "a x a y a z"})
    assert ref2[3][1] < ref2[1][1]
    assert ref2[1] == (7, (4 * (4_000_000 // 7) + 3 * 1_000_000) // 7)


def test_scale_to_grid_bounds_and_monotonicity(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.operators.zorder import (
        scale_to_grid,
    )

    df = spark.range(0, 2000, 7).select(F.col("id").cast("long").alias("x"))
    out = df.select(
        "x", scale_to_grid(F.col("x"), 0, 1995, 256).alias("g")
    ).collect()
    pairs = sorted((r["x"], r["g"]) for r in out)
    gs = [g for _x, g in pairs]
    assert min(gs) == 0 and max(gs) == 255
    # Affine scaling never inverts order.
    assert all(g1 <= g2 for g1, g2 in zip(gs, gs[1:]))
    # Degenerate span (lo == hi) clamps instead of dividing by zero.
    one = df.limit(1).select(scale_to_grid(F.col("x"), 5, 5, 256).alias("g"))
    assert 0 <= one.collect()[0]["g"] <= 255


def test_dedup_semantic_consistent_with_exact_pairs(spark):
    """Within the exact baseline's bounded subset: any vector the exact
    cross-join finds as the HIGHER id of an above-threshold pair whose
    two sides land in the SAME k-means cell must be dropped by
    dedup_semantic, and any vector with no above-threshold cell-mate at
    all must be kept. (Pairs split across cells are exactly SemDeDup's
    documented recall loss, so they assert nothing.)"""
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    sem = {
        r["vec_id"]: (r["cell_id"], r["keep"])
        for r in all_queries()["dedup_semantic"].fn(spark, SF_DIR).collect()
    }
    exact_pairs = [
        (r["vec_a"], r["vec_b"])
        for r in all_queries()["dedup_embedding_cosine"].fn(spark, SF_DIR).collect()
    ]
    dup_ids = set()
    for a, b in exact_pairs:
        lo, hi = min(a, b), max(a, b)
        if sem[lo][0] == sem[hi][0]:
            dup_ids.add(hi)
    for vid in dup_ids:
        assert sem[vid][1] == 0, f"vec {vid} has a lower-id cell-mate dup but kept"
    # Vectors without ANY above-threshold partner in the subset and with
    # no partner elsewhere cannot be proven kept from the bounded
    # baseline alone, so only assert the implication direction above
    # plus: at least one vector is kept and at least one dropped at this SF.
    keeps = {k for k, (_c, kp) in sem.items() if kp == 1}
    drops = {k for k, (_c, kp) in sem.items() if kp == 0}
    assert keeps and drops


def test_sketch_quantile_error_bound(spark, duck):
    """The histogram quantile estimate must sit within ONE bin width of
    the exact rank-based quantile — the sketch's advertised error
    contract, checked against DuckDB's exact ordered-rank answer."""
    from data_pipeline_with_hdfs_sql_integration_spark.plans.sketches import (
        HQ_BIN_W,
        HQ_QS_PM,
    )
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    est = {
        r["q_pm"]: r["est_upper"]
        for r in all_queries()["sketch_histogram_quantiles"].fn(spark, SF_DIR).collect()
    }
    for q in HQ_QS_PM:
        exact = duck.sql(
            f"""
            SELECT o_totalprice FROM (
                SELECT o_totalprice,
                       row_number() OVER (ORDER BY o_totalprice) AS rn,
                       count(*) OVER () AS n
                FROM orders)
            WHERE rn = ({q} * n + 999) // 1000
            """
        ).fetchone()[0]
        assert abs(est[q] - exact) <= HQ_BIN_W, (q, est[q], exact)


def test_quality_compression_ratio_matches_zlib(spark):
    """Pin the Arrow-batched compressibility gate against direct python
    zlib on the same documents — exact integer byte counts, exact
    rounded ratio, exact keep verdicts."""
    import zlib

    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    got = {
        r["doc_id"]: (
            r["raw_bytes"],
            r["compressed_bytes"],
            r["compression_ratio"],
            r["keep"],
        )
        for r in all_queries()["quality_compression_ratio"].fn(spark, SF_DIR).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    assert set(got) == set(texts)
    for d, s in texts.items():
        raw = (s or "").encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        ratio = round(comp / max(len(raw), 1), 6)
        keep = 1 if 0.25 <= ratio <= 1.05 else 0
        assert got[d] == (len(raw), comp, ratio, keep), d


def test_txtable_versions_are_immutable(spark, tmp_path):
    """Transaction-log table: append/append/overwrite must yield three
    versions whose snapshots stay byte-stable — overwriting the table
    cannot change what an old version reads (no file is ever mutated)."""
    from data_pipeline_with_hdfs_sql_integration_spark.operators.txlog import TxTable

    t = TxTable(str(tmp_path / "tx"))
    df1 = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    df2 = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    df3 = spark.range(100, 103).selectExpr("id", "id * 2 AS v")
    assert t.append(df1) == 0
    assert t.append(df2) == 1
    v0 = sorted(r["id"] for r in t.snapshot(spark, 0).collect())
    v1 = sorted(r["id"] for r in t.snapshot(spark, 1).collect())
    assert v0 == list(range(10))
    assert v1 == list(range(15))
    assert t.overwrite(df3) == 2
    # Latest = only the overwrite's rows; old versions unchanged.
    assert sorted(r["id"] for r in t.snapshot(spark).collect()) == [100, 101, 102]
    assert sorted(r["id"] for r in t.snapshot(spark, 0).collect()) == v0
    assert sorted(r["id"] for r in t.snapshot(spark, 1).collect()) == v1
    # Commit numbering is dense and replayable.
    assert t.latest_version() == 2


def test_txlog_optimize_shrinks_files_keeps_history(spark):
    """format_txlog_optimize: the compaction commit must reduce the
    LIVE file count to 1 while the pre-compaction version still lists
    the fragmented set (immutable history)."""
    from data_pipeline_with_hdfs_sql_integration_spark.catalog import table_path
    from data_pipeline_with_hdfs_sql_integration_spark.operators.txlog import (
        scratch_table,
    )
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    all_queries()["format_txlog_optimize"].fn(spark, SF_DIR).collect()
    t = scratch_table("events_optimize", table_path(SF_DIR, "events"))
    assert t.latest_version() == 2
    assert len(t.live_files(2)) == 1
    assert len(t.live_files(1)) == 16  # 2 commits x repartition(8)
    # History is immutable: the fragmented files still exist on disk.
    import os

    assert all(os.path.exists(f) for f in t.live_files(1))


def test_txlog_vacuum_respects_retention(spark, tmp_path):
    """VACUUM deletes only files exclusive to versions past retention;
    retained versions stay readable, vacuumed ones fail loudly."""
    import pytest

    from data_pipeline_with_hdfs_sql_integration_spark.operators.txlog import (
        TxTable,
        vacuum,
    )

    t = TxTable(str(tmp_path / "tx"))
    t.append(spark.range(0, 5).selectExpr("id"))          # v0
    t.overwrite(spark.range(10, 12).selectExpr("id"))     # v1 replaces v0
    t.append(spark.range(20, 22).selectExpr("id"))        # v2 adds
    deleted = vacuum(t, keep_versions=2)  # retain v1, v2
    # v0's files were only referenced by v0 -> gone; v1/v2 files kept.
    assert deleted and all("g-" in p for p in deleted)
    assert sorted(r["id"] for r in t.snapshot(spark, 2).collect()) == [10, 11, 20, 21]
    assert sorted(r["id"] for r in t.snapshot(spark, 1).collect()) == [10, 11]
    with pytest.raises(Exception):
        t.snapshot(spark, 0).collect()  # vacuumed history fails loudly
    # Idempotent: nothing left to delete.
    assert vacuum(t, keep_versions=2) == []


def test_txlog_constraints_protocol(spark, tmp_path):
    """set/drop constraint metadata commits; refused appends leave
    version + snapshot untouched; NULL predicate counts as violation."""
    import pytest

    from data_pipeline_with_hdfs_sql_integration_spark.operators.txlog import (
        ConstraintViolation,
        TxTable,
    )

    t = TxTable(str(tmp_path / "tbl"))
    t.set_constraint("positive", "v > 0")
    assert t.constraints() == {"positive": "v > 0"}
    t.append(spark.createDataFrame([(1,), (2,)], "v int"))
    v_before = t.latest_version()
    rows_before = t.snapshot(spark).count()

    with pytest.raises(ConstraintViolation):
        t.append(spark.createDataFrame([(3,), (-1,)], "v int"))
    # NULL must also be refused (constraint must evaluate TRUE).
    with pytest.raises(ConstraintViolation):
        t.append(spark.createDataFrame([(None,)], "v int"))
    assert t.latest_version() == v_before
    assert t.snapshot(spark).count() == rows_before

    t.drop_constraint("positive")
    assert t.constraints() == {}
    t.append(spark.createDataFrame([(-5,)], "v int"))  # now admissible
    assert t.snapshot(spark).count() == rows_before + 1
    # Historical constraint state is versioned like the file set.
    assert t.constraints(version=v_before) == {"positive": "v > 0"}


def test_txlog_concurrent_appends(spark, tmp_path):
    """Two writers racing the optimistic create-exclusive commit: both
    appends must land under DISTINCT versions and the final snapshot
    must contain both batches exactly once."""
    import threading

    from data_pipeline_with_hdfs_sql_integration_spark.operators.txlog import TxTable

    t = TxTable(str(tmp_path / "race"))
    t.append(spark.createDataFrame([(0,)], "v int"))
    errs = []

    def writer(val: int) -> None:
        try:
            TxTable(t.root).append(spark.createDataFrame([(val,)], "v int"))
        except Exception as ex:  # pragma: no cover - diagnostic only
            errs.append(ex)

    th = [threading.Thread(target=writer, args=(v,)) for v in (1, 2)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs
    assert t.latest_version() == 2
    vals = sorted(r["v"] for r in t.snapshot(spark).collect())
    assert vals == [0, 1, 2]
