"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from tests.oracle_utils import compare


def _specs():
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    return [s for s in all_queries().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_matches_oracle(spark, duck, spec):
    sdf = spec.fn(spark, SF_DIR)
    rel = duck.sql(spec.oracle)
    ok, msg = compare(sdf, rel)
    assert ok, f"{spec.name}: {msg}"


def test_rows_only_queries_run(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.registry import all_queries

    for spec in all_queries().values():
        if spec.oracle is None:
            df = spec.fn(spark, SF_DIR)
            # Non-empty, not merely runnable: a rows-only query that
            # regresses to zero rows must fail here (the same guard the
            # round-6 advice added to tools/full_sweep.py).
            assert df.count() > 0, f"{spec.name}: rows-only query returned 0 rows"
