"""Fixture-drift canary.

The driver can regenerate /root/testdata at any sandbox reset, and a
silent physical-schema change there once cost 18 correctness rows and a
whole bench round (see catalog.normalize_events_ts). This test pins the
column names of every table and the set of ACCEPTED physical layouts for
the volatile columns, so the next drift costs one loud test failure that
points at the loader — not a round.

If this test fails: the fixtures changed shape. Fix the adaptive logic in
data_pipeline_with_hdfs_sql_integration_spark/catalog.py (and, for `ts`,
normalize_events_ts), then update the accepted layouts here.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from data_pipeline_with_hdfs_sql_integration_spark import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

EXPECTED_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ],
    "lineitem": [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ],
    "events": ["event_id", "ts", "user_id", "event_type", "value", "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}

# Physical layouts the loaders are known to handle. Anything outside
# these sets means catalog.py needs a new branch BEFORE queries run.
ACCEPTED_TS_LAYOUTS = {"timestamp[us]", "timestamp[ms]", "timestamp[ns]", "int64"}
ACCEPTED_DATE_LAYOUTS = {"timestamp[us]", "timestamp[ms]", "date32[day]"}
ACCEPTED_EMBEDDING_LAYOUTS = {
    "list<element: float>",
    "list<item: float>",
    "list<element: double>",
    "list<item: double>",
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_fixture_columns_unchanged(table):
    schema = pq.read_schema(catalog.table_path(SF_DIR, table))
    assert schema.names == EXPECTED_COLUMNS[table], (
        f"testdata drift: {table}.parquet columns changed — "
        f"update data_pipeline_with_hdfs_sql_integration_spark/catalog.py loaders first"
    )


def _physical(table, column):
    schema = pq.read_schema(catalog.table_path(SF_DIR, table))
    return str(schema.field(column).type)


def test_events_ts_layout_supported():
    assert _physical("events", "ts") in ACCEPTED_TS_LAYOUTS, (
        "testdata drift: events.ts physical type changed — "
        "add a branch to catalog.normalize_events_ts"
    )


def test_date_column_layouts_supported():
    assert _physical("orders", "o_orderdate") in ACCEPTED_DATE_LAYOUTS
    assert _physical("lineitem", "l_shipdate") in ACCEPTED_DATE_LAYOUTS


def test_embedding_layout_supported():
    assert _physical("embeddings", "embedding") in ACCEPTED_EMBEDDING_LAYOUTS


def test_all_scale_factors_agree_on_events_ts():
    """The loader branches on dtype per-directory; if the generator ever
    writes different layouts at different SFs, every SF must still be in
    the accepted set (the adaptive loader handles mixed layouts)."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = os.path.join("/root/testdata", sf, "events.parquet")
        if not os.path.exists(path):
            continue
        assert str(pq.read_schema(path).field("ts").type) in ACCEPTED_TS_LAYOUTS, sf


def test_loader_normalizes_ts_to_timestamp(spark):
    """End-to-end: whatever the physical layout, load_events must hand
    queries a session-timezone TIMESTAMP column."""
    from pyspark.sql.types import TimestampType

    df = catalog.load_events(spark, SF_DIR)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
