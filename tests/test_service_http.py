"""End-to-end tests for the JSON/HTTP service skin (service.py) —
the transport analog of reference server.py:149-160 + client.py:9-35,
driven verb-by-verb over a real socket."""

from __future__ import annotations

import os
import tempfile
import urllib.error
import urllib.request

import pytest

from data_pipeline_with_hdfs_sql_integration_spark.api import Pipeline
from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.service import (
    LenderHttpClient,
    LenderHttpService,
    serve_grpc,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture()
def service(spark):
    root = tempfile.mkdtemp(prefix="dps_svc_")
    pipe = Pipeline(
        spark=spark,
        main_path=os.path.join(root, "main.parquet"),
        cache_root=os.path.join(root, "partitions"),
        key_col="c_nationkey",
        value_col="o_totalprice",
    )
    orders = load(spark, SF_DIR, "orders")
    cust = load(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    svc = LenderHttpService(
        pipe,
        db_to_store_fn=lambda: pipe.db_to_store(
            orders,
            band_col="o_totalprice",
            band=(1000.0, 400000.0),
            dim=cust,
            join_on=orders.o_custkey == cust.c_custkey,
            attempts=1,
            sleep_s=0.0,
        ),
    )
    port = svc.start()
    try:
        yield svc, LenderHttpClient(port)
    finally:
        svc.stop()


def test_three_verbs_over_http(service, spark):
    svc, client = service

    # DbToHdfs first: it materializes the main dataset the other verbs read.
    status = client.db_to_hdfs()["status"]
    assert status.startswith("Imported ") and "rows" in status

    # CalcAvgLoan: create → reuse state machine, proto field names.
    first = client.calc_avg_loan(5)
    assert first["error"] == "" and first["source"] == "create" and first["avg_loan"] > 0
    second = client.calc_avg_loan(5)
    assert second["source"] == "reuse" and second["avg_loan"] == first["avg_loan"]

    # Value parity with a direct grouped aggregate (server.py:109 truncation).
    from pyspark.sql import functions as F

    expected = (
        spark.read.parquet(svc.pipeline.main_path)
        .filter(F.col("c_nationkey") == 5)
        .agg(F.avg("o_totalprice"))
        .collect()[0][0]
    )
    assert first["avg_loan"] == int(expected)

    # BlockLocations: host → block-count map over the main dataset.
    blocks = client.block_locations()
    assert blocks["error"] == "" and sum(blocks["block_entries"].values()) >= 1


def test_calc_avg_loan_missing_key_is_in_band_error(service):
    _, client = service
    client.db_to_hdfs()
    resp = client.calc_avg_loan(9999)
    assert resp["avg_loan"] == 0 and resp["source"] == "" and resp["error"]


def test_block_locations_bad_path_is_in_band_error(service):
    _, client = service
    resp = client.block_locations("/definitely/not/a/file.parquet")
    assert resp["block_entries"] == {} and resp["error"]


def test_unknown_verb_is_404(service):
    svc, client = service
    req = urllib.request.Request(f"{client.base}/NoSuchRpc", data=b"{}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=10)
    assert err.value.code == 404


def test_concurrent_calc_avg_loan_requests(service):
    """The reference serves 10 concurrent RPC workers; the HTTP skin is
    a ThreadingHTTPServer and Spark job submission is thread-safe, so
    parallel CalcAvgLoan calls must all succeed with consistent values
    (first wave creates partitions, the rest reuse)."""
    from concurrent.futures import ThreadPoolExecutor

    _, client = service
    client.db_to_hdfs()
    keys = [0, 5, 10, 15, 24] * 2
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(client.calc_avg_loan, keys))
    by_key: dict[int, set[int]] = {}
    for k, r in zip(keys, results):
        assert r["error"] == "" and r["source"] in ("create", "reuse", "recreate")
        by_key.setdefault(k, set()).add(r["avg_loan"])
    # Same key -> same average regardless of which thread/path served it.
    assert all(len(v) == 1 for v in by_key.values())


def test_grpc_skin_gated_without_grpcio(service):
    svc, _ = service
    try:
        import grpc  # noqa: F401

        pytest.skip("grpcio installed; gate only applies without it")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        serve_grpc(svc.pipeline)


def test_cli_drives_all_verbs_over_socket(service):
    """The reference-argv CLI (client_cli.py, same mode/-c/-f surface
    as reference client.py:9-16) end-to-end against the live HTTP
    service: DbToHdfs prints the status, CalcAvgLoan prints avg then
    source (create→reuse across calls), BlockLocations prints the
    host→count map, and the error paths print `error: ...` exactly
    like client.py:26/33."""
    import io
    import json as _json

    from data_pipeline_with_hdfs_sql_integration_spark import client_cli

    svc, client = service
    port = str(client.base.rsplit(":", 1)[1])

    def run(*argv: str) -> str:
        buf = io.StringIO()
        assert client_cli.main([*argv, "--port", port], out=buf) == 0
        return buf.getvalue()

    out = run("DbToHdfs")
    assert "rows" in out or "ERROR" not in out
    first = run("CalcAvgLoan", "-c", "3").splitlines()
    assert first[1] == "create"
    avg = int(first[0])
    again = run("CalcAvgLoan", "--code", "3").splitlines()
    assert again == [str(avg), "reuse"]
    missing = run("CalcAvgLoan", "-c", "99999")
    assert missing.startswith("error: ")
    blocks = run("BlockLocations", "-f", svc.pipeline.main_path)
    assert _json.loads(blocks)  # non-empty host→count map
    bad = run("BlockLocations", "-f", "/definitely/not/here.parquet")
    assert bad.startswith("error: ")


def test_lender_pb_wire_bytes_pinned():
    """The runtime-built message classes must emit EXACTLY the
    reference's lender.proto wire format — pinned against hand-computed
    proto3 encodings (field<<3|type tags, varints, length-delimited
    strings), so a descriptor drift (wrong field number/type) trips."""
    from data_pipeline_with_hdfs_sql_integration_spark.lender_pb import (
        messages,
        protobuf_available,
    )

    if not protobuf_available():
        pytest.skip("no protobuf runtime on this host")
    classes = messages()
    # CalcAvgLoanResp{avg_loan=240000, source="create"}:
    # tag 0x08 (field 1, varint) + varint(240000=0x3a980 -> 80 d3 0e)
    # + tag 0x12 (field 2, len) + len 6 + b"create".
    msg = classes["CalcAvgLoanResp"](avg_loan=240000, source="create")
    assert msg.SerializeToString() == bytes.fromhex("0880d30e1206637265617465")
    # CalcAvgLoanReq{county_code=5}: tag 0x08 + varint 5.
    assert classes["CalcAvgLoanReq"](county_code=5).SerializeToString() == b"\x08\x05"
    # StatusString{status="ok"}: tag 0x0a + len 2 + "ok".
    assert classes["StatusString"](status="ok").SerializeToString() == b"\x0a\x02ok"
    # Map field round-trip (proto3 map = repeated MapEntry messages).
    b = classes["BlockLocationsResp"]()
    b.block_entries["h1"] = 3
    assert dict(classes["BlockLocationsResp"].FromString(
        b.SerializeToString()
    ).block_entries) == {"h1": 3}


def test_three_verbs_over_proto_wire(service):
    """Full end-to-end over application/x-protobuf: the same socket
    service, but request/response bodies are genuine lender.proto wire
    bytes (what a reference client's serializer produces). Values must
    match the JSON transport exactly."""
    from data_pipeline_with_hdfs_sql_integration_spark.lender_pb import (
        protobuf_available,
    )

    if not protobuf_available():
        pytest.skip("no protobuf runtime on this host")
    svc, json_client = service
    proto_client = LenderHttpClient(
        port=int(json_client.base.rsplit(":", 1)[1]), wire="proto"
    )
    status = proto_client.db_to_hdfs()["status"]
    assert status.startswith("Imported ")
    first = proto_client.calc_avg_loan(5)
    assert first["source"] == "create" and first["avg_loan"] > 0
    again_json = json_client.calc_avg_loan(5)
    assert again_json["source"] == "reuse"
    assert again_json["avg_loan"] == first["avg_loan"]
    blocks = proto_client.block_locations()
    assert blocks["error"] == "" and sum(blocks["block_entries"].values()) >= 1
    # In-band error shape survives the proto transport (defaults filled).
    missing = proto_client.calc_avg_loan(9999)
    assert missing["avg_loan"] == 0 and missing["source"] == "" and missing["error"]
