"""Second-client wire conformance (VERDICT r7 ask #7).

Every other service test drives the server through the repo's own
``flightsql_client``/``flightsql_proto`` modules — so an encode/decode
bug mirrored on both sides would cancel out.  This suite is a fully
INDEPENDENT client: no pyarrow flight_sql bindings exist in this
environment (probe pinned below), so the FlightSQL protobuf layer is
re-implemented HERE, from the public protobuf wire spec and the public
``FlightSql.proto`` field numbers, sharing zero code with the server's
codec.  Only pyarrow's generic Flight transport primitives (do_action /
get_flight_info / do_get / do_put with raw command bytes) carry the
hand-assembled messages.

The conversation mirrors how the stock ``flight_sql_client`` CLI
exercises the reference (README.md:15-34): handshake → prepare → bind →
execute → fetch → close → update.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.flight as flight
import pytest


def test_no_flight_sql_bindings_in_sandbox():
    """Dated probe (2026-08-16): pyarrow 16.1 in this environment ships
    no flight_sql module, so an independent protobuf-level client is
    the strongest second-client check available."""
    with pytest.raises(ImportError):
        from pyarrow import flight_sql  # noqa: F401


# ----------------------------------------------------------------------
# independent protobuf wire helpers — written from the spec, NOT
# imported from service.flightsql_proto
# ----------------------------------------------------------------------

def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field_num: int, payload: bytes) -> bytes:
    """length-delimited field (wire type 2)"""
    return _uvarint((field_num << 3) | 2) + _uvarint(len(payload)) + payload


def _parse(buf: bytes) -> dict[int, list]:
    """Generic proto parse: field number -> list of raw values
    (bytes for wire type 2, int for varints)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            key |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.setdefault(fnum, []).append(val)
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            out.setdefault(fnum, []).append(buf[pos:pos + ln])
            pos += ln
        else:  # pragma: no cover - server never sends other wire types
            raise AssertionError(f"unexpected wire type {wt}")
    return out


_SQL_PKG = b"type.googleapis.com/arrow.flight.protocol.sql."


def _any(msg_name: bytes, inner: bytes,
         pkg: bytes = _SQL_PKG) -> bytes:
    """google.protobuf.Any = {1: type_url string, 2: value bytes}"""
    return _ld(1, pkg + msg_name) + _ld(2, inner)


def _unpack_any(buf: bytes) -> tuple[bytes, bytes]:
    f = _parse(buf)
    return f[1][0], (f[2][0] if 2 in f else b"")


class _Auth(flight.ClientAuthHandler):
    def __init__(self):
        super().__init__()
        self.token = b""

    def authenticate(self, outgoing, incoming):
        outgoing.write(flight.BasicAuth("admin", "secret").serialize())
        self.token = incoming.read()

    def get_token(self):
        return self.token


@pytest.fixture()
def raw_server(spark, monkeypatch):
    monkeypatch.setenv("FLIGHT_USER", "admin")
    monkeypatch.setenv("FLIGHT_PASSWORD", "secret")
    from iceberg_datafusion_arrow_flight_spark.service import EngineService
    from iceberg_datafusion_arrow_flight_spark.service.flight_server import (
        serve_background)
    service = EngineService(root=spark, max_cached_results=8)
    server, _ = serve_background(service, port=0)
    client = flight.FlightClient(f"grpc://localhost:{server.port}")
    client.authenticate(_Auth())
    yield client
    server.shutdown()


def test_second_client_prepare_execute_fetch_close(raw_server):
    client = raw_server
    # --- prepare: Action("CreatePreparedStatement",
    #       Any(ActionCreatePreparedStatementRequest{1: query}))
    req = _any(b"ActionCreatePreparedStatementRequest",
               _ld(1, b"SELECT 6 * 7 AS answer, 'wire' AS tag"))
    results = list(client.do_action(flight.Action(
        "CreatePreparedStatement", req)))
    url, inner = _unpack_any(results[0].body.to_pybytes())
    assert url == _SQL_PKG + b"ActionCreatePreparedStatementResult"
    fields = _parse(inner)
    handle = fields[1][0]
    assert handle, "empty prepared-statement handle"
    # eager dataset schema (field 2) decodes as Arrow IPC
    schema = pa.ipc.read_schema(pa.py_buffer(fields[2][0]))
    assert schema.names == ["answer", "tag"]

    # --- execute: get_flight_info(CMD descriptor =
    #       Any(CommandPreparedStatementQuery{1: handle}))
    cmd = _any(b"CommandPreparedStatementQuery", _ld(1, handle))
    info = client.get_flight_info(flight.FlightDescriptor.for_command(cmd))
    assert len(info.endpoints) == 1
    # the endpoint ticket must be the reference's own FetchResults Any
    # (custom package, lib.rs:800-802) — decoded HERE, independently
    t_url, t_inner = _unpack_any(info.endpoints[0].ticket.ticket)
    assert t_url == (b"type.googleapis.com/"
                     b"datafusion.example.com.sql.FetchResults")
    t_fields = _parse(t_inner)
    assert t_fields[1][0]  # FetchResults{1: handle string}

    # --- fetch: DoGet with the opaque ticket, results as Arrow batches
    reader = client.do_get(info.endpoints[0].ticket)
    table = reader.read_all()
    assert table.column("answer").to_pylist() == [42]
    assert table.column("tag").to_pylist() == ["wire"]

    # --- close: Action("ClosePreparedStatement",
    #       Any(ActionClosePreparedStatementRequest{1: handle}))
    list(client.do_action(flight.Action(
        "ClosePreparedStatement",
        _any(b"ActionClosePreparedStatementRequest", _ld(1, handle)))))
    # the handle is now invalid: executing it again must error (pyarrow
    # surfaces the server's KeyError as ArrowKeyError, not FlightError)
    with pytest.raises((flight.FlightError, pa.ArrowKeyError)):
        client.get_flight_info(flight.FlightDescriptor.for_command(cmd))


def test_second_client_bind_parameters(raw_server):
    client = raw_server
    req = _any(b"ActionCreatePreparedStatementRequest",
               _ld(1, b"SELECT $1 + $2 AS s"))
    results = list(client.do_action(flight.Action(
        "CreatePreparedStatement", req)))
    _, inner = _unpack_any(results[0].body.to_pybytes())
    handle = _parse(inner)[1][0]

    # bind: DoPut(CMD descriptor) streaming one params batch
    cmd = _any(b"CommandPreparedStatementQuery", _ld(1, handle))
    batch = pa.table({"p1": [40], "p2": [2]})
    writer, md_reader = client.do_put(
        flight.FlightDescriptor.for_command(cmd), batch.schema)
    writer.write_table(batch)
    writer.done_writing()
    buf = md_reader.read()
    writer.close()
    if buf is not None:  # DoPutPreparedStatementResult may renew the handle
        url, inner = _unpack_any(buf.to_pybytes())
        if url == _SQL_PKG + b"DoPutPreparedStatementResult":
            f = _parse(inner)
            if 1 in f and f[1][0]:
                handle = f[1][0]
                cmd = _any(b"CommandPreparedStatementQuery", _ld(1, handle))

    info = client.get_flight_info(flight.FlightDescriptor.for_command(cmd))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.column("s").to_pylist() == [42]
    list(client.do_action(flight.Action(
        "ClosePreparedStatement",
        _any(b"ActionClosePreparedStatementRequest", _ld(1, handle)))))


def test_second_client_update_returns_minus_one(raw_server):
    """DoPut(CommandStatementUpdate) → DoPutUpdateResult{record_count:-1}
    — the reference's DDL contract (lib.rs:683-696), with the -1 arriving
    as the 10-byte two's-complement int64 varint this test decodes
    itself."""
    client = raw_server
    cmd = _any(b"CommandStatementUpdate",
               _ld(1, b"CREATE OR REPLACE TEMPORARY VIEW wire2_v "
                      b"AS SELECT 7 AS x"))
    writer, md_reader = client.do_put(
        flight.FlightDescriptor.for_command(cmd), pa.schema([]))
    writer.done_writing()
    buf = md_reader.read()
    writer.close()
    assert buf is not None
    url, inner = _unpack_any(buf.to_pybytes())
    assert url == _SQL_PKG + b"DoPutUpdateResult"
    raw = _parse(inner)[1][0]
    # proto3 int64: -1 encodes as 2^64-1; this client's own decode
    assert raw == (1 << 64) - 1
    assert raw - (1 << 64) == -1
