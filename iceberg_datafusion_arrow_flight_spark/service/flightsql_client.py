"""Flight SQL client — the protocol a stock JDBC/ADBC driver speaks.

Implements the client half of Arrow Flight SQL over PyArrow's generic
``FlightClient``, using only public protocol messages
(:mod:`.flightsql_proto`): Any-wrapped ``arrow.flight.protocol.sql``
commands in descriptors/actions, opaque endpoint tickets, put-metadata
results.  Exists so tests can prove the server's wire compatibility
end-to-end (prepare → bind → execute → fetch → close) the same way the
reference is exercised by the stock ``flight_sql_client`` CLI
(iceberg-datafusion-arrow-flight/README.md:15-34).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.flight as flight

from .flightsql_proto import pack_any, unpack_any


class _BasicAuth(flight.ClientAuthHandler):
    """Basic-auth handshake → bearer token (lib.rs:198-259 client side)."""

    def __init__(self, username: str, password: str):
        super().__init__()
        self.basic = flight.BasicAuth(username, password)
        self.token: bytes = b""

    def authenticate(self, outgoing, incoming):
        outgoing.write(self.basic.serialize())
        self.token = incoming.read()

    def get_token(self):
        return self.token


@dataclass
class PreparedStatement:
    handle: str
    dataset_schema: pa.Schema | None


class FlightSqlClient:
    def __init__(self, location: str, username: str, password: str,
                 **client_kwargs):
        self.client = flight.FlightClient(location, **client_kwargs)
        self.client.authenticate(_BasicAuth(username, password))

    # ------------------------------------------------------------ prepare
    def prepare(self, sql: str) -> PreparedStatement:
        results = list(self.client.do_action(flight.Action(
            "CreatePreparedStatement",
            pack_any("ActionCreatePreparedStatementRequest", query=sql))))
        name, fields = unpack_any(results[0].body.to_pybytes())
        if name != "ActionCreatePreparedStatementResult":
            raise RuntimeError(f"unexpected action result: {name}")
        schema = None
        if fields["dataset_schema"]:
            schema = pa.ipc.read_schema(
                pa.py_buffer(fields["dataset_schema"]))
        return PreparedStatement(
            fields["prepared_statement_handle"].decode(), schema)

    # ------------------------------------------------------------ bind
    def bind(self, st: PreparedStatement, values: list) -> None:
        cmd = pack_any("CommandPreparedStatementQuery",
                       prepared_statement_handle=st.handle.encode())
        batch = pa.table({f"p{i + 1}": [v] for i, v in enumerate(values)})
        writer, reader = self.client.do_put(
            flight.FlightDescriptor.for_command(cmd), batch.schema)
        writer.write_table(batch)
        writer.done_writing()
        buf = reader.read()
        writer.close()
        if buf is not None:
            name, fields = unpack_any(buf.to_pybytes())
            if name == "DoPutPreparedStatementResult" and \
                    fields["prepared_statement_handle"]:
                st.handle = fields["prepared_statement_handle"].decode()

    # ------------------------------------------------------------ execute
    def execute(self, st: PreparedStatement) -> pa.Table:
        cmd = pack_any("CommandPreparedStatementQuery",
                       prepared_statement_handle=st.handle.encode())
        info = self.client.get_flight_info(
            flight.FlightDescriptor.for_command(cmd))
        batches = []
        schema = info.schema
        for endpoint in info.endpoints:
            # the ticket is OPAQUE to the client (spec) — pass through
            reader = self.client.do_get(endpoint.ticket)
            for chunk in reader:
                batches.append(chunk.data)
        return pa.Table.from_batches(batches, schema=schema)

    def execute_update(self, sql: str) -> int:
        cmd = pack_any("CommandStatementUpdate", query=sql)
        writer, reader = self.client.do_put(
            flight.FlightDescriptor.for_command(cmd),
            pa.schema([]))
        writer.done_writing()
        buf = reader.read()
        writer.close()
        if buf is None:
            return -1
        name, fields = unpack_any(buf.to_pybytes())
        return fields["record_count"] if name == "DoPutUpdateResult" else -1

    # ------------------------------------------------------------ close
    def close(self, st: PreparedStatement) -> None:
        list(self.client.do_action(flight.Action(
            "ClosePreparedStatement",
            pack_any("ActionClosePreparedStatementRequest",
                     prepared_statement_handle=st.handle.encode()))))

    # ------------------------------------------------------------ sugar
    def query(self, sql: str) -> pa.Table:
        st = self.prepare(sql)
        try:
            return self.execute(st)
        finally:
            self.close(st)
