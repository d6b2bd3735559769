"""Arrow Flight front door for :class:`.engine.EngineService`.

Mirrors the reference's Flight SQL service method-for-method
(iceberg-datafusion-arrow-flight/src/lib.rs, inventory at SURVEY §2.12) over
PyArrow's generic Flight server:

- handshake → :class:`BasicAuthHandler` (Basic → bearer, lib.rs:198-259)
- do_action ``create_prepared_statement`` / ``close_prepared_statement``
  (lib.rs:667-716 / 718-730)
- do_put with a params batch → bind (lib.rs:601-643; first column,
  stringly-typed scalars — same contract)
- get_flight_info → EXECUTES and caches, endpoint carries the handle
  ticket and no location = single-node, like lib.rs:346-361
- do_get → streams the cached Arrow table (lib.rs:261-296)
- everything the reference leaves unimplemented raises, so a client
  porting from the reference sees the same failure surface.

The wire protocol is generic Flight (PyArrow exposes no Flight SQL
*server* scaffolding); message names and semantics line up 1:1 with the
reference so a thin client shim maps between them.  Spark Connect is the
alternative gRPC+Arrow door when a real cluster is available.
"""

from __future__ import annotations

import json
import threading

import pyarrow as pa
import pyarrow.flight as flight

from .engine import AuthError, EngineService


class BasicAuthHandler(flight.ServerAuthHandler):
    """Basic-auth handshake issuing bearer tokens (lib.rs:198-259)."""

    def __init__(self, service: EngineService):
        super().__init__()
        self.service = service

    def authenticate(self, outgoing, incoming):
        buf = incoming.read()
        auth = flight.BasicAuth.deserialize(buf)
        try:
            token = self.service.handshake(
                auth.username.decode(), auth.password.decode())
        except AuthError as exc:
            raise flight.FlightUnauthenticatedError(str(exc)) from exc
        outgoing.write(token.encode())

    def is_valid(self, token):
        if not token or token.decode() not in self.service.sessions:
            raise flight.FlightUnauthenticatedError("invalid bearer token")
        return token


class SparkFlightServer(flight.FlightServerBase):
    def __init__(self, service: EngineService,
                 location: str = "grpc://0.0.0.0:31337"):
        # default port matches the reference binary (sql/main.rs:43)
        self.service = service
        super().__init__(location, auth_handler=BasicAuthHandler(service))

    # token of the calling connection
    @staticmethod
    def _token(context) -> str:
        return context.peer_identity().decode()

    # --------------------------------------------------------- actions
    def do_action(self, context, action):
        token = self._token(context)
        body = action.body.to_pybytes().decode() if action.body else ""
        if action.type == "create_prepared_statement":
            handle = self.service.create_prepared_statement(token, body)
            schema = self.service.statement_schema(handle)
            # dataset schema shipped as Arrow IPC bytes, like the
            # reference (SchemaAsIpc at lib.rs:704-708), plus the JSON
            # form for non-Arrow clients
            ipc_b64 = None
            if schema is not None:
                from pyspark.sql.pandas.types import to_arrow_schema
                import base64
                ipc_b64 = base64.b64encode(
                    to_arrow_schema(schema).serialize().to_pybytes()).decode()
            payload = {"handle": handle,
                       "schema": schema.json() if schema is not None else None,
                       "dataset_schema_ipc": ipc_b64}
            return [json.dumps(payload).encode()]
        if action.type == "close_prepared_statement":
            self.service.close_prepared_statement(token, body)
            return []
        raise flight.FlightServerError(
            f"action {action.type!r} not implemented "
            "(matches reference unimplemented surface, lib.rs:732-788)")

    def list_actions(self, context):
        return [("create_prepared_statement", "SQL text -> handle"),
                ("close_prepared_statement", "evict handle")]

    # --------------------------------------------------------- bind
    def do_put(self, context, descriptor, reader, writer):
        """Parameter binding: descriptor.command = handle; the stream's
        first batch carries ``$1..$n`` values in column order (the
        reference reads first-column string scalars per batch,
        lib.rs:613-622 — column-order values are the superset)."""
        token = self._token(context)
        handle = descriptor.command.decode()
        batch_table = reader.read_all()
        values = [col.to_pylist()[0] for col in batch_table.columns]
        self.service.bind_parameters(token, handle, values)

    # --------------------------------------------------------- execute
    def get_flight_info(self, context, descriptor):
        token = self._token(context)
        handle = descriptor.command.decode()
        ticket_handle = self.service.execute(token, handle)
        table = self.service.fetch(token, ticket_handle)
        endpoint = flight.FlightEndpoint(ticket_handle.encode(), [])
        # total_records/bytes -1: the reference never computes them
        # (lib.rs:368-370)
        return flight.FlightInfo(table.schema, descriptor, [endpoint], -1, -1)

    # --------------------------------------------------------- fetch
    def do_get(self, context, ticket):
        handle = ticket.ticket.decode()
        try:
            table = self.service.fetch(self._token(context), handle)
        except AuthError as exc:
            raise flight.FlightUnauthorizedError(str(exc)) from exc
        except KeyError as exc:
            raise flight.FlightServerError(str(exc)) from exc
        return flight.RecordBatchStream(table)

    # ------------------------------------------------- not implemented
    def list_flights(self, context, criteria):
        raise flight.FlightServerError(
            "list_flights not implemented (reference: ad-hoc statement "
            "surface unimplemented, lib.rs:298-306)")


def serve_background(service: EngineService, port: int = 31337,
                     ) -> tuple[SparkFlightServer, threading.Thread]:
    """Start the server on a daemon thread; returns (server, thread)."""
    server = SparkFlightServer(service, f"grpc://0.0.0.0:{port}")
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    return server, thread
