#!/usr/bin/env python
"""End-to-end client walkthrough — the workflow a reference (Flight SQL
JDBC) client runs, against this engine's Flight front door.

    FLIGHT_USER=admin FLIGHT_PASSWORD=secret python examples/flight_client.py

Starts an in-process server over the sf0.001 fixtures, then: handshake
(basic auth → bearer) → prepare DataFusion-dialect SQL → bind $n params
→ execute → fetch Arrow → close.  Mirrors iceberg-datafusion-arrow-flight's
method surface (SURVEY §2.12)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa
import pyarrow.flight as fl

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.service import EngineService
from iceberg_datafusion_arrow_flight_spark.service.flight_server import (
    SparkFlightServer)
from iceberg_datafusion_arrow_flight_spark.sources.registry import register_tables


class BasicClientAuth(fl.ClientAuthHandler):
    def __init__(self, username, password):
        super().__init__()
        self.basic = fl.BasicAuth(username, password)
        self.token = b""

    def authenticate(self, outgoing, incoming):
        outgoing.write(self.basic.serialize())
        self.token = incoming.read()

    def get_token(self):
        return self.token


def main():
    os.environ.setdefault("FLIGHT_USER", "admin")
    os.environ.setdefault("FLIGHT_PASSWORD", "secret")
    spark = get_spark(master="local[4]")
    # per-session table registration — the catalog-injection analogue
    # (on an Iceberg cluster the catalog is global and this is not needed)
    svc = EngineService(
        spark,
        session_init=lambda s: register_tables(s, "/root/testdata/sf0.001"))
    server = SparkFlightServer(svc, "grpc://127.0.0.1:0")
    print(f"server on port {server.port}")

    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    client.authenticate(BasicClientAuth(os.environ["FLIGHT_USER"],
                                        os.environ["FLIGHT_PASSWORD"]))

    # DataFusion-dialect SQL, exactly as a reference client would write it
    sql = ("SELECT o_orderpriority, COUNT(*)::bigint AS n "
           "FROM orders WHERE o_totalprice > $1 "
           "GROUP BY o_orderpriority ORDER BY n DESC")
    res = list(client.do_action(fl.Action("create_prepared_statement",
                                          sql.encode())))
    payload = json.loads(res[0].body.to_pybytes())
    handle = payload["handle"]
    print("prepared:", handle)

    # bind $1
    params = pa.table({"p1": pa.array([150000.0])})
    writer, _ = client.do_put(
        fl.FlightDescriptor.for_command(handle.encode()), params.schema)
    writer.write_table(params)
    writer.close()

    info = client.get_flight_info(fl.FlightDescriptor.for_command(handle.encode()))
    table = client.do_get(info.endpoints[0].ticket).read_all()
    print(table.to_pandas().to_string(index=False))

    list(client.do_action(fl.Action("close_prepared_statement",
                                    handle.encode())))
    server.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
